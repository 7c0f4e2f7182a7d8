"""Hexagonal binning grid — exact integer math, H3-analogue semantics.

The reference ecosystem's hex use-case (H3-style density aggregation,
hotspot smoothing over hexagonal k-rings) is re-expressed here as a
planar hexagonal Voronoi partition over the engine's milli-degree
integer coordinate space, so that — like every other spatial kernel in
this repo — assignment is **bit-for-bit replayable in ANSI SQL** (the
DuckDB oracles) and in Catalyst column expressions (functions/cols.py).

Construction
------------

Pointy-top hexagons from an *offset row lattice* of centers: row ``j``
sits at ``y = j*H``; odd rows are shifted right by ``W/2``::

    center(i, j) = (i*W + (j & 1)*(W//2),  j*H)      [shifted coords]

With ``H = (W * 866) // 1000`` (a rational stand-in for sqrt(3)/2 ≈
0.8660, within 0.03%), the Voronoi diagram of this lattice is a
hexagonal tiling; the hexes are within a fraction of a percent of
regular.  A point's hex is its **nearest center in squared Euclidean
distance** — and because ``H > W/2`` the nearest center provably lies
in row ``floor(y/H)`` or ``floor(y/H)+1`` (proof: a center one row
further has dy ≥ H, and H² = 0.75·W² > (W/2)², the worst in-row
horizontal miss).  So assignment is a TWO-candidate integer argmin:

    j_a = Y // H          (Y = lat_milli + 90000  ≥ 0)
    j_b = j_a + 1
    i(j) = (X - (j&1)*(W//2) + W//2) // W    (X = lon_milli + 180000)

All divisions are truncating divisions on NON-NEGATIVE operands, so
Python ``//``, Spark ``DIV``, and DuckDB ``//`` agree exactly (the
shift-to-non-negative rule from the repo's oracle conventions).

Tie rule (equidistant centers on lattice midlines): minimize
``(d2, j, -i)``.  Within a row the round-half-up division picks the
LARGER i (which also keeps i ≥ 0 for antimeridian points on odd rows,
where rounding ties down would index a center outside the world box);
across the two candidate rows a single packed comparison key breaks
the tie toward the smaller row::

    key = d2 * PACK + (j * NI + i)          PACK = 10^8 > max hex id

Resolution ladder: ``W(res) = 32768 >> res`` milli-degrees for
res ∈ [0, 10] (≈ 32.8° down to 0.032° ≈ 3.6 km at the equator) —
aperture-4, matching the quadtree families' halving ladder.  Like H3
itself, coarser hexes are NOT exact unions of finer ones; the ladder
is for choosing an analysis resolution, not for hierarchical rollup.

Neighbor topology (k-ring smoothing) in offset coordinates
("odd rows shift right"):

    even j: (i±1, j), (i, j-1), (i-1, j-1), (i, j+1), (i-1, j+1)
    odd  j: (i±1, j), (i+1, j-1), (i, j-1), (i+1, j+1), (i, j+1)

Reference parity note: GeoWave has no hex index; this family extends
the engine's binning surface the way its KDE/heatmap analytics
(analytics/spark/.../kde/KDERunner.java) extend raster summaries —
named in the build brief's H3/S2 axis.  The numpy kernel here is the
tested definitional oracle; the hot path is the Catalyst twin in
functions/cols.py (hex_key_col).
"""

from __future__ import annotations

import numpy as np

W0 = 32_768  # res-0 horizontal center spacing, milli-degrees (power of 2)
MAX_RES = 10  # W(10) = 32 milli-deg ≈ 3.6 km hexes at the equator
PACK = 100_000_000  # > max packed hex id at every res (see ni())

X_OFF = 180_000  # lon_milli shift → non-negative X
Y_OFF = 90_000  # lat_milli shift → non-negative Y


def wh(res: int) -> tuple[int, int]:
    """(W, H) center spacings at ``res`` — W halves per level, H = 866W/1000."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"hex res {res} outside [0, {MAX_RES}]")
    w = W0 >> res
    return w, (w * 866) // 1000


def ni(res: int) -> int:
    """Row stride for packing (i, j) → hex id: one more than the max
    reachable i.  max i = (359999 + W/2) // W ≤ 360000//W + 1."""
    w, _ = wh(res)
    return 360_000 // w + 2


def hex_assign(lon_milli, lat_milli, res: int):
    """Vectorized exact assignment → (i, j, hex_id) int64 arrays.

    Definitional kernel (the brute-force-tested oracle); the Catalyst
    twin cols.hex_key_col and the SQL oracle replay this arithmetic."""
    w, h = wh(res)
    n_i = ni(res)
    x = np.asarray(lon_milli, dtype=np.int64) + X_OFF
    y = np.asarray(lat_milli, dtype=np.int64) + Y_OFF
    if (x < 0).any() or (y < 0).any():
        raise ValueError("coordinates outside the milli-degree world box")

    best_key = None
    for dj in (0, 1):
        j = y // h + dj
        off = (j & 1) * (w // 2)
        i = (x - off + w // 2) // w
        cx = i * w + off
        cy = j * h
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        key = d2 * PACK + (j * n_i + i)
        best_key = key if best_key is None else np.minimum(best_key, key)

    hid = best_key % PACK
    return hid % n_i, hid // n_i, hid


def hex_center_milli(i, j, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Hex id parts → center (lon_milli, lat_milli)."""
    w, h = wh(res)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    return i * w + (j & 1) * (w // 2) - X_OFF, j * h - Y_OFF


# (di_even, di_odd, dj) neighbor offsets for "odd rows shift right".
NEIGHBOR_OFFSETS = (
    (1, 1, 0),
    (-1, -1, 0),
    (0, 1, -1),
    (-1, 0, -1),
    (0, 1, 1),
    (-1, 0, 1),
)


def neighbors(i: int, j: int) -> list[tuple[int, int]]:
    """The 6 hex neighbors of (i, j) in offset coordinates."""
    odd = j & 1
    return [(i + (dio if odd else die), j + dj) for die, dio, dj in NEIGHBOR_OFFSETS]


def brute_force_assign(x_shift: int, y_shift: int, res: int) -> tuple[int, int]:
    """Independent O(window²) nearest-center search in SHIFTED coords —
    test oracle only.  Scans a 7×7 center window around the point and
    applies the documented tie order: minimize ``(d2, j, -i)``."""
    w, h = wh(res)
    jc = y_shift // h
    best = None
    for j in range(max(0, jc - 3), jc + 4):
        off = (j & 1) * (w // 2)
        ic = (x_shift - off) // w
        for i in range(max(0, ic - 3), ic + 4):
            cx = i * w + off
            cy = j * h
            d2 = (x_shift - cx) ** 2 + (y_shift - cy) ** 2
            cand = (d2, j, -i)
            if best is None or cand < best[:3]:
                best = cand + (i, j)
    return best[3], best[4]
