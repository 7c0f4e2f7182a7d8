"""Multi-resolution space-filling-curve cell keys — pure numpy, no native deps.

This is the engine's replacement for the reference's SFC index strategies
(Hilbert/Z-order/XZ tiered keys that map n-D points onto the 1-D sorted key
space of a KV store — see reference
core/index/.../sfc/zorder/ZOrderSFC.java:72,
core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:175-231).
We keep Z-order (Morton) because cover/refine correctness is independent of
curve order and bit-interleaving vectorizes perfectly in numpy; Hilbert would
only change range locality, which Spark's cell-set cover join does not need.

Key layout (int64, always positive):

    cell_id = (res << 58) | morton(ix, iy)

* ``res`` ∈ [0, 29]  — 5 bits at positions 58..62 (sign bit stays 0).
* ``morton(ix, iy)`` — 2*res interleaved bits, ix from longitude, iy from
  latitude.  At res r the world is a 2^r × 2^r grid over
  lon ∈ [-180, 180), lat ∈ [-90, 90).

Because ``res`` is embedded, keys from different resolutions never collide
and a mixed-resolution index column sorts tier-first — the DataFrame
analogue of the reference's tier-byte key prefix
(TieredSFCIndexStrategy.java:355-458).

Two encode paths:

* float path (``encode``) — normalizes doubles; used for query covers and
  ad-hoc points.
* exact integer path (``encode_milli``) — operates on milli-degree int64
  coordinates with integer div only, so an external SQL engine (DuckDB
  oracle, or a SQL-pushdown planner) can reproduce cell assignment
  bit-for-bit: ``ix = (lon_milli + 180000) * 2^r // 360000``.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29
RES_SHIFT = 58
COORD_MASK = (np.int64(1) << RES_SHIFT) - np.int64(1)

LON_SPAN_MILLI = 360_000
LAT_SPAN_MILLI = 180_000

# ---------------------------------------------------------------------------
# Morton (Z-order) bit interleaving — standard parallel-prefix spread on
# uint64.  Vectorized over numpy arrays.
# ---------------------------------------------------------------------------

_B = [
    np.uint64(0x0000_0000_FFFF_FFFF),
    np.uint64(0x0000_FFFF_0000_FFFF),
    np.uint64(0x00FF_00FF_00FF_00FF),
    np.uint64(0x0F0F_0F0F_0F0F_0F0F),
    np.uint64(0x3333_3333_3333_3333),
    np.uint64(0x5555_5555_5555_5555),
]
_S = [np.uint64(16), np.uint64(8), np.uint64(4), np.uint64(2), np.uint64(1)]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at position 2i."""
    v = v.astype(np.uint64) & _B[0]
    v = (v | (v << np.uint64(16))) & _B[1]
    v = (v | (v << np.uint64(8))) & _B[2]
    v = (v | (v << np.uint64(4))) & _B[3]
    v = (v | (v << np.uint64(2))) & _B[4]
    v = (v | (v << np.uint64(1))) & _B[5]
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits` — gather bits at even positions."""
    v = v.astype(np.uint64) & _B[5]
    v = (v | (v >> np.uint64(1))) & _B[4]
    v = (v | (v >> np.uint64(2))) & _B[3]
    v = (v | (v >> np.uint64(4))) & _B[2]
    v = (v | (v >> np.uint64(8))) & _B[1]
    v = (v | (v >> np.uint64(16))) & _B[0]
    return v


def morton(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Interleave ix (even bits) and iy (odd bits) → uint64 Morton code."""
    return _spread_bits(np.asarray(ix)) | (_spread_bits(np.asarray(iy)) << np.uint64(1))


def morton_inv(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.uint64)
    return _compact_bits(z), _compact_bits(z >> np.uint64(1))


# ---------------------------------------------------------------------------
# Cell id pack / unpack
# ---------------------------------------------------------------------------


def pack(res, ix, iy) -> np.ndarray:
    """(res, ix, iy) → int64 cell id."""
    res = np.asarray(res, dtype=np.uint64)
    z = morton(np.asarray(ix, dtype=np.uint64), np.asarray(iy, dtype=np.uint64))
    return ((res << np.uint64(RES_SHIFT)) | z).astype(np.int64)


def unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell id → (res, ix, iy)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(RES_SHIFT)).astype(np.int64)
    ix, iy = morton_inv(c & np.uint64(COORD_MASK))
    return res, ix.astype(np.int64), iy.astype(np.int64)


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------


def grid_xy(lon, lat, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Float path: lon/lat degrees → integer grid coords at ``res``.

    Longitude 180 and latitude 90 clamp into the last cell (the reference
    clamps the same way at the normalized range edge).
    """
    n = np.int64(1) << np.int64(res)
    x = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    y = (np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
    ix = np.clip(np.floor(x * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor(y * n).astype(np.int64), 0, n - 1)
    return ix, iy


def encode(lon, lat, res: int) -> np.ndarray:
    """lon/lat degrees → int64 cell id at resolution ``res``."""
    ix, iy = grid_xy(lon, lat, res)
    return pack(np.full_like(ix, res, dtype=np.int64), ix, iy)


def grid_xy_milli(lon_milli, lat_milli, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer path: milli-degree int coords → grid coords at ``res``.

    Pure int64 arithmetic (``(v + offset) * 2^r // span``) — reproducible in
    any SQL engine with integer division, which is what the correctness
    oracles use.
    """
    n = np.int64(1) << np.int64(res)
    lon_milli = np.asarray(lon_milli, dtype=np.int64)
    lat_milli = np.asarray(lat_milli, dtype=np.int64)
    ix = (lon_milli + np.int64(180_000)) * n // np.int64(LON_SPAN_MILLI)
    iy = (lat_milli + np.int64(90_000)) * n // np.int64(LAT_SPAN_MILLI)
    return np.clip(ix, 0, n - 1), np.clip(iy, 0, n - 1)


def encode_milli(lon_milli, lat_milli, res: int) -> np.ndarray:
    ix, iy = grid_xy_milli(lon_milli, lat_milli, res)
    return pack(np.full_like(ix, res, dtype=np.int64), ix, iy)


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (minlon, minlat, maxlon, maxlat) degrees.

    The DataFrame analogue of the reference's key→range decode used for tile
    envelopes (TieredSFCIndexStrategy.getRangeForId:246)."""
    res, ix, iy = unpack(cell)
    n = (np.int64(1) << res).astype(np.float64)
    minlon = ix / n * 360.0 - 180.0
    maxlon = (ix + 1) / n * 360.0 - 180.0
    minlat = iy / n * 180.0 - 90.0
    maxlat = (iy + 1) / n * 180.0 - 90.0
    return minlon, minlat, maxlon, maxlat


def parent(cell, parent_res: int) -> np.ndarray:
    """Coarsen a cell id to ``parent_res`` (bit-shift of the same key —
    multiple resolutions are views of one interleaved key, mirroring the
    reference's tier ladder)."""
    res, ix, iy = unpack(cell)
    shift = res - np.int64(parent_res)
    if np.any(shift < 0):
        raise ValueError("parent_res must be coarser (<=) than cell res")
    return pack(
        np.full_like(ix, parent_res, dtype=np.int64), ix >> shift, iy >> shift
    )


# ---------------------------------------------------------------------------
# Covers (query box → cell set) — the analogue of the reference's
# range decomposition (decomposeRange, HilbertSFC.java:226-240), except the
# output feeds an equi-join on cell ids instead of a sorted range scan.
# ---------------------------------------------------------------------------


def cover_count(minx: float, miny: float, maxx: float, maxy: float, res: int) -> int:
    """Number of cells a box would cover at ``res`` (cheap, no materialize)."""
    ix0, iy0 = grid_xy(minx, miny, res)
    ix1, iy1 = grid_xy(maxx, maxy, res)
    return int((ix1 - ix0 + 1) * (iy1 - iy0 + 1))


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cell ids at ``res`` intersecting the (non-wrapping) box."""
    ix0, iy0 = grid_xy(minx, miny, res)
    ix1, iy1 = grid_xy(maxx, maxy, res)
    xs = np.arange(int(ix0), int(ix1) + 1, dtype=np.int64)
    ys = np.arange(int(iy0), int(iy1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack(np.full(gx.size, res, dtype=np.int64), gx.ravel(), gy.ravel())


def split_antimeridian(
    minx: float, miny: float, maxx: float, maxy: float
) -> list[tuple[float, float, float, float]]:
    """A box with minx > maxx wraps the date line → split into ≤2 boxes
    (the reference's LongitudeDefinition bin split,
    LongitudeDefinition.java:25-66)."""
    if minx <= maxx:
        return [(minx, miny, maxx, maxy)]
    return [(minx, miny, 180.0, maxy), (-180.0, miny, maxx, maxy)]


def cover_bbox_adaptive(
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    max_cells: int = 1024,
    max_res: int = MAX_RES,
) -> tuple[int, np.ndarray]:
    """Pick the finest resolution whose cover stays ≤ ``max_cells``, then
    materialize it.  This is the engine's analogue of the reference's
    MAX_RANGE_DECOMPOSITION = 2000 budget (ConstraintsQuery.java:35-36):
    a bounded-size cover keeps the broadcast side of the join small.
    Returns (res, cells); handles antimeridian wrap."""
    boxes = split_antimeridian(minx, miny, maxx, maxy)
    res = max_res
    while res > 0:
        total = sum(cover_count(*b, res) for b in boxes)
        if total <= max_cells:
            break
        res -= 1
    cells = np.concatenate([cover_bbox(*b, res) for b in boxes])
    return res, np.unique(cells)


def tier_select(
    minx, miny, maxx, maxy, max_cells_per_dim: int = 2, max_res: int = MAX_RES
) -> np.ndarray:
    """Vectorized per-envelope insertion-tier choice: the finest resolution
    at which the envelope spans ≤ ``max_cells_per_dim`` cells per dimension.

    Re-expresses the reference's write-amplification rule — an entry is
    inserted at the most precise tier where its estimated duplicate count
    per dimension stays within bound (default 2)
    (TieredSFCIndexStrategy.java:63,382-408).  Bounds the explode factor of
    ingest to ``max_cells_per_dim ** 2`` rows per entry.
    """
    minx = np.atleast_1d(np.asarray(minx, dtype=np.float64))
    miny = np.atleast_1d(np.asarray(miny, dtype=np.float64))
    maxx = np.atleast_1d(np.asarray(maxx, dtype=np.float64))
    maxy = np.atleast_1d(np.asarray(maxy, dtype=np.float64))
    # Cells-per-dim spanned shrinks monotonically as res coarsens, so the
    # satisfying resolutions form {0..r*}; walking fine→coarse, the first
    # satisfying r is the finest one.  30 vectorized passes, O(30·n).
    res = np.zeros(minx.shape, dtype=np.int64)
    done = np.zeros(minx.shape, dtype=bool)
    for r in range(max_res, -1, -1):
        ix0, iy0 = grid_xy(minx, miny, r)
        ix1, iy1 = grid_xy(maxx, maxy, r)
        ok = ((ix1 - ix0) < max_cells_per_dim) & ((iy1 - iy0) < max_cells_per_dim)
        newly = ok & ~done
        res[newly] = r
        done |= ok
        if done.all():
            break
    return res


def tier_select_extent_milli(extent_x_milli, extent_y_milli, max_res: int = MAX_RES) -> np.ndarray:
    """Extent-estimate variant of the insertion-tier rule: the finest
    resolution r with ``extent <= cell_size`` in both dimensions, i.e.
    ``extent_x * 2^r <= 360000`` and ``extent_y * 2^r <= 180000`` (milli-deg
    ints).  Guarantees an envelope spans ≤ 2 cells per dimension regardless
    of grid alignment — the reference's *estimated* duplicate bound
    (TieredSFCIndexStrategy.java:63 'maxEstimatedDuplicateIdsPerDimension').

    Closed-form in integer arithmetic → reproducible in oracle SQL:
    r = min over dims of floor(log2(span/extent)).  Zero extents (points)
    get ``max_res``.
    """
    ex = np.maximum(np.asarray(extent_x_milli, dtype=np.int64), 1)
    ey = np.maximum(np.asarray(extent_y_milli, dtype=np.int64), 1)
    rx = np.floor(np.log2(LON_SPAN_MILLI / ex.astype(np.float64))).astype(np.int64)
    ry = np.floor(np.log2(LAT_SPAN_MILLI / ey.astype(np.float64))).astype(np.int64)
    # one-step exact fix-up against FP log error (log2 is within 1 ulp)
    rx = np.where(ex << np.clip(rx + 1, 0, 62) <= LON_SPAN_MILLI, rx + 1, rx)
    rx = np.where(ex << np.clip(rx, 0, 62) > LON_SPAN_MILLI, rx - 1, rx)
    ry = np.where(ey << np.clip(ry + 1, 0, 62) <= LAT_SPAN_MILLI, ry + 1, ry)
    ry = np.where(ey << np.clip(ry, 0, 62) > LAT_SPAN_MILLI, ry - 1, ry)
    return np.clip(np.minimum(rx, ry), 0, max_res)


def cover_envelopes(
    minx, miny, maxx, maxy, res, max_cells_per_dim: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-envelope cover at per-row resolutions.

    Returns (row_index, cell_id) pairs — the ingest-side explode that
    duplicates an entry into every cell its footprint touches (the
    reference's getInsertionIds multi-row-ID path,
    TieredSFCIndexStrategy.java:175-231).  Each envelope contributes at most
    ``max_cells_per_dim**2`` cells; callers pick ``res`` with
    :func:`tier_select` to guarantee that.
    """
    minx = np.asarray(minx, dtype=np.float64)
    res = np.asarray(res, dtype=np.int64)
    ix0, iy0 = _grid_xy_vec_res(minx, np.asarray(miny, np.float64), res)
    ix1, iy1 = _grid_xy_vec_res(np.asarray(maxx, np.float64), np.asarray(maxy, np.float64), res)
    return _emit_covers(ix0, iy0, ix1, iy1, res, max_cells_per_dim)


def cover_envelopes_milli(
    minx_m, miny_m, maxx_m, maxy_m, res, max_cells_per_dim: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-integer variant of :func:`cover_envelopes` over milli-degree
    int64 envelopes — bit-for-bit reproducible in SQL oracles (tile
    assignment parity)."""
    res = np.asarray(res, dtype=np.int64)
    n = np.int64(1) << res
    ix0 = np.clip((np.asarray(minx_m, np.int64) + 180_000) * n // LON_SPAN_MILLI, 0, n - 1)
    iy0 = np.clip((np.asarray(miny_m, np.int64) + 90_000) * n // LAT_SPAN_MILLI, 0, n - 1)
    ix1 = np.clip((np.asarray(maxx_m, np.int64) + 180_000) * n // LON_SPAN_MILLI, 0, n - 1)
    iy1 = np.clip((np.asarray(maxy_m, np.int64) + 90_000) * n // LAT_SPAN_MILLI, 0, n - 1)
    return _emit_covers(ix0, iy0, ix1, iy1, res, max_cells_per_dim)


def _emit_covers(ix0, iy0, ix1, iy1, res, max_cells_per_dim: int):
    nx = np.minimum(ix1 - ix0 + 1, max_cells_per_dim)
    ny = np.minimum(iy1 - iy0 + 1, max_cells_per_dim)
    counts = (nx * ny).astype(np.int64)
    row = np.repeat(np.arange(ix0.size, dtype=np.int64), counts)
    # per-row local offset 0..count-1 → (dx, dy)
    offs = np.arange(row.size, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    nyr = np.repeat(ny, counts)
    dx = offs // nyr
    dy = offs % nyr
    ix = np.repeat(ix0, counts) + dx
    iy = np.repeat(iy0, counts) + dy
    cells = pack(np.repeat(res, counts), ix, iy)
    return row, cells


def _grid_xy_vec_res(lon: np.ndarray, lat: np.ndarray, res: np.ndarray):
    """grid_xy with a per-row resolution array."""
    n = (np.int64(1) << res).astype(np.float64)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix, iy


def ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` at the same
    resolution (longitude wraps; latitude clamps).  The kNN expansion
    neighborhood — the analogue of the reference's NN partitioner expansion
    cells (AbstractPartitioner.java:88-137)."""
    res, ix, iy = unpack(np.asarray([cell], dtype=np.int64))
    r, ix, iy = int(res[0]), int(ix[0]), int(iy[0])
    n = 1 << r
    xs = (np.arange(ix - k, ix + k + 1, dtype=np.int64)) % n
    ys = np.arange(max(iy - k, 0), min(iy + k, n - 1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(np.unique(xs), ys, indexing="ij")
    return pack(np.full(gx.size, r, dtype=np.int64), gx.ravel(), gy.ravel())


# ---------------------------------------------------------------------------
# Hilbert curve (the reference's default ordering, HilbertSFC.java:201 via
# uzaygezen CompactHilbertCurve) — vectorized iterative xy↔d transform.
# Key layout identical to Morton: (res << 58) | d, and the Hilbert index
# nests (parent d = child d >> 2), so the engine's bit-shift parent-key
# machinery works unchanged.  Cover-join correctness is curve-independent;
# Hilbert buys lexicographic-range locality (sorted scans / Iceberg sort
# order), which is why it is offered as a swap-in rather than the default
# hot path (the iterative transform doesn't codegen like Morton's masks).
# ---------------------------------------------------------------------------


def hilbert_xy2d(ix, iy, res: int) -> np.ndarray:
    """Grid coords → Hilbert distance at ``res`` (vectorized, standard
    iterative quadrant-rotation algorithm)."""
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(res - 1) if res > 0 else np.int64(0)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_d2xy(d, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_xy2d`."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    n = np.int64(1) << np.int64(res)
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # rotate
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def pack_curve(res, d) -> np.ndarray:
    """(res, curve distance) → int64 cell id (same layout as :func:`pack`)."""
    return (
        (np.asarray(res, dtype=np.uint64) << np.uint64(RES_SHIFT))
        | np.asarray(d, dtype=np.uint64)
    ).astype(np.int64)


def encode_hilbert(lon, lat, res: int) -> np.ndarray:
    ix, iy = grid_xy(lon, lat, res)
    return pack_curve(np.full_like(ix, res), hilbert_xy2d(ix, iy, res))


def cover_bbox_hilbert(minx, miny, maxx, maxy, res: int) -> np.ndarray:
    """All Hilbert cell ids at ``res`` intersecting the (non-wrapping) box."""
    ix0, iy0 = grid_xy(minx, miny, res)
    ix1, iy1 = grid_xy(maxx, maxy, res)
    xs = np.arange(int(ix0), int(ix1) + 1, dtype=np.int64)
    ys = np.arange(int(iy0), int(iy1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    d = hilbert_xy2d(gx.ravel(), gy.ravel(), res)
    return pack_curve(np.full(d.size, res, dtype=np.int64), d)


# ---------------------------------------------------------------------------
# XZ-ordering for spatial extents (the reference's XZOrderSFC.java:95-178 —
# Böhm/Klump/Kriegel XZ-ordering): each extent receives ONE code, that of
# the coarsest quadtree anchor cell whose 2×-ENLARGED extension contains
# it.  ``xz_encode`` is the float-degree form (encode + invariants); the
# QUERY path uses the exact milli-integer twins below
# (``xz_encode_milli`` / ``xz_query_nodes_milli`` — the XZOrderSFC
# getQueryRanges analogue) so decomposition and keys share one integer
# lattice, replayable in SQL oracles.
# ---------------------------------------------------------------------------

XZ_G = 16  # max refinement level (matches the reference's 2-D default scale)


def xz_encode(minx, miny, maxx, maxy, g: int = XZ_G) -> np.ndarray:
    """Extents (degrees) → int64 XZ sequence codes.

    code(l, q_1..q_l) = Σ_i [ q_i · (4^(g-i+1) − 1)/3 + 1 ] — the standard
    depth-first enumeration of the quadtree prefix; q_i is the i-th
    quadrant digit (x-major) of the anchor cell at level l."""
    # clamp to the world box (the reference normalizes ranges the same way)
    nx0 = np.clip((np.asarray(minx, np.float64) + 180.0) / 360.0, 0.0, 1.0 - 1e-12)
    nx1 = np.clip((np.asarray(maxx, np.float64) + 180.0) / 360.0, 0.0, 1.0 - 1e-12)
    ny0 = np.clip((np.asarray(miny, np.float64) + 90.0) / 180.0, 0.0, 1.0 - 1e-12)
    ny1 = np.clip((np.asarray(maxy, np.float64) + 90.0) / 180.0, 0.0, 1.0 - 1e-12)
    w = np.maximum(np.maximum(nx1 - nx0, ny1 - ny0), 1e-12)
    lvl = np.clip(np.floor(-np.log2(w)).astype(np.int64), 0, g)

    def fits(level):
        cell = np.ldexp(1.0, -level.astype(np.int64))
        x0 = np.floor(nx0 / cell) * cell
        y0 = np.floor(ny0 / cell) * cell
        return (nx1 <= x0 + 2 * cell) & (ny1 <= y0 + 2 * cell)

    # the log2 estimate can overshoot by one level — step down until the
    # enlarged anchor contains the extent (≤ 2 steps by construction)
    for _ in range(2):
        lvl = np.where(fits(lvl), lvl, np.maximum(lvl - 1, 0))

    n = np.int64(1) << lvl
    ix = np.minimum((nx0 * n).astype(np.int64), n - 1)
    iy = np.minimum((ny0 * n).astype(np.int64), n - 1)

    code = np.zeros(lvl.shape, dtype=np.int64)
    for i in range(1, g + 1):
        active = lvl >= i
        bx = (ix >> (lvl - i).clip(0)) & 1
        by = (iy >> (lvl - i).clip(0)) & 1
        q = 2 * bx + by
        step = (4 ** (g - i + 1) - 1) // 3
        code = np.where(active, code + q * step + 1, code)
    return code


def xz_decode_cell(code, g: int = XZ_G):
    """XZ code → (level, ix, iy) of the anchor cell (inverse enumeration)."""
    code = np.asarray(code, dtype=np.int64).copy()
    lvl = np.zeros(code.shape, dtype=np.int64)
    ix = np.zeros(code.shape, dtype=np.int64)
    iy = np.zeros(code.shape, dtype=np.int64)
    for i in range(1, g + 1):
        step = (4 ** (g - i + 1) - 1) // 3
        active = code > 0
        code = np.where(active, code - 1, code)
        q = np.where(active, code // step, 0)
        code = np.where(active, code - q * step, code)
        ix = np.where(active, (ix << 1) | (q >> 1), ix)
        iy = np.where(active, (iy << 1) | (q & 1), iy)
        lvl = np.where(active, i, lvl)
    return lvl, ix, iy


def xz_step(i: int, g: int = XZ_G) -> int:
    """Size of (= code count in) a subtree rooted at a level-``i`` node:
    (4^(g-i+1) − 1)/3.  Identical to the per-level step of the depth-first
    enumeration — a level-i node's subtree is the contiguous code interval
    [code, code + xz_step(i) − 1]."""
    return (4 ** (g - i + 1) - 1) // 3


def xz_encode_milli(minx_m, miny_m, maxx_m, maxy_m, g: int = XZ_G):
    """Exact-integer XZ encode over the milli-degree lattice.

    Returns ``(lvl, ix, iy, prefix)`` — anchor level/coords plus the
    (n, g+1) int64 matrix of ancestor codes ``prefix[:, i]`` = code of the
    level-i anchor on the path root→anchor (−1 beyond ``lvl``); the
    extent's own code is ``prefix[r, lvl[r]]``.  All comparisons are
    integer cross-multiplications — no float anywhere — so the Catalyst
    twin (cols.xz_prefix_codes_milli_col) and the DuckDB oracle replay it
    bit-identically.

    Level selection uses the fits-monotonicity of XZ anchoring (an extent
    that fits the 2×-enlarged anchor at level l+1 also fits at level l),
    so lvl = Σ_l fits(l) — no log2, no step-down fix-up."""
    X0 = np.asarray(minx_m, np.int64) + 180_000
    X1 = np.asarray(maxx_m, np.int64) + 180_000
    Y0 = np.asarray(miny_m, np.int64) + 90_000
    Y1 = np.asarray(maxy_m, np.int64) + 90_000
    DX, DY = np.int64(LON_SPAN_MILLI), np.int64(LAT_SPAN_MILLI)

    lvl = np.zeros(X0.shape, dtype=np.int64)
    for l in range(1, g + 1):
        n = np.int64(1) << l
        fx = X1 * n <= ((X0 * n) // DX + 2) * DX
        fy = Y1 * n <= ((Y0 * n) // DY + 2) * DY
        lvl += (fx & fy).astype(np.int64)

    n = np.int64(1) << lvl
    ix = np.minimum((X0 * n) // DX, n - 1)
    iy = np.minimum((Y0 * n) // DY, n - 1)

    prefix = np.full((*lvl.shape, g + 1), -1, dtype=np.int64)
    code = np.zeros(lvl.shape, dtype=np.int64)
    prefix[..., 0] = 0
    for i in range(1, g + 1):
        active = lvl >= i
        bx = (ix >> np.maximum(lvl - i, 0)) & 1
        by = (iy >> np.maximum(lvl - i, 0)) & 1
        q = 2 * bx + by
        code = np.where(active, code + q * np.int64(xz_step(i, g)) + 1, code)
        prefix[..., i] = np.where(active, code, -1)
    return lvl, ix, iy, prefix


def xz_query_nodes_milli(
    qminx_m: int, qminy_m: int, qmaxx_m: int, qmaxy_m: int,
    g: int = XZ_G, max_nodes: int = 2000,
):
    """XZ range decomposition (XZOrderSFC.getQueryRanges analogue) as two
    node sets over the SAME integer lattice as :func:`xz_encode_milli`:

    - ``contained``: [(code, level)] — query box contains the node's cell,
      so EVERY extent anchored anywhere in the node's subtree intersects
      the query (its min corner lies inside the cell ⊆ query).  Matched by
      joining any ancestor code.
    - ``overlapped``: [code] — the node's 2×-enlarged cell merely overlaps
      the query; only extents anchored EXACTLY here are candidates.
      Matched by joining the extent's own code.

    Pruning is exact: a child's enlarged cell is contained in its parent's,
    so a subtree whose enlarged cell misses the query holds no candidate.
    The ``max_nodes`` budget (reference MAX_RANGE_DECOMPOSITION=2000)
    coarsens by promoting the remaining frontier to ``contained`` —
    always a superset, never a miss.  The two sets are disjoint code
    regions (subtrees of stopped recursion vs anchors above them), so a
    (extent, query) pair matches AT MOST ONCE — the join needs no dedup."""
    X0, X1 = int(qminx_m) + 180_000, int(qmaxx_m) + 180_000
    Y0, Y1 = int(qminy_m) + 90_000, int(qmaxy_m) + 90_000
    DX, DY = LON_SPAN_MILLI, LAT_SPAN_MILLI
    contained: list[tuple[int, int]] = []
    overlapped: list[int] = []
    frontier: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)]
    while frontier:
        if len(contained) + len(overlapped) + len(frontier) >= max_nodes:
            contained.extend((c, l) for l, _, _, c in frontier)
            break
        l, ix, iy, c = frontier.pop()
        n = 1 << l
        if (
            X0 * n <= ix * DX and (ix + 1) * DX <= X1 * n
            and Y0 * n <= iy * DY and (iy + 1) * DY <= Y1 * n
        ):
            contained.append((c, l))
            continue
        if not (
            ix * DX <= X1 * n and (ix + 2) * DX >= X0 * n
            and iy * DY <= Y1 * n and (iy + 2) * DY >= Y0 * n
        ):
            continue
        overlapped.append(c)
        if l < g:
            step = xz_step(l + 1, g)
            for q in range(4):
                frontier.append(
                    (l + 1, 2 * ix + (q >> 1), 2 * iy + (q & 1), c + q * step + 1)
                )
    return contained, overlapped


def xz_query_ranges_milli(
    qminx_m: int, qminy_m: int, qmaxx_m: int, qmaxy_m: int,
    g: int = XZ_G, max_nodes: int = 2000,
) -> list[tuple[int, int]]:
    """The decomposition as merged sorted [lo, hi] code ranges — what a
    sorted KV store would seek (contained node → its whole subtree
    interval; overlapped node → its single anchor code).  The Spark path
    executes the node sets as an equi-join instead (operators/xz.py); this
    form exists for index-strategy parity and file-pruning pushdown, and
    membership is provably identical to the node-set semantics."""
    contained, overlapped = xz_query_nodes_milli(
        qminx_m, qminy_m, qmaxx_m, qmaxy_m, g, max_nodes
    )
    ivs = sorted(
        [(c, c + xz_step(l, g) - 1) for c, l in contained]
        + [(c, c) for c in overlapped]
    )
    merged: list[tuple[int, int]] = []
    for lo, hi in ivs:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
