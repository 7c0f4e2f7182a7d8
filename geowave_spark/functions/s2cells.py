"""S2-analogue cell ids — 6-face decomposition + S2's exact id algebra.

The build brief's H3/S2 axis: functions/hexgrid.py is the H3-analogue
(hex Voronoi binning); this module is the S2-analogue — the part of S2
that matters for a distributed index is not the spherical projection
but the **id algebra**:

* a 64-bit cell id = ``face | position | sentinel-lsb`` where the
  sentinel's position encodes the level,
* every cell's descendants occupy ONE CONTIGUOUS id interval
  ``[id - lsb + 1, id + lsb - 1]`` (lsb = lowest set bit), so spatial
  containment is integer range containment — range scans, parquet
  min/max pruning, and sort-merge range joins all apply directly,
* parent/level extraction are two-instruction bit tricks,
* a query region is answered by a NORMALIZED MIXED-LEVEL COVERING
  (coarse cells in the interior, fine cells on the boundary), with
  interior cells needing no exact refinement.

That algebra is reproduced here exactly (same bit layout rules as
s2geometry's S2CellId: sentinel construction, ``range_min/max``,
``parent``).  What is *analogous* rather than identical is the face
chart: true S2 projects through a cube with trigonometric boundaries,
which cannot be replayed bit-for-bit in ANSI SQL.  Following the repo's
oracle convention (exact integer arithmetic end-to-end), the sphere is
split into 6 integer lat/lon rectangles:

    faces 0..3  equatorial: lat ∈ [-45°, 45°), lon quadrants of 90°
    face  4     north cap:  lat ∈ [45°, 90°]
    face  5     south cap:  lat ∈ [-90°, -45°)

Each face is charted by integer milli-degree offsets (u, v) and
quantized to a 2^level × 2^level grid (anisotropic on the caps, like
the repo's base equirectangular grid); position within a face is the
Morton interleave of (iu, iv) — Morton rather than Hilbert keeps the
hot path inside whole-stage codegen (functions/cols.py twin) and
preserves every id-algebra property above, which depend only on the
prefix-nesting of the position bits, not on the curve; the repo's
Hilbert machinery (cells.hilbert_xy2d) remains the swap-in for
locality-sensitive orderings.

Reference parity: GeoWave's tiered SFC strategy
(core/index/.../sfc/tiered/TieredSFCIndexStrategy.java) unions
per-resolution indexes; S2-style ids fold the whole ladder into one
sortable key space — the alternative layout named in the build brief.

The numpy kernel here is the tested definitional oracle; the hot path
is the Catalyst twin in functions/cols.py (s2_leaf_col), and the DuckDB
registry oracles replay the identical arithmetic (registry.py s2_cells,
s2_bbox).
"""

from __future__ import annotations

import numpy as np

from geowave_spark.functions import cells as C

MAX_LEVEL = 24  # 48 position bits + 3 face bits + sentinel = 52 bits
FACE_SHIFT = 2 * MAX_LEVEL + 1  # 49

X_OFF = 180_000
EQ_LAT = 45_000  # equatorial band half-height, milli-degrees

# Per-face chart spans (u, v) in milli-degrees.
EQ_SPAN = 90_000
CAP_USPAN = 360_000
CAP_VSPAN = 45_000


def face_uv(lon_milli, lat_milli):
    """(face, u, v) integer chart coordinates — the analogue's 6-chart
    atlas.  All branches are integer CASE logic; closed edges clamp
    into the face's half-open chart box."""
    lon = np.asarray(lon_milli, dtype=np.int64)
    lat = np.asarray(lat_milli, dtype=np.int64)
    if (np.abs(lon) > X_OFF).any() or (np.abs(lat) > 90_000).any():
        raise ValueError("coordinates outside the milli-degree world box")
    north = lat >= EQ_LAT
    south = lat < -EQ_LAT
    eq_face = np.minimum((lon + X_OFF) // EQ_SPAN, 3)
    face = np.where(north, 4, np.where(south, 5, eq_face))
    u = np.where(
        north | south,
        np.minimum(lon + X_OFF, CAP_USPAN - 1),
        # the closed world edge lon=+180° clamps into face 3's half-open
        # chart box, exactly as the caps clamp their top edge
        np.minimum(lon + X_OFF - eq_face * EQ_SPAN, EQ_SPAN - 1),
    )
    v = np.where(
        north,
        np.minimum(lat - EQ_LAT, CAP_VSPAN - 1),
        np.where(south, -lat - EQ_LAT - 1, lat + EQ_LAT),
    )
    return face, u, v


def face_spans(face):
    """(USPAN, VSPAN) chart extents for ``face`` (vectorized)."""
    cap = np.asarray(face) >= 4
    return (
        np.where(cap, CAP_USPAN, EQ_SPAN),
        np.where(cap, CAP_VSPAN, EQ_SPAN),
    )


def quantize(face, u, v, level: int):
    """Chart coords → (iu, iv) on the face's 2^level grid.  Truncating
    division on non-negative operands (Spark DIV / DuckDB ``//`` exact);
    the closed upper edge clamps to n-1."""
    n = 1 << level
    us, vs = face_spans(face)
    iu = np.minimum(np.asarray(u, dtype=np.int64) * n // us, n - 1)
    iv = np.minimum(np.asarray(v, dtype=np.int64) * n // vs, n - 1)
    return iu, iv


def cell_id(face, iu, iv, level: int) -> np.ndarray:
    """(face, iu, iv, level) → S2-style id: position bits left-aligned
    under the face bits, sentinel lsb at bit 2*(MAX_LEVEL-level)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"s2 level {level} outside [0, {MAX_LEVEL}]")
    pos = C.morton(
        np.asarray(iu, dtype=np.int64), np.asarray(iv, dtype=np.int64)
    ).astype(np.int64)
    shift = 2 * (MAX_LEVEL - level)
    base = (np.asarray(face, dtype=np.int64) << (2 * level)) | pos
    return (base << (shift + 1)) | (np.int64(1) << np.int64(shift))


def leaf_id(lon_milli, lat_milli) -> np.ndarray:
    """Point → MAX_LEVEL leaf cell id (lsb = bit 0 set)."""
    face, u, v = face_uv(lon_milli, lat_milli)
    iu, iv = quantize(face, u, v, MAX_LEVEL)
    return cell_id(face, iu, iv, MAX_LEVEL)


def lsb(cid) -> np.ndarray:
    cid = np.asarray(cid, dtype=np.int64)
    return cid & (-cid)


def level_of(cid) -> np.ndarray:
    """Sentinel position → level.  float log2 of a power of two is exact
    below 2^52 (the id space tops out at 2^52)."""
    t = np.log2(lsb(cid).astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - t // 2


def parent(cid, level: int) -> np.ndarray:
    """Ancestor at ``level`` — S2's ``(id & -new_lsb) | new_lsb``."""
    new_lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    cid = np.asarray(cid, dtype=np.int64)
    return (cid & (-new_lsb)) | new_lsb


def range_min(cid) -> np.ndarray:
    """Smallest leaf id inside the cell — contiguity is the point."""
    return np.asarray(cid, dtype=np.int64) - lsb(cid) + 1


def range_max(cid) -> np.ndarray:
    return np.asarray(cid, dtype=np.int64) + lsb(cid) - 1


def decode(cid):
    """id → (face, iu, iv, level) at the cell's own level."""
    cid = np.asarray(cid, dtype=np.int64)
    lvl = level_of(cid)
    shift = 2 * (MAX_LEVEL - lvl)
    base = cid >> (shift + 1)
    pos = base & ((np.int64(1) << (2 * lvl)) - 1)
    face = base >> (2 * lvl)
    iu, iv = C.morton_inv(pos)
    return face, iu, iv, lvl


def cell_chart_bounds(face, iu, iv, level: int):
    """Cell → the CLOSED integer chart interval it actually covers,
    (u_lo, u_hi, v_lo, v_hi): the exact inverse of ``quantize``'s
    truncating division — ``floor(u*n/us) == iu`` ⇔
    ``u ∈ [ceil(iu*us/n), ceil((iu+1)*us/n) - 1]``.  Floor grid lines
    here are an off-by-one (a point on the seam belongs to the cell the
    floor line excludes) — caught by the containment property test."""
    n = 1 << level
    us, vs = face_spans(face)
    iu = np.asarray(iu, dtype=np.int64)
    iv = np.asarray(iv, dtype=np.int64)
    u_lo = (iu * us + n - 1) // n
    u_hi = ((iu + 1) * us + n - 1) // n - 1
    v_lo = (iv * vs + n - 1) // n
    v_hi = ((iv + 1) * vs + n - 1) // n - 1
    return u_lo, u_hi, v_lo, v_hi


# ---------------------------------------------------------------------------
# Face geometry in lon/lat space (the analogue's faces are rectangles,
# so box↔face intersection is pure integer clipping).
# ---------------------------------------------------------------------------

def face_box_milli(face: int):
    """Closed lon/lat milli-degree box [minx, miny, maxx, maxy] of a face."""
    if face < 4:
        return (
            face * EQ_SPAN - X_OFF,
            -EQ_LAT,
            (face + 1) * EQ_SPAN - X_OFF - 1,
            EQ_LAT - 1,
        )
    if face == 4:
        return (-X_OFF, EQ_LAT, X_OFF - 1, 90_000)
    return (-X_OFF, -90_000, X_OFF - 1, -EQ_LAT - 1)


def _chart_range(face: int, lo: int, hi: int, level: int, axis: int):
    """Quantized index range [i0, i1] covering chart interval [lo, hi]."""
    span = face_spans(np.int64(face))[axis]
    n = 1 << level
    i0 = int(min(lo * n // span, n - 1))
    i1 = int(min(hi * n // span, n - 1))
    return i0, i1


def cover_bbox(minx_m, miny_m, maxx_m, maxy_m, level: int) -> np.ndarray:
    """All level-``level`` cell ids intersecting the closed milli-degree
    box (non-wrapping).  Faces are lat/lon rectangles, so this is per-
    face integer clipping + grid enumeration."""
    out = []
    for face in range(6):
        fx0, fy0, fx1, fy1 = face_box_milli(face)
        x0, x1 = max(minx_m, fx0), min(maxx_m, fx1)
        y0, y1 = max(miny_m, fy0), min(maxy_m, fy1)
        if x0 > x1 or y0 > y1:
            continue
        f = np.int64(face)
        # lon/lat corners → chart coords (monotone per-face maps; the
        # south chart reverses v, so order the endpoints after mapping)
        _, ua, va = face_uv(np.array([x0, x1]), np.array([y0, y1]))
        u0, u1 = sorted(int(t) for t in ua)
        v0, v1 = sorted(int(t) for t in va)
        iu0, iu1 = _chart_range(face, u0, u1, level, 0)
        iv0, iv1 = _chart_range(face, v0, v1, level, 1)
        gu, gv = np.meshgrid(
            np.arange(iu0, iu1 + 1, dtype=np.int64),
            np.arange(iv0, iv1 + 1, dtype=np.int64),
            indexing="ij",
        )
        out.append(cell_id(np.full(gu.size, f), gu.ravel(), gv.ravel(), level))
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    )


def cell_box_milli(cid):
    """Cell → CLOSED lon/lat milli-degree footprint (lo_lon, lo_lat,
    hi_lon, hi_lat) per element.  The chart maps are affine-monotone per
    face, so the footprint is the chart box corners mapped back to
    lon/lat (exact integers; the south chart reverses lat, hence the
    min/max)."""
    face, iu, iv, lvl = decode(cid)
    face = np.atleast_1d(face)
    iu, iv, lvl = np.atleast_1d(iu), np.atleast_1d(iv), np.atleast_1d(lvl)
    lo_lon = np.empty(face.shape, dtype=np.int64)
    hi_lon = np.empty_like(lo_lon)
    lo_lat = np.empty_like(lo_lon)
    hi_lat = np.empty_like(lo_lon)
    for L in np.unique(lvl):
        m = lvl == L
        u_lo, u_hi, v_lo, v_hi = cell_chart_bounds(face[m], iu[m], iv[m], int(L))
        lon0, lat0 = chart_to_lonlat(face[m], u_lo, v_lo)
        lon1, lat1 = chart_to_lonlat(face[m], u_hi, v_hi)
        lo_lon[m], hi_lon[m] = np.minimum(lon0, lon1), np.maximum(lon0, lon1)
        lo_lat[m], hi_lat[m] = np.minimum(lat0, lat1), np.maximum(lat0, lat1)
        # the closed world edges (lon=+180°, lat=+90°) CLAMP into the last
        # chart cell — widen those cells' footprints to include them
        us, _ = face_spans(face[m])
        top_u = ((face[m] == 3) | (face[m] >= 4)) & (u_hi == us - 1)
        hi_lon[m] = np.where(top_u, X_OFF, hi_lon[m])
        top_v = (face[m] == 4) & (v_hi == CAP_VSPAN - 1)
        hi_lat[m] = np.where(top_v, 90_000, hi_lat[m])
    return lo_lon, lo_lat, hi_lon, hi_lat


def cell_contained_in_box(cid, minx_m, miny_m, maxx_m, maxy_m) -> np.ndarray:
    """True where the cell's lon/lat footprint lies ENTIRELY inside the
    closed box — the interior/boundary split for coverings."""
    lo_lon, lo_lat, hi_lon, hi_lat = cell_box_milli(cid)
    return (
        (lo_lon >= minx_m)
        & (hi_lon <= maxx_m)
        & (lo_lat >= miny_m)
        & (hi_lat <= maxy_m)
    )


def children(cid: int) -> np.ndarray:
    """The 4 level+1 children of a single cell id."""
    face, iu, iv, lvl = decode(np.array([cid], dtype=np.int64))
    f, u, v, L = int(face[0]), int(iu[0]), int(iv[0]), int(lvl[0])
    cu = np.array([2 * u, 2 * u + 1, 2 * u, 2 * u + 1], dtype=np.int64)
    cv = np.array([2 * v, 2 * v, 2 * v + 1, 2 * v + 1], dtype=np.int64)
    return cell_id(np.full(4, f, dtype=np.int64), cu, cv, L + 1)


def chart_to_lonlat(face, u, v):
    """Inverse of face_uv on exact grid points."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.int64)
    v = np.asarray(v, dtype=np.int64)
    lon = np.where(face >= 4, u - X_OFF, u + face * EQ_SPAN - X_OFF)
    lat = np.where(
        face == 4,
        v + EQ_LAT,
        np.where(face == 5, -(v + EQ_LAT + 1), v - EQ_LAT),
    )
    return lon, lat


def covering_region(
    classify,
    max_cells: int = 48,
    fine_level: int = MAX_LEVEL,
) -> tuple[np.ndarray, np.ndarray]:
    """Budgeted mixed-level covering of an ARBITRARY region — the
    S2RegionCoverer shape (s2geometry S2RegionCoverer::GetCovering):
    seed with the 6 face cells, pop COARSEST-FIRST, classify fully-
    contained cells as interior, and subdivide crossing cells into
    their intersecting children until splitting would exceed
    ``max_cells`` (or ``fine_level``), at which point crossing cells
    land in the boundary set as-is.

    ``classify(cids: int64 array) -> int8 array`` is the region oracle:
    0 = cell outside (dropped), 1 = crossing (subdivide or boundary),
    2 = fully inside (interior) — the same 3-way verdict as
    geometry.classify_cells_vs_polygon.

    Returns (interior_ids, boundary_ids): interior cells need NO exact
    refinement downstream, boundary cells AND the exact predicate.
    Driver-side by construction: ≤ max_cells output cells and
    ≤ 4·max_cells pops — the cover is a bounded query literal
    regardless of data or region size, which is what keeps the scan
    predicate small at 100 TB."""
    import heapq

    if max_cells < 6:
        raise ValueError("max_cells must allow at least the 6 face cells")
    faces = np.array(
        [int(np.atleast_1d(cell_id(f, 0, 0, 0))[0]) for f in range(6)],
        dtype=np.int64,
    )
    verdicts = classify(faces)
    heap: list[tuple[int, int, int]] = []  # (level, cid, verdict)
    interior: list[int] = []
    boundary: list[int] = []
    for cid, v in zip(faces.tolist(), verdicts.tolist()):
        if v:
            heapq.heappush(heap, (0, cid, int(v)))
    while heap:
        lvl, cid, v = heapq.heappop(heap)
        if v == 2:
            interior.append(cid)
            continue
        budget_left = max_cells - (len(interior) + len(boundary) + len(heap))
        if lvl >= fine_level or budget_left < 4:
            boundary.append(cid)
            continue
        kids = children(cid)
        kv = classify(kids)
        for k, kvv in zip(kids.tolist(), kv.tolist()):
            if kvv:
                heapq.heappush(heap, (lvl + 1, int(k), int(kvv)))
    return (
        np.sort(np.array(interior, dtype=np.int64)),
        np.sort(np.array(boundary, dtype=np.int64)),
    )


def box_classifier(minx_m: int, miny_m: int, maxx_m: int, maxy_m: int):
    """Region oracle for a closed milli-degree box."""

    def classify(cids: np.ndarray) -> np.ndarray:
        lo_lon, lo_lat, hi_lon, hi_lat = cell_box_milli(cids)
        hit = (
            (lo_lon <= maxx_m)
            & (hi_lon >= minx_m)
            & (lo_lat <= maxy_m)
            & (hi_lat >= miny_m)
        )
        inside = (
            (lo_lon >= minx_m)
            & (hi_lon <= maxx_m)
            & (lo_lat >= miny_m)
            & (hi_lat <= maxy_m)
        )
        return np.where(inside, 2, hit.astype(np.int8)).astype(np.int8)

    return classify


def covering(
    minx_m: int,
    miny_m: int,
    maxx_m: int,
    maxy_m: int,
    max_cells: int = 48,
    fine_level: int = MAX_LEVEL,
) -> tuple[np.ndarray, np.ndarray]:
    """Budgeted covering of the closed milli-degree box — the box special
    case of ``covering_region``."""
    return covering_region(
        box_classifier(minx_m, miny_m, maxx_m, maxy_m),
        max_cells=max_cells,
        fine_level=fine_level,
    )


def merged_leaf_ranges(ids: np.ndarray) -> list[tuple[int, int]]:
    """Cells → their descendant leaf-id intervals, merged where adjacent.
    This is the payoff of the contiguity invariant: a covering becomes a
    short list of [lo, hi] ranges over ONE sorted key space — range
    predicates, parquet min/max pruning, sort-merge range joins.  Leaf
    ids are odd (sentinel bit 0), so consecutive cells' ranges differ by
    exactly 2 — merge on ``lo <= prev_hi + 2``."""
    if ids.size == 0:
        return []
    lo = np.sort(range_min(ids))
    hi = np.sort(range_max(ids))
    out: list[tuple[int, int]] = []
    cur_lo, cur_hi = int(lo[0]), int(hi[0])
    for a, b in zip(lo[1:].tolist(), hi[1:].tolist()):
        if a <= cur_hi + 2:
            cur_hi = max(cur_hi, b)
        else:
            out.append((cur_lo, cur_hi))
            cur_lo, cur_hi = a, b
    out.append((cur_lo, cur_hi))
    return out
