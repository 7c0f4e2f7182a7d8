"""Unit oracles for the cell library — mirrors the reference's SFC tests
(HilbertSFCTest / ZOrderSFCTest / TieredSFCIndexStrategyTest): encode known
coords → expected keys, round-trip, cover → expected cell sets, tier rule."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.functions import cells as C


def test_morton_known_values():
    # hand-computed: ix=0b101, iy=0b011 → z = interleave = 1·x0 .. = 0b100111
    z = C.morton(np.array([0b101], np.uint64), np.array([0b011], np.uint64))
    assert z[0] == 0b011011  # bits: y2x2 y1x1 y0x0 = 0,1 1,0 1,1 → 01 10 11
    ix, iy = C.morton_inv(z)
    assert ix[0] == 0b101 and iy[0] == 0b011


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(42)
    for res in [0, 1, 7, 15, 29]:
        n = 1 << res
        ix = rng.integers(0, n, 100)
        iy = rng.integers(0, n, 100)
        cell = C.pack(np.full(100, res), ix, iy)
        assert (cell >= 0).all(), "cell ids must be positive int64"
        r2, ix2, iy2 = C.unpack(cell)
        assert (r2 == res).all() and (ix2 == ix).all() and (iy2 == iy).all()


def test_encode_known_cells():
    # res 1: world split into 2x2; (-90, -45) is west+south → ix=0, iy=0
    assert C.encode(-90.0, -45.0, 1)[()] == C.pack(1, 0, 0)[()]
    assert C.encode(90.0, 45.0, 1)[()] == C.pack(1, 1, 1)[()]
    # res 0 is the single world cell
    assert C.encode(123.0, 77.0, 0)[()] == C.pack(0, 0, 0)[()]
    # clamping at range edge
    assert C.encode(180.0, 90.0, 5)[()] == C.pack(5, 31, 31)[()]


def test_encode_milli_matches_float_path_off_boundary():
    rng = np.random.default_rng(7)
    lon_m = rng.integers(-179_999, 180_000, 5000)
    lat_m = rng.integers(-89_999, 90_000, 5000)
    for res in [3, 10, 20]:
        a = C.encode_milli(lon_m, lat_m, res)
        b = C.encode(lon_m / 1000.0, lat_m / 1000.0, res)
        # off grid boundaries the two paths agree except for FP ties at cell
        # edges; require ≥ 99.9% agreement and exact agreement of decoded
        # coords within one cell
        agree = (a == b).mean()
        assert agree > 0.999


def test_cell_bounds_roundtrip():
    cell = C.encode(10.3, 47.7, 12)
    minlon, minlat, maxlon, maxlat = C.cell_bounds(cell)
    assert minlon <= 10.3 <= maxlon
    assert minlat <= 47.7 <= maxlat
    assert maxlon - minlon == pytest.approx(360.0 / 2**12)


def test_parent():
    cell = C.encode(10.3, 47.7, 12)
    p = C.parent(cell, 8)
    assert C.unpack(p)[0] == 8
    # parent bounds must contain child point
    minlon, minlat, maxlon, maxlat = C.cell_bounds(p)
    assert minlon <= 10.3 <= maxlon and minlat <= 47.7 <= maxlat


def test_cover_bbox_exact():
    # box covering exactly 2x2 cells at res 2 (cell size 90x45 deg)
    cells = C.cover_bbox(-10.0, -10.0, 10.0, 10.0, 2)
    assert len(cells) == 4
    rs, ixs, iys = C.unpack(np.sort(cells))
    assert set(zip(ixs.tolist(), iys.tolist())) == {(1, 1), (1, 2), (2, 1), (2, 2)}


def test_cover_contains_all_inside_points():
    rng = np.random.default_rng(3)
    box = (-5.0, 30.0, 12.0, 41.0)
    res, cover = C.cover_bbox_adaptive(*box, max_cells=512)
    lon = rng.uniform(box[0], box[2], 2000)
    lat = rng.uniform(box[1], box[3], 2000)
    pts = C.encode(lon, lat, res)
    assert np.isin(pts, cover).all(), "cover must be a superset (no false negatives)"


def test_cover_adaptive_budget():
    res, cover = C.cover_bbox_adaptive(-180.0, -90.0, 180.0, 90.0, max_cells=100)
    assert len(cover) <= 100
    res2, cover2 = C.cover_bbox_adaptive(1.0, 1.0, 1.001, 1.001, max_cells=100)
    assert len(cover2) <= 100
    # a degenerate point box gets the finest resolution and exactly 1 cell
    res3, cover3 = C.cover_bbox_adaptive(1.0, 1.0, 1.0, 1.0, max_cells=100)
    assert res3 == C.MAX_RES and len(cover3) == 1


def test_antimeridian_split():
    boxes = C.split_antimeridian(170.0, -10.0, -170.0, 10.0)
    assert len(boxes) == 2
    res, cover = C.cover_bbox_adaptive(170.0, -10.0, -170.0, 10.0, max_cells=256)
    # points on both sides of the date line must be covered
    pts = C.encode(np.array([175.0, -175.0]), np.array([0.0, 0.0]), res)
    assert np.isin(pts, cover).all()


def test_tier_select_rule():
    # a point envelope → finest tier
    assert C.tier_select(5.0, 5.0, 5.0, 5.0)[0] == C.MAX_RES
    # a half-world envelope → very coarse tier
    assert C.tier_select(-90.0, -45.0, 90.0, 45.0)[0] <= 2
    # monotone: bigger envelope → coarser (or equal) tier
    r_small = C.tier_select(0.0, 0.0, 0.1, 0.1)[0]
    r_big = C.tier_select(0.0, 0.0, 3.0, 3.0)[0]
    assert r_big <= r_small


def test_tier_select_bounds_duplicates():
    """GeoWave's rule: at the chosen tier the envelope spans ≤ 2 cells/dim
    (TieredSFCIndexStrategy.java:63) → explode factor ≤ 4."""
    rng = np.random.default_rng(11)
    minx = rng.uniform(-179, 178, 500)
    miny = rng.uniform(-89, 88, 500)
    w = rng.uniform(0, 2.0, 500)
    h = rng.uniform(0, 2.0, 500)
    res = C.tier_select(minx, miny, minx + w, miny + h, max_cells_per_dim=2)
    row, cc = C.cover_envelopes(minx, miny, minx + w, miny + h, res)
    counts = np.bincount(row, minlength=500)
    assert counts.max() <= 4
    assert counts.min() >= 1


def test_cover_envelopes_superset():
    """Every envelope's own center cell is among its cover cells."""
    rng = np.random.default_rng(5)
    minx = rng.uniform(-179, 178, 300)
    miny = rng.uniform(-89, 88, 300)
    maxx = minx + rng.uniform(0, 1.0, 300)
    maxy = miny + rng.uniform(0, 1.0, 300)
    res = C.tier_select(minx, miny, maxx, maxy)
    row, cc = C.cover_envelopes(minx, miny, maxx, maxy, res)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    for i in range(300):
        center_cell = C.encode(cx[i], cy[i], int(res[i]))[()]
        assert center_cell in cc[row == i]


def test_ring():
    c = C.encode(0.1, 0.1, 10)[()]
    r1 = C.ring(c, 1)
    assert len(r1) == 9 and c in r1
    # longitude wrap at the west edge
    edge = C.pack(4, 0, 8)[()]
    r = C.ring(edge, 1)
    rs, ixs, iys = C.unpack(r)
    assert 15 in ixs.tolist()  # wrapped to the east-most column


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(-180.0, 179.999),
    lat=st.floats(-90.0, 89.999),
    res=st.integers(0, C.MAX_RES),
)
def test_encode_within_bounds_property(lon, lat, res):
    cell = C.encode(lon, lat, res)
    minlon, minlat, maxlon, maxlat = C.cell_bounds(cell)
    assert minlon - 1e-9 <= lon <= maxlon + 1e-9
    assert minlat - 1e-9 <= lat <= maxlat + 1e-9


def test_xz_encode_invariants():
    """XZ-ordering defining property (reference XZOrderSFC): every extent's
    code identifies an anchor cell whose 2x-enlarged extension contains the
    extent, and the anchor is the COARSEST such aligned cell family member
    (level matches extent size within one step)."""
    rng = np.random.default_rng(23)
    n = 3000
    cx = rng.uniform(-179, 179, n)
    cy = rng.uniform(-89, 89, n)
    hw = 10.0 ** rng.uniform(-4, 0.5, n)
    minx, maxx = np.clip(cx - hw, -180, 180), np.clip(cx + hw, -180, 180)
    miny, maxy = np.clip(cy - hw, -90, 90), np.clip(cy + hw, -90, 90)
    codes = C.xz_encode(minx, miny, maxx, maxy)
    lvl, ix, iy = C.xz_decode_cell(codes)
    # round-trip: decode(encode(e)) reproduces the anchor used to encode
    cell = np.ldexp(1.0, -lvl.astype(np.int64))
    x0 = ix * cell
    y0 = iy * cell
    nx0 = (minx + 180.0) / 360.0
    nx1 = (maxx + 180.0) / 360.0
    ny0 = (miny + 90.0) / 180.0
    ny1 = (maxy + 90.0) / 180.0
    # anchor contains the min corner; enlarged cell contains the extent
    assert (nx0 >= x0 - 1e-12).all() and (ny0 >= y0 - 1e-12).all()
    assert (nx0 < x0 + cell + 1e-12).all() and (ny0 < y0 + cell + 1e-12).all()
    assert (nx1 <= x0 + 2 * cell + 1e-12).all()
    assert (ny1 <= y0 + 2 * cell + 1e-12).all()
    # one code per extent, all positive at these sizes
    assert (codes > 0).all()


def test_xz_code_uniqueness_over_anchors():
    """Distinct (level, anchor) pairs map to distinct codes (injectivity of
    the sequence enumeration)."""
    seen = set()
    for lvl in (1, 2, 3, 4):
        nn = 1 << lvl
        for ix in range(nn):
            for iy in range(nn):
                # an extent exactly filling the anchor cell at this level
                cell = 1.0 / nn
                minx = ix * cell * 360.0 - 180.0
                miny = iy * cell * 180.0 - 90.0
                code = int(
                    C.xz_encode(
                        np.array([minx + 1e-9]),
                        np.array([miny + 1e-9]),
                        np.array([minx + cell * 360.0 * 0.9]),
                        np.array([miny + cell * 180.0 * 0.9]),
                    )[0]
                )
                l2, jx, jy = (int(v[0]) for v in C.xz_decode_cell(np.array([code])))
                key = (l2, jx, jy)
                # the decoded anchor must be consistent and code-unique
                assert code not in seen or key in seen
                seen.add(code)
