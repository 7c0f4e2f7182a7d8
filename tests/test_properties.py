"""Hypothesis property tests for the numpy definitional kernels — the
invariants the whole engine rests on, searched over the input space
instead of pinned at fixed seeds (SURVEY §5: the reference's IT suites
assert the same classes of invariant with hand-picked fixtures)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.functions import cells as C
from geowave_spark.functions import geometry as G

RES = st.integers(min_value=0, max_value=C.MAX_RES)
LON_M = st.integers(min_value=-180_000, max_value=179_999)
LAT_M = st.integers(min_value=-90_000, max_value=89_999)


@settings(max_examples=200, deadline=None)
@given(res=RES, data=st.data())
def test_pack_unpack_roundtrip(res, data):
    n = 1 << res
    ix = data.draw(st.integers(min_value=0, max_value=n - 1))
    iy = data.draw(st.integers(min_value=0, max_value=n - 1))
    cell = C.pack(res, ix, iy)
    r, x, y = C.unpack(cell)
    assert (int(r), int(x), int(y)) == (res, ix, iy)


@settings(max_examples=200, deadline=None)
@given(lon_m=LON_M, lat_m=LAT_M, res=RES)
def test_encode_bounds_containment(lon_m, lat_m, res):
    """A point's cell bounds always contain the point (half-open)."""
    cell = C.encode_milli(np.asarray([lon_m]), np.asarray([lat_m]), res)
    mnx, mny, mxx, mxy = C.cell_bounds(cell)
    lon, lat = lon_m / 1000.0, lat_m / 1000.0
    assert mnx[0] <= lon and lon < mxx[0] + 1e-9
    assert mny[0] <= lat and lat < mxy[0] + 1e-9


@settings(max_examples=150, deadline=None)
@given(lon_m=LON_M, lat_m=LAT_M, res=st.integers(2, C.MAX_RES))
def test_parent_nesting(lon_m, lat_m, res):
    """The parent at every coarser res equals direct encoding at that res
    (bit-shift nesting: SURVEY §2.1 'coarser tier = shift of same key')."""
    fine = C.encode_milli(np.asarray([lon_m]), np.asarray([lat_m]), res)
    for pr in (0, res // 2, res - 1):
        want = C.encode_milli(np.asarray([lon_m]), np.asarray([lat_m]), pr)
        assert int(C.parent(fine, pr)[0]) == int(want[0])


@settings(max_examples=100, deadline=None)
@given(
    lon0=st.floats(-179.9, 179.0), lat0=st.floats(-89.9, 88.0),
    dlon=st.floats(0.001, 3.0), dlat=st.floats(0.001, 1.5),
    res=st.integers(3, 12), data=st.data(),
)
def test_cover_bbox_completeness(lon0, lat0, dlon, dlat, res, data):
    """Every point inside the box encodes to a cell in the box's cover —
    the completeness invariant the cover join's correctness rests on."""
    lon1 = min(lon0 + dlon, 179.999)
    lat1 = min(lat0 + dlat, 89.999)
    cover = set(int(c) for c in C.cover_bbox(lon0, lat0, lon1, lat1, res))
    fx = data.draw(st.floats(0.0, 1.0))
    fy = data.draw(st.floats(0.0, 1.0))
    px = lon0 + (lon1 - lon0) * fx
    py = lat0 + (lat1 - lat0) * fy
    cell = int(C.encode(np.asarray([px]), np.asarray([py]), res)[0])
    assert cell in cover


@settings(max_examples=50, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(-500, 500)),
        min_size=3, max_size=60, unique=True,
    )
)
def test_concave_hull_invariants(pts):
    """Concave hull: every input point stays inside-or-on the ring, every
    vertex is an input point, and area never exceeds the convex hull's."""
    arr = np.asarray(pts, dtype=np.float64)
    cv = G.convex_hull(arr)
    if len(cv) < 3 or G.ring_area2(cv) <= 0:
        return  # collinear draw — degenerate by contract
    cc = G.concave_hull(arr)
    assert 0 < G.ring_area2(cc) <= G.ring_area2(cv)
    ptset = {tuple(p) for p in arr}
    assert all(tuple(v) in ptset for v in cc)
    n = len(cc)
    segs = [(tuple(cc[i]), tuple(cc[(i + 1) % n])) for i in range(n)]
    inside = G.points_in_polygon(arr[:, 0], arr[:, 1], [[cc]])
    dmin = np.array(
        [min(G._seg_profile(s, e, (px, py))[1] for s, e in segs) for px, py in arr]
    )
    assert (inside | (dmin < 1e-9)).all()
    # simple ring: non-adjacent edges never cross (round-3 review: the dig's
    # crossing check skipped BOTH ring neighbors for both new segments, so a
    # dig could thread an existing pocket and self-intersect)
    for i in range(n):
        for j in range(i + 1, n):
            if j == (i + 1) % n or (j + 1) % n == i or (i == 0 and j == n - 1):
                continue
            assert not G._segs_cross(*segs[i], *segs[j]), (i, j)


@settings(max_examples=100, deadline=None)
@given(res=st.integers(1, 12), data=st.data())
def test_hilbert_bijection(res, data):
    n = 1 << res
    ix = data.draw(st.integers(0, n - 1))
    iy = data.draw(st.integers(0, n - 1))
    d = C.hilbert_xy2d(np.asarray([ix]), np.asarray([iy]), res)
    x2, y2 = C.hilbert_d2xy(d, res)
    assert (int(x2[0]), int(y2[0])) == (ix, iy)
