"""XZ-order extent index: encode invariants, Catalyst bit-parity, query
range decomposition correctness (vs brute force), dedup-free join claim.

Reference: XZOrderSFC.java:95-178 (encode), getQueryRanges (decompose),
XZHierarchicalIndexStrategy.java (point+extent composition).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.operators import xz as OX

G = C.XZ_G


def _rand_envs(n, seed, half=5000):
    rng = np.random.default_rng(seed)
    cx = rng.integers(-180_000, 180_000, n)
    cy = rng.integers(-90_000, 90_000, n)
    hw = rng.integers(0, half, n)
    hh = rng.integers(0, half, n)
    minx = np.clip(cx - hw, -180_000, 179_999)
    maxx = np.clip(cx + hw, minx, 179_999)
    miny = np.clip(cy - hh, -90_000, 89_999)
    maxy = np.clip(cy + hh, miny, 89_999)
    return minx, miny, maxx, maxy


EDGES = np.array(
    [
        # world box, world-in-x sliver, degenerate point at origin,
        # point at the +corner clamp, quadrant-seam straddlers
        (-180_000, -90_000, 179_999, 89_999),
        (-180_000, 0, 179_999, 1),
        (0, 0, 0, 0),
        (179_999, 89_999, 179_999, 89_999),
        (-1, -1, 1, 1),
        (-90_001, 44_999, -89_999, 45_001),
    ],
    dtype=np.int64,
)


def test_encode_milli_invariants():
    minx, miny, maxx, maxy = _rand_envs(20_000, 11)
    minx = np.concatenate([minx, EDGES[:, 0]])
    miny = np.concatenate([miny, EDGES[:, 1]])
    maxx = np.concatenate([maxx, EDGES[:, 2]])
    maxy = np.concatenate([maxy, EDGES[:, 3]])
    lvl, ix, iy, pref = C.xz_encode_milli(minx, miny, maxx, maxy)

    DX, DY = C.LON_SPAN_MILLI, C.LAT_SPAN_MILLI
    X0, X1 = minx + 180_000, maxx + 180_000
    Y0, Y1 = miny + 90_000, maxy + 90_000
    n = np.int64(1) << lvl

    # anchor contains the min corner; 2x-enlarged anchor contains the extent
    assert ((ix * DX <= X0 * n) & (X0 * n < (ix + 1) * DX)).all()
    assert ((iy * DY <= Y0 * n) & (Y0 * n < (iy + 1) * DY)).all()
    assert (X1 * n <= (ix + 2) * DX).all()
    assert (Y1 * n <= (iy + 2) * DY).all()

    # maximality: does NOT fit one level deeper (when lvl < G)
    deeper = lvl < G
    n2 = n * 2
    ix2 = (X0 * n2) // DX
    iy2 = (Y0 * n2) // DY
    fits2 = (X1 * n2 <= (ix2 + 2) * DX) & (Y1 * n2 <= (iy2 + 2) * DY)
    assert not (deeper & fits2).any()

    # prefix: strictly increasing codes on the path, -1 beyond lvl, and the
    # level-l entry is the code of the level-l ancestor (re-encode check)
    for r in [0, 1, 7, len(lvl) - 3, len(lvl) - 1]:
        path = pref[r]
        L = lvl[r]
        assert path[0] == 0 and (path[: L + 1] > np.concatenate([[-1], path[:L]])).all()
        assert (path[L + 1 :] == -1).all()

    # own code matches the float-degree encoder's enumeration arithmetic on
    # the shared subtree-step formula: code in [0, S(0))
    own = pref[np.arange(len(lvl)), lvl]
    assert (own >= 0).all() and (own < C.xz_step(0)).all()


def test_prefix_codes_catalyst_parity(spark):
    minx, miny, maxx, maxy = _rand_envs(4000, 23, half=40_000)
    minx = np.concatenate([minx, EDGES[:, 0]])
    miny = np.concatenate([miny, EDGES[:, 1]])
    maxx = np.concatenate([maxx, EDGES[:, 2]])
    maxy = np.concatenate([maxy, EDGES[:, 3]])
    _lvl, _ix, _iy, pref = C.xz_encode_milli(minx, miny, maxx, maxy)
    df = spark.createDataFrame(
        pd.DataFrame(
            dict(i=range(len(minx)), minx=minx, miny=miny, maxx=maxx, maxy=maxy)
        )
    )
    got = df.select(
        "i",
        X.xz_prefix_codes_milli_col(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
        ).alias("p"),
    ).collect()
    for r in got:
        want = [int(v) for v in pref[r.i] if v >= 0]
        assert list(r.p) == want, (r.i, list(r.p), want)


def _brute(envs, queries):
    """Exact (query_id, i) intersection pairs — closed milli intervals."""
    minx, miny, maxx, maxy = envs
    out = set()
    for qid, qx0, qy0, qx1, qy1 in queries:
        hit = (minx <= qx1) & (maxx >= qx0) & (miny <= qy1) & (maxy >= qy0)
        out |= {(qid, int(i)) for i in np.nonzero(hit)[0]}
    return out


QUERIES = [
    ("q_small", 9_000, 4_000, 11_000, 6_000),
    ("q_city", -74_500, 40_200, -73_500, 41_200),
    ("q_wide", -170_000, -20_000, 40_000, 20_000),
    ("q_sliver", 0, -90_000, 1, 89_999),
    ("q_point", 12_345, -45_678, 12_345, -45_678),
    ("q_world", -180_000, -90_000, 179_999, 89_999),
]


@pytest.fixture(scope="module")
def xz_indexed(spark):
    envs = _rand_envs(3000, 37, half=20_000)
    pdf = pd.DataFrame(
        dict(
            i=range(3000),
            minx_m=envs[0], miny_m=envs[1], maxx_m=envs[2], maxy_m=envs[3],
        )
    )
    return envs, OX.index_extents_xz(spark.createDataFrame(pdf)).cache()


def test_query_bbox_xz_exact_vs_brute_force(xz_indexed):
    envs, idx = xz_indexed
    got = {
        (r.query_id, r.i)
        for r in OX.query_bbox_xz(idx, QUERIES).select("query_id", "i").collect()
    }
    assert got == _brute(envs, QUERIES)


def test_prefilter_superset_and_dedup_free(xz_indexed):
    envs, idx = xz_indexed
    pre = OX.query_bbox_xz(idx, QUERIES, exact=False).select("query_id", "i")
    rows = [(r.query_id, r.i) for r in pre.collect()]
    # superset of the truth...
    assert set(rows) >= _brute(envs, QUERIES)
    # ...and each (extent, query) pair produced AT MOST ONCE: the node sets
    # cover disjoint code regions, so the join needs no dedup shuffle.
    assert len(rows) == len(set(rows))


def test_budget_coarsening_still_exact(xz_indexed):
    envs, idx = xz_indexed
    got = {
        (r.query_id, r.i)
        for r in OX.query_bbox_xz(idx, QUERIES, max_nodes=40)
        .select("query_id", "i")
        .collect()
    }
    assert got == _brute(envs, QUERIES)


def test_ranges_membership_equals_node_semantics():
    """code ∈ merged ranges  ⟺  (an ancestor is contained) ∨ (own code
    overlapped) — the sorted-scan form and the equi-join form accept
    exactly the same extents."""
    minx, miny, maxx, maxy = _rand_envs(2000, 51, half=30_000)
    lvl, _ix, _iy, pref = C.xz_encode_milli(minx, miny, maxx, maxy)
    own = pref[np.arange(len(lvl)), lvl]
    for qid, qx0, qy0, qx1, qy1 in QUERIES[:4]:
        contained, overlapped = C.xz_query_nodes_milli(qx0, qy0, qx1, qy1)
        ranges = C.xz_query_ranges_milli(qx0, qy0, qx1, qy1)
        assert len(ranges) <= 2000
        oset = set(overlapped)
        cset = {c for c, _l in contained}
        for r in range(len(lvl)):
            path = {int(v) for v in pref[r] if v >= 0}
            # node semantics: ancestor (incl. self) in contained set, or
            # own code in overlapped set
            by_nodes = bool(path & cset) or int(own[r]) in oset
            in_ranges = any(lo <= int(own[r]) <= hi for lo, hi in ranges)
            assert by_nodes == in_ranges, (qid, r)


def test_ranges_budget_is_superset():
    qx0, qy0, qx1, qy1 = 9_000, 4_000, 11_000, 6_000
    full = C.xz_query_ranges_milli(qx0, qy0, qx1, qy1, max_nodes=100_000)
    tight = C.xz_query_ranges_milli(qx0, qy0, qx1, qy1, max_nodes=50)
    assert len(tight) <= 50

    def covered(ranges, v):
        return any(lo <= v <= hi for lo, hi in ranges)

    # every code admitted by the full decomposition is admitted by the
    # coarsened one (sample the boundaries)
    for lo, hi in full[:200]:
        assert covered(tight, lo) and covered(tight, hi)


def test_hierarchical_is_union_of_both_paths(spark, xz_indexed):
    envs, idx = xz_indexed
    from geowave_spark.operators.bbox import query_bbox
    from geowave_spark.operators.index import index_points
    from geowave_spark.plans.planner import BoxQuery

    rng = np.random.default_rng(5)
    pts = pd.DataFrame(
        dict(
            event_id=range(500),
            lon=rng.uniform(-180, 180, 500),
            lat=rng.uniform(-90, 90, 500),
        )
    )
    pts_idx = index_points(
        spark.createDataFrame(pts), lon_col="lon", lat_col="lat"
    ).cache()
    qs = QUERIES[:3]
    got = (
        OX.query_bbox_xz_hierarchical(pts_idx, idx, qs)
        .groupBy("kind")
        .count()
        .collect()
    )
    by_kind = {r.kind: r["count"] for r in got}
    want_pts = query_bbox(
        pts_idx,
        [BoxQuery(q, a / 1000.0, b / 1000.0, c / 1000.0, d / 1000.0)
         for q, a, b, c, d in qs],
    ).count()
    want_ext = OX.query_bbox_xz(idx, qs).count()
    assert by_kind.get("point", 0) == want_pts
    assert by_kind.get("extent", 0) == want_ext
