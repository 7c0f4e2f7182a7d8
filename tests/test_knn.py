"""kNN golden tests: ring-expansion engine vs numpy brute force (FIXTURES F4
shape: dense + sparse queries, ties broken by id)."""

import numpy as np
import pytest

from geowave_spark import registry as R
from geowave_spark.functions import geometry as G
from geowave_spark.operators import index as I
from geowave_spark.operators import knn as OK
from geowave_spark.sources import tables as TB


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return I.index_points(TB.geo_events(spark, sf_dir), id_col="event_id").cache()


def brute_knn(pts, q: OK.KnnQuery):
    d2 = G.planar_wrap_dist2_milli(
        pts.lon_milli.to_numpy(), pts.lat_milli.to_numpy(), q.lon_milli, q.lat_milli
    )
    order = np.lexsort((pts.event_id.to_numpy(), d2))
    top = order[: q.k]
    return [(int(pts.event_id.iloc[i]), int(d2[i])) for i in top]


def test_knn_matches_brute_force(spark, geo):
    pts = geo.select("event_id", "lon_milli", "lat_milli").toPandas()
    got = OK.query_knn(geo, R.KNN_SUITE).toPandas()
    for q in R.KNN_SUITE:
        sub = got[got.query_id == q.query_id].sort_values("rank")
        want = brute_knn(pts, q)
        have = list(zip(sub.event_id.astype(int), sub.dist2_milli.astype(int)))
        assert have == want, f"{q.query_id}: {have[:3]} vs {want[:3]}"


def test_knn_sparse_needs_expansion(spark, geo):
    """Ocean query in a cold region must still return exactly k exact NNs."""
    q = OK.KnnQuery("sparse", -35.0, -45.0, 10)
    pts = geo.select("event_id", "lon_milli", "lat_milli").toPandas()
    got = OK.query_knn(geo, [q]).toPandas().sort_values("rank")
    assert list(got.event_id.astype(int)) == [e for e, _ in brute_knn(pts, q)]


def test_knn_k_larger_than_table(spark, geo):
    n = geo.count()
    q = OK.KnnQuery("all", 0.0, 0.0, int(n + 50))
    got = OK.query_knn(geo, [q])
    assert got.count() == n


# ---------------------------------------------------------------------------
# Dataset-scale knn_join (NNMapReduce parity, no driver loop)
# ---------------------------------------------------------------------------


def brute_knn_join(pts, k, max_dist):
    """numpy brute force over all pairs (wrap metric, id ties, self-excluded)."""
    lon = pts.lon_milli.to_numpy()
    lat = pts.lat_milli.to_numpy()
    ids = pts.event_id.to_numpy()
    out = {}
    for i in range(len(pts)):
        d2 = G.planar_wrap_dist2_milli(lon, lat, int(lon[i]), int(lat[i]))
        mask = (d2 <= max_dist * max_dist) & (ids != ids[i])
        cand_ids, cand_d = ids[mask], d2[mask]
        order = np.lexsort((cand_ids, cand_d))[:k]
        out[int(ids[i])] = [(int(cand_ids[j]), int(cand_d[j])) for j in order]
    return out


def test_knn_join_matches_brute_force(spark, geo):
    pts = geo.select("event_id", "lon_milli", "lat_milli").toPandas()
    got = OK.knn_join(geo, geo, k=3, max_dist_milli=1500).toPandas()
    want = brute_knn_join(pts, 3, 1500)
    by_q = {
        int(q): list(zip(g.sort_values("rank").neighbor_id.astype(int),
                         g.sort_values("rank").dist2_milli.astype(int)))
        for q, g in got.groupby("query_id")
    }
    for qid, expect in want.items():
        assert by_q.get(qid, []) == expect, f"query {qid}"


def test_knn_join_adaptive_equals_base(spark, geo, monkeypatch):
    """The escalating-radius plan is an OPTIMIZATION, not new semantics:
    row-for-row identical to the fixed-radius knn_join on a mixed
    dense+sparse layout (dense queries finalize at radius/16, sparse ones
    escalate to the full radius — including partial <k result sets).
    Threshold forced to 0 so the small fixture actually takes the
    escalation path (the default routes small estimates to one pass)."""
    monkeypatch.setattr(OK, "KNN_ADAPTIVE_MIN_BYTES", 0)
    base = sorted(map(tuple, OK.knn_join(geo, geo, k=3, max_dist_milli=1500).collect()))
    adp = sorted(
        map(tuple, OK.knn_join_adaptive(geo, geo, k=3, max_dist_milli=1500).collect())
    )
    assert base == adp and len(base) > 0
    # tiny max_dist: divisor rounds collapse (dedup) and still agree
    b2 = sorted(map(tuple, OK.knn_join(geo, geo, k=2, max_dist_milli=3).collect()))
    a2 = sorted(
        map(tuple, OK.knn_join_adaptive(geo, geo, k=2, max_dist_milli=3).collect())
    )
    assert b2 == a2


def test_knn_join_adaptive_small_input_single_pass(spark, geo):
    """Below the estimate threshold the adaptive entry point takes ONE
    knn_join pass (no checkpoint rounds): same rows, and the returned
    plan is the base plan (no union)."""
    out = OK.knn_join_adaptive(geo, geo, k=3, max_dist_milli=1500)
    assert "Union" not in out._jdf.queryExecution().optimizedPlan().toString()
    base = sorted(map(tuple, OK.knn_join(geo, geo, k=3, max_dist_milli=1500).collect()))
    assert sorted(map(tuple, out.collect())) == base


def test_knn_join_dateline_wrap(spark):
    """Pair straddling the antimeridian must be found (lon cell wrap)."""
    df = spark.createDataFrame(
        [(1, 179_900, 0), (2, -179_900, 0), (3, 0, 0)],
        "event_id long, lon_milli long, lat_milli long",
    )
    got = OK.knn_join(df, df, k=1, max_dist_milli=1000).toPandas()
    pairs = {(int(r.query_id), int(r.neighbor_id), int(r.dist2_milli))
             for r in got.itertuples()}
    # wrap distance: |179900 - (-179900)| -> 360000 - 359800 = 200
    assert (1, 2, 200 * 200) in pairs and (2, 1, 200 * 200) in pairs
    assert not any(q == 3 for q, _, _ in pairs)  # isolated point: no neighbor


def test_knn_join_resolution_rule():
    # cell lat height must cover max_dist: 180000 >> r >= d
    for d in (1, 100, 1500, 2000, 45_000, 90_000, 180_000):
        r = OK.knn_join_res(d)
        assert (180_000 >> r) >= d
        assert r == OK.C.MAX_RES or (180_000 >> (r + 1)) < d or r == OK.C.MAX_RES


def test_query_knn_join_route_exact_equivalence(spark, geo):
    """The knn_join-routed path (|queries| >= threshold) returns exactly
    the ring-expansion path's rows — same ids, ranks, and distances — on a
    mixed dense/sparse/wrap suite, including a sparse query that must
    escalate the distance bound."""
    suite = list(R.KNN_SUITE) + [
        OK.KnnQuery("jr_paris", 2.352, 48.857, 12),
        OK.KnnQuery("jr_sparse2", 100.0, -60.0, 7),
    ]
    ring = OK.query_knn(geo, suite, join_threshold=10_000).toPandas()
    join = OK.query_knn(geo, suite, join_threshold=1).toPandas()
    key = ["query_id", "rank"]
    ring = ring.sort_values(key).reset_index(drop=True)
    join = join.sort_values(key).reset_index(drop=True)
    assert len(ring) == len(join)
    assert (ring[key + ["event_id", "dist2_milli"]].values
            == join[key + ["event_id", "dist2_milli"]].values).all()


def test_query_knn_join_route_k_larger_than_table(spark, geo):
    """Join route with k above the table size: brute-force arm returns all
    rows, exactly once each."""
    n = geo.count()
    qs = [OK.KnnQuery(f"big{i}", float(i), 0.0, int(n + 10)) for i in range(3)]
    got = OK.query_knn(geo, qs, join_threshold=1)
    assert got.count() == 3 * n
