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
