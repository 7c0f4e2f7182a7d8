"""End-to-end bbox query: engine result == brute-force oracle (golden-set
style, mirroring reference GeoWaveBasicSpatialVectorIT box-filter tests)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import bbox as B
from geowave_spark.operators import index as I
from geowave_spark.plans import planner as P
from geowave_spark.sources import tables as TB

QUERIES = [
    P.BoxQuery("hot_nyc", -74.5, 40.2, -73.5, 41.2),      # inside NYC blob
    P.BoxQuery("country", -10.0, 35.0, 30.0, 60.0),        # Europe-scale
    P.BoxQuery("global", -180.0, -90.0, 180.0, 90.0),      # everything
    P.BoxQuery("empty_ocean", -40.0, -55.0, -39.9, -54.9),  # likely empty
    P.BoxQuery("antimeridian", 170.0, -20.0, -170.0, 20.0),  # wraps
    P.BoxQuery("degenerate", 2.352, 48.857, 2.352, 48.857),  # point box
]


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    df = TB.geo_events(spark, sf_dir)
    return I.index_points(df, id_col="event_id").cache()


def brute_force(sf_dir, q: P.BoxQuery) -> set:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    if q.minx <= q.maxx:
        lon_pred = f"lon >= {q.minx} AND lon <= {q.maxx}"
    else:
        lon_pred = f"(lon >= {q.minx} OR lon <= {q.maxx})"
    rows = con.execute(
        TB.oracle_with(
            TB.GEO_EVENTS_SQL,
            "geo_events",
            f"SELECT event_id FROM geo_events WHERE {lon_pred} "
            f"AND lat >= {q.miny} AND lat <= {q.maxy}",
        )
    ).fetchall()
    return {r[0] for r in rows}


def test_bbox_matches_brute_force(spark, sf_dir, geo):
    got = (
        B.query_bbox(geo, QUERIES)
        .select("query_id", "event_id")
        .toPandas()
    )
    for q in QUERIES:
        want = brute_force(sf_dir, q)
        have = set(got[got.query_id == q.query_id].event_id)
        assert have == want, f"{q.query_id}: {len(have)} vs {len(want)}"


def test_bbox_global_returns_all(spark, geo):
    n = geo.count()
    got = B.query_bbox(geo, [P.BoxQuery("g", -180, -90, 180, 90)]).count()
    assert got == n


def test_cover_join_is_superset(spark, geo):
    """The prefilter must never lose a true hit (no false negatives)."""
    q = QUERIES[0]
    pre = P.cover_join(geo, [q]).select("event_id").toPandas()
    want = (
        geo.filter(
            (F.col("lon") >= q.minx) & (F.col("lon") <= q.maxx)
            & (F.col("lat") >= q.miny) & (F.col("lat") <= q.maxy)
        )
        .select("event_id")
        .toPandas()
    )
    assert set(want.event_id) <= set(pre.event_id)


def test_plan_is_broadcast_join(spark, geo):
    """The cover join must compile to a broadcast hash join (no shuffle of
    the big side) — the 100-TB posture check."""
    plan = B.query_bbox(geo, [QUERIES[0]])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
