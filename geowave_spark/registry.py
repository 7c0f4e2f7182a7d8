"""Registry of driver-checkable queries and their DuckDB oracles.

Each entry pairs an engine plan (index-accelerated: cover join + refine)
with a brute-force ANSI-SQL oracle over the same deterministic derivation —
the same shape as the reference's golden-set ITs, which compare
index-accelerated scans against precomputed expected feature sets
(GeoWaveBasicSpatialVectorIT.java:36-167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geowave_spark.operators import bbox as OB
from geowave_spark.operators import index as OI
from geowave_spark.plans import planner as P
from geowave_spark.sources import tables as TB

ENTRY_SF_DIR = "/root/testdata/sf0.001"

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# BBOX suite (SURVEY §2.3 BasicQueryFilter/SpatialQueryFilter box path,
# §2.4 SpatialQuery → range decomposition)
# ---------------------------------------------------------------------------

BBOX_SUITE = [
    P.BoxQuery("hot_nyc", -74.5, 40.2, -73.5, 41.2),
    P.BoxQuery("hot_tokyo_small", 139.5, 35.4, 139.9, 35.9),
    P.BoxQuery("country", -10.0, 35.0, 30.0, 60.0),
    P.BoxQuery("empty_ocean", -40.0, -55.0, -39.9, -54.9),
    P.BoxQuery("antimeridian", 170.0, -20.0, -170.0, 20.0),
]


def _bbox_lon_pred(q: P.BoxQuery) -> str:
    if q.minx <= q.maxx:
        return f"(lon >= {q.minx} AND lon <= {q.maxx})"
    return f"(lon >= {q.minx} OR lon <= {q.maxx})"


def q_bbox_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    out = OB.query_bbox(geo, BBOX_SUITE)
    return out.select("query_id", "event_id", "lon", "lat")


def _bbox_suite_oracle() -> str:
    arms = [
        f"SELECT '{q.query_id}' AS query_id, event_id, lon, lat FROM geo_events "
        f"WHERE {_bbox_lon_pred(q)} AND lat >= {q.miny} AND lat <= {q.maxy}"
        for q in BBOX_SUITE
    ]
    return TB.oracle_with(TB.GEO_EVENTS_SQL, "geo_events", " UNION ALL ".join(arms))


register("bbox_suite", q_bbox_suite, _bbox_suite_oracle())


def q_bbox_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    q = P.BoxQuery("hot_nyc", -74.5, 40.2, -73.5, 41.2)
    return OB.query_bbox(geo, [q]).select("event_id", "lon", "lat", "event_type")


register(
    "bbox_hot",
    q_bbox_hot,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, lon, lat, event_type FROM geo_events "
        "WHERE lon >= -74.5 AND lon <= -73.5 AND lat >= 40.2 AND lat <= 41.2",
    ),
)
