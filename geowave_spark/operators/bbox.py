"""Bounding-box spatial query: cover-join prefilter + exact residual.

The Spark re-expression of the reference's BasicQuery/SpatialQuery path for
axis-aligned boxes (core/geotime/.../store/query/SpatialQuery.java:54-110 →
range decomposition → scan → BasicQueryFilter range compare).  The residual
predicate is pure JVM column math (no UDF) because a box test needs no
geometry kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.plans import planner as P


def query_bbox(
    data: DataFrame,
    queries: list[P.BoxQuery],
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_cols: tuple[str, ...] = ("event_id",),
    tiers: list[int] | None = None,
    max_cells: int = 1024,
    dedup: bool | None = None,
) -> DataFrame:
    """All (query_id, row) pairs where the point/footprint center falls in
    the query box.  ``dedup=None`` auto-enables dedup only when the table
    contains multi-cell entries (reference DedupeFilter gating)."""
    pre = P.cover_join(data, queries, tiers=tiers, max_cells=max_cells)
    spark = data.sparkSession
    qdf = spark.createDataFrame(
        [(q.query_id, q.minx, q.miny, q.maxx, q.maxy) for q in queries],
        "query_id string, q_minx double, q_miny double, q_maxx double, q_maxy double",
    )
    refined = pre.join(F.broadcast(qdf), "query_id").filter(
        P.bbox_residual(
            F.col("q_minx"), F.col("q_miny"), F.col("q_maxx"), F.col("q_maxy"),
            lon=F.col(lon_col), lat=F.col(lat_col),
        )
    )
    if dedup is None:
        # point tables at MAX_RES are duplicate-free by construction
        # (single-cell entries) — skip the global shuffle, mirroring the
        # reference's DedupeFilter gating on numberOfDuplicates.
        point_table = tiers is not None and all(int(t) == C.MAX_RES for t in tiers)
        dedup = "n_dup" in data.columns and not point_table
    if dedup:
        refined = refined.dropDuplicates(["query_id", *id_cols])
    return refined.drop("q_minx", "q_miny", "q_maxx", "q_maxy")


def query_bbox_envelopes(
    data: DataFrame,
    queries: list[P.BoxQuery],
    env_cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
    id_cols: tuple[str, ...] = ("event_id",),
    tiers: list[int] | None = None,
    max_cells: int = 1024,
) -> DataFrame:
    """Envelope-intersects variant (footprints, not centers): exact
    envelope×box intersection residual, still pure column math."""
    pre = P.cover_join(data, queries, tiers=tiers, max_cells=max_cells)
    spark = data.sparkSession
    qdf = spark.createDataFrame(
        [(q.query_id, q.minx, q.miny, q.maxx, q.maxy) for q in queries],
        "query_id string, q_minx double, q_miny double, q_maxx double, q_maxy double",
    )
    mnx, mny, mxx, mxy = env_cols
    lat_ok = (F.col(mny) <= F.col("q_maxy")) & (F.col(mxy) >= F.col("q_miny"))
    # longitude: normal interval overlap, or (wrapping query, q_minx >
    # q_maxx) overlap with either arm [q_minx, 180] ∪ [-180, q_maxx] —
    # LongitudeDefinition bin-split semantics
    lon_normal = (F.col(mnx) <= F.col("q_maxx")) & (F.col(mxx) >= F.col("q_minx"))
    lon_wrapped = (F.col(mxx) >= F.col("q_minx")) | (F.col(mnx) <= F.col("q_maxx"))
    refined = pre.join(F.broadcast(qdf), "query_id").filter(
        lat_ok
        & F.when(F.col("q_minx") > F.col("q_maxx"), lon_wrapped).otherwise(lon_normal)
    )
    return refined.dropDuplicates(["query_id", *id_cols]).drop(
        "q_minx", "q_miny", "q_maxx", "q_maxy"
    )
