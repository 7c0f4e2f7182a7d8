"""Scan-time query operators completing the reference's query surface:
server-side count aggregation, fixed-resolution subsampling, secondary
attribute index JOIN, DWithin, coordinate-range (cell-prefix) query,
limit, and the everything-scan.

Reference parity map:
* count aggregation   — CountAggregation + AggregationIterator
  (core/store/.../query/aggregate/CountAggregation.java:16-60;
  extensions/datastores/accumulo/.../query/AggregationIterator.java:53-360):
  Spark partial/final aggregation is the same partial+merge contract.
* subsample           — FixedCardinalitySkippingIterator (≈1 row per coarse
  SFC prefix; extensions/datastores/accumulo/.../query/
  FixedCardinalitySkippingIterator.java): deterministic first-row-per-cell
  via row_number(), the screen-resolution decimation path.
* secondary index     — SecondaryIndexType.JOIN (core/store/.../index/
  SecondaryIndex.java): an (attr → id) aux table equi-joined back to the
  primary; at scale the aux table is sorted/bucketed by the attribute.
* DWithin             — DWithinFilterVisitor rewrite (extensions/adapters/
  vector/.../query/cql/DWithinFilterVisitor.java): buffered envelope
  prefilter + exact distance residual (here the exact integer planar-milli
  metric shared with kNN).
* coordinate range    — CoordinateRangeQuery + PrefixIdQueryFilter
  (core/store/.../query/CoordinateRangeQuery.java): all rows under one
  parent cell = one bit-shift equality, which Iceberg/parquet turns into
  partition pruning when the parent is at/above PARTITION_RES.
* limit               — QueryOptions.limit (core/store/.../query/
  QueryOptions.java:98): deterministic (sorted) early-exit limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.functions import udfs as U
from geowave_spark.operators import bbox as OB
from geowave_spark.plans import planner as P


def count_by_query(
    data: DataFrame, queries: list[P.BoxQuery], tiers: list[int] | None = None
) -> DataFrame:
    """Per-query matching-row count — the aggregation is pushed below the
    result materialization exactly like the reference's server-side
    AggregationIterator (partials per partition, one merge)."""
    hits = OB.query_bbox(data, queries, tiers=tiers)
    return hits.groupBy("query_id").agg(F.count("*").alias("n_rows"))


def subsample(
    data: DataFrame,
    res: int,
    id_col: str = "event_id",
    keep_cols: tuple[str, ...] = ("lon", "lat"),
) -> DataFrame:
    """≈1 row per cell at coarse ``res``: the deterministic representative
    (min id) per cell.  Output: (cell_r, <id>, keep_cols...)."""
    w = Window.partitionBy("cell_r").orderBy(F.col(id_col).asc())
    return (
        data.withColumn("cell_r", X.parent_col(F.col("cell"), res))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cell_r", id_col, *keep_cols)
    )


def build_secondary_index(
    data: DataFrame, attr_col: str, id_col: str = "event_id"
) -> DataFrame:
    """The (attribute → primary id) aux table (SecondaryIndexType.JOIN).
    At scale: written sorted by ``attr_col`` for range pushdown."""
    return data.select(F.col(attr_col).alias("attr"), F.col(id_col))


def secondary_index_query(
    data: DataFrame,
    aux: DataFrame,
    values: list,
    id_col: str = "event_id",
) -> DataFrame:
    """Point lookups on the secondary index joined back to the primary —
    the aux side is filtered first (index scan) then equi-joined."""
    ids = aux.filter(F.col("attr").isin(values)).select(id_col)
    return data.join(ids, id_col, "left_semi")


def dwithin(
    data: DataFrame,
    lon: float,
    lat: float,
    dist_milli: int,
    tiers: list[int] | None = None,
) -> DataFrame:
    """All rows within ``dist_milli`` (planar milli-degree metric, date-line
    wrap) of the point: buffered-box cover prefilter + exact residual."""
    d = dist_milli / 1000.0
    box = P.BoxQuery(
        "dwithin",
        ((lon - d + 180.0) % 360.0) - 180.0 if lon - d < -180 else lon - d,
        max(lat - d, -90.0),
        ((lon + d + 180.0) % 360.0) - 180.0 if lon + d > 180 else lon + d,
        min(lat + d, 90.0),
    )
    pre = P.cover_join(data, [box], tiers=tiers)
    q_lon_m = int(round(lon * 1000))
    q_lat_m = int(round(lat * 1000))
    dist2 = U.planar_wrap_dist2_col(
        F.col("lon_milli"), F.col("lat_milli"), F.lit(q_lon_m), F.lit(q_lat_m)
    )
    return (
        pre.withColumn("dist2_milli", dist2)
        .filter(F.col("dist2_milli") <= dist_milli * dist_milli)
        .drop("query_id")
    )


def parent_cell_scan(data: DataFrame, parent_cell: int) -> DataFrame:
    """All rows under one parent cell (CoordinateRangeQuery / prefix query):
    a single bit-shift equality — partition-prunable when the parent is at
    or above the table's PARTITION_RES."""
    res = parent_cell >> C.RES_SHIFT
    return data.filter(X.parent_col(F.col("cell"), int(res)) == parent_cell)


def limited_scan(
    data: DataFrame, n: int, order_cols: tuple[str, ...] = ("cell", "event_id")
) -> DataFrame:
    """Deterministic limit: smallest ``n`` rows in index-key order (the
    KV-store scan order + early-exit limit of QueryOptions.limit)."""
    return data.orderBy(*[F.col(c).asc() for c in order_cols]).limit(n)


def everything(data: DataFrame) -> DataFrame:
    """EverythingQuery — the unconstrained scan."""
    return data


def density_grid(
    data: DataFrame,
    res: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per-cell density surface at coarse ``res`` — the engine's heat-map /
    KDE-lite analogue (reference KDEJobRunner produces Gaussian-smoothed
    per-cell pyramids, analytics/mapreduce/.../kde/KDEJobRunner.java:89-380;
    density-at-cell is its unsmoothed core and what the cell histogram
    serves at query time).  One partial-aggregated groupBy on the bit-shift
    parent key; optional value weighting."""
    d = data.withColumn("cell_r", X.parent_col(F.col("cell"), res))
    aggs = [F.count("*").alias("n_points")]
    if value_col is not None:
        # fixed-point per-row quantization then integer sum: float summation
        # order differs between engines/partitionings, integer sums don't
        aggs.append(
            F.sum(F.round(F.col(value_col) * 1000, 0).cast("long")).alias(
                "total_value_milli"
            )
        )
    return d.groupBy("cell_r").agg(*aggs)


def build_covering_index(
    data: DataFrame,
    attr_col: str,
    path: str,
    include_cols: tuple[str, ...] = (),
    id_col: str = "event_id",
    buckets: int = 8,
) -> None:
    """Materialized secondary index (SecondaryIndexType,
    core/store/.../index/SecondaryIndexType.java:17-18): ``include_cols``
    picks the materialization — all payload columns = FULL (covering scans
    never touch the primary), a subset = PARTIAL (covered projections are
    index-only, the rest join back), empty = JOIN (ids only).

    Layout: repartitionByRange(attr) + sortWithinPartitions(attr) →
    parquet row-group min/max stats give range pushdown on the attribute
    (Iceberg sort order in production)."""
    cols = [F.col(attr_col).alias("attr"), F.col(id_col), *[F.col(c) for c in include_cols]]
    (
        data.select(*cols)
        .repartitionByRange(buckets, F.col("attr"))
        .sortWithinPartitions("attr")
        .write.mode("overwrite")
        .parquet(path)
    )


def covering_index_query(
    spark,
    path: str,
    values: list,
    select_cols: tuple[str, ...] | None = None,
    primary: DataFrame | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Answer an attribute lookup from the covering index.

    A projection the index materializes (FULL, or PARTIAL with the columns
    stored) is served index-only — no primary-table touch.  A projection
    needing unstored columns takes the PARTIAL path
    (SecondaryIndexType.java:18): the index narrows to matching ids first,
    then ONE equi-join against ``primary`` fetches the uncovered columns —
    the join input is the post-filter id set, not the table, so at 100 TB
    the primary side is a keyed probe (broadcast of the narrowed ids under
    AQE), never a full-table shuffle."""
    idx = spark.read.parquet(path).filter(F.col("attr").isin(values))
    if select_cols is None:
        return idx
    stored = set(idx.columns)
    missing = [c for c in select_cols if c not in stored]
    if not missing:
        return idx.select(*select_cols)
    if primary is None:
        raise ValueError(
            f"columns {missing} are not materialized in the index at {path}; "
            "pass the primary table for the PARTIAL join-back path"
        )
    back = primary.select(id_col, *missing)
    return idx.join(back, id_col).select(*select_cols)
