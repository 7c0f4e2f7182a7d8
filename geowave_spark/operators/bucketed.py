"""Bucketed (co-located) spatial-join store — exchange-free sort-merge joins.

The reference never shuffles at query time: its KV stores materialize every
insertion id at WRITE time (EntryRowID duplication,
core/store/.../index/DataStoreIndexWriter.java) and answer joins with merge
scans over rows that are already sorted and co-located.  Spark's analogue is
the bucketed table: both join sides hash-bucketed into the SAME number of
buckets on the join key and sorted within buckets — the sort-merge join then
plans with ZERO ShuffleExchange nodes, turning the per-query shuffle of a
100 TB spatial join into a once-at-ingest cost.

The derived-key trap this solves: the engine's ad-hoc joins compute the join
key (parent-cell shift / tier explode) at query time, and Catalyst does NOT
recognize a derived expression as bucket-aligned — bucketing removes the
shuffle only when the STORED column is the equi-join key.  So this store
materializes the point-side key per occupied envelope tier (``_jkey``) —
exactly the reference's one-insertion-id-per-tier layout, with the same
write-amplification trade (|occupied tiers| rows per point vs a shuffle per
query; at 10^12 rows × daily join workloads the ingest-side copy wins).

Skew note: a bucketed scan is a fixed partitioning, so AQE's skew-join
splitting (which inserts an exchange) cannot help inside it — hot cells
(dense urban tiles) must be absorbed by the bucket-count dial (hash of the
full fine-resolution key spreads hot PARENT cells' points over many buckets
only when tiers differ; points sharing one exact hot key stay together).
Size ``buckets`` so the hottest single key fits one task, or keep the
ad-hoc AQE join for pathologically skewed workloads — the two paths return
identical rows (pytest-pinned).

Production note: in-session Spark catalogs persist bucket metadata only for
the session (sandbox); the durable production form is the same layout as an
Iceberg table with a ``bucket(N, key)`` partition transform, where
storage-partitioned joins give the identical no-shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.operators import index as OI
from geowave_spark.operators import join as OJ

DEFAULT_BUCKETS = 64


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle-exchange operators in ``df``'s physical plan (the
    initial plan under AQE — what the optimizer committed to before any
    runtime re-plan).  Plan-audit helper used by the bucketed-join tests;
    0 on a co-located bucketed join, ≥1 whenever keys are derived at query
    time."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.lstrip(" +-:*()0123456789").startswith("Exchange")
        for line in plan.splitlines()
    )


def write_point_join_store(
    points: DataFrame,
    env_tiers: list[int],
    table: str,
    path: str,
    buckets: int = DEFAULT_BUCKETS,
    point_id: str = "point_id",
) -> None:
    """Materialize the point side of the spatial join, bucketed on the join
    key.  One row per (point, occupied envelope tier) — the key column that
    :func:`geowave_spark.operators.join.points_in_envelopes_join` derives
    per query is computed ONCE here and stored as ``jkey``."""
    pts = OJ.point_tier_keys(points, point_id=point_id, env_tiers=sorted(set(env_tiers)))
    (
        pts.withColumnRenamed("_jkey", "jkey")
        .write.mode("overwrite")
        .bucketBy(buckets, "jkey")
        .sortBy("jkey")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def write_envelope_join_store(
    envelopes: DataFrame,
    table: str,
    path: str,
    buckets: int = DEFAULT_BUCKETS,
    env_id: str = "env_id",
) -> None:
    """Materialize the envelope side: ≤4 covering cells per envelope at its
    tier (index_envelopes_milli), bucketed on the cell key with the same
    bucket count as the point store."""
    env = OI.index_envelopes_milli(envelopes, id_col=env_id).select(
        env_id, "cell", "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    (
        env.write.mode("overwrite")
        .bucketBy(buckets, "cell")
        .sortBy("cell")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_points_in_envelopes(
    spark: SparkSession,
    points_table: str,
    env_table: str,
    point_id: str = "point_id",
    env_id: str = "env_id",
) -> DataFrame:
    """The spatial join over two pre-bucketed stores: a sort-merge equi-join
    with no exchange on either side (both scans report the same hash
    partitioning on the join key), exact containment as the join residual.
    Row-identical to :func:`points_in_envelopes_join` on the same inputs —
    no dedup needed for the same reason (one parent key per point per tier,
    distinct cells per envelope)."""
    pts = spark.table(points_table)
    env = spark.table(env_table)
    # the store exists for the large×large regime: pin sort-merge so the
    # bucket alignment is actually used (a small test table would otherwise
    # plan a BroadcastHashJoin and the no-exchange property would be
    # vacuous; at 100 TB neither side is broadcastable anyway)
    return (
        pts.join(env.hint("merge"), pts["jkey"] == env["cell"])
        .filter(
            (F.col("lon_milli") >= F.col("minx_m"))
            & (F.col("lon_milli") <= F.col("maxx_m"))
            & (F.col("lat_milli") >= F.col("miny_m"))
            & (F.col("lat_milli") <= F.col("maxy_m"))
        )
        .select(point_id, env_id, "lon_milli", "lat_milli")
    )
