"""SparkSession factory with the engine's required configuration.

Scale posture: these settings are what we would ship to a 1000-executor
cluster — AQE on (runtime coalesce + skew-join splitting), Arrow execution
for every Python-side kernel, and shuffle partitions sized by the caller
(tests pass cores; a real cluster passes ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "geowave_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster the caller leaves it unset and spark-submit provides it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster should use 2-3x total executor cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(cpus if n == "*" else n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, partitions: int | None = None):
    """Unlock cores for compute-dense operators whose INPUT is tiny.

    A few-MB parquet table arrives as ONE split, so an operator whose cost
    is fan-out (explode x join x window) runs single-threaded no matter how
    many cores exist.  Round-robin repartition the slim input first — the
    shuffle moves only the small input, not the fan-out.  Conditional: a
    source that already has enough splits (the 100 TB case — thousands of
    file splits) is left untouched, so this is a no-op knob at scale.

    The probe is the Catalyst size estimate (optimizedPlan().stats()), not
    ``df.rdd.getNumPartitions()`` — the RDD probe forces a full physical
    translation of the plan per call, noticeable on wide plans; the stats
    estimate is already computed for join planning and costs nothing.  A
    source too small to yield ``n/2`` scan splits at maxPartitionBytes
    gets repartitioned; unknown stats fall back to the RDD probe.
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    want = max(n // 2, 1)
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
        max_pb = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
        if est >= want * max_pb:
            return df
    except Exception:
        if df.rdd.getNumPartitions() >= want:
            return df
    return df.repartition(n)
