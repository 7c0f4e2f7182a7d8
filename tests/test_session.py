"""session.spread probe contract: the 100 TB fast path must never force a
physical plan translation or insert an Exchange; small inputs must."""

from pyspark.sql import functions as F

from geowave_spark.session import spread


def _has_repartition(df) -> bool:
    return "Repartition" in df._jdf.queryExecution().logical().toString()


def test_spread_noop_on_large_estimate(spark):
    big = spark.range(0, 10_000_000_000)  # ~80 GB Catalyst estimate
    assert spread(big) is big  # identity: no Exchange, no RDD translation


def test_spread_estimate_path_is_live(spark):
    """The Catalyst estimate must parse through py4j's int auto-conversion:
    a large-estimate df short-circuits WITHOUT ever materializing .rdd."""
    big = spark.range(0, 10_000_000_000)
    est = int(str(big._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    assert est > 8 * 10**9  # the probe value spread() branches on

    class Boom:
        def __get__(self, obj, objtype=None):
            raise AssertionError("fast path forced plan→RDD translation")

    import unittest.mock as mock

    with mock.patch.object(type(big), "rdd", Boom()):
        assert spread(big) is big


def test_spread_treats_maxvalue_estimate_as_unknown(spark):
    """LogicalRDD leaves report sizeInBytes=Long.MaxValue ("unknown") —
    that must fall through to the partition probe, not read as huge."""
    df = spark.createDataFrame([(i,) for i in range(64)], "id long").coalesce(1)
    est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    if est < (1 << 63) - 1:  # environment-dependent; only assert when sentinel
        return
    out = spread(df)
    assert out is not df and _has_repartition(out)


def test_spread_repartitions_small_file_source(spark, sf_dir):
    small = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spread(small)
    assert out is not small and _has_repartition(out)
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == n


def test_spread_keeps_well_partitioned_generator(spark):
    """A mapInPandas generator over a partitioned range is small by
    Catalyst estimate but already parallel — must NOT be re-shuffled."""
    n = spark.sparkContext.defaultParallelism
    src = spark.range(1000, numPartitions=n)

    def gen(batches):
        import pandas as pd
        for b in batches:
            yield pd.DataFrame({"id": b["id"], "blob": ["x" * 100] * len(b)})

    df = src.mapInPandas(gen, "id long, blob string")
    assert spread(df) is df
