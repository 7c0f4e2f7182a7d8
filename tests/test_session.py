"""session.spread probe contract: the 100 TB fast path must never force a
physical plan translation or insert an Exchange; small inputs must."""

from pyspark.sql import functions as F

from geowave_spark.session import spread


def _has_repartition(df) -> bool:
    return "Repartition" in df._jdf.queryExecution().logical().toString()


def test_spread_noop_on_large_estimate(spark):
    big = spark.range(0, 10_000_000_000)  # ~80 GB Catalyst estimate
    assert spread(big) is big  # identity: no Exchange, no RDD translation


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
