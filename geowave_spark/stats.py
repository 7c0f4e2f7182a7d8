"""Statistics layer — the engine's DataStatistics analogue.

The reference maintains mergeable per-adapter statistics in a metadata
table (count, bbox, time range, row-range histogram, sketches) and uses
them for index selection, tier skipping, and split balancing
(core/store/.../adapter/statistics/DataStatistics.java,
RowRangeHistogramStatistics.java, core/geotime/.../store/statistics/
BoundingBoxDataStatistics.java:33-140, TimeRangeDataStatistics.java).

Here statistics are one ``groupBy().agg()`` job over the indexed table —
partial aggregation is Catalyst-native, so the scan is single-pass — and
land in a small parquet (production: Iceberg) stats store with three
tables:

* ``summary``   — count, bbox, time range, distinct ids (exact + approx);
* ``tier_counts`` — rows per tier → drives the tier-skip in cover_join
  (reference TieredSFCIndexStrategy.java:131-138 tier metadata) without a
  per-query distinct scan;
* ``cell_histogram`` — rows per coarse cell (PARTITION_RES parent) →
  split balancing / hot-cell (skew) detection, the analogue of
  RowRangeHistogramStatistics-driven splits (SplitsProvider.java:52-135);
  hot cells above ``salt_threshold`` are the ones ingest salting spreads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def summary_stats(
    indexed: DataFrame,
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str | None = "ts",
) -> DataFrame:
    """One-row summary: count, bbox, time range, id cardinality."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min(lon_col).alias("min_lon"),
        F.max(lon_col).alias("max_lon"),
        F.min(lat_col).alias("min_lat"),
        F.max(lat_col).alias("max_lat"),
        F.countDistinct(id_col).alias("n_ids"),
        F.approx_count_distinct(id_col).alias("n_ids_approx"),
    ]
    if ts_col is not None and ts_col in indexed.columns:
        aggs += [F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts")]
    return indexed.agg(*aggs)


def tier_counts(indexed: DataFrame) -> DataFrame:
    """(tier, n_rows) — the tier-occupancy metadata queries use to skip
    empty tiers (pass ``tiers=`` to cover_join from this instead of a
    distinct scan)."""
    return indexed.groupBy("tier").agg(F.count("*").alias("n_rows"))


def cell_histogram(indexed: DataFrame, cell_p_col: str = "cell_p") -> DataFrame:
    """(cell_p, n_rows) — coarse-cell occupancy for split balancing and
    hot-cell detection."""
    return indexed.groupBy(cell_p_col).agg(F.count("*").alias("n_rows"))


def hot_cells(hist: DataFrame, threshold_ratio: float = 4.0) -> DataFrame:
    """Cells holding more than ``threshold_ratio``× the mean row count —
    the skew set that ingest salting (HashKeyIndexStrategy analogue)
    spreads across ``salt`` buckets."""
    mean = hist.agg(F.avg("n_rows").alias("m"))
    return (
        hist.crossJoin(F.broadcast(mean))
        .filter(F.col("n_rows") > F.col("m") * threshold_ratio)
        .select("cell_p", "n_rows")
    )


def write_stats(indexed: DataFrame, store_path: str, **kw) -> None:
    """Materialize all three stats tables under ``store_path``/_stats."""
    summary_stats(indexed, **kw).write.mode("overwrite").parquet(
        f"{store_path}/_stats/summary"
    )
    tier_counts(indexed).write.mode("overwrite").parquet(
        f"{store_path}/_stats/tier_counts"
    )
    cell_histogram(indexed).write.mode("overwrite").parquet(
        f"{store_path}/_stats/cell_histogram"
    )


def read_tiers(spark: SparkSession, store_path: str) -> list[int]:
    """Occupied tiers from the stats store (the query-side tier list)."""
    df = spark.read.parquet(f"{store_path}/_stats/tier_counts")
    return sorted(int(r["tier"]) for r in df.filter(F.col("n_rows") > 0).collect())


def fixed_bin_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 32,
) -> DataFrame:
    """Fixed-bin numeric histogram — the reference's FixedBinNumericHistogram
    / FeatureNumericHistogramStatistics (core/store/.../histogram/
    FixedBinNumericHistogram.java, 410 LoC of mergeable bin bookkeeping)
    as one partial-aggregated groupBy.  Values outside [lo, hi) clamp into
    the edge bins (the reference grows bins; fixed clamp keeps the oracle
    closed-form).  Output: (bin, n) for non-empty bins."""
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(nbins))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("int")
    return df.groupBy(bin_.alias("bin")).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Count-min sketch statistic (reference FeatureCountMinSketchStatistics,
# extensions/adapters/vector/.../stats/FeatureCountMinSketchStatistics.java —
# 254 LoC of stream-lib plumbing; here: the built-in Catalyst aggregate plus
# a pure-python decoder for estimation and merge).
# ---------------------------------------------------------------------------

import struct as _struct

import numpy as _np


def count_min_sketch(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One-row (sketch binary) aggregate — map-side partial, mergeable.

    String keys: pre-hash to long with ``F.xxhash64`` before sketching (the
    decoder below implements Spark's LONG item hashing)."""
    return df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(float(eps)), F.lit(float(confidence)), F.lit(int(seed))
        ).alias("cms")
    )


def cms_decode(b: bytes):
    """Parse Spark's CountMinSketch serialization (big-endian stream-lib
    layout: version, totalCount, depth, width, hashA[depth],
    table[depth][width])."""
    ver, total = _struct.unpack_from(">iq", b, 0)
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    depth, width = _struct.unpack_from(">ii", b, 12)
    off = 20
    hash_a = _np.frombuffer(b, dtype=">i8", count=depth, offset=off).astype(_np.int64)
    off += depth * 8
    table = (
        _np.frombuffer(b, dtype=">i8", count=depth * width, offset=off)
        .astype(_np.int64)
        .reshape(depth, width)
    )
    return total, depth, width, hash_a, table


_CMS_PRIME = (1 << 31) - 1


def cms_estimate(b: bytes, items) -> _np.ndarray:
    """Frequency estimates for int64 items (Spark's LONG-item hash:
    h = hashA[i]*x; h += h >> 32 (arithmetic, 64-bit wrap); h &= 2^31-1;
    column = h % width; estimate = min over rows)."""
    total, depth, width, hash_a, table = cms_decode(b)
    x = _np.asarray(items, dtype=_np.int64)
    est = _np.full(x.shape, _np.iinfo(_np.int64).max, dtype=_np.int64)
    with _np.errstate(over="ignore"):
        for i in range(depth):
            h = hash_a[i] * x  # wraps mod 2^64, signed — Java semantics
            h = h + (h >> 32)  # numpy int64 >> is arithmetic, like Java
            h = h & _CMS_PRIME
            est = _np.minimum(est, table[i, h % width])
    return est


def cms_merge(b1: bytes, b2: bytes) -> bytes:
    """Merge two sketches built with identical (eps, confidence, seed) —
    element-wise table sum (the mergeable-statistics contract the
    reference's stats recompute/merge commands rely on)."""
    t1, d1, w1, a1, tab1 = cms_decode(b1)
    t2, d2, w2, a2, tab2 = cms_decode(b2)
    if d1 != d2 or w1 != w2 or not _np.array_equal(a1, a2):
        raise ValueError("incompatible sketches (different dims or seed)")
    out = bytearray(b1)
    _struct.pack_into(">q", out, 4, t1 + t2)
    merged = (tab1 + tab2).astype(">i8").tobytes()
    out[20 + d1 * 8 :] = merged
    return bytes(out)
