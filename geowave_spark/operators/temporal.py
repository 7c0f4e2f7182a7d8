"""Temporal and spatial-temporal compound queries.

Re-expresses the reference's temporal binning + compound (time_bin, cell)
keys (TemporalBinningStrategy.java:39-150 — YEAR/MONTH/DAY periodicity bins
prefixed to the SFC key; SpatialTemporalQuery.java:31-175 — one constraint
set per time range) as Spark column math:

* ``time_bin`` = date_trunc at the configured periodicity — at scale this is
  a partition column, so the bin predicate prunes files before any scan
  (the analogue of per-bin key-range decomposition).
* spatial side = the same broadcast cover join.
* residual = exact ``ts BETWEEN`` + box predicate (JVM column math).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.plans import planner as P

PERIODICITY = {"year": "year", "month": "month", "day": "day"}


def with_time_bin(df: DataFrame, ts_col: str = "ts", periodicity: str = "month") -> DataFrame:
    """Attach the compound-key temporal component."""
    return df.withColumn("time_bin", F.date_trunc(PERIODICITY[periodicity], F.col(ts_col)))


@dataclass
class STQuery:
    """Spatial box × closed time interval (ISO strings, UTC)."""

    query_id: str
    minx: float
    miny: float
    maxx: float
    maxy: float
    t0: str
    t1: str

    def box(self) -> P.BoxQuery:
        return P.BoxQuery(self.query_id, self.minx, self.miny, self.maxx, self.maxy)


def query_spatial_temporal(
    data: DataFrame,
    queries: list[STQuery],
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_cols: tuple[str, ...] = ("event_id",),
    max_cells: int = 1024,
    tiers: list[int] | None = None,
) -> DataFrame:
    """(query_id, row) pairs in box AND time interval.

    The time-bin prune (partition pruning at scale) rides on Catalyst: the
    ``ts BETWEEN`` predicate on a time_bin-partitioned table prunes via
    partition stats; we additionally push the residual before the window of
    any downstream op."""
    pre = P.cover_join(data, [q.box() for q in queries], tiers=tiers, max_cells=max_cells)
    spark = data.sparkSession
    qdf = spark.createDataFrame(
        [
            (q.query_id, q.minx, q.miny, q.maxx, q.maxy, q.t0, q.t1)
            for q in queries
        ],
        "query_id string, q_minx double, q_miny double, q_maxx double, "
        "q_maxy double, q_t0 string, q_t1 string",
    )
    refined = (
        pre.join(F.broadcast(qdf), "query_id")
        .filter(
            P.bbox_residual(
                F.col("q_minx"), F.col("q_miny"), F.col("q_maxx"), F.col("q_maxy"),
                lon=F.col(lon_col), lat=F.col(lat_col),
            )
            & (F.col(ts_col) >= F.to_timestamp("q_t0"))
            & (F.col(ts_col) <= F.to_timestamp("q_t1"))
        )
    )
    # DedupeFilter gating (mirrors operators/bbox.py): a point table at
    # MAX_RES is duplicate-free by construction — skip the global shuffle.
    from geowave_spark.functions import cells as C

    point_table = tiers is not None and all(int(t) == C.MAX_RES for t in tiers)
    if "n_dup" in data.columns and not point_table:
        refined = refined.dropDuplicates(["query_id", *id_cols])
    return refined.drop("q_minx", "q_miny", "q_maxx", "q_maxy", "q_t0", "q_t1")


def query_temporal(
    data: DataFrame, t0: str, t1: str, ts_col: str = "ts"
) -> DataFrame:
    """Pure time-range scan — Catalyst-native pushdown
    (reference TemporalQuery / DateRangeFilter)."""
    return data.filter(
        (F.col(ts_col) >= F.to_timestamp(F.lit(t0)))
        & (F.col(ts_col) <= F.to_timestamp(F.lit(t1)))
    )


# Spatial-temporal index bias presets — the reference's SPATIAL/BALANCED/
# TEMPORAL bit allocations (SpatialTemporalDimensionalityTypeProvider.java:
# 228-249: 25/10, 20/20, 10/40 spatial/temporal bits) re-expressed as
# (cell resolution, bin periodicity) pairs: more spatial bits = finer cells
# + coarser bins, more temporal bits = coarser cells + finer bins.
BIAS_PRESETS: dict[str, tuple[int, str]] = {
    "spatial": (12, "year"),
    "balanced": (10, "month"),
    "temporal": (5, "day"),
}


def with_compound_key(
    df: DataFrame,
    bias: str = "balanced",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Attach the compound (time_bin, cell_st) key for a bias preset.

    At scale these become the table's partition columns: time_bin prunes
    bins exactly like the reference's bin-prefixed keys, cell_st the
    spatial range."""
    from geowave_spark.functions import cols as X

    res, periodicity = BIAS_PRESETS[bias]
    out = with_time_bin(df, ts_col=ts_col, periodicity=periodicity)
    return out.withColumn(
        "cell_st", X.cell_encode_col(F.col(lon_col), F.col(lat_col), res)
    )
