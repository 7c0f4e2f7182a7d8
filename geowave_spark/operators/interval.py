"""1-D temporal joins: as-of (point-in-time) join and interval overlap
join — the time-axis twins of the spatial machinery.

The reference's temporal support is range CONSTRAINTS on a compound key
(core/geotime/.../TemporalConstraints.java, SpatialTemporalQuery ITs);
it has no dataset-to-dataset temporal join.  A training-data/event
pipeline needs both of the classic ones Spark lacks as built-ins:

* ``asof_join`` — for every left row, the latest right row of the same
  key at-or-before its timestamp (point-in-time enrichment, the "ASOF
  JOIN" of kdb/DuckDB/Pandas ``merge_asof``);
* ``interval_join`` — all (point, interval) pairs with
  ``lo <= pos <= hi`` (session attribution, validity windows) — the 1-D
  analogue of ``join.points_in_envelopes_join`` with the same
  dedup-free cover-join proof.

Scale posture:

* as-of: ONE shuffle of both sides on the key (union → window), no
  fan-out, no driver state.  Right-row attributes travel as a single
  struct so the carried (id, ts, values) tuple is atomic — per-column
  ``last(ignorenulls)`` would mix attributes of different right rows
  when a value is legitimately NULL.  A pathologically hot key serializes
  its window sort; production splits such keys by time-chunk with a
  per-chunk carry (two passes) — same operator contract.
* interval: buckets on a fixed grid; a point has exactly ONE bucket, an
  interval explodes to the buckets it covers (bounded by
  ``max_buckets`` — the never-silently-truncate guard raises on wider
  intervals, the caller picks ``bucket`` from the known duration bound),
  so each qualifying pair meets on exactly one key: no dedup pass.
  Equi-join + AQE skew handling, identical to the spatial cover join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.operators.index import _invariant_guard


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_vals: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Latest-at-or-before match: for each left row, the right row of the
    same ``key`` with the greatest ``right_ts <= left_ts`` (ties on the
    timestamp broken by greatest ``right_id`` — deterministic).

    Output: (``left_id``, ``key``, ``left_ts``, ``asof_id``, ``asof_ts``,
    *right_vals).  ``how='left'`` keeps unmatched left rows with NULLs;
    ``'inner'`` drops them.

    Plan: tag both sides, union, ONE window over (key) ordered by
    (ts, side, right_id) carrying the whole right row as a struct with
    ``last(ignorenulls=True)`` — right rows sort before left rows at equal
    timestamps, so an exactly-simultaneous right row matches.
    """
    rstruct = F.struct(
        F.col(right_ts).alias("_ats"),
        F.col(right_id).alias("_aid"),
        *[F.col(v).alias(v) for v in right_vals],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_oid"),
        rstruct.alias("_r"),
    )
    null_struct = F.lit(None).cast(r.schema["_r"].dataType)
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.col(left_id).alias("_oid"),
        null_struct.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l.unionByName(r)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            F.col("_oid").alias(left_id),
            F.col("_k").alias(key),
            F.col("_t").alias(left_ts),
            F.col("_match._aid").alias("asof_id"),
            F.col("_match._ats").alias("asof_ts"),
            *[F.col(f"_match.{v}").alias(v) for v in right_vals],
        )
    )
    if how == "inner":
        out = out.filter(F.col("asof_id").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    pos: str = "pos",
    lo: str = "lo",
    hi: str = "hi",
    point_id: str = "point_id",
    interval_id: str = "interval_id",
    bucket: int = 3600,
    max_buckets: int = 64,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= pos <= hi`` over integer
    axis columns (epoch seconds, positions, offsets — caller's choice).

    Output: (``point_id``, ``interval_id``, ``pos``) — closed bounds.

    The cover join: points key to ``floor(pos / bucket)``, intervals
    explode to every covered bucket.  One bucket per point ⇒ each
    qualifying pair meets on exactly one join key ⇒ provably no
    duplicates, no dedup pass (same argument as
    ``points_in_envelopes_join``).  An interval covering more than
    ``max_buckets`` buckets (or inverted, which would make ``sequence``
    descend) fails fast via the pre-explode guard filter — the caller
    sizes ``bucket`` from the corpus duration bound, exactly like the
    tile cover's never-silently-truncate rule.
    """
    from geowave_spark.session import spread

    p = points.select(
        F.col(point_id),
        F.col(pos).cast("long").alias("_pos"),
    ).withColumn("_b", F.floor(F.col("_pos") / bucket).cast("long"))

    iv = spread(intervals).select(
        F.col(interval_id),
        F.col(lo).cast("long").alias("_lo"),
        F.col(hi).cast("long").alias("_hi"),
    )
    b0 = F.floor(F.col("_lo") / bucket).cast("long")
    b1 = F.floor(F.col("_hi") / bucket).cast("long")
    iv = (
        iv.withColumn("_b0", b0)
        .withColumn("_b1", b1)
        .filter(
            _invariant_guard(
                # _hi < _lo (NOT the bucket compare: a sub-bucket inversion
                # has b1 == b0 and would silently match nothing)
                (F.col("_hi") < F.col("_lo"))
                | (F.col("_b1") - F.col("_b0") + 1 > max_buckets),
                "interval_join: interval inverted or covers more than "
                "max_buckets buckets — raise bucket or max_buckets",
            )
        )
        .withColumn("_b", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    return (
        p.join(iv, "_b")
        .filter((F.col("_pos") >= F.col("_lo")) & (F.col("_pos") <= F.col("_hi")))
        .select(point_id, interval_id, F.col("_pos").alias(pos))
    )
