"""Trajectory analytics over the reference's track data model.

The reference ingests four track formats — GPX (`extensions/formats/gpx/
.../GPXConsumer.java`), GeoLife (`.../geolife/GeoLifeIngestPlugin.java`),
T-Drive (`.../tdrive/TdriveIngestPlugin.java`), STANAG4676 (`.../stanag4676`)
— all producing ordered (track_id, timestamp, lon, lat) points, but ships
no analytics over them beyond spatial indexing.  This module adds the
operations a track corpus actually needs, each in the scale-correct Spark
shape:

* **segmentation** (`segment_tracks`) — time-gap sessionization: one
  window per track (partitions are device-history-sized, never
  data-volume-sized) splits each track at gaps > ``gap_s``;
* **segment summaries** (`segment_summary`) — per-segment counts,
  duration, exact-integer Manhattan path length in milli-degrees (the
  fixed-grid length proxy that keeps the DuckDB oracle bit-exact;
  haversine meters are one extra float column in production), max step;
* **stay points** (`stay_points`) — grid-dwell runs: consecutive points
  in the same coarse cell for ≥ ``min_dur_s`` (the run-length-encoded,
  SQL-replayable variant of GeoLife-style stay-point detection);
* **simplification** (`simplify_tracks`) — Douglas–Peucker per segment
  with EXACT integer predicates (cross-product² vs tol²·|chord|² — no
  float distance, so keep/drop decisions are reproducible bit-for-bit);
* **similarity** (`track_hausdorff_pairs`) — discrete symmetric Hausdorff
  distance² between candidate track pairs, candidates gated by a shared
  coarse start cell (never all-pairs), the max-min computed as two
  map-side-combinable aggregations over a role-swapped union (one joined
  frame, no per-pair loop).

Everything except Douglas–Peucker (recursive; pytest-pinned against a
brute-force reference) is integer math end-to-end and replays exactly in
DuckDB — see the track_* registry oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def track_points(
    geo: DataFrame,
    track_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    x_col: str = "lon_milli",
    y_col: str = "lat_milli",
) -> DataFrame:
    """Normalize a point table to the track grain: (track_id, pt_id, ts,
    t [unix seconds], x, y).  Ordering key is (ts, pt_id) — full timestamp
    precision with a unique tie-break, the contract every window below
    relies on."""
    return geo.select(
        F.col(track_col).cast("long").alias("track_id"),
        F.col(id_col).cast("long").alias("pt_id"),
        F.col(ts_col).alias("ts"),
        F.unix_timestamp(ts_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )


def _track_window() -> Window:
    return Window.partitionBy("track_id").orderBy("ts", "pt_id")


def segment_tracks(pts: DataFrame, gap_s: int = 86_400) -> DataFrame:
    """Split each track where the time gap to the previous point exceeds
    ``gap_s``: adds ``seg`` (0-based per track).  ONE window per track —
    the lag and the running sum share the same partitioning+sort, so
    Catalyst plans a single exchange and a single sort."""
    w = _track_window()
    brk = pts.withColumn(
        "_brk",
        F.when(F.col("t") - F.lag("t").over(w) > F.lit(gap_s), 1).otherwise(0),
    )
    return brk.withColumn(
        "seg",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_brk")


def segment_summary(seg_pts: DataFrame) -> DataFrame:
    """Per-(track, seg) summary: n_points, t_start/t_end/dur_s, exact
    integer Manhattan path length and max step in milli-degrees.  The lag
    reuses the segmentation window's partitioning; the groupBy is
    map-side combinable."""
    w = _track_window()
    stepped = seg_pts.withColumn(
        "_step",
        F.when(
            F.lag("seg").over(w) == F.col("seg"),
            F.abs(F.col("x") - F.lag("x").over(w))
            + F.abs(F.col("y") - F.lag("y").over(w)),
        ).otherwise(F.lit(0)),
    )
    return stepped.groupBy("track_id", "seg").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
        (F.max("t") - F.min("t")).alias("dur_s"),
        F.sum("_step").alias("path_m"),
        F.max("_step").alias("max_step_m"),
    )


def stay_points(
    pts: DataFrame,
    cell_milli: int = 2_000,
    min_dur_s: int = 21_600,
) -> DataFrame:
    """Grid-dwell stay points: maximal runs of consecutive points (track
    order) inside one ``cell_milli`` grid cell, kept when the dwell lasts
    ≥ ``min_dur_s``.  Output: (track_id, gx, gy, t_start, t_end, dur_s,
    n_points).

    This is the run-length-encoded variant of GeoLife stay-point
    detection (Zheng et al.): anchor-radius semantics need a sequential
    scan, grid-dwell needs two windows and one groupBy — the shape that
    replays in SQL and survives 10^12 points."""
    from geowave_spark.functions.cols import _idiv_col

    gx = _idiv_col(F.col("x") + F.lit(180_000), F.lit(cell_milli))
    gy = _idiv_col(F.col("y") + F.lit(90_000), F.lit(cell_milli))
    w = _track_window()
    celled = pts.withColumn("gx", gx).withColumn("gy", gy)
    flagged = celled.withColumn(
        "_chg",
        F.when(
            (F.lag("gx").over(w) == F.col("gx"))
            & (F.lag("gy").over(w) == F.col("gy")),
            0,
        ).otherwise(1),
    )
    runs = flagged.withColumn(
        "_run",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_chg")
    return (
        runs.groupBy("track_id", "_run", "gx", "gy")
        .agg(
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
            (F.max("t") - F.min("t")).alias("dur_s"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .filter(F.col("dur_s") >= F.lit(min_dur_s))
        .drop("_run")
    )


# ---------------------------------------------------------------------------
# Douglas–Peucker simplification (exact integer predicates)
# ---------------------------------------------------------------------------


def _dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol_milli: int) -> np.ndarray:
    """Iterative Douglas–Peucker over one polyline; returns the keep mask.
    The distance test is exact: point P is farther than tol from chord AB
    iff  cross(AB, AP)² > tol² · |AB|².  cross can reach ~2^38 so its
    square overflows int64 — the loop deliberately uses Python ints
    (arbitrary precision), never numpy arithmetic."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    tol2 = int(tol_milli) * int(tol_milli)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = int(xs[a]), int(ys[a]), int(xs[b]), int(ys[b])
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, best_i = -1, -1
        for i in range(a + 1, b):
            px, py = int(xs[i]) - ax, int(ys[i]) - ay
            if len2 == 0:  # degenerate chord: plain squared distance to A
                metric, thresh = px * px + py * py, tol2
            else:
                cross = dx * py - dy * px
                metric, thresh = cross * cross, tol2 * len2
            if metric > thresh and metric > best:
                best, best_i = metric, i
        if best_i >= 0:
            keep[best_i] = True
            stack.append((a, best_i))
            stack.append((best_i, b))
    return keep


_SIMPLIFY_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.LongType()),
        T.StructField("seg", T.LongType()),
        T.StructField("pt_id", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def simplify_tracks(seg_pts: DataFrame, tol_milli: int = 500) -> DataFrame:
    """Douglas–Peucker per (track, seg): keeps endpoints plus every point
    whose exact integer deviation from the current chord exceeds
    ``tol_milli``.  Per-segment ``applyInPandas`` — segment sizes are
    bounded by the segmentation gap, so the kernel is bounded work;
    the decision predicate is integer-exact (bit-reproducible across
    runs and partitionings; pytest pins it against a brute-force
    recursive reference)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "pt_id"], kind="mergesort")
        if len(pdf) <= 2:
            mask = np.ones(len(pdf), dtype=bool)
        else:
            mask = _dp_keep_mask(
                pdf["x"].to_numpy(np.int64),
                pdf["y"].to_numpy(np.int64),
                tol_milli,
            )
        out = pdf.loc[mask, ["track_id", "seg", "pt_id", "t", "x", "y"]]
        return out

    return seg_pts.groupBy("track_id", "seg").applyInPandas(
        kernel, _SIMPLIFY_SCHEMA
    )


# ---------------------------------------------------------------------------
# track similarity: discrete symmetric Hausdorff² over candidate pairs
# ---------------------------------------------------------------------------

def _banded_candidates(
    pts: DataFrame, cell_milli: int, end_gate: bool = False
) -> DataFrame:
    """Candidate track pairs for the similarity joins: pairs whose FIRST
    points share a ``cell_milli`` grid cell — and, with ``end_gate``,
    whose LAST points also share a cell.  The end gate multiplies the
    selectivity (independent-ish start/end positions) and is the first
    dial to turn when the per-pair point join gets heavy: exact Hausdorff/
    Fréchet cost is O(n_a · n_b) joined rows PER PAIR, so the candidate
    count is the term that must stay controlled at corpus scale (the
    other dial: simplify_tracks first, compare the simplified tracks)."""
    from geowave_spark.functions.cols import _idiv_col

    w = _track_window()
    gx = _idiv_col(F.col("x") + F.lit(180_000), F.lit(cell_milli))
    gy = _idiv_col(F.col("y") + F.lit(90_000), F.lit(cell_milli))
    ranked = pts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_rnd",
        F.row_number().over(
            Window.partitionBy("track_id").orderBy(
                F.col("ts").desc(), F.col("pt_id").desc()
            )
        ),
    )
    firsts = ranked.filter(F.col("_rn") == 1).select(
        "track_id", gx.alias("gx"), gy.alias("gy")
    )
    a = firsts.select(F.col("track_id").alias("track_a"), "gx", "gy")
    b = firsts.select(F.col("track_id").alias("track_b"), "gx", "gy")
    cand = (
        a.join(b, on=["gx", "gy"])
        .filter(F.col("track_a") < F.col("track_b"))
        .select("track_a", "track_b")
    )
    if end_gate:
        lasts = ranked.filter(F.col("_rnd") == 1).select(
            "track_id", gx.alias("egx"), gy.alias("egy")
        )
        ea = lasts.select(F.col("track_id").alias("track_a"), "egx", "egy")
        eb = lasts.select(F.col("track_id").alias("track_b"), "egx", "egy")
        ecand = (
            ea.join(eb, on=["egx", "egy"])
            .filter(F.col("track_a") < F.col("track_b"))
            .select("track_a", "track_b")
        )
        cand = cand.join(ecand, on=["track_a", "track_b"], how="left_semi")
    return cand



def track_hausdorff_pairs(
    pts: DataFrame,
    cell_milli: int = 2_000,
    end_gate: bool = False,
) -> DataFrame:
    """Symmetric discrete Hausdorff distance² (milli-degrees²) between
    every candidate track pair, candidates = pairs whose FIRST points
    share a ``cell_milli`` grid cell (the banding gate: never all-pairs —
    the standard trick every dedup operator in this repo uses).

    Plan: starts via one per-track window (rn = 1) → self-join on the
    start cell (a < b) → the candidate list joins each side's points →
    role-swapped union → groupBy (pair, side, point) MIN then
    groupBy (pair) MAX.  Both aggregations are map-side combinable; no
    window touches the joined point set.  Output: (track_a, track_b,
    hausdorff2)."""
    from geowave_spark.functions.cols import _idiv_col

    cand = _banded_candidates(pts, cell_milli, end_gate=end_gate)
    slim = pts.select("track_id", "pt_id", "x", "y")
    pa = slim.select(
        F.col("track_id").alias("track_a"),
        F.col("pt_id").alias("pa_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
    )
    pb = slim.select(
        F.col("track_id").alias("track_b"),
        F.col("pt_id").alias("pb_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    joined = cand.join(pa, "track_a").join(pb, "track_b")
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    both = joined.select(
        "track_a",
        "track_b",
        F.lit(0).alias("side"),
        F.col("pa_id").alias("pid"),
        d2.alias("d2"),
    ).unionByName(
        joined.select(
            "track_a",
            "track_b",
            F.lit(1).alias("side"),
            F.col("pb_id").alias("pid"),
            d2.alias("d2"),
        )
    )
    per_point = both.groupBy("track_a", "track_b", "side", "pid").agg(
        F.min("d2").alias("min_d2")
    )
    return per_point.groupBy("track_a", "track_b").agg(
        F.max("min_d2").alias("hausdorff2")
    )


def od_flows(
    pts: DataFrame,
    cell_milli: int = 2_000,
) -> DataFrame:
    """Origin–destination flow matrix: per track, each consecutive point
    pair whose ``cell_milli`` grid cells differ contributes one
    (origin cell → destination cell) transition; flows are the global
    counts.  One lag window per track + one map-side-combinable groupBy —
    the aggregate is cells², never points², so the result is tiny at any
    input scale.  Output: (gx0, gy0, gx1, gy1, n_trips, n_tracks)."""
    from geowave_spark.functions.cols import _idiv_col

    gx = _idiv_col(F.col("x") + F.lit(180_000), F.lit(cell_milli))
    gy = _idiv_col(F.col("y") + F.lit(90_000), F.lit(cell_milli))
    w = _track_window()
    celled = pts.withColumn("gx", gx).withColumn("gy", gy)
    hops = celled.select(
        "track_id",
        F.lag("gx").over(w).alias("gx0"),
        F.lag("gy").over(w).alias("gy0"),
        F.col("gx").alias("gx1"),
        F.col("gy").alias("gy1"),
    ).filter(
        F.col("gx0").isNotNull()
        & ((F.col("gx0") != F.col("gx1")) | (F.col("gy0") != F.col("gy1")))
    )
    return hops.groupBy("gx0", "gy0", "gx1", "gy1").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.count_distinct("track_id").alias("n_tracks"),
    )


def _frechet2_kernel(ax, ay, bx, by) -> int:
    """Discrete Fréchet distance² via the standard O(n·m) DP (Eiter &
    Mannila 1994), integer-exact: c[i,j] = max(d²(i,j), min(c[i-1,j],
    c[i,j-1], c[i-1,j-1])).  Row-rolling numpy; d² ≤ 2·(360000)² < 2^39
    so int64 arithmetic never overflows."""
    n, m = len(ax), len(bx)
    dx = ax[:, None] - bx[None, :]
    dy = ay[:, None] - by[None, :]
    d2 = dx * dx + dy * dy  # (n, m) int64
    prev = np.empty(m, dtype=np.int64)
    prev[0] = d2[0, 0]
    for j in range(1, m):
        prev[j] = max(prev[j - 1], d2[0, j])
    for i in range(1, n):
        cur = np.empty(m, dtype=np.int64)
        cur[0] = max(prev[0], d2[i, 0])
        for j in range(1, m):
            cur[j] = max(min(prev[j], cur[j - 1], prev[j - 1]), d2[i, j])
        prev = cur
    return int(prev[m - 1])


_FRECHET_SCHEMA = T.StructType(
    [
        T.StructField("track_a", T.LongType()),
        T.StructField("track_b", T.LongType()),
        T.StructField("frechet2", T.LongType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
    ]
)


def track_frechet_pairs(
    pts: DataFrame,
    cell_milli: int = 2_000,
    end_gate: bool = False,
) -> DataFrame:
    """Discrete Fréchet distance² between candidate track pairs — the
    ORDER-AWARE companion to :func:`track_hausdorff_pairs` (a there-and-
    back track is Hausdorff-close to its first leg but Fréchet-far).
    Same start-cell banding gate; per pair, BOTH tracks' points gather
    into one ``applyInPandas`` group (n+m rows, never n·m — the DP
    materializes the n×m lattice only inside the numpy kernel, bounded
    by track length).  Integer-exact; pytest-pinned against a recursive
    brute force (the minimax DP has no SQL-window replay, so this is a
    rows-only operator by construction)."""
    cand = _banded_candidates(pts, cell_milli, end_gate=end_gate)
    slim = pts.select("track_id", "ts", "pt_id", "x", "y")
    sa = cand.join(
        slim.withColumnRenamed("track_id", "track_a"), "track_a"
    ).select("track_a", "track_b", F.lit(0).alias("side"), "ts", "pt_id", "x", "y")
    sb = cand.join(
        slim.withColumnRenamed("track_id", "track_b"), "track_b"
    ).select("track_a", "track_b", F.lit(1).alias("side"), "ts", "pt_id", "x", "y")
    both = sa.unionByName(sb)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "pt_id"], kind="mergesort")
        pa = pdf[pdf["side"] == 0]
        pb = pdf[pdf["side"] == 1]
        f2 = _frechet2_kernel(
            pa["x"].to_numpy(np.int64), pa["y"].to_numpy(np.int64),
            pb["x"].to_numpy(np.int64), pb["y"].to_numpy(np.int64),
        )
        return pd.DataFrame(
            {
                "track_a": [int(pdf["track_a"].iloc[0])],
                "track_b": [int(pdf["track_b"].iloc[0])],
                "frechet2": [f2],
                "n_a": [len(pa)],
                "n_b": [len(pb)],
            }
        )

    return both.groupBy("track_a", "track_b").applyInPandas(
        kernel, _FRECHET_SCHEMA
    )


MAX_GRID_PER_TRACK = 100_000  # resample explode bound (never truncate)


def resample_tracks(
    pts: DataFrame,
    step_s: int = 3_600,
) -> DataFrame:
    """Resample every track to a fixed time grid (epochs divisible by
    ``step_s`` inside the track's [t_min, t_max]) with EXACT integer
    linear interpolation — the standard prep for fixed-length track
    features (similarity over aligned vectors, ML windows, map display).

    Interpolation: between bracketing points (t0,x0) and (t1,x1),
    ``x_g = x0 + floor(dx·(g−t0) / (t1−t0))`` with the floor computed by
    shifting the numerator non-negative (dx can be negative; DuckDB's
    ``//`` truncates while Python floors — the shift makes both agree,
    CLAUDE.md rule).  A grid epoch landing exactly on a point returns
    that point.

    Plan: per-track bounds via one window; grid epochs are a bounded
    ``sequence`` explode (never-truncate guard at MAX_GRID_PER_TRACK);
    bracketing is the as-of UNION trick (interval.py pattern): grid rows
    and data rows interleave in ONE per-track window, ``last(ignorenulls)``
    looking back and ``first(ignorenulls)`` looking forward — no
    point×grid join ever materializes.  Output: (track_id, t_grid, x, y).
    """
    from geowave_spark.operators.index import _invariant_guard

    w = _track_window()
    bounds = pts.withColumn("_tmin", F.min("t").over(
        Window.partitionBy("track_id")
    )).withColumn("_tmax", F.max("t").over(Window.partitionBy("track_id")))
    g0 = F.ceil(F.col("_tmin") / F.lit(step_s)) * step_s
    g1 = F.floor(F.col("_tmax") / F.lit(step_s)) * step_s
    one = (
        bounds.select("track_id", g0.alias("_g0"), g1.alias("_g1"))
        .groupBy("track_id")
        .agg(F.first("_g0").alias("_g0"), F.first("_g1").alias("_g1"))
        .filter(F.col("_g1") >= F.col("_g0"))
    )
    guarded = one.filter(
        _invariant_guard(
            (F.col("_g1") - F.col("_g0")) / F.lit(step_s)
            >= F.lit(MAX_GRID_PER_TRACK),
            f"track resample grid exceeds {MAX_GRID_PER_TRACK} epochs — "
            "use a coarser step_s",
        )
    )
    grid = guarded.select(
        "track_id",
        F.explode(
            F.sequence(F.col("_g0"), F.col("_g1"), F.lit(step_s))
        ).alias("t"),
    ).select(
        "track_id",
        F.col("t").cast("long").alias("t"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("long").alias("x"),
        F.lit(None).cast("long").alias("y"),
        F.lit(None).cast("long").alias("pt_id"),
    )
    data = pts.select(
        "track_id", "t", F.lit(0).alias("_is_grid"), "x", "y", "pt_id"
    )
    # interleave: at equal t the DATA row sorts first (_is_grid 0 < 1),
    # so an on-point grid epoch sees it as its "previous" row exactly
    both = data.unionByName(grid)
    wo = Window.partitionBy("track_id").orderBy(
        "t", "_is_grid", F.coalesce("pt_id", F.lit(2**62))
    )
    back = wo.rowsBetween(Window.unboundedPreceding, 0)
    fwd = wo.rowsBetween(0, Window.unboundedFollowing)
    marked = (
        both.withColumn("_t0", F.last(F.when(F.col("_is_grid") == 0, F.col("t")), ignorenulls=True).over(back))
        .withColumn("_x0", F.last(F.when(F.col("_is_grid") == 0, F.col("x")), ignorenulls=True).over(back))
        .withColumn("_y0", F.last(F.when(F.col("_is_grid") == 0, F.col("y")), ignorenulls=True).over(back))
        .withColumn("_t1", F.first(F.when(F.col("_is_grid") == 0, F.col("t")), ignorenulls=True).over(fwd))
        .withColumn("_x1", F.first(F.when(F.col("_is_grid") == 0, F.col("x")), ignorenulls=True).over(fwd))
        .withColumn("_y1", F.first(F.when(F.col("_is_grid") == 0, F.col("y")), ignorenulls=True).over(fwd))
        .filter(F.col("_is_grid") == 1)
    )

    def lerp(v0, v1):
        # floor((v1-v0)·num/den) with a non-negative shift of 360000·den
        num = F.col("t") - F.col("_t0")
        den = F.col("_t1") - F.col("_t0")
        shifted = (v1 - v0) * num + F.lit(360_000) * den
        q = ((shifted - F.pmod(shifted, den)) / den).cast("long")
        return v0 + q - F.lit(360_000)

    # the final epoch can coincide with the last data point, whose row
    # sorts BEFORE the grid row (data-first interleave) — the forward
    # bracket is then empty and the back bracket IS the answer
    def pick(v0, v1):
        return (
            F.when(F.col("_t1").isNull(), v0)
            .when(F.col("_t1") == F.col("_t0"), v0)
            .otherwise(lerp(v0, v1))
        )

    return marked.select(
        "track_id",
        F.col("t").alias("t_grid"),
        pick(F.col("_x0"), F.col("_x1")).alias("x"),
        pick(F.col("_y0"), F.col("_y1")).alias("y"),
    )
