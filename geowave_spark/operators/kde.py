"""Gaussian-smoothed kernel-density pyramid (the reference's KDE job).

Re-expresses analytics/mapreduce/.../kde/ as one declarative plan:

* GaussianFilter.java:27-35 — the fixed 7-tap major smoothing kernel
  (sigma=1, x=-3..3): [.006, .061, .242, .383, .242, .061, .006].  All taps
  are exact multiples of 1/1000, so the engine carries integer fixed-point
  weights (tap*1000; a 2-D contribution is the product of two taps, an
  integer <= 383^2) and sums BIGINTs — bit-reproducible in the SQL oracle.
* GaussianCellMapper.java:100-112 — per level L the posts grid is
  2^(L+1) x 2^L (TILE_SIZE=1, KDEJobRunner.java:96): square degree cells,
  lon split twice as often as lat.  Bin = floor((v - min)/span * bins); the
  milli-degree integer floor-division reproduces the float floor exactly.
* GaussianFilter.incrementPtFast:112-162 — scatter-add: each point
  contributes K[dx]*K[dy] to bin (floor_x+dx, floor_y+dy) for
  dx,dy in [-3,3]^2; out-of-bounds targets are DROPPED (no wrap/clamp).
* CellSummationCombiner/Reducer — groupBy(cell).sum(): Spark's partial
  aggregation IS the combiner; the 49x offset explode collapses map-side
  before any shuffle, so the shuffle carries only distinct touched cells.
* AccumuloKDEReducer.java:137-196 — per level: normalized = value/max and
  percentile = rank/totalCells with cells ordered by weight ascending and
  ties sharing the FIRST tied rank (RANK(), not ROW_NUMBER — the reducer
  computes the percentile once per distinct weight key).

100 TB posture: one 49x map-side explode (pure literal-array column math,
no Python), one shuffle keyed by (level, gx, gy) with map-side partial
sums, one per-level window for the ranks.  The window's partition is a
whole level — at extreme scale swap the rank window for a two-pass
histogram quantile; the grid itself never bottlenecks because the explode
pre-aggregates within partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# GaussianFilter.majorSmoothingGaussianKernel x 1000 — exact integers.
KERNEL_FP = (6, 61, 242, 383, 242, 61, 6)
KERNEL_SCALE = 1000  # one tap; a 2-D weight is scaled by 1000^2

# Seasonal time-weight lookup for the comparative (seasonal-variance) KDE
# (ComparisonGaussianCellMapper.java:74-190): contribution = e^-(t*t) with
# t the month-progress normalized to [0, 3].  t is quantized to centi-units
# (0..300) and the table value is round(1e6 * exp(-(t/100)^2)) — Python
# math.exp is the SINGLE definition; Spark reads the table as a literal
# array, the oracle joins the same literals as VALUES, so the two engines
# cannot drift on transcendental libm ulps.
SEASON_T_STEPS = 300
SEASON_PPM = tuple(
    int(round(1_000_000 * math.exp(-((t / 100.0) ** 2))))
    for t in range(SEASON_T_STEPS + 1)
)


def kde_grid(
    points: DataFrame,
    levels: list[int],
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Smoothed density posts per pyramid level.

    Returns (level, gx, gy, weight_fp, weight): ``weight_fp`` is the exact
    integer fixed-point sum (scale 10^-6 per unit contribution), ``weight``
    its double value.
    """
    r = 3  # kernel radius (GaussianFilter: maxOffset = 7/2)
    offs = F.array(
        *[
            F.struct(
                F.lit(int(lv)).cast("long").alias("lvl"),
                F.lit(dx).cast("long").alias("dx"),
                F.lit(dy).cast("long").alias("dy"),
                F.lit(KERNEL_FP[dx + r] * KERNEL_FP[dy + r]).cast("long").alias("w"),
            )
            for lv in levels
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
        ]
    )
    from geowave_spark.session import spread

    d = spread(
        points.select(F.col(lon_milli).alias("_lon"), F.col(lat_milli).alias("_lat"))
    ).withColumn("_o", F.explode(offs))
    lvl = F.col("_o.lvl")
    # column shift amounts need the SQL builtin (PySpark wrapper takes
    # int literals only)
    nx = F.call_function("shiftleft", F.lit(2).cast("long"), lvl.cast("int"))  # 2^(L+1)
    ny = F.call_function("shiftleft", F.lit(1).cast("long"), lvl.cast("int"))  # 2^L

    def bin_of(v, offset: int, span: int, bins):
        shifted = v.cast("long") + F.lit(offset)
        num = shifted * bins
        return ((num - F.pmod(num, F.lit(span))) / F.lit(span)).cast("long")

    gx = bin_of(F.col("_lon"), 180_000, 360_000, nx) + F.col("_o.dx")
    gy = bin_of(F.col("_lat"), 90_000, 180_000, ny) + F.col("_o.dy")
    d = (
        d.withColumn("gx", gx)
        .withColumn("gy", gy)
        .filter(
            (F.col("gx") >= 0) & (F.col("gx") < nx)
            & (F.col("gy") >= 0) & (F.col("gy") < ny)
        )
        .groupBy(lvl.alias("level"), "gx", "gy")
        .agg(F.sum("_o.w").alias("weight_fp"))
    )
    return d.withColumn(
        "weight", F.col("weight_fp").cast("double") / F.lit(float(KERNEL_SCALE**2))
    )


def kde_levels(grid: DataFrame) -> DataFrame:
    """Attach the reducer's per-level bands (AccumuloKDEReducer.java:137-196):
    ``normalized`` = weight/max(level), ``percentile`` = rank/totalCells with
    ascending-weight RANK (ties share the first rank).

    Scale shape: a naive ``rank() OVER (PARTITION BY level)`` puts a WHOLE
    level's grid through one window partition — a single-reducer bottleneck
    at fine levels.  Instead the rank is computed EXACTLY from the
    distinct-weight histogram: RANK(cell) = 1 + Σ counts of strictly
    smaller weights, so the only window runs over distinct weight values
    (tiny — bounded by distinct mass sums, not cells) and everything else
    is partial-aggregated groupBys + a shuffle join on (level, weight_fp).
    """
    # level totals and max ALSO come from the tiny histogram (windows over
    # distinct weights), so the expensive grid subtree is computed exactly
    # twice — once feeding the histogram, once streaming through the final
    # broadcast join — instead of once per derived branch (Spark recomputes
    # a reused DataFrame subtree per reference; measured 3 scans before).
    hist = grid.groupBy("level", "weight_fp").agg(F.count("*").alias("_c"))
    w = (
        Window.partitionBy("level")
        .orderBy(F.col("weight_fp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("level")
    ranks = (
        hist.withColumn("_rank", F.sum("_c").over(w) - F.col("_c") + 1)
        .withColumn("_n", F.sum("_c").over(wl))
        .withColumn("_max", F.max("weight_fp").over(wl))
        .drop("_c")
    )
    # join strategy left to AQE: ranks is usually broadcast-small (distinct
    # weights), but at extreme scale it can grow — don't force the hint.
    return (
        grid.join(ranks, ["level", "weight_fp"])
        .select(
            "level",
            "gx",
            "gy",
            "weight_fp",
            "weight",
            (F.col("weight_fp").cast("double") / F.col("_max").cast("double")).alias(
                "normalized"
            ),
            (F.col("_rank").cast("double") / F.col("_n").cast("double")).alias(
                "percentile"
            ),
        )
    )


def kde_tiles(
    points: DataFrame,
    level: int,
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
    tile_size: int = 256,
) -> DataFrame:
    """KDE → raster pyramid tiles — the reference KDE job's actual OUTPUT
    (AccumuloKDEReducer writes GridCoverage tiles with three double bands:
    value, normalized=value/max, percentile; fromCellIndexToTileInfo maps
    post (xPost, yPost) → tile (xPost/TILE_SIZE, yPost/TILE_SIZE), pixel
    (xPost%TILE_SIZE, TILE_SIZE-1 - yPost%TILE_SIZE) — 'java rasters go
    from top to bottom').

    Post grid for tile level L at tile_size T = 2^(L+1)·T × 2^L·T — i.e.
    the kde_grid at level L + log2(T).  Tile assembly is one
    groupBy(tile).applyInPandas scatter; each tile serializes as a 3-band
    float32 RAWF raster (sources/png.raw_encode — PNG cannot carry float
    bands).  Output: (level, tile_x, tile_y, n_posts, max_norm, tile_raw).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from geowave_spark.sources import png as PNG

    shift = int(math.log2(tile_size))
    if 1 << shift != tile_size:
        raise ValueError("tile_size must be a power of two")
    grid = kde_levels(kde_grid(points, [level + shift], lon_milli, lat_milli))
    d = grid.select(
        F.lit(int(level)).cast("long").alias("level"),
        F.shiftright(F.col("gx"), shift).alias("tile_x"),
        F.shiftright(F.col("gy"), shift).alias("tile_y"),
        F.col("gx").bitwiseAND(F.lit(tile_size - 1)).alias("_px"),
        F.col("gy").bitwiseAND(F.lit(tile_size - 1)).alias("_py"),
        "weight",
        "normalized",
        "percentile",
    )
    out_schema = T.StructType(
        [
            T.StructField("level", T.LongType()),
            T.StructField("tile_x", T.LongType()),
            T.StructField("tile_y", T.LongType()),
            T.StructField("n_posts", T.IntegerType()),
            T.StructField("max_norm", T.DoubleType()),
            T.StructField("tile_raw", T.BinaryType()),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((tile_size, tile_size, 3), dtype=np.float32)
        px = pdf._px.to_numpy(np.int64)
        py = tile_size - 1 - pdf._py.to_numpy(np.int64)  # row 0 = NORTH
        canvas[py, px, 0] = pdf.weight.to_numpy(np.float64)
        canvas[py, px, 1] = pdf.normalized.to_numpy(np.float64)
        canvas[py, px, 2] = pdf.percentile.to_numpy(np.float64)
        return pd.DataFrame(
            {
                "level": [int(pdf.level.iloc[0])],
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_posts": [len(pdf)],
                "max_norm": [float(pdf.normalized.max())],
                "tile_raw": [PNG.raw_encode(canvas)],
            }
        )

    return d.groupBy("level", "tile_x", "tile_y").applyInPandas(assemble, out_schema)


def seasonal_weight_cols(ts):
    """(is_winter, t_cent) for the comparative KDE's seasonal gaussian
    (ComparisonGaussianCellMapper.java:74-190).

    The reference splits the year into a winter accumulator (Oct-Mar) and a
    summer accumulator (Apr-Sep): Jan-Mar ramp DOWN from the year boundary
    (t grows with month progress), Oct-Dec ramp UP toward the next year
    boundary (t shrinks), April ramps INTO summer (t = distance from May),
    September ramps OUT (t = distance from Sep 1), May-Aug contribute 1.
    Divergence from the reference, disclosed: Calendar day-of-month 0 rolls
    to the previous month's last day there; boundaries here are clean
    calendar-month firsts.  t in [0,3] is quantized to integer centi-units
    so the exp() lookup is table-driven (SEASON_PPM) and engine-exact.
    """
    u = F.unix_micros(ts)
    y, m = F.year(ts), F.month(ts)

    def mstart(year_col, month_col):
        return F.unix_micros(
            F.make_timestamp(year_col, month_col, F.lit(1), F.lit(0), F.lit(0), F.lit(0))
        )

    jan1 = mstart(y, F.lit(1))
    apr1 = mstart(y, F.lit(4))
    may1 = mstart(y, F.lit(5))
    sep1 = mstart(y, F.lit(9))
    oct1 = mstart(y, F.lit(10))
    jan1n = mstart(y + 1, F.lit(1))

    is_winter = (m <= 3) | (m >= 10)
    delta = (
        F.when(m <= 3, u - jan1)
        .when(m >= 10, jan1n - u)
        .when(m == 4, may1 - u)
        .when(m == 9, u - sep1)
        .otherwise(F.lit(0).cast("long"))
    )
    span = (
        F.when(m <= 3, apr1 - jan1)
        .when(m >= 10, jan1n - oct1)
        .when(m == 4, may1 - apr1)
        .when(m == 9, oct1 - sep1)
        .otherwise(F.lit(1).cast("long"))
    )
    steps = F.lit(SEASON_T_STEPS).cast("long")
    num = delta * steps
    t_cent = F.least(((num - F.pmod(num, span)) / span).cast("long"), steps)
    return is_winter, t_cent


def kde_compare(
    points: DataFrame,
    levels: list[int],
    ts_col: str = "ts",
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Comparative (seasonal-variance) KDE — the reference's kde/compare
    package (ComparisonStatsJobRunner.java + ComparisonGaussianCellMapper +
    ComparisonCellData): two seasonally time-weighted density grids over the
    same posts pyramid, per-level ascending-weight percentile for each
    season, and ``combined = summer_percentile - winter_percentile``
    (ComparisonCellData.applyCombinationFunction:95-99) — the cells with the
    largest |combined| are where density shifts between seasons.

    One plan, no season split-and-union: the seasonal weight is a column, so
    a single 49x offset explode + ONE shuffle on (level, gx, gy) produces
    both seasons' sums via conditional aggregation (the MR pipeline runs two
    full KDE jobs and joins; a cell missing from one season carries weight 0
    exactly as ComparisonCombiningStatsReducer defaults).  Percentiles reuse
    the histogram-rank trick of :func:`kde_levels` per season — no
    whole-level window at scale.  weight_fp scale: ppm contribution x
    tap^2/10^6 => 10^-12 per unit; BIGINT overflows past ~6e7 points per
    cell — at that density lower SEASON_PPM's scale before ingest.
    """
    r = 3
    offs = F.array(
        *[
            F.struct(
                F.lit(int(lv)).cast("long").alias("lvl"),
                F.lit(dx).cast("long").alias("dx"),
                F.lit(dy).cast("long").alias("dy"),
                F.lit(KERNEL_FP[dx + r] * KERNEL_FP[dy + r]).cast("long").alias("w"),
            )
            for lv in levels
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
        ]
    )
    from geowave_spark.session import spread

    is_winter, t_cent = seasonal_weight_cols(F.col(ts_col))
    ppm_table = F.array(*[F.lit(v).cast("long") for v in SEASON_PPM])
    d = spread(
        points.select(
            F.col(lon_milli).alias("_lon"),
            F.col(lat_milli).alias("_lat"),
            is_winter.alias("_wtr"),
            F.element_at(ppm_table, t_cent.cast("int") + 1).alias("_ppm"),
        )
    ).withColumn("_o", F.explode(offs))
    lvl = F.col("_o.lvl")
    nx = F.call_function("shiftleft", F.lit(2).cast("long"), lvl.cast("int"))
    ny = F.call_function("shiftleft", F.lit(1).cast("long"), lvl.cast("int"))

    def bin_of(v, offset: int, span: int, bins):
        shifted = v.cast("long") + F.lit(offset)
        num = shifted * bins
        return ((num - F.pmod(num, F.lit(span))) / F.lit(span)).cast("long")

    gx = bin_of(F.col("_lon"), 180_000, 360_000, nx) + F.col("_o.dx")
    gy = bin_of(F.col("_lat"), 90_000, 180_000, ny) + F.col("_o.dy")
    contrib = F.col("_o.w") * F.col("_ppm")
    grid = (
        d.withColumn("gx", gx)
        .withColumn("gy", gy)
        .filter(
            (F.col("gx") >= 0) & (F.col("gx") < nx)
            & (F.col("gy") >= 0) & (F.col("gy") < ny)
        )
        .groupBy(lvl.alias("level"), "gx", "gy")
        .agg(
            F.sum(F.when(~F.col("_wtr"), contrib).otherwise(F.lit(0).cast("long")))
            .alias("summer_fp"),
            F.sum(F.when(F.col("_wtr"), contrib).otherwise(F.lit(0).cast("long")))
            .alias("winter_fp"),
        )
    )

    # Percentiles via the kde_levels histogram-rank trick, but BOTH seasons'
    # distinct-weight histograms come out of ONE extra grid pass (a 2x
    # season explode), and the resulting rank table — tiny: distinct weight
    # values per (level, season) — is localCheckpoint'd so the two filtered
    # join branches don't each recompute the explode+shuffle grid subtree.
    # Grid subtree executions: 1 (rank table) + 1 (final stream) = 2,
    # versus 5 for the naive stats/hist-per-season derivation (measured).
    season_fps = grid.select(
        "level",
        F.explode(
            F.array(
                F.struct(F.lit("s").alias("_season"), F.col("summer_fp").alias("_fp")),
                F.struct(F.lit("w").alias("_season"), F.col("winter_fp").alias("_fp")),
            )
        ).alias("_p"),
    ).select("level", "_p._season", "_p._fp")
    hist = season_fps.groupBy("level", "_season", "_fp").agg(
        F.count("*").alias("_c")
    )
    wrank = (
        Window.partitionBy("level", "_season")
        .orderBy(F.col("_fp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlvl = Window.partitionBy("level", "_season")
    rank_table = (
        hist.withColumn("_rank", F.sum("_c").over(wrank) - F.col("_c") + 1)
        .withColumn("_n", F.sum("_c").over(wlvl))
        .drop("_c")
        .localCheckpoint(eager=False)
    )
    s_ranks = rank_table.filter(F.col("_season") == "s").select(
        "level",
        F.col("_fp").alias("summer_fp"),
        F.col("_rank").alias("_rank_s"),
        F.col("_n").alias("_n_s"),
    )
    w_ranks = rank_table.filter(F.col("_season") == "w").select(
        "level",
        F.col("_fp").alias("winter_fp"),
        F.col("_rank").alias("_rank_w"),
        F.col("_n").alias("_n_w"),
    )
    out = grid.join(s_ranks, ["level", "summer_fp"]).join(
        w_ranks, ["level", "winter_fp"]
    )
    sp = F.col("_rank_s").cast("double") / F.col("_n_s").cast("double")
    wp = F.col("_rank_w").cast("double") / F.col("_n_w").cast("double")
    return out.select(
        "level",
        "gx",
        "gy",
        "summer_fp",
        "winter_fp",
        sp.alias("summer_pct"),
        wp.alias("winter_pct"),
        (sp - wp).alias("combined"),
    )
