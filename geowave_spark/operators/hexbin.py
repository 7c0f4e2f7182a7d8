"""Hexagonal density binning + k-ring hotspot smoothing (H3-analogue).

The training-pipeline shape of the reference's heatmap analytics
(analytics/spark/.../kde/KDERunner.java accumulates per-cell Gaussian
mass on a square grid): here the bin is a HEXAGONAL Voronoi cell —
hexes have uniform neighbor distance (6 equidistant neighbors vs the
square grid's 4+4 at two distances), the standard reason H3-style
aggregation is preferred for density/hotspot work.

Scale shape:

* ``hex_assign``  — pure column math (cols.hex_key_col), zero shuffle,
  whole-stage codegen.
* ``hex_density`` — ONE map-side-combinable groupBy on the hex id.
* ``hex_smooth``  — density is already contraction-sized (≤ one row
  per OCCUPIED hex); each hex SCATTERS its count to itself + its 6
  neighbors via a literal-offset explode (the repo rule: explode a
  LITERAL array, compute per row — never HOF-filter computed keys),
  then one groupBy re-aggregates.  Neighbor adjacency is symmetric,
  so scatter-by-source-parity ≡ gather-by-target-parity.

Everything is exact integer arithmetic on milli-degree coordinates —
the DuckDB oracles (registry.py hex_density / hex_hotspots) replay
assignment, density, and smoothing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cols as X
from geowave_spark.functions import hexgrid as HG


def hex_assign(
    df: DataFrame,
    res: int,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
) -> DataFrame:
    """Attach (hex_i, hex_j) — the nearest-hex-center assignment at
    ``res``.  Column math only; no shuffle, no UDF."""
    key = X.hex_key_col(F.col(lon_col), F.col(lat_col), res)
    hi, hj = X.hex_id_cols(key, res)
    return df.withColumns({"hex_i": hi, "hex_j": hj})


def hex_density(
    df: DataFrame,
    res: int,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-hex counts (and optional weight sums) with exact integer hex
    centers.  One partial-aggregated shuffle on the hex id."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    keep = [weight_col] if weight_col is not None else []
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("wsum"))
    # Group on the SINGLE packed hex id and unpack (i, j) on the
    # contraction-sized aggregate output: two big grouping expressions
    # (hex_i, hex_j each re-inlining the full argmin tree) overflow the
    # 64 KB codegen method limit in HashAggregate and drop the stage to
    # interpreted eval — one key stays codegen'd.
    key = X.hex_key_col(F.col(lon_col), F.col(lat_col), res)
    hid = F.pmod(key, F.lit(HG.PACK))
    out = df.select(hid.alias("hid"), *keep).groupBy("hid").agg(*aggs)
    hi, hj = X.hex_id_cols(F.col("hid"), res)
    out = out.withColumns({"hex_i": hi, "hex_j": hj}).drop("hid")
    lon_c, lat_c = X.hex_center_cols(F.col("hex_i"), F.col("hex_j"), res)
    out = out.withColumns({"lon_c": lon_c, "lat_c": lat_c})
    cols = ["hex_i", "hex_j", "cnt"] + (["wsum"] if weight_col else [])
    return out.select(*cols, "lon_c", "lat_c")


def _scatter_target(parity: Column, die: int, dio: int) -> Column:
    return F.when(parity == 1, F.lit(dio)).otherwise(F.lit(die))


def hex_smooth(density: DataFrame, cnt_col: str = "cnt") -> DataFrame:
    """k=1 ring smoothing: for every OCCUPIED hex, ``ring_cnt`` = its own
    count + the counts of its 6 neighbors.  Scatter/re-aggregate over a
    literal 7-offset explode; an inner join back to the density table
    restricts output to occupied hexes (empty neighbors accumulate mass
    but are not reported — hotspot queries rank occupied cells).

    The density frame is referenced TWICE (scatter source + join-back
    target), so it is localCheckpoint'd first: without the sever Catalyst
    replays the whole assignment pipeline per branch — double compute,
    and the re-inlined argmin tree overflows the 64 KB codegen method
    limit in the replayed HashAggregate.  Density is contraction-sized
    (≤ one row per occupied hex), so the materialization is cheap."""
    density = density.localCheckpoint()
    offsets = ((0, 0, 0),) + HG.NEIGHBOR_OFFSETS
    lit_offsets = F.array(
        *[
            F.struct(
                F.lit(die).alias("die"), F.lit(dio).alias("dio"), F.lit(dj).alias("dj")
            )
            for die, dio, dj in offsets
        ]
    )
    parity = F.pmod(F.col("hex_j"), F.lit(2))
    contrib = (
        density.select("hex_i", "hex_j", cnt_col)
        .withColumn("o", F.explode(lit_offsets))
        .select(
            (
                F.col("hex_i")
                + F.when(parity == 1, F.col("o.dio")).otherwise(F.col("o.die"))
            ).alias("ti"),
            (F.col("hex_j") + F.col("o.dj")).alias("tj"),
            F.col(cnt_col).alias("c"),
        )
    )
    ring = contrib.groupBy("ti", "tj").agg(F.sum("c").alias("ring_cnt"))
    return density.join(
        ring,
        (density.hex_i == ring.ti) & (density.hex_j == ring.tj),
        "inner",
    ).drop("ti", "tj")
