"""Contour (isoline) extraction over density grids — marching squares.

The raster→vector closing arm next to ``vectorize.polygonize`` (masks →
boundary polygons): given the engine's density/KDE surfaces (exact
integer cell values — scan.density_grid, kde.kde_grid), emit the
threshold-T isoline as per-block line segments with fixed-point
interpolated endpoints.

Exactness contract: the whole derivation — corner gathering, the 16-case
marching-squares table (saddles resolved by the integer center rule),
and the edge interpolation — is ONE generated SQL fragment evaluated via
``F.expr`` on the Spark side and embedded verbatim in the DuckDB oracle
(the evenodd_sql pattern: one generator, bit-identical literals).
Interpolation is integer fixed-point: position on a crossing edge =
``((T - v_out) * SCALE) // (v_in - v_out)`` oriented so every term is
non-negative (DuckDB ``//`` truncates, Python floors — non-negative
makes them agree; CLAUDE.md rule).

Plan shape: each non-empty grid cell contributes its value to the ≤4
blocks it corners (LITERAL 4-struct explode — never a computed array),
ONE groupBy pivots the corners, segments emerge from a literal [0, 1]
slot explode + CASE filter.  Work is proportional to non-empty cells;
empty regions produce no blocks and no segments (all-outside blocks are
case 0 by construction since T ≥ 1).

No reference analogue (GeoWave renders rasters; it never vectorizes
them) — engine-native capability on the raster↔vector axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000  # fixed-point positions per grid step

# Marching-squares case table.  Corner bits: 1=v00 (SW), 2=v10 (SE),
# 4=v11 (NE), 8=v01 (NW).  Edges: 0=bottom (v00-v10), 1=right (v10-v11),
# 2=top (v01-v11), 3=left (v00-v01).  Each case lists up to two segments
# as (edge_a, edge_b); saddles (5, 10) carry two variants keyed by the
# integer center rule v00+v10+v01+v11 >= 4T.
CASES: dict[int, list[tuple[int, int]]] = {
    0: [],
    1: [(0, 3)],
    2: [(1, 0)],
    3: [(1, 3)],
    4: [(2, 1)],
    6: [(2, 0)],
    7: [(2, 3)],
    8: [(3, 2)],
    9: [(0, 2)],
    11: [(1, 2)],
    12: [(3, 1)],
    13: [(0, 1)],
    14: [(3, 0)],
    15: [],
}
SADDLE_IN = {5: [(2, 3), (0, 1)], 10: [(3, 0), (1, 2)]}   # center >= 4T
SADDLE_OUT = {5: [(2, 1), (0, 3)], 10: [(3, 2), (1, 0)]}  # center < 4T


def _seg_pack_sql(threshold: int) -> str:
    """CASE expression → packed edge pair (edge_a*4 + edge_b) or NULL for
    (case_id, si, center); shared verbatim by Spark F.expr and DuckDB."""
    arms = []
    for case_id in range(16):
        if case_id in (5, 10):
            for flag, table in (("", SADDLE_IN), (" = FALSE", SADDLE_OUT)):
                segs = table[case_id]
                cond = (
                    f"(v00 + v10 + v01 + v11 >= 4 * {threshold})"
                    + ("" if flag == "" else " = FALSE")
                )
                for si, (ea, eb) in enumerate(segs):
                    arms.append(
                        f"WHEN case_id = {case_id} AND si = {si} "
                        f"AND {cond} THEN {ea * 4 + eb}"
                    )
        else:
            for si, (ea, eb) in enumerate(CASES[case_id]):
                arms.append(
                    f"WHEN case_id = {case_id} AND si = {si} THEN {ea * 4 + eb}"
                )
    return "CASE " + " ".join(arms) + " ELSE NULL END"


def _idiv(a: str, b: str) -> str:
    """Exact integer floor division for non-negative operands, valid in
    both Spark SQL and DuckDB."""
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"


def _interp_sql(v_lo: str, v_hi: str, threshold: int) -> str:
    """Fixed-point crossing position along an edge from corner ``v_lo``
    (position 0) to corner ``v_hi`` (position SCALE); valid only when
    exactly one side is >= threshold (guaranteed by the case table)."""
    t = threshold
    fwd = _idiv(f"({t} - {v_lo}) * {SCALE}", f"{v_hi} - {v_lo}")
    bwd = _idiv(f"({t} - {v_hi}) * {SCALE}", f"{v_lo} - {v_hi}")
    return (
        f"CASE WHEN {v_hi} >= {t} AND {v_lo} < {t} THEN {fwd} "
        f"WHEN {v_lo} >= {t} AND {v_hi} < {t} THEN {SCALE} - {bwd} "
        f"ELSE NULL END"
    )


def _edge_xy_sql(threshold: int) -> tuple[str, str, str, str, str, str]:
    """(pb, pr, pt, pl, px_case, py_case) SQL fragments.  px/py are in
    block-local fixed-point coords, selected by an ``edge`` column."""
    pb = _interp_sql("v00", "v10", threshold)
    pr = _interp_sql("v10", "v11", threshold)
    pt = _interp_sql("v01", "v11", threshold)
    pl = _interp_sql("v00", "v01", threshold)
    px = (
        "CASE edge WHEN 0 THEN pb WHEN 1 THEN {S} "
        "WHEN 2 THEN pt ELSE 0 END".format(S=SCALE)
    )
    py = (
        "CASE edge WHEN 0 THEN 0 WHEN 1 THEN pr "
        "WHEN 2 THEN {S} ELSE pl END".format(S=SCALE)
    )
    return pb, pr, pt, pl, px, py


def contour_segments(
    grid: DataFrame,
    threshold: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
    val_col: str = "v",
) -> DataFrame:
    """Marching-squares segments of the ``threshold`` isoline over a
    sparse integer grid (missing cells are value 0; ``threshold`` must be
    >= 1 so absent regions are all-outside).  Output one row per segment:
    (bx, by, case_id, x0, y0, x1, y1) with endpoint coords in global
    fixed-point units (cell index × SCALE + local position)."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1 (absent cells are 0)")
    corners = grid.select(
        F.col(gx_col).alias("_gx"),
        F.col(gy_col).alias("_gy"),
        F.col(val_col).cast("long").alias("_v"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (0, 1)
                    for dy in (0, 1)
                ]
            )
        ).alias("_c"),
    ).select(
        (F.col("_gx") - F.col("_c.dx")).alias("bx"),
        (F.col("_gy") - F.col("_c.dy")).alias("by"),
        F.col("_c.dx").alias("dx"),
        F.col("_c.dy").alias("dy"),
        "_v",
    )

    def pick(dx: int, dy: int):
        return F.coalesce(
            F.max(F.when((F.col("dx") == dx) & (F.col("dy") == dy), F.col("_v"))),
            F.lit(0).cast("long"),
        )

    blocks = corners.groupBy("bx", "by").agg(
        pick(0, 0).alias("v00"),
        pick(1, 0).alias("v10"),
        pick(0, 1).alias("v01"),
        pick(1, 1).alias("v11"),
    )
    t = int(threshold)
    blocks = blocks.withColumn(
        "case_id",
        F.expr(
            f"CASE WHEN v00 >= {t} THEN 1 ELSE 0 END + "
            f"CASE WHEN v10 >= {t} THEN 2 ELSE 0 END + "
            f"CASE WHEN v11 >= {t} THEN 4 ELSE 0 END + "
            f"CASE WHEN v01 >= {t} THEN 8 ELSE 0 END"
        ),
    ).filter((F.col("case_id") > 0) & (F.col("case_id") < 15))
    slots = blocks.withColumn("si", F.explode(F.array(F.lit(0), F.lit(1))))
    segs = slots.withColumn("seg_pack", F.expr(_seg_pack_sql(t))).filter(
        F.col("seg_pack").isNotNull()
    )
    pb, pr, pt_, pl, px, py = _edge_xy_sql(t)
    segs = (
        segs.withColumn("pb", F.expr(pb))
        .withColumn("pr", F.expr(pr))
        .withColumn("pt", F.expr(pt_))
        .withColumn("pl", F.expr(pl))
    )
    out = (
        segs.withColumn("ea", F.expr(_idiv("seg_pack", "4")))
        .withColumn("eb", F.col("seg_pack") % 4)
        .withColumn("_xa", F.expr(px.replace("edge", "ea")))
        .withColumn("_ya", F.expr(py.replace("edge", "ea")))
        .withColumn("_xb", F.expr(px.replace("edge", "eb")))
        .withColumn("_yb", F.expr(py.replace("edge", "eb")))
    )
    s = SCALE
    return out.select(
        "bx",
        "by",
        F.col("case_id").cast("long").alias("case_id"),
        (F.col("bx") * s + F.col("_xa")).alias("x0"),
        (F.col("by") * s + F.col("_ya")).alias("y0"),
        (F.col("bx") * s + F.col("_xb")).alias("x1"),
        (F.col("by") * s + F.col("_yb")).alias("y1"),
    )


def grid_density(
    points: DataFrame,
    res: int,
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Rectangular count grid at ``res`` (2^res × 2^res world cells) —
    the contour input surface.  One map-side-combinable groupBy."""
    from geowave_spark.functions import cols as X

    gx = X.grid_milli_col(F.col(lon_milli), 180_000, 360_000, F.lit(res))
    gy = X.grid_milli_col(F.col(lat_milli), 90_000, 180_000, F.lit(res))
    return (
        points.select(gx.alias("gx"), gy.alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("v"))
    )


def contour_oracle_sql(grid_sql: str, threshold: int) -> str:
    """DuckDB replay of :func:`contour_segments` over ``grid_sql``
    (a query producing gx, gy, v) — the SAME generated case/interp
    fragments the Spark plan evaluates."""
    t = int(threshold)
    pb, pr, pt_, pl, px, py = _edge_xy_sql(t)
    seg_case = _seg_pack_sql(t)
    return f"""
WITH grid AS ({grid_sql}),
corners AS (
  SELECT gx - d.dx AS bx, gy - d.dy AS by, d.dx AS dx, d.dy AS dy, v
  FROM grid, (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) AS d(dx, dy)
),
blocks AS (
  SELECT bx, by,
         COALESCE(MAX(CASE WHEN dx = 0 AND dy = 0 THEN v END), 0) AS v00,
         COALESCE(MAX(CASE WHEN dx = 1 AND dy = 0 THEN v END), 0) AS v10,
         COALESCE(MAX(CASE WHEN dx = 0 AND dy = 1 THEN v END), 0) AS v01,
         COALESCE(MAX(CASE WHEN dx = 1 AND dy = 1 THEN v END), 0) AS v11
  FROM corners GROUP BY 1, 2
),
cased AS (
  SELECT *, CASE WHEN v00 >= {t} THEN 1 ELSE 0 END
          + CASE WHEN v10 >= {t} THEN 2 ELSE 0 END
          + CASE WHEN v11 >= {t} THEN 4 ELSE 0 END
          + CASE WHEN v01 >= {t} THEN 8 ELSE 0 END AS case_id
  FROM blocks
),
slotted AS (
  SELECT c.*, s.si FROM cased c, (VALUES (0), (1)) AS s(si)
  WHERE case_id > 0 AND case_id < 15
),
packed AS (
  SELECT *, {seg_case} AS seg_pack FROM slotted
),
interp AS (
  SELECT *, {pb} AS pb, {pr} AS pr, {pt_} AS pt, {pl} AS pl
  FROM packed WHERE seg_pack IS NOT NULL
),
pts AS (
  SELECT *, {_idiv('seg_pack', '4')} AS ea, seg_pack % 4 AS eb
  FROM interp
),
xy AS (
  SELECT bx, by, case_id,
         {px.replace('edge', 'ea')} AS xa, {py.replace('edge', 'ea')} AS ya,
         {px.replace('edge', 'eb')} AS xb, {py.replace('edge', 'eb')} AS yb
  FROM pts
)
SELECT bx, by, CAST(case_id AS BIGINT) AS case_id,
       bx * {SCALE} + xa AS x0, by * {SCALE} + ya AS y0,
       bx * {SCALE} + xb AS x1, by * {SCALE} + yb AS y1
FROM xy
"""


def morans_i_components(
    grid: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    val_col: str = "v",
) -> DataFrame:
    """Global Moran's I over an integer grid with queen (8-neighbor)
    adjacency — the classic spatial-autocorrelation statistic — returned
    as SIX exact integer aggregates; :func:`morans_i` assembles the float
    statistic driver-side in arbitrary precision.

    Why components: with Z_i = N·x_i − S (integer mean-centering scaled
    by N, the N² cancels in I), the centered products overflow int64 at
    corpus scale, but the RAW sums don't::

        I = (N / W) · Σ_ij w_ij Z_i Z_j / Σ_i Z_i²
          = (N / W) · (N²·S1 − N·S·S2 + S²·W) / (N²·Q − N·S²)

    with S1 = Σ_pairs x_i x_j, S2 = Σ_pairs (x_i + x_j), W = adjacent
    pair count (both directions), S = Σ x, Q = Σ x², N = cell count —
    every column a bounded int64 (S1 ≤ W·max(x)²; disclosed bound: shard
    the sum past ~10^18).  Output: one row (n_cells, w_pairs, s_tot,
    q_sum, s1, s2).

    Plan: ONE literal 8-offset explode + self-equi-join on the shifted
    key builds the adjacency (never a cross join); everything else is two
    map-side-combinable global aggregates.  Adjacency is over the grid's
    OCCUPIED support (absent cells are not observations) — the standard
    lattice formulation on a finite support."""
    base = grid.select(
        F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy"),
        F.col(val_col).cast("long").alias("x"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    nbr = base.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in offs
            ])
        ).alias("_o"),
        (F.col("gx")).alias("gx"),
        (F.col("gy")).alias("gy"),
        F.col("x").alias("x_i"),
    ).select(
        (F.col("gx") + F.col("_o.dx")).alias("ngx"),
        (F.col("gy") + F.col("_o.dy")).alias("ngy"),
        "x_i",
    )
    other = base.select(
        F.col("gx").alias("ngx"), F.col("gy").alias("ngy"),
        F.col("x").alias("x_j"),
    )
    pair_agg = nbr.join(other, on=["ngx", "ngy"]).agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.col("x_i") * F.col("x_j")).alias("s1"),
        F.sum(F.col("x_i") + F.col("x_j")).alias("s2"),
    )
    cell_agg = base.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("s_tot"),
        F.sum(F.col("x") * F.col("x")).alias("q_sum"),
    )
    return cell_agg.crossJoin(pair_agg).select(
        F.col("n_cells").cast("long"),
        F.col("w_pairs").cast("long"),
        F.col("s_tot").cast("long"),
        F.col("q_sum").cast("long"),
        F.col("s1").cast("long"),
        F.col("s2").cast("long"),
    )


def morans_i(components_df: DataFrame) -> float:
    """Assemble Moran's I from :func:`morans_i_components` — one row in,
    arbitrary-precision python integers (the N²·S1 term exceeds int64 by
    design; that is why the distributed side returns components)."""
    r = components_df.collect()[0]
    n, w = int(r["n_cells"]), int(r["w_pairs"])
    s, q = int(r["s_tot"]), int(r["q_sum"])
    s1, s2 = int(r["s1"]), int(r["s2"])
    num = n * n * s1 - n * s * s2 + s * s * w
    den = n * n * q - n * s * s
    if w == 0 or den == 0:
        raise ValueError("Moran's I undefined: no adjacency or zero variance")
    return (n / w) * (num / den)


def gi_star_components(
    grid: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    val_col: str = "v",
) -> DataFrame:
    """Getis–Ord Gi* LOCAL hotspot components (the per-cell companion to
    global :func:`morans_i_components`): for every occupied cell, the
    queen-neighborhood-including-self sum and member count, as exact
    integers.  Output: (gx, gy, x, nbr_sum, n_nbr).

    The float z-score is one vectorized expression over these plus the
    global (N, S, Q) aggregates::

        z_i = (nbr_sum − mean·n_nbr) /
              (std · sqrt((N·n_nbr − n_nbr²) / (N−1)))

    — :func:`gi_star` attaches it.  Plan: the same literal 9-offset
    explode + self-equi-join as Moran (never a cross join), one groupBy;
    neighborhoods are over the OCCUPIED support."""
    base = grid.select(
        F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy"),
        F.col(val_col).cast("long").alias("x"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nbr = base.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in offs
            ])
        ).alias("_o"),
        "gx", "gy", F.col("x").alias("x_src"),
    ).select(
        (F.col("gx") + F.col("_o.dx")).alias("ngx"),
        (F.col("gy") + F.col("_o.dy")).alias("ngy"),
        "x_src",
    )
    sums = nbr.groupBy("ngx", "ngy").agg(
        F.sum("x_src").alias("nbr_sum"),
        F.count(F.lit(1)).alias("n_nbr"),
    )
    # inner join back to the occupied support: Gi* is reported per CELL,
    # not per phantom neighbor position
    return base.join(
        sums,
        on=[base["gx"] == sums["ngx"], base["gy"] == sums["ngy"]],
    ).select("gx", "gy", "x", "nbr_sum", "n_nbr")


def gi_star(components: DataFrame) -> DataFrame:
    """Attach the Gi* z-score to :func:`gi_star_components` output —
    global moments come from one tiny driver-side aggregate; the z
    expression is pure column math (no shuffle beyond the components')."""
    r = components.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ).collect()[0]
    n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
    if n < 2:
        raise ValueError("Gi* needs at least 2 cells")
    mean = s / n
    var = q / n - mean * mean
    if var <= 0:
        raise ValueError("Gi* undefined: zero variance")
    std = var ** 0.5
    w = F.col("n_nbr").cast("double")
    denom = F.lit(std) * F.sqrt(
        (F.lit(float(n)) * w - w * w) / F.lit(float(n - 1))
    )
    return components.withColumn(
        "z", (F.col("nbr_sum") - F.lit(mean) * w) / denom
    )
