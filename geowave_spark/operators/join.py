"""Dataset-to-dataset distributed spatial join — the general form of the
BASELINE metric's "spatial-join rows/sec".

The reference has no general spatial join; its join-shaped machinery is
the query-ranges-vs-rows sorted scan (ConstraintsQuery.java:101-148) and
the NN partition join (NNMapReduce).  This operator generalizes both:
two LARGE tables (points and envelopes/footprints) joined on shared cell
keys — a sort-merge/shuffle hash equi-join, NOT a broadcast — with the
exact containment residual evaluated during the join.

Plan shape (the one that survives 100 TB):
* envelopes are indexed multi-cell at their per-row tier
  (index_envelopes_milli — bounded ≤4 cells/row by the duplicate rule);
* points explode to their parent key at each *occupied envelope tier*
  (small set, from the stats table / one distinct scan) — explode factor =
  number of occupied tiers;
* equi-join on the packed key: Spark picks shuffle-hash or sort-merge,
  AQE splits skewed cells (hot urban tiles), the ``salt`` column is
  available for explicit pre-salting when a single cell exceeds an
  executor;
* residual = exact integer containment, evaluated as the join filter;
* conditional dedupe only for multi-cell envelopes (n_dup > 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.operators import index as OI
from geowave_spark.plans import planner as P


def point_tier_keys(
    points: DataFrame,
    point_id: str = "point_id",
    env_tiers: list[int] | None = None,
) -> DataFrame:
    """Point-side join keys: one row per (point, occupied envelope tier)
    with ``_jkey`` = the point's parent cell at that tier.

    Exact-integer arithmetic (same family as the envelope grid; parent
    shifts are exact by the nested-floor identity
    floor(floor(a/2^j)/2^k) = floor(a/2^(j+k))).  Shared by the ad-hoc
    shuffle join (:func:`points_in_envelopes_join`, keys computed at query
    time) and the bucketed join store (``operators/bucketed.py``, keys
    MATERIALIZED at ingest so the stored column is bucket-aligned)."""
    from geowave_spark.functions import cols as X

    pts = points.select(
        F.col(point_id),
        X.cell_encode_milli_col(
            F.col("lon_milli"), F.col("lat_milli"), C.MAX_RES
        ).alias("cell"),
        F.lit(C.MAX_RES).cast("long").alias("tier"),
        "lon_milli",
        "lat_milli",
    )
    # explode points to their parent key at each occupied envelope tier
    keys = F.array_distinct(F.array(*[P.data_join_key(t) for t in env_tiers]))
    return pts.withColumn("_jkey", F.explode(keys)).drop("cell", "tier")


def points_in_envelopes_join(
    points: DataFrame,
    envelopes: DataFrame,
    point_id: str = "point_id",
    env_id: str = "env_id",
    env_tiers: list[int] | None = None,
    stats_path: str | None = None,
) -> DataFrame:
    """All (point, envelope) pairs where the point lies inside the
    envelope (closed bounds, exact integer milli coords).

    ``points`` needs (point_id, lon, lat, lon_milli, lat_milli);
    ``envelopes`` needs (env_id, minx_m, miny_m, maxx_m, maxy_m).
    ``env_tiers``: occupied envelope tiers if known (spec constants or
    stats table); else ``stats_path`` or the envelope table's own
    co-written stats store (recovered from the plan — survives any
    DataFrame transformation) supplies them; one distinct scan discovers
    them only as the last resort (at 100 TB that is an extra full pass).
    """
    # slim shuffle width: the join needs only id + key + exact bounds
    # (tier/n_dup/salt/cell_p would ride the 38M-pair shuffle for nothing)
    env = OI.index_envelopes_milli(envelopes, id_col=env_id).select(
        env_id, "cell", "tier", "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    if env_tiers is None:
        env_tiers = getattr(envelopes, "_gw_tiers", None)
    if env_tiers is None and stats_path is not None:
        env_tiers = OI.read_stats_tiers(envelopes.sparkSession, stats_path)
    if env_tiers is None and "tier" in envelopes.columns:
        # only auto-recover a stats store when ``envelopes`` IS an indexed
        # table (carries its tier column) — a store co-written for some
        # OTHER indexing of the same files would silently drop tiers
        env_tiers = OI.stats_tiers_for(envelopes)
    if env_tiers is None:
        env_tiers = [int(r[0]) for r in env.select("tier").distinct().collect()]
    env_tiers = sorted(set(env_tiers))
    env = env.drop("tier")

    pts = point_tier_keys(points, point_id=point_id, env_tiers=env_tiers)

    joined = pts.join(env, pts["_jkey"] == env["cell"]).filter(
        (F.col("lon_milli") >= F.col("minx_m"))
        & (F.col("lon_milli") <= F.col("maxx_m"))
        & (F.col("lat_milli") >= F.col("miny_m"))
        & (F.col("lat_milli") <= F.col("maxy_m"))
    )
    # No dedup is needed — ever: a point has exactly ONE parent key at a
    # given tier, and an envelope's cells are distinct cells of its own
    # tier, so each (point, envelope) pair can meet on at most one key.
    # (Contrast bbox_envelopes, where the ENVELOPE side is exploded against
    # a multi-cell query cover and duplicates are real.)  This is the
    # advantage of joining point-side-unique keys: the reference pays a
    # DedupeFilter pass here; this plan provably cannot produce duplicates.
    return joined.select(point_id, env_id, "lon_milli", "lat_milli")


def points_in_polygons_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "point_id",
    poly_id: str = "poly_id",
    wkb_col: str = "wkb",
    env_tiers: list[int] | None = None,
) -> DataFrame:
    """All (point, polygon) pairs where the point lies inside the polygon
    — both sides LARGE (the polygon table is data, not a broadcast query
    list; contrast operators/polygon.query_polygon).

    The reference executes arbitrary-geometry joins as a Spark SQL join
    with the per-row geomIntersects UDF (analytics/spark/.../sparksql/
    SqlQueryRunner.java two-store join + udf/GeomIntersects.java) — an
    unindexed cross product.  Here the polygon side rides the envelope
    machinery: vectorized WKB→envelope extraction, multi-cell tier
    indexing (≤4 cells/row), the dedup-free point-parent equi-join of
    :func:`points_in_envelopes_join` with a codegen envelope prefilter,
    then the exact refine: convex rings as an UNROLLED half-plane
    conjunction over a pre-parsed edge-strip column (pure codegen — the
    forall HOF formulation measured 4.4× slower because higher-order
    functions are never whole-stage-codegen'd), general geometries
    through one Arrow even-odd branch (parse-once per distinct polygon
    per batch) that exists only when the probe sees a non-convex row.

    Coordinate contract: the polygon WKB coordinates are in the SAME
    units as the point table's ``lon_milli``/``lat_milli`` integer grid
    (milli-degrees) — integer-valued float64s make the convex refine
    bit-reproducible in SQL oracles.  Degree-unit WKB needs a 1000×
    rescale at ingest.

    Shuffle note: the WKB column rides the envelope-side shuffle (one
    pass, same width class as the reference shipping geometry to its
    join); re-attaching it by a second poly_id join would shuffle the
    polygon table twice instead.
    """
    from geowave_spark.functions import udfs as U

    env = polys.withColumn("_env", U.wkb_envelope_cols(F.col(wkb_col))).select(
        poly_id,
        wkb_col,
        # envelopes of integer-valued milli coords: exact casts
        F.round(F.col("_env.minx")).cast("long").alias("minx_m"),
        F.round(F.col("_env.miny")).cast("long").alias("miny_m"),
        F.round(F.col("_env.maxx")).cast("long").alias("maxx_m"),
        F.round(F.col("_env.maxy")).cast("long").alias("maxy_m"),
    )
    # edges = the convex half-plane strip (NULL for general geometries):
    # parsed once per POLYGON row, so convex refinement later runs as pure
    # JVM codegen over the candidate pairs — zero Python in the pair path.
    env = env.withColumn("_edges", U.convex_edges_col(F.col(wkb_col)))
    indexed = OI.index_envelopes_milli(env, id_col=poly_id).select(
        poly_id, "cell", "tier", wkb_col, "_edges",
        "minx_m", "miny_m", "maxx_m", "maxy_m",
    ).localCheckpoint()
    # one tiny aggregate over the (small) polygon side answers BOTH plan
    # questions: which tiers are occupied, and whether any general
    # (non-convex) geometry needs the Arrow fallback branch — the
    # localCheckpoint above keeps this from re-running the WKB parse.
    probe = indexed.agg(
        F.collect_set("tier").alias("tiers"),
        F.max(F.col("_edges").isNull()).alias("has_general"),
        F.max(F.coalesce(F.size("_edges"), F.lit(0))).alias("max_edges"),
    ).collect()[0]
    if env_tiers is None:
        env_tiers = [int(t) for t in probe["tiers"]]
    env_tiers = sorted(set(env_tiers))
    if not env_tiers:
        # empty polygon table (e.g. filtered to nothing): zero pairs with
        # the real column dtypes — not a plan-build crash
        return (
            points.limit(0)
            .select(point_id, "lon_milli", "lat_milli")
            .crossJoin(indexed.select(poly_id).limit(0))
            .select(point_id, poly_id, "lon_milli", "lat_milli")
        )
    has_general = bool(probe["has_general"])
    indexed = indexed.drop("tier")
    if not has_general:
        # every geometry is convex: the WKB never feeds the refine, so it
        # must not ride the pair shuffle (the _edges strip is the whole
        # geometry as far as the join is concerned)
        indexed = indexed.drop(wkb_col)

    pts = point_tier_keys(points, point_id=point_id, env_tiers=env_tiers)
    px = F.col("lon_milli").cast("double")
    py = F.col("lat_milli").cast("double")
    # dedup-free (same argument as points_in_envelopes_join: one parent
    # key per point and tier, distinct cells per polygon).  The exact
    # ENVELOPE containment runs as a codegen prefilter — the polygon tier
    # can be much coarser than the polygon (small-extent geometries), so
    # cell candidates vastly outnumber envelope hits.
    candidates = pts.join(indexed, pts["_jkey"] == indexed["cell"]).filter(
        (F.col("lon_milli") >= F.col("minx_m"))
        & (F.col("lon_milli") <= F.col("maxx_m"))
        & (F.col("lat_milli") >= F.col("miny_m"))
        & (F.col("lat_milli") <= F.col("maxy_m"))
    )
    convex_hit = F.col("_edges").isNotNull() & U.convex_forall_refine(
        F.col("_edges"), px, py, max_edges=int(probe["max_edges"] or 0)
    )
    if not has_general:
        refined = candidates.filter(convex_hit)
    else:
        # general geometries exist: one extra branch refines their rows
        # through the Arrow even-odd kernel (parse-once per distinct
        # polygon per batch); the convex branch stays pure codegen.
        conv = candidates.filter(convex_hit)
        gen = candidates.filter(F.col("_edges").isNull()).filter(
            U.pip_pairs_refine_udf(F.col(wkb_col), px, py)
        )
        refined = conv.unionByName(gen)
    return refined.select(point_id, poly_id, "lon_milli", "lat_milli")


def _fixed_cover(
    df: DataFrame,
    id_col: str,
    env_cols: tuple[str, str, str, str],
    res: int,
    max_cells_per_row: int,
    prefix: str,
    keep_xy: bool,
    op_name: str = "envelopes_overlap_join",
) -> DataFrame:
    """Cover of each envelope on the FIXED res-``res`` grid (PBSM tile
    grid) — same explode/guard discipline as index_envelopes_milli, at one
    shared resolution so two covered tables can equi-join on the cell."""
    from geowave_spark.functions import cols as X
    from geowave_spark.operators.index import _invariant_guard
    from geowave_spark.session import spread

    mnx, mny, mxx, mxy = env_cols
    r = F.lit(res).cast("long")
    d = spread(df).select(
        F.col(id_col),
        F.col(mnx).alias(f"{prefix}minx"),
        F.col(mny).alias(f"{prefix}miny"),
        F.col(mxx).alias(f"{prefix}maxx"),
        F.col(mxy).alias(f"{prefix}maxy"),
    )
    d = (
        d.withColumn("_ix0", X.grid_milli_col(F.col(f"{prefix}minx"), 180_000, C.LON_SPAN_MILLI, r))
        .withColumn("_ix1", X.grid_milli_col(F.col(f"{prefix}maxx"), 180_000, C.LON_SPAN_MILLI, r))
        .withColumn("_iy0", X.grid_milli_col(F.col(f"{prefix}miny"), 90_000, C.LAT_SPAN_MILLI, r))
        .withColumn("_iy1", X.grid_milli_col(F.col(f"{prefix}maxy"), 90_000, C.LAT_SPAN_MILLI, r))
    )
    d = d.filter(_invariant_guard(
        ((F.col("_ix1") - F.col("_ix0") + 1) * (F.col("_iy1") - F.col("_iy0") + 1)
         > max_cells_per_row)
        | (F.col("_ix1") < F.col("_ix0"))
        | (F.col("_iy1") < F.col("_iy0")),
        f"{op_name}: envelope cover exceeds max_cells_per_row "
        "at the chosen grid resolution (raise res or the bound) or the "
        "envelope is inverted — never silently truncate",
    ))
    d = (
        d.withColumn("_cx", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))))
        .withColumn("_cy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
        .drop("_ix0", "_ix1", "_iy0", "_iy1")
    )
    cell = X.pack_col(F.col("_cx"), F.col("_cy"), r)
    if keep_xy:
        return d.withColumn("cell", cell)
    return d.withColumn("cell", cell).drop("_cx", "_cy")


def _pbsm_candidates(lc: DataFrame, rc: DataFrame, res: int) -> DataFrame:
    """Cell equi-join of two fixed-grid covers + the envelope-overlap and
    REPORTING-CELL filters: a pair survives only in the cell containing
    the intersection's (minx, miny) corner, so every envelope-overlapping
    pair surfaces exactly once — duplicate elimination as a codegen
    comparison, shared by every PBSM join."""
    from geowave_spark.functions import cols as X

    j = lc.join(rc, "cell")
    r = F.lit(res).cast("long")
    overlap = (
        (F.col("_lminx") <= F.col("_rmaxx"))
        & (F.col("_rminx") <= F.col("_lmaxx"))
        & (F.col("_lminy") <= F.col("_rmaxy"))
        & (F.col("_rminy") <= F.col("_lmaxy"))
    )
    gx = X.grid_milli_col(
        F.greatest(F.col("_lminx"), F.col("_rminx")), 180_000, C.LON_SPAN_MILLI, r
    )
    gy = X.grid_milli_col(
        F.greatest(F.col("_lminy"), F.col("_rminy")), 90_000, C.LAT_SPAN_MILLI, r
    )
    return j.filter(overlap & (gx == F.col("_cx")) & (gy == F.col("_cy")))


def envelopes_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "l_id",
    right_id: str = "r_id",
    res: int = 8,
    left_env: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    right_env: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    max_cells_per_row: int = 4096,
) -> DataFrame:
    """All (left, right) envelope pairs that OVERLAP (closed integer milli
    bounds) — extent×extent with BOTH sides large, the dual-extent join
    GeoWave's sorted scan has no primitive for (its geometry joins fall
    back to the per-row UDF cross join, SqlQueryRunner.java).

    PBSM shape (Patel & DeWitt's partition-based spatial-merge join):
    both sides explode to their covering cells of ONE fixed grid
    (``res`` is a parallelism dial with zero effect on results), a
    shuffle equi-join on the cell meets every overlapping pair in every
    shared cell, and the REPORTING-CELL rule keeps exactly one copy: a
    pair counts only in the cell containing the intersection's
    (minx, miny) corner.  That corner lies inside both envelopes, so its
    cell is always among the join matches — duplicate elimination is a
    codegen comparison, not a dropDuplicates shuffle, and the output is
    provably duplicate-free.

    Returns (left_id, right_id, inter_w_milli, inter_h_milli) — the
    closed-bounds intersection extent, exact integers.

    100 TB posture: explode factor bounded by ``max_cells_per_row``
    (guarded, never truncated), one shuffle join on the grid cell (AQE
    splits hot cells; res is the skew dial), zero post-join dedup.
    """
    if left_id == right_id:
        raise ValueError(
            "envelopes_overlap_join: alias the id columns apart "
            f"(both sides use {left_id!r})"
        )
    lc = _fixed_cover(left, left_id, left_env, res, max_cells_per_row, "_l", True)
    rc = _fixed_cover(right, right_id, right_env, res, max_cells_per_row, "_r", False)
    out = _pbsm_candidates(lc, rc, res)
    return out.select(
        left_id,
        right_id,
        (
            F.least(F.col("_lmaxx"), F.col("_rmaxx"))
            - F.greatest(F.col("_lminx"), F.col("_rminx"))
            + 1
        ).alias("inter_w_milli"),
        (
            F.least(F.col("_lmaxy"), F.col("_rmaxy"))
            - F.greatest(F.col("_lminy"), F.col("_rminy"))
            + 1
        ).alias("inter_h_milli"),
    )


def geometries_intersect_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "l_id",
    right_id: str = "r_id",
    left_wkb: str = "wkb",
    right_wkb: str = "wkb",
    op: str = "intersects",
    res: int = 8,
    max_cells_per_row: int = 4096,
) -> DataFrame:
    """All (left, right) pairs whose GEOMETRIES satisfy ``op`` — the
    general geometry×geometry join with both sides large, completing the
    matrix (point×envelope, point×polygon, envelope×envelope, and now
    polygon×polygon).  The reference's only form of this query is the
    unindexed SqlQueryRunner cross join with the per-row predicate UDF.

    Candidate pairs come from the shared PBSM machinery
    (:func:`_pbsm_candidates`: one shuffle, reporting-cell rule — each
    envelope-overlapping pair surfaces exactly once) run over ID + bounds
    ONLY; the wide WKB binaries never ride the cover explode or the cell
    shuffle (a polygon covering hundreds of cells would otherwise ship
    its payload once per cell).  The slim candidate pairs re-join the two
    (id, wkb) tables, then the exact predicate is ONE Arrow pass with the
    parse-once-per-distinct-geometry pair kernel (the same geom_op_batch
    behind the nine SQL predicate UDFs).  Envelope-disjoint pairs never
    reach Python.

    ``op`` must IMPLY envelope overlap (intersects/contains/within/…);
    'disjoint' pairs are mostly envelope-disjoint and never become
    candidates, so it is rejected rather than silently under-reported.

    Coordinate contract: WKB in the integer milli grid (degree WKB needs
    a 1000× rescale at ingest).  Envelope-derived bounds are exact casts.
    """
    from geowave_spark.functions import udfs as U

    if left_id == right_id:
        raise ValueError(
            "geometries_intersect_join: alias the id columns apart "
            f"(both sides use {left_id!r})"
        )
    if op == "disjoint":
        raise ValueError(
            "geometries_intersect_join: 'disjoint' does not imply envelope "
            "overlap — the PBSM prefilter would drop almost every true "
            "pair; use an anti-join against op='intersects' instead"
        )

    def prep(df, idc, wkbc):
        return df.withColumn("_env", U.wkb_envelope_cols(F.col(wkbc))).select(
            idc,
            F.round(F.col("_env.minx")).cast("long").alias("minx_m"),
            F.round(F.col("_env.miny")).cast("long").alias("miny_m"),
            F.round(F.col("_env.maxx")).cast("long").alias("maxx_m"),
            F.round(F.col("_env.maxy")).cast("long").alias("maxy_m"),
        )

    env_cols = ("minx_m", "miny_m", "maxx_m", "maxy_m")
    lc = _fixed_cover(
        prep(left, left_id, left_wkb), left_id, env_cols, res,
        max_cells_per_row, "_l", True, op_name="geometries_intersect_join",
    )
    rc = _fixed_cover(
        prep(right, right_id, right_wkb), right_id, env_cols, res,
        max_cells_per_row, "_r", False, op_name="geometries_intersect_join",
    )
    cand = _pbsm_candidates(lc, rc, res).select(left_id, right_id)
    paired = cand.join(
        left.select(left_id, F.col(left_wkb).alias("_lwkb")), left_id
    ).join(right.select(right_id, F.col(right_wkb).alias("_rwkb")), right_id)
    hit = U.make_geom_predicate(op)(F.col("_lwkb"), F.col("_rwkb"))
    return paired.filter(hit).select(left_id, right_id)
