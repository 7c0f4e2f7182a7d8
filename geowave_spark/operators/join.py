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
    :func:`points_in_envelopes_join`, then ONE Arrow refine over the
    candidate pairs (parse-once per distinct polygon per batch, convex
    half-plane fast path).

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
    indexed = OI.index_envelopes_milli(env, id_col=poly_id).select(
        poly_id, "cell", "tier", wkb_col
    )
    if env_tiers is None:
        env_tiers = [int(r[0]) for r in indexed.select("tier").distinct().collect()]
    env_tiers = sorted(set(env_tiers))
    indexed = indexed.drop("tier")

    pts = point_tier_keys(points, point_id=point_id, env_tiers=env_tiers)
    candidates = pts.join(indexed, pts["_jkey"] == indexed["cell"])
    # same dedup-free argument as points_in_envelopes_join: one parent key
    # per (point, tier), distinct cells per polygon tier — a pair meets on
    # at most one key.  The envelope prefilter is implied by the cell
    # cover; the exact refine is the single Arrow pass below.
    refined = candidates.filter(
        U.pip_pairs_refine_udf(
            F.col(wkb_col),
            F.col("lon_milli").cast("double"),
            F.col("lat_milli").cast("double"),
        )
    )
    return refined.select(point_id, poly_id, "lon_milli", "lat_milli")
