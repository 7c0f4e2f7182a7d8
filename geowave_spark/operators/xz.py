"""XZ-order extent index + query path (the reference's XZ index strategy).

Reference parity: ``core/geotime/.../index/dimension/`` XZ strategies and
``XZOrderSFC.java:95-178`` (encode) / ``getQueryRanges`` (decompose);
``XZHierarchicalIndexStrategy.java`` combines an XZ-keyed extent index with
a tiered point index — :func:`query_bbox_xz_hierarchical` mirrors that
composition.

Spark-first execution: the decomposition's node sets are broadcast and the
match is an EQUI-JOIN, not a range scan —

- data side: each extent carries its ancestor-code array (≤ g+1 int64s,
  one let-bound codegen projection, ``cols.xz_prefix_codes_milli_col``);
  one bounded explode yields (extent, path-node) rows.
- broadcast side: per query, ``contained`` nodes (query ⊇ cell — every
  extent anchored in the subtree matches, joined via ANY ancestor code)
  and ``overlapped`` nodes (2×-enlarged cell touches the query — only
  extents anchored EXACTLY there are candidates, joined via own code).

The two node sets cover disjoint code regions, so each (extent, query)
pair matches at most once — the join is provably dedup-free (no
dropDuplicates shuffle).  The sorted-range form
(``cells.xz_query_ranges_milli``) is membership-identical and is what a
sorted KV store would seek; at cluster scale the same ranges push down as
file-skipping min/max predicates on an xz-sorted table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.session import spread


def index_extents_xz(
    envs: DataFrame,
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    g: int = C.XZ_G,
) -> DataFrame:
    """Key extents by XZ: ``xz_keys`` = root→anchor ancestor-code array,
    ``xz`` = the extent's own (anchor) code — one codegen projection.

    At ingest the table would be written sorted by ``xz`` (Iceberg
    sort-order), which turns the range form of every query into parquet
    min/max file pruning for free."""
    mnx, mny, mxx, mxy = (F.col(c) for c in env_cols)
    return envs.withColumn(
        "xz_keys", X.xz_prefix_codes_milli_col(mnx, mny, mxx, mxy, g)
    ).withColumn("xz", F.element_at("xz_keys", -1))


def _nodes_pdf(queries, g: int, max_nodes: int) -> pd.DataFrame:
    """(query_id, jcode, is_contained) rows for every query's node sets."""
    rows = []
    for qid, qminx, qminy, qmaxx, qmaxy in queries:
        contained, overlapped = C.xz_query_nodes_milli(
            qminx, qminy, qmaxx, qmaxy, g, max_nodes
        )
        rows.extend((qid, c, True) for c, _l in contained)
        rows.extend((qid, c, False) for c in overlapped)
    return pd.DataFrame(rows, columns=["query_id", "jcode", "is_contained"])


def query_bbox_xz(
    indexed: DataFrame,
    queries: list[tuple],
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    g: int = C.XZ_G,
    max_nodes: int = 2000,
    exact: bool = True,
) -> DataFrame:
    """BBOX query over an XZ-indexed extent table.

    ``queries``: (query_id, minx_m, miny_m, maxx_m, maxy_m) milli-int
    boxes (no antimeridian wrap — split wrapped boxes upstream, as the
    cover path does).  Returns indexed rows × matching query_id; with
    ``exact=False`` returns the raw index superset (the reference's
    loose/setExact(false) mode)."""
    spark = indexed.sparkSession
    nodes = spark.createDataFrame(_nodes_pdf(queries, g, max_nodes))

    d = spread(indexed).withColumn("_jkey", F.explode("xz_keys"))
    j = d.join(F.broadcast(nodes), d["_jkey"] == nodes["jcode"], "inner").filter(
        F.col("is_contained") | (F.col("_jkey") == F.col("xz"))
    )
    out = j.drop("_jkey", "jcode", "is_contained")
    if not exact:
        return out

    qdf = spark.createDataFrame(
        pd.DataFrame(
            queries, columns=["query_id", "q_minx", "q_miny", "q_maxx", "q_maxy"]
        )
    )
    mnx, mny, mxx, mxy = env_cols
    hit = (
        (F.col(mnx) <= F.col("q_maxx"))
        & (F.col(mxx) >= F.col("q_minx"))
        & (F.col(mny) <= F.col("q_maxy"))
        & (F.col(mxy) >= F.col("q_miny"))
    )
    return (
        out.join(F.broadcast(qdf), "query_id")
        .filter(hit)
        .drop("q_minx", "q_miny", "q_maxx", "q_maxy")
    )


def query_bbox_xz_hierarchical(
    points_indexed: DataFrame,
    extents_indexed: DataFrame,
    queries: list[tuple],
    point_id_cols: tuple[str, ...] = ("event_id",),
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    env_id_col: str = "i",
    **xz_kw,
) -> DataFrame:
    """XZHierarchicalIndexStrategy composition: POINTS through the tiered
    cell-cover join, EXTENTS through the XZ path, one result per side
    united on (query_id, kind, …id).  Callers needing typed payloads keep
    the sides separate; this returns the id-level union the reference's
    hierarchical strategy produces from its two sub-strategies."""
    from geowave_spark.operators.bbox import query_bbox

    from geowave_spark.plans.planner import BoxQuery

    pts = query_bbox(
        points_indexed,
        [
            BoxQuery(qid, mnx / 1000.0, mny / 1000.0, mxx / 1000.0, mxy / 1000.0)
            for qid, mnx, mny, mxx, mxy in queries
        ],
    ).select(
        "query_id", F.lit("point").alias("kind"),
        F.col(point_id_cols[0]).cast("long").alias("oid"),
    )
    exts = query_bbox_xz(extents_indexed, queries, env_cols=env_cols, **xz_kw).select(
        "query_id",
        F.lit("extent").alias("kind"),
        F.col(env_id_col).cast("long").alias("oid"),
    )
    return pts.unionByName(exts)
