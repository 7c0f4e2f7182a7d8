"""Polygon spatial queries: cover + classify + exact PIP refine.

Re-expresses the reference's SpatialQuery path for arbitrary geometry
(core/geotime/.../store/query/SpatialQuery.java:54-110 with the exact
JTS refine of SpatialQueryFilter.java:43-190) as:

1. driver-side envelope cover at an adaptive resolution (numpy),
2. classification of cover cells into interior (refine skipped — the
   reference's IndexOnlySpatialQuery / exact-decomposition split) vs
   boundary (exact refine),
3. broadcast join on the bit-shift parent key,
4. Arrow-batched PIP refine only for boundary-cell matches.

Compare ops supported for point/footprint-center data: INTERSECTS
(== WITHIN for points), DISJOINT (full scan + negated predicate — the
reference cannot index-accelerate disjoint either), CONTAINS (points never
contain polygons → empty, kept for op-surface parity).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import geometry as G
from geowave_spark.functions import udfs as U
from geowave_spark.plans import planner as P


@dataclass
class PolygonQuery:
    query_id: str
    wkb: bytes
    op: str = "INTERSECTS"  # INTERSECTS | WITHIN | DISJOINT | CONTAINS


def _convex_refine_col(wkb: bytes, lon_col: str, lat_col: str):
    """JVM half-plane refine predicate for a CCW convex single-ring
    polygon; None when the geometry needs the general even-odd kernel."""
    ring = G.convex_open_ring(wkb)
    if ring is None:
        return None
    lon, lat = F.col(lon_col), F.col(lat_col)
    pred = None
    for i in range(len(ring)):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % len(ring)]
        term = (
            (F.lit(float(x1 - x0)) * (lat - F.lit(float(y0))))
            - (F.lit(float(y1 - y0)) * (lon - F.lit(float(x0))))
        ) >= F.lit(0.0)
        pred = term if pred is None else (pred & term)
    return pred


def _polygon_cover(
    q: PolygonQuery, tiers: list[int], max_cells: int
) -> tuple[pd.DataFrame, int]:
    """Cover of the polygon envelope, classified; outside cells dropped."""
    env = G.envelope_of_wkb(q.wkb)
    box = P.BoxQuery(q.query_id, *env)
    r_q = P.cover_resolution(box, max_cells)
    polys = G.polygon_rings(q.wkb)
    parts = []
    for r in sorted({min(t, r_q) for t in tiers}):
        cells = np.unique(np.concatenate([C.cover_bbox(*b, r) for b in box.boxes()]))
        mnx, mny, mxx, mxy = C.cell_bounds(cells)
        cls = G.classify_cells_vs_polygon(mnx, mny, mxx, mxy, polys)
        keep = cls > 0
        parts.append(
            pd.DataFrame(
                {
                    "query_id": q.query_id,
                    "jcell": cells[keep],
                    # refine needed unless the cell is interior AND it is at
                    # the data's own tier (coarser-joined data rows may stick
                    # out of the cell, so they always refine)
                    "interior": cls[keep] == 2,
                }
            )
        )
    return pd.concat(parts) if parts else pd.DataFrame(
        {"query_id": [], "jcell": [], "interior": []}
    ), r_q


def query_polygon(
    data: DataFrame,
    queries: list[PolygonQuery],
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_cols: tuple[str, ...] = ("event_id",),
    tiers: list[int] | None = None,
    max_cells: int = 1024,
    dedup: bool | None = None,
) -> DataFrame:
    """(query_id, row) pairs where the point satisfies the query op.

    ``dedup=None`` auto-enables only for non-point tables carrying ``n_dup``
    (multi-cell entries are the only duplicate source — reference
    DedupeFilter gating, EntryRowID.java:76-78); point tables at MAX_RES are
    duplicate-free by construction, so the shuffle is skipped."""
    spark = data.sparkSession
    if tiers is None:
        tiers = [r[0] for r in data.select("tier").distinct().collect()]
    tiers = sorted(int(t) for t in tiers)
    point_data = all(t == C.MAX_RES for t in tiers)

    outs = []
    accel: list[PolygonQuery] = []
    for q in queries:
        op = q.op.upper()
        if op == "CONTAINS":
            # a point can never contain a polygon — empty result, schema kept
            outs.append(
                data.withColumn("query_id", F.lit(q.query_id)).filter(F.lit(False))
            )
            continue
        if op == "DISJOINT":
            # anti-query: full scan, negated exact predicate (no index help)
            neg = _convex_refine_col(q.wkb, lon_col, lat_col)
            cond = ~neg if neg is not None else ~U.make_pip_refine(q.wkb)(
                F.col(lon_col), F.col(lat_col)
            )
            outs.append(
                data.withColumn("query_id", F.lit(q.query_id)).filter(cond)
            )
            continue
        if op not in ("INTERSECTS", "WITHIN"):
            raise ValueError(f"unsupported op {q.op}")
        accel.append(q)

    # Index-accelerated queries GROUP by cover resolution: every group is
    # one broadcast cover union + ONE join over one data scan — N polygon
    # queries are one pass, not N (the reference's iterator walks all
    # ranges of all queries in a single scan; per-query plan branches
    # re-execute the fact-table lineage N times — measured 6 pentagons =
    # 6x one pentagon's wall clock before this change).  Distinct cover
    # resolutions are rare (r_q derives from envelope size vs max_cells),
    # so the group count stays 1 for homogeneous suites.
    by_res: dict[int, list] = {}
    for q in accel:
        cover_pdf, r_q = _polygon_cover(q, tiers, max_cells)
        by_res.setdefault(r_q, []).append((q, cover_pdf))
    for r_q, items in sorted(by_res.items()):
        cover = spark.createDataFrame(pd.concat([c for _, c in items]))
        pre = data.withColumn("_jkey", P.data_join_key(r_q)).join(
            F.broadcast(cover), F.col("_jkey") == F.col("jcell"), "inner"
        )
        # Convex single-ring polygons refine with pure JVM half-plane sign
        # tests (codegen, no Python worker at all — same exact IEEE
        # multiply/subtract as the numpy kernel and the SQL oracle),
        # folded into one CASE chain on query_id.
        convex = {
            q.query_id: _convex_refine_col(q.wkb, lon_col, lat_col)
            for q, _ in items
        }
        general = {
            q.query_id: q.wkb for q, _ in items if convex[q.query_id] is None
        }
        chain = None
        for qid, c in convex.items():
            if c is None:
                continue
            m = F.col("query_id") == qid
            chain = F.when(m, c) if chain is None else chain.when(m, c)
        if not general:
            refine = chain.otherwise(F.lit(False)) if chain is not None else F.lit(False)
            # interior-cell matches skip refinement entirely for point
            # tables (row cell at least as fine as the cover cell); the
            # refine is pure codegen here, so one filter — one scan.
            cond = (F.col("interior") | refine) if point_data else refine
            outs.append(pre.filter(cond).drop("_jkey", "jcell", "interior"))
            continue
        # General polygons need the Arrow even-odd kernel.  A when() chain
        # would still ship every row through the Python worker, so split:
        # branch A (codegen only) keeps interior hits + convex-refined
        # rows; branch B refines the general queries' boundary rows with
        # ONE multi-polygon UDF.  Two subtree executions total for the
        # whole group — independent of the number of queries.
        general_ids = list(general)
        is_general = F.col("query_id").isin(general_ids)
        conv_ref = chain.otherwise(F.lit(False)) if chain is not None else F.lit(False)
        if point_data:
            branch_a = pre.filter(
                (~is_general & (F.col("interior") | conv_ref))
                | (is_general & F.col("interior"))
            )
            pip_multi = U.make_pip_refine_multi(general)
            branch_b = pre.filter(is_general & ~F.col("interior")).filter(
                pip_multi(F.col("query_id"), F.col(lon_col), F.col(lat_col))
            )
        else:
            # coarser-than-cover rows may stick out of their cell: every
            # row refines (interior skip unsound) — reference DedupeFilter
            # regime
            branch_a = pre.filter(~is_general & conv_ref)
            pip_multi = U.make_pip_refine_multi(general)
            branch_b = pre.filter(is_general).filter(
                pip_multi(F.col("query_id"), F.col(lon_col), F.col(lat_col))
            )
        outs.append(
            branch_a.unionByName(branch_b).drop("_jkey", "jcell", "interior")
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if dedup is None:
        dedup = "n_dup" in data.columns and not point_data
    if dedup:
        out = out.dropDuplicates(["query_id", *id_cols])
    return out
