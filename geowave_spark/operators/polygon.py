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
    for q in queries:
        op = q.op.upper()
        if op == "CONTAINS":
            # a point can never contain a polygon — empty result, schema kept
            outs.append(
                data.withColumn("query_id", F.lit(q.query_id)).filter(F.lit(False))
            )
            continue
        pip = U.make_pip_refine(q.wkb)
        if op == "DISJOINT":
            # anti-query: full scan, negated exact predicate (no index help)
            outs.append(
                data.withColumn("query_id", F.lit(q.query_id)).filter(
                    ~pip(F.col(lon_col), F.col(lat_col))
                )
            )
            continue
        if op not in ("INTERSECTS", "WITHIN"):
            raise ValueError(f"unsupported op {q.op}")
        cover_pdf, r_q = _polygon_cover(q, tiers, max_cells)
        cover = spark.createDataFrame(cover_pdf)
        pre = data.withColumn("_jkey", P.data_join_key(r_q)).join(
            F.broadcast(cover), F.col("_jkey") == F.col("jcell"), "inner"
        )
        # Split so the PIP UDF never touches interior-cell matches (a when()
        # would still evaluate the UDF on every row).  The skip is sound iff
        # the data row's own cell is at least as fine as the cover cell —
        # guaranteed for point tables.
        if point_data:
            hit_interior = pre.filter(F.col("interior"))
            hit_boundary = pre.filter(~F.col("interior")).filter(
                pip(F.col(lon_col), F.col(lat_col))
            )
            refined = hit_interior.unionByName(hit_boundary)
        else:
            refined = pre.filter(pip(F.col(lon_col), F.col(lat_col)))
        outs.append(refined.drop("_jkey", "jcell", "interior"))

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if dedup is None:
        dedup = "n_dup" in data.columns and not point_data
    if dedup:
        out = out.dropDuplicates(["query_id", *id_cols])
    return out
