"""First-class LineString geometry: segment-grain line stores with exact
integer line∩box and line∩polygon query paths.

Reference parity: the reference treats lines as ordinary JTS geometries
end-to-end — its golden vector IT queries a LINESTRING dataset with box and
polygon filters (test/.../GeoWaveBasicSpatialVectorIT.java:41-43,
tornado_tracks) and its GPX plugin emits track LineStrings
(extensions/formats/gpx/.../GPXConsumer.java).  There, a line is indexed by
the envelope of the WHOLE geometry (one multi-cell insertion per feature,
TieredSFCIndexStrategy.getInsertionIds) and refined per row with JTS.

Spark-first re-expression — SEGMENT grain, not feature grain:

* a polyline is stored as its constituent segments (track_id, seg_j,
  x0,y0,x1,y1 in integer milli-degrees), each indexed by its OWN tight
  envelope via ``index_envelopes_milli``.  At 100 TB this is the scale
  decision that matters: a long or meandering track's whole-geometry
  envelope covers thousands of cells (the reference caps duplicates and
  over-scans instead), while segment envelopes stay tight — the cell-cover
  prefilter prunes at segment granularity and never re-reads a track's far
  side for a query touching one bend.
* the exact refine is PURE Catalyst integer column arithmetic — no UDF, no
  geometry kernel in the hot path.  Segment×box is the separating-axis
  test (x, y, segment-normal axes); segment×polygon is even-odd vertex
  parity plus per-edge orientation crossing tests, both generated as SQL
  text from the literal query geometry so the engine (``F.expr``) and the
  DuckDB oracle replay the SAME expression bit-for-bit (the evenodd_sql
  pattern, functions/geometry.py:183).
* per-track verdicts aggregate segment hits in ONE map-side-combinable
  groupBy: INTERSECTS ⇔ any segment hits; WITHIN ⇔ every segment of the
  track is within (count of within-segments equals the track's segment
  count — segments outside the polygon's envelope cannot be within it, so
  the count is computable from cover-join survivors alone).

The numpy kernels (functions/geometry.py line_* / segments_intersect_box)
are the tested definitional oracle for these column expressions; WKB
LineString/MultiLineString round-trips through the same codec the other
geometry types use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.plans import planner as P

SEG_ENV_COLS = ("minx_m", "miny_m", "maxx_m", "maxy_m")


# ---------------------------------------------------------------------------
# store construction
# ---------------------------------------------------------------------------


def line_segments(
    pts: DataFrame,
    track_col: str = "track_id",
    order_col: str = "j",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Ordered vertices → segment rows (track_id, seg_j, x0, y0, x1, y1)
    plus the segment envelope columns ``index_envelopes_milli`` consumes.

    One window per track (device-history-sized partitions); single-vertex
    tracks yield no segments — a 1-point "line" is a point and belongs in
    the point store."""
    w = Window.partitionBy("track_id").orderBy("seg_j")
    seg = (
        pts.select(
            F.col(track_col).cast("long").alias("track_id"),
            F.col(order_col).cast("long").alias("seg_j"),
            F.col(x_col).cast("long").alias("x1"),
            F.col(y_col).cast("long").alias("y1"),
        )
        .withColumn("x0", F.lag("x1").over(w))
        .withColumn("y0", F.lag("y1").over(w))
        .filter(F.col("x0").isNotNull())
    )
    return seg.select(
        "track_id",
        (F.col("seg_j") - 1).alias("seg_j"),
        "x0", "y0", "x1", "y1",
        F.least("x0", "x1").alias("minx_m"),
        F.least("y0", "y1").alias("miny_m"),
        F.greatest("x0", "x1").alias("maxx_m"),
        F.greatest("y0", "y1").alias("maxy_m"),
    )


def index_line_segments(segs: DataFrame, **kw) -> DataFrame:
    """Tiered envelope index over segment envelopes (multi-cell insertion
    ids + n_dup dedup gating, operators/index.py:376)."""
    from geowave_spark.operators.index import index_envelopes_milli

    return index_envelopes_milli(
        segs, env_cols=SEG_ENV_COLS, id_col="track_id", **kw
    )


def segments_from_wkb(
    df: DataFrame, wkb_col: str = "wkb", id_col: str = "track_id"
) -> DataFrame:
    """WKB LineString/MultiLineString column → milli-int segment rows — the
    codec consumer (shapefile polylines, GPX exports land here).  Arrow
    batch; coordinates are degrees and are snapped to the milli grid with
    round-half-away (the engine's global convention)."""
    import pandas as pd

    from geowave_spark.functions import geometry as G

    out_schema = (
        "track_id long, seg_j long, x0 long, y0 long, x1 long, y1 long, "
        "minx_m long, miny_m long, maxx_m long, maxy_m long"
    )

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("track_id", "seg_j", "x0", "y0", "x1", "y1")}
            ids = pdf[id_col].tolist()
            bufs = pdf[wkb_col].tolist()
            for tid, buf in zip(ids, bufs):
                if buf is None:
                    continue
                j = 0
                for part in G.line_parts(bytes(buf)):
                    m = np.asarray(part, dtype=np.float64) * 1000.0
                    m = np.where(m >= 0, np.floor(m + 0.5), -np.floor(-m + 0.5))
                    m = m.astype(np.int64)
                    for i in range(len(m) - 1):
                        rows["track_id"].append(tid)
                        rows["seg_j"].append(j)
                        rows["x0"].append(m[i, 0])
                        rows["y0"].append(m[i, 1])
                        rows["x1"].append(m[i + 1, 0])
                        rows["y1"].append(m[i + 1, 1])
                        j += 1
            p = pd.DataFrame(rows)
            for a, b, c in (("x0", "x1", "minx_m"), ("y0", "y1", "miny_m")):
                p[c] = np.minimum(p[a], p[b])
            for a, b, c in (("x0", "x1", "maxx_m"), ("y0", "y1", "maxy_m")):
                p[c] = np.maximum(p[a], p[b])
            yield p

    slim = df.select(F.col(id_col).cast("long").alias(id_col), wkb_col)
    return slim.mapInPandas(gen, out_schema)


def tracks_to_wkb(segs: DataFrame, milli: bool = False) -> DataFrame:
    """Segment rows → one WKB LineString per track — the export side of
    the codec.  Default coordinates are degrees; ``milli=True`` keeps the
    integer milli grid (the coordinate contract of the geometry joins,
    operators/join.geometries_intersect_join — integer-valued float64s
    make the predicates bit-reproducible in SQL).  collect_list is
    bounded by track length (a device history), never data volume."""
    import pandas as pd

    from geowave_spark.functions import geometry as G

    per = segs.groupBy("track_id").agg(
        F.sort_array(
            F.collect_list(F.struct("seg_j", "x0", "y0", "x1", "y1"))
        ).alias("ss")
    )
    div = 1.0 if milli else 1000.0

    def enc(batches):
        for pdf in batches:
            wkbs = []
            for ss in pdf["ss"]:
                v = [(s["x0"] / div, s["y0"] / div) for s in ss]
                v.append((ss[-1]["x1"] / div, ss[-1]["y1"] / div))
                wkbs.append(G.wkb_linestring(np.asarray(v)))
            yield pd.DataFrame(
                {"track_id": pdf["track_id"], "wkb": wkbs}
            )

    return per.mapInPandas(enc, "track_id long, wkb binary")


# ---------------------------------------------------------------------------
# shared SQL predicate generators (engine F.expr == DuckDB oracle text)
# ---------------------------------------------------------------------------


def sql_seg_box(mnx: int, mny: int, mxx: int, mxy: int,
                x0="x0", y0="y0", x1="x1", y1="y1") -> str:
    """Exact integer segment × box intersection (separating-axis): overlap
    on x and y, and the box's projection onto the segment normal straddles
    the segment's.  Mirrors :func:`geometry.segments_intersect_box`."""
    nx = f"({y0} - {y1})"
    ny = f"({x1} - {x0})"
    c = f"({nx} * {x0} + {ny} * {y0})"
    ds = [f"({nx} * {cx} + {ny} * {cy})"
          for cx in (mnx, mxx) for cy in (mny, mxy)]
    lo = f"LEAST({', '.join(ds)})"
    hi = f"GREATEST({', '.join(ds)})"
    return (
        f"(LEAST({x0}, {x1}) <= {mxx} AND GREATEST({x0}, {x1}) >= {mnx} "
        f"AND LEAST({y0}, {y1}) <= {mxy} AND GREATEST({y0}, {y1}) >= {mny} "
        f"AND {lo} <= {c} AND {c} <= {hi})"
    )


def _closed_edges(rings: list) -> list[tuple[int, int, int, int]]:
    edges = []
    for ring in rings:
        r = [(int(x), int(y)) for x, y in ring]
        if r[0] != r[-1]:
            r.append(r[0])
        edges.extend((*r[i], *r[i + 1]) for i in range(len(r) - 1))
    return edges


def sql_evenodd_int(rings: list, px: str, py: str) -> str:
    """Even-odd ray-cast parity for integer coordinates — the division-free
    form of geometry.evenodd_sql: the crossing comparison is multiplied
    through by (y1-y0) with the inequality direction folded per literal
    edge, so the whole predicate is exact int64 arithmetic."""
    terms = []
    for x0, y0, x1, y1 in _closed_edges(rings):
        if y0 == y1:
            continue  # horizontal edge never crosses the upward test
        t = f"(({px} - {x0}) * {y1 - y0} - ({py} - {y0}) * {x1 - x0})"
        cmp_ = f"{t} < 0" if y1 > y0 else f"{t} > 0"
        terms.append(
            f"(CASE WHEN ({y0} > {py}) <> ({y1} > {py}) "
            f"AND {cmp_} THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def _sql_seg_edge(ex0, ey0, ex1, ey1, x0, y0, x1, y1) -> str:
    """One segment × one literal edge, closed semantics (CLRS 33.1 with the
    collinear on-segment arms — geometry.segments_intersect's twin)."""
    d1 = f"({ex1 - ex0} * ({y0} - {ey0}) - {ey1 - ey0} * ({x0} - {ex0}))"
    d2 = f"({ex1 - ex0} * ({y1} - {ey0}) - {ey1 - ey0} * ({x1} - {ex0}))"
    d3 = f"(({x1} - {x0}) * ({ey0} - {y0}) - ({y1} - {y0}) * ({ex0} - {x0}))"
    d4 = f"(({x1} - {x0}) * ({ey1} - {y0}) - ({y1} - {y0}) * ({ex1} - {x0}))"
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) "
        f"AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )
    lex, gex = min(ex0, ex1), max(ex0, ex1)
    ley, gey = min(ey0, ey1), max(ey0, ey1)
    on1 = (f"({d1} = 0 AND {lex} <= {x0} AND {x0} <= {gex} "
           f"AND {ley} <= {y0} AND {y0} <= {gey})")
    on2 = (f"({d2} = 0 AND {lex} <= {x1} AND {x1} <= {gex} "
           f"AND {ley} <= {y1} AND {y1} <= {gey})")
    on3 = (f"({d3} = 0 AND LEAST({x0}, {x1}) <= {ex0} "
           f"AND {ex0} <= GREATEST({x0}, {x1}) "
           f"AND LEAST({y0}, {y1}) <= {ey0} "
           f"AND {ey0} <= GREATEST({y0}, {y1}))")
    on4 = (f"({d4} = 0 AND LEAST({x0}, {x1}) <= {ex1} "
           f"AND {ex1} <= GREATEST({x0}, {x1}) "
           f"AND LEAST({y0}, {y1}) <= {ey1} "
           f"AND {ey1} <= GREATEST({y0}, {y1}))")
    return f"({proper} OR {on1} OR {on2} OR {on3} OR {on4})"


def sql_seg_edge_expr(ex0: str, ey0: str, ex1: str, ey1: str,
                      x0="x0", y0="y0", x1="x1", y1="y1") -> str:
    """:func:`_sql_seg_edge` with the edge endpoints as SQL EXPRESSIONS
    (per-row geometry, e.g. a polygon table's vertex formulas) instead of
    Python literals — the oracle form for large×large line joins."""
    dxe = f"(({ex1}) - ({ex0}))"
    dye = f"(({ey1}) - ({ey0}))"
    d1 = f"({dxe} * ({y0} - ({ey0})) - {dye} * ({x0} - ({ex0})))"
    d2 = f"({dxe} * ({y1} - ({ey0})) - {dye} * ({x1} - ({ex0})))"
    d3 = f"(({x1} - {x0}) * (({ey0}) - {y0}) - ({y1} - {y0}) * (({ex0}) - {x0}))"
    d4 = f"(({x1} - {x0}) * (({ey1}) - {y0}) - ({y1} - {y0}) * (({ex1}) - {x0}))"
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) "
        f"AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )
    on1 = (f"({d1} = 0 AND LEAST({ex0}, {ex1}) <= {x0} "
           f"AND {x0} <= GREATEST({ex0}, {ex1}) "
           f"AND LEAST({ey0}, {ey1}) <= {y0} "
           f"AND {y0} <= GREATEST({ey0}, {ey1}))")
    on2 = (f"({d2} = 0 AND LEAST({ex0}, {ex1}) <= {x1} "
           f"AND {x1} <= GREATEST({ex0}, {ex1}) "
           f"AND LEAST({ey0}, {ey1}) <= {y1} "
           f"AND {y1} <= GREATEST({ey0}, {ey1}))")
    on3 = (f"({d3} = 0 AND LEAST({x0}, {x1}) <= ({ex0}) "
           f"AND ({ex0}) <= GREATEST({x0}, {x1}) "
           f"AND LEAST({y0}, {y1}) <= ({ey0}) "
           f"AND ({ey0}) <= GREATEST({y0}, {y1}))")
    on4 = (f"({d4} = 0 AND LEAST({x0}, {x1}) <= ({ex1}) "
           f"AND ({ex1}) <= GREATEST({x0}, {x1}) "
           f"AND LEAST({y0}, {y1}) <= ({ey1}) "
           f"AND ({ey1}) <= GREATEST({y0}, {y1}))")
    return f"({proper} OR {on1} OR {on2} OR {on3} OR {on4})"


def sql_seg_crosses_rings(rings: list,
                          x0="x0", y0="y0", x1="x1", y1="y1") -> str:
    """Segment intersects ANY boundary edge of the literal rings."""
    return "(" + " OR ".join(
        _sql_seg_edge(ex0, ey0, ex1, ey1, x0, y0, x1, y1)
        for ex0, ey0, ex1, ey1 in _closed_edges(rings)
    ) + ")"


def sql_seg_poly_hit(rings: list,
                     x0="x0", y0="y0", x1="x1", y1="y1") -> str:
    """Segment ∩ polygon ≠ ∅: an endpoint inside (parity, holes included)
    or a boundary-edge crossing."""
    return (
        f"({sql_evenodd_int(rings, x0, y0)} "
        f"OR {sql_evenodd_int(rings, x1, y1)} "
        f"OR {sql_seg_crosses_rings(rings, x0, y0, x1, y1)})"
    )


def sql_seg_poly_within(rings: list,
                        x0="x0", y0="y0", x1="x1", y1="y1") -> str:
    """Segment ⊆ polygon: both endpoints inside and no boundary crossing."""
    return (
        f"({sql_evenodd_int(rings, x0, y0)} "
        f"AND {sql_evenodd_int(rings, x1, y1)} "
        f"AND NOT {sql_seg_crosses_rings(rings, x0, y0, x1, y1)})"
    )


# ---------------------------------------------------------------------------
# query paths
# ---------------------------------------------------------------------------


def _rings_env(rings: list) -> tuple[int, int, int, int]:
    xs = [int(x) for ring in rings for x, _ in ring]
    ys = [int(y) for ring in rings for _, y in ring]
    return min(xs), min(ys), max(xs), max(ys)


def query_bbox_lines(
    indexed_segs: DataFrame,
    queries: list[tuple[str, int, int, int, int]],
    tiers: list[int] | None = None,
    max_cells: int = 1024,
) -> DataFrame:
    """Tracks whose polyline intersects each query box.

    ``queries``: (query_id, minx_m, miny_m, maxx_m, maxy_m) integer milli
    boxes.  Returns (query_id, track_id, n_segs_hit) — the per-track count
    of distinct intersecting segments (countDistinct also absorbs the
    multi-cell n_dup copies, so no separate dedup shuffle)."""
    boxes = [
        P.BoxQuery(qid, mnx / 1000.0, mny / 1000.0, mxx / 1000.0, mxy / 1000.0)
        for qid, mnx, mny, mxx, mxy in queries
    ]
    pre = P.cover_join(indexed_segs, boxes, tiers=tiers, max_cells=max_cells)
    pred = None
    for qid, mnx, mny, mxx, mxy in queries:
        arm = (F.col("query_id") == qid) & F.expr(
            sql_seg_box(mnx, mny, mxx, mxy)
        )
        pred = arm if pred is None else (pred | arm)
    return (
        pre.filter(pred)
        .groupBy("query_id", "track_id")
        .agg(F.countDistinct("seg_j").alias("n_segs_hit"))
    )


def query_polygon_lines(
    indexed_segs: DataFrame,
    queries: list[tuple[str, list, str]],
    track_sizes: DataFrame | None = None,
    tiers: list[int] | None = None,
    max_cells: int = 1024,
) -> DataFrame:
    """Tracks intersecting / within literal polygons.

    ``queries``: (query_id, rings, op) with integer milli vertex rings
    (exterior first, holes after) and op INTERSECTS | WITHIN.  WITHIN needs
    ``track_sizes`` (track_id, n_segs) — a stored line-store stat; a track
    is within iff ALL its segments are (within-segments never escape the
    polygon envelope, so cover survivors suffice to count them).

    Returns (query_id, track_id, n_segs_hit)."""
    if any(op.upper() == "WITHIN" for _, _, op in queries) and track_sizes is None:
        raise ValueError("WITHIN queries need track_sizes (track_id, n_segs)")
    boxes = []
    for qid, rings, _ in queries:
        mnx, mny, mxx, mxy = _rings_env(rings)
        boxes.append(
            P.BoxQuery(qid, mnx / 1000.0, mny / 1000.0,
                       mxx / 1000.0, mxy / 1000.0)
        )
    pre = P.cover_join(indexed_segs, boxes, tiers=tiers, max_cells=max_cells)
    pred = None
    for qid, rings, op in queries:
        sql = (sql_seg_poly_within(rings) if op.upper() == "WITHIN"
               else sql_seg_poly_hit(rings))
        arm = (F.col("query_id") == qid) & F.expr(sql)
        pred = arm if pred is None else (pred | arm)
    hits = (
        pre.filter(pred)
        .groupBy("query_id", "track_id")
        .agg(F.countDistinct("seg_j").alias("n_segs_hit"))
    )
    within_ids = [qid for qid, _, op in queries if op.upper() == "WITHIN"]
    if not within_ids:
        return hits
    # hits is the small side (query result grain) — let AQE pick the
    # build side rather than forcing a broadcast of the full stat table
    sized = hits.join(track_sizes, "track_id", "left")
    return sized.filter(
        (~F.col("query_id").isin(within_ids))
        | (F.col("n_segs_hit") == F.col("n_segs"))
    ).select("query_id", "track_id", "n_segs_hit")
