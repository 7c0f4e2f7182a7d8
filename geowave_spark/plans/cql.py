"""CQL/ECQL string front door: parse a WHERE string, extract the spatial
and temporal constraints into index-accelerated plans, run the remainder
as a Catalyst residual.

The reference's main user surface is a CQL *string*
(extensions/adapters/vector/.../query/cql/CQLQuery.java:125-258
``createOptimalQuery``: ExtractGeometryFilterVisitor pulls the geometry,
ExtractTimeFilterVisitor the time range, the full filter re-runs as the
fine filter).  The re-expression: a small regex grammar over the clauses
the reference's visitors actually extract —

* ``BBOX(geom, minx, miny, maxx, maxy)``
* ``INTERSECTS(geom, POLYGON((x y, ...)[, (hole ...)]))``
* ``DWITHIN(geom, POINT(x y), dist[, units])``  (dist in milli-degrees)
* ``ts BETWEEN 'iso' AND 'iso'``
* anything else — untouched residual handed to ``F.expr`` (Catalyst gets
  pushdown/pruning for free, the reference's "fine filter" stage)

Top-level composition is AND, with ONE linearized exception mirroring
CQLQuery.java:228-236 (``setExact(false)``): a top-level OR *of spatial
clauses* — ``(BBOX(...) OR DWITHIN(...)) AND residual`` — runs each
clause's exact index plan, unions the results with an id-dedup, and
applies the residual.  Extraction is gated by a real top-level-AND
decomposition (quote/paren aware, BETWEEN's internal AND masked): a
spatial clause under OR or NOT mixed with other predicates raises — a
clause silently replaced by TRUE there would change the query's meaning
(``BBOX(..) OR x=1`` would drop x=1 rows outside the box;
``NOT (BBOX(..) OR BBOX(..))`` would return nothing).  A BETWEEN that is
not itself a top-level operand stays in the residual, unconverted.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import geometry as G
from geowave_spark.operators import bbox as OB
from geowave_spark.operators import polygon as OP
from geowave_spark.operators import scan as OS
from geowave_spark.plans import planner as P

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_BBOX = re.compile(
    rf"BBOX\s*\(\s*(\w+)\s*,\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\)",
    re.I,
)
_INTERSECTS = re.compile(
    r"INTERSECTS\s*\(\s*(\w+)\s*,\s*POLYGON\s*\(\s*(\(.*?\))\s*\)\s*\)", re.I | re.S
)
_DWITHIN = re.compile(
    rf"DWITHIN\s*\(\s*(\w+)\s*,\s*POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*,"
    rf"\s*({_NUM})\s*(?:,\s*(\w+)\s*)?\)",
    re.I,
)
_BETWEEN = re.compile(r"(\w+)\s+BETWEEN\s+'([^']+)'\s+AND\s+'([^']+)'", re.I)
_TS_LIT = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$")

# DWITHIN distances are interpreted in integer milli-degrees (the engine's
# exact planar metric).  ECQL's linear units (meters, kilometers, …) need a
# latitude-dependent conversion this engine does not silently guess at.
_DWITHIN_UNITS = {"milli_degrees", "millidegrees", "millidegree"}


def _parse_rings(body: str) -> list[np.ndarray]:
    """'(x y, x y, ...), (hole...)' → list of (N,2) rings."""
    rings = []
    for m in re.finditer(r"\(([^()]*)\)", body):
        pts = []
        for pair in m.group(1).split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def _spatial_matches(where: str) -> list[tuple[str, re.Match]]:
    out = []
    for pat, kind in (
        (_BBOX, "bbox"), (_INTERSECTS, "intersects"), (_DWITHIN, "dwithin")
    ):
        out.extend((kind, m) for m in pat.finditer(where))
    out.sort(key=lambda km: km[1].span()[0])
    return out


# ---------------------------------------------------------------------------
# Top-level boolean decomposition.  Clause extraction may ONLY lift a
# spatial/temporal clause out of the string when it is a genuine top-level
# AND operand — a clause under OR or NOT that is replaced by TRUE silently
# changes the query's meaning (e.g. ``BBOX(..) OR x=1`` would prefilter to
# the box and then pass everything, dropping x=1 rows outside the box;
# ``NOT (BBOX(..) OR BBOX(..))`` would become NOT TRUE = nothing).  So the
# WHERE is split at depth-0, outside-quotes ANDs (BETWEENs masked first —
# their internal AND is not a conjunction) and each extraction checks its
# clause IS one whole operand.
# ---------------------------------------------------------------------------

_T0 = "\x01"  # BETWEEN mask delimiters; cannot appear in CQL text
_T1 = "\x02"


def _mask_betweens(s: str) -> tuple[str, list[str]]:
    out, stored, last = [], [], 0
    for m in _BETWEEN.finditer(s):
        out.append(s[last: m.span()[0]])
        out.append(f"{_T0}{len(stored)}{_T1}")
        stored.append(m.group(0))
        last = m.span()[1]
    out.append(s[last:])
    return "".join(out), stored


def _unmask(s: str, stored: list[str]) -> str:
    for i, txt in enumerate(stored):
        s = s.replace(f"{_T0}{i}{_T1}", txt)
    return s


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 0 and i < len(s) - 1:
                return s  # the outer parens do not span the whole string
        s = s[1:-1].strip()
    return s


def _top_operands(s: str, kw: str) -> list[str]:
    """Split at top-level (paren-depth 0, outside single quotes) ``kw``
    keywords (``AND`` or ``OR``)."""
    s = _strip_outer_parens(s)
    k = len(kw)
    out, depth, in_q, start, i, n = [], 0, False, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if in_q:
            in_q = ch != "'"
        elif ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i: i + k].upper() == kw
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + k >= n or not (s[i + k].isalnum() or s[i + k] == "_"))
        ):
            out.append(s[start:i])
            start = i + k
            i += k
            continue
        i += 1
    out.append(s[start:])
    return [o.strip() for o in out if o.strip()]


def _top_and_operands(s: str) -> list[str]:
    return _top_operands(s, "AND")


def _is_pure_or_of_marks(s: str) -> bool:
    """True when ``s`` is an arbitrarily-parenthesized OR tree whose every
    leaf is a ``§`` spatial-clause mark — '(§ OR (§ OR §))' qualifies, not
    just the flat '§ OR § OR §' (machine-generated CQL routinely nests
    binary ORs)."""
    s = _strip_outer_parens(s)
    parts = _top_operands(s, "OR")
    if len(parts) == 1:
        return parts[0] == "§"
    return all(_is_pure_or_of_marks(p) for p in parts)


def _decompose(where: str, matches) -> tuple[str | None, list[str]]:
    """→ (spatial operand with clauses as ``§`` marks | None, other
    top-level AND operands, BETWEENs unmasked).  Raises when any spatial
    clause sits under OR/NOT mixed with non-spatial terms — the positions
    clause extraction cannot honor."""
    skel = where
    for s in reversed([m.span() for _, m in matches]):
        skel = skel[: s[0]] + "§" + skel[s[1]:]
    masked, stored = _mask_betweens(skel)
    ops = [_strip_outer_parens(o) for o in _top_and_operands(masked)]
    spatial_ops = [o for o in ops if "§" in o]
    rest = [_unmask(o, stored) for o in ops if "§" not in o]
    if not matches:
        return None, rest
    if (
        len(spatial_ops) != 1
        or not _is_pure_or_of_marks(spatial_ops[0])
        or spatial_ops[0].count("§") != len(matches)
    ):
        raise ValueError(
            "spatial clauses are only supported as one top-level AND "
            "operand — a single clause, or several in a single top-level "
            "OR group (the reference's createOptimalQuery linearization); "
            "under OR/NOT with other predicates the index prefilter would "
            "silently change the query's meaning"
        )
    return spatial_ops[0], rest


def _linearize_or(data, where, matches, tiers, max_cells, id_col):
    """CQLQuery.java:228-236 linearization: the spatial clauses form one
    top-level OR group → union of each clause's exact index plan,
    id-dedup'd; the caller applies the remaining operands."""
    arms = [
        cql_query(data, where[m.span()[0]: m.span()[1]], tiers=tiers,
                  max_cells=max_cells)
        for _, m in matches
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.dropDuplicates([id_col])


def _time_and_residual(rest_ops: list[str]):
    """Split the non-spatial top-level AND operands into (time_pred,
    residual SQL).  Temporal fast path: a timestamp-literal BETWEEN that
    is itself a whole operand gets explicit to_timestamp coercion; any
    other BETWEEN (non-timestamp literals, or embedded under OR/NOT)
    stays in the residual — Catalyst evaluates it with the column's own
    type, no blind coercion and no semantics change.  Shared by the
    tiered planner here and the S2 planner (plans/s2cql.py)."""
    time_pred = None
    residual_ops: list[str] = []
    for op in rest_ops:
        tm = _BETWEEN.fullmatch(op)
        if (
            time_pred is None
            and tm
            and _TS_LIT.match(tm.group(2))
            and _TS_LIT.match(tm.group(3))
        ):
            col, t0, t1 = tm.group(1), tm.group(2), tm.group(3)
            time_pred = (F.col(col) >= F.to_timestamp(F.lit(t0))) & (
                F.col(col) <= F.to_timestamp(F.lit(t1))
            )
        else:
            residual_ops.append(op)
    return time_pred, " AND ".join(f"({o})" for o in residual_ops)


def envelope_cql_query(
    data: DataFrame,
    where: str,
    tiers: list[int] | None = None,
    max_cells: int = 1024,
    id_col: str = "event_id",
) -> DataFrame:
    """CQL over an ENVELOPE-grain store (shapefile/GeoTIFF ingest: one row
    per covering cell, ``minx..maxy`` degree footprint columns).

    BBOX clauses run as envelope-INTERSECTION queries (query_bbox_envelopes
    — cover join + exact interval-overlap residual + DedupeFilter); a
    top-level OR group of BBOXes unions through one multi-query cover join
    and id-dedups.  INTERSECTS/DWITHIN raise loudly: a point predicate
    over a footprint row would silently answer a different question (the
    reference's raster/vector adapters make the same split — envelope
    constraints at the index, geometry refinement only where a point/geom
    column exists)."""
    matches = _spatial_matches(where)
    spatial_op, rest_ops = _decompose(where, matches)
    time_pred, residual = _time_and_residual(rest_ops)
    if any(kind != "bbox" for kind, _ in matches):
        raise ValueError(
            "envelope stores accept BBOX clauses only: INTERSECTS/DWITHIN "
            "refine on point coordinates this store does not have"
        )
    if matches:
        qs = [
            P.BoxQuery(f"cql{i}", *(float(m.group(j)) for j in range(2, 6)))
            for i, (_k, m) in enumerate(matches)
        ]
        out = OB.query_bbox_envelopes(
            data, qs, id_cols=(id_col,), tiers=tiers, max_cells=max_cells
        ).drop("query_id")
        if len(matches) > 1:
            out = out.dropDuplicates([id_col])
    else:
        out = data
    if time_pred is not None:
        out = out.filter(time_pred)
    if residual:
        out = out.filter(F.expr(residual))
    return out


def cql_query(
    data: DataFrame,
    where: str,
    tiers: list[int] | None = None,
    max_cells: int = 1024,
    id_col: str = "event_id",
) -> DataFrame:
    """Run a CQL-style WHERE string through the index-accelerated planner.

    One spatial clause (BBOX / INTERSECTS / DWITHIN) becomes the
    cover-join prefilter (none → the query is a pure Catalyst filter, the
    reference's unconstrained-CQL full-scan path); BETWEEN on a timestamp
    column and every remaining predicate run as residuals.  Several
    spatial clauses are accepted when they form one top-level OR group
    (see module docstring).
    """
    matches = _spatial_matches(where)
    spatial_op, rest_ops = _decompose(where, matches)
    time_pred, residual = _time_and_residual(rest_ops)

    if spatial_op is None:
        out = data
    elif len(matches) > 1:
        out = _linearize_or(data, where, matches, tiers, max_cells, id_col)
        if time_pred is not None:
            out = out.filter(time_pred)
        if residual:
            out = out.filter(F.expr(residual))
        return out
    elif matches[0][0] == "bbox":
        m = matches[0][1]
        q = P.BoxQuery("cql", *(float(m.group(i)) for i in range(2, 6)))
        out = OB.query_bbox(data, [q], tiers=tiers, max_cells=max_cells).drop("query_id")
    elif matches[0][0] == "intersects":
        m = matches[0][1]
        rings = _parse_rings(m.group(2))
        q = OP.PolygonQuery("cql", G.wkb_polygon(rings), "INTERSECTS")
        out = OP.query_polygon(data, [q], tiers=tiers, max_cells=max_cells).drop(
            "query_id"
        )
    else:  # dwithin
        m = matches[0][1]
        units = m.group(5)
        if units is not None and units.lower() not in _DWITHIN_UNITS:
            raise ValueError(
                f"DWITHIN units {units!r} unsupported: distances are exact "
                "integer milli-degrees (write the clause unitless or as "
                "milli_degrees); linear units would need a latitude-"
                "dependent conversion this planner refuses to guess"
            )
        lon, lat, dist = float(m.group(2)), float(m.group(3)), float(m.group(4))
        out = OS.dwithin(data, lon, lat, int(round(dist)), tiers=tiers).drop(
            "dist2_milli"
        )

    if time_pred is not None:
        out = out.filter(time_pred)
    if residual:
        out = out.filter(F.expr(residual))
    return out


def lines_cql_query(
    segs_indexed: DataFrame,
    where: str,
    tiers: list[int] | None = None,
    max_cells: int = 1024,
) -> DataFrame:
    """CQL over a segment-grain LINE store (operators/lines.py) — the
    tornado_tracks golden shape (GeoWaveBasicSpatialVectorIT.java:41-43:
    LINESTRING dataset queried by box and polygon) as the SAME CQL
    grammar the point/envelope stores speak.

    BBOX → exact line∩box (separating-axis segment refine); INTERSECTS
    with a POLYGON literal → line∩polygon (parity + edge crossing);
    DWITHIN raises (a distance predicate over a track wants the kNN/track
    family, not a silent segment-distance reinterpretation).  Degree
    literals snap to the engine's milli grid with round-half-away — the
    same convention the stores were built with.  A top-level OR group
    unions per-clause exact plans and dedups per track keeping the MAX
    segment-hit count (deterministic).  Returns
    (track_id, n_segs_hit)."""
    from geowave_spark.operators import lines as LN

    def _milli(v: float) -> int:
        import math

        return int(math.floor(abs(v) * 1000 + 0.5)) * (1 if v >= 0 else -1)

    matches = _spatial_matches(where)
    _spatial, rest_ops = _decompose(where, matches)
    time_pred, residual = _time_and_residual(rest_ops)
    if time_pred is not None:
        raise ValueError(
            "line stores carry no timestamp column; temporal clauses "
            "belong on the track-point table before segmentation"
        )
    if any(kind == "dwithin" for kind, _ in matches):
        raise ValueError(
            "DWITHIN over a line store is not supported — use the kNN/"
            "track-similarity operators for distance semantics"
        )
    if not matches:
        raise ValueError("line-store CQL needs a spatial clause")
    arms = []
    for i, (kind, m) in enumerate(matches):
        if kind == "bbox":
            q = (f"cql{i}", _milli(float(m.group(2))), _milli(float(m.group(3))),
                 _milli(float(m.group(4))), _milli(float(m.group(5))))
            arms.append(LN.query_bbox_lines(
                segs_indexed, [q], tiers=tiers, max_cells=max_cells
            ))
        else:  # intersects
            rings = [
                [(_milli(float(x)), _milli(float(y))) for x, y in ring]
                for ring in _parse_rings(m.group(2))
            ]
            arms.append(LN.query_polygon_lines(
                segs_indexed, [(f"cql{i}", rings, "INTERSECTS")],
                tiers=tiers, max_cells=max_cells,
            ))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    out = out.groupBy("track_id").agg(
        F.max("n_segs_hit").alias("n_segs_hit")
    )
    if residual:
        out = out.filter(F.expr(residual))
    return out
