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
applies the residual.  Spatial clauses in any other boolean position
still raise (a silent full-scan would hide a planning bug).
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


def _cut(where: str, span: tuple[int, int]) -> str:
    return where[: span[0]] + " TRUE " + where[span[1]:]


def _residual(where: str) -> str:
    """Collapse dangling ANDs/TRUEs left by clause extraction."""
    s = where.strip()
    s = re.sub(r"\bTRUE\s+AND\s+", "", s, flags=re.I)
    s = re.sub(r"\s+AND\s+TRUE\b", "", s, flags=re.I)
    s = s.strip()
    return "" if s.upper() in ("", "TRUE") else s


def _spatial_matches(where: str) -> list[tuple[str, re.Match]]:
    out = []
    for pat, kind in (
        (_BBOX, "bbox"), (_INTERSECTS, "intersects"), (_DWITHIN, "dwithin")
    ):
        out.extend((kind, m) for m in pat.finditer(where))
    out.sort(key=lambda km: km[1].span()[0])
    return out


_OR_GROUP = re.compile(r"\(?\s*§(?:\s+OR\s+§)+\s*\)?", re.I)


def _linearize_or(data, where, matches, tiers, max_cells, id_col):
    """CQLQuery.java:228-236 linearization: WHERE whose spatial clauses
    form one top-level OR group → union of each clause's exact index plan,
    id-dedup'd, then the non-spatial remainder as residual.  Returns None
    when the clauses are NOT a recognizable OR group (caller raises)."""
    skel, spans = where, [m.span() for _, m in matches]
    for s in reversed(spans):
        skel = skel[: s[0]] + "§" + skel[s[1]:]
    g = _OR_GROUP.search(skel)
    if g is None or skel.count("§") != len(matches):
        return None
    rest = skel[: g.span()[0]] + " TRUE " + skel[g.span()[1]:]
    if "§" in rest:
        return None  # a spatial clause outside the OR group
    arms = [
        cql_query(data, where[m.span()[0]: m.span()[1]], tiers=tiers,
                  max_cells=max_cells)
        for _, m in matches
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    out = out.dropDuplicates([id_col])
    residual = _residual(rest)
    return out, residual


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
    if len(matches) > 1:
        lin = _linearize_or(data, where, matches, tiers, max_cells, id_col)
        if lin is None:
            raise ValueError(
                "cql_query supports one spatial clause per query, or "
                "several combined in a single top-level OR group (the "
                "reference's createOptimalQuery linearization)"
            )
        out, residual = lin
        tm = _BETWEEN.search(residual)
        if tm and _TS_LIT.match(tm.group(2)) and _TS_LIT.match(tm.group(3)):
            col, t0, t1 = tm.group(1), tm.group(2), tm.group(3)
            out = out.filter(
                (F.col(col) >= F.to_timestamp(F.lit(t0)))
                & (F.col(col) <= F.to_timestamp(F.lit(t1)))
            )
            residual = _residual(_cut(residual, tm.span()))
        if residual:
            out = out.filter(F.expr(residual))
        return out
    spatial = None  # (kind, payload)
    if matches:
        spatial = matches[0]
        where = _cut(where, matches[0][1].span())

    time_pred = None
    tm = _BETWEEN.search(where)
    if tm and _TS_LIT.match(tm.group(2)) and _TS_LIT.match(tm.group(3)):
        # only timestamp-shaped literals take the temporal fast path; any
        # other BETWEEN stays in the residual (Catalyst evaluates it as-is
        # with the column's own type — no blind to_timestamp coercion)
        col, t0, t1 = tm.group(1), tm.group(2), tm.group(3)
        time_pred = (F.col(col) >= F.to_timestamp(F.lit(t0))) & (
            F.col(col) <= F.to_timestamp(F.lit(t1))
        )
        where = _cut(where, tm.span())

    residual = _residual(where)

    if spatial is None:
        out = data
    elif spatial[0] == "bbox":
        m = spatial[1]
        q = P.BoxQuery("cql", *(float(m.group(i)) for i in range(2, 6)))
        out = OB.query_bbox(data, [q], tiers=tiers, max_cells=max_cells).drop("query_id")
    elif spatial[0] == "intersects":
        m = spatial[1]
        rings = _parse_rings(m.group(2))
        q = OP.PolygonQuery("cql", G.wkb_polygon(rings), "INTERSECTS")
        out = OP.query_polygon(data, [q], tiers=tiers, max_cells=max_cells).drop(
            "query_id"
        )
    else:  # dwithin
        m = spatial[1]
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
