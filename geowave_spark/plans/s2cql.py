"""CQL front door over the S2-analogue single-SFC index — the same
string grammar as plans/cql.py routed through the leaf-range planner
(operators/s2.py) instead of the tiered cover join.

The reference makes the index strategy pluggable UNDER one query
surface (core/store/.../index/CustomIndexStrategy.java + the
SpatialDimensionalityTypeProvider presets): a CQL query plans against
whatever index the store was written with.  This module is that
property for the S2 store: identical WHERE strings, identical results,
different physical plan —

* tiered store (plans/cql.py): per-tier cover JOIN against decomposed
  Morton ranges, then exact refine.
* S2 store (here): driver-side budgeted covering → merged leaf-id
  ranges → ONE scan filter of two-compare range arms (interior arms
  unrefined, boundary arms AND the exact predicate).  No join, no
  shuffle; over a stored ``s2_leaf`` column the arms push down to
  parquet row-group min/max and the ``leaf_p`` partition column prunes
  directories (operators/s2.py write_s2_store layout).

Parsing is SHARED with plans/cql.py (one grammar, two planners): the
spatial-clause regexes, the top-level AND/OR decomposition with its
meaning-preserving extraction gate, and the timestamp-BETWEEN /
residual split all come from there, so the two planners accept and
reject exactly the same strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import udfs as U
from geowave_spark.operators import s2 as OS2
from geowave_spark.plans.cql import (
    _DWITHIN_UNITS,
    _decompose,
    _parse_rings,
    _spatial_matches,
    _time_and_residual,
)

_WORLD = 360_000  # full longitude span, milli-degrees


def _dwithin_box(lon_m: int, lat_m: int, d: int) -> tuple[int, int, int, int]:
    """Buffered closed box around the query point in integer milli —
    date-line wrap expressed as the planner's minx > maxx contract."""
    if 2 * d >= _WORLD:  # buffer wider than the world: all longitudes
        minx, maxx = -180_000, 180_000
    else:
        minx, maxx = lon_m - d, lon_m + d
        if minx < -180_000:
            minx += _WORLD  # wraps: minx > maxx
        if maxx > 180_000:
            maxx -= _WORLD
    return minx, max(lat_m - d, -90_000), maxx, min(lat_m + d, 90_000)


def s2_cql_query(
    data: DataFrame,
    where: str,
    max_cells: int = 48,
    id_col: str = "event_id",
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    leaf_col: str | None = None,
) -> DataFrame:
    """Run a CQL WHERE string through the S2 leaf-range planner.

    Same grammar and semantics as plans/cql.cql_query (BBOX /
    INTERSECTS / DWITHIN, coordinates in degrees, DWITHIN distance in
    milli-degrees; one spatial operand or one top-level OR group of
    them; timestamp BETWEEN fast path; everything else a Catalyst
    residual).  ``leaf_col`` names the stored leaf-id column written by
    write_s2_store — with it every spatial arm is a pushable column
    compare on the sorted store."""
    matches = _spatial_matches(where)
    spatial_op, rest_ops = _decompose(where, matches)
    time_pred, residual = _time_and_residual(rest_ops)

    if spatial_op is None:
        out = data
    elif len(matches) > 1:
        # CQLQuery.java:228-236 linearization: union of each clause's
        # exact plan, id-dedup'd (same contract as plans/cql.py).
        arms = [
            s2_cql_query(
                data,
                where[m.span()[0]: m.span()[1]],
                max_cells=max_cells,
                id_col=id_col,
                lon_col=lon_col,
                lat_col=lat_col,
                leaf_col=leaf_col,
            )
            for _, m in matches
        ]
        out = arms[0]
        for a in arms[1:]:
            out = out.unionByName(a)
        out = out.dropDuplicates([id_col])
    elif matches[0][0] == "bbox":
        m = matches[0][1]
        minx, miny, maxx, maxy = (
            int(round(float(m.group(i)) * 1000)) for i in range(2, 6)
        )
        out = OS2.s2_bbox_query(
            data, minx, miny, maxx, maxy,
            max_cells=max_cells, lon_col=lon_col, lat_col=lat_col,
            leaf_col=leaf_col,
        )
    elif matches[0][0] == "intersects":
        m = matches[0][1]
        rings = [r * 1000.0 for r in _parse_rings(m.group(2))]
        out = OS2.s2_polygon_query(
            data, rings,
            max_cells=max(max_cells, 64), lon_col=lon_col, lat_col=lat_col,
            leaf_col=leaf_col,
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
        lon_m = int(round(float(m.group(2)) * 1000))
        lat_m = int(round(float(m.group(3)) * 1000))
        d = int(round(float(m.group(4))))
        pre = OS2.s2_bbox_query(
            data, *_dwithin_box(lon_m, lat_m, d),
            max_cells=max_cells, lon_col=lon_col, lat_col=lat_col,
            leaf_col=leaf_col,
        )
        dist2 = U.planar_wrap_dist2_col(
            F.col(lon_col), F.col(lat_col), F.lit(lon_m), F.lit(lat_m)
        )
        out = pre.filter(dist2 <= F.lit(d * d))

    if time_pred is not None:
        out = out.filter(time_pred)
    if residual:
        out = out.filter(F.expr(residual))
    return out
