"""CQL string front door vs the programmatic planner (createOptimalQuery
parity: same rows whichever surface builds the plan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark import registry as R
from geowave_spark.functions import geometry as G
from geowave_spark.operators import bbox as OB
from geowave_spark.operators import index as OI
from geowave_spark.operators import polygon as OP
from geowave_spark.operators import scan as OS
from geowave_spark.plans import cql as PC
from geowave_spark.plans import planner as P
from geowave_spark.sources import tables as TB


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id").cache()


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_cql_bbox_matches_programmatic(spark, geo):
    got = PC.cql_query(geo, "BBOX(geom, -74.5, 40.2, -73.5, 41.2)", tiers=[OI.C.MAX_RES])
    want = OB.query_bbox(
        geo, [P.BoxQuery("q", -74.5, 40.2, -73.5, 41.2)], tiers=[OI.C.MAX_RES]
    )
    assert _ids(got) == _ids(want)


def test_cql_intersects_polygon_with_hole(spark, geo):
    wkt = (
        "INTERSECTS(geom, POLYGON((1.4 48.0, 3.4 48.0, 3.4 49.0, 2.4 49.0, "
        "2.4 49.8, 1.4 49.8), (2.0 48.4, 2.6 48.4, 2.6 48.7, 2.0 48.7)))"
    )
    got = PC.cql_query(geo, wkt, tiers=[OI.C.MAX_RES])
    q = OP.PolygonQuery("q", G.wkb_polygon(R.PARIS_LSHAPE), "INTERSECTS")
    want = OP.query_polygon(geo, [q], tiers=[OI.C.MAX_RES])
    assert _ids(got) == _ids(want)


def test_cql_dwithin(spark, geo):
    got = PC.cql_query(geo, "DWITHIN(geom, POINT(-73.985 40.758), 100)", tiers=[OI.C.MAX_RES])
    want = OS.dwithin(geo, -73.985, 40.758, 100, tiers=[OI.C.MAX_RES])
    assert _ids(got) == _ids(want)


def test_cql_compound_with_residuals(spark, geo):
    from geowave_spark.operators import temporal as OT

    data = OT.with_time_bin(geo, periodicity="day")
    got = PC.cql_query(data, R.CQL_STRING, tiers=[OI.C.MAX_RES])
    # brute-force reference
    want = data.filter(
        (F.col("lon") >= -74.5) & (F.col("lon") <= -73.5)
        & (F.col("lat") >= 40.2) & (F.col("lat") <= 41.2)
        & (F.col("ts") >= F.to_timestamp(F.lit("2024-01-01 00:00:00")))
        & (F.col("ts") <= F.to_timestamp(F.lit("2024-01-20 23:59:59")))
        & F.col("event_type").isin("click", "purchase")
    )
    assert _ids(got) == _ids(want)


def test_cql_pure_residual_no_spatial(spark, geo):
    got = PC.cql_query(geo, "event_type = 'click' AND value > 50.0")
    want = geo.filter((F.col("event_type") == "click") & (F.col("value") > 50.0))
    assert _ids(got) == _ids(want)


def test_cql_rejects_two_spatial_clauses(spark, geo):
    with pytest.raises(ValueError):
        PC.cql_query(
            geo,
            "BBOX(geom, 0, 0, 1, 1) AND DWITHIN(geom, POINT(0 0), 10)",
        )


def test_cql_dwithin_units_guard(spark, geo):
    """ECQL linear units (meters) are refused loudly — distances here are
    exact milli-degrees; an explicit milli_degrees token is accepted."""
    with pytest.raises(ValueError, match="(?i)units"):
        PC.cql_query(geo, "DWITHIN(geom, POINT(2.352 48.857), 500, meters)")
    a = PC.cql_query(
        geo, "DWITHIN(geom, POINT(2.352 48.857), 500, milli_degrees)",
        tiers=[OI.C.MAX_RES],
    )
    b = PC.cql_query(
        geo, "DWITHIN(geom, POINT(2.352 48.857), 500)", tiers=[OI.C.MAX_RES]
    )
    assert _ids(a) == _ids(b)


def test_cql_between_non_timestamp_stays_residual(spark, geo):
    """BETWEEN over non-timestamp literals is NOT coerced through
    to_timestamp — it evaluates in the residual with the column's type."""
    got = PC.cql_query(geo, "event_type BETWEEN 'click' AND 'purchase'")
    want = geo.filter("event_type BETWEEN 'click' AND 'purchase'")
    assert _ids(got) == _ids(want)


def test_cql_or_of_geometries_linearized(spark, geo):
    """A top-level OR of spatial clauses (CQLQuery.java:228-236
    setExact(false) linearization) returns the exact union, with residual
    and time predicates still applied; a spatial clause in a non-OR
    position still raises."""
    where = (
        "(BBOX(geom, -74.5, 40.2, -73.5, 41.2) OR "
        "DWITHIN(geom, POINT(2.352 48.857), 800)) AND event_type = 'click'"
    )
    got = PC.cql_query(geo, where, tiers=[OI.C.MAX_RES])
    in_box = (
        (F.col("lon") >= -74.5) & (F.col("lon") <= -73.5)
        & (F.col("lat") >= 40.2) & (F.col("lat") <= 41.2)
    )
    dlon = F.abs(F.col("lon_milli") - F.lit(2352))
    dlon = F.least(dlon, F.lit(360000) - dlon)
    dlat = F.col("lat_milli") - F.lit(48857)
    in_disc = (dlon * dlon + dlat * dlat) <= F.lit(800 * 800)
    want = geo.filter((in_box | in_disc) & (F.col("event_type") == "click"))
    assert _ids(got) == _ids(want)
    assert len(_ids(got)) > 0

    with pytest.raises(ValueError, match="OR group"):
        PC.cql_query(
            geo,
            "BBOX(geom, 0, 0, 1, 1) AND DWITHIN(geom, POINT(0 0), 10)",
        )

    # nested binary OR grouping — what query builders emit — must
    # linearize identically to the flat form (round-3 review: the flat
    # '§ OR §' regex rejected '(§ OR (§ OR §))')
    nested = (
        "((BBOX(geom, -74.5, 40.2, -73.5, 41.2) OR "
        "(DWITHIN(geom, POINT(2.352 48.857), 800) OR "
        "BBOX(geom, -80, 0, -79, 1)))) AND event_type = 'click'"
    )
    got_n = PC.cql_query(geo, nested, tiers=[OI.C.MAX_RES])
    extra_box = (
        (F.col("lon") >= -80) & (F.col("lon") <= -79)
        & (F.col("lat") >= 0) & (F.col("lat") <= 1)
    )
    want_n = geo.filter(
        (in_box | in_disc | extra_box) & (F.col("event_type") == "click")
    )
    assert _ids(got_n) == _ids(want_n)


def test_cql_spatial_under_or_or_not_raises(spark, geo):
    """A spatial clause that is not a whole top-level AND operand must
    raise — replacing it with TRUE would silently change semantics
    (found in round-3 review: these previously returned wrong results)."""
    bad = [
        # negated OR-of-geometries: old code produced residual 'NOT TRUE'
        "NOT (BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6))",
        # OR group nested under a non-spatial OR: residual 'x OR TRUE'
        "event_type = 'click' OR "
        "(BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6))",
        # single clause OR'd with a non-spatial predicate: residual
        # 'TRUE OR ...' passed every bbox-prefiltered row
        "BBOX(geom, 0, 0, 1, 1) OR event_type = 'click'",
        "NOT BBOX(geom, 0, 0, 1, 1)",
    ]
    for where in bad:
        with pytest.raises(ValueError, match="OR group|top-level"):
            PC.cql_query(geo, where)


def test_cql_residual_or_group_still_allowed(spark, geo):
    """Non-spatial ORs in their own top-level operand are untouched."""
    where = (
        "(event_type = 'click' OR event_type = 'purchase') AND "
        "BBOX(geom, -74.5, 40.2, -73.5, 41.2)"
    )
    got = PC.cql_query(geo, where, tiers=[OI.C.MAX_RES])
    want = geo.filter(
        (F.col("lon") >= -74.5) & (F.col("lon") <= -73.5)
        & (F.col("lat") >= 40.2) & (F.col("lat") <= 41.2)
        & F.col("event_type").isin("click", "purchase")
    )
    assert _ids(got) == _ids(want)


def test_cql_between_under_or_stays_residual(spark, geo):
    """A timestamp BETWEEN inside an OR operand is NOT lifted to the
    AND-composed temporal fast path — it evaluates in the residual."""
    where = (
        "BBOX(geom, -74.5, 40.2, -73.5, 41.2) AND "
        "(ts BETWEEN '2024-01-01' AND '2024-01-05' OR event_type = 'click')"
    )
    got = PC.cql_query(geo, where, tiers=[OI.C.MAX_RES])
    want = geo.filter(
        (F.col("lon") >= -74.5) & (F.col("lon") <= -73.5)
        & (F.col("lat") >= 40.2) & (F.col("lat") <= 41.2)
    ).filter("ts BETWEEN '2024-01-01' AND '2024-01-05' OR event_type = 'click'")
    assert _ids(got) == _ids(want)
    assert len(_ids(got)) > 0


def test_envelope_cql_matches_brute(spark, sf_dir):
    """envelope_cql_query (envelope-grain stores): BBOX = interval overlap
    + residual; INTERSECTS raises loudly."""
    fps = TB.geo_footprints(spark, sf_dir).select(
        "event_id",
        (F.col("minx_m") / 1000.0).alias("minx"),
        (F.col("miny_m") / 1000.0).alias("miny"),
        (F.col("maxx_m") / 1000.0).alias("maxx"),
        (F.col("maxy_m") / 1000.0).alias("maxy"),
    )
    idx = OI.index_envelopes(fps, id_col="event_id")
    got = PC.envelope_cql_query(
        idx, "BBOX(geom, -74.5, 40.2, -73.5, 41.2) AND event_id > 100"
    )
    want = fps.filter(
        (F.col("minx") <= -73.5) & (F.col("maxx") >= -74.5)
        & (F.col("miny") <= 41.2) & (F.col("maxy") >= 40.2)
        & (F.col("event_id") > 100)
    )
    assert _ids(got) == _ids(want) and _ids(got)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="BBOX clauses only"):
        PC.envelope_cql_query(
            idx, "INTERSECTS(geom, POLYGON((0 0, 1 0, 1 1, 0 1)))"
        )
