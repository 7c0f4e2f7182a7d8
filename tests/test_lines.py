"""LineString family: WKB codec arms, exact segment predicates
(functions/geometry.py), and the segment-grain line store + query paths
(operators/lines.py) against numpy brute force.

Reference golden shape: GeoWaveBasicSpatialVectorIT.java:41-43 —
tornado_tracks LINESTRING dataset queried with a box and a polygon."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import geometry as G
from geowave_spark.operators import lines as L
from geowave_spark.sources import tables as TB


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_wkb_linestring_roundtrip():
    pts = np.array([[0.0, 0.0], [2.5, 1.25], [4.0, -3.0]])
    t, p = G.parse_wkb(G.wkb_linestring(pts))
    assert t == G.WKB_LINESTRING and np.array_equal(p, pts)


def test_wkb_multilinestring_roundtrip_and_envelope():
    a = np.array([[0.0, 0.0], [2.0, 1.0]])
    b = np.array([[10.0, 10.0], [14.0, 11.0], [12.0, 9.0]])
    t, parts = G.parse_wkb(G.wkb_multilinestring([a, b]))
    assert t == G.WKB_MULTILINESTRING
    assert len(parts) == 2 and np.array_equal(parts[1], b)
    assert G.envelope_of_wkb(G.wkb_multilinestring([a, b])) == (0.0, 0.0, 14.0, 11.0)
    assert G.line_parts(G.wkb_linestring(a))[0].shape == (2, 2)


# ---------------------------------------------------------------------------
# exact kernels
# ---------------------------------------------------------------------------


def test_segment_box_sat_truth_table():
    s0 = np.array([[0, 0], [5, 5], [0, 3], [10, 10], [0, 3]], float)
    s1 = np.array([[4, 4], [6, 6], [3, 0], [11, 11], [3, 0]], float)
    hit = G.segments_intersect_box(s0, s1, 1, 1, 2, 2)
    assert list(hit) == [True, False, True, False, True]
    # diagonal near-miss: x+y=3 line misses box with corner sum max 2
    assert not G.segments_intersect_box(
        np.array([[0.0, 3.0]]), np.array([[3.0, 0.0]]), 0, 0, 1, 1
    )[0]
    # exact corner touch counts (closed semantics)
    assert G.segments_intersect_box(
        np.array([[0.0, 2.0]]), np.array([[2.0, 0.0]]), 0, 0, 1, 1
    )[0]
    # degenerate zero-length segment == point-in-box
    assert G.segments_intersect_box(
        np.array([[1.0, 1.0]]), np.array([[1.0, 1.0]]), 0, 0, 2, 2
    )[0]
    assert not G.segments_intersect_box(
        np.array([[5.0, 5.0]]), np.array([[5.0, 5.0]]), 0, 0, 2, 2
    )[0]


def test_segment_box_sat_random_vs_sampling():
    """SAT verdict vs dense parametric sampling (1e-3 steps) on random
    integer segments/boxes — sampling can only under-detect, so SAT must
    be a superset and agree wherever sampling says hit."""
    rng = np.random.RandomState(7)
    for _ in range(300):
        seg = rng.randint(-20, 21, size=4).astype(float)
        box = np.sort(rng.randint(-15, 16, size=2))
        boy = np.sort(rng.randint(-15, 16, size=2))
        t = np.linspace(0, 1, 1001)
        xs = seg[0] + (seg[2] - seg[0]) * t
        ys = seg[1] + (seg[3] - seg[1]) * t
        sampled = bool(
            ((xs >= box[0]) & (xs <= box[1]) & (ys >= boy[0]) & (ys <= boy[1])).any()
        )
        sat = bool(
            G.segments_intersect_box(
                seg[None, :2], seg[None, 2:], box[0], boy[0], box[1], boy[1]
            )[0]
        )
        assert sat or not sampled, (seg, box, boy)
        if sampled:
            assert sat


SQUARE = [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)]
HOLEY = [
    np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
    np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float),
]


def test_line_polygon_kernels():
    thru = [np.array([[-5, 5], [15, 5]], float)]
    inside = [np.array([[1, 1], [2, 2]], float)]
    away = [np.array([[20, 20], [30, 30]], float)]
    assert G.line_intersects_polygon(thru, [SQUARE])
    assert G.line_intersects_polygon(inside, [SQUARE])
    assert not G.line_intersects_polygon(away, [SQUARE])
    assert G.line_within_polygon([np.array([[1, 1], [9, 9]], float)], [SQUARE])
    assert not G.line_within_polygon(thru, [SQUARE])
    # hole: crossing the hole ring breaks within
    assert not G.line_within_polygon([np.array([[1, 5], [9, 5]], float)], [HOLEY])
    assert G.line_within_polygon([np.array([[1, 1], [3, 1]], float)], [HOLEY])
    # a segment entirely inside the hole does not intersect the polygon
    assert not G.line_intersects_polygon(
        [np.array([[4.5, 4.5], [5.5, 5.5]], float)], [HOLEY]
    )


def test_geom_op_line_arms():
    wl = G.wkb_linestring(np.array([[-5, 5], [15, 5]], float))
    win = G.wkb_linestring(np.array([[1, 1], [9, 9]], float))
    wp = G.wkb_polygon([SQUARE[0]])
    assert G.geom_op("intersects", wl, wp)
    assert G.geom_op("crosses", wl, wp)
    assert not G.geom_op("within", wl, wp)
    assert G.geom_op("within", win, wp)
    assert G.geom_op("contains", wp, win)
    assert G.geom_op("disjoint", wl, G.wkb_polygon([SQUARE[0] + 100]))
    # line/line
    wv = G.wkb_linestring(np.array([[5, -5], [5, 20]], float))
    assert G.geom_op("intersects", wl, wv)
    assert G.geom_op("crosses", wl, wv)
    assert G.geom_op("equals", wl, G.wkb_linestring(np.array([[15, 5], [-5, 5]], float)))
    assert not G.geom_op("equals", wl, wv)
    # point/line
    on = G.wkb_point(5.0, 5.0)
    off = G.wkb_point(5.0, 6.0)
    assert G.geom_op("intersects", on, wl)
    assert G.geom_op("within", on, wl)
    assert G.geom_op("contains", wl, on)
    assert not G.geom_op("intersects", off, wl)
    # batch kernel routes line pairs through the scalar path
    out = G.geom_op_batch("intersects", [on, wl, off], [wl, wp, wl])
    assert list(out) == [True, True, False]


# ---------------------------------------------------------------------------
# shared SQL predicates == numpy kernels (DuckDB replay, no Spark needed)
# ---------------------------------------------------------------------------


def test_sql_predicates_match_kernels():
    import duckdb

    rng = np.random.RandomState(11)
    segs = rng.randint(-20000, 20001, size=(500, 4)).astype(np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE segs(x0 BIGINT, y0 BIGINT, x1 BIGINT, y1 BIGINT)")
    con.executemany("INSERT INTO segs VALUES (?, ?, ?, ?)", segs.tolist())

    box = (-5000, -3000, 7000, 9000)
    sql_hits = con.execute(
        f"SELECT {L.sql_seg_box(*box)} FROM segs"
    ).fetchnumpy()
    np_hits = G.segments_intersect_box(segs[:, :2], segs[:, 2:], *box)
    assert np.array_equal(next(iter(sql_hits.values())), np_hits)

    rings = [[(-8000, -8000), (9000, -8000), (9000, 9000), (-2000, 2000),
              (-8000, 9000)],
             [(0, -4000), (4000, -4000), (4000, 0), (0, 0)]]
    polys = [[np.asarray(r, float) for r in rings]]
    sql_hit = next(iter(con.execute(
        f"SELECT {L.sql_seg_poly_hit(rings)} FROM segs").fetchnumpy().values()))
    sql_within = next(iter(con.execute(
        f"SELECT {L.sql_seg_poly_within(rings)} FROM segs").fetchnumpy().values()))
    s0 = segs[:, :2].astype(float)
    s1 = segs[:, 2:].astype(float)
    in0 = G.points_in_polygon(s0[:, 0], s0[:, 1], polys)
    in1 = G.points_in_polygon(s1[:, 0], s1[:, 1], polys)
    crossed = G._segs_cross_polys(s0, s1, polys)
    assert np.array_equal(sql_hit, in0 | in1 | crossed)
    assert np.array_equal(sql_within, in0 & in1 & ~crossed)


# ---------------------------------------------------------------------------
# store + query paths vs brute force (sf0.001)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def seg_store(spark, sf_dir):
    pts = TB.geo_track_points(spark, sf_dir)
    segs = L.line_segments(pts)
    idx = L.index_line_segments(segs)
    return segs, idx, segs.toPandas()


def test_line_segments_shape(seg_store, spark, sf_dir):
    segs, _idx, pdf = seg_store
    n_tracks = TB.geo_track_points(spark, sf_dir).select("track_id").distinct().count()
    assert len(pdf) == n_tracks * (TB.TRACK_N_VERTS - 1)
    assert (pdf.groupby("track_id").size() == TB.TRACK_N_VERTS - 1).all()
    assert (pdf["minx_m"] == pdf[["x0", "x1"]].min(axis=1)).all()
    assert (pdf["maxy_m"] == pdf[["y0", "y1"]].max(axis=1)).all()


def test_query_bbox_lines_vs_brute(seg_store):
    _segs, idx, pdf = seg_store
    queries = [("tokyo", 138_600, 34_900, 140_500, 36_300),
               ("paris", 1_800, 48_300, 3_100, 49_400)]
    got = {
        (r["query_id"], r["track_id"]): r["n_segs_hit"]
        for r in L.query_bbox_lines(idx, queries).collect()
    }
    exp = {}
    s0 = pdf[["x0", "y0"]].to_numpy(np.int64)
    s1 = pdf[["x1", "y1"]].to_numpy(np.int64)
    for qid, mnx, mny, mxx, mxy in queries:
        hit = G.segments_intersect_box(s0, s1, mnx, mny, mxx, mxy)
        for tid, cnt in pdf.loc[hit].groupby("track_id").size().items():
            exp[(qid, tid)] = cnt
    assert got == exp and len(got) > 0


def test_query_polygon_lines_vs_brute(seg_store, spark):
    segs, idx, pdf = seg_store
    rings = [[(138_500, 34_800), (140_800, 34_800), (140_800, 36_500),
              (139_700, 35_600), (138_500, 36_500)],
             [(139_400, 35_100), (139_900, 35_100), (139_900, 35_450),
              (139_400, 35_450)]]
    sizes = segs.groupBy("track_id").agg(F.count("*").alias("n_segs"))
    got = {
        (r["query_id"], r["track_id"]): r["n_segs_hit"]
        for r in L.query_polygon_lines(
            idx,
            [("i", rings, "INTERSECTS"), ("w", rings, "WITHIN")],
            track_sizes=sizes,
        ).collect()
    }
    polys = [[np.asarray(r, float) for r in rings]]
    s0 = pdf[["x0", "y0"]].to_numpy(float)
    s1 = pdf[["x1", "y1"]].to_numpy(float)
    in0 = G.points_in_polygon(s0[:, 0], s0[:, 1], polys)
    in1 = G.points_in_polygon(s1[:, 0], s1[:, 1], polys)
    crossed = G._segs_cross_polys(s0, s1, polys)
    exp = {}
    hit = in0 | in1 | crossed
    for tid, cnt in pdf.loc[hit].groupby("track_id").size().items():
        exp[("i", tid)] = cnt
    within = in0 & in1 & ~crossed
    nseg = pdf.groupby("track_id").size()
    for tid, cnt in pdf.loc[within].groupby("track_id").size().items():
        if cnt == nseg[tid]:
            exp[("w", tid)] = cnt
    assert got == exp and any(k[0] == "w" for k in got)


def test_wkb_consumer_roundtrip(seg_store, spark):
    """tracks_to_wkb → segments_from_wkb reproduces the segment table —
    the codec-consumer path shapefile polylines ride."""
    segs, _idx, pdf = seg_store
    sample_ids = sorted(pdf["track_id"].unique())[:50]
    sample = segs.filter(F.col("track_id").isin([int(i) for i in sample_ids]))
    back = L.segments_from_wkb(L.tracks_to_wkb(sample)).toPandas()
    a = (pdf[pdf.track_id.isin(sample_ids)]
         .sort_values(["track_id", "seg_j"]).reset_index(drop=True))
    b = back.sort_values(["track_id", "seg_j"]).reset_index(drop=True)
    for c in ("x0", "y0", "x1", "y1", "minx_m", "maxy_m"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_shapefile_polyline_to_line_store(spark):
    """SHP polyline records → WKB → segments_from_wkb → queryable."""
    from geowave_spark.sources import shapefile as SHP

    parts = [np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 1.0]]),
             np.array([[10.0, 10.0], [11.0, 11.0]])]
    wkb = SHP.shp_record_wkb(SHP.SHP_POLYLINE, parts)
    df = spark.createDataFrame([(7, bytearray(wkb))], "track_id long, wkb binary")
    segs = L.segments_from_wkb(df).collect()
    assert len(segs) == 3  # 2 + 1 segments across the two parts
    assert segs[0]["x0"] == 1000 and segs[0]["y1"] == 2000
    idx = L.index_line_segments(spark.createDataFrame([r.asDict() for r in segs]))
    out = L.query_bbox_lines(idx, [("q", 0, 0, 2_500, 2_500)]).collect()
    assert [(r["track_id"], r["n_segs_hit"]) for r in out] == [(7, 2)]


def test_lines_cql_query(seg_store, spark):
    """CQL string surface over the line store: BBOX and INTERSECTS route
    to the exact operators; OR group unions with max-count dedup; bad
    clauses raise loudly."""
    from geowave_spark.plans.cql import lines_cql_query

    _segs, idx, pdf = seg_store
    cql = ("BBOX(geom, 138.6, 34.9, 140.5, 36.3) OR "
           "INTERSECTS(geom, POLYGON((2.0 48.4, 3.0 48.4, 3.0 49.3, "
           "2.35 48.9, 2.0 49.3)))")
    got = {(r["track_id"], r["n_segs_hit"])
           for r in lines_cql_query(idx, cql).collect()}

    s0 = pdf[["x0", "y0"]].to_numpy(np.int64)
    s1 = pdf[["x1", "y1"]].to_numpy(np.int64)
    box_hit = G.segments_intersect_box(s0, s1, 138_600, 34_900,
                                       140_500, 36_300)
    rings = [np.array([[2_000, 48_400], [3_000, 48_400], [3_000, 49_300],
                       [2_350, 48_900], [2_000, 49_300]], float)]
    polys = [rings]
    in0 = G.points_in_polygon(s0[:, 0].astype(float), s0[:, 1].astype(float), polys)
    in1 = G.points_in_polygon(s1[:, 0].astype(float), s1[:, 1].astype(float), polys)
    crossed = G._segs_cross_polys(s0.astype(float), s1.astype(float), polys)
    poly_hit = in0 | in1 | crossed
    exp = {}
    for hit in (box_hit, poly_hit):
        for tid, cnt in pdf.loc[hit].groupby("track_id").size().items():
            exp[tid] = max(exp.get(tid, 0), cnt)
    assert got == set(exp.items()) and got

    import pytest as _pt

    with _pt.raises(ValueError, match="DWITHIN"):
        lines_cql_query(idx, "DWITHIN(geom, POINT(0 0), 100, milli_degrees)")
    with _pt.raises(ValueError, match="spatial clause"):
        lines_cql_query(idx, "track_id > 5")


def test_geom_op_batch_line_bucket_ops():
    """Vectorized line-vs-area bucket agrees with the scalar kernel across
    every vectorizable op, mixed with point rows in one batch."""
    wp = G.wkb_polygon([SQUARE[0]])
    lines = [
        G.wkb_linestring(np.array([[-5, 5], [15, 5]], float)),   # crosses
        G.wkb_linestring(np.array([[1, 1], [9, 9]], float)),     # within
        G.wkb_linestring(np.array([[20, 20], [30, 30]], float)),  # disjoint
        G.wkb_multilinestring([np.array([[1, 1], [2, 2]], float),
                               np.array([[20, 20], [30, 30]], float)]),
    ]
    for op in ("intersects", "disjoint", "within", "crosses", "contains",
               "covers"):
        a = lines + [G.wkb_point(5.0, 5.0)]
        b = [wp] * len(a)
        batch = G.geom_op_batch(op, a, b)
        scalar = [G.geom_op(op, x, wp) for x in a]
        assert list(batch) == scalar, op
        # and the flipped orientation (polygon on the A side)
        batch_f = G.geom_op_batch(op, b, a)
        scalar_f = [G.geom_op(op, wp, x) for x in a]
        assert list(batch_f) == scalar_f, op


def test_line_query_plan_has_no_python_eval(seg_store):
    """The exact line refine is pure Catalyst integer arithmetic — no
    Python worker anywhere in the query plan (the predicate SQL compiles
    through F.expr).  Regression guard for the zero-UDF hot path."""
    _segs, idx, _pdf = seg_store
    for df in (
        L.query_bbox_lines(idx, [("q", 138_600, 34_900, 140_500, 36_300)]),
        L.query_polygon_lines(
            idx, [("p", [[(0, 0), (10_000, 0), (10_000, 10_000)]],
                   "INTERSECTS")],
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
