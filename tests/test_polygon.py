"""Polygon query golden tests: engine vs independent scalar brute force
(mirrors reference GeoWaveBasicSpatialVectorIT polygon-filter goldens)."""

import numpy as np
import pytest

from geowave_spark import registry as R
from geowave_spark.functions import geometry as G
from geowave_spark.operators import index as I
from geowave_spark.operators import polygon as OP
from geowave_spark.sources import tables as TB


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return I.index_points(TB.geo_events(spark, sf_dir), id_col="event_id").cache()


def scalar_pip(x, y, rings):
    """Independent per-point even-odd reference (not the engine kernel)."""
    inside = False
    for ring in rings:
        ring = np.asarray(ring)
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if (y0 > y) != (y1 > y):
                xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                if x < xi:
                    inside = not inside
    return inside


def brute(df_pd, rings):
    return {
        int(r.event_id)
        for r in df_pd.itertuples()
        if scalar_pip(r.lon, r.lat, rings)
    }


def test_convex_pentagon(spark, geo):
    pts = geo.select("event_id", "lon", "lat").toPandas()
    q = OP.PolygonQuery("pent", G.wkb_polygon([R.PENTAGON]), "INTERSECTS")
    got = {int(r.event_id) for r in OP.query_polygon(geo, [q]).collect()}
    assert got == brute(pts, [R.PENTAGON])
    assert len(got) > 0, "pentagon over NYC blob must hit hot rows"


def test_concave_with_hole(spark, geo):
    pts = geo.select("event_id", "lon", "lat").toPandas()
    q = OP.PolygonQuery("L", G.wkb_polygon(R.PARIS_LSHAPE), "INTERSECTS")
    got = {int(r.event_id) for r in OP.query_polygon(geo, [q]).collect()}
    assert got == brute(pts, R.PARIS_LSHAPE)
    assert len(got) > 0


def test_multipolygon(spark, geo):
    polys = [[R.PENTAGON], R.PARIS_LSHAPE]
    q = OP.PolygonQuery("mp", G.wkb_multipolygon(polys), "INTERSECTS")
    got = {int(r.event_id) for r in OP.query_polygon(geo, [q]).collect()}
    pts = geo.select("event_id", "lon", "lat").toPandas()
    want = brute(pts, [R.PENTAGON]) | brute(pts, R.PARIS_LSHAPE)
    assert got == want


def test_disjoint(spark, geo):
    n = geo.count()
    qi = OP.PolygonQuery("p", G.wkb_polygon([R.PENTAGON]), "INTERSECTS")
    qd = OP.PolygonQuery("p", G.wkb_polygon([R.PENTAGON]), "DISJOINT")
    ni = OP.query_polygon(geo, [qi]).count()
    nd = OP.query_polygon(geo, [qd]).count()
    assert ni + nd == n


def test_contains_points_empty(spark, geo):
    q = OP.PolygonQuery("p", G.wkb_polygon([R.PENTAGON]), "CONTAINS")
    assert OP.query_polygon(geo, [q]).count() == 0


def test_multiple_queries_one_call(spark, geo):
    qs = [
        OP.PolygonQuery("a", G.wkb_polygon([R.PENTAGON]), "INTERSECTS"),
        OP.PolygonQuery("b", G.wkb_polygon(R.PARIS_LSHAPE), "INTERSECTS"),
    ]
    out = OP.query_polygon(geo, qs).groupBy("query_id").count().collect()
    counts = {r.query_id: r["count"] for r in out}
    assert set(counts) == {"a", "b"} and all(v > 0 for v in counts.values())


def test_multi_query_single_scan_plan(spark, geo):
    """N convex queries plan as ONE scan of the data (broadcast cover
    union + one join, codegen refine) — not one branch per query; with a
    general (concave) polygon in the mix, exactly TWO branches total
    (codegen branch + one multi-polygon UDF branch), independent of N."""
    def pent(i):
        ring = R.PENTAGON + np.array([i * 3.0, 0.0])
        return OP.PolygonQuery(f"c{i}", G.wkb_polygon([ring]), "INTERSECTS")

    convex_only = OP.query_polygon(geo, [pent(i) for i in range(4)])
    plan = convex_only._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("BroadcastHashJoin") == 1

    mixed = OP.query_polygon(
        geo,
        [pent(i) for i in range(3)]
        + [
            OP.PolygonQuery("L", G.wkb_polygon(R.PARIS_LSHAPE), "INTERSECTS"),
            OP.PolygonQuery(
                "L2",
                G.wkb_polygon(
                    [np.asarray(R.PARIS_LSHAPE[0]) + np.array([0.5, -1.0])]
                ),
                "INTERSECTS",
            ),
        ],
    )
    mplan = mixed._jdf.queryExecution().executedPlan().toString()
    assert mplan.count("Union") == 1  # one two-branch union for the group
    # parity: grouped plan returns the same rows as per-query calls
    got = {
        (r["query_id"], r["event_id"])
        for r in mixed.select("query_id", "event_id").collect()
    }
    want = set()
    for q in [pent(i) for i in range(3)] + [
        OP.PolygonQuery("L", G.wkb_polygon(R.PARIS_LSHAPE), "INTERSECTS"),
        OP.PolygonQuery(
            "L2",
            G.wkb_polygon(
                [np.asarray(R.PARIS_LSHAPE[0]) + np.array([0.5, -1.0])]
            ),
            "INTERSECTS",
        ),
    ]:
        for r in (
            OP.query_polygon(geo, [q]).select("query_id", "event_id").collect()
        ):
            want.add((r["query_id"], r["event_id"]))
    assert got == want


def test_points_in_polygons_join_bruteforce(spark):
    """Large×large points-in-POLYGONS join vs scalar brute force — convex
    triangles AND a concave L-shape as polygon-table rows, integer milli
    coordinate contract."""
    import pandas as pd

    from geowave_spark.operators.join import points_in_polygons_join

    rng = np.random.RandomState(7)
    n = 400
    px = rng.randint(-50000, 50000, n).astype(np.int64)
    py = rng.randint(-30000, 30000, n).astype(np.int64)
    points = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(n), "lon_milli": px, "lat_milli": py})
    )

    tris = []
    rings = {}
    for i in range(12):
        cx, cy = int(px[i * 3]), int(py[i * 3])
        ring = np.array(
            [[cx, cy - 1500], [cx + 2000, cy + 1500], [cx - 2000, cy + 1500]],
            dtype=np.float64,
        )
        rings[i] = [ring]
        tris.append((i, G.wkb_polygon([ring])))
    # concave L-shape spanning many points (general even-odd path)
    L = np.array(
        [
            [-40000, -20000], [10000, -20000], [10000, 0],
            [-15000, 0], [-15000, 20000], [-40000, 20000],
        ],
        dtype=np.float64,
    )
    rings[99] = [L]
    tris.append((99, G.wkb_polygon([L])))
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": [t[0] for t in tris], "wkb": [t[1] for t in tris]})
    )

    got = {
        (r["point_id"], r["poly_id"])
        for r in points_in_polygons_join(points, polys).collect()
    }

    want = set()
    for pid in range(n):
        for qid, rr in rings.items():
            if qid == 99:
                ok = scalar_pip(float(px[pid]), float(py[pid]), rr)
            else:
                ok = bool(
                    G.points_in_convex(
                        np.array([float(px[pid])]), np.array([float(py[pid])]),
                        rr[0],
                    )[0]
                )
            if ok:
                want.add((pid, qid))
    assert got == want and len(want) > 12  # every seed point self-matches


def test_envelopes_overlap_join_bruteforce(spark):
    """PBSM extent×extent overlap join: brute-force parity, res-invariance
    (grid resolution is a dial, not a semantic), duplicate-freeness, and
    the never-truncate guard."""
    import pandas as pd
    import pytest

    from geowave_spark.operators.join import envelopes_overlap_join

    rng = np.random.RandomState(11)
    def mk(n, seed_off):
        cx = rng.randint(-160000, 160000, n)
        cy = rng.randint(-80000, 80000, n)
        hw = rng.randint(10, 1200, n)
        hh = rng.randint(10, 1200, n)
        return pd.DataFrame(
            {
                "id": np.arange(n) + seed_off,
                "minx_m": cx - hw, "miny_m": cy - hh,
                "maxx_m": cx + hw, "maxy_m": cy + hh,
            }
        )

    lp, rp = mk(150, 0), mk(400, 1000)
    left = spark.createDataFrame(lp).withColumnRenamed("id", "l_id")
    right = spark.createDataFrame(rp).withColumnRenamed("id", "r_id")

    def brute():
        out = set()
        for l in lp.itertuples():
            for r in rp.itertuples():
                if (
                    l.minx_m <= r.maxx_m and r.minx_m <= l.maxx_m
                    and l.miny_m <= r.maxy_m and r.miny_m <= l.maxy_m
                ):
                    out.add((l.id, r.id))
        return out

    want = brute()
    for res in (6, 9):
        rows = envelopes_overlap_join(left, right, res=res).collect()
        got = [(r["l_id"], r["r_id"]) for r in rows]
        assert set(got) == want
        assert len(got) == len(set(got))  # reporting-cell rule: no dups
        for r in rows:  # exact closed-bounds intersection extents
            assert r["inter_w_milli"] >= 1 and r["inter_h_milli"] >= 1

    # guard: a world-spanning envelope at a fine grid must FAIL, not
    # silently truncate its cover
    wide = spark.createDataFrame(
        pd.DataFrame(
            {"l_id": [0], "minx_m": [-179000], "miny_m": [-89000],
             "maxx_m": [179000], "maxy_m": [89000]}
        )
    )
    with pytest.raises(Exception, match="max_cells_per_row"):
        envelopes_overlap_join(
            wide, right, res=9, max_cells_per_row=64
        ).collect()

    # id-collision misuse fails fast
    with pytest.raises(ValueError, match="alias"):
        envelopes_overlap_join(left.withColumnRenamed("l_id", "id"),
                               right.withColumnRenamed("r_id", "id"),
                               left_id="id", right_id="id")


def test_points_in_polygons_join_empty_polygon_table(spark):
    """A filtered-to-empty polygon side returns zero pairs with the real
    schema, not a plan-build crash."""
    import pandas as pd

    from geowave_spark.operators.join import points_in_polygons_join

    points = spark.createDataFrame(
        pd.DataFrame({"point_id": [1, 2], "lon_milli": [0, 5],
                      "lat_milli": [0, 5]})
    )
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": pd.array([], dtype="int64"),
                      "wkb": pd.array([], dtype=object)}),
        "poly_id long, wkb binary",
    )
    out = points_in_polygons_join(points, polys)
    assert out.columns == ["point_id", "poly_id", "lon_milli", "lat_milli"]
    assert out.count() == 0


def test_geometries_intersect_join_bruteforce(spark):
    """polygon×polygon join vs the scalar kernel brute force — triangles
    on one side, a mix of triangles and concave L-shapes on the other."""
    import pandas as pd

    from geowave_spark.operators.join import geometries_intersect_join

    rng = np.random.RandomState(23)

    def tri(cx, cy):
        return G.wkb_polygon(
            [np.array([[cx, cy - 1500], [cx + 2000, cy + 1500],
                       [cx - 2000, cy + 1500]], dtype=np.float64)]
        )

    def ell(cx, cy):
        return G.wkb_polygon(
            [np.array([[cx, cy], [cx + 5000, cy], [cx + 5000, cy + 2000],
                       [cx + 2000, cy + 2000], [cx + 2000, cy + 5000],
                       [cx, cy + 5000]], dtype=np.float64)]
        )

    lx = rng.randint(-40000, 40000, 60)
    ly = rng.randint(-25000, 25000, 60)
    lw = [tri(int(x), int(y)) for x, y in zip(lx, ly)]
    rx = rng.randint(-40000, 40000, 90)
    ry = rng.randint(-25000, 25000, 90)
    rw = [
        tri(int(x), int(y)) if i % 2 == 0 else ell(int(x), int(y))
        for i, (x, y) in enumerate(zip(rx, ry))
    ]
    left = spark.createDataFrame(
        pd.DataFrame({"l_id": np.arange(60), "wkb": lw})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"r_id": np.arange(90), "wkb": rw})
    )
    got = {
        (r["l_id"], r["r_id"])
        for r in geometries_intersect_join(left, right, res=7).collect()
    }
    want = {
        (i, j)
        for i in range(60)
        for j in range(90)
        if G.geom_op("intersects", lw[i], rw[j])
    }
    assert got == want and len(want) > 0
    # duplicate-free output (reporting-cell rule carries through)
    rows = geometries_intersect_join(left, right, res=7).collect()
    assert len(rows) == len(got)
