"""Geometry kernel oracles: WKB round-trip, PIP against hand-constructed
polygons (convex, concave, holes, multipolygon), envelope×polygon, distance."""

import numpy as np

from geowave_spark.functions import geometry as G

SQUARE = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
# L-shape (concave): big square minus top-right quadrant
LSHAPE = [
    np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [5.0, 5.0], [5.0, 10.0], [0.0, 10.0]]
    )
]
# square with a square hole in the middle
HOLED = [
    np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
    np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]]),
]


def test_wkb_roundtrip_polygon():
    buf = G.wkb_polygon(HOLED)
    polys = G.polygon_rings(buf)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert np.allclose(polys[0][0][:-1], HOLED[0])


def test_wkb_roundtrip_multipolygon():
    buf = G.wkb_multipolygon([SQUARE, [HOLED[0] + 20.0]])
    polys = G.polygon_rings(buf)
    assert len(polys) == 2
    assert np.allclose(polys[1][0][:-1], HOLED[0] + 20.0)


def test_wkb_point():
    buf = G.wkb_point(3.5, -7.25)
    gtype, (x, y) = G.parse_wkb(buf)
    assert gtype == G.WKB_POINT and x == 3.5 and y == -7.25


def test_pip_convex():
    px = np.array([5.0, -1.0, 10.5, 0.5])
    py = np.array([5.0, 5.0, 5.0, 9.5])
    assert G.points_in_polygon(px, py, [SQUARE]).tolist() == [True, False, False, True]


def test_pip_concave():
    # (7,7) is in the notch (outside); (2,7) inside; (7,2) inside
    px = np.array([7.0, 2.0, 7.0])
    py = np.array([7.0, 7.0, 2.0])
    assert G.points_in_polygon(px, py, [LSHAPE]).tolist() == [False, True, True]


def test_pip_hole():
    px = np.array([5.0, 1.0, 4.5])
    py = np.array([5.0, 1.0, 3.0])
    # (5,5) in hole → out; (1,1) in shell → in; (4.5,3) below hole → in
    assert G.points_in_polygon(px, py, [HOLED]).tolist() == [False, True, True]


def test_pip_multipolygon():
    polys = [SQUARE, [SQUARE[0] + 100.0]]
    px = np.array([5.0, 105.0, 50.0])
    py = np.array([5.0, 105.0, 50.0])
    assert G.points_in_polygon(px, py, polys).tolist() == [True, True, False]


def test_pip_brute_force_agreement():
    """Randomized cross-check against an independent per-point scalar
    implementation (the role shapely would play if present)."""
    rng = np.random.default_rng(13)
    px = rng.uniform(-2, 12, 2000)
    py = rng.uniform(-2, 12, 2000)
    got = G.points_in_polygon(px, py, [LSHAPE])

    def scalar_pip(x, y, ring):
        inside = False
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if (y0 > y) != (y1 > y):
                xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                if x < xi:
                    inside = not inside
        return inside

    want = np.array([scalar_pip(x, y, LSHAPE[0]) for x, y in zip(px, py)])
    assert (got == want).all()


def test_envelope_intersects_polygon():
    polys = [SQUARE]
    # fully inside, overlapping edge, fully outside, envelope containing poly
    minx = np.array([2.0, 9.0, 20.0, -5.0])
    miny = np.array([2.0, 9.0, 20.0, -5.0])
    maxx = np.array([3.0, 12.0, 21.0, 15.0])
    maxy = np.array([3.0, 12.0, 21.0, 15.0])
    got = G.envelope_intersects_polygon(minx, miny, maxx, maxy, polys)
    assert got.tolist() == [True, True, False, True]
    # thin envelope crossing the polygon but with no corner inside and no
    # vertex inside it (pure edge-crossing case)
    got2 = G.envelope_intersects_polygon(
        np.array([-1.0]), np.array([4.0]), np.array([11.0]), np.array([4.5]), polys
    )
    assert got2.tolist() == [True]


def test_haversine_known():
    # one degree of longitude at the equator ≈ 111.19 km
    d = G.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111_195) < 200
    assert G.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0


def test_planar_wrap_dist():
    # wrap: 179.9E to 179.9W is 0.2 deg = 200 milli
    d2 = G.planar_wrap_dist2_milli(179_900, 0, -179_900, 0)
    assert d2 == 200 * 200
    d2b = G.planar_wrap_dist2_milli(0, 1000, 0, -1000)
    assert d2b == 2000 * 2000


def test_haversine_column_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geowave_spark.functions import geometry as G
    from geowave_spark.functions.udfs import haversine_m_col

    rng = np.random.default_rng(17)
    pdf = pd.DataFrame(
        {
            "lon1": rng.uniform(-180, 180, 2000),
            "lat1": rng.uniform(-89, 89, 2000),
            "lon2": rng.uniform(-180, 180, 2000),
            "lat2": rng.uniform(-89, 89, 2000),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            haversine_m_col(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
        )
        .toPandas()["d"]
        .to_numpy()
    )
    want = G.haversine_m(
        pdf.lon1.to_numpy(), pdf.lat1.to_numpy(), pdf.lon2.to_numpy(), pdf.lat2.to_numpy()
    )
    assert np.abs(got - want).max() < 1e-6  # metres; JVM vs numpy libm ulps


def test_segments_intersect_collinear_disjoint():
    """Regression: collinear DISJOINT segments must NOT intersect — the
    orientation-sign-product shortcut alone reports a phantom hit when all
    four orientations are zero (two polygon edges on the same line)."""
    import numpy as np

    from geowave_spark.functions.geometry import segments_intersect

    p0 = np.array([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 5.0]])
    p1 = np.array([[2.0, 0.0], [2.0, 0.0], [3.0, 0.0], [2.0, 5.0]])
    q_cases = [
        ((5.0, 0.0), (8.0, 0.0), False),   # collinear, disjoint
        ((2.0, 0.0), (8.0, 0.0), True),    # collinear, endpoint touch
        ((1.0, 0.0), (8.0, 0.0), True),    # collinear, overlapping
        ((1.0, -1.0), (1.0, 1.0), True),   # proper crossing
        ((1.0, 0.5), (1.0, 1.0), False),   # above, no touch
    ]
    for q0, q1, want in q_cases:
        got = bool(segments_intersect(p0[:1], p1[:1], np.array(q0), np.array(q1))[0])
        assert got is want, (q0, q1, got, want)


def test_polys_intersect_collinear_edges_disjoint():
    """Two triangles whose horizontal edges share a LINE but are far apart
    are disjoint (the pre-fix kernel said intersecting)."""
    import numpy as np

    from geowave_spark.functions import geometry as G

    def tri(cx, cy):
        return G.wkb_polygon(
            [np.array([[cx, cy - 1500], [cx + 2000, cy + 1500],
                       [cx - 2000, cy + 1500]])]
        )

    assert G.geom_op("intersects", tri(0, 0), tri(10000, 0)) is False
    assert G.geom_op("disjoint", tri(0, 0), tri(10000, 0)) is True
    # edge-on-edge exact touch still counts (closed semantics)
    assert G.geom_op("intersects", tri(0, 0), tri(0, 3000)) is True
    assert G.geom_op("intersects", tri(0, 0), tri(4000, 0)) is True
