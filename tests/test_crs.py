"""CRS transforms: closed-form Web Mercator round trips, JVM/numpy parity,
ingest-side reprojection, pyproj gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import crs as CRS


def test_merc_roundtrip_numpy():
    lon = np.linspace(-179.9, 179.9, 101)
    lat = np.linspace(-85.0, 85.0, 101)
    x, y = CRS.merc_forward(lon, lat)
    lon2, lat2 = CRS.merc_inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_merc_known_point():
    # equator/prime meridian maps to origin; 180deg to pi*R
    x, y = CRS.merc_forward(0.0, 0.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    x, _ = CRS.merc_forward(180.0, 0.0)
    assert abs(float(x) - np.pi * CRS.WEB_MERCATOR_R) < 1e-3


def test_merc_jvm_matches_numpy(spark):
    lon = np.linspace(-170, 170, 200)
    lat = np.linspace(-80, 80, 200)
    x, y = CRS.merc_forward(lon, lat)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    lo, la = CRS.merc_inverse_cols(F.col("x"), F.col("y"))
    got = df.select(lo.alias("lon"), la.alias("lat")).toPandas()
    assert np.allclose(got.lon.to_numpy(), lon, atol=1e-9)
    assert np.allclose(got.lat.to_numpy(), lat, atol=1e-9)


def test_with_wgs84_ingest_3857(spark):
    lon = np.array([-73.985, 2.352, 139.692])
    lat = np.array([40.758, 48.857, 35.690])
    x, y = CRS.merc_forward(lon, lat)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    out = CRS.with_wgs84(df, "x", "y", "EPSG:3857").toPandas()
    assert np.allclose(out.lon.to_numpy(), lon, atol=1e-9)
    assert np.allclose(out.lat.to_numpy(), lat, atol=1e-9)


def test_transform_box_bounds_all_interior_points():
    box = CRS.transform_box(-8_292_000, 4_900_000, -8_180_000, 5_035_000, "EPSG:3857")
    rng = np.random.default_rng(3)
    xs = rng.uniform(-8_292_000, -8_180_000, 500)
    ys = rng.uniform(4_900_000, 5_035_000, 500)
    lon, lat = CRS.merc_inverse(xs, ys)
    assert (lon >= box[0]).all() and (lon <= box[2]).all()
    assert (lat >= box[1]).all() and (lat <= box[3]).all()


def test_unknown_crs_requires_pyproj():
    has_pyproj = True
    try:
        import pyproj  # noqa: F401
    except ImportError:
        has_pyproj = False
    if has_pyproj:
        pytest.skip("pyproj installed: hook active")
    with pytest.raises(NotImplementedError, match="pyproj"):
        CRS.get_transformer("EPSG:2154", "EPSG:4326")  # Lambert-93: no closed form


# ---------------------------------------------------------------------------
# UTM (closed-form Krüger series) — checked against an INDEPENDENT numeric
# oracle: the meridian-arc integral M(φ) = a(1-e²)∫dφ/(1-e²sin²φ)^{3/2},
# which the transverse Mercator northing must equal (×k0) on the central
# meridian.  This validates A + the alpha series + the conformal-latitude
# machinery absolutely, not just as a self-consistent round trip.
# ---------------------------------------------------------------------------


def _meridian_arc(lat_deg: float) -> float:
    e2 = CRS.WGS84_F * (2.0 - CRS.WGS84_F)
    phi = np.linspace(0.0, np.radians(lat_deg), 2_000_001)
    integrand = CRS.WGS84_A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    return float(np.trapz(integrand, phi))


def test_utm_central_meridian_is_scaled_meridian_arc():
    for lat in (0.0, 15.0, 45.0, 70.0):
        e, n = CRS.utm_forward(CRS.utm_central_meridian(33), lat, 33)
        assert abs(float(e) - 500_000.0) < 1e-6
        assert abs(float(n) - CRS.UTM_K0 * _meridian_arc(lat)) < 1e-3


def test_utm_quarter_meridian_public_constant():
    """Quarter meridian of WGS84 ≈ 10 001 965.729 m (public geodesy
    constant) — pins the series absolutely at the pole."""
    assert abs(_meridian_arc(90.0) - 10_001_965.729) < 0.5


def test_utm_roundtrip_within_zone():
    rng = np.random.RandomState(33)
    cm = CRS.utm_central_meridian(33)
    lon = cm + rng.uniform(-3.0, 3.0, 500)
    lat = rng.uniform(-80.0, 84.0, 500)
    e, n = CRS.utm_forward(lon, lat, 33)
    lon2, lat2 = CRS.utm_inverse(e, n, 33)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_south_false_northing():
    e, n = CRS.utm_forward(CRS.utm_central_meridian(19), 0.0, 19, south=True)
    assert abs(float(n) - CRS.UTM_FN_SOUTH) < 1e-6
    lon, lat = CRS.utm_inverse(500_000.0, 10_000_000.0, 19, south=True)
    assert abs(float(lat)) < 1e-12


def test_utm_epsg_routing_and_box():
    assert CRS.parse_utm_epsg("EPSG:32633") == (33, False)
    assert CRS.parse_utm_epsg("EPSG:32719") == (19, True)
    assert CRS.parse_utm_epsg("EPSG:32661") is None  # UPS, not UTM
    assert CRS.parse_utm_epsg("EPSG:3857") is None
    f = CRS.get_transformer("EPSG:32633", "EPSG:4326")
    lon, lat = f(500_000.0, 0.0)
    assert abs(float(lon) - 15.0) < 1e-12 and abs(float(lat)) < 1e-12
    # envelope of a UTM box bounds all its interior points in 4326
    minx, miny, maxx, maxy = CRS.transform_box(
        400_000, 5_000_000, 600_000, 5_200_000, "EPSG:32633"
    )
    rng = np.random.RandomState(7)
    ex = rng.uniform(400_000, 600_000, 300)
    ey = rng.uniform(5_000_000, 5_200_000, 300)
    lon2, lat2 = CRS.utm_inverse(ex, ey, 33)
    assert (lon2 >= minx - 1e-9).all() and (lon2 <= maxx + 1e-9).all()
    assert (lat2 >= miny - 1e-9).all() and (lat2 <= maxy + 1e-9).all()


def test_with_wgs84_ingest_utm(spark):
    rng = np.random.RandomState(5)
    ex = rng.uniform(300_000, 700_000, 200)
    ey = rng.uniform(4_000_000, 6_000_000, 200)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(ex, ey)], "x double, y double"
    )
    got = CRS.with_wgs84(df, "x", "y", "EPSG:32614").select("lon", "lat").toPandas()
    lon, lat = CRS.utm_inverse(ex, ey, 14)
    np.testing.assert_allclose(np.sort(got["lon"].to_numpy()), np.sort(lon), atol=1e-12)
    np.testing.assert_allclose(np.sort(got["lat"].to_numpy()), np.sort(lat), atol=1e-12)
