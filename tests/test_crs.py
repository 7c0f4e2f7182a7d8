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
        CRS.get_transformer("EPSG:32633", "EPSG:4326")
