"""CRS support: query- and ingest-side coordinate transforms.

The reference handles custom CRS end-to-end (GeometryUtils.java CRS
transforms; CustomCRSKDERasterResizeIT exercises a reprojected pipeline).
Re-expression:

* the INDEX is always geographic WGS84 (EPSG:4326) — one canonical grid,
  exactly like the reference's default spatial index;
* ingest-side: data arriving in a projected CRS gets lon/lat columns via
  closed-form JVM column math (Web Mercator built in — pure log/atan/exp,
  whole-stage codegen) or a pyproj-backed pandas UDF for arbitrary EPSG
  codes (gated behind an import-try: the sandbox has no pyproj; the
  interface and tests are real, the hook activates wherever pyproj is
  installed);
* query-side: query geometries in a foreign CRS are transformed
  driver-side (numpy/pyproj) before planning — the reference transforms
  the query constraint the same way (CQLQuery + GeometryUtils).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

WEB_MERCATOR_R = 6378137.0  # EPSG:3857 sphere radius (public constant)


# ---------------------------------------------------------------------------
# Closed-form EPSG:3857 <-> EPSG:4326 (spherical Web Mercator — public math)
# ---------------------------------------------------------------------------


def merc_forward(lon, lat):
    """numpy: lon/lat degrees → Web Mercator metres."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WEB_MERCATOR_R * np.radians(lon)
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def merc_inverse(x, y):
    """numpy: Web Mercator metres → lon/lat degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def merc_inverse_cols(x: Column, y: Column) -> tuple[Column, Column]:
    """JVM column form of :func:`merc_inverse` — codegen, no Python."""
    lon = F.degrees(x / F.lit(WEB_MERCATOR_R))
    lat = F.degrees(
        F.atan(F.exp(y / F.lit(WEB_MERCATOR_R))) * 2.0 - F.lit(math.pi / 2.0)
    )
    return lon, lat


def merc_forward_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    x = F.radians(lon) * F.lit(WEB_MERCATOR_R)
    y = F.log(F.tan(F.radians(lat) / 2.0 + F.lit(math.pi / 4.0))) * F.lit(
        WEB_MERCATOR_R
    )
    return x, y


# ---------------------------------------------------------------------------
# Closed-form UTM (WGS84 transverse Mercator, EPSG:326xx/327xx) — the CRS
# real Landsat/Sentinel scenes are delivered in (the reference's Landsat8
# RasterIngestRunner reprojects scene footprints to the geographic index
# the same way).  Krüger series in the third flattening n, order n^6
# (Karney, "Transverse Mercator with an accuracy of a few nanometers",
# J. Geod. 2011 — public math; sub-µm over a UTM zone's extent).
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0             # semi-major axis (public constant)
WGS84_F = 1.0 / 298.257223563   # flattening (public constant)
UTM_K0 = 0.9996
UTM_FE = 500_000.0
UTM_FN_SOUTH = 10_000_000.0

_E = math.sqrt(WGS84_F * (2.0 - WGS84_F))  # first eccentricity


def _kruger():
    n = WGS84_F / (2.0 - WGS84_F)  # third flattening
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    A = WGS84_A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    )
    return A, alpha, beta


_KRUGER_A, _ALPHA, _BETA = _kruger()
_J = np.arange(1, 7, dtype=np.float64)  # series index 1..6


def utm_central_meridian(zone: int) -> float:
    """Degrees; UTM zones are 6° wide, zone 1 spans 180°W..174°W."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return zone * 6.0 - 183.0


def utm_forward(lon, lat, zone: int, south: bool = False):
    """numpy: lon/lat degrees → UTM easting/northing metres (WGS84)."""
    lam = np.radians(np.asarray(lon, np.float64) - utm_central_meridian(zone))
    lam = (lam + np.pi) % (2 * np.pi) - np.pi  # wrap relative longitude
    phi = np.radians(np.asarray(lat, np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))  # conformal tan
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    a = np.asarray(_ALPHA)
    two_j_xi = 2.0 * _J * xi[..., None]
    two_j_eta = 2.0 * _J * eta[..., None]
    x = eta + (a * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(-1)
    y = xi + (a * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(-1)
    E = UTM_FE + UTM_K0 * _KRUGER_A * x
    N = (UTM_FN_SOUTH if south else 0.0) + UTM_K0 * _KRUGER_A * y
    return E, N


def utm_inverse(easting, northing, zone: int, south: bool = False):
    """numpy: UTM easting/northing metres → lon/lat degrees (WGS84)."""
    x = (np.asarray(easting, np.float64) - UTM_FE) / (UTM_K0 * _KRUGER_A)
    y = (
        np.asarray(northing, np.float64) - (UTM_FN_SOUTH if south else 0.0)
    ) / (UTM_K0 * _KRUGER_A)
    b = np.asarray(_BETA)
    two_j_y = 2.0 * _J * y[..., None]
    two_j_x = 2.0 * _J * x[..., None]
    xi = y - (b * np.sin(two_j_y) * np.cosh(two_j_x)).sum(-1)
    eta = x - (b * np.cos(two_j_y) * np.sinh(two_j_x)).sum(-1)
    lam = np.arctan2(np.sinh(eta), np.cos(xi))
    # conformal → geodetic latitude: atanh(s) = ψ + e·atanh(e·s), fixed
    # point in s = sinφ (contraction rate e² ≈ 0.0067 → ~1e-16 in 8 iters);
    # ψ = asinh(tan χ) with tan χ = sin ξ / √(sinh²η + cos²ξ)
    psi = np.arcsinh(np.sin(xi) / np.hypot(np.sinh(eta), np.cos(xi)))
    s = np.tanh(psi)
    for _ in range(8):
        s = np.tanh(psi + _E * np.arctanh(_E * s))
    lon = np.degrees(lam) + utm_central_meridian(zone)
    return lon, np.degrees(np.arcsin(s))


def parse_utm_epsg(code: str) -> tuple[int, bool] | None:
    """'EPSG:326NN'/'EPSG:327NN' → (zone, south) or None if not UTM/WGS84."""
    c = _norm(code)
    if c.startswith("EPSG:") and len(c) == 10:
        num = c[5:]
        if num.isdigit() and num[:3] in ("326", "327") and 1 <= int(num[3:]) <= 60:
            return int(num[3:]), num[:3] == "327"
    return None


# ---------------------------------------------------------------------------
# Generic transformer: built-in closed forms first, pyproj hook otherwise
# ---------------------------------------------------------------------------


def _norm(crs: str) -> str:
    return crs.upper().replace(" ", "")


def get_transformer(src_crs: str, dst_crs: str = "EPSG:4326"):
    """Return f(x, y) -> (x', y') vectorized over numpy arrays.

    EPSG:4326, EPSG:3857 and the 120 WGS84 UTM zones (EPSG:326xx north /
    327xx south) are built in (closed form, no deps); any other pair needs
    pyproj — if absent, raises with a clear message (the production hook:
    ``pip install pyproj`` enables every EPSG code)."""
    s, d = _norm(src_crs), _norm(dst_crs)
    if s == d:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if (s, d) == ("EPSG:3857", "EPSG:4326"):
        return merc_inverse
    if (s, d) == ("EPSG:4326", "EPSG:3857"):
        return merc_forward
    u_s, u_d = parse_utm_epsg(s), parse_utm_epsg(d)
    if u_s is not None and d == "EPSG:4326":
        return lambda x, y, _z=u_s: utm_inverse(x, y, _z[0], _z[1])
    if s == "EPSG:4326" and u_d is not None:
        return lambda x, y, _z=u_d: utm_forward(x, y, _z[0], _z[1])
    try:
        from pyproj import Transformer  # gated: absent in this sandbox
    except ImportError as e:
        raise NotImplementedError(
            f"CRS pair {src_crs}->{dst_crs} needs pyproj (built-in closed "
            "forms cover EPSG:4326 <-> EPSG:3857 and WGS84 UTM "
            "EPSG:326xx/327xx <-> EPSG:4326)"
        ) from e
    t = Transformer.from_crs(s, d, always_xy=True)
    return lambda x, y: t.transform(np.asarray(x), np.asarray(y))


def transform_box(minx, miny, maxx, maxy, src_crs: str, dst_crs: str = "EPSG:4326"):
    """Driver-side query-envelope transform (densified along the edges so a
    curved projected box still bounds correctly — GeometryUtils transforms
    densified geometry the same way)."""
    f = get_transformer(src_crs, dst_crs)
    n = 16
    ex = np.concatenate(
        [
            np.linspace(minx, maxx, n), np.full(n, maxx),
            np.linspace(maxx, minx, n), np.full(n, minx),
        ]
    )
    ey = np.concatenate(
        [
            np.full(n, miny), np.linspace(miny, maxy, n),
            np.full(n, maxy), np.linspace(maxy, miny, n),
        ]
    )
    tx, ty = f(ex, ey)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


def with_wgs84(
    df, x_col: str, y_col: str, crs: str, lon_col: str = "lon", lat_col: str = "lat"
):
    """Ingest-side: attach lon/lat columns from projected coordinates.

    EPSG:3857 stays pure JVM column math; WGS84 UTM zones run the
    closed-form Krüger series in an Arrow-batched pandas UDF (no deps);
    other CRS route through a pyproj pandas UDF when pyproj is
    available."""
    s = _norm(crs)
    if s == "EPSG:4326":
        return df.withColumn(lon_col, F.col(x_col)).withColumn(lat_col, F.col(y_col))
    if s == "EPSG:3857":
        lon, lat = merc_inverse_cols(F.col(x_col), F.col(y_col))
        return df.withColumn(lon_col, lon).withColumn(lat_col, lat)
    utm = parse_utm_epsg(s)
    if utm is not None:
        from pyspark.sql import types as T

        zone, south = utm

        @F.pandas_udf(T.StructType([
            T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())
        ]))
        def _utm_tf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            lon, lat = utm_inverse(x.to_numpy(), y.to_numpy(), zone, south)
            return pd.DataFrame({"lon": lon, "lat": lat})

        tf = _utm_tf(F.col(x_col), F.col(y_col))
        return df.withColumn(lon_col, tf["lon"]).withColumn(lat_col, tf["lat"])
    try:
        from pyproj import Transformer  # noqa: F401
        from pyspark.sql import types as T

        t = [None]

        @F.pandas_udf(T.StructType([
            T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())
        ]))
        def _tf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            from pyproj import Transformer as _T

            if t[0] is None:  # parse once per executor
                t[0] = _T.from_crs(s, "EPSG:4326", always_xy=True)
            lon, lat = t[0].transform(x.to_numpy(), y.to_numpy())
            return pd.DataFrame({"lon": lon, "lat": lat})

        tf = _tf(F.col(x_col), F.col(y_col))
        return df.withColumn(lon_col, tf["lon"]).withColumn(lat_col, tf["lat"])
    except ImportError as e:
        raise NotImplementedError(
            f"ingest from {crs} needs pyproj (EPSG:3857 and WGS84 UTM "
            "EPSG:326xx/327xx are built in)"
        ) from e
