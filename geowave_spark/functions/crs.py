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
# Generic transformer: built-in closed forms first, pyproj hook otherwise
# ---------------------------------------------------------------------------


def _norm(crs: str) -> str:
    return crs.upper().replace(" ", "")


def get_transformer(src_crs: str, dst_crs: str = "EPSG:4326"):
    """Return f(x, y) -> (x', y') vectorized over numpy arrays.

    EPSG:4326 and EPSG:3857 are built in (closed form, no deps); any other
    pair needs pyproj — if absent, raises with a clear message (the
    production hook: ``pip install pyproj`` enables every EPSG code)."""
    s, d = _norm(src_crs), _norm(dst_crs)
    if s == d:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if (s, d) == ("EPSG:3857", "EPSG:4326"):
        return merc_inverse
    if (s, d) == ("EPSG:4326", "EPSG:3857"):
        return merc_forward
    try:
        from pyproj import Transformer  # gated: absent in this sandbox
    except ImportError as e:
        raise NotImplementedError(
            f"CRS pair {src_crs}->{dst_crs} needs pyproj (built-in closed "
            "forms cover EPSG:4326<->EPSG:3857)"
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

    EPSG:3857 stays pure JVM column math; other CRS route through a
    pyproj pandas UDF (Arrow-batched) when pyproj is available."""
    s = _norm(crs)
    if s == "EPSG:4326":
        return df.withColumn(lon_col, F.col(x_col)).withColumn(lat_col, F.col(y_col))
    if s == "EPSG:3857":
        lon, lat = merc_inverse_cols(F.col(x_col), F.col(y_col))
        return df.withColumn(lon_col, lon).withColumn(lat_col, lat)
    try:
        import pandas as pd
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
            f"ingest from {crs} needs pyproj (EPSG:3857 is built in)"
        ) from e
