"""Hilbert curve option (reference default curve, HilbertSFC.java) —
round-trip, known values, nesting (parent = d >> 2), locality, and
end-to-end bbox-query equivalence with the Morton default."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C


def test_known_order_res1():
    # res-1 Hilbert visits (0,0),(0,1),(1,1),(1,0) in order 0..3
    xs = np.array([0, 0, 1, 1])
    ys = np.array([0, 1, 1, 0])
    assert C.hilbert_xy2d(xs, ys, 1).tolist() == [0, 1, 2, 3]


@pytest.mark.parametrize("res", [1, 2, 3, 5, 10, 16])
def test_roundtrip(res):
    rng = np.random.default_rng(res)
    n = 1 << res
    ix = rng.integers(0, n, 500)
    iy = rng.integers(0, n, 500)
    d = C.hilbert_xy2d(ix, iy, res)
    assert d.min() >= 0 and d.max() < n * n
    jx, jy = C.hilbert_d2xy(d, res)
    assert (jx == ix).all() and (jy == iy).all()


def test_bijection_small():
    for res in (1, 2, 3, 4):
        n = 1 << res
        gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = C.hilbert_xy2d(gx.ravel(), gy.ravel(), res)
        assert sorted(d.tolist()) == list(range(n * n))


def test_adjacency_locality():
    """Consecutive Hilbert distances are grid neighbors (the locality
    property Z-order lacks — the reason the reference prefers Hilbert)."""
    res = 6
    n = 1 << res
    x, y = C.hilbert_d2xy(np.arange(n * n), res)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_parent_nesting():
    """Hilbert indices nest: the res-(r-1) index of a point equals its
    res-r index >> 2 — so the engine's bit-shift parent-key join works
    for Hilbert keys unchanged."""
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    for res in (5, 12, 20):
        child = C.encode_hilbert(lon, lat, res)
        parent = C.encode_hilbert(lon, lat, res - 1)
        d_child = child & int(C.COORD_MASK)
        d_parent = parent & int(C.COORD_MASK)
        assert (d_parent == (d_child >> 2)).all()


def test_bbox_query_curve_equivalence(spark, sf_dir):
    """End-to-end swap-in proof: a bbox query over a Hilbert-keyed index
    returns exactly the rows the Morton default returns."""
    from geowave_spark.sources import tables as TB

    geo = TB.geo_events(spark, sf_dir)
    box = (-74.5, 40.2, -73.5, 41.2)
    res = 12

    @F.pandas_udf("long")
    def hilb(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(C.encode_hilbert(lon.to_numpy(), lat.to_numpy(), res))

    data = geo.withColumn("hcell", hilb(F.col("lon"), F.col("lat")))
    cover = C.cover_bbox_hilbert(*box, res)
    cov = spark.createDataFrame(pd.DataFrame({"hcell": cover}))
    pre = data.join(F.broadcast(cov), "hcell")
    got = (
        pre.filter(
            (F.col("lon") >= box[0]) & (F.col("lon") <= box[2])
            & (F.col("lat") >= box[1]) & (F.col("lat") <= box[3])
        )
        .select("event_id")
        .toPandas()["event_id"]
        .sort_values()
        .tolist()
    )
    want = (
        geo.filter(
            (F.col("lon") >= box[0]) & (F.col("lon") <= box[2])
            & (F.col("lat") >= box[1]) & (F.col("lat") <= box[3])
        )
        .select("event_id")
        .toPandas()["event_id"]
        .sort_values()
        .tolist()
    )
    assert got == want
