"""Bit-parity of the JVM column kernels (functions/cols.py) against the
numpy definitional kernels (functions/cells.py).

The hot ingest/query path runs entirely in whole-stage codegen; these tests
pin it to the oracle implementation the rest of the suite verifies against
(mirrors the reference's SFC encode unit tests, ZOrderSFCTest.java)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(11)
    n = 5000
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
            "lon_m": rng.integers(-180_000, 180_000, n),
            "lat_m": rng.integers(-90_000, 90_000, n),
        }
    )
    # boundary cases
    edge = pd.DataFrame(
        {
            "lon": [-180.0, 179.999999, 0.0, 180.0],
            "lat": [-90.0, 89.999999, 0.0, 90.0],
            "lon_m": [-180_000, 179_999, 0, 179_999],
            "lat_m": [-90_000, 89_999, 0, 89_999],
        }
    )
    pdf = pd.concat([pdf, edge], ignore_index=True)
    return pdf, spark.createDataFrame(pdf)


@pytest.mark.parametrize("res", [0, 1, 7, 15, 29])
def test_encode_parity(pts, res):
    pdf, df = pts
    got = df.select(X.cell_encode_col(F.col("lon"), F.col("lat"), res).alias("c")).toPandas()
    want = C.encode(pdf.lon.to_numpy(), pdf.lat.to_numpy(), res)
    assert (got["c"].to_numpy() == want).all()


@pytest.mark.parametrize("res", [0, 4, 12, 29])
def test_encode_milli_parity(pts, res):
    pdf, df = pts
    got = df.select(
        X.cell_encode_milli_col(F.col("lon_m"), F.col("lat_m"), res).alias("c")
    ).toPandas()
    want = C.encode_milli(pdf.lon_m.to_numpy(), pdf.lat_m.to_numpy(), res)
    assert (got["c"].to_numpy() == want).all()


@pytest.mark.parametrize("parent_res", [0, 4, 13, 29])
def test_parent_parity(pts, spark, parent_res):
    pdf, _ = pts
    cells = C.encode(pdf.lon.to_numpy(), pdf.lat.to_numpy(), 29)
    dfc = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = dfc.select(X.parent_col(F.col("cell"), parent_res).alias("p")).toPandas()
    want = C.parent(cells, parent_res)
    assert (got["p"].to_numpy() == want).all()


def test_tier_extent_parity(spark):
    rng = np.random.default_rng(3)
    ex = np.concatenate(
        [
            rng.integers(1, 400_000, 3000),
            2 ** np.arange(0, 19),        # exact powers of two (boundaries)
            2 ** np.arange(1, 19) - 1,
            [0, 1, 360_000, 180_000, 359_999, 180_001],
        ]
    ).astype(np.int64)
    ey = np.roll(ex, 7)
    df = spark.createDataFrame(pd.DataFrame({"ex": ex, "ey": ey}))
    got = df.select(X.tier_extent_milli_col(F.col("ex"), F.col("ey")).alias("t")).toPandas()
    want = C.tier_select_extent_milli(ex, ey)
    assert (got["t"].to_numpy() == want).all()


def test_pack_col_variable_res(spark):
    rng = np.random.default_rng(5)
    res = rng.integers(0, 30, 2000).astype(np.int64)
    ix = rng.integers(0, 1 << 29, 2000).astype(np.int64) & ((1 << res) - 1)
    iy = rng.integers(0, 1 << 29, 2000).astype(np.int64) & ((1 << res) - 1)
    df = spark.createDataFrame(pd.DataFrame({"res": res, "ix": ix, "iy": iy}))
    got = df.select(X.pack_col(F.col("ix"), F.col("iy"), F.col("res")).alias("c")).toPandas()
    want = C.pack(res, ix, iy)
    assert (got["c"].to_numpy() == want).all()


def test_quadkey_col_closed_form(spark):
    """Quadkey digits: MSB-first (x-bit + 2*y-bit); level 0 = ''; per-row
    variable level; known Bing example (x=3, y=5, z=3 -> '213')."""
    from pyspark.sql import functions as F

    from geowave_spark.functions import cols as X

    rows = [(3, 5, 3), (0, 0, 0), (1, 0, 1), (0, 1, 1), (1, 1, 2), (7, 7, 3)]
    df = spark.createDataFrame(rows, "ix long, iy long, level long")
    got = {
        (r.ix, r.iy, r.level): r.qk
        for r in df.select(
            "ix", "iy", "level",
            X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level")).alias("qk"),
        ).collect()
    }
    assert got == {
        (3, 5, 3): "213",
        (0, 0, 0): "",
        (1, 0, 1): "1",
        (0, 1, 1): "2",
        (1, 1, 2): "03",
        (7, 7, 3): "333",
    }


def test_quadkey_col_never_truncates(spark):
    """A level beyond max_level fails fast instead of silently emitting a
    truncated key."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import SparkRuntimeException

    from geowave_spark.functions import cols as X

    df = spark.createDataFrame([(1, 1, 5)], "ix long, iy long, level long")
    q = df.select(
        X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level"), max_level=4)
    )
    with pytest.raises(SparkRuntimeException, match="never truncate"):
        q.collect()
    ok = df.select(
        X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level"), max_level=5)
        .alias("qk")
    ).collect()
    assert ok[0].qk == "00003"


def test_quadkey_col_random_batch_vs_python(spark):
    """500 random (ix, iy, level) triples vs an independent pure-python
    digit construction — one Spark job, full [0, MAX_RES] level range."""
    import numpy as np
    from pyspark.sql import functions as F

    from geowave_spark.functions import cells as C
    from geowave_spark.functions import cols as X

    rng = np.random.default_rng(20260819)
    lv = rng.integers(0, C.MAX_RES + 1, size=500)
    ix = np.array([rng.integers(0, 1 << l) if l else 0 for l in lv])
    iy = np.array([rng.integers(0, 1 << l) if l else 0 for l in lv])

    def py_qk(x, y, l):
        return "".join(
            str(((x >> s) & 1) + 2 * ((y >> s) & 1))
            for s in range(l - 1, -1, -1)
        )

    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(ix, iy, lv)],
        "ix long, iy long, level long",
    )
    got = df.select(
        "ix", "iy", "level",
        X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level")).alias("qk"),
    ).collect()
    for r in got:
        assert r.qk == py_qk(r.ix, r.iy, r.level), (r.ix, r.iy, r.level)


def test_quadkey_col_null_and_negative_level(spark):
    """NULL level -> NULL key (matches NULL ix/iy concat propagation);
    negative level fails fast like the over-max case."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import SparkRuntimeException

    from geowave_spark.functions import cols as X

    df = spark.createDataFrame([(1, 1, None)], "ix long, iy long, level long")
    r = df.select(
        X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level")).alias("qk")
    ).collect()
    assert r[0].qk is None

    neg = spark.createDataFrame([(1, 1, -1)], "ix long, iy long, level long")
    with pytest.raises(SparkRuntimeException, match="never truncate"):
        neg.select(
            X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level"))
        ).collect()
