"""KDE closed-form tests: one point scatters the exact outer product of the
reference's 7-tap kernel (GaussianFilter.majorSmoothingGaussianKernel);
out-of-bounds taps are dropped, never wrapped; reducer bands match the
rank/max formulas (AccumuloKDEReducer)."""

import numpy as np

from geowave_spark.operators import kde as OKDE

K = np.array(OKDE.KERNEL_FP, dtype=np.int64)


def test_single_point_outer_product(spark):
    # point at lon=0.5deg, lat=0.5deg, level 4: grid 32x16, bin centers well
    # inside bounds -> all 49 taps land
    df = spark.createDataFrame([(500, 500)], "lon_milli long, lat_milli long")
    got = OKDE.kde_grid(df, [4]).toPandas()
    assert len(got) == 49
    bx = (500 + 180_000) * 32 // 360_000
    by = (500 + 90_000) * 16 // 180_000
    want = {
        (bx + dx, by + dy): int(K[dx + 3] * K[dy + 3])
        for dx in range(-3, 4)
        for dy in range(-3, 4)
    }
    have = {(int(r.gx), int(r.gy)): int(r.weight_fp) for r in got.itertuples()}
    assert have == want
    # total mass = (sum K)^2 (kernel not exactly 1.0 -> 1001^2 fixed-point)
    assert got.weight_fp.sum() == int(K.sum()) ** 2


def test_boundary_taps_dropped_not_wrapped(spark):
    # point in the corner cell (0,0) at level 3: taps with gx<0 or gy<0 drop
    df = spark.createDataFrame(
        [(-179_990, -89_990)], "lon_milli long, lat_milli long"
    )
    got = OKDE.kde_grid(df, [3]).toPandas()
    assert len(got) == 16  # only dx,dy in [0,3]^2 survive
    assert (got.gx >= 0).all() and (got.gy >= 0).all()
    assert got.gx.max() == 3 and got.gy.max() == 3


def test_two_point_sum_and_bands(spark):
    # two points in the same cell: weights double; bands follow rank/max
    df = spark.createDataFrame(
        [(500, 500), (501, 501)], "lon_milli long, lat_milli long"
    )
    out = OKDE.kde_levels(OKDE.kde_grid(df, [4])).toPandas()
    assert len(out) == 49
    center = out.loc[out.weight_fp.idxmax()]
    assert int(center.weight_fp) == 2 * 383 * 383
    assert center.normalized == 1.0
    assert center.percentile == 1.0
    # percentile of the minimum-weight cells = RANK()/n with shared first rank
    nmin = (out.weight_fp == out.weight_fp.min()).sum()
    assert np.isclose(
        out[out.weight_fp == out.weight_fp.min()].percentile.unique(), 1.0 / 49
    ).all()
    assert nmin >= 1


def test_kde_tiles_single_point_placement(spark):
    """One point: its 49 posts land in the expected tile(s) at the expected
    pixels with band values (weight, normalized, percentile) matching the
    reducer formulas; row 0 is NORTH (java-raster flip)."""
    from geowave_spark.sources import png as PNG

    df = spark.createDataFrame([(500, 500)], "lon_milli long, lat_milli long")
    level, ts = 1, 16  # post grid = 2^(1+4+1) x 2^(1+4) = 64 x 32
    tiles = OKDE.kde_tiles(df, level, tile_size=ts).toPandas()
    # definitional posts from the oracle-exact grid
    posts = OKDE.kde_levels(OKDE.kde_grid(df, [level + 4])).toPandas()
    want_tiles = {(int(g.gx) // ts, int(g.gy) // ts) for g in posts.itertuples()}
    assert {(int(t.tile_x), int(t.tile_y)) for t in tiles.itertuples()} == want_tiles
    assert tiles.n_posts.sum() == 49
    by_tile = {(int(t.tile_x), int(t.tile_y)): PNG.raw_decode(bytes(t.tile_raw))
               for t in tiles.itertuples()}
    for g in posts.itertuples():
        tx, ty = int(g.gx) // ts, int(g.gy) // ts
        px, py = int(g.gx) % ts, ts - 1 - (int(g.gy) % ts)
        band = by_tile[(tx, ty)][py, px]
        assert abs(band[0] - g.weight) < 1e-6
        assert abs(band[1] - g.normalized) < 1e-6
        assert abs(band[2] - g.percentile) < 1e-6
    assert (tiles.max_norm <= 1.0).all()


def test_seasonal_weight_closed_form(spark):
    """ComparisonGaussianCellMapper semantics at pinned dates: season
    assignment and the quantized e^-(t*t) contribution."""
    import math

    from pyspark.sql import functions as F

    rows = [
        ("2024-01-01 00:00:00", True, 0),        # winter, year start: t=0
        ("2024-03-31 23:59:59", True, None),     # winter, ~Apr: t ~= 3
        ("2024-12-31 23:59:59", True, 0),        # winter, next-year bound
        ("2024-10-01 00:00:00", True, 300),      # winter ramp start: t=3
        ("2024-04-01 00:00:00", False, 300),     # April start: t=3 (ramp in)
        ("2024-04-30 23:59:59", False, 0),       # April end: t~=0
        ("2024-09-01 00:00:00", False, 0),       # Sept start: t=0 (ramp out)
        ("2024-07-15 12:00:00", False, 0),       # core summer: contrib 1
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in rows], "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    wtr, t_cent = OKDE.seasonal_weight_cols(F.col("ts"))
    got = df.select(wtr.alias("w"), t_cent.alias("t")).collect()
    for (s, want_w, want_t), r in zip(rows, got):
        assert r.w == want_w, s
        if want_t is not None:
            assert r.t == want_t, s
        else:
            assert r.t >= 299, s
    # table endpoints pin the exp definition
    assert OKDE.SEASON_PPM[0] == 1_000_000
    assert OKDE.SEASON_PPM[300] == round(1e6 * math.exp(-9.0))


def test_kde_compare_seasonal_split(spark):
    """A cell fed only by July points has winter_fp=0 (and vice versa);
    combined is the percentile difference in (-1, 1)."""
    rows = [("2024-07-10 00:00:00", 500, 500)] * 3 + [
        ("2024-01-10 00:00:00", -90_500, -45_500)
    ] * 2
    df = spark.createDataFrame(rows, "s string, lon_milli long, lat_milli long")
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("s"))
    got = OKDE.kde_compare(df, [4], ts_col="ts").toPandas()
    assert ((got.combined > -1) & (got.combined < 1)).all()
    summer_cells = got[got.summer_fp > 0]
    winter_cells = got[got.winter_fp > 0]
    assert len(summer_cells) and (summer_cells.winter_fp == 0).all()
    assert len(winter_cells) and (winter_cells.summer_fp == 0).all()
    # July contributes ppm=1e6: cell under 3 stacked points carries
    # 3 * 383^2 * 1e6 at the center tap
    assert got.summer_fp.max() == 3 * 383 * 383 * 1_000_000
