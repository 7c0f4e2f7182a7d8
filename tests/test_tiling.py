"""Tiling/mosaic tests: PNG codec round trips, closed-form tile assignment,
mosaic merge pixel semantics (mirrors reference GeoWaveBasicRasterIT's
closed-form per-pixel expectations)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.operators import tiling as OTL
from geowave_spark.sources import png as PNG
from geowave_spark.sources import synthetic as SYN


def test_png_roundtrip_gray():
    pix = SYN.pixels_for(7, 64, 96)
    assert np.array_equal(PNG.png_decode(PNG.png_encode(pix)), pix)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    assert np.array_equal(PNG.png_decode(PNG.png_encode(pix)), pix)


def test_lossy_psnr_over_40db():
    pix = SYN.pixels_for(3, 256, 256)
    dec = PNG.decode_image(PNG.encode_image(pix, "jpeg"), "jpeg")
    assert PNG.psnr(pix, dec) >= 40.0
    # and deterministic
    assert np.array_equal(dec, PNG.decode_image(PNG.encode_image(pix, "jpeg")))


def test_synthetic_deterministic(spark):
    a = SYN.images(spark, 50, partitions=4).toPandas().sort_values("image_id")
    b = SYN.images(spark, 50, partitions=7).toPandas().sort_values("image_id")
    for col in ["image_id", "caption", "phash", "lon_milli", "minx_m"]:
        assert list(a[col]) == list(b[col])
    assert all(x == y for x, y in zip(a.bytes, b.bytes))


def test_image_bytes_decode_match_formula(spark):
    rows = SYN.images(spark, 9, partitions=2).collect()
    for r in rows:
        want = SYN.pixels_for(int(r.image_id[3:]), r.w, r.h)
        got = PNG.decode_image(bytes(r.bytes), r.fmt)
        if r.fmt == "png":
            assert np.array_equal(got, want)
        else:
            assert PNG.psnr(want, got) >= 40.0


def test_assign_tiles_native_level_rule(spark):
    imgs = SYN.images(spark, 200, partitions=4, with_bytes=False)
    assigned = OTL.assign_tiles(imgs)
    pdf = assigned.select("image_id", "half_m", "level", "tile_ix", "tile_iy", "minx_m", "miny_m", "maxx_m", "maxy_m").toPandas()
    # closed form: half extents {32..1024} → levels {11..6}
    want_level = {32: 11, 64: 10, 128: 9, 256: 8, 512: 7, 1024: 6}
    for r in pdf.itertuples():
        assert r.level == want_level[r.half_m], r
        # every tile must actually intersect the footprint (integer grid)
        n = 1 << r.level
        ix0 = (r.minx_m + 180000) * n // 360000
        ix1 = (r.maxx_m + 180000) * n // 360000
        iy0 = (r.miny_m + 90000) * n // 180000
        iy1 = (r.maxy_m + 90000) * n // 180000
        assert ix0 <= r.tile_ix <= ix1 and iy0 <= r.tile_iy <= iy1
    # explode factor ≤ 4 (tier rule)
    counts = pdf.groupby("image_id").size()
    assert counts.max() <= 4


def test_assign_tiles_pyramid(spark):
    imgs = SYN.images(spark, 20, partitions=2, with_bytes=False)
    assigned = OTL.assign_tiles(imgs, build_pyramid=True, min_pyramid_level=4)
    pdf = assigned.groupBy("image_id").agg(F.collect_set("level").alias("levels")).toPandas()
    for r in pdf.itertuples():
        levels = sorted(r.levels)
        assert levels[0] == 4 and levels == list(range(4, levels[-1] + 1))


def _mk_row(image_id, pix, fp, ts, fmt="png"):
    return {
        "image_id": image_id,
        "bytes": PNG.encode_image(pix, fmt),
        "fmt": fmt,
        "fp_minx": fp[0], "fp_miny": fp[1], "fp_maxx": fp[2], "fp_maxy": fp[3],
        "ts": pd.Timestamp(ts),
    }


def test_render_single_image_exact(spark):
    """One image exactly covering one tile at res 5: rendered tile ==
    nearest-neighbor upsample of the source (closed form)."""
    cell = int(C.pack(5, 17, 20)[()])
    tminx, tminy, tmaxx, tmaxy = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
    pix = SYN.pixels_for(5, 64, 64)
    row = _mk_row("a", pix, (tminx, tminy, tmaxx, tmaxy), "2020-01-01")
    row["tile_cell"] = cell
    sdf = spark.createDataFrame(pd.DataFrame([row]))
    out = OTL.render_tiles(sdf, resample="nearest").collect()[0]
    assert out.n_src == 1 and out.valid_frac == 1.0
    got = PNG.png_decode(bytes(out.tile_png))
    # expected: each source pixel repeated 4x (256/64)
    want = np.repeat(np.repeat(pix, 4, axis=0), 4, axis=1)
    assert np.array_equal(got, want)


def test_mosaic_latest_wins_nodata_fill(spark):
    """Two overlapping images: newer covers left half; older covers full
    tile.  Merged tile = newer on left, older on right (NoDataMergeStrategy)."""
    cell = int(C.pack(5, 9, 12)[()])
    tminx, tminy, tmaxx, tmaxy = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
    midx = (tminx + tmaxx) / 2
    old = _mk_row("old", np.full((32, 32), 50, np.uint8), (tminx, tminy, tmaxx, tmaxy), "2020-01-01")
    new = _mk_row("new", np.full((32, 32), 200, np.uint8), (tminx, tminy, midx, tmaxy), "2020-06-01")
    for r in (old, new):
        r["tile_cell"] = cell
    sdf = spark.createDataFrame(pd.DataFrame([old, new]))
    out = OTL.render_tiles(sdf).collect()[0]
    got = PNG.png_decode(bytes(out.tile_png))
    assert out.n_src == 2
    assert (got[:, :128] == 200).all(), "newer image must win on the left"
    assert (got[:, 128:] == 50).all(), "older fills NoData on the right"


def test_mosaic_order_is_explicit_not_task_order(spark):
    """Same two images delivered in reversed row order must merge
    identically (stable explicit ingest sequence)."""
    cell = int(C.pack(5, 9, 12)[()])
    tminx, tminy, tmaxx, tmaxy = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
    a = _mk_row("a", np.full((16, 16), 10, np.uint8), (tminx, tminy, tmaxx, tmaxy), "2020-01-01")
    b = _mk_row("b", np.full((16, 16), 99, np.uint8), (tminx, tminy, tmaxx, tmaxy), "2021-01-01")
    for r in (a, b):
        r["tile_cell"] = cell
    out1 = OTL.render_tiles(spark.createDataFrame(pd.DataFrame([a, b]))).collect()[0]
    out2 = OTL.render_tiles(spark.createDataFrame(pd.DataFrame([b, a]))).collect()[0]
    assert bytes(out1.tile_png) == bytes(out2.tile_png)
    assert (PNG.png_decode(bytes(out1.tile_png)) == 99).all()


def test_end_to_end_tiling_pipeline(spark):
    """images → assign → render: every tile decodes, valid_frac > 0."""
    imgs = SYN.images(spark, 60, partitions=4)
    assigned = OTL.assign_tiles(imgs)
    tiles = OTL.render_tiles(assigned).collect()
    assert len(tiles) > 0
    for t in tiles[:10]:
        pix = PNG.png_decode(bytes(t.tile_png))
        assert pix.shape == (256, 256)
        assert t.valid_frac > 0


def test_retile_coarser_closed_form(spark):
    """Four rendered children stitch into one parent tile whose quadrant
    means equal the children's 2x2 box means (RasterTileResize parity)."""
    import numpy as np
    import pandas as pd

    from geowave_spark.functions import cells as C
    from geowave_spark.operators.tiling import TILE_SIZE, retile_coarser
    from geowave_spark.sources import png as PNG

    lvl, bx, by = 5, 6, 10  # children at (2bx+dx, 2by+dy)
    rows = []
    vals = {}
    for dx in (0, 1):
        for dy in (0, 1):
            ix, iy = 2 * bx + dx, 2 * by + dy
            v = 40 * (1 + dx + 2 * dy)
            vals[(dx, dy)] = v
            pix = np.full((TILE_SIZE, TILE_SIZE), v, dtype=np.uint8)
            rows.append(
                {
                    "tile_cell": int(C.pack(np.array([lvl]), np.array([ix]), np.array([iy]))[0]),
                    "level": lvl,
                    "tile_ix": ix,
                    "tile_iy": iy,
                    "tile_png": PNG.png_encode(pix),
                }
            )
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = retile_coarser(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.level, r.tile_ix, r.tile_iy, r.n_children) == (4, bx, by, 4)
    canvas = PNG.png_decode(r.tile_png)
    half = TILE_SIZE // 2
    # row 0 is NORTH → child dy=1 occupies the top half
    assert (canvas[:half, :half] == vals[(0, 1)]).all()
    assert (canvas[:half, half:] == vals[(1, 1)]).all()
    assert (canvas[half:, :half] == vals[(0, 0)]).all()
    assert (canvas[half:, half:] == vals[(1, 0)]).all()


def test_overview_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from geowave_spark.operators import tiling as OTL
    from geowave_spark.sources import synthetic as SYN

    imgs = SYN.images(spark, n=120, partitions=4)
    tiles = OTL.render_tiles(OTL.assign_tiles(imgs, level=6))
    ov = OTL.overview_stats(tiles).collect()
    assert len(ov) == 1 and ov[0]["level"] == 6
    assert ov[0]["n_tiles"] > 0 and ov[0]["total_contributions"] >= 120


def test_assign_tiles_explicit_level_full_cover(spark):
    """A footprint spanning >4 cells/dim at an explicit fine level must emit
    its FULL cover — no silent truncation (reference mosaic walk emits every
    intersecting tile, MosaicPerPyramidLevelBuilder.convert)."""
    # world cell at level 7 = 2812.5 milli lon x 1406.25 milli lat; a
    # 20000-milli-wide footprint spans 8 lon cells and 15 lat cells.
    fp = spark.createDataFrame(
        [(1, -10_000, -10_000, 10_000, 10_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    got = OTL.assign_tiles(fp, level=7).toPandas()
    n = 1 << 7
    ix0 = (-10_000 + 180_000) * n // 360_000
    ix1 = (10_000 + 180_000) * n // 360_000
    iy0 = (-10_000 + 90_000) * n // 180_000
    iy1 = (10_000 + 90_000) * n // 180_000
    want = {(ix, iy) for ix in range(ix0, ix1 + 1) for iy in range(iy0, iy1 + 1)}
    assert len(want) > 16  # genuinely above the old 4x4 cap
    assert {(int(r.tile_ix), int(r.tile_iy)) for r in got.itertuples()} == want


def test_assign_tiles_explicit_level_explode_guard(spark):
    """A cover above max_explode_cells fails fast instead of exploding."""
    fp = spark.createDataFrame(
        [(1, -170_000, -80_000, 170_000, 80_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="max_explode_cells"):
        OTL.assign_tiles(fp, level=12, max_explode_cells=1000).toPandas()


def test_assign_tiles_pyramid_native_coarser_than_min(spark):
    """Native level below min_pyramid_level: emit just the native level
    (Spark sequence would DESCEND and fabricate finer-than-native levels)."""
    # extent 100_000 milli -> native level 0 (world/2 cells already smaller)
    fp = spark.createDataFrame(
        [(1, -60_000, -60_000, 60_000, 60_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    got = OTL.assign_tiles(fp, build_pyramid=True, min_pyramid_level=3).toPandas()
    native = got.level.min()
    assert set(got.level) == {native}, "must not fabricate finer levels"


# ---------------------------------------------------------------------------
# Round 2: bilinear resample, multi-band, float rasters
# ---------------------------------------------------------------------------


def test_bilinear_closed_form_weights():
    """2x2 source onto a 4x4 tile: pinned bilinear weights (0.25/0.75 mix,
    edge clamp at the border, half-up rounding)."""
    src = np.array([[0, 100], [200, 60]], dtype=np.uint8)
    fp = (0.0, 0.0, 1.0, 1.0)
    canvas, mask = OTL._render_one(src, fp, fp, 4, method="bilinear")
    want = np.array(
        [
            [0, 25, 75, 100],
            [50, 60, 80, 90],
            [150, 130, 90, 70],
            [200, 165, 95, 60],
        ],
        dtype=np.uint8,
    )
    assert mask.all()
    assert np.array_equal(canvas, want)


def test_bilinear_invariances():
    """Bilinear preserves constants exactly, interpolates within the value
    range, and identity-size aligned sampling returns the source."""
    const = np.full((8, 8), 123, np.uint8)
    fp = (10.0, 10.0, 11.0, 11.0)
    bi, _ = OTL._render_one(const, fp, fp, 16, method="bilinear")
    assert (bi == 123).all()
    src = SYN.pixels_for(11, 8, 8)
    bi, _ = OTL._render_one(src, fp, fp, 16, method="bilinear")
    assert bi.min() >= src.min() and bi.max() <= src.max()
    # same size, same extent: centers align exactly -> identity
    same, _ = OTL._render_one(src, fp, fp, 8, method="bilinear")
    assert np.array_equal(same, src)


def test_render_rgb_mosaic_latest_wins(spark):
    cell = int(C.pack(5, 9, 12)[()])
    tminx, tminy, tmaxx, tmaxy = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
    midx = (tminx + tmaxx) / 2
    old = _mk_row("old", np.full((16, 16, 3), 40, np.uint8), (tminx, tminy, tmaxx, tmaxy), "2020-01-01")
    new = _mk_row("new", np.full((16, 16, 3), 220, np.uint8), (tminx, tminy, midx, tmaxy), "2020-06-01")
    for r in (old, new):
        r["tile_cell"] = cell
    out = OTL.render_tiles(spark.createDataFrame(pd.DataFrame([old, new]))).collect()[0]
    got = PNG.png_decode(bytes(out.tile_png))
    assert got.shape == (256, 256, 3)
    assert (got[:, :128] == 220).all() and (got[:, 128:] == 40).all()


def test_render_float_raster_nearest_rawf(spark):
    """Float coverage: auto-resample drops to NEAREST (reference rule) and
    the tile serializes via the RAWF container, round-tripping float32."""
    cell = int(C.pack(5, 17, 20)[()])
    b = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
    fp = tuple(b)
    src = (np.arange(64 * 64, dtype=np.float32) / 7.0).reshape(64, 64)
    row = {
        "image_id": "f", "tile_cell": cell,
        "bytes": PNG.raw_encode(src), "fmt": "raw",
        "fp_minx": fp[0], "fp_miny": fp[1], "fp_maxx": fp[2], "fp_maxy": fp[3],
        "ts": pd.Timestamp("2020-01-01"),
    }
    out = OTL.render_tiles(spark.createDataFrame(pd.DataFrame([row]))).collect()[0]
    got = PNG.decode_image(bytes(out.tile_png))
    assert got.dtype == np.float32 and got.shape == (256, 256)
    want = np.repeat(np.repeat(src, 4, axis=0), 4, axis=1)
    assert np.array_equal(got, want)


def test_retile_rgb(spark):
    """RGB children stitch into an RGB parent with per-band 2x2 means."""
    rows = []
    for (ix, iy), v in [((4, 6), 10), ((5, 6), 30), ((4, 7), 50), ((5, 7), 90)]:
        cell = int(C.pack(4, ix, iy)[()])
        rows.append({
            "tile_cell": cell, "level": 4, "tile_ix": ix, "tile_iy": iy,
            "tile_png": PNG.png_encode(np.full((256, 256, 3), v, np.uint8)),
        })
    out = OTL.retile_coarser(spark.createDataFrame(pd.DataFrame(rows))).collect()
    assert len(out) == 1
    got = PNG.png_decode(bytes(out[0].tile_png))
    assert got.shape == (256, 256, 3)
    assert (got[:128, :128] == 50).all()   # NW quadrant = child (4,7)
    assert (got[:128, 128:] == 90).all()   # NE = (5,7)
    assert (got[128:, :128] == 10).all()   # SW = (4,6)
    assert (got[128:, 128:] == 30).all()   # SE = (5,6)


def test_render_point_tiles_closed_form(spark):
    """Distributed render: two points, one pixel shared — intensities are
    255*count/max at the exact predicted pixels, tiles align with the
    square Morton tile grid."""
    # level 2, tile 16 -> res 6: pixel = grid cell at res 6
    rows = [(500, 500), (501, 501), (-90_000, -45_000)]
    df = spark.createDataFrame(rows, "lon_milli long, lat_milli long")
    out = OTL.render_point_tiles(df, level=2, tile_size=16).toPandas()
    n = 1 << 6
    def cell(lon, lat):
        return ((lon + 180_000) * n // 360_000, (lat + 90_000) * n // 180_000)
    c1, c3 = cell(500, 500), cell(-90_000, -45_000)
    assert c1 == cell(501, 501)  # first two points share a pixel
    tiles = {(int(t.tile_ix), int(t.tile_iy)): t for t in out.itertuples()}
    assert set(tiles) == {(c1[0] // 16, c1[1] // 16)} | {(c3[0] // 16, c3[1] // 16)}
    t1 = tiles[(c1[0] // 16, c1[1] // 16)]
    img = PNG.png_decode(bytes(t1.tile_png))
    px, py = c1[0] % 16, 15 - (c1[1] % 16)
    if (c1[0] // 16, c1[1] // 16) == (c3[0] // 16, c3[1] // 16):
        pytest.skip("fixture points unexpectedly share a tile")
    assert int(t1.max_count) == 2 and int(t1.n_points) == 2
    assert img[py, px] == 255
    assert img.sum() == 255  # everything else dark
