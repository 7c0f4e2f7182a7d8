"""Styled distributed render (reference DistributedRenderProcess.java:32-60
analogue): SLD rule list as Catalyst CASE, deterministic painter composite.
Numeric columns are oracle-checked in the registry (render_styled_tiles /
render_envelope_tiles EXTRA); here the PNG pixel path, painter order,
tile-border crossing, and the explode guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import tiling as OTL
from geowave_spark.sources.png import png_decode

TS = 64
LEVEL = 3  # res 9: world 512x512 px, pixel span 703.125 lon-milli


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "lon_milli", "lat_milli", "kind"])
    )


def _grid(lon_m, lat_m, res=9):
    n = 1 << res
    gx = min(max((lon_m + 180_000) * n // 360_000, 0), n - 1)
    gy = min(max((lat_m + 90_000) * n // 180_000, 0), n - 1)
    return gx, gy


RULES = lambda: [  # noqa: E731
    (F.col("kind") == "a", 0xFF0000, 1),
    (F.col("kind") == "b", 0x0000FF, 0),
]


def test_styled_marker_placement_and_png(spark):
    # one 3x3 red marker well inside a tile; one 1x1 blue point
    pa = (-179_000, -89_000)  # gx,gy = (1,2) -> tile (0,0), px (1,2)
    pb = (-170_000, -80_000)
    df = _pts(spark, [(1, *pa, "a"), (2, *pb, "b")])
    out = OTL.render_styled_tiles(df, LEVEL, RULES(), tile_size=TS).collect()
    tiles = {(r.tile_ix, r.tile_iy): r for r in out}
    gxa, gya = _grid(*pa)
    gxb, gyb = _grid(*pb)
    ta = tiles[(gxa // TS, gya // TS)]
    img = png_decode(bytes(ta.tile_png))
    # marker a: 3x3 red square centered on its pixel, row 0 = north
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            px, py = gxa % TS + dx, gya % TS + dy
            assert tuple(img[TS - 1 - py, px]) == (255, 0, 0)
    if (gxb // TS, gyb // TS) == (gxa // TS, gya // TS):
        assert tuple(img[TS - 1 - gyb % TS, gxb % TS]) == (0, 0, 255)
    assert ta.painted >= 9
    assert ta.sum_r >= 9 * 255


def test_styled_painter_order_max_wins(spark):
    # two coincident 1x1 points, different colors: higher event_id wins
    p = (10_000, 20_000)
    df = _pts(spark, [(1, *p, "b"), (2, *p, "b")])
    rules = [
        (F.col("event_id") == 1, 0x00FF00, 0),
        (F.col("event_id") == 2, 0x0000FF, 0),
    ]
    out = OTL.render_styled_tiles(df, LEVEL, rules, tile_size=TS).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.painted, r.sum_g, r.sum_b) == (1, 0, 255)  # id 2 painted last


def test_styled_marker_crosses_tile_border(spark):
    # a 3x3 marker whose center sits on a tile's max-x column paints the
    # neighbor tile's column 0
    res, n = 9, 512
    gx = TS - 1  # tile 0 last column
    lon_m = (gx * 360_000) // n - 180_000 + 1
    lat_m = (130 * 180_000) // n - 90_000 + 1  # gy=130: mid-tile row
    df = _pts(spark, [(7, lon_m, lat_m, "a")])
    out = {(r.tile_ix, r.tile_iy): r for r in
           OTL.render_styled_tiles(df, LEVEL, RULES(), tile_size=TS).collect()}
    gx2, gy2 = _grid(lon_m, lat_m)
    assert gx2 == gx
    left, right = (gx // TS, gy2 // TS), (gx // TS + 1, gy2 // TS)
    assert left in out and right in out
    assert out[left].painted == 6  # 2 columns x 3 rows
    assert out[right].painted == 3  # spillover column
    img = png_decode(bytes(out[right].tile_png))
    for dy in (-1, 0, 1):
        assert tuple(img[TS - 1 - (gy2 % TS + dy), 0]) == (255, 0, 0)


def _envs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["event_id", "minx_m", "miny_m", "maxx_m", "maxy_m", "half_m"]
        )
    )


def test_envelope_fill_and_stroke(spark):
    # rect spanning 4x3 px at level 4 (res 10: px span 351.5625 lon-milli)
    res, n = 10, 1024
    gx0, gy0 = 100, 200
    minx = (gx0 * 360_000) // n - 180_000 + 1
    miny = (gy0 * 180_000) // n - 90_000 + 1
    maxx = ((gx0 + 3) * 360_000) // n - 180_000 + 1
    maxy = ((gy0 + 2) * 180_000) // n - 90_000 + 1
    df = _envs(spark, [(5, minx, miny, maxx, maxy, 64)])
    rules = [(F.col("half_m") >= 0, 0x010203)]
    fill = OTL.render_envelope_tiles(df, 4, rules, mode="fill", tile_size=TS).collect()
    assert sum(r.painted for r in fill) == 4 * 3
    assert sum(r.sum_b for r in fill) == 12 * 3
    stroke = OTL.render_envelope_tiles(df, 4, rules, mode="stroke", tile_size=TS).collect()
    assert sum(r.painted for r in stroke) == 4 * 3 - 2  # perimeter of 4x3
    # overlap painter order: a later (higher-id) rect overpaints the first
    df2 = _envs(
        spark,
        [(1, minx, miny, maxx, maxy, 64), (9, minx, miny, maxx, maxy, 64)],
    )
    rules2 = [(F.col("event_id") == 1, 0xAA0000), (F.col("event_id") == 9, 0x0000AA)]
    fill2 = OTL.render_envelope_tiles(df2, 4, rules2, mode="fill", tile_size=TS).collect()
    assert sum(r.sum_r for r in fill2) == 0
    assert sum(r.sum_b for r in fill2) == 12 * 0xAA


def test_envelope_guard_raises_past_tile_bound(spark):
    # a world-spanning envelope at a fine level exceeds 64 tiles per axis
    df = _envs(spark, [(1, -179_000, -89_000, 179_000, 89_000, 1024)])
    rules = [(F.col("half_m") >= 0, 0x123456)]
    with pytest.raises(Exception, match="more than 64 tiles"):
        OTL.render_envelope_tiles(df, 8, rules, tile_size=TS).collect()


def test_styled_rejects_bad_rules(spark):
    df = _pts(spark, [(1, 0, 0, "a")])
    with pytest.raises(ValueError, match="halfwidth"):
        OTL.render_styled_tiles(df, LEVEL, [(F.lit(True), 0xFFFFFF, 9)])
    with pytest.raises(ValueError, match="rgb"):
        OTL.render_styled_tiles(df, LEVEL, [(F.lit(True), 0x1FFFFFF, 1)])


# ---------------------------------------------------------------------------
# polyline arm (render_line_tiles): exact supercover vs SAT brute force
# ---------------------------------------------------------------------------


def _line_quant(v, off, span, n):
    return min(max(((v + off) * n) // span, 0), n - 1)


def test_render_line_tiles_supercover_vs_brute(spark):
    from geowave_spark.functions import geometry as G

    rng = np.random.RandomState(3)
    rows = [
        (100, 10, 10, 10, 400),      # vertical
        (101, 20, 300, 480, 300),    # horizontal
        (102, 50, 50, 50, 50),       # degenerate point segment
    ]
    for i in range(40):
        x0, y0 = rng.randint(-2000, 2000, 2)
        d = rng.randint(-500, 501, 2)
        rows.append((i, int(x0), int(y0), int(x0 + d[0]), int(y0 + d[1])))
    segs = spark.createDataFrame(
        rows, "seg_ord long, x0 long, y0 long, x1 long, y1 long"
    )
    rules = [(F.col("x1") - F.col("x0") > 0, 0xB43232, 1)]
    out = OTL.render_line_tiles(
        segs, level=8, rules=rules, default_rgb=0x3264C8
    ).collect()

    res, ts = 16, 256
    n = 1 << res
    paint = {}
    for i, x0, y0, x1, y1 in rows:
        gx0 = _line_quant(x0, 180_000, 360_000, n)
        gy0 = _line_quant(y0, 90_000, 180_000, n)
        gx1 = _line_quant(x1, 180_000, 360_000, n)
        gy1 = _line_quant(y1, 90_000, 180_000, n)
        rgb = 0xB43232 if x1 - x0 > 0 else 0x3264C8
        hw = 1 if x1 - x0 > 0 else 0
        s0 = np.array([[2 * gx0, 2 * gy0]], float)
        s1 = np.array([[2 * gx1, 2 * gy1]], float)
        for px in range(min(gx0, gx1), max(gx0, gx1) + 1):
            for py in range(min(gy0, gy1), max(gy0, gy1) + 1):
                if not G.segments_intersect_box(
                    s0, s1, 2 * px - 1, 2 * py - 1, 2 * px + 1, 2 * py + 1
                )[0]:
                    continue
                for ddx in range(-hw, hw + 1):
                    for ddy in range(-hw, hw + 1):
                        gx, gy = px + ddx, py + ddy
                        if 0 <= gx < n and 0 <= gy < n:
                            k = (gx, gy)
                            if k not in paint or paint[k][0] < i:
                                paint[k] = (i, rgb)
    exp = {}
    for (gx, gy), (_, rgb) in paint.items():
        t = (gx >> 8, gy >> 8)
        px, py = gx & 255, gy & 255
        d = exp.setdefault(t, [0, 0, 0, 0, 0])
        d[0] += 1
        d[1] += (rgb >> 16) & 255
        d[2] += (rgb >> 8) & 255
        d[3] += rgb & 255
        d[4] ^= ((py * ts + px) << 24) | rgb
    got = {
        (r["tile_ix"], r["tile_iy"]):
            [r["painted"], r["sum_r"], r["sum_g"], r["sum_b"], r["chk"]]
        for r in out
    }
    assert got == exp
    # PNG decodes to the winner raster shape
    from geowave_spark.sources import png as PNG

    any_tile = out[0]
    img = PNG.png_decode(bytes(any_tile["tile_png"]))
    assert img.shape == (ts, ts, 3)


def test_render_line_tiles_span_guard(spark):
    segs = spark.createDataFrame(
        [(1, -170_000, 0, 170_000, 0)],
        "seg_ord long, x0 long, y0 long, x1 long, y1 long",
    )
    with pytest.raises(Exception, match="more than 256 pixels"):
        OTL.render_line_tiles(
            segs, level=8, rules=[(F.lit(True), 0x123456, 0)]
        ).collect()
