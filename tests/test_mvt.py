"""MVT codec (sources/mvt.py: spec golden vectors + round trips) and the
distributed tile export (operators/mvt.py vs brute-force python)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import mvt as OMVT
from geowave_spark.sources import mvt as W

# ---------------------------------------------------------------------------
# geometry command streams — golden vectors from the public spec (2.1 §4.3)
# ---------------------------------------------------------------------------


def test_spec_point():
    assert W.geom_point([(25, 17)]) == [9, 50, 34]


def test_spec_multipoint():
    assert W.geom_point([(5, 7), (3, 2)]) == [17, 10, 14, 3, 9]


def test_spec_linestring():
    assert W.geom_linestring([[(2, 2), (2, 10), (10, 10)]]) == [
        9, 4, 4, 18, 0, 16, 16, 0]


def test_spec_polygon():
    assert W.geom_polygon([[(3, 6), (8, 12), (20, 34)]]) == [
        9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_geometry_roundtrip_multiline():
    lines = [[(0, 0), (5, -3), (100, 100)], [(7, 7), (6, 6)]]
    dec = W.decode_geometry(W.geom_linestring(lines), W.LINESTRING)
    assert dec == lines


def test_geometry_roundtrip_polygon_rings():
    rings = [[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (2, 4), (4, 4)]]
    dec = W.decode_geometry(W.geom_polygon(rings), W.POLYGON)
    assert dec == rings


def test_exterior_ring_positive_area_screen_coords():
    # operators/mvt.py emits [(x0,top),(x1,top),(x1,bot),(x0,bot)] — must
    # have positive surveyor area in tile coords (spec 4.3.3.2 exterior)
    ring = [(0, 0), (4096, 0), (4096, 4096), (0, 4096)]
    xs, ys = zip(*ring)
    area2 = sum(
        xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i] for i in range(4)
    )
    assert area2 > 0


# ---------------------------------------------------------------------------
# tile encode/decode
# ---------------------------------------------------------------------------


def test_tile_roundtrip_typed_tags():
    feats = [
        {"id": 7, "type": W.POINT, "geometry": W.geom_point([(1, 2)]),
         "tags": {"name": "a", "rank": 42, "score": 1.5, "hot": True,
                  "neg": -9}},
        {"id": 8, "type": W.POINT, "geometry": W.geom_point([(3, 4)]),
         "tags": {"name": "a", "rank": 42}},  # table dedup across features
    ]
    buf = W.encode_tile({"pts": feats}, extent=512)
    out = W.decode_tile(buf)
    layer = out["pts"]
    assert layer["extent"] == 512 and layer["version"] == 2
    f0, f1 = layer["features"]
    assert f0["id"] == 7 and f0["parts"] == [[(1, 2)]]
    assert f0["tags"] == {"name": "a", "rank": 42, "score": 1.5, "hot": True,
                          "neg": -9}
    assert f1["tags"] == {"name": "a", "rank": 42}


def test_tile_deterministic_bytes():
    feats = [{"id": i, "type": W.POINT, "geometry": W.geom_point([(i, i)]),
              "tags": {"k": str(i % 3)}} for i in range(20)]
    assert W.encode_tile({"l": feats}) == W.encode_tile({"l": feats})


def test_multiple_layers():
    a = [{"id": 1, "type": W.POINT, "geometry": W.geom_point([(0, 0)]),
          "tags": {}}]
    b = [{"id": 2, "type": W.POLYGON,
          "geometry": W.geom_polygon([[(0, 0), (4, 0), (4, 4)]]), "tags": {}}]
    out = W.decode_tile(W.encode_tile({"pts": a, "polys": b}))
    assert set(out) == {"pts", "polys"}
    assert out["polys"]["features"][0]["parts"] == [[(0, 0), (4, 0), (4, 4)]]


# ---------------------------------------------------------------------------
# distributed operators vs brute force
# ---------------------------------------------------------------------------

EXTENT, SHIFT = 4096, 12


def _grid(m, off, span, res):
    return min(max(((m + off) << res) // span, 0), (1 << res) - 1)


def test_point_tiles_vs_brute(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(i), int(rng.randint(-179000, 179000)),
         int(rng.randint(-84000, 84000)), f"t{i % 3}")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, lon_milli long, lat_milli long, kind string"
    )
    level = 3
    res = level + SHIFT
    got = {
        (r["tile_ix"], r["tile_iy"]): r
        for r in OMVT.mvt_point_tiles(
            df, level=level, tag_cols=("kind",)
        ).collect()
    }
    # brute force
    exp: dict = {}
    for i, lon, lat, kind in rows:
        ix = _grid(lon, 180_000, 360_000, res)
        iy = _grid(lat, 90_000, 180_000, res)
        key = (ix >> SHIFT, iy >> SHIFT)
        exp.setdefault(key, []).append(
            (i, ix & (EXTENT - 1), (EXTENT - 1) - (iy & (EXTENT - 1)), kind)
        )
    assert set(got) == set(exp)
    for key, items in exp.items():
        r = got[key]
        assert r["n_features"] == len(items)
        assert r["sum_x"] == sum(x for _, x, _, _ in items)
        assert r["sum_y"] == sum(y for _, _, y, _ in items)
        xr = 0
        for i, _, _, _ in items:
            xr ^= i
        assert r["xor_id"] == xr
        # decode the payload: exact ids, coords, and tags
        feats = W.decode_tile(bytes(r["mvt"]))["points"]["features"]
        dec = sorted(
            (f["id"], f["parts"][0][0][0], f["parts"][0][0][1],
             f["tags"]["kind"])
            for f in feats
        )
        assert dec == sorted(items)


def test_envelope_tiles_clip_and_orientation(spark):
    # one box fully inside tile (0-based) and one crossing a tile border
    level = 2
    res = level + SHIFT
    rows = [
        (1, -170_000, 10_000, -160_000, 20_000),   # inside one tile
        (2, -95_000, 10_000, -85_000, 20_000),     # crosses lon tile border
    ]
    df = spark.createDataFrame(
        rows, "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long"
    )
    out = OMVT.mvt_envelope_tiles(df, level=level).collect()
    per_env: dict = {}
    for r in out:
        feats = W.decode_tile(bytes(r["mvt"]))["boxes"]["features"]
        for f in feats:
            per_env.setdefault(f["id"], []).append(
                (r["tile_ix"], r["tile_iy"], f["parts"])
            )
    assert len(per_env[1]) == 1 and len(per_env[2]) == 2
    for fid, entries in per_env.items():
        for tix, tiy, parts in entries:
            (ring,) = parts
            assert len(ring) == 4
            xs, ys = zip(*ring)
            assert all(0 <= v <= EXTENT for v in xs + ys)
            area2 = sum(
                xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
                for i in range(4)
            )
            assert area2 > 0, "exterior ring must be CW in screen coords"
    # the border-crossing box: its two clipped halves abut the shared edge
    e2 = sorted(per_env[2])
    (t0x, _, p0), (t1x, _, p1) = e2
    assert t1x == t0x + 1
    assert max(x for x, _ in p0[0]) == EXTENT  # clipped at right edge
    assert min(x for x, _ in p1[0]) == 0       # clipped at left edge


def test_envelope_tile_guard(spark):
    df = spark.createDataFrame(
        [(1, -170_000, -80_000, 170_000, 80_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="spans more than"):
        OMVT.mvt_envelope_tiles(df, level=8).collect()


def test_point_tiles_deterministic(spark):
    df = spark.createDataFrame(
        [(i, i * 997 % 300000 - 150000, i * 991 % 160000 - 80000)
         for i in range(100)],
        "event_id long, lon_milli long, lat_milli long",
    )
    a = sorted(
        (r["tile_ix"], r["tile_iy"], bytes(r["mvt"]))
        for r in OMVT.mvt_point_tiles(df.repartition(7), level=4).collect()
    )
    b = sorted(
        (r["tile_ix"], r["tile_iy"], bytes(r["mvt"]))
        for r in OMVT.mvt_point_tiles(df.repartition(3), level=4).collect()
    )
    assert a == b


def test_value_int64_negative_from_external_encoder():
    # field 4 (int64): an external encoder emits -7 as a 10-byte
    # two's-complement varint; the decoder must fold it back to signed
    raw = W._uv(4 << 3) + W._uv((-7) & 0xFFFFFFFFFFFFFFFF)
    assert W._dec_value(bytes(raw)) == -7
    # uint64 (field 5) stays raw even above 2^63
    big = (1 << 63) + 5
    raw5 = W._uv(5 << 3) + W._uv(big)
    assert W._dec_value(bytes(raw5)) == big


def test_line_tiles_decode_and_run_merge(spark):
    """mvt_line_tiles: decoded parts equal a brute-force quantize +
    SAT-assign + run-merge replay, including a seg_j gap part break."""
    from geowave_spark.functions import geometry as G
    from geowave_spark.operators import lines as L

    rows = []
    # track 1: L-shaped 3-segment chain near (10E, 10N)
    vs = [(10_000, 10_000), (10_120, 10_060), (10_240, 10_000),
          (10_360, 10_120)]
    for j in range(3):
        rows.append((1, j, *vs[j], *vs[j + 1]))
    # track 2: two segments with a gap in seg_j (part break)
    rows.append((2, 0, 10_050, 10_050, 10_150, 10_150))
    rows.append((2, 5, 10_200, 10_200, 10_300, 10_300))
    segs = spark.createDataFrame(
        [(t, j, x0, y0, x1, y1,
          min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
         for t, j, x0, y0, x1, y1 in rows],
        "track_id long, seg_j long, x0 long, y0 long, x1 long, y1 long, "
        "minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    out = OMVT.mvt_line_tiles(segs, level=6).collect()
    assert out, "expected at least one tile"
    level, shift = 6, 12
    res = level + shift
    seen_gap_break = False
    for r in out:
        tile = W.decode_tile(bytes(r["mvt"]))["lines"]
        ox, oy = r["tile_ix"] << shift, r["tile_iy"] << shift
        for f in tile["features"]:
            track = f["id"]
            # replay: quantize this track's segments, keep SAT survivors
            exp_parts, prev_j = [], None
            for t, j, x0, y0, x1, y1 in rows:
                if t != track:
                    continue
                g = [((v + 180_000) * (1 << res)) // 360_000 for v in (x0, x1)]
                h = [((v + 90_000) * (1 << res)) // 180_000 for v in (y0, y1)]
                s0 = np.array([[g[0], h[0]]], float)
                s1 = np.array([[g[1], h[1]]], float)
                if not G.segments_intersect_box(
                    s0, s1, ox, oy, ox + 4095, oy + 4095
                )[0]:
                    continue
                p0 = (g[0] - ox, 4095 - (h[0] - oy))
                p1 = (g[1] - ox, 4095 - (h[1] - oy))
                if prev_j is not None and j == prev_j + 1:
                    exp_parts[-1].append(p1)
                else:
                    exp_parts.append([p0, p1])
                prev_j = j
            assert f["parts"] == exp_parts, (track, r["tile_ix"], r["tile_iy"])
            if track == 2 and len(exp_parts) == 2:
                seen_gap_break = True
    assert seen_gap_break


def test_line_tiles_dedupe_indexed_store(spark):
    """An INDEXED line store (multi-cell duplicate rows, n_dup) yields
    the same tiles as the raw segment table — DedupeFilter gating."""
    from geowave_spark.operators import lines as L

    pts = spark.createDataFrame(
        [(t, j, 10_000 + t * 100 + j * 120, 10_000 + j * 90)
         for t in range(3) for j in range(4)],
        "track_id long, j long, x long, y long",
    )
    segs = L.line_segments(pts)
    idx = L.index_line_segments(segs)
    assert idx.count() > segs.count()  # duplicates actually present
    raw = {(r["tile_ix"], r["tile_iy"]): bytes(r["mvt"])
           for r in OMVT.mvt_line_tiles(segs, level=6).collect()}
    via_idx = {(r["tile_ix"], r["tile_iy"]): bytes(r["mvt"])
               for r in OMVT.mvt_line_tiles(idx, level=6).collect()}
    assert raw == via_idx
