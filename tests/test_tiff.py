"""Baseline GeoTIFF codec + Spark reader (SURVEY §2.2 GeoTools-raster /
Landsat8 ingest path).  Codec checks are closed-form byte round trips; the
distributed file round trip is oracle-checked in the registry
(geotiff_tiles)."""

import numpy as np
import pytest

from geowave_spark.sources import tiff as TIF


def test_geotiff_gray_roundtrip():
    pix = ((np.arange(24)[:, None] * 13 + np.arange(32)[None, :] * 7) % 256).astype(
        np.uint8
    )
    buf = TIF.encode_geotiff(pix, origin=(-74.5, 41.25), scale=(0.01, 0.02))
    got, origin, scale = TIF.decode_geotiff(buf)
    np.testing.assert_array_equal(got, pix)
    assert origin == (-74.5, 41.25) and scale == (0.01, 0.02)


def test_geotiff_rgb_roundtrip():
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(16, 20, 3), dtype=np.uint8)
    got, origin, scale = TIF.decode_geotiff(
        TIF.encode_geotiff(pix, origin=(2.0, 48.0), scale=(0.5, 0.5))
    )
    np.testing.assert_array_equal(got, pix)
    assert got.shape == (16, 20, 3)


def test_geotiff_rejects_jpeg_and_junk():
    pix = np.zeros((4, 4), dtype=np.uint8)
    buf = bytearray(TIF.encode_geotiff(pix, (0, 0), (1, 1)))
    # flip the Compression entry's inline value (tag 259) to 7 (JPEG)
    idx = buf.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    buf[idx + 8] = 7
    with pytest.raises(NotImplementedError, match="unsupported TIFF compression"):
        TIF.decode_geotiff(bytes(buf))
    with pytest.raises(ValueError):
        TIF.decode_geotiff(b"PK\x03\x04 not a tiff")


# ---------------------------------------------------------------------------
# Compression codecs (TIFF 6.0 §7 PackBits, §13 LZW, Adobe deflate) —
# known vectors pin interop; round trips pin the full strip path
# ---------------------------------------------------------------------------


def test_packbits_spec_vector():
    """The TIFF 6.0 §7 worked example — both directions."""
    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert TIF._packbits_decode(packed) == unpacked
    assert TIF._packbits_encode(unpacked) == packed


def test_lzw_known_vector():
    """Hand-derived 9-bit stream for [7,7,7,8]: Clear(256), 7, 258(KwKwK),
    8, EOI(257) → MSB-first packing 80 01 E0 40 88 08."""
    raw = bytes([7, 7, 7, 8])
    packed = bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
    assert TIF._lzw_encode(raw) == packed
    assert TIF._lzw_decode(packed) == raw


def test_lzw_width_growth_and_clear():
    """Round trips crossing the 9→10→11→12-bit early-change boundaries and
    the 4094-entry table clear (needs > ~100 KB of non-repeating data)."""
    rng = np.random.RandomState(3)
    for n in (1, 200, 5_000, 120_000):
        raw = rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
        assert TIF._lzw_decode(TIF._lzw_encode(raw)) == raw
    assert TIF._lzw_decode(TIF._lzw_encode(b"")) == b""


@pytest.mark.parametrize("comp", [TIF.COMP_LZW, TIF.COMP_DEFLATE,
                                  TIF.COMP_DEFLATE_OLD, TIF.COMP_PACKBITS])
@pytest.mark.parametrize("byteorder", ["II", "MM"])
@pytest.mark.parametrize("predictor", [1, 2])
def test_geotiff_compressed_roundtrip(comp, byteorder, predictor):
    """All three codecs × both byte orders × both predictors, multi-strip
    (rows_per_strip=5 on h=13 → ragged last strip)."""
    rng = np.random.RandomState(comp % 97 + predictor)
    # smooth-ish gradient + noise: exercises predictor gains AND randomness
    base = (np.arange(13)[:, None, None] * 9 + np.arange(21)[None, :, None] * 3
            + np.arange(3)[None, None, :] * 31)
    pix = ((base + rng.randint(0, 9, size=(13, 21, 3))) % 256).astype(np.uint8)
    buf = TIF.encode_geotiff(
        pix, origin=(12.5, 47.25), scale=(0.125, 0.0625),
        compression=comp, predictor=predictor, rows_per_strip=5,
        byteorder=byteorder,
    )
    got, origin, scale = TIF.decode_geotiff(buf)
    np.testing.assert_array_equal(got, pix)
    assert origin == (12.5, 47.25) and scale == (0.125, 0.0625)


def test_geotiff_lzw_beats_raw_on_smooth_data():
    """Sanity that the codec actually compresses (predictor 2 on a smooth
    ramp): compressed file smaller than the uncompressed one."""
    pix = ((np.arange(64)[:, None] + np.arange(64)[None, :]) % 256).astype(np.uint8)
    raw = TIF.encode_geotiff(pix, (0.0, 0.0), (1.0, 1.0))
    lzw = TIF.encode_geotiff(pix, (0.0, 0.0), (1.0, 1.0),
                             compression=TIF.COMP_LZW, predictor=2)
    assert len(lzw) < len(raw)


def test_geotiff_big_endian_decode():
    """Hand-built minimal big-endian (MM) TIFF: the decoder honors the BOM."""
    import struct

    pix = bytes(range(8))  # 4x2 gray
    entries = [
        (256, 4, 1, 4), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
        (279, 4, 1, 8),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        payload = struct.pack(">H", val) + b"\x00\x00" if typ == 3 else struct.pack(">I", val)
        ifd += struct.pack(">HHI", tag, typ, cnt) + payload
    ifd += struct.pack(">I", 0)
    buf = struct.pack(">2sHI", b"MM", 42, 16) + pix + struct.pack(">q", 0)[:0] + ifd
    got, origin, scale = TIF.decode_geotiff(buf)
    assert got.shape == (2, 4) and got[1, 3] == 7
    assert origin is None and scale is None


def test_read_geotiff_spark(spark, tmp_path):
    from geowave_spark.sources.synthetic import pixels_for

    for i in (3, 9):
        pix = pixels_for(i, 32, 32)
        (tmp_path / f"s{i}.tif").write_bytes(
            TIF.encode_geotiff(pix, origin=(10.0 + i, 50.0), scale=(0.125, 0.25))
        )
    rows = {r.file.rsplit("/s", 1)[1]: r for r in
            TIF.read_geotiff(spark, str(tmp_path / "*.tif")).collect()}
    r = rows["3.tif"]
    assert (r.w, r.h, r.bands) == (32, 32, 1)
    assert r.px_sum == int(pixels_for(3, 32, 32).sum())
    assert (r.minx, r.maxy) == (13.0, 50.0)
    assert (r.maxx, r.miny) == (13.0 + 32 * 0.125, 50.0 - 32 * 0.25)
    got = np.frombuffer(r.pixels, dtype=np.uint8).reshape(32, 32)
    np.testing.assert_array_equal(got, pixels_for(3, 32, 32))


@pytest.mark.parametrize("comp", [TIF.COMP_NONE, TIF.COMP_LZW,
                                  TIF.COMP_DEFLATE, TIF.COMP_PACKBITS])
@pytest.mark.parametrize("byteorder", ["II", "MM"])
@pytest.mark.parametrize("predictor", [1, 2])
def test_geotiff_tiled_roundtrip(comp, byteorder, predictor):
    """TILED layout (tags 322-325, the COG/Landsat internal blocking):
    37x53 raster with 16x16 tiles → 3x4 grid, every edge tile partial
    (zero-padded on disk, cropped on decode); all codecs × byte orders ×
    predictors."""
    rng = np.random.RandomState(comp % 89 + predictor)
    base = (np.arange(37)[:, None, None] * 5 + np.arange(53)[None, :, None] * 11
            + np.arange(3)[None, None, :] * 17)
    pix = ((base + rng.randint(0, 7, size=(37, 53, 3))) % 256).astype(np.uint8)
    buf = TIF.encode_geotiff(
        pix, origin=(-120.0, 38.5), scale=(0.25, 0.125),
        compression=comp, predictor=predictor, tile_size=(16, 16),
        byteorder=byteorder,
    )
    got, origin, scale = TIF.decode_geotiff(buf)
    np.testing.assert_array_equal(got, pix)
    assert origin == (-120.0, 38.5) and scale == (0.25, 0.125)


def test_geotiff_tiled_gray_and_exact_grid():
    """Single band + dims that are exact tile multiples (no padding)."""
    pix = ((np.arange(32)[:, None] * 7 + np.arange(48)[None, :] * 3) % 256).astype(
        np.uint8
    )
    got, origin, _ = TIF.decode_geotiff(
        TIF.encode_geotiff(pix, origin=(5.0, 50.0), scale=(0.1, 0.1),
                           compression=TIF.COMP_LZW, predictor=2,
                           tile_size=(16, 32))
    )
    np.testing.assert_array_equal(got, pix)


def test_geotiff_tiled_matches_stripped_bytes_decode():
    """Same raster through both layouts decodes identically."""
    rng = np.random.RandomState(42)
    pix = rng.randint(0, 256, size=(19, 27, 3), dtype=np.uint8)
    kw = dict(origin=(0.0, 0.0), scale=(1.0, 1.0),
              compression=TIF.COMP_DEFLATE, predictor=2)
    a, _, _ = TIF.decode_geotiff(TIF.encode_geotiff(pix, rows_per_strip=4, **kw))
    b, _, _ = TIF.decode_geotiff(TIF.encode_geotiff(pix, tile_size=(16, 16), **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, pix)


def test_geotiff_tile_dims_must_be_multiples_of_16():
    pix = np.zeros((20, 20), np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        TIF.encode_geotiff(pix, origin=(0, 0), scale=(1, 1), tile_size=(20, 16))


@pytest.mark.parametrize("comp", [TIF.COMP_NONE, TIF.COMP_LZW, TIF.COMP_DEFLATE])
@pytest.mark.parametrize("byteorder", ["II", "MM"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("tiled", [False, True])
def test_geotiff_16bit_roundtrip(comp, byteorder, predictor, tiled):
    """16-bit unsigned samples (real Landsat Level-1 depth): words in the
    file's byte order, predictor differencing on 16-bit VALUES (incl.
    deltas that wrap mod 65536), strip and tiled layouts."""
    rng = np.random.RandomState(3 * comp + predictor + tiled)
    # full 16-bit range incl. >255 and wrap-prone jumps
    pix = rng.randint(0, 65536, size=(21, 35), dtype=np.uint16)
    kw = dict(tile_size=(16, 16)) if tiled else dict(rows_per_strip=6)
    buf = TIF.encode_geotiff(
        pix, origin=(10.0, 45.0), scale=(0.01, 0.01),
        compression=comp, predictor=predictor, byteorder=byteorder, **kw,
    )
    got, origin, scale = TIF.decode_geotiff(buf)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, pix)
    assert origin == (10.0, 45.0)


def test_geotiff_16bit_multiband_and_spark_reader(spark, tmp_path):
    """3-band uint16 through the distributed reader: bits column, px_sum
    over 16-bit values, pixels round-trip as little-endian words."""
    rng = np.random.RandomState(11)
    pix = rng.randint(0, 65536, size=(17, 23, 3), dtype=np.uint16)
    buf = TIF.encode_geotiff(
        pix, origin=(-3.0, 51.0), scale=(0.02, 0.04),
        compression=TIF.COMP_LZW, predictor=2, byteorder="MM",
    )
    (tmp_path / "scene16.tif").write_bytes(buf)
    row = TIF.read_geotiff(spark, str(tmp_path / "*.tif")).collect()[0]
    assert (row.w, row.h, row.bands, row.bits) == (23, 17, 3, 16)
    assert row.px_sum == int(pix.sum(dtype=np.int64))
    back = np.frombuffer(row.pixels, dtype="<u2").reshape(17, 23, 3)
    np.testing.assert_array_equal(back, pix)


def test_geotiff_rejects_other_depths():
    pix = np.zeros((8, 8), np.uint8)
    buf = bytearray(TIF.encode_geotiff(pix, origin=(0, 0), scale=(1, 1)))
    # corrupt BitsPerSample to 32 in place: find the tag-258 IFD entry
    import struct
    idx = bytes(buf).rfind(struct.pack("<HHI", TIF.TAG_BITS, 3, 1))
    assert idx > 0
    struct.pack_into("<H", buf, idx + 8, 32)
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        TIF.decode_geotiff(bytes(buf))


def test_geotiff_geokeys_roundtrip():
    pix = np.zeros((8, 8), np.uint8)
    for code in (4326, 32633, 32719, 3857):
        buf = TIF.encode_geotiff(pix, origin=(0, 0), scale=(1, 1), epsg=code)
        assert TIF.geotiff_epsg(buf) == code
    # no geokeys → None
    assert TIF.geotiff_epsg(
        TIF.encode_geotiff(pix, origin=(0, 0), scale=(1, 1))
    ) is None


def test_read_geotiff_utm_reprojects_envelope(spark, tmp_path):
    """A UTM-georeferenced scene (the real Landsat shape: metres + EPSG:326xx
    in the GeoKeyDirectory) comes back with its envelope in EPSG:4326 via
    the closed-form Krüger inverse — the RasterIngestRunner reprojection."""
    from geowave_spark.functions import crs as CRS

    rng = np.random.RandomState(3)
    pix = rng.randint(0, 65536, size=(64, 64), dtype=np.uint16)
    # 30 m pixels (the Landsat grid), origin mid-zone 33N
    x0, y0, res = 499_000.0, 5_200_000.0, 30.0
    buf = TIF.encode_geotiff(
        pix, origin=(x0, y0), scale=(res, res),
        compression=TIF.COMP_LZW, predictor=2, tile_size=(16, 16), epsg=32633,
    )
    (tmp_path / "utm.tif").write_bytes(buf)
    row = TIF.read_geotiff(spark, str(tmp_path / "*.tif")).collect()[0]
    assert row.epsg == 32633
    assert (row.lon0, row.lat0, row.sx, row.sy) == (x0, y0, res, res)
    want = CRS.transform_box(
        x0, y0 - 64 * res, x0 + 64 * res, y0, "EPSG:32633"
    )
    got = (row.minx, row.miny, row.maxx, row.maxy)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # sanity: zone 33 central meridian is 15°E; the box must straddle it
    assert got[0] < 15.0 < got[2] and 46.0 < got[1] < got[3] < 48.0


def test_read_geotiff_unknown_projection_nulls_envelope(spark, tmp_path):
    """A projected CRS with no closed form must NOT pose metres as
    degrees: envelope comes back null, epsg + native georef preserved."""
    pix = np.zeros((8, 8), np.uint8)
    buf = TIF.encode_geotiff(
        pix, origin=(700_000.0, 6_600_000.0), scale=(2.0, 2.0), epsg=2154
    )
    (tmp_path / "lambert.tif").write_bytes(buf)
    row = TIF.read_geotiff(spark, str(tmp_path / "*.tif")).collect()[0]
    try:
        import pyproj  # noqa: F401

        return  # pyproj present: the hook reprojects instead — skip
    except ImportError:
        pass
    assert row.epsg == 2154
    assert row.minx is None and row.maxy is None
    assert row.lon0 == 700_000.0 and row.sx == 2.0


@pytest.mark.parametrize("comp", [TIF.COMP_NONE, TIF.COMP_LZW, TIF.COMP_DEFLATE])
@pytest.mark.parametrize("byteorder", ["II", "MM"])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_bigtiff_roundtrip(comp, byteorder, tiled, dtype):
    """BigTIFF (magic 43: 8-byte offsets, 20-byte entries, LONG8 chunk
    offsets — the >4 GB scene/COG container) across codecs, byte orders,
    layouts and sample depths."""
    rng = np.random.RandomState(comp + tiled)
    hi = 256 if dtype == np.uint8 else 65536
    pix = rng.randint(0, hi, size=(23, 31, 3)).astype(dtype)
    kw = dict(tile_size=(16, 16)) if tiled else dict(rows_per_strip=7)
    buf = TIF.encode_geotiff(
        pix, origin=(4.5, 52.0), scale=(0.01, 0.02),
        compression=comp, predictor=2, byteorder=byteorder,
        bigtiff=True, **kw,
    )
    assert buf[2:4] in (b"\x2b\x00", b"\x00\x2b")  # magic 43
    got, origin, scale = TIF.decode_geotiff(buf)
    np.testing.assert_array_equal(got, pix)
    assert origin == (4.5, 52.0) and scale == (0.01, 0.02)


@pytest.mark.parametrize("bigtiff", [False, True])
def test_geotiff_overview_chain(bigtiff):
    """COG-style overview pyramid: chained IFDs flagged reduced-resolution,
    each level independently decodable by index; geokeys stay on IFD 0."""
    base = ((np.arange(64)[:, None] * 5 + np.arange(64)[None, :] * 3) % 256).astype(
        np.uint8
    )
    ovr1 = base[::2, ::2].copy()
    ovr2 = base[::4, ::4].copy()
    buf = TIF.encode_geotiff(
        base, origin=(-120.0, 40.0), scale=(0.001, 0.001),
        compression=TIF.COMP_DEFLATE, predictor=2, tile_size=(16, 16),
        epsg=4326, bigtiff=bigtiff, overviews=[ovr1, ovr2],
    )
    assert TIF.geotiff_ifd_count(buf) == 3
    for i, want in enumerate((base, ovr1, ovr2)):
        got, origin, _ = TIF.decode_geotiff(buf, ifd=i)
        np.testing.assert_array_equal(got, want)
        if i == 0:
            assert origin == (-120.0, 40.0)
    assert TIF.geotiff_epsg(buf) == 4326
    with pytest.raises(IndexError):
        TIF.decode_geotiff(buf, ifd=3)


def test_read_geotiff_overview_level(spark, tmp_path):
    """read_geotiff(level=k) decodes the overview IFD with IFD-0 georef
    scaled — identical envelope at every level, quarter the pixels per
    level, clamped to the coarsest available."""
    base = ((np.arange(64)[:, None] * 5 + np.arange(64)[None, :] * 3) % 256).astype(
        np.uint8
    )
    ovr1, ovr2 = base[::2, ::2].copy(), base[::4, ::4].copy()
    buf = TIF.encode_geotiff(
        base, origin=(-120.0, 40.0), scale=(0.001, 0.001),
        tile_size=(16, 16), epsg=4326, overviews=[ovr1, ovr2],
    )
    (tmp_path / "cog.tif").write_bytes(buf)
    envs = []
    for lvl, want_w, want_pix in ((0, 64, base), (1, 32, ovr1), (2, 16, ovr2),
                                  (9, 16, ovr2)):  # 9 clamps to coarsest
        row = TIF.read_geotiff(spark, str(tmp_path / "*.tif"), level=lvl).collect()[0]
        assert row.w == want_w
        assert row.px_sum == int(want_pix.sum(dtype=np.int64))
        envs.append((row.minx, row.miny, row.maxx, row.maxy))
        assert abs(row.sx * row.w - 0.001 * 64) < 1e-12  # extent invariant
    assert len(set(envs)) == 1  # envelope identical at every level
