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


def test_geotiff_rejects_compressed_and_junk():
    pix = np.zeros((4, 4), dtype=np.uint8)
    buf = bytearray(TIF.encode_geotiff(pix, (0, 0), (1, 1)))
    # flip the Compression entry's inline value (tag 259) to 5 (LZW)
    idx = buf.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    buf[idx + 8] = 5
    with pytest.raises(NotImplementedError, match="compressed"):
        TIF.decode_geotiff(bytes(buf))
    with pytest.raises(ValueError):
        TIF.decode_geotiff(b"PK\x03\x04 not a tiff")


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
