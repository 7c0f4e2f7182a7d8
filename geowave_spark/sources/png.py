"""Minimal dependency-free image codecs for the engine's raster path.

The container has no PIL/OpenCV, so:

* ``png`` — a real, spec-compliant PNG subset: 8-bit grayscale or RGB,
  filter type 0, one IDAT chunk (zlib).  Encode + decode round-trip exactly
  (lossless), and any standard viewer can open the output.
* ``jpeg`` — STUB LOSSY CODEC (clearly marked): real JPEG needs a DCT
  library we don't have, so rows tagged ``fmt='jpeg'`` use a deterministic
  quantization (pixels snapped to multiples of 4) inside a PNG container.
  Quantization error is uniform in [-2,2) → PSNR ≈ 10·log10(255²/1.25)
  ≈ 47 dB, comfortably over the BASELINE 40 dB bar, and deterministic so
  tests are exact.  Swap in a real JPEG codec in production; every Spark-
  side signature (binary in/out, w/h/fmt metadata) is already real.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

LOSSY_QUANT = 4  # stub-lossy quantization step


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → PNG bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w = pixels.shape
        color_type = 0
        raw = pixels
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w, _ = pixels.shape
        color_type = 2
        raw = pixels.reshape(h, w * 3)
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    # filter byte 0 per scanline
    filtered = np.empty((h, raw.shape[1] + 1), dtype=np.uint8)
    filtered[:, 0] = 0
    filtered[:, 1:] = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes (filter-0 subset as written by png_encode; filters 0-2 of
    standard writers also handled) → uint8 array (h,w) or (h,w,3)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = color_type = None
    idat = b""
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        payload = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color_type, _, _, _ = struct.unpack(">IIBBBBB", payload)
            if bitdepth != 8 or color_type not in (0, 2):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    ch = 3 if color_type == 2 else 1
    stride = w * ch
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    if (filters != 0).any():
        # support filters 1 (Sub) and 2 (Up) for interop with other writers
        out = np.zeros_like(data)
        prev = np.zeros(stride, dtype=np.int32)
        for i in range(h):
            line = data[i].copy()
            f = filters[i]
            if f == 0:
                pass
            elif f == 2:
                line = (line + prev) & 0xFF
            elif f == 1:
                for x in range(ch, stride):
                    line[x] = (line[x] + line[x - ch]) & 0xFF
            else:
                raise ValueError(f"unsupported PNG filter {f}")
            out[i] = line
            prev = out[i]
        data = out
    pix = data.astype(np.uint8)
    return pix.reshape(h, w, 3) if ch == 3 else pix.reshape(h, w)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """fmt ∈ {png, jpeg, jpg}.  'jpg' is the REAL baseline JPEG codec
    (sources/jpeg.py, round 3).  'jpeg' stays the round-2 STUB lossy codec
    (see module doc) because its quantization is SQL-replayable — the
    driver's image_features oracle depends on that; real-JPEG rows are
    pinned by PSNR pytest instead (DCT rounding has no SQL twin)."""
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpg":
        from geowave_spark.sources.jpeg import jpeg_encode

        return jpeg_encode(pixels)
    if fmt == "jpeg":
        quant = (
            np.ascontiguousarray(pixels, dtype=np.uint8) // LOSSY_QUANT
        ) * LOSSY_QUANT
        return b"LOSY" + png_encode(quant)
    raise ValueError(f"unknown fmt {fmt}")


def raw_encode(pixels: np.ndarray) -> bytes:
    """Float-raster container: 'RAWF' + (h, w, bands) + float32 data —
    the storage path for non-uint8 coverages (the reference's non-byte
    DataBuffer raster tiles), which PNG cannot carry."""
    p = np.ascontiguousarray(pixels, dtype=np.float32)
    h, w = p.shape[:2]
    bands = p.shape[2] if p.ndim == 3 else 0  # 0 marks a 2-D raster
    return b"RAWF" + struct.pack(">III", h, w, bands) + p.tobytes()


def raw_decode(buf: bytes) -> np.ndarray:
    h, w, bands = struct.unpack_from(">III", buf, 4)
    arr = np.frombuffer(buf, dtype=np.float32, offset=16)
    return arr.reshape((h, w, bands) if bands else (h, w)).copy()


def decode_image(buf: bytes, fmt: str | None = None) -> np.ndarray:
    if buf[:4] == b"RAWF":
        return raw_decode(buf)
    if buf[:4] == b"LOSY":
        return png_decode(buf[4:])
    if buf[:2] == b"\xff\xd8":  # JPEG SOI
        from geowave_spark.sources.jpeg import jpeg_decode

        return jpeg_decode(buf)
    return png_decode(buf)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
