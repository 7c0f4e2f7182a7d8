"""Baseline GeoTIFF codec + Spark reader — the GeoTools-raster ingest
format (SURVEY §2.2; reference
extensions/formats/geotools-raster/.../GeoToolsRasterDataStoreIngestPlugin.java
wraps any GridCoverage reader, GeoTIFF first among them; the Landsat8 CLI
ingests per-band GeoTIFF scenes, RasterIngestRunner.java:77-300).

Pure struct/numpy implementation of the PUBLIC specs (TIFF 6.0 baseline:
little/big-endian IFDs, uncompressed strips, 8-bit samples; GeoTIFF 1.1
georeferencing tags ModelPixelScale 33550 + ModelTiepoint 33922) — the same
dependency-free posture as sources/png.py.  Compressed TIFFs (LZW/deflate/
JPEG-in-TIFF) raise NotImplementedError with a clear message — exactly
where a deployment slots in rasterio/GDAL.

Spark shape: one file per task (binaryFile scan + Arrow-batched decode),
yielding georeferenced raster rows (pixels + envelope) that feed the
existing tiling operators (assign_tiles / render_tiles) — a GeoTIFF ingest
is "read_geotiff → tile pyramid", the RasterDataAdapter path.
"""

from __future__ import annotations

import struct

import numpy as np

_T_SHORT, _T_LONG, _T_DOUBLE = 3, 4, 12
_SZ = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}

TAG_WIDTH, TAG_HEIGHT, TAG_BITS, TAG_COMPRESSION = 256, 257, 258, 259
TAG_PHOTOMETRIC, TAG_STRIP_OFFSETS, TAG_SAMPLES = 262, 273, 277
TAG_ROWS_PER_STRIP, TAG_STRIP_COUNTS, TAG_PLANAR = 278, 279, 284
TAG_SAMPLE_FORMAT = 339
TAG_MODEL_PIXEL_SCALE, TAG_MODEL_TIEPOINT = 33550, 33922


def encode_geotiff(
    pix: np.ndarray,
    origin: tuple[float, float],
    scale: tuple[float, float],
) -> bytes:
    """uint8 raster (h,w) or (h,w,bands) → little-endian baseline GeoTIFF.

    ``origin`` = (lon, lat) of the TOP-LEFT corner (raster space 0,0 —
    GeoTIFF tiepoint convention), ``scale`` = (deg/px east, deg/px south),
    both positive.  Single uncompressed strip, chunky planar layout."""
    if pix.dtype != np.uint8:
        raise ValueError("baseline encoder writes 8-bit samples")
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, bands = pix.shape
    data = pix.tobytes()

    extra = bytearray()          # out-of-line value areas, placed after data
    extra_base = 8 + len(data)

    def entry(tag: int, typ: int, values: list) -> bytes:
        count = len(values)
        fmt = {"u2": "<H", "u4": "<I", "f8": "<d"}[
            {_T_SHORT: "u2", _T_LONG: "u4", _T_DOUBLE: "f8"}[typ]
        ]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        if len(payload) <= 4:
            return struct.pack("<HHI", tag, typ, count) + payload.ljust(4, b"\x00")
        off = extra_base + len(extra)
        extra.extend(payload)
        if len(extra) % 2:
            extra.append(0)
        return struct.pack("<HHII", tag, typ, count, off)

    entries = [
        entry(TAG_WIDTH, _T_LONG, [w]),
        entry(TAG_HEIGHT, _T_LONG, [h]),
        entry(TAG_BITS, _T_SHORT, [8] * bands),
        entry(TAG_COMPRESSION, _T_SHORT, [1]),
        entry(TAG_PHOTOMETRIC, _T_SHORT, [2 if bands >= 3 else 1]),
        entry(TAG_STRIP_OFFSETS, _T_LONG, [8]),
        entry(TAG_SAMPLES, _T_SHORT, [bands]),
        entry(TAG_ROWS_PER_STRIP, _T_LONG, [h]),
        entry(TAG_STRIP_COUNTS, _T_LONG, [len(data)]),
        entry(TAG_PLANAR, _T_SHORT, [1]),
        entry(TAG_SAMPLE_FORMAT, _T_SHORT, [1] * bands),
        entry(
            TAG_MODEL_PIXEL_SCALE, _T_DOUBLE, [float(scale[0]), float(scale[1]), 0.0]
        ),
        entry(
            TAG_MODEL_TIEPOINT,
            _T_DOUBLE,
            [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0],
        ),
    ]
    ifd_off = extra_base + len(extra)
    ifd = (
        struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)  # no next IFD
    )
    return struct.pack("<2sHI", b"II", 42, ifd_off) + data + bytes(extra) + ifd


def decode_geotiff(
    buf: bytes,
) -> tuple[np.ndarray, tuple[float, float] | None, tuple[float, float] | None]:
    """GeoTIFF bytes → (pixels (h,w) or (h,w,bands) uint8, origin, scale).

    Handles both byte orders, multi-strip layouts, inline and out-of-line
    values.  Raises NotImplementedError for compressed / non-8-bit files."""
    bom = buf[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(e + "HI", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")

    (n,) = struct.unpack_from(e + "H", buf, ifd_off)
    tags: dict[int, list] = {}
    fmt_of = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(e + "HHI", buf, off)
        if typ not in _SZ:
            continue  # rational/ascii tags: not needed for baseline decode
        size = _SZ[typ] * count
        voff = off + 8 if size <= 4 else struct.unpack_from(e + "I", buf, off + 8)[0]
        tags[tag] = list(struct.unpack_from(e + str(count) + fmt_of[typ], buf, voff))

    if tags.get(TAG_COMPRESSION, [1])[0] != 1:
        raise NotImplementedError(
            f"compressed TIFF (compression={tags[TAG_COMPRESSION][0]}) — "
            "plug in rasterio/GDAL for production decode"
        )
    if any(b != 8 for b in tags.get(TAG_BITS, [8])):
        raise NotImplementedError("only 8-bit samples in the baseline decoder")

    w, h = tags[TAG_WIDTH][0], tags[TAG_HEIGHT][0]
    bands = tags.get(TAG_SAMPLES, [1])[0]
    strips = b"".join(
        buf[o : o + c]
        for o, c in zip(tags[TAG_STRIP_OFFSETS], tags[TAG_STRIP_COUNTS])
    )
    pix = np.frombuffer(strips, dtype=np.uint8, count=w * h * bands).reshape(
        h, w, bands
    )
    if bands == 1:
        pix = pix[:, :, 0]

    origin = scale = None
    if TAG_MODEL_TIEPOINT in tags and TAG_MODEL_PIXEL_SCALE in tags:
        tp, sc = tags[TAG_MODEL_TIEPOINT], tags[TAG_MODEL_PIXEL_SCALE]
        # tiepoint maps raster (i,j) -> model (x,y); baseline: i=j=0
        origin = (tp[3] - tp[0] * sc[0], tp[4] + tp[1] * sc[1])
        scale = (sc[0], sc[1])
    return pix, origin, scale


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

GEOTIFF_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("lon0", T.DoubleType()),   # top-left corner
        T.StructField("lat0", T.DoubleType()),
        T.StructField("sx", T.DoubleType()),     # deg/px east
        T.StructField("sy", T.DoubleType()),     # deg/px south
        T.StructField("minx", T.DoubleType()),   # derived envelope
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("pixels", T.BinaryType()),  # raw chunky uint8
    ]
)


def read_geotiff(spark: SparkSession, glob: str) -> DataFrame:
    """GeoTIFF files → georeferenced raster rows.  The envelope columns feed
    ``index_envelopes``/``assign_tiles`` directly (the RasterDataAdapter
    ingest: scene → footprint → pyramid tiles); ``pixels`` carries the
    decoded raster for the mosaic/retile operators."""

    def kernel(batches):
        import pandas as pd

        cols = [f.name for f in GEOTIFF_SCHEMA.fields]
        for b in batches:
            rows = []
            for r in b.itertuples():
                pix, origin, scale = decode_geotiff(bytes(r.content))
                h, w = pix.shape[:2]
                bands = 1 if pix.ndim == 2 else pix.shape[2]
                lon0, lat0 = origin if origin else (None, None)
                sx, sy = scale if scale else (None, None)
                env = (
                    (lon0, lat0 - h * sy, lon0 + w * sx, lat0)
                    if origin
                    else (None, None, None, None)
                )
                rows.append(
                    (
                        r.path, w, h, bands, lon0, lat0, sx, sy, *env,
                        int(pix.sum(dtype=np.int64)), pix.tobytes(),
                    )
                )
            pdf = pd.DataFrame(rows, columns=cols)
            for icol in ("w", "h", "bands"):
                pdf[icol] = pdf[icol].astype("int32")
            pdf["px_sum"] = pdf["px_sum"].astype("int64")
            yield pdf

    files = spark.read.format("binaryFile").load(glob)
    return files.select("path", "content").mapInPandas(kernel, GEOTIFF_SCHEMA)
