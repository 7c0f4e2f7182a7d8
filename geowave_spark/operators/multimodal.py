"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata (the
BASELINE input shape: bytes + w/h/fmt), processed by Arrow-batched
``mapInPandas`` kernels — the pipeline pattern for feature extraction at
100 TB: decode stays columnar-batched, schema is explicit, partitioning is
whatever the upstream table carries (decode is embarrassingly parallel, no
shuffle).

The PNG path is REAL (sources/png.py is a spec-compliant encoder/decoder);
the 'jpeg' rows use the clearly-marked stub-lossy codec from the same
module (the container has no DCT library — see png.py docstring).  Audio
and video kernels are STUBS with real Spark plumbing (schema, batching,
signature) and a NotImplementedError decode, exactly as a deployment would
slot in soundfile/av.

Feature parity: dhash/mean are asserted against closed-form numpy in tests
(driver check is rows-only — no SQL engine can decode PNG).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geowave_spark.sources import png as PNG

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("mean_lum_milli", T.LongType()),   # mean luminance ×1000, integer
        T.StructField("dhash", T.LongType()),             # 8x8 difference hash
        T.StructField("thumb_png", T.BinaryType()),       # 16x16 nearest resize
    ]
)


def _resize_nearest(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = pix.shape[:2]
    jy = (np.arange(out_h) * h // out_h).astype(np.int64)
    jx = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pix[jy][:, jx]


def dhash64(pix: np.ndarray) -> int:
    """Classic 64-bit difference hash: 9x8 nearest resize, horizontal
    gradient sign bits (deterministic, pure numpy)."""
    g = _resize_nearest(pix if pix.ndim == 2 else pix.mean(axis=2), 9, 8).astype(np.int64)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    # fold into signed int64
    return val - (1 << 64) if val >= (1 << 63) else val


def image_features(images: DataFrame, thumb: int = 16) -> DataFrame:
    """Decode → (mean luminance, dhash, thumbnail) per image — one scan,
    one Arrow-batched Python call per batch, columnar output.  Unknown
    formats raise (fail fast — a pipeline would route them to a quarantine
    sink)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                pix = PNG.decode_image(r.bytes, r.fmt)
                rows.append(
                    (
                        r.image_id,
                        pix.shape[1],
                        pix.shape[0],
                        r.fmt,
                        int(round(float(pix.mean()) * 1000)),
                        dhash64(pix),
                        PNG.png_encode(_resize_nearest(pix, thumb, thumb)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            ).astype({"w": "int32", "h": "int32", "mean_lum_milli": "int64", "dhash": "int64"})

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio / video stubs — real plumbing, stubbed decode
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_dhash", T.ArrayType(T.LongType())),
    ]
)


def audio_features(audio: DataFrame) -> DataFrame:
    """STUB: rms/sample-count over an audio ``binary`` column.  The Spark
    plumbing (schema, Arrow batching, signature) is real; the codec is not
    present in this environment."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires a codec library (e.g. soundfile) not "
            "present in this environment; plug it into this kernel"
        )
        yield  # pragma: no cover

    return audio.select("media_id", "bytes").mapInPandas(kernel, AUDIO_SCHEMA)


def video_frame_sample(video: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: sample every ``every_n``-th frame and dhash it.  Same contract
    as :func:`audio_features`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decode requires a codec library (e.g. av) not present "
            "in this environment; plug it into this kernel"
        )
        yield  # pragma: no cover

    return video.select("media_id", "bytes").mapInPandas(kernel, VIDEO_SCHEMA)
