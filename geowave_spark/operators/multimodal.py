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
and video kernels are REAL for the dependency-free standard containers —
PCM WAVE and uncompressed AVI (sources/media.py, pure struct/numpy RIFF
parsing); compressed codecs (mp3/h264/...) raise NotImplementedError with
a clear message, exactly where a deployment slots in soundfile/av.

Feature parity: dhash/mean are asserted against closed-form numpy in tests
AND — for the procedural synthetic corpus — against a DuckDB oracle that
replays the pixel formula + quantization + dhash arithmetic in pure SQL
(registry ``image_features``): the oracle computes what decode MUST yield,
so the PNG/LOSY encode→decode round trip is checked end-to-end.
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
        T.StructField("sum_lum", T.LongType()),           # exact luminance sum
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


QUARANTINE_SCHEMA = T.StructType(
    list(FEATURE_SCHEMA.fields) + [T.StructField("err", T.StringType())]
)


def image_features(
    images: DataFrame, thumb: int = 16, on_error: str = "raise"
) -> DataFrame:
    """Decode → (mean luminance, dhash, thumbnail) per image — one scan,
    one Arrow-batched Python call per batch, columnar output.

    ``on_error``: 'raise' fails fast (default, the correctness-gate mode);
    'quarantine' adds an ``err`` column instead — decode failures yield a
    row with null features and the exception recorded, so ONE corrupt blob
    among 10^12 rows cannot kill the job (at scale some always are).  The
    caller splits on ``err IS NULL`` and routes the rest to a quarantine
    sink — per-row error isolation inside the Arrow batch, no per-row
    Python task overhead for the good path."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(on_error)
    quarantine = on_error == "quarantine"
    schema = QUARANTINE_SCHEMA if quarantine else FEATURE_SCHEMA

    # deliberately NOT folded into _quarantine_kernel: error rows here keep
    # the fmt metadata column populated (the factory nulls every payload
    # field), which quarantine triage wants for format-specific failures

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                try:
                    pix = PNG.decode_image(r.bytes, r.fmt)
                except Exception as e:  # noqa: BLE001 — quarantine records it
                    if not quarantine:
                        raise
                    rows.append(
                        (r.image_id, None, None, r.fmt, None, None, None,
                         None, f"{type(e).__name__}: {e}")
                    )
                    continue
                row = (
                    r.image_id,
                    pix.shape[1],
                    pix.shape[0],
                    r.fmt,
                    int(pix.sum(dtype=np.int64)),
                    int(round(float(pix.mean()) * 1000)),
                    dhash64(pix),
                    PNG.png_encode(_resize_nearest(pix, thumb, thumb)),
                )
                rows.append(row + (None,) if quarantine else row)
            # dtype=object at construction: with None present pandas would
            # otherwise infer float64 for int columns, silently corrupting
            # int64 hashes above 2^53 (low-bit loss, caught by the parity
            # test); object -> nullable-Int astype keeps exact Python ints
            pdf = pd.DataFrame(
                rows, columns=[f.name for f in schema.fields], dtype=object
            )
            int_cols = {"w": "int32", "h": "int32", "sum_lum": "int64",
                        "mean_lum_milli": "int64", "dhash": "int64"}
            if quarantine:
                int_cols = {c: t.capitalize() for c, t in int_cols.items()}
            yield pdf.astype(int_cols)

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("grad_x", T.LongType()),   # Σ|∂lum/∂x| — exact integer
        T.StructField("grad_y", T.LongType()),   # Σ|∂lum/∂y|
        T.StructField("grad_energy", T.LongType()),  # grad_x + grad_y
        T.StructField("min_lum", T.IntegerType()),
        T.StructField("max_lum", T.IntegerType()),
        T.StructField("n_distinct_lum", T.IntegerType()),
    ]
)


def image_quality(images: DataFrame) -> DataFrame:
    """Decode → sharpness/contrast quality signals per image: total
    absolute gradient (the integer-exact cousin of variance-of-Laplacian
    focus measures — near-zero on blurred/flat images), luminance range,
    and distinct-level count (1-2 levels = a solid-color or binarized
    junk image).  The training-data curation filter for the image side of
    the corpus, same embarrassingly-parallel mapInPandas shape as
    :func:`image_features`; all metrics are integers so the DuckDB oracle
    replays the procedural pixels + quantization + gradients exactly.
    Multi-channel inputs reduce to integer mean luminance (floor)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                pix = PNG.decode_image(r.bytes, r.fmt)
                lum = (
                    pix.astype(np.int64)
                    if pix.ndim == 2
                    else pix.astype(np.int64).sum(axis=2) // pix.shape[2]
                )
                gx = int(np.abs(np.diff(lum, axis=1)).sum())
                gy = int(np.abs(np.diff(lum, axis=0)).sum())
                rows.append(
                    (
                        r.image_id,
                        lum.shape[1],
                        lum.shape[0],
                        r.fmt,
                        gx,
                        gy,
                        gx + gy,
                        int(lum.min()),
                        int(lum.max()),
                        int(np.unique(lum).size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in QUALITY_SCHEMA.fields]
            ).astype(
                {
                    "w": "int32",
                    "h": "int32",
                    "min_lum": "int32",
                    "max_lum": "int32",
                    "n_distinct_lum": "int32",
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, QUALITY_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio / video kernels — REAL for the dependency-free standard containers
# (PCM WAVE, uncompressed AVI — sources/media.py); compressed codecs raise
# NotImplementedError per row contract (a deployment plugs soundfile/av into
# the same kernels).
# ---------------------------------------------------------------------------

from geowave_spark.sources import media as MEDIA  # noqa: E402

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),   # RMS of [-1,1] signal ×1000
        T.StructField("zcr_milli", T.LongType()),   # zero-crossing rate ×1000
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("frame_dhash", T.ArrayType(T.LongType())),
    ]
)


def _quarantine_kernel(base_schema, decode_row, int_cols, on_error, id_attr="media_id"):
    """Shared mapInPandas kernel factory with per-row error isolation —
    the image_features quarantine pattern, reused by the audio and video
    kernels: 'raise' fails fast, 'quarantine' records the exception in an
    ``err`` column (null features) so one corrupt blob among 10^12 rows
    cannot kill the job.  dtype=object construction + nullable-Int astype
    keeps int64 values exact in the presence of None (CLAUDE.md trap)."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(on_error)
    quarantine = on_error == "quarantine"
    schema = (
        T.StructType(list(base_schema.fields) + [T.StructField("err", T.StringType())])
        if quarantine
        else base_schema
    )
    n_payload = len(base_schema.fields) - 1  # fields after the id column

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                try:
                    row = decode_row(r)
                except Exception as e:  # noqa: BLE001 — quarantine records it
                    if not quarantine:
                        raise
                    rows.append(
                        (getattr(r, id_attr),) + (None,) * n_payload
                        + (f"{type(e).__name__}: {e}",)
                    )
                    continue
                rows.append(row + (None,) if quarantine else row)
            pdf = pd.DataFrame(
                rows, columns=[f.name for f in schema.fields], dtype=object
            )
            cols = (
                {c: t.capitalize() for c, t in int_cols.items()}
                if quarantine
                else int_cols
            )
            yield pdf.astype(cols)

    return kernel, schema


def audio_features(audio: DataFrame, on_error: str = "raise") -> DataFrame:
    """PCM-WAVE decode → (duration, RMS, zero-crossing rate) per clip.
    One Arrow batch per Python call, numpy-vectorized per clip — the same
    embarrassingly-parallel mapInPandas shape (and the same
    ``on_error='quarantine'`` corrupt-blob isolation) as image_features."""

    def decode_row(r):
        s, rate = MEDIA.wav_decode(bytes(r.bytes))
        mono = s.astype(np.float64).mean(axis=1) / 32768.0
        n = len(mono)
        rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
        zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
        return (
            r.media_id, n, s.shape[1], rate,
            int(round(n / rate * 1000)),
            int(round(rms * 1000)),
            int(round(zc * 1000)),
        )

    kernel, schema = _quarantine_kernel(
        AUDIO_SCHEMA, decode_row,
        {"n_samples": "int64", "n_channels": "int32", "sample_rate": "int32",
         "duration_ms": "int64", "rms_milli": "int64", "zcr_milli": "int64"},
        on_error,
    )
    return audio.select("media_id", "bytes").mapInPandas(kernel, schema)


def video_frame_sample(
    video: DataFrame, every_n: int = 2, on_error: str = "raise"
) -> DataFrame:
    """Uncompressed-AVI decode → every ``every_n``-th frame dhashed (the
    frame-sampling feature extraction a training pipeline runs; dhash
    reuses the image kernel).  Same quarantine option as image_features."""

    def decode_row(r):
        frames, fps = MEDIA.avi_decode(bytes(r.bytes))
        sampled = frames[::every_n]
        hashes = [dhash64(fr.mean(axis=2)) for fr in sampled]
        return (
            r.media_id, len(frames), fps,
            frames.shape[2], frames.shape[1], hashes,
        )

    kernel, schema = _quarantine_kernel(
        VIDEO_SCHEMA, decode_row,
        {"n_frames": "int32", "fps": "int32", "w": "int32", "h": "int32"},
        on_error,
    )
    return video.select("media_id", "bytes").mapInPandas(kernel, schema)


ASPECT_EDGES_MILLI = (600, 900, 1112, 1667)  # w/h ×1000 bin edges


def aspect_bucket_batches(
    images: DataFrame,
    batch_size: int = 64,
    edges_milli: tuple[int, ...] = ASPECT_EDGES_MILLI,
    id_col: str = "image_id",
    buckets: int = 64,
) -> DataFrame:
    """Aspect-ratio bucketing for image training batches: group images into
    shape-compatible bins (integer milli-ratio w/h against literal edges),
    then deterministically cut each bin into fixed-size batches —
    ``(id, ratio_milli, bin, ordinal, batch_id, complete)``; incomplete
    tail batches are flagged, not silently trained on.

    The image analogue of ``corpus.pack_sequences``, on the SAME shared
    machinery (``corpus.bucketed_prefix``): the within-bin ordinal is a
    distributed exact prefix COUNT over a cross-engine deterministic order
    (md5-derived ``h64`` key, id tie-break) — never a global-order window
    (one partition at 10^12 rows)."""
    from geowave_spark.operators.corpus import bucketed_prefix
    from geowave_spark.operators.text import h64_col

    ratio = F.expr("(1000 * w) div h")
    bin_expr = sum(
        (F.col("ratio_milli") >= F.lit(e)).cast("int") for e in edges_milli
    )
    base = images.select(
        F.col(id_col),
        ratio.alias("ratio_milli"),
        h64_col(F.col(id_col).cast("string")).alias("_key"),
    ).withColumn("bin", bin_expr)
    out = bucketed_prefix(
        base, "_key", ["_key", id_col], None, buckets, part_cols=("bin",)
    )
    return out.select(
        id_col,
        "ratio_milli",
        "bin",
        F.col("_prefix").alias("ordinal"),
        (F.col("_prefix") / batch_size).cast("long").alias("batch_id"),
        (
            (F.col("_prefix") / batch_size).cast("long")
            < F.floor(F.col("_ptot") / batch_size).cast("long")
        ).alias("complete"),
    )
