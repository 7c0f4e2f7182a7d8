"""Deterministic synthetic image+caption table (FIXTURES.md F1).

The BASELINE input shape: ``(image_id, bytes, w, h, fmt, caption, phash)``
georeferenced by footprint sidecar columns.  Generated distributed
(``spark.range`` → ``mapInPandas``) and purely from the row index — no RNG
state, no wall clock — so any subset regenerates identically at any scale
(the 10^12-row posture: generation is embarrassingly parallel and the same
row always produces the same bytes).

Spatial distribution mirrors sources/tables.py: 80% in 5 hot blobs (skew),
20% uniform — the hot-tile case the salting/AQE path is benchmarked on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from geowave_spark.sources import png as PNG
from geowave_spark.sources.tables import BLOBS_MILLI

WORDS = (
    "aerial urban rural coastal forest desert river lake mountain valley "
    "harbor bridge airport farmland vineyard glacier island reef dune delta "
    "canyon plateau marsh tundra savanna steppe oasis fjord atoll lagoon "
    "roadway railway pipeline stadium reservoir quarry mine port dockyard "
    "refinery campus plaza cathedral fortress lighthouse windmill dam levee "
    "terrace orchard paddock pasture meadow grove thicket clearing ridge "
    "summit basin gorge bluff mesa butte arroyo wash"
).split()

SIZES_W = [64, 128, 256]
SIZES_H = [64, 96, 256]
FMTS = ["png", "png", "jpeg"]
HALF_EXT_MILLI = [32, 64, 128, 256, 512, 1024]

SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("lon_milli", T.LongType(), False),
        T.StructField("lat_milli", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("half_m", T.LongType(), False),
        T.StructField("minx_m", T.LongType(), False),
        T.StructField("miny_m", T.LongType(), False),
        T.StructField("maxx_m", T.LongType(), False),
        T.StructField("maxy_m", T.LongType(), False),
        T.StructField("fp_minx", T.DoubleType(), False),
        T.StructField("fp_miny", T.DoubleType(), False),
        T.StructField("fp_maxx", T.DoubleType(), False),
        T.StructField("fp_maxy", T.DoubleType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def fnv1a64(s: str) -> int:
    """Stable 64-bit FNV-1a, sign-folded into int64 (the phash column)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """FIXTURES F1 procedural image: v = (i*31 + x*7 + y*13) % 256."""
    x = np.arange(w, dtype=np.int64) * 7
    y = np.arange(h, dtype=np.int64) * 13
    return ((i * 31 + x[None, :] + y[:, None]) % 256).astype(np.uint8)


def _locate(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row index → (lon_milli, lat_milli), same scheme as tables.py."""
    h1 = (i * 2654435761) % 4294967296
    h2 = ((i + 1) * 2246822519) % 4294967296
    hot = (h1 % 10) < 8
    blob = (h2 % 5).astype(np.int64)
    centers = np.array(BLOBS_MILLI, dtype=np.int64)
    lon_hot = centers[blob, 0] + (h1 % 2001) - 1000
    lat_hot = centers[blob, 1] + (h2 % 2001) - 1000
    lon_cold = (h1 % 360000) - 180000
    lat_cold = (h2 % 170000) - 85000
    return np.where(hot, lon_hot, lon_cold), np.where(hot, lat_hot, lat_cold)


def _gen_batch(ids: np.ndarray, with_bytes: bool) -> pd.DataFrame:
    n = len(ids)
    lon_m, lat_m = _locate(ids)
    half = np.array(HALF_EXT_MILLI, dtype=np.int64)[(ids * 40503) % 6]
    minx = np.maximum(lon_m - half, -180000)
    miny = np.maximum(lat_m - half, -90000)
    maxx = np.minimum(lon_m + half, 179999)
    maxy = np.minimum(lat_m + half, 89999)
    w = np.array(SIZES_W)[ids % 3]
    h = np.array(SIZES_H)[ids % 3]
    fmts = [FMTS[int(i) % 3] for i in ids]
    image_ids = [f"img{int(i):012d}" for i in ids]
    if with_bytes:
        blobs = [
            PNG.encode_image(pixels_for(int(i), int(wi), int(hi)), f)
            for i, wi, hi, f in zip(ids, w, h, fmts)
        ]
    else:
        blobs = [b""] * n
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": blobs,
            "w": w.astype(np.int32),
            "h": h.astype(np.int32),
            "fmt": fmts,
            "caption": [
                f"caption {int(i)} {WORDS[int(i) % len(WORDS)]}" for i in ids
            ],
            "phash": [fnv1a64(s) for s in image_ids],
            "lon_milli": lon_m,
            "lat_milli": lat_m,
            "lon": lon_m / 1000.0,
            "lat": lat_m / 1000.0,
            "half_m": half,
            "minx_m": minx,
            "miny_m": miny,
            "maxx_m": maxx,
            "maxy_m": maxy,
            "fp_minx": minx / 1000.0,
            "fp_miny": miny / 1000.0,
            "fp_maxx": maxx / 1000.0,
            "fp_maxy": maxy / 1000.0,
            "ts": pd.Timestamp("2020-01-01")
            + pd.to_timedelta(ids * 137, unit="s"),
        }
    )


def images(
    spark: SparkSession, n: int, partitions: int = 32, with_bytes: bool = True
) -> DataFrame:
    """Distributed deterministic F1 table of ``n`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy(np.int64), with_bytes)

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic audio / video tables (multimodal operator inputs;
# same no-RNG row-index derivation discipline as images)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


def tone_for(i: int, rate: int = 8000, dur_ms: int = 250) -> np.ndarray:
    """Row index → int16 sine tone: freq 200 + (i%32)*25 Hz, amplitude
    (0.25 + (i%4)*0.15) full scale — closed-form (RMS = A/sqrt(2))."""
    n = rate * dur_ms // 1000
    freq = 200.0 + (i % 32) * 25.0
    amp = 0.25 + (i % 4) * 0.15
    t = np.arange(n, dtype=np.float64) / rate
    return np.round(np.sin(2 * np.pi * freq * t) * amp * 32767.0).astype(np.int16)


def audio(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic PCM-WAVE clip table."""
    from geowave_spark.sources import media as MEDIA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(np.int64)
            rows = []
            for i in ids:
                s = tone_for(int(i))
                rows.append(
                    (f"aud{int(i):09d}", MEDIA.wav_encode(s, 8000), 8000, len(s))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "sample_rate", "n_samples"]
            ).astype({"sample_rate": "int32", "n_samples": "int32"})

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, AUDIO_SCHEMA)


def video_frames_for(i: int, n_frames: int = 8, w: int = 32, h: int = 24) -> np.ndarray:
    """Row index → (n, h, w, 3) procedural RGB frames (per-frame shift of
    the F1 pixel formula, one formula per channel)."""
    out = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for f in range(n_frames):
        base = pixels_for(i * 7 + f, w, h)
        out[f, :, :, 0] = base
        out[f, :, :, 1] = np.roll(base, f, axis=1)
        out[f, :, :, 2] = 255 - base
    return out


def videos(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic uncompressed-AVI clip table."""
    from geowave_spark.sources import media as MEDIA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(np.int64)
            rows = []
            for i in ids:
                nf = 6 + int(i) % 6
                fr = video_frames_for(int(i), n_frames=nf)
                rows.append((f"vid{int(i):09d}", MEDIA.avi_encode(fr, fps=10), nf))
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "n_frames"]
            ).astype({"n_frames": "int32"})

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, VIDEO_SCHEMA)
