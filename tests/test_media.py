"""Audio/video codecs and kernels: RIFF round trips, closed-form features
(sine RMS = A/sqrt(2)), frame sampling + dhash determinism, compressed-
codec gating."""

import numpy as np
import pytest

from geowave_spark.operators import multimodal as OM
from geowave_spark.sources import media as MEDIA
from geowave_spark.sources import synthetic as SYN


def test_wav_roundtrip_mono_stereo():
    s = SYN.tone_for(5)
    dec, rate = MEDIA.wav_decode(MEDIA.wav_encode(s, 8000))
    assert rate == 8000 and np.array_equal(dec[:, 0], s)
    st = np.stack([s, -s], axis=1)
    dec2, _ = MEDIA.wav_decode(MEDIA.wav_encode(st, 44100))
    assert np.array_equal(dec2, st)


def test_avi_roundtrip():
    frames = SYN.video_frames_for(3, n_frames=5, w=20, h=14)  # non-mult-of-4 width
    dec, fps = MEDIA.avi_decode(MEDIA.avi_encode(frames, fps=12))
    assert fps == 12
    assert np.array_equal(dec, frames)


def test_compressed_codecs_gated():
    # WAVE with format tag 2 (ADPCM) must raise, not mis-decode
    import struct

    s = SYN.tone_for(1)
    buf = bytearray(MEDIA.wav_encode(s, 8000))
    struct.pack_into("<H", buf, 20, 2)  # fmt chunk payload starts at 20
    with pytest.raises(NotImplementedError, match="codec"):
        MEDIA.wav_decode(bytes(buf))


def test_audio_features_closed_form(spark):
    """Sine RMS = A/sqrt(2); duration from n/rate; ZCR ≈ 2f/rate."""
    df = SYN.audio(spark, 12, partitions=3)
    out = OM.audio_features(df).toPandas().sort_values("media_id")
    assert len(out) == 12
    for r in out.itertuples():
        i = int(r.media_id[3:])
        amp = 0.25 + (i % 4) * 0.15
        freq = 200.0 + (i % 32) * 25.0
        assert r.duration_ms == 250
        assert r.sample_rate == 8000 and r.n_channels == 1
        assert abs(r.rms_milli - amp / np.sqrt(2) * 1000) <= 2
        assert abs(r.zcr_milli - 2 * freq / 8000 * 1000) <= 6
    # determinism across partitionings
    again = OM.audio_features(SYN.audio(spark, 12, partitions=5)).toPandas()
    assert sorted(map(tuple, again.values.tolist())) == sorted(
        map(tuple, out.values.tolist())
    )


def test_video_frame_sample(spark):
    df = SYN.videos(spark, 8, partitions=2)
    out = OM.video_frame_sample(df, every_n=2).toPandas().sort_values("media_id")
    assert len(out) == 8
    for r in out.itertuples():
        i = int(r.media_id[3:])
        nf = 6 + i % 6
        assert r.n_frames == nf and r.fps == 10
        assert (r.w, r.h) == (32, 24)
        assert len(r.frame_dhash) == (nf + 1) // 2
        # dhash matches a local recompute of the sampled frames
        frames = SYN.video_frames_for(i, n_frames=nf)
        want = [OM.dhash64(fr.mean(axis=2)) for fr in frames[::2]]
        assert list(r.frame_dhash) == want


def test_image_quality_closed_form(spark):
    """Gradient/contrast metrics vs a direct numpy recompute on pinned
    synthetic pixel grids — constant image has zero gradient energy and
    one distinct level."""
    import pandas as pd
    from pyspark.sql import types as T

    from geowave_spark.sources import png as PNG

    flat = np.full((8, 8), 7, dtype=np.uint8)
    ramp = np.tile(np.arange(8, dtype=np.uint8) * 3, (8, 1))  # dx=3 per step
    rows = [
        ("flat", PNG.png_encode(flat), "png"),
        ("ramp", PNG.png_encode(ramp), "png"),
    ]
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("fmt", T.StringType()),
        ]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]), schema)
    out = OM.image_quality(df).toPandas().set_index("image_id")
    f = out.loc["flat"]
    assert f.grad_energy == 0 and f.n_distinct_lum == 1
    assert f.min_lum == f.max_lum == 7
    r = out.loc["ramp"]
    assert r.grad_x == 8 * 7 * 3 and r.grad_y == 0  # 8 rows x 7 steps x 3
    assert r.grad_energy == r.grad_x + r.grad_y
    assert (r.min_lum, r.max_lum, r.n_distinct_lum) == (0, 21, 8)


def test_image_features_quarantine_isolates_bad_rows(spark):
    """Corrupt blobs must not kill the job: quarantine mode flags exactly
    the bad rows and leaves good rows' features bit-identical to the
    fail-fast path."""
    from pyspark.sql import functions as F

    from geowave_spark.operators import multimodal as OM
    from geowave_spark.sources import synthetic as SYN

    imgs = SYN.images(spark, n=60, partitions=4)
    i = F.substring("image_id", 4, 12).cast("long")
    corrupted = imgs.withColumn(
        "bytes",
        F.when(i % 7 == 0, F.expr("substring(bytes, 1, 4)")).otherwise(
            F.col("bytes")
        ),
    )
    got = OM.image_features(corrupted, on_error="quarantine").collect()
    bad = {r["image_id"] for r in got if r["err"] is not None}
    assert bad == {f"img{k:012d}" for k in range(0, 60, 7)}
    for r in got:
        if r["err"] is not None:
            assert r["dhash"] is None and r["sum_lum"] is None

    clean = OM.image_features(
        imgs.filter(i % 7 != 0), on_error="raise"
    ).collect()
    want = {r["image_id"]: (r["sum_lum"], r["dhash"]) for r in clean}
    have = {r["image_id"]: (r["sum_lum"], r["dhash"])
            for r in got if r["err"] is None}
    assert have == want

    # fail-fast default still raises on the corrupt input
    import pytest as _pytest

    with _pytest.raises(Exception):
        OM.image_features(corrupted).collect()


def test_aspect_bucket_batches_closed_form(spark):
    """All 5 ratio bins hit; ordinals are a permutation of 0..n-1 within
    each bin; batch sizes exact; only full batches marked complete."""
    from collections import defaultdict

    from pyspark.sql import Row

    from geowave_spark.operators import multimodal as OM

    shapes = [(64, 128), (80, 100), (100, 100), (128, 96), (256, 128)]
    rows = [
        Row(image_id=f"im{i:04d}", w=shapes[i % 5][0], h=shapes[i % 5][1])
        for i in range(50)
    ]
    out = OM.aspect_bucket_batches(
        spark.createDataFrame(rows), batch_size=4, buckets=8
    ).collect()
    assert len(out) == 50
    by_bin = defaultdict(list)
    for r in out:
        by_bin[r["bin"]].append(r)
    assert sorted(by_bin) == [0, 1, 2, 3, 4]  # 500, 800, 1000, 1333, 2000
    for b, rs in by_bin.items():
        assert len(rs) == 10
        assert sorted(r["ordinal"] for r in rs) == list(range(10))
        sizes = defaultdict(int)
        for r in rs:
            sizes[r["batch_id"]] += 1
            assert r["batch_id"] == r["ordinal"] // 4
            assert r["complete"] == (r["batch_id"] < 10 // 4)
        assert sorted(sizes.values(), reverse=True) == [4, 4, 2]


def test_audio_video_quarantine_isolates_bad_rows(spark):
    """The audio and video kernels share image_features' corrupt-blob
    isolation: planted truncation flags exactly those rows, good rows
    match the fail-fast path bit-for-bit."""
    from pyspark.sql import functions as F

    from geowave_spark.operators import multimodal as OM
    from geowave_spark.sources import synthetic as SYN

    for gen, feat, key in (
        (SYN.audio, OM.audio_features, "rms_milli"),
        (SYN.videos, lambda df, **kw: OM.video_frame_sample(df, every_n=2, **kw), "n_frames"),
    ):
        df = gen(spark, 12, partitions=3)
        i = F.substring("media_id", 4, 9).cast("long")
        corrupted = df.withColumn(
            "bytes",
            F.when(i % 4 == 0, F.expr("substring(bytes, 1, 3)")).otherwise(
                F.col("bytes")
            ),
        )
        got = feat(corrupted, on_error="quarantine").collect()
        bad = {r["media_id"] for r in got if r["err"] is not None}
        ok_ids = {r["media_id"] for r in got if r["err"] is None}
        assert len(bad) == 3 and len(got) == 12
        for r in got:
            if r["err"] is not None:
                assert r[key] is None

        clean = feat(
            df.join(spark.createDataFrame([(x,) for x in ok_ids], "media_id string"), "media_id")
        ).collect()
        want = {r["media_id"]: r[key] for r in clean}
        assert {r["media_id"]: r[key] for r in got if r["err"] is None} == want

        import pytest as _pytest

        with _pytest.raises(Exception):
            feat(corrupted).collect()
