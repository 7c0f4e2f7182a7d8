"""Training-data pipeline operators: dedup, text analysis, embedding
similarity, multimodal features.

Strategy mirrors the driver's correctness gate (and the reference's
golden-set ITs): every SQL-expressible operator is compared row-for-row
against its DuckDB oracle on the same parquet tables; approximate/binary
operators are pinned against closed-form numpy."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from geowave_spark.registry import ORACLES, QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLE_CHECKED = [
    "exact_dedup",
    "minhash_lsh_pairs",
    # per-doc "simhash" was folded out of the 50-entry driver registry in
    # round 3 (json_props restored); its signature math stays transitively
    # verified by simhash_pairs' oracle + the perturbation pytest below
    "simhash_pairs",
    "jaccard_pairs",
    "lang_id",
    "text_quality",
    "token_stats",
    "winnow_fingerprints",
    "embed_topk",
    "embed_neardup",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, duck, name):
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    opdf = duck.execute(ORACLES[name]).fetchdf()
    cols = sorted(spdf.columns)
    assert sorted(opdf.columns) == cols
    a = spdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = opdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            assert (av.astype(float) - bv.astype(float)).abs().max() < 1e-12, c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def test_exact_dedup_finds_planted_duplicates(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["Hello  world", "hello world", "HELLO\tWORLD", "other doc"],
            "source": ["s"] * 4,
        }
    )
    from geowave_spark.operators.dedup import exact_dedup

    out = exact_dedup(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 2
    grp = out[out.n_docs == 3]
    assert len(grp) == 1 and grp.canonical_id.iloc[0] == 1


def test_minhash_identical_docs_always_pair(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [text, text, "completely different words here now"]}
    )
    from geowave_spark.operators.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(spark.createDataFrame(pdf)).toPandas()
    assert [(r.id_a, r.id_b) for r in out.itertuples()] == [(1, 2)]


def test_simhash_small_perturbation_small_hamming(spark):
    base = ("word%d " * 40) % tuple(range(40))
    pert = base.replace("word7 ", "word7x ")
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [base, pert]})
    from geowave_spark.operators.dedup import simhash

    out = simhash(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    ham = bin(int(out.loc[1, "simhash"]) ^ int(out.loc[2, "simhash"])).count("1")
    assert ham <= 12  # one-token change flips few sign bits


def test_ann_lsh_recall(spark, sf_dir):
    """Approximate NN must find a decent fraction of the true top-10 — and
    must itself be exact on the candidates it does surface (cos values match
    brute force)."""
    exact = QUERIES["embed_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["embed_ann_lsh"](spark, sf_dir).toPandas()
    truth = {(r.q_id, r.vec_id): r.cos for r in exact.itertuples()}
    hits = sum((r.q_id, r.vec_id) in truth for r in approx.itertuples())
    recall = hits / len(truth)
    assert recall >= 0.3, f"recall {recall}"
    for r in approx.itertuples():
        if (r.q_id, r.vec_id) in truth:
            assert abs(truth[(r.q_id, r.vec_id)] - r.cos) < 1e-12


def test_image_features_closed_form(spark):
    """dhash + mean luminance must equal the closed-form numpy values of the
    procedural image formula (FIXTURES F1)."""
    from geowave_spark.operators.multimodal import dhash64, image_features
    from geowave_spark.sources import png as PNG
    from geowave_spark.sources import synthetic as SYN

    imgs = SYN.images(spark, n=24, partitions=4)
    out = image_features(imgs).toPandas().set_index("image_id")
    assert len(out) == 24
    for i in range(24):
        iid = f"img{i:012d}"
        w = SYN.SIZES_W[i % 3]
        h = SYN.SIZES_H[i % 3]
        fmt = SYN.FMTS[i % 3]
        pix = SYN.pixels_for(i, w, h)
        if fmt == "jpeg":
            pix = (pix // PNG.LOSSY_QUANT) * PNG.LOSSY_QUANT
        r = out.loc[iid]
        assert (r.w, r.h) == (w, h)
        assert r.mean_lum_milli == int(round(float(pix.mean()) * 1000))
        assert r.dhash == dhash64(pix)
        thumb = PNG.png_decode(r.thumb_png) if "thumb_png" in out.columns else None
    # lossy rows stay within the PSNR bar vs the pristine pixels
    pristine = SYN.pixels_for(2, SYN.SIZES_W[2], SYN.SIZES_H[2])
    lossy = (pristine // PNG.LOSSY_QUANT) * PNG.LOSSY_QUANT
    assert PNG.psnr(pristine, lossy) >= 40.0


def test_audio_video_stubs_raise(spark):
    from geowave_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["a"], "bytes": [b"\x00\x01"]})
    )
    with pytest.raises(Exception):
        audio_features(df).collect()


def test_ivf_topk_recall_and_exactness(spark, sf_dir):
    """IVF ANN: decent recall vs brute-force top-k, exact cos on surfaced
    candidates, and candidate work bounded by the probed-list fraction."""
    from geowave_spark.registry import EXTRA_QUERIES

    exact = QUERIES["embed_topk"](spark, sf_dir).toPandas()
    approx = EXTRA_QUERIES["embed_ivf_topk"](spark, sf_dir).toPandas()
    truth = {(r.q_id, r.vec_id): r.cos for r in exact.itertuples()}
    hits = sum((r.q_id, r.vec_id) in truth for r in approx.itertuples())
    recall = hits / len(truth)
    assert recall >= 0.3, f"recall {recall}"
    for r in approx.itertuples():
        if (r.q_id, r.vec_id) in truth:
            assert abs(truth[(r.q_id, r.vec_id)] - r.cos) < 1e-12


def test_ivf_assign_partitions_corpus(spark, sf_dir):
    """Every vector lands in exactly one inverted list; each seed centroid
    is its own list's member; list sizes are bounded away from degenerate
    (no single list swallows the corpus)."""
    from geowave_spark.operators import embed as OE
    from geowave_spark.sources.tables import load_tables

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    n = emb.count()
    assigned = OE.ivf_assign(emb).toPandas()
    assert len(assigned) == n
    byid = assigned.set_index("vec_id")["bucket"]
    for c in range(OE.IVF_N_CENTROIDS):
        assert byid[c] == c  # a centroid's nearest centroid is itself
    assert assigned["bucket"].value_counts().max() < 0.5 * n


def test_hard_negatives_excludes_same_label(spark, sf_dir):
    import numpy as np

    from geowave_spark.operators import embed as OE
    from geowave_spark.sources import tables as TB

    emb = TB.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    out = OE.hard_negatives(emb, n_queries=4, k=5).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert len(out) > 0
    for r in out:
        assert r["label"] != labels[r["q_id"]], "negative shares anchor label"
        assert r["label"] == labels[r["vec_id"]]
    # hardest-first: ranks are 1..k, cos non-increasing per anchor
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append((r["rank"], r["cos"]))
    for q, rows in per_q.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        cs = [c for _, c in rows]
        assert cs == sorted(cs, reverse=True)
    # brute-force agreement on one anchor (float64 vs quantized path can
    # only disagree on exact ties, which round-6dp ordering makes stable)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    q0 = vecs[0]
    cand = [
        (vid, float(np.dot(v, q0) / (np.linalg.norm(v) * np.linalg.norm(q0))))
        for vid, v in vecs.items()
        if labels[vid] != labels[0]
    ]
    cand.sort(key=lambda t: (-round(t[1], 4), t[0]))
    got0 = sorted(
        (r["rank"], r["vec_id"]) for r in out if r["q_id"] == 0
    )
    assert [v for _, v in got0] == [v for v, _ in cand[:5]]
