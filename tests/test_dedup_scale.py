"""Scale-posture tests for the round-2 blocking changes: the jaccard
doc-frequency stoplist bounds hot-token fan-out while keeping reported
values exact, and the computed-quantizer near-dup reports exact cosines
with bounded candidate generation and no pair duplication."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import dedup as OD
from geowave_spark.operators import embed as OE


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_jaccard_stoplist_hot_token_excluded_results_exact(spark):
    """One token shared by EVERY doc (the skew case): with max_df set, the
    hot token never enters candidate generation, but reported
    (inter, union, jaccard) stay exact over the FULL token sets."""
    n = 40
    rows = [(i, "s", f"hot tok{i}a tok{i}b tok{i}c") for i in range(n)]
    # one true near-dup pair sharing rare tokens (jaccard = 4/6)
    rows.append((100, "s", "hot dupx dupy dupz"))
    rows.append((101, "s", "hot dupx dupy dupw"))
    docs = _mkdocs(spark, rows)
    got = OD.jaccard_pairs(docs, tau=0.5, max_df=5).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    # exact values include the hot token: inter = {hot, dupx, dupy} = 3,
    # union = 4 + 4 - 3 = 5
    assert (int(r.id_a), int(r.id_b), int(r.inter), int(r.union_sz)) == (100, 101, 3, 5)
    assert r.jaccard == 0.6


def test_jaccard_stoplist_all_stopword_pair_skipped(spark):
    """A pair sharing ONLY hotter-than-max_df tokens is not a candidate —
    the disclosed semantic of the stoplist."""
    n = 12
    # every doc contains the 3 hot tokens; docs 0/1 share nothing else
    rows = [(i, "s", f"h1 h2 h3 uniq{i}") for i in range(n)]
    docs = _mkdocs(spark, rows)
    full = OD.jaccard_pairs(docs, tau=0.5, max_df=None).toPandas()
    blocked = OD.jaccard_pairs(docs, tau=0.5, max_df=5).toPandas()
    assert len(full) == n * (n - 1) // 2  # jaccard 3/5 >= 0.5 for all pairs
    assert len(blocked) == 0


def test_jaccard_stoplist_no_change_when_df_low(spark):
    rows = [
        (1, "s", "alpha beta gamma delta"),
        (2, "s", "alpha beta gamma epsilon"),
        (3, "t", "alpha beta gamma delta"),  # other block: never paired
    ]
    docs = _mkdocs(spark, rows)
    a = OD.jaccard_pairs(docs, tau=0.5, max_df=None).toPandas().sort_values("id_a")
    b = OD.jaccard_pairs(docs, tau=0.5, max_df=10).toPandas().sort_values("id_a")
    assert a.values.tolist() == b.values.tolist()
    assert len(a) == 1


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _half_away(v):  # Spark ROUND semantics (numpy rounds half-to-even)
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def _quant_matrix(pdf):
    return np.stack(
        [_half_away(np.asarray(v, dtype=np.float64) * OE.QUANT).astype(np.int64)
         for v in pdf.embedding]
    )


def _brute_pairs(pdf, tau):
    q = _quant_matrix(pdf)
    ids = pdf.vec_id.to_numpy()
    dots = q @ q.T
    norms = np.sqrt((q * q).sum(axis=1, dtype=np.int64).astype(np.float64))
    cos = np.round(dots / np.outer(norms, norms), 6)
    iu = np.triu_indices(len(ids), k=1)
    mask = cos[iu] >= tau
    return {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): float(cos[i, j])
        for i, j in zip(iu[0][mask], iu[1][mask])
    }


def test_neardup_q_exact_subset_no_duplicates(spark, emb):
    """Quantizer-blocked pairs are a SUBSET of brute-force tau-pairs with
    bit-identical cosines, unique per pair (exactly-once emission)."""
    got = OE.neardup_pairs_q(emb).toPandas()
    true_pairs = _brute_pairs(emb.toPandas(), OE.NEARDUP_TAU)
    got_pairs = {(int(r.id_a), int(r.id_b)): float(r.cos) for r in got.itertuples()}
    assert len(got_pairs) == len(got), "multiprobe must not duplicate pairs"
    assert len(got_pairs) > 0
    for p, c in got_pairs.items():
        assert p in true_pairs and abs(true_pairs[p] - c) < 1e-9


def test_neardup_q_recall_on_genuine_neardups(spark, emb):
    """The DEFAULT dial must catch genuine near-duplicates.  The synthetic
    embeddings table has NO pair above cos 0.8 (tau=0.30 there is a
    weak-similarity regime where any sub-10%-candidate blocking scheme has
    low recall by construction), so inject real near-dups: copies of 40
    base vectors with small deterministic perturbations (cos >= ~0.99)."""
    pdf = emb.toPandas().head(40).copy()
    rows = []
    for i, r in enumerate(pdf.itertuples()):
        v = np.asarray(r.embedding, dtype=np.float64)
        noise = np.cos(np.arange(64) * (i + 3) * 0.7) * 0.02 * np.abs(v).mean()
        rows.append((10_000 + i, (v + noise).tolist()))
        rows.append((20_000 + i, v.tolist()))
    dup = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = OE.neardup_pairs_q(dup, tau=0.98).toPandas()
    got_pairs = {(int(r.id_a), int(r.id_b)) for r in got.itertuples()}
    want = {(10_000 + i, 20_000 + i) for i in range(40)}
    recall = len(got_pairs & want) / len(want)
    assert recall >= 0.85, f"default-dial recall on cos>=0.99 dups: {recall:.2f}"
    # the banded OR-amplified dial recovers the rest
    got2 = OE.neardup_pairs_q(dup, tau=0.98, bands=3).toPandas()
    got2_pairs = {(int(r.id_a), int(r.id_b)) for r in got2.itertuples()}
    assert len(got2_pairs & want) >= len(got_pairs & want)
    assert len(got2_pairs & want) / len(want) >= 0.95


def test_neardup_q_banded_exactly_once_and_subset(spark, emb):
    """bands>1: pairs still unique (first-matching-band emission, no dedup
    shuffle), still a subset of brute force with exact cosines, and a
    SUPERSET of the single-band result (OR-amplification only adds)."""
    got1 = OE.neardup_pairs_q(emb).toPandas()
    got3 = OE.neardup_pairs_q(emb, bands=3).toPandas()
    true_pairs = _brute_pairs(emb.toPandas(), OE.NEARDUP_TAU)
    p1 = {(int(r.id_a), int(r.id_b)) for r in got1.itertuples()}
    p3 = {(int(r.id_a), int(r.id_b)): float(r.cos) for r in got3.itertuples()}
    assert len(p3) == len(got3), "banded emission must not duplicate pairs"
    assert p1 <= set(p3)
    for p, c in p3.items():
        assert p in true_pairs and abs(true_pairs[p] - c) < 1e-9


def test_neardup_q_candidate_fraction_bounded(spark):
    """The SHIPPED default dial (planes=8, probe_hamming=1) generates < 10%
    of the all-pairs space as candidates at bench scale (sf0.1, 2000
    vectors) — the round-2 default scanned ~69%."""
    emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb01.count()
    base = emb01.select(
        "vec_id", OE.quant_col(F.col("embedding")).alias("_qv")
    ).withColumn("_bkt", OE.quantizer_bucket_col("_qv", 64, OE.IVF_PLANES))
    masks = OE._probe_masks(OE.IVF_PLANES, OE.IVF_PROBE_HAMMING)
    probes = F.array(
        *[F.col("_bkt").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
    )
    a = base.select(F.col("vec_id").alias("id_a"), F.explode(probes).alias("_blk"))
    b = base.select(F.col("vec_id").alias("id_b"), F.col("_bkt").alias("_blk"))
    n_cand = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b")).count()
    frac = n_cand / (n * (n - 1) / 2)
    assert frac < 0.10, f"candidate fraction {frac:.3f}"
    # and the probe fan-out is exactly 1 + planes rows per vector
    assert a.count() == n * len(masks)
    # buckets genuinely shard the corpus
    occ = base.groupBy("_bkt").count().toPandas()
    assert occ["count"].max() < n
    assert len(occ) > 1


def test_planes_for_corpus_scales():
    assert OE.planes_for_corpus(1000) == OE.IVF_PLANES
    assert OE.planes_for_corpus(10**9) > OE.IVF_PLANES
    assert OE.planes_for_corpus(10**12) == 28
    assert OE.planes_for_corpus(10**15) == 30  # capped


def test_arrow_signature_paths_bit_identical(spark, sf_dir):
    """The numpy fast-path kernels must produce byte-identical signatures
    to the Catalyst definitional path on real documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = OD.minhash_signatures(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = OD.minhash_signatures_arrow(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    sa = OD.simhash(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    sb = OD.simhash_arrow(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert sa.equals(sb)


def test_lang_id_arrow_identical(spark, sf_dir):
    """lang_id_arrow (corpus_prep's hot path) must reproduce the Catalyst
    lang_id exactly — prediction, token count, hit count, and the
    ascending-code tie rule."""
    from geowave_spark.operators import text as OTX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = OTX.lang_id(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = OTX.lang_id_arrow(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # tie + empty-text edges the corpus may not cover
    edge = spark.createDataFrame(
        [(1, "the der la le"), (2, ""), (3, "zzz qqq"), (4, "el la los the a and is of")],
        "doc_id long, text string",
    )
    ea = OTX.lang_id(edge).toPandas().sort_values("doc_id").reset_index(drop=True)
    eb = OTX.lang_id_arrow(edge).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert ea.equals(eb)


def test_fingerprints_arrow_identical(spark, sf_dir):
    from geowave_spark.operators import text as OTX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = OTX.fingerprints(docs).toPandas().sort_values(["doc_id", "fp"]).reset_index(drop=True)
    b = OTX.fingerprints_arrow(docs).toPandas().sort_values(["doc_id", "fp"]).reset_index(drop=True)
    assert a.equals(b)


def test_hamming_pairs_closed_form(spark):
    """Generic banded hamming join (the phash/simhash shared machinery):
    known keys with pinned pairwise distances, pigeonhole validity check."""
    import pandas as pd
    import pytest

    from geowave_spark.operators import dedup as OD

    base = 0b1010_1100_0011_0101
    keys = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "k": [base, base ^ 0b1, base ^ 0b111, base ^ ((1 << 40) | (1 << 3))],
        }
    )
    df = spark.createDataFrame(keys)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in OD.hamming_pairs(df, "k", "doc_id", bits=60, chunks=4, max_hamming=3).collect()
    }
    # hamming(1,2)=1, (1,3)=3, (2,3)=2, (1,4)=2, (2,4)=3; (3,4) = 5 > 3 out
    assert got == {(1, 2): 1, (1, 3): 3, (2, 3): 2, (1, 4): 2, (2, 4): 3}
    with pytest.raises(ValueError, match="pigeonhole"):
        OD.hamming_pairs(df, "k", "doc_id", chunks=3, max_hamming=3)


def test_production_hash_path_finds_planted_dups(spark):
    """hash_impl='xxhash64' (the production base hash — codegen xxhash64
    instead of the oracle-parity md5+conv) must detect the same planted
    duplicates across all three sketch families; bad impl names rejected."""
    import pandas as pd
    import pytest

    from geowave_spark.operators import dedup as OD
    from geowave_spark.operators import text as OT

    texts = []
    for i in range(12):
        body = f"unique document {i} " + " ".join(
            f"tok{(i * 17 + j) % 50}" for j in range(30)
        )
        texts.append(body)
    # plant exact duplicates: 12..17 copy 0..5
    texts += texts[:6]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    want = {(i, i + 12) for i in range(6)}

    for impl in ("md5", "xxhash64"):
        mh = {
            (r.id_a, r.id_b)
            for r in OD.minhash_lsh_pairs(df, hash_impl=impl).collect()
        }
        assert want <= mh, f"minhash[{impl}] missed planted dups"
        sh = {
            (r.id_a, r.id_b): r.hamming
            for r in OD.simhash_pairs(df, hash_impl=impl).collect()
        }
        assert all(sh.get(p) == 0 for p in want), f"simhash[{impl}]"
        fp = OT.fingerprints(df, hash_impl=impl).toPandas()
        by_doc = fp.groupby("doc_id")["fp"].apply(set)
        for i in range(6):
            assert by_doc[i] == by_doc[i + 12], f"fingerprints[{impl}]"

    with pytest.raises(ValueError, match="hash_impl"):
        OT.base60_col(F.lit("x"), "sha1")
    with pytest.raises(ValueError, match="md5"):
        OD.minhash_lsh_pairs(df, engine="arrow", hash_impl="xxhash64")


def test_semdedup_plants_and_separates(spark):
    """SemDeDup: planted same-direction vectors group together (cos = 1
    within the same IVF bucket); orthogonal singletons stay kept; the
    keep decision is the component min id."""
    import pandas as pd

    dim = 8

    def vec(axis, scale):
        v = [0.0] * dim
        v[axis] = float(scale)
        return v

    rows = []
    # two planted duplicate families along distinct axes (cos=1 in-family,
    # 0 across), ids chosen so family members never straddle the
    # n_centroids=4 seed boundary
    for i, axis in ((4, 0), (5, 0), (6, 1), (7, 1)):
        rows.append((i, vec(axis, 1.0 + 0.25 * i), 0))
    # seeds/centroids 0..3: orthogonal-ish singletons on axes 2..5
    for i, axis in ((0, 2), (1, 3), (2, 4), (3, 5)):
        rows.append((i, vec(axis, 2.0), 0))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    got = {
        r.vec_id: (r.group_id, r.keep)
        for r in OE.semdedup(emb, n_centroids=4, tau=0.9).collect()
    }
    assert got[4] == (4, True) and got[5] == (4, False)
    assert got[6] == (6, True) and got[7] == (6, False)
    for i in range(4):
        assert got[i] == (i, True)
    # pair evidence: exactly the two in-family pairs at cos 1.0
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in OE.semdedup_pairs(emb, n_centroids=4, tau=0.9).collect()
    }
    assert set(pairs) == {(4, 5), (6, 7)}
    assert all(c == 1.0 for c in pairs.values())


def test_prototypicality_closed_form(spark):
    """A vector that IS a centroid has proto_cos == 1.0 and ranks first in
    its bucket (pruned at any positive frac); orthogonal vectors score 0."""
    from geowave_spark.operators import embed as OE

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid 1
        (2, [1.0, 0.0, 0.0, 0.0]),   # == centroid 0 -> cos 1.0
        (3, [0.8, 0.6, 0.0, 0.0]),   # nearer centroid 0, cos 0.8
        (4, [0.0, 0.8, 0.6, 0.0]),   # nearer centroid 1, cos 0.8
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p = {r["vec_id"]: r for r in OE.prototypicality(emb, n_centroids=2).collect()}
    assert p[0]["proto_cos"] == 1.0 and p[0]["bucket"] == 0
    assert p[2]["proto_cos"] == 1.0 and p[2]["bucket"] == 0
    assert abs(p[3]["proto_cos"] - 0.8) < 1e-4 and p[3]["bucket"] == 0
    assert abs(p[4]["proto_cos"] - 0.8) < 1e-4 and p[4]["bucket"] == 1

    # frac=0.4: bucket 0 has 3 members -> drop floor(3*0.4)=1 (the most
    # prototypical, ties by id -> vec 0); bucket 1 has 2 -> drop 0
    k = {r["vec_id"]: r["keep"] for r in
         OE.prototype_prune(emb, prune_frac=0.4, n_centroids=2).collect()}
    assert k == {0: False, 1: True, 2: True, 3: True, 4: True}


def test_incremental_dedup_planted(spark):
    """New-batch-vs-corpus semantics: a batch copy of a corpus doc is
    flagged hit_corpus; within-batch copies keep only the smallest id
    (first-occurrence blocking); sub-shingle-length docs have no band
    keys and are always kept; the precomputed corpus_bands path (the
    stored-index production shape) returns the identical result."""
    import pandas as pd

    def body(i):
        # per-doc-disjoint token sets: only planted copies can collide
        return f"document {i} " + " ".join(f"d{i}w{j}" for j in range(30))

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [body(0), body(1), body(2)]})
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13, 14],
                "text": [
                    body(1),   # 10: copy of corpus doc 1
                    body(50),  # 11: unique -> keep
                    body(60),  # 12: first of a within-batch pair -> keep
                    body(60),  # 13: copy of 12 -> hit_batch
                    "xy",      # 14: < SHINGLE_N tokens -> no bands, keep
                ],
            }
        )
    )
    got = {
        int(r.doc_id): (bool(r.hit_corpus), bool(r.hit_batch), bool(r.keep))
        for r in OD.incremental_dedup(corpus, batch).collect()
    }
    assert got == {
        10: (True, False, False),
        11: (False, False, True),
        12: (False, False, True),
        13: (False, True, False),
        14: (False, False, True),
    }

    # stored-index path: pass band_keys(corpus) explicitly
    idx = OD.band_keys(corpus)
    got2 = {
        int(r.doc_id): (bool(r.hit_corpus), bool(r.hit_batch), bool(r.keep))
        for r in OD.incremental_dedup(None, batch, corpus_bands=idx).collect()
    }
    assert got2 == got


def test_leakage_safe_split_group_coherent(spark):
    """Every member of a near-dup group gets the SAME split (the whole
    point); weights normalize; re-salting re-draws; bad args rejected."""
    import pandas as pd

    groups = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "group_id": [0, 0, 0, 3, 4, 4],
                "keep": [True, False, False, True, True, False],
            }
        )
    )
    out = OD.leakage_safe_split(groups).toPandas()
    by_group = out.groupby("group_id")["split"].nunique()
    assert (by_group == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}

    # integer weights normalize to the same thresholds as fractions
    a = OD.leakage_safe_split(groups, weights=(90, 5, 5)).toPandas()
    b = OD.leakage_safe_split(groups, weights=(0.9, 0.05, 0.05)).toPandas()
    assert a.sort_values("doc_id").values.tolist() == \
        b.sort_values("doc_id").values.tolist()

    # a different salt is a fresh deterministic draw over the same groups
    c = OD.leakage_safe_split(groups, salt="split-v2").toPandas()
    assert (c.groupby("group_id")["split"].nunique() == 1).all()

    import pytest

    with pytest.raises(ValueError, match="one weight per name"):
        OD.leakage_safe_split(groups, weights=(1.0,), names=("train",))
    with pytest.raises(ValueError, match="positive"):
        OD.leakage_safe_split(groups, weights=(0.9, 0.0, 0.1))


def test_ann_recall_exhaustive_probe_is_perfect(spark, emb):
    """n_probes == n_centroids makes the IVF scan exhaustive, so recall
    and MRR are exactly 1.0 for every query — the closed-form anchor of
    the dial; fewer probes can only lower the metrics."""
    full = OE.ann_recall(emb, n_queries=4, k=5, n_probes=OE.IVF_N_CENTROIDS)
    rows = {int(r.q_id): (int(r.n_hits), float(r.recall), float(r.mrr1))
            for r in full.collect()}
    assert len(rows) == 4
    assert all(v == (5, 1.0, 1.0) for v in rows.values())

    # partial probe: pin the metric MATH by recomputing recall/mrr1 from
    # the two topk outputs directly (a probe-ranking regression that
    # degrades recall shows up here, unlike a bare recall <= 1.0 check)
    part = OE.ann_recall(emb, n_queries=4, k=5, n_probes=1)
    prows = {int(r.q_id): (int(r.n_hits), float(r.recall), float(r.mrr1))
             for r in part.collect()}
    exact = OE.cosine_topk(emb, n_queries=4, k=5).toPandas()
    approx = OE.ivf_topk(emb, n_queries=4, k=5, n_probes=1).toPandas()
    for q in rows:
        e = exact[exact.q_id == q]
        a = approx[approx.q_id == q]
        hits = set(e.vec_id) & set(a.vec_id)
        true1 = int(e[e["rank"] == 1].vec_id.iloc[0])
        ar = a[a.vec_id == true1]["rank"]
        want_mrr = round(1.0 / int(ar.iloc[0]), 6) if len(ar) else 0.0
        assert prows[q] == (len(hits), round(len(hits) / len(e), 6), want_mrr)


def test_pq_codes_and_adc_exact_on_codewords(spark, sf_dir):
    """PQ invariants: (1) a codebook-seed vector encodes to its own
    codeword in every subspace (d2 = 0 argmin); (2) for query AND
    candidate both inside the seed set, the ADC distance equals the
    EXACT quantized L2 distance (each sub-code reconstructs the
    candidate exactly, so the approximation error is zero)."""
    from geowave_spark.operators import embed as OE
    from geowave_spark.sources import tables as TB

    emb = TB.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    enc, cb = OE.pq_encode(emb)
    K = OE.PQ_K
    seeds = {r.vec_id: r for r in enc.filter(F.col("vec_id") < K).collect()}
    for vid, r in seeds.items():
        assert list(r.codes) == [vid] * OE.PQ_M  # own subvector = argmin
    out = OE.pq_topk(emb, n_queries=8, k=600)  # k > corpus: every pair ranked
    rows = out.filter(F.col("vec_id") < K).collect()
    assert len(rows) == 8 * (K - 1)  # every (query, other-seed) pair present
    for r in rows:
        qv = list(seeds[r.q_id]["_qv"])
        vv = list(seeds[r.vec_id]["_qv"])
        exact = sum((a - b) * (a - b) for a, b in zip(qv, vv))
        assert r.ad2 == exact
