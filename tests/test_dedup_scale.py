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


def test_neardup_q_exact_subset_and_recall(spark, emb):
    """Quantizer-blocked pairs are a SUBSET of brute-force tau-pairs with
    bit-identical cosines, unique per pair, at recall >= 0.7 (tau=0.30 is a
    weak-similarity regime; true near-dup thresholds collide harder)."""
    got = OE.neardup_pairs_q(emb).toPandas()
    # brute force over the same fixed-point arithmetic
    pdf = emb.toPandas()
    def half_away(v):  # Spark ROUND semantics (numpy rounds half-to-even)
        return np.sign(v) * np.floor(np.abs(v) + 0.5)

    q = np.stack(
        [half_away(np.asarray(v, dtype=np.float64) * OE.QUANT).astype(np.int64)
         for v in pdf.embedding]
    )
    ids = pdf.vec_id.to_numpy()
    dots = q @ q.T
    norms = np.sqrt((q * q).sum(axis=1, dtype=np.int64).astype(np.float64))
    cos = np.round(dots / np.outer(norms, norms), 6)
    iu = np.triu_indices(len(ids), k=1)
    mask = cos[iu] >= OE.NEARDUP_TAU
    true_pairs = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): float(cos[i, j])
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    got_pairs = {(int(r.id_a), int(r.id_b)): float(r.cos) for r in got.itertuples()}
    assert len(got_pairs) == len(got), "multiprobe must not duplicate pairs"
    for p, c in got_pairs.items():
        assert p in true_pairs and abs(true_pairs[p] - c) < 1e-9
    recall = len(got_pairs) / max(len(true_pairs), 1)
    assert recall >= 0.7, f"recall {recall:.2f}"


def test_neardup_q_bucket_fanout_bounded(spark, emb):
    """Candidate generation is bounded by bucket occupancy, not |N|^2: the
    probe explode emits exactly 1 + P + C(P,2) rows per vector."""
    base = emb.select(
        "vec_id", OE.quant_col(F.col("embedding")).alias("_qv")
    ).withColumn("_bkt", OE.quantizer_bucket_col("_qv", 64, OE.IVF_PLANES))
    n = emb.count()
    masks = OE._probe_masks(OE.IVF_PLANES, 2)
    probes = F.array(
        *[F.col("_bkt").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
    )
    exploded = base.withColumn("_p", F.explode(probes))
    assert exploded.count() == n * len(masks)
    # buckets genuinely shard the corpus (no single bucket holds everything)
    occ = base.groupBy("_bkt").count().toPandas()
    assert occ["count"].max() < n
    assert len(occ) > 1


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


def test_fingerprints_arrow_identical(spark, sf_dir):
    from geowave_spark.operators import text as OTX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = OTX.fingerprints(docs).toPandas().sort_values(["doc_id", "fp"]).reset_index(drop=True)
    b = OTX.fingerprints_arrow(docs).toPandas().sort_values(["doc_id", "fp"]).reset_index(drop=True)
    assert a.equals(b)
