"""Byte-pair encoder (functions/bpe.py): golden merge sequence on a tiny
hand-checked corpus, encode/count properties, and the tokenizer= hooks on
pack_sequences / token_stats / chunk_documents."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import bpe as BPE


def test_train_golden_sequence():
    # Sennrich's classic shape: {low:5, lower:2, newest:6, widest:3}
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = BPE.train_bpe(freqs, 4)
    # (e,s) and (s,t</w>) both occur 9x (newest+widest); the lexicographic
    # tie-break picks (e,s), then est</w> completes at 9, then (l,o) at 7,
    # then the 6-way tie (e,w)/(n,e)/(w,est</w>) resolves to (e,w)
    assert merges == [("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")]
    tok = BPE.BpeTokenizer(merges)
    assert tok.encode("low") == ["lo", "w</w>"]
    assert tok.encode("newest") == ["n", "ew", "est</w>"]
    assert tok.encode("widest") == ["w", "i", "d", "est</w>"]
    assert tok.encode("unseen") == ["u", "n", "s", "e", "e", "n</w>"]


def test_train_deterministic_and_encode_consistency():
    rng = np.random.RandomState(0)
    words = ["".join(rng.choice(list("abcd"), rng.randint(1, 8)))
             for _ in range(200)]
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    m1 = BPE.train_bpe(dict(freqs), 30)
    m2 = BPE.train_bpe(dict(sorted(freqs.items(), reverse=True)), 30)
    assert m1 == m2  # input dict order cannot matter
    tok = BPE.BpeTokenizer(m1)
    for w in words:
        enc = tok.encode(w)
        # segmentation covers the word exactly
        assert "".join(enc) == "".join(BPE.word_symbols(w))
        assert tok.count_word(w) == len(enc)
    # merges can only shorten
    assert all(len(tok.encode(w)) <= len(w) for w in words)


def test_count_text_matches_per_word_sum():
    tok = BPE.BpeTokenizer(BPE.train_bpe({"spark": 4, "park": 3, "spa": 2}, 6))
    text = "Spark park!  spa spark"
    from geowave_spark.operators.text import py_tokens

    assert tok.count_text(text) == sum(
        len(tok.encode(w)) for w in py_tokens(text)
    )


def test_count_col_matches_python(spark):
    rows = [(i, f"spark park spa word{i % 3} spark") for i in range(40)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = BPE.BpeTokenizer(
        BPE.train_bpe({"spark": 4, "park": 3, "spa": 2, "word0": 2}, 8)
    )
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", tok.count_col(F.col("text")).alias("n")).collect()}
    for i, text in rows:
        assert got[i] == (tok.count_text(text) if text is not None else 0)


def test_pack_and_stats_tokenizer_hooks(spark):
    from geowave_spark.operators import text as OTX
    from geowave_spark.operators.corpus import chunk_documents, pack_sequences

    rows = [(i, "spark " * (i + 1) + "park", "s1") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tok = BPE.BpeTokenizer(BPE.train_bpe({"spark": 9, "park": 9}, 2))
    packed = {r["doc_id"]: r for r in
              pack_sequences(df, block=8, tokenizer=tok).collect()}
    exp_counts = {i: tok.count_text(t) for i, t, _ in rows}
    run = 0
    for i in range(8):
        assert packed[i]["n_tokens"] == exp_counts[i]
        assert packed[i]["tok_start"] == run
        assert packed[i]["seq_first"] == run // 8
        run += exp_counts[i]
    stats = OTX.token_stats(df, tokenizer=tok).collect()[0]
    assert stats["total_bpe_tokens"] == sum(exp_counts.values())
    chunks = chunk_documents(df, chunk_tokens=4, overlap=1,
                             tokenizer=tok).collect()
    for c in chunks:
        assert c["n_chunk_bpe_tokens"] == tok.count_text(c["chunk_text"])
