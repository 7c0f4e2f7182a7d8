"""Closed-form invariants for operators/corpus.py — the properties the
DuckDB oracle sweep (tests/test_oracles_all.py) cannot express: packing
contiguity/bucket-invariance, planted contamination recall, sampling-rate
determinism, and redaction idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import corpus as OC


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_contiguous_and_bucket_invariant(spark, docs):
    out = OC.pack_sequences(docs, block=64).orderBy("doc_id").toPandas()
    # the packed stream is gapless: each doc starts where the previous ended
    assert out.tok_start.iloc[0] == 0
    assert (
        out.tok_start.iloc[1:].values
        == (out.tok_start + out.n_tokens).iloc[:-1].values
    ).all()
    # block math: a doc spans exactly the sequences its token span covers
    assert (out.seq_first == out.tok_start // 64).all()
    assert (out.seq_last == (out.tok_start + out.n_tokens - 1) // 64).all()
    # the distributed prefix sum is a pure function of the data, not of the
    # bucket count (1 bucket = the naive single-window answer)
    for buckets in (1, 7):
        alt = (
            OC.pack_sequences(docs, block=64, buckets=buckets)
            .orderBy("doc_id")
            .toPandas()
        )
        assert (alt.tok_start.values == out.tok_start.values).all()


def test_pack_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "  .,!  "), (3, "gamma")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in OC.pack_sequences(df, block=2).collect()}
    assert set(out) == {1, 3}
    assert out[1].tok_start == 0 and out[1].n_tokens == 2
    assert out[3].tok_start == 2 and out[3].seq_first == 1


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_planted_overlap(spark):
    probe_text = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, f"prefix words {probe_text} suffix words"),  # contains the probe
            (2, "completely unrelated content with no shared substring run"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(100, probe_text)], "doc_id long, text string")
    out = {r.doc_id: r for r in OC.decontaminate(train, probes).collect()}
    assert out[1].contaminated == 1 and out[1].n_hits > 0
    assert out[2].contaminated == 0 and out[2].n_hits == 0


def test_decontaminate_broadcast_off_same_rows(docs):
    train = docs.filter(F.col("doc_id") % 17 != 0)
    probes = docs.filter(F.col("doc_id") % 17 == 0)
    a = sorted(map(tuple, OC.decontaminate(train, probes).collect()))
    b = sorted(
        map(tuple, OC.decontaminate(train, probes, broadcast_probes=False).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_closed_form(spark):
    # "a b a b a" -> bigrams [a b, b a, a b, b a]: top=2/4, distinct=2 -> dup 2/4
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w x y z")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in OC.repetition_stats(df).collect()}
    assert out[1].n_bigrams == 4 and out[1].top_bigram_n == 2
    assert out[1].top_ppm == 500_000 and out[1].dup_ppm == 500_000
    assert out[2].top_ppm == 333_333 and out[2].dup_ppm == 0


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------


def test_pii_counts_and_idempotent_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b@x.io and c@d.org ip 10.0.0.1 tel +1 555-123-4567")],
        "doc_id long, text string",
    )
    row = OC.pii_scrub(df).collect()[0]
    assert (row.n_email, row.n_ipv4, row.n_phone) == (2, 1, 1)
    # redacting already-redacted text is a no-op (tags match no pattern)
    red = "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"
    again = OC.pii_scrub(
        spark.createDataFrame([(1, red)], "doc_id long, text string")
    ).collect()[0]
    assert (again.n_email, again.n_ipv4, again.n_phone) == (0, 0, 0)
    from geowave_spark.operators.text import h64_col

    expect = (
        spark.range(1).select(h64_col(F.lit(red)).alias("h")).collect()[0].h
    )
    assert again.red_h == expect


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


def test_mixture_rates_and_determinism(docs):
    rates = {f"src{i}": (i % 5 + 1) / 5 for i in range(20)}
    out = OC.mixture_sample(docs, rates)
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in out.collect())
    assert a == b and 0 < len(a) < docs.count()
    # rate-1.0 domains keep every row; dropped domains keep none
    full = {f"src{i}" for i in range(20) if i % 5 == 4}
    kept = OC.mixture_sample(docs, rates).filter(F.col("source").isin(*full)).count()
    assert kept == docs.filter(F.col("source").isin(*full)).count()
    none = OC.mixture_sample(docs, {"src0": 0.0}).count()
    assert none == 0


# ---------------------------------------------------------------------------
# decontaminate_ngram / source_cap
# ---------------------------------------------------------------------------


def test_decontaminate_ngram_planted(spark):
    """A train doc sharing an exact 13-gram with a probe is flagged; a doc
    sharing only a 12-gram prefix is clean."""
    g13 = " ".join(f"w{i}" for i in range(13))
    g12 = " ".join(f"w{i}" for i in range(12))
    train = spark.createDataFrame(
        [
            (1, f"intro {g13} outro"),
            (2, f"prefix only {g12} x99 tail"),
            (3, "completely different text " * 5),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, f"the probe contains {g13} inside")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in OC.decontaminate_ngram(train, probes).collect()
    }
    assert got[1][1] == 1 and got[1][0] >= 1
    assert got[2] == (0, 0) and got[3] == (0, 0)


def test_source_cap_window_only_over_cap(spark):
    """Over-cap sources keep exactly cap docs ranked by quality; under-cap
    sources keep everything with rank 0 (no window paid)."""
    rows = [(i, f"the and is of to word{i} " * (i % 7 + 1), "big") for i in range(10)]
    rows += [(100 + i, "short text here", "small") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = OC.source_cap(docs, cap=4).toPandas()
    big = out[out.source == "big"]
    small = out[out.source == "small"]
    assert len(big) == 10 and big.keep.sum() == 4
    assert sorted(big[big.keep == 1]["rank"]) == [1, 2, 3, 4]
    assert (small.keep == 1).all() and (small["rank"] == 0).all()
    # deterministic: kept set stable across recompute
    again = OC.source_cap(docs, cap=4).toPandas()
    assert sorted(again[again.keep == 1].doc_id) == sorted(
        out[out.keep == 1].doc_id
    )


def test_shard_assign_invariants(spark, sf_dir):
    """Byte stream is gapless in key order; shards never split an item and
    overshoot by less than one item; bucket count does not change the
    assignment (it's a parallelism dial, not a semantics dial)."""
    from collections import defaultdict

    from geowave_spark.operators import corpus as OC
    from geowave_spark.sources import tables as TB

    docs = TB.load_tables(spark, sf_dir, names=("documents",))["documents"]
    sized = docs.select("doc_id", F.length("text").alias("nbytes"))
    a = OC.shard_assign(sized, "nbytes", shard_bytes=1 << 14, id_col="doc_id")
    rows = a.collect()
    assert rows

    # gapless: sorted by byte_start, each row starts where the previous ended
    srt = sorted(rows, key=lambda r: r["byte_start"])
    acc = 0
    for r in srt:
        assert r["byte_start"] == acc
        assert r["shard_id"] == r["byte_start"] // (1 << 14)
        acc += r["size"]

    # overshoot bound: shard byte total < shard_bytes + max item size
    by_shard = defaultdict(int)
    for r in rows:
        by_shard[r["shard_id"]] += r["size"]
    max_item = max(r["size"] for r in rows)
    assert len(by_shard) > 2
    assert all(t < (1 << 14) + max_item for t in by_shard.values())

    b = OC.shard_assign(
        sized, "nbytes", shard_bytes=1 << 14, id_col="doc_id", buckets=7
    )
    assert {(r["doc_id"], r["shard_id"]) for r in b.collect()} == {
        (r["doc_id"], r["shard_id"]) for r in rows
    }


def test_export_shards_roundtrip(spark, sf_dir, tmp_path):
    """Shard export: every row lands in its assigned shard directory, the
    manifest matches the written data, and per-shard files are ordered by
    the assignment's byte order."""
    from geowave_spark.operators import corpus as OC
    from geowave_spark.sources import tables as TB

    docs = TB.load_tables(spark, sf_dir, names=("documents",))["documents"]
    sized = docs.select("doc_id", "text", F.length("text").alias("nbytes"))
    a = OC.shard_assign(sized, "nbytes", shard_bytes=1 << 14, id_col="doc_id")
    path = str(tmp_path / "shards")
    man = OC.export_shards(
        sized.select("doc_id", "text"), a, path, id_col="doc_id"
    ).collect()

    back = spark.read.parquet(path)
    assert back.count() == sized.filter(F.length("text") > 0).count()
    got = {
        (r["shard_id"], r["doc_id"]) for r in back.select("shard_id", "doc_id").collect()
    }
    want = {(r["shard_id"], r["doc_id"]) for r in a.collect()}
    assert got == want
    by_shard = {r["shard_id"]: r for r in man}
    from collections import Counter

    counts = Counter(s for s, _ in got)
    assert {s: r["n_items"] for s, r in by_shard.items()} == dict(counts)

    # on-disk order IS the sample order: physical row order of each shard
    # file is ascending byte_start (read per-file via pyarrow — a Spark
    # read may reorder across files/splits)
    import os

    import pyarrow.parquet as pq

    starts = {r["doc_id"]: r["byte_start"] for r in a.collect()}
    checked = 0
    for d in os.listdir(path):
        if not d.startswith("shard_id="):
            continue
        for f in os.listdir(os.path.join(path, d)):
            if f.startswith((".", "_")):
                continue
            ids = pq.read_table(
                os.path.join(path, d, f), columns=["doc_id"]
            )["doc_id"].to_pylist()
            bs = [starts[i] for i in ids]
            assert bs == sorted(bs), f"unsorted shard file {d}/{f}"
            checked += len(ids)
    assert checked == len(got)


def test_shard_assign_null_id_raises(spark):
    """A null id must abort loudly (never silently dropped or misordered)."""
    from geowave_spark.operators import corpus as OC

    rows = [("a", 10), (None, 5), ("b", 7)]
    df = spark.createDataFrame(rows, "doc_id string, nbytes long")
    with pytest.raises(Exception, match="null order key"):
        OC.shard_assign(df, "nbytes", id_col="doc_id").collect()


def test_chunk_documents_windows(spark):
    """Window arithmetic: stride/overlap coverage, short and empty docs
    kept as exactly one chunk, consecutive chunks sharing `overlap`
    tokens, validation of bad overlap."""
    import pytest

    from geowave_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only two"),
            (3, ""),
            (4, " ".join(f"u{i}" for i in range(5))),   # exactly one window
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=5, overlap=2)
    rows = sorted(
        ((r.doc_id, r.chunk_ix, r.n_chunk_tokens, r.chunk_text) for r in out.collect())
    )
    by_doc = {}
    for d, ix, n, txt in rows:
        by_doc.setdefault(d, []).append((ix, n, txt))
    # doc 1: stride 3 → ceil((10-2)/3) = 3 chunks; last clamps to 4 tokens
    assert [x[:2] for x in by_doc[1]] == [(0, 5), (1, 5), (2, 4)]
    c0, c1 = by_doc[1][0][2].split(), by_doc[1][1][2].split()
    assert c0[-2:] == c1[:2]  # overlap tokens shared
    assert by_doc[2] == [(0, 2, "only two")]
    assert by_doc[3] == [(0, 0, "")]
    assert by_doc[4] == [(0, 5, "u0 u1 u2 u3 u4")]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
