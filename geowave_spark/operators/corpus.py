"""Training-corpus preparation operators beyond the dedup/sketch family:
sequence packing, benchmark decontamination, repetition (quality) stats,
PII detection/redaction, and deterministic mixture sampling.

GeoWave has no corpus surface (its closest analogue is residual attribute
filtering, extensions/adapters/vector/.../query/cql/CQLQueryFilter.java);
these are the operations a 100 TB LLM training-data pipeline runs between
ingest and tokenization.  Design rules shared with operators/text.py:

* hot paths are Catalyst column expressions / plain joins+aggregates
  (whole-stage codegen, map-side partials, no Python workers);
* every operator has a deterministic DuckDB-replayable definition
  (integer arithmetic end-to-end) so the oracle sweep covers it exactly;
* no driver-side loops, no collect over row-scale data — the only driver
  traffic is a bounded per-bucket offset table in :func:`pack_sequences`
  (≤ ``buckets`` rows by construction, independent of corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.functions.cols import let
from geowave_spark.operators import text as OTX

# ---------------------------------------------------------------------------
# Sequence packing (GPT-style: concatenate the corpus in deterministic id
# order, cut into fixed token blocks)
# ---------------------------------------------------------------------------

PACK_BLOCK = 2048
PACK_BUCKETS = 1024


def bucketed_prefix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    val: Column | None,
    buckets: int,
    part_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``df`` + ``_prefix`` (exact running total of ``val`` — or running row
    COUNT when ``val`` is None — over rows ordered by ``order_cols`` within
    each ``part_cols`` group) + ``_ptot`` (the group's grand total).

    THE distributed exact prefix-sum shape shared by sequence packing,
    shard assignment and aspect-batch bucketing — never a global-order
    window (one partition at 10^12 rows): the numeric ``key_col`` is
    range-bucketed by value, per-(group, bucket) totals (≤ groups×buckets
    rows) prefix-sum on the driver, the within-bucket cumulative is a
    bounded per-bucket window.  Three jobs: key bounds, bucket totals, the
    output pass.  A null order key raises (never silently drops/misorders
    a row); callers filter intentional exclusions themselves."""
    guard = F.when(
        F.col(key_col).isNull(),
        F.expr(
            f"raise_error('bucketed_prefix: null order key {key_col}')"
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    df = df.filter(guard)
    lo, hi = df.agg(F.min(key_col), F.max(key_col)).first()
    if lo is None:  # empty input: schema-stable, zero rows
        return df.withColumn("_prefix", F.lit(None).cast("long")).withColumn(
            "_ptot", F.lit(None).cast("long")
        )
    span = max(1, -(-(hi - lo + 1) // buckets))  # ceil div
    b = df.withColumn(
        "_bkt", ((F.col(key_col) - F.lit(lo)) / F.lit(span)).cast("long")
    ).withColumn("_v", F.lit(1).cast("long") if val is None else val)
    gb = list(part_cols) + ["_bkt"]
    totals = sorted(
        b.groupBy(*gb).agg(F.sum("_v").alias("t")).collect(),
        key=lambda r: tuple(r[c] for c in gb),
    )
    acc: dict[tuple, int] = {}
    offs = []
    for r in totals:
        pk = tuple(r[c] for c in part_cols)
        offs.append((pk, r["_bkt"], acc.get(pk, 0)))
        acc[pk] = acc.get(pk, 0) + r["t"]
    schema_parts = [
        f"{c} {df.schema[c].dataType.simpleString()}" for c in part_cols
    ] + ["_bkt long", "_off long", "_ptot long"]
    off = df.sparkSession.createDataFrame(
        [pk + (bkt, o, acc[pk]) for pk, bkt, o in offs],
        ", ".join(schema_parts),
    )
    w = (
        Window.partitionBy(*gb)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(off), gb)
        .withColumn(
            "_prefix", F.col("_off") + F.coalesce(F.sum("_v").over(w), F.lit(0))
        )
        .drop("_bkt", "_v", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    block: int = PACK_BLOCK,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = PACK_BUCKETS,
    tokenizer=None,
) -> DataFrame:
    """Assign every document its token span in the packed training stream.

    The stream is the concatenation of all documents in ascending ``id_col``
    order, cut into ``block``-token sequences.  Output per document:
    ``(id, n_tokens, tok_start, seq_first, seq_last)`` — which sequences the
    document lands in and where.  Empty documents (0 tokens) are dropped.

    Scale shape: the shared :func:`bucketed_prefix` machinery — a
    distributed exact prefix sum with NO global-order window; three jobs
    total, all scanning only the two pruned columns.
    """
    # tokenizer=None: regex word counts (pure Catalyst).  A
    # functions/bpe.BpeTokenizer swaps in subword counts via its Arrow-
    # batched count_col — the packing machinery downstream is unchanged,
    # which is the point of the pluggable hook: capacity numbers from the
    # REAL segmentation, same three-job distributed prefix sum.
    n_tok = (
        F.size(OTX.tokens_col(F.col(text_col))) if tokenizer is None
        else tokenizer.count_col(F.col(text_col))
    )
    counts = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        n_tok.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    return bucketed_prefix(
        counts, id_col, [id_col], F.col("n_tokens"), buckets
    ).select(
        id_col,
        "n_tokens",
        F.col("_prefix").alias("tok_start"),
        (F.col("_prefix") / block).cast("long").alias("seq_first"),
        ((F.col("_prefix") + F.col("n_tokens") - 1) / block)
        .cast("long")
        .alias("seq_last"),
    )


def pack_sequences_oracle(table: str = "documents", block: int = PACK_BLOCK) -> str:
    toks = OTX.duck_tokens("text")
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table}
),
p AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {block} AS seq_first,
       (tok_start + n_tokens - 1) // {block} AS seq_last
FROM p
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (winnowing-fingerprint overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "md5",
    broadcast_probes: bool = True,
) -> DataFrame:
    """Flag training documents whose text overlaps an eval/benchmark set.

    Overlap test: shared winnowing fingerprints (operators/text.py KGRAM
    char grams, window-min selected) — the standard contamination check, a
    guaranteed-recall superset of exact KGRAM substring matches.  Output per
    training document: ``(id, n_hits, contaminated)`` where ``n_hits`` is
    the count of its distinct fingerprints that appear anywhere in the
    probe set.

    Scale shape: fingerprints are per-row array-local (no shuffle); the
    probe side (benchmark suites — thousands of documents vs billions of
    training rows) broadcasts, so the whole check is one map-side join plus
    one count aggregate.  ``broadcast_probes=False`` falls back to a
    shuffle equi-join for probe sets beyond broadcast size.
    """
    tf = OTX.fingerprints(train, text_col, id_col, hash_impl)
    pf = OTX.fingerprints(probes, text_col, id_col, hash_impl).select("fp").distinct()
    if broadcast_probes:
        pf = F.broadcast(pf)
    hits = tf.join(pf, "fp").groupBy(id_col).agg(F.count("*").alias("_n"))
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("_n", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def decontaminate_oracle(train_table: str, probe_table: str) -> str:
    tf = OTX.fingerprints_oracle(train_table)
    pf = OTX.fingerprints_oracle(probe_table)
    return f"""
WITH tf AS ({tf}),
pf AS (SELECT DISTINCT fp FROM ({pf})),
h AS (SELECT doc_id, COUNT(*) AS n FROM tf JOIN pf USING (fp) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM (SELECT doc_id FROM {train_table}) d LEFT JOIN h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style quality signals, integer ppm)
# ---------------------------------------------------------------------------


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-bigram repetition signals:

    * ``top_ppm``  — share (parts-per-million) of bigram occurrences taken
      by the single most frequent bigram (Gopher's "top n-gram fraction");
    * ``dup_ppm``  — share of bigram occurrences beyond each bigram's first
      (= 1 - distinct/total, "duplicate n-gram fraction").

    Documents with fewer than 2 tokens are dropped (no bigrams).  Integer
    ppm keeps the oracle comparison exact.

    Scale shape: the bigram list is built array-locally in one let-bound
    ``transform`` pass (no window/`lead` shuffle to order tokens), then one
    explode feeds two partial-aggregated groupBys — the canonical
    distributed frequency plan.
    """
    toks = OTX.tokens_col(F.col(text_col))
    bigrams = let(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
        ),
    )
    from geowave_spark.session import spread

    # bigram transform + explode is fan-out-dense: spread a 1-split source
    bg = (
        spread(docs.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), bigrams.alias("_bg"))
        .filter(F.size("_bg") >= 1)
        .select(id_col, F.explode("_bg").alias("bigram"))
    )
    per = bg.groupBy(id_col, "bigram").agg(F.count("*").alias("n"))
    stats = per.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.max("n").alias("top_bigram_n"),
        F.count("*").alias("_distinct"),
    )
    return stats.select(
        id_col,
        "n_bigrams",
        "top_bigram_n",
        F.expr("(1000000 * top_bigram_n) div n_bigrams").alias("top_ppm"),
        F.expr("(1000000 * (n_bigrams - _distinct)) div n_bigrams").alias("dup_ppm"),
    )


def repetition_stats_oracle(table: str = "documents") -> str:
    toks = OTX.duck_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
b AS (
  SELECT doc_id, list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS bigram
  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
  WHERE len(toks) >= 2
),
c AS (SELECT doc_id, bigram, COUNT(*) AS n FROM b GROUP BY doc_id, bigram),
s AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         CAST(MAX(n) AS BIGINT) AS top_bigram_n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_bigrams, top_bigram_n,
       (1000000 * top_bigram_n) // n_bigrams AS top_ppm,
       (1000000 * (n_bigrams - n_distinct)) // n_bigrams AS dup_ppm
FROM s
"""


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# One dialect-portable pattern per class: valid and identical under Java
# regex (Spark) and RE2 (DuckDB) — no lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}"
_PII = (("email", PII_EMAIL, "<EMAIL>"), ("ipv4", PII_IPV4, "<IP>"),
        ("phone", PII_PHONE, "<PHONE>"))


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and redact emails / IPv4 addresses / phone numbers.

    Output: ``(id, n_email, n_ipv4, n_phone, red_h)`` where ``red_h`` is
    the portable 60-bit hash of the fully redacted text (slim enough to
    hash-compare a 100 TB scrub without materializing the text twice).
    Redaction applies the class patterns in the fixed order above.  Pure
    per-row JVM regex work — embarrassingly parallel, no shuffle.
    """
    red: Column = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, tag in _PII:
        cols.append(F.regexp_count(text_col, F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, tag)
    cols.append(OTX.h64_col(red).alias("red_h"))
    return df.select(*cols)


def pii_scrub_oracle(table: str = "documents", text_expr: str = "text") -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat, _tag in _PII
    )
    red = text_expr
    for _name, pat, tag in _PII:
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    return f"""
SELECT doc_id, {counts}, {OTX.duck_h64(red)} AS red_h
FROM {table}
"""


# ---------------------------------------------------------------------------
# Deterministic mixture sampling
# ---------------------------------------------------------------------------

MIX_DENOM = 1_000_000


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """Deterministic per-domain downsampling to target mixture rates.

    Keeps a row iff ``h64(salt || id) mod 1e6 < rate[domain] * 1e6`` — a
    pure function of (id, salt), so the sample is reproducible, resumable,
    and consistent across reruns/partitions (no RNG state).  Domains absent
    from ``rates`` are dropped (inner join).

    Scale shape: the rate table is a broadcast dim join (thousands of
    domains vs billions of rows); the keep test is codegen integer math.
    """
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(k, int(round(r * MIX_DENOM))) for k, r in sorted(rates.items())],
        f"{key_col} string, _thresh long",
    )
    u = OTX.h64_col(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % MIX_DENOM
    return (
        docs.join(F.broadcast(dim), key_col)
        .filter(u < F.col("_thresh"))
        .drop("_thresh")
    )


# ---------------------------------------------------------------------------
# Cross-modal near-dup (image phash ∧ caption simhash)
# ---------------------------------------------------------------------------


def crossmodal_pairs(
    images: DataFrame,
    docs: DataFrame,
    phash_col: str = "phash",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs that are near-duplicates in BOTH modalities of the
    image+caption input shape: perceptual-hash hamming ≤ dedup.SIM_MAX_HAMMING
    on the image AND simhash hamming ≤ the same bound on the caption — the
    conjunctive dedup a multimodal corpus runs before training.

    Plan (the 100 TB shape): the image side is the cheap filter — one
    banded hamming self-join over the stored int64 ``phash`` column (no
    decode, no text scan).  Caption simhash — the expensive per-token
    signature — is then computed ONLY for ids appearing in some image pair
    (semi-join pushdown), and the text distance is a direct per-pair
    popcount lookup join, not a second banding self-join.  Output:
    ``(id_a, id_b, img_hamming, txt_hamming)``.
    """
    from geowave_spark.operators import dedup as OD

    ip = OD.hamming_pairs(images, phash_col, id_col).withColumnRenamed(
        "hamming", "img_hamming"
    )
    ids = (
        ip.select(F.col("id_a").alias(id_col))
        .union(ip.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # Arrow signature twin (bit-identical to the Catalyst formulation,
    # cross-tested in test_dedup_scale) — the same engine choice the
    # standalone simhash_pairs query ships with
    sigs = OD.simhash_arrow(docs.join(ids, id_col, "leftsemi"), text_col, id_col)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_ha"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_hb"))
    return (
        ip.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "txt_hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int"),
        )
        .filter(F.col("txt_hamming") <= OD.SIM_MAX_HAMMING)
        .select(
            "id_a", "id_b", F.col("img_hamming").cast("int").alias("img_hamming"),
            "txt_hamming",
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram decontamination (the GPT-3 appendix-C method: flag training
# docs sharing any exact 13-gram with an eval set — the sibling of the
# winnowing-fingerprint check above, zero-miss for exact n-gram overlap)
# ---------------------------------------------------------------------------

DECON_NGRAM_N = 13


def decontaminate_ngram(
    train: DataFrame,
    probes: DataFrame,
    n: int = DECON_NGRAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "md5",
    broadcast_probes: bool = True,
) -> DataFrame:
    """(id, n_hits, contaminated) per training doc by exact word-``n``-gram
    overlap with the probe set.

    Same scale shape as :func:`decontaminate` (per-row gram arrays — no
    shuffle — a broadcast semi-join on the hashed gram, one aggregate); the
    winnowing variant is the recall-superset screen, this is the exact
    classical criterion.  Grams are hashed to 60-bit ints before the join
    so the broadcast/shuffle carries longs, not 13-word strings.
    """
    from geowave_spark.operators.dedup import shingles_from_tokens

    from geowave_spark.session import spread

    def grams(df):
        # per-gram hashing is fan-out-dense: spread a single-split source
        toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), OTX.tokens_col(F.col(text_col)).alias("_toks")
        )
        sh = toks.select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_g"),
        )
        return sh.select(
            F.col(id_col), OTX.base60_col(F.col("_g"), hash_impl).alias("_gh")
        ).distinct()

    pg = grams(probes).select("_gh").distinct()
    if broadcast_probes:
        pg = F.broadcast(pg)
    hits = grams(train).join(pg, "_gh").groupBy(id_col).agg(
        F.count("*").alias("_n")
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("_n", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def decontaminate_ngram_oracle(
    train_table: str, probe_table: str, n: int = DECON_NGRAM_N
) -> str:
    from geowave_spark.operators.dedup import duck_shingles

    gh = OTX.duck_h64("g.g")

    def grams(table: str) -> str:
        return f"""
SELECT DISTINCT doc_id, {gh} AS gh
FROM (SELECT doc_id, {duck_shingles("text", n)} AS gs FROM {table}) t,
     LATERAL unnest(t.gs) AS g(g)
"""

    return f"""
WITH tg AS ({grams(train_table)}),
pg AS (SELECT DISTINCT gh FROM ({grams(probe_table)})),
h AS (SELECT doc_id, COUNT(*) AS n FROM tg JOIN pg USING (gh) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM (SELECT doc_id FROM {train_table}) d LEFT JOIN h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Per-source caps (domain caps in a web corpus: keep the top-N docs per
# source by quality rank — the C4/RefinedWeb-style over-represented-domain
# control, after mixture_sample sets the coarse rates)
# ---------------------------------------------------------------------------


def source_cap(
    docs: DataFrame,
    cap: int,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, source, rank, keep) — rank 0 for under-cap sources: within each source, rank docs by the
    deterministic quality composite (operators/text.quality_score,
    descending; ties by id ascending) and keep the top ``cap``.

    One shuffle on the source key; the rank window partitions by source —
    at web scale a single domain can be huge, so the cap short-circuits:
    rows are pre-filtered by a per-source count so only sources OVER the
    cap pay the sort (under-cap sources — the long tail, almost all of
    them — skip the window entirely via a broadcast anti-join shape).
    """
    from geowave_spark.operators.text import quality_score

    q = quality_score(docs, id_col=id_col).select(id_col, "quality")
    scored = docs.select(id_col, by).join(q, id_col)

    counts = scored.groupBy(by).agg(F.count("*").alias("_n"))
    over = counts.filter(F.col("_n") > cap).select(by)
    # long tail: under-cap sources keep everything, no window
    under = scored.join(F.broadcast(over), by, "left_anti").select(
        F.col(id_col), F.col(by), F.lit(0).cast("int").alias("rank"),
        F.lit(1).alias("keep"),
    )
    w = Window.partitionBy(by).orderBy(F.col("quality").desc(), F.col(id_col).asc())
    capped = (
        scored.join(F.broadcast(over), by)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            F.col(id_col), F.col(by), "rank",
            (F.col("rank") <= cap).cast("int").alias("keep"),
        )
    )
    return under.unionByName(capped)


def source_cap_oracle(table: str, cap: int) -> str:
    from geowave_spark.operators.text import quality_score_oracle

    return f"""
WITH q AS ({quality_score_oracle(table)}),
scored AS (
  SELECT d.doc_id, d.source, q.quality
  FROM {table} d JOIN q USING (doc_id)
),
counts AS (SELECT source, COUNT(*) AS n FROM scored GROUP BY source)
SELECT s.doc_id, s.source,
       CASE WHEN c.n > {cap}
            THEN CAST(ROW_NUMBER() OVER (
                   PARTITION BY s.source
                   ORDER BY CASE WHEN c.n > {cap} THEN s.quality END DESC,
                            s.doc_id ASC) AS INTEGER)
            ELSE 0 END AS rank,
       CASE WHEN c.n <= {cap} THEN 1
            WHEN ROW_NUMBER() OVER (
                   PARTITION BY s.source
                   ORDER BY CASE WHEN c.n > {cap} THEN s.quality END DESC,
                            s.doc_id ASC) <= {cap} THEN 1
            ELSE 0 END AS keep
FROM scored s JOIN counts c USING (source)
"""


SHARD_BYTES = 1 << 28  # 256 MB nominal shard


def shard_assign(
    items: DataFrame,
    size_col: str,
    shard_bytes: int = SHARD_BYTES,
    id_col: str = "image_id",
    buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """WebDataset-style shard assignment for a training-sample export:
    items concatenate in ``h64(id)`` order (cross-engine-deterministic
    pseudo-shuffle — training shards WANT decorrelated neighbors, and the
    same md5 key is replayable in SQL) and an item belongs to
    ``floor(byte_start / shard_bytes)`` — items are never split, so a
    shard overshoots by at most one item (the parallel-exact "block-cut"
    variant of greedy sharding; greedy close-at-limit is a sequential
    scan by definition and CANNOT be computed distributed-exactly).
    Output: ``(id, size, byte_start, shard_id)``.

    Scale shape: the shared :func:`bucketed_prefix` machinery (exact byte
    prefix SUM over h64-range buckets; never a global-order window).  A
    null id raises inside the helper — never silently dropped or
    misordered.  The downstream writer partitions by ``shard_id`` (one
    directory per shard) and the manifest is one tiny groupBy."""
    from geowave_spark.operators.text import h64_col

    sized = items.select(
        F.col(id_col),
        F.col(size_col).cast("long").alias("_sz"),
        h64_col(F.col(id_col).cast("string")).alias("_key"),
    ).filter(F.col("_sz") > 0)
    return bucketed_prefix(
        sized, "_key", ["_key", id_col], F.col("_sz"), buckets
    ).select(
        id_col,
        F.col("_sz").alias("size"),
        F.col("_prefix").alias("byte_start"),
        (F.col("_prefix") / shard_bytes).cast("long").alias("shard_id"),
    )


def shard_manifest(assigned: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-shard manifest (the lineage/metrics record a resumable export
    keeps next to its shards): item count, byte total, plain id range
    (``min_id``/``max_id`` — NOT a sample-order cursor: shard order is the
    h64 pseudo-shuffle, deliberately decorrelated from ids; resume from
    ``byte_span_end``, which IS the sample-order position)."""
    return assigned.groupBy("shard_id").agg(
        F.count("*").alias("n_items"),
        F.sum("size").alias("n_bytes"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        (F.max(F.col("byte_start") + F.col("size"))).alias("byte_span_end"),
    )


def export_shards(
    items: DataFrame,
    assigned: DataFrame,
    path: str,
    id_col: str = "image_id",
) -> DataFrame:
    """Materialize a shard_assign plan: payload rows land partitioned by
    ``shard_id`` (one directory per shard — the unit a training loader
    streams), each shard's rows sorted by the assignment's byte order so
    the on-disk order IS the sample order; the per-shard manifest is
    co-written at ``<path>/_manifest`` (the resumable-export lineage
    record, same role as the indexed store's ``_stats``).  Returns the
    manifest."""
    # sever the assignment plan once: both the export write and the
    # manifest consume it, and without this each would re-run the full
    # h64 window/prefix pass over the corpus
    assigned = assigned.select(id_col, "size", "byte_start", "shard_id").localCheckpoint()
    joined = items.join(assigned.select(id_col, "byte_start", "shard_id"), id_col)
    (
        joined.repartition(F.col("shard_id"))
        # sort prefix MUST start with the write's partition column:
        # FileFormatWriter requires [shard_id] ordering and would insert
        # its own non-stable sort on top of a bare byte_start sort,
        # scrambling within-shard order whenever that sort spills
        .sortWithinPartitions("shard_id", "byte_start")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    man = shard_manifest(assigned, id_col=id_col).localCheckpoint()
    man.write.mode("overwrite").parquet(f"{path}/_manifest")
    return man


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Split each document's token stream into fixed-size windows with
    ``overlap`` tokens of overlap (stride = chunk_tokens - overlap) — the
    standard retrieval/embedding chunking pass of an LLM data pipeline.

    Output per (doc, window): ``(id, chunk_ix, n_chunk_tokens,
    chunk_text)`` with chunk_text the space-joined canonical tokens (the
    same tokenization every other text operator uses, so chunk counts
    line up with pack_sequences/token stats).  A document with fewer
    tokens than a window (including zero) yields exactly one chunk —
    every input row stays represented.

    Scale shape: one Generate barrier binds the token array (computed
    ONCE per row — the re-inlining trap from the working notes), then a
    bounded ``sequence()`` explode per document (fan-out = its chunk
    count) and pure array slicing.  No shuffle at all: chunking is
    embarrassingly row-parallel."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens (got {overlap}, {chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    base = docs.select(
        F.col(id_col),
        # 1-element explode = Generate barrier: the tokenization is a
        # runtime attribute, evaluated once, never re-inlined downstream
        F.explode(F.array(OTX.tokens_col(F.col(text_col)))).alias("_toks"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        (
            (F.greatest(F.lit(0), F.size("_toks") - overlap) + (stride - 1))
            / stride
        ).cast("long"),
    )
    d = base.withColumn(
        "chunk_ix", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    piece = F.expr(f"slice(_toks, chunk_ix * {stride} + 1, {chunk_tokens})")
    out_cols = [
        F.col(id_col),
        F.col("chunk_ix").cast("int").alias("chunk_ix"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    ]
    if tokenizer is not None:
        # chunk BOUNDARIES stay word-aligned by design (retrieval windows
        # cut between words); the subword count of each window is the
        # extra column a token-budgeted embedder needs
        out_cols.append(
            tokenizer.count_col(F.array_join(piece, " "))
            .alias("n_chunk_bpe_tokens")
        )
    return d.select(*out_cols)


def chunk_documents_oracle(
    table: str = "documents", chunk_tokens: int = 64, overlap: int = 16
) -> str:
    stride = chunk_tokens - overlap
    toks = OTX.duck_tokens("text")
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM {table}),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0,
           greatest(1, (greatest(0, len(toks) - {overlap}) + {stride - 1})
                       // {stride}) - 1)) AS chunk_ix
  FROM d)
SELECT doc_id, CAST(chunk_ix AS INTEGER) AS chunk_ix,
       CAST(len(list_slice(toks, chunk_ix * {stride} + 1,
                           chunk_ix * {stride} + {chunk_tokens}))
            AS INTEGER) AS n_chunk_tokens,
       COALESCE(array_to_string(list_slice(toks, chunk_ix * {stride} + 1,
                                           chunk_ix * {stride} + {chunk_tokens}),
                                ' '), '') AS chunk_text
FROM c"""
