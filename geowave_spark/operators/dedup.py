"""Deduplication operators for training-data pipelines: exact hash dedup,
MinHash+LSH candidate pairs, SimHash near-dup pairs, and blocked n-gram
Jaccard similarity.

No analogue exists in the reference (GeoWave's DedupeFilter only removes
*index-induced* row duplicates, core/store/.../filter/DedupeFilter.java:28-60
— these are *content* dedup operators a 100 TB corpus pipeline needs).

Scale posture:
* exact dedup — one hash groupBy (map-side partial agg, AQE-coalesced);
* MinHash — signatures via ONE groupBy with H min-aggregates (no H-fold row
  blowup); LSH banding turns the quadratic pair problem into an equi-join on
  band keys (the standard sub-quadratic path at 10^12 docs);
* SimHash — 60 bit-sum aggregates in one pass, near-dup candidates via
  4-chunk banding (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 identical 15-bit chunk),
  then exact popcount filter — again equi-join, never cross join;
* Jaccard — exact set similarity restricted to a blocking key (source);
  production would add a document-frequency stoplist to bound hot-token
  join fan-out (skew: salting/AQE as with hot spatial cells).

Everything is JVM column math; hashes are the portable md5-based scheme of
operators/text.py so DuckDB oracles reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark.operators.text import (
    base60_col,
    duck_h64,
    duck_tokens,
    h64_col,
    tokens_col,
)


# Let-binding for column expressions (see functions/cols.let, the
# canonical copy) — re-exported here because the dedup sketches are where
# the trap was first measured and half the codebase imports it from here.
from geowave_spark.functions.cols import let  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def norm_col(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group documents by md5 of whitespace-normalized lower-cased text.
    Output: (dup_key, n_docs, canonical_id = min id per group)."""
    key = F.md5(norm_col(F.col(text_col)).cast("binary"))
    return (
        docs.withColumn("dup_key", key)
        .groupBy("dup_key")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def exact_dedup_oracle(table: str = "documents") -> str:
    return f"""
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS dup_key,
       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
FROM {table} GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Shingles (word n-grams)
# ---------------------------------------------------------------------------

SHINGLE_N = 3


def shingles_from_tokens(toks: Column, n: int = SHINGLE_N) -> Column:
    """Word ``n``-gram shingles from a *materialized* token-array column
    (empty if < n tokens — guarded because Spark's sequence() descends when
    stop < start).

    The tokens MUST be a plain column reference, not the tokenization
    expression inline: Catalyst re-inlines complex expressions into every
    lambda evaluation, turning shingling O(len²) per doc (measured 9×
    slower).  Callers project ``tokens_col(...)`` first."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_col(text: Column, n: int = SHINGLE_N) -> Column:
    """Convenience single-expression form (slow path — see
    :func:`shingles_from_tokens`); kept for small inputs/tests."""
    return shingles_from_tokens(tokens_col(text), n)


def duck_shingles(col: str, n: int = SHINGLE_N) -> str:
    toks = duck_tokens(col)
    return (
        f"list_transform(range(0, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i+1:i+{n}], ' '))"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Universal-hash family over the 60-bit md5 base: h_i(s) = (lo·P1ᵢ + hi·P2ᵢ
# + i) mod (2^61−1), with lo/hi the 30-bit halves.  ONE md5 per shingle +
# H cheap integer mixes (the classic k-permutation trick) instead of H md5
# calls; products stay < 2^62 so int64 never overflows (ANSI-safe), and the
# identical arithmetic runs in DuckDB.
MERSENNE61 = (1 << 61) - 1
_MIX = [
    (
        ((2654435761 * (2 * i + 1)) & 0x7FFFFFFF) | 1,
        ((2246822519 * (2 * i + 3)) & 0x7FFFFFFF) | 1,
    )
    for i in range(NUM_HASHES)
]


def _mix_col(base: Column, i: int) -> Column:
    p1, p2 = _MIX[i]
    lo = base.bitwiseAND(F.lit((1 << 30) - 1))
    hi = F.shiftright(base, 30)
    return (lo * F.lit(p1) + hi * F.lit(p2) + F.lit(i)) % F.lit(MERSENNE61)


def _duck_mix(base: str, i: int) -> str:
    p1, p2 = _MIX[i]
    return (
        f"((({base}) & {(1 << 30) - 1}) * {p1}"
        f" + (({base}) >> 30) * {p2} + {i}) % {MERSENNE61}"
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_impl: str = "md5",
) -> DataFrame:
    """(id, s0..s{H-1}) — H min-hashes over the distinct shingle set.

    A document's signature depends only on its own shingles, so this is a
    pure per-row array computation — NO explode, NO groupBy, no shuffle at
    all (the previous explode+16-min-aggregates formulation shuffled every
    (doc, shingle) pair).  tokens, shingles and the base hashes are
    let-bound (computed once per row); the H hash functions are integer
    mixes of the single base (see ``_MIX``).  ``hash_impl='xxhash64'`` =
    the production base hash (text.base60_col)."""
    sig = let(
        tokens_col(F.col(text_col)),
        lambda toks: let(
            F.array_distinct(shingles_from_tokens(toks)),
            lambda sh: let(
                F.transform(sh, lambda s: base60_col(s, hash_impl)),
                lambda base: F.struct(
                    *[
                        F.array_min(F.transform(base, lambda h: _mix_col(h, i))).alias(
                            f"s{i}"
                        )
                        for i in range(NUM_HASHES)
                    ]
                ),
            ),
        ),
    )
    from geowave_spark.session import spread

    # per-shingle hashing is fan-out-dense: spread a single-split source
    out = spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), sig.alias("_sig")
    ).filter(
        F.col("_sig.s0").isNotNull()  # docs with < SHINGLE_N tokens drop out
    )
    return out.select(
        F.col(id_col), *[F.col(f"_sig.s{i}").alias(f"s{i}") for i in range(NUM_HASHES)]
    )


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    engine: str = "catalyst", hash_impl: str = "md5",
) -> DataFrame:
    """LSH candidate pairs: documents sharing ≥ 1 of ``BANDS`` band keys
    (each key = md5 of ``ROWS_PER_BAND`` concatenated signature slots).
    Output: distinct (id_a, id_b), id_a < id_b.

    ``engine='arrow'`` computes the signatures with the bit-identical
    numpy kernel (same integers, pandas-batch speed);
    ``hash_impl='xxhash64'`` (catalyst engine) swaps in the production
    base hash."""
    bands = band_keys(docs, text_col, id_col, engine=engine, hash_impl=hash_impl)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def band_keys(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    engine: str = "catalyst", hash_impl: str = "md5",
) -> DataFrame:
    """(id, band, bkey) LSH band-key index rows for a document set — the
    unit both the all-pairs self-join and the incremental new-vs-corpus
    join block on.  At corpus scale this is what gets MATERIALIZED at
    ingest (partitioned by bkey) so later batches join against stored
    keys instead of re-hashing the corpus."""
    if engine == "arrow":
        if hash_impl != "md5":
            raise ValueError("arrow engine implements the md5 base hash only")
        sig = minhash_signatures_arrow(docs, text_col, id_col)
    else:
        sig = minhash_signatures(docs, text_col, id_col, hash_impl)
    band_structs = []
    for b in range(BANDS):
        cols = [F.col(f"s{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols).cast("binary")).alias("bkey"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


def _duck_sig_cte(table: str, suffix: str = "") -> str:
    sh = duck_shingles("text")
    mins = ", ".join(
        f"min({_duck_mix('base', i)}) AS s{i}" for i in range(NUM_HASHES)
    )
    return f"""
sh{suffix} AS (
  SELECT DISTINCT doc_id, unnest({sh}) AS shingle FROM {table}
),
sb{suffix} AS (
  SELECT doc_id, {duck_h64("shingle")} AS base FROM sh{suffix}
),
sig{suffix} AS (
  SELECT doc_id, {mins} FROM sb{suffix} GROUP BY doc_id
)"""


def _duck_band_arms(sig_name: str) -> str:
    band_arms = []
    for b in range(BANDS):
        cols = ", ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        band_arms.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS bkey "
            f"FROM {sig_name}"
        )
    return " UNION ALL ".join(band_arms)


def minhash_lsh_pairs_oracle(table: str = "documents") -> str:
    return f"""
WITH {_duck_sig_cte(table)},
bands AS ({_duck_band_arms("sig")})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# Incremental dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------


def incremental_dedup(
    corpus: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "catalyst",
    hash_impl: str = "md5",
    corpus_bands: DataFrame | None = None,
    corpus_bands_distinct: bool = False,
) -> DataFrame:
    """Dedup a NEW ingest batch against an EXISTING corpus — the shape the
    job actually takes at 100 TB, where re-pairing corpus×corpus on every
    ingest is unaffordable.  Only batch×corpus and batch×batch band keys
    are ever joined; the corpus side is pure band-key index rows (pass the
    stored index via ``corpus_bands`` to skip re-hashing corpus text — the
    production path, where :func:`band_keys` output is materialized at
    ingest partitioned by ``bkey``).

    One row per batch doc:

    - ``hit_corpus`` — shares ≥1 LSH band key with some corpus doc;
    - ``hit_batch`` — shares ≥1 band key with an EARLIER batch doc
      (smaller id; first-occurrence-wins blocking, non-transitive by
      design: the rule is a deterministic single pass, not the iterative
      chain-collapse — that is :func:`canonicalize`'s job);
    - ``keep`` — neither hit.  Docs too short to shingle have no band
      keys and are always kept.

    Plan: the batch band rows are computed ONCE (the signature kernel is
    the expensive stage) and flow through a single (band, bkey) shuffle
    that serves both rules — a per-bucket window min for the within-batch
    first-occurrence test and a same-key left join against the DISTINCT
    corpus bucket set — then one per-doc aggregate.  A naive three-join
    formulation re-runs the signature kernel per consumer (measured 4
    MapInPandas stages, zero exchange reuse); this shape has exactly one.
    No self-join of the corpus, no driver state.  Reference: GeoWave's
    ingest-time ``DedupeFilter`` dedups row IDs within one query
    (core/store/.../filter/DedupeFilter.java:1-80); content-level
    incremental dedup has no reference analogue — it is the training-data
    pipeline requirement."""
    from pyspark.sql import Window

    if corpus_bands is None:
        if corpus is None:
            raise ValueError(
                "incremental_dedup: pass corpus docs or a precomputed "
                "corpus_bands index (both were None)"
            )
        corpus_bands = band_keys(corpus, text_col, id_col, engine=engine,
                                 hash_impl=hash_impl)
    bb = band_keys(batch, text_col, id_col, engine=engine, hash_impl=hash_impl)
    # distinct bucket set: 'exists in corpus' without row multiplication.
    # ``corpus_bands_distinct=True`` skips the re-distinct for a caller
    # that pre-distincted (and typically cached) the bucket set — e.g. a
    # stored index distincted at write, or a long-running stream that
    # would otherwise pay a corpus-sized aggregation per micro-batch.
    cset = corpus_bands.select("band", "bkey")
    if not corpus_bands_distinct:
        cset = cset.distinct()
    cset = cset.withColumn("_inc", F.lit(True))
    w = Window.partitionBy("band", "bkey")
    flagged = bb.withColumn("_min_id", F.min(id_col).over(w)).join(
        cset, on=["band", "bkey"], how="left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.max(F.coalesce(F.col("_inc"), F.lit(False))).alias("_hc"),
        F.max(F.col(id_col) > F.col("_min_id")).alias("_hb"),
    )
    hc = F.coalesce(F.col("_hc"), F.lit(False))
    hb = F.coalesce(F.col("_hb"), F.lit(False))
    return (
        batch.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            hc.alias("hit_corpus"),
            hb.alias("hit_batch"),
            (~hc & ~hb).alias("keep"),
        )
    )


def incremental_dedup_oracle(
    table: str = "documents", batch_mod: int = 5
) -> str:
    """DuckDB twin: corpus = ``doc_id % batch_mod <> 0``, batch = the rest
    (the registry's deterministic corpus/batch split of one table)."""
    return f"""
WITH corpus AS (SELECT * FROM {table} WHERE doc_id % {batch_mod} <> 0),
batch AS (SELECT * FROM {table} WHERE doc_id % {batch_mod} = 0),
{_duck_sig_cte("corpus", "_c").lstrip()},
{_duck_sig_cte("batch", "_b").lstrip()},
cb AS ({_duck_band_arms("sig_c")}),
bb AS ({_duck_band_arms("sig_b")}),
hitc AS (
  SELECT DISTINCT b.doc_id FROM bb b
  JOIN cb c ON b.band = c.band AND b.bkey = c.bkey
),
bmin AS (SELECT band, bkey, min(doc_id) AS min_id FROM bb GROUP BY band, bkey),
hitb AS (
  SELECT DISTINCT b.doc_id FROM bb b
  JOIN bmin m ON b.band = m.band AND b.bkey = m.bkey AND b.doc_id > m.min_id
)
SELECT d.doc_id,
       (hc.doc_id IS NOT NULL) AS hit_corpus,
       (hb.doc_id IS NOT NULL) AS hit_batch,
       (hc.doc_id IS NULL AND hb.doc_id IS NULL) AS keep
FROM batch d
LEFT JOIN hitc hc ON d.doc_id = hc.doc_id
LEFT JOIN hitb hb ON d.doc_id = hb.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # keep the key positive in int64
SIM_CHUNKS = 4
CHUNK_BITS = SIMHASH_BITS // SIM_CHUNKS
SIM_MAX_HAMMING = 3


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_impl: str = "md5",
) -> DataFrame:
    """60-bit SimHash over the distinct token set: bit b is the sign of
    Σ_tokens (±1 by bit b of the portable token hash).  Output: (id, simhash).
    ``hash_impl='xxhash64'`` = the production token hash (text.base60_col).

    Like the minhash signature, this depends only on the row's own tokens —
    a pure per-row computation: token-hash array is let-bound (computed
    once), each bit is one ``aggregate`` pass over it, no explode/groupBy/
    shuffle (the previous formulation shuffled every (doc, token) pair into
    a 60-aggregate groupBy)."""

    def _sr(x: Column, b: Column) -> Column:
        return F.call_function("shiftright", x, b.cast("int"))

    def _sl(x: Column, b: Column) -> Column:
        return F.call_function("shiftleft", x, b.cast("int"))

    def bits(h: Column) -> Column:
        # ONE aggregate pass with a 60-counter array accumulator (7× faster
        # than 60 separate aggregate passes — higher-order functions are
        # interpreted, so passes over the data dominate)
        n = F.size(h)
        counts = F.aggregate(
            h,
            F.array_repeat(F.lit(0), SIMHASH_BITS),
            lambda acc, x: F.zip_with(
                acc,
                F.transform(
                    F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                    lambda b: _sr(x, b).bitwiseAND(F.lit(1)).cast("int"),
                ),
                lambda a, v: a + v,
            ),
        )
        # Σ±1 > 0  ⇔  2·(count of ones) > n, folded into the 60-bit key
        return let(
            counts,
            lambda c: F.aggregate(
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(
                    F.element_at(c, b + 1) * 2 > n, _sl(F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long")),
            ),
        )

    sim = let(
        F.array_distinct(tokens_col(F.col(text_col))),
        lambda toks: let(F.transform(toks, lambda t: base60_col(t, hash_impl)), bits),
    )
    # docs with zero tokens have no simhash (the explode formulation and
    # the oracle emit no row for them)
    from geowave_spark.session import spread

    # per-token hashing is fan-out-dense: spread a single-split source
    return spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).alias("_n"), sim.alias("simhash")
    ).filter(F.col("_n") > 0).drop("_n")


def simhash_oracle(table: str = "documents") -> str:
    toks = duck_tokens("text")
    h = duck_h64("tok")
    sums = ", ".join(
        f"SUM(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS tok FROM {table}
),
th AS (SELECT doc_id, {h} AS hh FROM tok),
agg AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
SELECT doc_id, {sim} AS simhash FROM agg
"""


def hamming_pairs(
    keys: DataFrame,
    key_col: str,
    id_col: str,
    bits: int = SIMHASH_BITS,
    chunks: int = SIM_CHUNKS,
    max_hamming: int = SIM_MAX_HAMMING,
) -> DataFrame:
    """Generic banded hamming self-join over an int64 key column — the
    shared machinery behind text simhash AND image phash near-dup (the
    input-table ``phash`` column: any ≤63-bit perceptual hash).

    Pigeonhole banding: ≤ ``max_hamming`` differing bits over ``chunks``
    equal-width chunks (requires chunks > max_hamming) ⇒ at least one chunk
    identical → equi-join on (chunk_idx, chunk_value), then the exact
    popcount refilter.  One bounded explode (chunks× fan-out) + one shuffle
    equi-join; `.distinct()` collapses pairs matching on several chunks.
    Output: (id_a, id_b, hamming)."""
    if chunks <= max_hamming:
        raise ValueError("pigeonhole needs chunks > max_hamming")
    cb = bits // chunks
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col(key_col), c * cb)
            .bitwiseAND(F.lit((1 << cb) - 1))
            .alias("cval"),
        )
        for c in range(chunks)
    ]
    from geowave_spark.session import spread

    # chunk explode + self-join is fan-out-dense: spread a 1-split source
    ck = spread(keys.select(F.col(id_col), F.col(key_col))).select(
        F.col(id_col), F.col(key_col), F.explode(F.array(*chunk_structs)).alias("ck")
    ).select(
        id_col, key_col, F.col("ck.chunk").alias("chunk"), F.col("ck.cval").alias("cval")
    )
    a, b = ck.alias("a"), ck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{key_col}").bitwiseXOR(F.col(f"b.{key_col}"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    engine: str = "catalyst", hash_impl: str = "md5",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ ``SIM_MAX_HAMMING``.

    Pigeonhole banding via :func:`hamming_pairs` (≤ 3 differing bits over 4
    chunks ⇒ at least one 15-bit chunk identical).  Output:
    (id_a, id_b, hamming).  ``engine='arrow'`` uses the bit-identical numpy
    signature kernel; ``hash_impl='xxhash64'`` the production token hash."""
    if engine == "arrow":
        if hash_impl != "md5":
            raise ValueError("arrow engine implements the md5 base hash only")
        sh = simhash_arrow(docs, text_col, id_col)
    else:
        sh = simhash(docs, text_col, id_col, hash_impl)
    return hamming_pairs(sh, "simhash", id_col)


def simhash_pairs_oracle(table: str = "documents") -> str:
    base = simhash_oracle(table).strip().rstrip()
    chunk_arms = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, "
        f"(simhash >> {c * CHUNK_BITS}) & {(1 << CHUNK_BITS) - 1} AS cval FROM sh"
        for c in range(SIM_CHUNKS)
    )
    return f"""
WITH sh AS ({base}),
chunks AS ({chunk_arms})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIM_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# Blocked n-gram (token-set) Jaccard
# ---------------------------------------------------------------------------

JACCARD_TAU = 0.5


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    tau: float = JACCARD_TAU,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard ≥ tau for pairs sharing the blocking key.

    |A∩B| by token equi-join within the block, |A∪B| = |A|+|B|−|A∩B|.
    Output: (id_a, id_b, inter, union_sz, jaccard rounded 6dp).

    ``max_df`` is the 100 TB skew guard (the doc-frequency stoplist —
    standard prefix-filter dedup practice): tokens whose document frequency
    within their block exceeds ``max_df`` are excluded from CANDIDATE
    GENERATION, bounding the equi-join fan-out per token to
    max_df*(max_df-1)/2 pairs.  Candidate pairs then get their EXACT
    intersection recounted over the full (unfiltered) token sets, so every
    reported (inter, union_sz, jaccard) is exact; the only semantic change
    is that a pair sharing NO token rarer than max_df is never considered —
    for near-dup thresholds that pair would be all-stopword overlap.
    ``max_df=None`` keeps the exhaustive single-join path.
    """
    from geowave_spark.session import spread

    # tokenization + explode is fan-out-dense: spread a single-split source
    tok = spread(docs.select(F.col(id_col), F.col(block_col), F.col(text_col))).select(
        F.col(id_col), F.col(block_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).distinct()
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("n_tok"))

    if max_df is None:
        join_tok = tok
    else:
        rare = (
            tok.groupBy(block_col, "tok")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select(block_col, "tok")
        )
        join_tok = tok.join(rare, [block_col, "tok"])

    a, b = join_tok.alias("a"), join_tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )

    if max_df is not None:
        # exact recount over full token sets, restricted to candidates
        cand = inter.select("id_a", "id_b")
        ta = tok.select(F.col(id_col).alias("id_a"), F.col("tok").alias("_ta"))
        tb = tok.select(F.col(id_col).alias("_idb"), F.col("tok").alias("_tb"))
        inter = (
            cand.join(ta, "id_a")
            .join(tb, (F.col("id_b") == F.col("_idb")) & (F.col("_ta") == F.col("_tb")))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("union_sz", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("union_sz"), 6))
        .filter(F.col("jaccard") >= tau)
    )
    return j.select("id_a", "id_b", "inter", "union_sz", "jaccard")


def jaccard_pairs_oracle(
    table: str = "documents", tau: float = JACCARD_TAU, max_df: int | None = None
) -> str:
    toks = duck_tokens("text")
    if max_df is None:
        inter_cte = """
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM tok a JOIN tok b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""
    else:
        inter_cte = f"""
rare AS (
  SELECT source, tok FROM tok GROUP BY source, tok HAVING COUNT(*) <= {max_df}
),
jtok AS (
  SELECT t.doc_id, t.source, t.tok
  FROM tok t JOIN rare r ON t.source = r.source AND t.tok = r.tok
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM jtok a JOIN jtok b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS inter
  FROM cand c
  JOIN tok a ON a.doc_id = c.id_a
  JOIN tok b ON b.doc_id = c.id_b AND b.tok = a.tok
  GROUP BY 1, 2
)"""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, source, unnest({toks}) AS tok FROM {table}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
{inter_cte}
SELECT id_a, id_b, inter,
       sa.n_tok + sb.n_tok - inter AS union_sz,
       round(CAST(inter AS DOUBLE) / (sa.n_tok + sb.n_tok - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(inter AS DOUBLE) / (sa.n_tok + sb.n_tok - inter), 6) >= {tau}
"""


# ---------------------------------------------------------------------------
# Arrow fast paths (round 2): bit-identical signature kernels in numpy.
# The Catalyst formulations above are the definitional oracle-parity path
# (pure column math, zero Python) but higher-order functions evaluate
# INTERPRETED — for signature-heavy suites the Arrow kernel computes the
# IDENTICAL integers (same tokenizer, same md5-based h64, same mixes) at
# pandas-batch speed, so queries can take the fast path and still match
# the DuckDB oracle bit-for-bit (tests assert cross-path equality).
# ---------------------------------------------------------------------------

import hashlib as _hashlib

from geowave_spark.operators.text import py_tokens as _py_tokens  # noqa: F401


def _py_h64(s: str) -> int:
    return int(_hashlib.md5(s.encode()).hexdigest()[:15], 16)


def minhash_signatures_arrow(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """numpy twin of :func:`minhash_signatures` — identical output."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [docs.schema[id_col]]
        + [T.StructField(f"s{i}", T.LongType()) for i in range(NUM_HASHES)]
    )
    p1 = np.array([m[0] for m in _MIX], dtype=np.uint64)[:, None]
    p2 = np.array([m[1] for m in _MIX], dtype=np.uint64)[:, None]
    iv = np.arange(NUM_HASHES, dtype=np.uint64)[:, None]
    m61 = np.uint64(MERSENNE61)

    def kernel(batches):
        for b in batches:
            rows = []
            for r in b.itertuples():
                toks = _py_tokens(getattr(r, text_col))
                if len(toks) < SHINGLE_N:
                    continue
                sh = set(
                    " ".join(toks[i : i + SHINGLE_N])
                    for i in range(len(toks) - SHINGLE_N + 1)
                )
                base = np.fromiter(
                    (_py_h64(s) for s in sh), dtype=np.uint64, count=len(sh)
                )
                lo = base & np.uint64((1 << 30) - 1)
                hi = base >> np.uint64(30)
                # (H, n): products < 2^61 so uint64 arithmetic is exact
                mixed = (lo[None, :] * p1 + hi[None, :] * p2 + iv) % m61
                sig = mixed.min(axis=1).astype(np.int64)
                rows.append((getattr(r, id_col), *sig.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    from geowave_spark.session import spread

    # per-row python kernel is fan-out-dense: spread a single-split source
    return spread(docs.select(id_col, text_col)).mapInPandas(kernel, schema)


def simhash_arrow(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """numpy twin of :func:`simhash` — identical output."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [docs.schema[id_col], T.StructField("simhash", T.LongType())]
    )
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)

    def kernel(batches):
        for b in batches:
            rows = []
            for r in b.itertuples():
                toks = _py_tokens(getattr(r, text_col))
                if not toks:
                    continue
                uniq = set(toks)
                h = np.fromiter(
                    (_py_h64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
                )
                ones = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
                bits = (2 * ones > len(uniq)).astype(np.uint64)
                sim = int((bits << shifts).sum())
                rows.append((getattr(r, id_col), sim))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    from geowave_spark.session import spread

    # per-row python kernel is fan-out-dense: spread a single-split source
    return spread(docs.select(id_col, text_col)).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# Near-dup group canonicalization: candidate pairs → connected components →
# one kept representative per group (the step a training pipeline runs AFTER
# minhash/simhash/embedding pair generation to actually drop duplicates).
# ---------------------------------------------------------------------------


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """One-pass union-find over a driver-bounded edge list: Arrow transfer
    (two int64 numpy columns), path-compressed min-root merging, Arrow
    result upload.  Labels identical to the min-label loop (pytest)."""
    import numpy as np
    import pandas as pd

    pdf = edges.toPandas()
    u = pdf["u"].to_numpy(dtype=np.int64)
    v = pdf["v"].to_numpy(dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for ua, vb in zip(u.tolist(), v.tolist()):
        ra, rb = find(ua), find(vb)
        if ra != rb:
            lo_, hi_ = (ra, rb) if ra < rb else (rb, ra)
            parent[hi_] = lo_
    nodes = np.unique(np.concatenate([u, v])) if len(u) else np.array([], dtype=np.int64)
    comp = np.fromiter(
        (find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes)
    )
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "comp": comp}),
        "node long, comp long",
    )


def connected_components(
    pairs: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_rounds: int = 64,
    driver_limit: int = 4_000_000,
) -> DataFrame:
    """(node, comp) for every node in an undirected pair graph; ``comp`` =
    the component's minimum node id (deterministic, partition-independent).

    Fast path: near-dup pair graphs are SPARSE relative to the corpus
    (pairs ≪ rows — even a 10^12-row corpus rarely exceeds millions of
    candidate pairs after LSH), so when the edge list fits
    ``driver_limit`` it moves to the driver as TWO int64 Arrow columns
    (``toPandas`` — ~16 B/edge, 64 MB at the default limit, never
    per-row Row objects) and is union-found in one pass, replacing
    diameter-many shuffle rounds (measured: 2.8s → 0.4s on the sf0.1
    minhash graph).  Gate order follows the spread() convention: the free
    Catalyst size estimate first — an at-scale edge list takes the loop
    with NO extra materialization or count; only a small-estimate list
    pays the checkpoint + exact count.  Both paths produce identical
    labels (pytest-pinned).  Edges with a null endpoint are meaningless
    and dropped up front (the loop's joins never matched them anyway —
    made explicit so both paths agree).

    Scale path — min-label propagation: each round every node takes the
    min label over itself and its neighbors — two shuffles per round,
    converging in component-DIAMETER rounds.  Near-dup graphs are shallow
    (groups are near-cliques because LSH links most member pairs
    directly), so 2-4 rounds is typical; contrast DBSCAN's spatial
    chains, which needed the partitioned union-find
    (clustering._components_spatial).  Each round is
    ``localCheckpoint``-severed (CLAUDE.md: driver-looped iteration must
    checkpoint or plans explode)."""
    e0 = pairs.select(
        F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v")
    ).filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    try:
        est = int(
            str(e0._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        est = None
    small_estimate = est is not None and est <= driver_limit * 64  # ≫16 B/edge
    if small_estimate:
        e0 = e0.localCheckpoint()
        if e0.count() <= driver_limit:
            return _driver_union_find(pairs.sparkSession, e0)
    e = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    lab = e.select(F.col("u").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    ).localCheckpoint()
    for _ in range(max_rounds):
        nbr = (
            e.join(
                lab.select(F.col("node").alias("v"), F.col("comp").alias("_vc")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_vc").alias("_nc"))
        )
        # fold the convergence flag INTO the checkpointed frame: the
        # changed-probe then reads the cached result instead of paying a
        # second join job per round (the rounds are all fixed overhead at
        # small graph sizes — one job each, not two)
        new = (
            lab.withColumnRenamed("comp", "_old")
            .join(nbr.select(F.col("u").alias("node"), "_nc"), "node", "left")
            .select(
                "node",
                F.least(F.col("_old"), F.coalesce("_nc", F.col("_old"))).alias(
                    "comp"
                ),
                (F.coalesce("_nc", F.col("_old")) < F.col("_old")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("_chg")).limit(1).count()
        lab = new.drop("_chg")
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "component diameter exceeds the bound; raise max_rounds"
    )


def canonicalize(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Label EVERY document with its near-dup group and keep decision:
    (``id_col``, group_id, keep) — ``group_id`` = min doc id of the
    component (singleton docs are their own group), ``keep`` = this doc IS
    the group minimum.  ``docs DISTINCT-on-keep`` is the deduplicated
    corpus; the labeling keeps the dropped rows auditable (which group ate
    them) instead of silently deleting.

    Because min-label components converge to the component MINIMUM, the
    representative needs no second argmin pass — ``keep = (doc == group)``.
    One broadcast-or-shuffle join of the (small: nodes-in-pairs only)
    component table against the corpus."""
    comp = connected_components(pairs, a=a, b=b)
    return (
        docs.join(
            comp.select(F.col("node").alias(id_col), "comp"), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("group_id"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )


def canonicalize_oracle(pairs_sql: str, table: str = "documents") -> str:
    """DuckDB twin: recursive-CTE transitive closure over the symmetric
    pair graph (the dbscan-oracle pattern), min label per component,
    left-joined to the corpus."""
    return f"""
WITH RECURSIVE cand AS ({pairs_sql}),
sym AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b AS u, id_a AS v FROM cand
),
closure(node, lbl) AS (
  SELECT u, u FROM sym
  UNION
  SELECT sym.u, c.lbl FROM closure c JOIN sym ON sym.v = c.node
),
labels AS (SELECT node, MIN(lbl) AS grp FROM closure GROUP BY node)
SELECT d.doc_id,
       CAST(COALESCE(l.grp, d.doc_id) AS BIGINT) AS group_id,
       (COALESCE(l.grp, d.doc_id) = d.doc_id) AS keep
FROM {table} d LEFT JOIN labels l ON l.node = d.doc_id
"""


# ---------------------------------------------------------------------------
# Leakage-safe splitting: train/val/test assignment by DUP GROUP, so a
# near-duplicate of a training document can never land in the eval split.
# ---------------------------------------------------------------------------

SPLIT_SCALE = 10_000  # hash-bucket granularity of the weight thresholds


def _split_cuts(weights: tuple[float, ...], names: tuple[str, ...]) -> list[int]:
    """Validated cumulative integer thresholds — shared by the engine and
    its oracle so a weights/names mismatch raises in BOTH instead of
    silently zip-truncating the oracle's CASE arms."""
    if len(weights) != len(names) or len(names) < 2:
        raise ValueError(
            "leakage_safe_split: need >=2 names and one weight per name"
        )
    if any(w <= 0 for w in weights):
        raise ValueError("leakage_safe_split: weights must be positive")
    tot = float(sum(weights))
    cuts, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / tot
        cuts.append(int(round(acc * SPLIT_SCALE)))
    return cuts


def leakage_safe_split(
    groups: DataFrame,
    weights: tuple[float, ...] = (0.90, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    id_col: str = "doc_id",
    group_col: str = "group_id",
    salt: str = "split-v1",
) -> DataFrame:
    """(id, group_id, split) — deterministic train/val/test assignment
    hashed on the NEAR-DUP GROUP id (:func:`canonicalize` output), not the
    document id: every member of a dup group lands in the same split, so a
    near-copy of a training document cannot leak into the eval split (the
    standard benchmark-contamination failure when splitting by row hash).

    Pure per-row column math over the already-labeled groups — zero
    shuffles beyond what produced the labels; re-salting re-draws the
    split without touching the group structure.  Thresholds are integer
    buckets of ``SPLIT_SCALE`` (exact cross-engine replay); weights are
    normalized, so (90, 5, 5) and (0.9, 0.05, 0.05) are equivalent.

    A NULL ``group_id`` violates the input contract (canonicalize always
    coalesces); if one slips through, the hash null-propagates and the row
    falls to ``names[-1]`` — identically in both engines."""
    cuts = _split_cuts(weights, names)
    # F.concat (NOT concat_ws): null-propagates like SQL ||, keeping the
    # NULL-group_id behavior identical to the DuckDB oracle
    key = F.concat(F.lit(f"{salt}|"), F.col(group_col).cast("string"))

    def pick(u: Column) -> Column:
        c = F.when(u < cuts[0], F.lit(names[0]))
        for i in range(1, len(cuts)):
            c = c.when(u < cuts[i], F.lit(names[i]))
        return c.otherwise(F.lit(names[-1]))

    # let-bind the md5 bucket: the when-chain references it once per arm,
    # and Catalyst would otherwise re-inline the hash per comparison
    split = let(F.pmod(h64_col(key), F.lit(SPLIT_SCALE)), pick)
    return groups.select(id_col, group_col, split.alias("split"))


def leakage_safe_split_oracle(
    pairs_sql: str,
    table: str = "documents",
    weights: tuple[float, ...] = (0.90, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split-v1",
) -> str:
    """DuckDB twin: the canonicalize closure as a base CTE + the same
    salted-md5 bucket thresholds."""
    cuts = _split_cuts(weights, names)
    u = duck_h64(f"'{salt}|' || CAST(group_id AS VARCHAR)") + f" % {SPLIT_SCALE}"
    arms = " ".join(
        f"WHEN u < {cut} THEN '{nm}'" for cut, nm in zip(cuts, names[:-1])
    )
    base = canonicalize_oracle(pairs_sql, table)
    return f"""
WITH base AS ({base})
SELECT doc_id, group_id, CASE {arms} ELSE '{names[-1]}' END AS split
FROM (SELECT doc_id, group_id, {u} AS u FROM base)
"""


# ---------------------------------------------------------------------------
# End-to-end corpus preparation: the composed training-data pipeline —
# language gate → quality gate → length gate → exact dedup → near dedup —
# with an auditable per-document decision record (which stage dropped it).
# ---------------------------------------------------------------------------

PREP_STAGES = ("lang", "quality", "length", "exact_dup", "near_dup", "kept")


def corpus_prep(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.3,
    min_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_groups: bool = False,
) -> DataFrame:
    """→ (doc_id, pred_lang, n_tokens, quality, stage): ``stage`` is the
    FIRST gate that dropped the document ('lang' | 'quality' | 'length' |
    'exact_dup' | 'near_dup') or 'kept'.  ``stage == 'kept'`` is the
    deduplicated training corpus; every drop is attributable.

    Composition of the engine's own operators — lang_id + quality_score
    (one pass each), exact dedup (groupBy min-id on the md5 of normalized
    text, among earlier-stage survivors), minhash LSH pairs + component
    canonicalization among exact-dedup survivors.  Stage ORDER matters
    and is part of the contract: each gate sees only the previous gate's
    survivors, so e.g. a duplicate pair whose canonical member failed the
    quality gate elects a new surviving representative.
    """
    from geowave_spark.operators import text as OTX

    # ONE combined Arrow pass for lang + quality (text_features_arrow:
    # bit-identical to the two Catalyst twins — full-corpus equality
    # pinned by pytest — at one text scan + one Python-worker pass
    # instead of two scans and a join)
    tf = OTX.text_features_arrow(docs, text_col=text_col, id_col=id_col)
    gate = (
        F.when(F.col("pred_lang") != lang, F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("n_tokens") < min_tokens, F.lit("length"))
    )
    # feats is TEXT-FREE (id + four small columns): materialize it once —
    # the assembly below references it from three subtrees, and without
    # severing each re-runs the text kernel
    feats = (
        tf.select(id_col, "pred_lang", "n_tokens", "quality")
        .withColumn("_g1", gate)
        .localCheckpoint()
    )
    # exact-dup verdict among gate survivors; dk computed in one text pass
    # and dropped before the shuffle (never shuffle the text column).
    # spread(): the sf-scale documents parquet is ONE split, so the md5 +
    # regex normalization of every surviving text would run on one core
    # (the same single-split trap as the text kernels; no-op at real scale)
    from geowave_spark.session import spread

    surv1 = (
        spread(docs.select(id_col, text_col))
        .join(feats.filter(F.col("_g1").isNull()).select(id_col), id_col)
        .select(
            id_col, F.md5(norm_col(F.col(text_col)).cast("binary")).alias("_dk")
        )
    )
    canon = surv1.groupBy("_dk").agg(F.min(id_col).alias("_canon"))
    s2 = (
        surv1.join(canon, "_dk")
        .select(
            id_col,
            F.when(F.col(id_col) != F.col("_canon"), F.lit("exact_dup")).alias(
                "_g2"
            ),
        )
        .localCheckpoint()
    )
    surv2_ids = s2.filter(F.col("_g2").isNull()).select(id_col)
    surv2 = docs.select(id_col, text_col).join(surv2_ids, id_col)
    pairs = minhash_lsh_pairs(surv2, text_col=text_col, id_col=id_col,
                              engine="arrow")
    near = canonicalize(surv2_ids, pairs, id_col=id_col)
    verdicts = (
        s2.join(near.select(id_col, "keep", "group_id"), id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("_g2"),
                F.when(~F.col("keep"), F.lit("near_dup")).otherwise(
                    F.lit("kept")
                ),
            ).alias("_stage"),
            "group_id",
        )
    )
    # return_groups exposes the near-dup component id the stage verdict was
    # derived FROM (null for docs dropped before the near-dup gate) — so a
    # downstream leakage-safe split never re-runs the LSH kernel to recover
    # the grouping this call already computed.  Default off: the registry
    # query/oracle pin the 5-column schema.
    out_cols = [
        id_col, "pred_lang", "n_tokens", "quality",
        F.coalesce(F.col("_g1"), F.col("_stage")).alias("stage"),
    ]
    if return_groups:
        out_cols.append(F.col("group_id"))
    return feats.join(verdicts, id_col, "left").select(*out_cols)


def corpus_prep_oracle(
    table: str = "documents",
    lang: str = "en",
    min_quality: float = 0.3,
    min_tokens: int = 20,
) -> str:
    """DuckDB twin of :func:`corpus_prep`, chaining the per-operator oracle
    fragments (lang/quality nested queries, md5 exact keys, the minhash
    signature+banding CTEs on the survivor set, recursive-CTE components)."""
    from geowave_spark.operators import text as OTX

    band_arms = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws('|', "
        + ", ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + ")) AS bkey FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH RECURSIVE
l AS ({OTX.lang_id_oracle(table)}),
q AS ({OTX.quality_score_oracle(table)}),
base AS (
  SELECT d.doc_id, d.text, l.pred_lang, q.n_tokens, q.quality,
         CASE WHEN l.pred_lang <> '{lang}' THEN 'lang'
              WHEN q.quality < {min_quality} THEN 'quality'
              WHEN q.n_tokens < {min_tokens} THEN 'length' END AS g1
  FROM {table} d
  JOIN l ON l.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
),
surv1 AS (
  SELECT *, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS dk
  FROM base WHERE g1 IS NULL
),
canon AS (SELECT dk, MIN(doc_id) AS m FROM surv1 GROUP BY dk),
s2 AS (
  SELECT surv1.*, CASE WHEN doc_id <> c.m THEN 'exact_dup' END AS g2
  FROM surv1 JOIN canon c ON c.dk = surv1.dk
),
docs2 AS (SELECT doc_id, text FROM s2 WHERE g2 IS NULL),
{_duck_sig_cte("docs2").lstrip()},
bands AS ({band_arms}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION SELECT id_b, id_a FROM cand
),
closure(node, lbl) AS (
  SELECT u, u FROM sym
  UNION
  SELECT sym.u, c.lbl FROM closure c JOIN sym ON sym.v = c.node
),
labels AS (SELECT node, MIN(lbl) AS grp FROM closure GROUP BY node)
SELECT b.doc_id, b.pred_lang, b.n_tokens, b.quality,
       COALESCE(b.g1, s2.g2,
                CASE WHEN COALESCE(lb.grp, s2.doc_id) <> s2.doc_id
                     THEN 'near_dup' ELSE 'kept' END) AS stage
FROM base b
LEFT JOIN s2 ON s2.doc_id = b.doc_id
LEFT JOIN labels lb ON lb.node = b.doc_id
"""
