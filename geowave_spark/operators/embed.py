"""Embedding similarity operators: brute-force cosine top-k, blocked
near-duplicate pairs, and random-hyperplane-LSH approximate NN.

No analogue in the reference (GeoWave's NN machinery is 2-D geodesic —
NNMapReduce.java; these are the high-dimensional versions a training-data
pipeline needs over an ``array<double>`` embedding column).

Scale posture (round 2):
* brute-force top-k — query side broadcast, one scan, window top-k; the
  exact baseline, right when |queries| is small;
* near-dup pairs — :func:`neardup_pairs_q` blocks on a COMPUTED coarse
  quantizer (integer hyperplane sign buckets, hamming≤1 multiprobe
  self-join, each pair generated exactly once) — the all-pairs semantic
  near-dup path with no given label and no broadcast; ``planes`` is the
  shard dial (2^planes buckets; :func:`planes_for_corpus` derives it from
  corpus size so bucket occupancy stays flat — 28 planes at 10^12 rows,
  optionally as several independent tables).  Round 3 made the DEFAULT
  scale-true: planes=8 / probe_hamming=1 scans 3.5% of the bucket-pair
  space (the round-2 default scanned 69% — near-all-pairs).  :func:`neardup_pairs` keeps the
  given-blocking-key variant for when a cluster/label column exists;
* ANN — :func:`ann_lsh` (small query set, broadcast probes) and
  :func:`ann_knn_join` (ALL-pairs approximate kNN: every vector a query,
  shuffle equi-join on buckets, window top-k).  Buckets are integer
  projections of the fixed-point vector, so the candidate-set definition
  is deterministic and every one of these operators — including the
  approximate ones — carries an EXACT DuckDB oracle; pytest additionally
  checks recall against brute force.

Dot products use ``aggregate(zip_with(...))`` — JVM higher-order functions,
sequential left-to-right summation, which DuckDB's list_dot_product
reproduces bit-for-bit (empirically verified in tests).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints + closures need it
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark.operators.text import h64_col


QUANT = 32768  # fixed-point scale for cross-engine-exact similarity


def quant_col(a: Column) -> Column:
    """Embedding → int64 fixed-point (x * 32768, half-away rounding).

    Exact-arithmetic trick: float summation order differs between engines
    (Spark's sequential fold vs DuckDB's list_dot_product), so raw-double
    cosines differ in the last ulp and can round differently.  Integer
    dot products are order-independent and exact; sqrt and division are
    IEEE-correctly-rounded everywhere → bit-identical cosine."""
    return F.transform(a, lambda x: F.round(x * QUANT, 0).cast("long"))


def dot_col(a: str, b: str) -> Column:
    """Exact integer dot product of two pre-quantized int64 vectors."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_col(a: str) -> Column:
    return F.sqrt(
        F.aggregate(F.col(a), F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    )


DUCK_QUANT = f"list_transform({{v}}, x -> CAST(round(x * {QUANT}) AS BIGINT))"


def duck_quant(v: str) -> str:
    return DUCK_QUANT.format(v=v)


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vectors (by id) against
    the whole table.  Output: (q_id, rank, vec_id, cos) with deterministic
    ties (cos desc, id asc), cos rounded to 6dp."""
    from pyspark.sql import Window

    # norms are per-ROW quantities: compute them once below the join (the
    # join boundary stops Catalyst re-inlining them per pair) — 2/3 of the
    # per-pair HOF work gone, arithmetic bit-identical (same sqrt operands)
    base = emb.withColumn("_qv", quant_col(F.col(vec_col))).withColumn(
        "_n", norm_col("_qv")
    )
    q = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("q_id"),
            F.col("_qv").alias("q_emb"),
            F.col("_n").alias("_qn"),
        )
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn(
            "cos",
            F.round(
                dot_col("_qv", "q_emb") / (F.col("_n") * F.col("_qn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col(id_col), "cos")
    )


def cosine_topk_oracle(
    table: str = "embeddings", n_queries: int = 8, k: int = 10
) -> str:
    qv = duck_quant("embedding")
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
q AS (
  SELECT vec_id AS q_id, qv AS q_emb FROM base WHERE vec_id < {n_queries}
),
pairs AS (
  SELECT q.q_id, e.vec_id,
         round(list_dot_product(e.qv, q.q_emb) /
               (sqrt(list_dot_product(e.qv, e.qv)) *
                sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
  FROM base e CROSS JOIN q WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM pairs
)
SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= {k}
"""


NEARDUP_TAU = 0.30


def neardup_pairs(
    emb: DataFrame,
    tau: float = NEARDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Exact cosine near-dup pairs within a blocking key.
    Output: (id_a, id_b, cos) with cos ≥ tau, rounded 6dp."""
    qemb = emb.withColumn("_qv", quant_col(F.col(vec_col))).withColumn(
        "_n", norm_col("_qv")
    )
    a = qemb.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("_blk"),
        F.col("_qv").alias("_va"), F.col("_n").alias("_na"),
    )
    b = qemb.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("_blk"),
        F.col("_qv").alias("_vb"), F.col("_n").alias("_nb"),
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(dot_col("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select("id_a", "id_b", "cos")
    )


def neardup_pairs_oracle(table: str = "embeddings", tau: float = NEARDUP_TAU) -> str:
    qv = duck_quant("embedding")
    return f"""
WITH base AS (SELECT vec_id, label, {qv} AS qv FROM {table})
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.qv, b.qv) /
             (sqrt(list_dot_product(a.qv, a.qv)) *
              sqrt(list_dot_product(b.qv, b.qv))), 6) AS cos
FROM base a JOIN base b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.qv, b.qv) /
            (sqrt(list_dot_product(a.qv, a.qv)) *
             sqrt(list_dot_product(b.qv, b.qv))), 6) >= {tau}
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (approximate — rows-only driver check)
# ---------------------------------------------------------------------------

LSH_PLANES = 6


def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random plane weight in [-1, 1) from (p, d) —
    Knuth multiplicative hash, no RNG state (reproducible anywhere)."""
    h = ((p * 1315423911 + d * 2654435761) ^ (p << 7)) & 0xFFFFFFFF
    return (h / 2**31) - 1.0


def ann_lsh(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH buckets.

    Candidates share the query's bucket or (``multiprobe``) any hamming-1
    neighbor bucket; exact cosine re-rank inside the candidate set.  Output
    schema matches :func:`cosine_topk` (rank may differ — approximate).

    Buckets are INTEGER hyperplane projections of the fixed-point vector
    (round 2): deterministic and bit-reproducible in SQL, which is what
    lets the driver hold this approximate operator to an exact oracle —
    the candidate-set DEFINITION is part of the operator contract."""
    from pyspark.sql import Window

    data = (
        emb.withColumn("_qv", quant_col(F.col(vec_col)))
        .withColumn("_bkt", quantizer_bucket_col("_qv", dim, planes))
        .withColumn("_n", norm_col("_qv"))
    )
    q = (
        data.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("q_id"),
            F.col("_qv").alias("q_emb"),
            F.col("_bkt").alias("_qbkt"),
            F.col("_n").alias("_qn"),
        )
    )
    if multiprobe:
        # probe every bucket within hamming distance 2 of the query's —
        # 1 + P + C(P,2) probes; the standard recall/scan-fraction dial
        masks = [0] + [1 << p for p in range(planes)] + [
            (1 << p1) | (1 << p2)
            for p1 in range(planes)
            for p2 in range(p1 + 1, planes)
        ]
        probes = F.array(
            *[F.col("_qbkt").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
        )
        q = q.withColumn("_probe", F.explode(probes))
    else:
        q = q.withColumn("_probe", F.col("_qbkt"))

    cand = (
        data.join(F.broadcast(q), F.col("_bkt") == F.col("_probe"))
        .filter(F.col(id_col) != F.col("q_id"))
        .dropDuplicates(["q_id", id_col])
        .withColumn(
            "cos",
            F.round(dot_col("_qv", "q_emb") / (F.col("_n") * F.col("_qn")), 6),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col(id_col), "cos")
    )


# ---------------------------------------------------------------------------
# Computed-quantizer near-dup (round 2): blocking key DERIVED from the
# embedding itself — no given label/cluster column required.  This is the
# scale path for all-pairs semantic near-dup over a corpus: bucket count is
# 2^planes (a dial — at 10^12 rows use 24-30 planes, possibly as several
# independent tables), candidate pairs live in same-or-nearby buckets, and
# the whole thing is one explode + one shuffle equi-join — no broadcast,
# no driver participation, no all-pairs block.
# ---------------------------------------------------------------------------

IVF_PLANES = 8  # 256 buckets; hamming<=1 probing scans 9/256 = 3.5% of
# bucket-pair space.  Round 2 shipped planes=4/probe=2 which probed 11/16
# buckets (~69%) — near-all-pairs; the default must embody the documented
# scale posture, not just the dial.
IVF_PROBE_HAMMING = 1
IVF_WSCALE = 127  # integer weight scale for cross-engine-exact projections


def planes_for_corpus(n_rows: int, rows_per_bucket: int = 4096) -> int:
    """Scale-true planes dial: enough sign bits that the EXPECTED bucket
    occupancy is ~``rows_per_bucket`` (candidate work per row stays flat as
    the corpus grows).  At 10^12 rows this yields 28 planes; floor is the
    IVF_PLANES default so small corpora keep useful recall.  Callers pass
    the result explicitly (the oracle builders take the same parameter) —
    the operator itself never counts the corpus, which would cost an extra
    full pass at 100 TB."""
    import math

    if n_rows <= rows_per_bucket:
        return IVF_PLANES
    return max(IVF_PLANES, min(30, math.ceil(math.log2(n_rows / rows_per_bucket))))


def _plane_weight_int(p: int, d: int) -> int:
    return int(round(_plane_weight(p, d) * IVF_WSCALE))


def quantizer_bucket_col(
    qvec_col: str, dim: int, planes: int = IVF_PLANES, band: int = 0
) -> Column:
    """Coarse bucket id = sign bits of ``planes`` INTEGER hyperplane
    projections of the pre-quantized (int64) embedding.

    All-integer arithmetic (weights are fixed ints, vector is fixed-point)
    so an external SQL engine reproduces bucket assignment bit-for-bit —
    unlike the float-projection ann_lsh bucket, this one is oracle-exact.
    Ties (projection exactly 0) take bit 0.  ``band`` selects an
    independent plane family (band b uses planes b*planes..(b+1)*planes-1)
    for the OR-amplified multi-table variant."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        w = F.array(
            *[F.lit(_plane_weight_int(band * planes + p, d)).cast("long")
              for d in range(dim)]
        )
        proj = F.aggregate(
            F.zip_with(F.col(qvec_col), w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _probe_masks(planes: int, probe_hamming: int) -> list[int]:
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << p for p in range(planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << p1) | (1 << p2)
            for p1 in range(planes)
            for p2 in range(p1 + 1, planes)
        ]
    return masks


def neardup_pairs_q(
    emb: DataFrame,
    tau: float = NEARDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = IVF_PLANES,
    probe_hamming: int = IVF_PROBE_HAMMING,
    bands: int = 1,
) -> DataFrame:
    """All-pairs cosine near-dup with a COMPUTED coarse quantizer.

    A pair is a candidate iff, in at least one of ``bands`` independent
    plane families, their bucket ids differ in at most ``probe_hamming``
    sign bits; candidates get the exact fixed-point cosine and the tau
    filter.  Each (a,b) candidate is generated exactly once with NO dedup
    shuffle: within a band the left side probes bucket XOR m over all
    masks of popcount <= probe_hamming (exactly one mask matches a pair at
    hamming h <= probe_hamming), and across bands a pair is emitted only
    from its FIRST matching band (an earlier-band-miss filter over the
    carried bucket arrays — pure column math).

    Recall dials, with the candidate-fraction cost of each: ``bands`` up =>
    OR-amplified recall up, candidate work up linearly (the standard LSH
    multi-table construction — the right dial for genuine near-dup
    similarity, cos >= 0.9); ``probe_hamming`` up => recall up, probes up
    combinatorially; ``planes`` up => candidate work DOWN exponentially
    (use :func:`planes_for_corpus` to keep bucket occupancy flat as the
    corpus grows).  Candidate generation is part of the operator's
    DEFINITION, so the DuckDB oracle reproduces the result exactly.
    Output matches :func:`neardup_pairs`: (id_a, id_b, cos).
    """
    from geowave_spark.session import spread

    base = spread(
        emb.select(F.col(id_col), quant_col(F.col(vec_col)).alias("_qv"))
    ).withColumn("_n", norm_col("_qv"))
    if bands == 1:
        base = base.withColumn("_bkt", quantizer_bucket_col("_qv", dim, planes))
        masks = _probe_masks(planes, probe_hamming)
        probes = F.array(
            *[F.col("_bkt").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
        )
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col("_qv").alias("_va"),
            F.col("_n").alias("_na"),
            F.explode(probes).alias("_blk"),
        )
        b = base.select(
            F.col(id_col).alias("id_b"),
            F.col("_qv").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col("_bkt").alias("_blk"),
        )
        pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        # bind the band buckets as a RUNTIME attribute (1-element explode
        # barrier) so the bands*(1+planes) probe expressions below reference
        # a computed array instead of re-inlining bands heavy projections
        base = base.withColumn(
            "_bkts",
            F.explode(F.array(F.array(
                *[quantizer_bucket_col("_qv", dim, planes, band=bb)
                  for bb in range(bands)]
            ))),
        )
        masks = _probe_masks(planes, probe_hamming)
        probe_structs = [
            F.struct(
                F.lit(bb).alias("_band"),
                F.element_at("_bkts", bb + 1)
                .bitwiseXOR(F.lit(m).cast("long"))
                .alias("_blk"),
            )
            for bb in range(bands)
            for m in masks
        ]
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col("_qv").alias("_va"),
            F.col("_n").alias("_na"),
            F.col("_bkts").alias("_bksa"),
            F.explode(F.array(*probe_structs)).alias("_pr"),
        ).select("id_a", "_va", "_na", "_bksa", "_pr._band", "_pr._blk")
        b = base.select(
            F.col(id_col).alias("id_b"),
            F.col("_qv").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col("_bkts").alias("_bksb"),
            F.posexplode("_bkts").alias("_band", "_blk"),
        )
        pairs = a.join(b, ["_band", "_blk"]).filter(F.col("id_a") < F.col("id_b"))
        # first-matching-band emission: every band j < _band must MISS
        # (hamming > probe_hamming) — all column math, no distinct shuffle.
        # ``bands`` is a plan-time constant, so the per-band tests unroll
        # into a plain conjunction (term j is vacuously true once
        # j >= _band): HOFs like forall are never whole-stage-codegen'd
        # and ran interpreted per candidate pair (see PLANS.md, same trap
        # as the points_in_polygons refine).
        def miss(j):
            return (
                F.bit_count(
                    F.element_at(F.col("_bksa"), j + 1).bitwiseXOR(
                        F.element_at(F.col("_bksb"), j + 1)
                    )
                )
                > F.lit(probe_hamming)
            )

        from geowave_spark.functions.udfs import UNROLL_EDGE_CAP

        if bands - 1 <= UNROLL_EDGE_CAP:
            no_earlier = F.lit(True)
            for j in range(bands - 1):
                no_earlier = no_earlier & (
                    (F.lit(j) >= F.col("_band")) | miss(j)
                )
        else:
            # huge band counts would blow the 64 KB codegen limit if
            # unrolled — keep the (interpreted) HOF form there
            no_earlier = F.forall(
                F.sequence(F.lit(0), F.col("_band") - 1), lambda j: miss(j)
            )
            no_earlier = F.when(F.col("_band") == 0, F.lit(True)).otherwise(
                no_earlier
            )
        pairs = pairs.filter(no_earlier)
    cos = F.round(dot_col("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select("id_a", "id_b", "cos")
    )


def neardup_pairs_q_oracle(
    table: str = "embeddings",
    tau: float = NEARDUP_TAU,
    dim: int = 64,
    planes: int = IVF_PLANES,
    probe_hamming: int = IVF_PROBE_HAMMING,
) -> str:
    qv = duck_quant("embedding")
    proj_bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product(qv, "
        f"[{', '.join(str(_plane_weight_int(p, d)) for d in range(dim))}]) "
        f"AS BIGINT) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )
    masks = ", ".join(f"({m})" for m in _probe_masks(planes, probe_hamming))
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
bkt AS (
  SELECT vec_id, qv, {proj_bits} AS bucket FROM base
),
probes AS (
  SELECT b.vec_id, b.qv, xor(b.bucket, m.v) AS blk
  FROM bkt b CROSS JOIN (VALUES {masks}) m(v)
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.qv, b.qv) /
             (sqrt(list_dot_product(a.qv, a.qv)) *
              sqrt(list_dot_product(b.qv, b.qv))), 6) AS cos
FROM probes a JOIN bkt b
  ON a.blk = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.qv, b.qv) /
            (sqrt(list_dot_product(a.qv, a.qv)) *
             sqrt(list_dot_product(b.qv, b.qv))), 6) >= {tau}
"""


def ann_lsh_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    dim: int = 64,
    planes: int = LSH_PLANES,
) -> str:
    """Exact oracle for :func:`ann_lsh` (multiprobe variant): the
    approximate operator's candidate-set definition is deterministic
    integer math, so the WHOLE query — buckets, hamming<=2 probes,
    dedup, exact re-rank — replays in SQL."""
    qv = duck_quant("embedding")
    proj_bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product(qv, "
        f"[{', '.join(str(_plane_weight_int(p, d)) for d in range(dim))}]) "
        f"AS BIGINT) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )
    masks = ", ".join(f"({m})" for m in _probe_masks(planes, 2))
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
bkt AS (
  SELECT vec_id, qv, {proj_bits} AS bucket FROM base
),
q AS (
  SELECT vec_id AS q_id, qv AS q_emb, bucket AS qb FROM bkt
  WHERE vec_id < {n_queries}
),
probes AS (
  SELECT q.q_id, q.q_emb, xor(q.qb, m.v) AS blk
  FROM q CROSS JOIN (VALUES {masks}) m(v)
),
cand AS (
  SELECT DISTINCT p.q_id, b.vec_id,
         round(list_dot_product(b.qv, p.q_emb) /
               (sqrt(list_dot_product(b.qv, b.qv)) *
                sqrt(list_dot_product(p.q_emb, p.q_emb))), 6) AS cos
  FROM probes p JOIN bkt b ON b.bucket = p.blk AND b.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand
)
SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= {k}
"""


def ann_knn_join(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = IVF_PLANES,
    probe_hamming: int = IVF_PROBE_HAMMING,
) -> DataFrame:
    """All-pairs approximate kNN over the embedding column: EVERY vector
    gets its top-k nearest among candidates whose quantizer bucket is
    within ``probe_hamming`` sign bits — the embedding analogue of
    operators/knn.knn_join (no broadcast requirement, no small-query-set
    assumption; the round-1 ann_lsh gap).

    Candidate generation is the same multiprobe self-join as
    :func:`neardup_pairs_q` but over ORDERED pairs (each row is a query);
    exact fixed-point cosine re-rank inside.  Deterministic integer
    buckets → the whole operator replays in SQL (exact oracle despite
    being an approximate-NN operator).  Returns (query_id, rank,
    neighbor_id, cos)."""
    from pyspark.sql import Window

    from geowave_spark.session import spread

    base = (
        spread(emb.select(F.col(id_col), quant_col(F.col(vec_col)).alias("_qv")))
        .withColumn("_bkt", quantizer_bucket_col("_qv", dim, planes))
        .withColumn("_n", norm_col("_qv"))
    )
    masks = _probe_masks(planes, probe_hamming)
    probes = F.array(*[F.col("_bkt").bitwiseXOR(F.lit(m).cast("long")) for m in masks])
    a = base.select(
        F.col(id_col).alias("query_id"),
        F.col("_qv").alias("_va"),
        F.col("_n").alias("_na"),
        F.explode(probes).alias("_blk"),
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_qv").alias("_vb"),
        F.col("_n").alias("_nb"),
        F.col("_bkt").alias("_blk"),
    )
    pairs = a.join(b, "_blk").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(dot_col("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def ann_knn_join_oracle(
    table: str = "embeddings",
    k: int = 5,
    dim: int = 64,
    planes: int = IVF_PLANES,
    probe_hamming: int = IVF_PROBE_HAMMING,
) -> str:
    qv = duck_quant("embedding")
    proj_bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product(qv, "
        f"[{', '.join(str(_plane_weight_int(p, d)) for d in range(dim))}]) "
        f"AS BIGINT) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )
    masks = ", ".join(f"({m})" for m in _probe_masks(planes, probe_hamming))
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
bkt AS (
  SELECT vec_id, qv, {proj_bits} AS bucket FROM base
),
probes AS (
  SELECT b.vec_id, b.qv, xor(b.bucket, m.v) AS blk
  FROM bkt b CROSS JOIN (VALUES {masks}) m(v)
),
cand AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.qv, b.qv) /
               (sqrt(list_dot_product(a.qv, a.qv)) *
                sqrt(list_dot_product(b.qv, b.qv))), 6) AS cos
  FROM probes a JOIN bkt b
    ON a.blk = b.bucket AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
           AS INTEGER) AS rank
  FROM cand
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# IVF ANN (round 3): centroid-bucketed approximate NN — the inverted-file
# scale path next to the hyperplane-LSH one.  Coarse quantizer = nearest of
# K seed centroids (deterministic: the quantized embeddings of the K
# smallest ids; production swap = clustering.kmeans_mllib cluster centers —
# the bucketing/probing machinery below is unchanged by where centroids
# come from).  All distances are exact integers over the fixed-point
# vectors, so assignment, probing, and ranking replay in SQL.
# ---------------------------------------------------------------------------

IVF_N_CENTROIDS = 16  # floor: small corpora keep at least this many lists
IVF_N_PROBES = 4      # nearest lists scanned per query (recall dial)


def centroids_for_corpus(n: int) -> int:
    """Corpus-derived IVF list count: max(IVF_N_CENTROIDS, isqrt(n)) — the
    classic IVF balance (assignment work n·L vs per-list pair work n²/L
    both land at n^1.5 when L = √n).  A FIXED L is the scale trap the sf1
    gate caught in semdedup: lists grow linearly with the corpus, so the
    per-list quadratic pair join grows as n² (rows/sec DROPPED 0.61× at
    10× data).  The SQL oracles replay the same derivation with an exact
    integer sqrt, so the dial stays oracle-checked at every sf."""
    import math

    return max(IVF_N_CENTROIDS, math.isqrt(n))


def duck_isqrt(n_expr: str) -> str:
    """Exact integer sqrt in DuckDB, matching Python math.isqrt: float
    sqrt then ±1 correction (float rounding near perfect squares)."""
    c = f"CAST(floor(sqrt(CAST(({n_expr}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({c})*({c}) > ({n_expr}) THEN ({c}) - 1 "
        f"WHEN (({c})+1)*(({c})+1) <= ({n_expr}) THEN ({c}) + 1 "
        f"ELSE ({c}) END)"
    )


def dist2_col(a: str, b: str) -> Column:
    """Exact integer squared L2 distance of two pre-quantized vectors."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivf_centroids(base: DataFrame, n_centroids: int, id_col: str) -> DataFrame:
    return base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("_cid"), F.col("_qv").alias("_cv")
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = IVF_N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: every vector → its nearest centroid
    (ties by centroid id).  One broadcast fan-out (n_centroids×, bounded)
    + one map-side-combinable argmin aggregation — no all-pairs, no
    driver loop.  Output: (id, _qv, _n, bucket)."""
    from geowave_spark.session import spread

    base = spread(emb.select(F.col(id_col), quant_col(F.col(vec_col)).alias("_qv")))
    scored = base.crossJoin(F.broadcast(_ivf_centroids(base, n_centroids, id_col))).withColumn(
        "_d2", dist2_col("_qv", "_cv")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min_by("_cid", F.struct("_d2", "_cid")).alias("bucket"),
            F.any_value("_qv").alias("_qv"),  # constant within the group
        )
        .withColumn("_n", norm_col("_qv"))
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_probes: int = IVF_N_PROBES,
    n_centroids: int = IVF_N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k: each query scans only its ``n_probes``
    nearest inverted lists (bucket equi-join), exact fixed-point cosine
    re-rank inside.  Candidate fraction ≈ n_probes/n_centroids of the
    corpus per query — the knob pair the 100 TB deployment sizes
    (n_centroids ~ sqrt(n), n_probes for recall).  Output matches
    :func:`cosine_topk`: (q_id, rank, vec_id, cos)."""
    from pyspark.sql import Window

    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    cents = _ivf_centroids(
        assigned.select(id_col, "_qv"), n_centroids, id_col
    )
    q = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"),
        F.col("_qv").alias("q_emb"),
        F.col("_n").alias("_qn"),
    )
    wp = Window.partitionBy("q_id").orderBy(F.col("_d2").asc(), F.col("_cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_d2", dist2_col("q_emb", "_cv"))
        .withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probes)
        .select("q_id", "q_emb", "_qn", F.col("_cid").alias("bucket"))
    )
    cand = assigned.join(probes, "bucket").filter(F.col(id_col) != F.col("q_id"))
    cos = F.round(dot_col("_qv", "q_emb") / (F.col("_n") * F.col("_qn")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col(id_col), "cos")
    )


def ivf_topk_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    n_probes: int = IVF_N_PROBES,
    n_centroids: int = IVF_N_CENTROIDS,
) -> str:
    qv = duck_quant("embedding")
    d2 = (
        "CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {c}) "
        "+ list_dot_product({c}, {c}) AS BIGINT)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
cents AS (
  SELECT vec_id AS cid, qv AS cv FROM base WHERE vec_id < {n_centroids}
),
assigned AS (
  SELECT vec_id, qv, bucket FROM (
    SELECT b.vec_id, b.qv, c.cid AS bucket,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY {d2.format(a='b.qv', c='c.cv')} ASC, c.cid ASC) AS rk
    FROM base b CROSS JOIN cents c
  ) WHERE rk = 1
),
probes AS (
  SELECT q_id, q_emb, bucket FROM (
    SELECT q.vec_id AS q_id, q.qv AS q_emb, c.cid AS bucket,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {d2.format(a='q.qv', c='c.cv')} ASC, c.cid ASC) AS rk
    FROM base q CROSS JOIN cents c WHERE q.vec_id < {n_queries}
  ) WHERE rk <= {n_probes}
),
cand AS (
  SELECT p.q_id, a.vec_id,
         round(list_dot_product(a.qv, p.q_emb) /
               (sqrt(list_dot_product(a.qv, a.qv)) *
                sqrt(list_dot_product(p.q_emb, p.q_emb))), 6) AS cos
  FROM probes p JOIN assigned a ON a.bucket = p.bucket
  WHERE a.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand
)
SELECT q_id, rank, vec_id, cos FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# ANN recall measurement: the evidence for the IVF dial.  recall@k / MRR of
# the approximate top-k against the exact top-k ground truth — the number a
# deployment watches when trading n_probes/n_centroids against cost.
# ---------------------------------------------------------------------------


def ann_recall(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_probes: int = IVF_N_PROBES,
    n_centroids: int = IVF_N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query IVF retrieval quality vs the exact scan: (q_id, n_hits,
    recall, mrr1).  ``n_hits`` = exact-top-k items the IVF top-k found,
    ``recall`` = n_hits over the exact list's actual size (= k unless the
    corpus has fewer than k+1 vectors — the denominator never punishes a
    small validation slice), ``mrr1`` = reciprocal rank of the TRUE
    nearest neighbor inside the IVF list (0 when missed).  With
    ``n_probes == n_centroids`` the IVF scan is exhaustive and both
    metrics are exactly 1.0 (pinned by pytest) — the dial's closed-form
    anchor.  Ground truth and candidate lists are the engine's own
    :func:`cosine_topk` / :func:`ivf_topk`; at deployment the exact side
    runs on a sampled query panel, never the full corpus."""
    exact = cosine_topk(emb, n_queries, k, id_col, vec_col).select(
        "q_id", F.col(id_col), F.col("rank").alias("_er")
    )
    approx = ivf_topk(
        emb, n_queries, k, n_probes, n_centroids, id_col, vec_col
    ).select("q_id", F.col(id_col), F.col("rank").alias("_ar"))
    j = exact.join(approx, ["q_id", id_col], "left")
    rr = F.when(
        (F.col("_er") == 1) & F.col("_ar").isNotNull(),
        F.lit(1.0) / F.col("_ar"),
    )
    return j.groupBy("q_id").agg(
        F.count("_ar").alias("n_hits"),
        F.round(
            F.count("_ar").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("recall"),
        F.round(F.coalesce(F.max(rr), F.lit(0.0)), 6).alias("mrr1"),
    )


def ann_recall_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    n_probes: int = IVF_N_PROBES,
    n_centroids: int = IVF_N_CENTROIDS,
) -> str:
    exact = cosine_topk_oracle(table, n_queries, k)
    approx = ivf_topk_oracle(table, n_queries, k, n_probes, n_centroids)
    return f"""
WITH exact AS (SELECT * FROM ({exact})),
approx AS (SELECT * FROM ({approx})),
j AS (
  SELECT e.q_id, e.rank AS er, a.rank AS ar
  FROM exact e LEFT JOIN approx a
    ON a.q_id = e.q_id AND a.vec_id = e.vec_id
)
SELECT q_id,
       CAST(COUNT(ar) AS BIGINT) AS n_hits,
       round(CAST(COUNT(ar) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS recall,
       round(COALESCE(MAX(CASE WHEN er = 1 AND ar IS NOT NULL
                                THEN CAST(1.0 AS DOUBLE) / ar END),
                      CAST(0.0 AS DOUBLE)), 6) AS mrr1
FROM j GROUP BY q_id
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication = cluster, then drop within-cluster
# cosine near-duplicates (Abbas et al. 2023, "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication").  No reference
# analogue (GeoWave has no embedding ops) — a first-class training-data
# pipeline operator over the image+caption corpus's embedding column.
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.30


def semdedup_pairs(
    emb: DataFrame,
    n_centroids: int | None = None,
    tau: float = SEMDEDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-dup pairs: IVF coarse assignment buckets the
    corpus, the exact fixed-point cosine runs only inside each bucket.

    The pairwise work is quadratic PER BUCKET, never global:
    ``n_centroids=None`` derives L = max(16, √n) from the corpus
    (:func:`centroids_for_corpus`), keeping list sizes ~√n so total pair
    work grows n^1.5 instead of n² — the paper's own trick for scaling
    the epsilon-ball search to web scale, and the same shape as
    :func:`neardup_pairs_q`.  Output: (id_a, id_b, bucket, cos ≥ tau).
    """
    if n_centroids is None:
        n_centroids = centroids_for_corpus(emb.count())
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("_qv").alias("_va"),
        F.col("_n").alias("_na"), "bucket",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("_qv").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(dot_col("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select("id_a", "id_b", "bucket", "cos")
    )


def semdedup(
    emb: DataFrame,
    n_centroids: int | None = None,
    tau: float = SEMDEDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full SemDeDup labeling: (id, group_id, keep) for EVERY vector —
    group = connected component of the within-cluster cosine-≥-tau graph,
    keep = the component's min id (deterministic representative; the
    paper's farthest-from-centroid pick is a representative dial, not a
    grouping change).

    Components here are BUCKET-LOCAL by construction — every edge joins
    two members of one IVF bucket — so instead of the iterative min-label
    propagation (a checkpointed driver loop), one ``applyInPandas``
    union-find per bucket labels everything in a single distributed pass;
    bucket sizes are bounded by the inverted-list size, so the local step
    never sees more than one list's pairs."""
    import pandas as pd

    pairs = semdedup_pairs(emb, n_centroids, tau, id_col, vec_col)

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for ia, ib in zip(pdf["id_a"], pdf["id_b"]):
            ra, rb = find(int(ia)), find(int(ib))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(set(pdf["id_a"]) | set(pdf["id_b"]))
        return pd.DataFrame(
            {"node": nodes, "comp": [find(int(n)) for n in nodes]}
        )

    comp = pairs.groupBy("bucket").applyInPandas(_uf, "node long, comp long")
    return (
        emb.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("group_id"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )


def semdedup_oracle(
    table: str = "embeddings",
    n_centroids: int | str | None = None,
    tau: float = SEMDEDUP_TAU,
) -> str:
    """DuckDB replay: argmin centroid assignment, within-bucket pair join,
    recursive-CTE closure, min-label groups.  ``n_centroids=None`` mirrors
    the engine's corpus-derived dial (max(16, isqrt(n)), exact integer
    sqrt) so the oracle stays exact at every sf."""
    if n_centroids is None:
        n_centroids = (
            f"GREATEST({IVF_N_CENTROIDS}, "
            f"{duck_isqrt('SELECT COUNT(*) FROM base')})"
        )
    qv = duck_quant("embedding")
    d2 = (
        "CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {c}) "
        "+ list_dot_product({c}, {c}) AS BIGINT)"
    )
    cos = (
        "round(list_dot_product(a.qv, b.qv) / "
        "(sqrt(list_dot_product(a.qv, a.qv)) * "
        "sqrt(list_dot_product(b.qv, b.qv))), 6)"
    )
    return f"""
WITH RECURSIVE base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
cents AS (
  SELECT vec_id AS cid, qv AS cv FROM base WHERE vec_id < {n_centroids}
),
assigned AS (
  SELECT vec_id, qv, bucket FROM (
    SELECT b.vec_id, b.qv, c.cid AS bucket,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY {d2.format(a='b.qv', c='c.cv')} ASC, c.cid ASC) AS rk
    FROM base b CROSS JOIN cents c
  ) WHERE rk = 1
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {cos} >= {tau}
),
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
SELECT e.vec_id,
       CAST(COALESCE(l.grp, e.vec_id) AS BIGINT) AS group_id,
       (COALESCE(l.grp, e.vec_id) = e.vec_id) AS keep
FROM {table} e LEFT JOIN labels l ON l.node = e.vec_id
"""


def prototypicality(
    emb: DataFrame,
    n_centroids: int = IVF_N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector prototypicality: cosine to the assigned IVF centroid —
    the data-pruning signal of Sorscher et al. 2022 ("Beyond neural
    scaling laws"): highly prototypical examples are redundant in large
    corpora and are the ones to prune first.  Output: (id, bucket,
    proto_cos), exact fixed-point arithmetic (the semdedup quantizer), so
    the score is bit-reproducible in SQL.

    One broadcast argmin assignment + one broadcast centroid join — no
    all-pairs, no extra shuffle beyond ivf_assign's aggregation."""
    from geowave_spark.session import spread

    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    cents = _ivf_centroids(
        spread(emb.select(F.col(id_col), quant_col(F.col(vec_col)).alias("_qv"))),
        n_centroids,
        id_col,
    ).withColumn("_cn", norm_col("_cv"))
    out = assigned.join(
        F.broadcast(cents), assigned["bucket"] == cents["_cid"]
    )
    proto = F.round(dot_col("_qv", "_cv") / (F.col("_n") * F.col("_cn")), 6)
    return out.select(id_col, "bucket", proto.alias("proto_cos"))


def prototype_prune(
    emb: DataFrame,
    prune_frac: float = 0.25,
    n_centroids: int = IVF_N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced prototype pruning: within every IVF bucket, drop
    the ``prune_frac`` MOST prototypical vectors (ties by id) — the
    paper's abundant-data regime, applied per cluster so no class/topic
    is wiped out.  Output: (id, bucket, proto_cos, keep).

    The ranking window partitions by bucket — bounded inverted-list
    sizes, never a global sort — and the drop count is exact integer
    arithmetic (floor(n_bucket * frac)) so the SQL oracle reproduces it
    bit-for-bit."""
    p = prototypicality(emb, n_centroids, id_col, vec_col)
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy(
        F.col("proto_cos").desc(), F.col(id_col).asc()
    )
    nb = Window.partitionBy("bucket")
    return (
        p.withColumn("_rk", F.row_number().over(w))
        .withColumn("_nb", F.count("*").over(nb))
        .select(
            id_col,
            "bucket",
            "proto_cos",
            (
                F.col("_rk")
                > F.floor(F.col("_nb") * F.lit(prune_frac)).cast("long")
            ).alias("keep"),
        )
    )


def prototype_prune_oracle(
    table: str = "embeddings",
    prune_frac: float = 0.25,
    n_centroids: int = IVF_N_CENTROIDS,
) -> str:
    """DuckDB replay: argmin assignment, cosine to own centroid, per-bucket
    rank, integer drop count."""
    qv = duck_quant("embedding")
    d2 = (
        "CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {c}) "
        "+ list_dot_product({c}, {c}) AS BIGINT)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {qv} AS qv FROM {table}
),
cents AS (
  SELECT vec_id AS cid, qv AS cv FROM base WHERE vec_id < {n_centroids}
),
assigned AS (
  SELECT vec_id, qv, bucket FROM (
    SELECT b.vec_id, b.qv, c.cid AS bucket,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY {d2.format(a='b.qv', c='c.cv')} ASC, c.cid ASC) AS rk
    FROM base b CROSS JOIN cents c
  ) WHERE rk = 1
),
scored AS (
  SELECT a.vec_id, a.bucket,
         round(list_dot_product(a.qv, c.cv) /
               (sqrt(list_dot_product(a.qv, a.qv)) *
                sqrt(list_dot_product(c.cv, c.cv))), 6) AS proto_cos
  FROM assigned a JOIN cents c ON a.bucket = c.cid
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY bucket
           ORDER BY proto_cos DESC, vec_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY bucket) AS nb
  FROM scored
)
SELECT vec_id, bucket, proto_cos,
       rk > CAST(floor(nb * {prune_frac}) AS BIGINT) AS keep
FROM ranked
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ): the third ANN family next to hyperplane-LSH
# and IVF — compress vectors to m sub-codes against per-subspace
# codebooks, answer top-k by asymmetric distance (ADC) over the codes.
# At 100 TB this is the memory-bound regime's tool: 64-dim float vectors
# (256 B quantized) become m=8 one-byte codes, and a query touches only
# the code column + a driver-built m×K lookup table.
# ---------------------------------------------------------------------------

PQ_M = 8   # subspaces
PQ_K = 16  # codewords per subspace


def _pq_codebooks(enc: DataFrame, m: int, K: int, id_col: str) -> list:
    """Deterministic codebooks: the first K vectors' subvectors (the same
    sample-as-codebook convention as _ivf_centroids — production swaps in
    the engine's fixed-point Lloyd per subspace; every downstream shape
    is unchanged).  Driver-side list [m][K][sub] of python ints."""
    rows = sorted(
        enc.filter(F.col(id_col) < K).select(id_col, "_qv").collect(),
        key=lambda r: r[0],
    )
    if len(rows) < K:
        raise ValueError(f"need at least {K} vectors to seed PQ codebooks")
    dim = len(rows[0]["_qv"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[int(x) for x in r["_qv"][j * sub : (j + 1) * sub]] for r in rows]
        for j in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """→ ((id, _qv, codes), codebooks): every vector's m sub-codes, each
    the argmin-d2 codeword of its subvector (ties to the lower codeword
    id via the packed d2·K+c key).

    ZERO-shuffle encode: the codebooks ride the UDF closure as driver
    literals and each batch's codes are ONE vectorized numpy argmin over
    a (batch, m, K, sub) difference tensor — Arrow-batched, no
    crossJoin, no window, no aggregation.  (A pure-Catalyst literal
    least()-of-K expression tree was measured first: at m·K·sub =
    8·16·8 the fused stage exceeds the 64 KB codegen method limit and
    the WHOLE stage falls back to interpreted eval — the numpy kernel
    is the faster and cleaner form, the repo's standard escape for
    dense per-row arithmetic.)  numpy argmin takes the FIRST minimum,
    which is exactly the packed d2·K+c lowest-codeword tie-break the
    SQL oracle replays."""
    from geowave_spark.session import spread

    base = spread(
        emb.select(
            F.col(id_col),
            # Generate barrier: quantization evaluated once per row, never
            # re-inlined into the ~m·K·sub-term code expressions
            F.explode(F.array(quant_col(F.col(vec_col)))).alias("_qv"),
        )
    )
    cb = _pq_codebooks(base, m, K, id_col)
    sub = len(cb[0][0])

    import numpy as np

    from pyspark.sql import types as T

    C = np.asarray(cb, dtype=np.int64)  # (m, K, sub) — closure literal

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _codes(qv: pd.Series) -> pd.Series:
        A = np.stack(qv.to_numpy()).astype(np.int64).reshape(-1, m, sub)
        d2 = ((A[:, :, None, :] - C[None, :, :, :]) ** 2).sum(-1)  # (n, m, K)
        codes = d2.argmin(axis=2).astype("int32")  # first min = lowest c
        return pd.Series(list(codes))

    return base.withColumn("codes", _codes(F.col("_qv"))), cb


def pq_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k by squared L2: queries (id < n_queries)
    build their m×K distance tables DRIVER-side from the collected query
    vectors (bounded: n_queries rows) + the codebooks; every corpus
    vector's approximate distance is then m array lookups summed — pure
    codegen column math over the code column, one broadcast of the tiny
    query-table frame, and the per-query top-k window.  Output:
    (q_id, rank, vec_id, ad2)."""
    from pyspark.sql import Window

    enc, cb = pq_encode(emb, m, K, id_col, vec_col)
    sub = len(cb[0][0])
    qrows = sorted(
        enc.filter(F.col(id_col) < n_queries).select(id_col, "_qv").collect(),
        key=lambda r: r[0],
    )
    tabs = []
    for r in qrows:
        qv = [int(x) for x in r["_qv"]]
        tab = [
            [
                sum(
                    (qv[j * sub + t] - cb[j][c][t]) ** 2 for t in range(sub)
                )
                for c in range(K)
            ]
            for j in range(m)
        ]
        tabs.append((int(r[0]), tab))
    qdf = emb.sparkSession.createDataFrame(
        tabs, "q_id long, tab array<array<bigint>>"
    )
    ad2 = F.expr(" + ".join(f"tab[{j}][codes[{j}]]" for j in range(m)))
    w = Window.partitionBy("q_id").orderBy(F.col("ad2").asc(), F.col(id_col).asc())
    return (
        enc.crossJoin(F.broadcast(qdf))
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("ad2", ad2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "ad2")
    )


def pq_topk_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    m: int = PQ_M,
    K: int = PQ_K,
    dim: int = 64,
) -> str:
    """DuckDB replay of the WHOLE PQ pipeline: quantize → codebooks =
    first-K subvectors → per-vector sub-codes via packed arg_min →
    query m×K tables → ADC sum → ranked top-k.  Integer end-to-end."""
    sub = dim // m
    qv = duck_quant("embedding")

    def d2(j: int, a: str, b: str) -> str:
        return " + ".join(
            f"({a}[{j * sub + t + 1}] - {b}[{j * sub + t + 1}])"
            f" * ({a}[{j * sub + t + 1}] - {b}[{j * sub + t + 1}])"
            for t in range(sub)
        )

    code_arms = " UNION ALL ".join(
        f"""SELECT v.vec_id, {j} AS j,
       CAST(arg_min(c.cid, ({d2(j, 'v.qv', 'c.qv')}) * {K} + c.cid) AS INTEGER)
         AS code
FROM q v CROSS JOIN cb c GROUP BY v.vec_id"""
        for j in range(m)
    )
    tab_arms = " UNION ALL ".join(
        f"""SELECT qq.vec_id AS q_id, {j} AS j, c.cid,
       CAST({d2(j, 'qq.qv', 'c.qv')} AS BIGINT) AS d2q
FROM qq CROSS JOIN cb c"""
        for j in range(m)
    )
    return f"""
WITH q AS MATERIALIZED (SELECT vec_id, {qv} AS qv FROM {table}),
cb AS MATERIALIZED (SELECT vec_id AS cid, qv FROM q WHERE vec_id < {K}),
qq AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE vec_id < {n_queries}),
codes AS MATERIALIZED ({code_arms}),
tabs AS MATERIALIZED ({tab_arms}),
ad AS (
  SELECT t.q_id, v.vec_id, SUM(t.d2q) AS ad2
  FROM codes v JOIN tabs t ON t.j = v.j AND t.cid = v.code
  WHERE v.vec_id != t.q_id
  GROUP BY t.q_id, v.vec_id),
rk AS (
  SELECT q_id, vec_id, CAST(ad2 AS BIGINT) AS ad2,
         row_number() OVER (PARTITION BY q_id ORDER BY ad2 ASC, vec_id ASC)
           AS rank
  FROM ad)
SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id, ad2
FROM rk WHERE rank <= {k}"""


def l2_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT squared-L2 top-k scan (the PQ ground truth; the L2 twin of
    :func:`cosine_topk`): broadcast query side, one pass over the
    corpus, per-query rank window.  Output: (q_id, rank, vec_id, d2)."""
    from pyspark.sql import Window

    from geowave_spark.session import spread

    base = spread(
        emb.select(F.col(id_col), quant_col(F.col(vec_col)).alias("_qv"))
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col("_qv").alias("q_emb")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col(id_col).asc())
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("d2", dist2_col("_qv", "q_emb"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "d2")
    )


def pq_recall(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ retrieval quality vs the exact L2 scan — the measured number
    behind the (m, K) dial, same shape as :func:`ann_recall`:
    (q_id, n_hits, recall, mrr1)."""
    exact = l2_topk(emb, n_queries, k, id_col, vec_col).select(
        "q_id", F.col(id_col), F.col("rank").alias("_er")
    )
    approx = pq_topk(emb, n_queries, k, m, K, id_col, vec_col).select(
        "q_id", F.col(id_col), F.col("rank").alias("_ar")
    )
    j = exact.join(approx, ["q_id", id_col], "left")
    rr = F.when(
        (F.col("_er") == 1) & F.col("_ar").isNotNull(),
        F.lit(1.0) / F.col("_ar"),
    )
    return j.groupBy("q_id").agg(
        F.count("_ar").alias("n_hits"),
        F.round(
            F.count("_ar").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("recall"),
        F.round(F.coalesce(F.max(rr), F.lit(0.0)), 6).alias("mrr1"),
    )


def pq_recall_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    m: int = PQ_M,
    K: int = PQ_K,
    dim: int = 64,
) -> str:
    d2 = (
        "CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {b}) "
        "+ list_dot_product({b}, {b}) AS BIGINT)"
    )
    qv = duck_quant("embedding")
    return f"""
WITH pq AS MATERIALIZED ({pq_topk_oracle(table, n_queries, k, m, K, dim)}),
base AS (SELECT vec_id, {qv} AS qv FROM {table}),
exact AS (
  SELECT q_id, vec_id, rank AS er FROM (
    SELECT q.vec_id AS q_id, b.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {d2.format(a='b.qv', b='q.qv')} ASC, b.vec_id ASC)
             AS rank
    FROM base b CROSS JOIN base q
    WHERE q.vec_id < {n_queries} AND b.vec_id <> q.vec_id
  ) WHERE rank <= {k}),
j AS (
  SELECT e.q_id, e.vec_id, e.er, p.rank AS ar
  FROM exact e LEFT JOIN pq p ON p.q_id = e.q_id AND p.vec_id = e.vec_id)
SELECT q_id,
       CAST(COUNT(ar) AS BIGINT) AS n_hits,
       round(CAST(COUNT(ar) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS recall,
       round(COALESCE(MAX(CASE WHEN er = 1 AND ar IS NOT NULL
                                THEN CAST(1 AS DOUBLE) / ar END), 0.0), 6)
         AS mrr1
FROM j GROUP BY q_id"""


def hard_negatives(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_cos: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` MOST similar vectors with a DIFFERENT ``label_col`` (the
    supervised-contrastive negatives; the hardest ones are exactly the
    most-similar cross-label items).  ``max_cos`` additionally drops
    candidates above a cosine ceiling — the false-negative filter for
    weakly-labeled corpora (a cross-label pair at cos≈1 is almost surely
    a labeling error, not a useful negative).

    Same plan as :func:`cosine_topk` (anchors broadcast, norms computed
    once below the join boundary, per-anchor rank window); the label
    filter rides the join condition, so excluded pairs never reach the
    window.  Output: (q_id, rank, vec_id, cos, label)."""
    from pyspark.sql import Window

    base = emb.withColumn("_qv", quant_col(F.col(vec_col))).withColumn(
        "_n", norm_col("_qv")
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"),
        F.col("_qv").alias("q_emb"),
        F.col("_n").alias("_qn"),
        F.col(label_col).alias("_ql"),
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col("_ql"))
        .withColumn(
            "cos",
            F.round(dot_col("_qv", "q_emb") / (F.col("_n") * F.col("_qn")), 6),
        )
    )
    if max_cos is not None:
        pairs = pairs.filter(F.col("cos") < F.lit(max_cos))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col(id_col), "cos", F.col(label_col))
    )


def hard_negatives_oracle(
    table: str = "embeddings",
    n_queries: int = 8,
    k: int = 10,
    max_cos: float | None = None,
) -> str:
    qv = duck_quant("embedding")
    ceil = f"AND cos < {max_cos}" if max_cos is not None else ""
    return f"""
WITH base AS (
  SELECT vec_id, label, {qv} AS qv FROM {table}
),
q AS (
  SELECT vec_id AS q_id, label AS ql, qv AS q_emb
  FROM base WHERE vec_id < {n_queries}
),
pairs AS (
  SELECT q.q_id, e.vec_id, e.label,
         round(list_dot_product(e.qv, q.q_emb) /
               (sqrt(list_dot_product(e.qv, e.qv)) *
                sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
  FROM base e CROSS JOIN q WHERE e.label <> q.ql
),
ranked AS (
  SELECT q_id, vec_id, cos, label,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM pairs WHERE 1=1 {ceil}
)
SELECT q_id, rank, vec_id, cos, label FROM ranked WHERE rank <= {k}
"""
