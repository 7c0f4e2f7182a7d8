"""k-nearest-neighbor via iterative cell-ring expansion join.

The Spark re-expression of the reference's NN machinery: entries are grouped
into cells, each query searches its own cell plus an expansion ring, pairs
are scored within the partition, and per-query top-k survives
(analytics/api/.../partitioner/AbstractPartitioner.java:88-137 primary+
expansion cells; analytics/mapreduce/.../nn/NNMapReduce.java:129-340 within-
partition pairwise + setUpperBoundPerPartition top-k).

Differences, Spark-first:
* the ring is on the *query* side (queries are few → broadcast), not
  duplicated data rows;
* ring radius grows 4x per round, driven from the driver on the aggregated
  not-yet-satisfied counts (SURVEY §7 hard part (c)) — each round is one
  broadcast join + window;
* termination proof per query: with ring Chebyshev radius m at resolution r,
  every unseen point is farther than (m-1) * cell_height; once the k-th
  candidate distance is below that bound the result is exact.

Metric: exact integer squared planar milli-degree distance with date-line
wrap (functions/geometry.planar_wrap_dist2_milli) — reproducible in the SQL
oracle.  Haversine ordering is available via rank_metric="haversine" for
production use (geodesically correct, not bit-reproducible across engines).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.functions import udfs as U
from geowave_spark.operators.index import PARTITION_RES as OI_PARTITION_RES
from geowave_spark.plans import planner as P


@dataclass
class KnnQuery:
    query_id: str
    lon: float
    lat: float
    k: int

    @property
    def lon_milli(self) -> int:
        return int(round(self.lon * 1000))

    @property
    def lat_milli(self) -> int:
        return int(round(self.lat * 1000))


def _ring_cover(q: KnnQuery, res: int, m: int) -> pd.DataFrame:
    center = C.encode(q.lon, q.lat, res)[()]
    cells = C.ring(int(center), m)
    return pd.DataFrame({"query_id": q.query_id, "jcell": cells})


# Above this many queries the interactive path routes through knn_join
# (query table as the left side) — the per-round result collect of ring
# expansion stops paying once the query set is itself a small table.
KNN_JOIN_THRESHOLD = 32


def query_knn(
    data: DataFrame,
    queries: list[KnnQuery],
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "event_id",
    res: int = 10,
    start_ring: int = 2,
    max_rounds: int = 8,
    max_ring_cells: int = 4096,
    rank_metric: str = "planar_milli",
    dedup: bool = False,
    cache_rounds: bool = True,
    join_threshold: int = KNN_JOIN_THRESHOLD,
) -> DataFrame:
    """Exact top-k rows per query point.

    Returns (query_id, rank, <id_col>, dist2_milli | dist_m).  Ties broken
    by ``id_col`` so results are deterministic (the golden-suite requirement
    — FIXTURES.md F4).

    Two physical strategies, one semantic: below ``join_threshold`` queries
    the ring-expansion loop runs (per-round collect is ≤ Σk rows — right
    for a handful of interactive lookups); at or above it the query set
    becomes the LEFT side of :func:`knn_join` with distance-bound
    escalation — no per-round result collect, only a ≤|queries|-row
    satisfied-count check per round (exact-equivalence pytest:
    tests/test_knn.py).  The join route needs the integer metric; haversine
    or dedup'd inputs stay on the ring path.
    """
    spark = data.sparkSession
    if (
        len(queries) >= join_threshold
        and rank_metric == "planar_milli"
        and not dedup
    ):
        return _query_knn_via_join(data, queries, id_col, max_rounds)
    lat_cell_milli = 180_000.0 / (1 << res)

    if rank_metric == "planar_milli":
        # exact integer metric — requires the lon_milli/lat_milli columns the
        # geo views carry (recomputing milli from the double would truncate)
        dist_col = U.planar_wrap_dist2_col(
            F.col("lon_milli"), F.col("lat_milli"),
            F.col("q_lon_milli"), F.col("q_lat_milli"),
        ).alias("dist2_milli")
    elif rank_metric == "haversine":
        dist_col = U.haversine_m_col(
            F.col(lon_col), F.col(lat_col), F.col("q_lon"), F.col("q_lat")
        ).alias("dist_m")
    else:
        raise ValueError(rank_metric)
    dist_name = "dist2_milli" if rank_metric == "planar_milli" else "dist_m"

    qmeta = {q.query_id: q for q in queries}
    pending = list(queries)
    m = start_ring
    results: list = []  # collected per-round satisfied top-k (driver-small)
    world_cells = 1 << res

    # One slim projection shared by every round (and the brute-force
    # fallback): id + coords + precomputed join key.  Persisted so ring
    # expansion re-joins against memory, not the source scan.  At 10^12
    # rows the cache is replaced (or complemented) by partition pruning:
    # when the table carries ``cell_p``, each round first filters on the
    # parent-cell set of its ring cover — on a cell_p-partitioned store
    # that predicate prunes directory partitions before any scan.
    need = [id_col, lon_col, lat_col]
    if rank_metric == "planar_milli":
        need += ["lon_milli", "lat_milli"]
    prune_col = "cell_p" if "cell_p" in data.columns else None
    if prune_col:
        need.append(prune_col)
    slim = data.withColumn("_jkey", P.data_join_key(res)).select(*need, "_jkey")
    if cache_rounds:
        slim = slim.persist()

    for _ in range(max_rounds):
        if not pending:
            break
        if (2 * m + 1) ** 2 > max_ring_cells:
            break  # ring broadcast would blow the budget → brute-force rest
        cover_pdf = pd.concat([_ring_cover(q, res, m) for q in pending])
        cover_pdf = cover_pdf.drop_duplicates()
        cover = spark.createDataFrame(cover_pdf)
        qdf = spark.createDataFrame(
            [(q.query_id, q.lon, q.lat, q.lon_milli, q.lat_milli, q.k) for q in pending],
            "query_id string, q_lon double, q_lat double, "
            "q_lon_milli long, q_lat_milli long, k int",
        )
        src = slim
        if prune_col:
            # partition-prune: only coarse parents touched by this ring
            parents = set(
                int(c)
                for c in C.parent(
                    cover_pdf["jcell"].to_numpy(), min(OI_PARTITION_RES, res)
                )
            )
            src = slim.filter(F.col(prune_col).isin(list(parents)))
        pre = (
            src.join(F.broadcast(cover), F.col("_jkey") == F.col("jcell"))
            .join(F.broadcast(qdf), "query_id")
            .withColumn("_d", dist_col)
        )
        if dedup:
            pre = pre.dropDuplicates(["query_id", id_col])
        w = Window.partitionBy("query_id").orderBy(F.col("_d").asc(), F.col(id_col).asc())
        topk = (
            pre.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", id_col, F.col("_d").alias(dist_name))
        )
        rows = topk.collect()  # ≤ Σk rows — driver-small by construction
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)

        # termination check per query: k candidates found AND the k-th
        # distance is provably within the ring's guaranteed radius
        guaranteed_milli = max(m - 1, 0) * lat_cell_milli
        if rank_metric == "planar_milli":
            bound = guaranteed_milli * guaranteed_milli
        else:
            # metres: 1 milli-deg latitude ≈ 111.195 m
            bound = guaranteed_milli * 111.195
        whole_world = 2 * m + 1 >= world_cells
        still = []
        for q in pending:
            got = by_q.get(q.query_id, [])
            if len(got) >= q.k and (
                whole_world or got[q.k - 1][dist_name] <= bound
            ):
                results.extend(got[: q.k])
            elif whole_world:
                results.extend(got)  # fewer than k rows exist in total
            else:
                still.append(q)
        pending = still
        m *= 4  # aggressive growth: each round is a full job; fewer, larger rounds win

    if pending:
        # fallback: exact brute force for stragglers (tiny query set)
        qdf = spark.createDataFrame(
            [(q.query_id, q.lon, q.lat, q.lon_milli, q.lat_milli, q.k) for q in pending],
            "query_id string, q_lon double, q_lat double, "
            "q_lon_milli long, q_lat_milli long, k int",
        )
        pre = slim.crossJoin(F.broadcast(qdf)).withColumn("_d", dist_col)
        if dedup:
            pre = pre.dropDuplicates(["query_id", id_col])
        w = Window.partitionBy("query_id").orderBy(F.col("_d").asc(), F.col(id_col).asc())
        rows = (
            pre.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", id_col, F.col("_d").alias(dist_name))
            .collect()
        )
        results.extend(rows)

    if cache_rounds:
        slim.unpersist()
    schema = f"query_id string, rank int, {id_col} long, {dist_name} " + (
        "long" if rank_metric == "planar_milli" else "double"
    )
    return spark.createDataFrame(
        [(r.query_id, r["rank"], r[id_col], r[dist_name]) for r in results], schema
    )


def _query_knn_via_join(
    data: DataFrame,
    queries: list,
    id_col: str,
    max_rounds: int,
    start_dist_milli: int = 1000,
) -> DataFrame:
    """query_knn for moderate query sets: the queries become a small left
    table for :func:`knn_join`, the distance bound escalating 4× per round
    until every query holds its k rows (a query with ≥k rows inside bound D
    provably has its exact global top-k — the k-th distance is ≤ D).  The
    per-round driver traffic is one ≤|queries|-row count, never result
    rows.  Queries still unsatisfied at the coarsest join-able bound (45°)
    finish on a distributed broadcast brute-force arm — no collect there
    either."""
    spark = data.sparkSession
    cap = C.LAT_SPAN_MILLI >> 2  # coarsest bound knn_join's 3x3 ring covers
    kmax = max(q.k for q in queries)
    need = {q.query_id: q.k for q in queries}
    qdf = spark.createDataFrame(
        [(q.query_id, q.lon_milli, q.lat_milli, q.k) for q in queries],
        "query_id string, lon_milli long, lat_milli long, k int",
    )
    # Persisted for the same reason the ring path caches ITS projection:
    # every escalation round (and the brute-force arm) re-joins this slim
    # frame — without the persist each round is a fresh source-table scan.
    slim = data.select(id_col, "lon_milli", "lat_milli").persist()

    d = min(start_dist_milli, cap)
    best, unsat = None, list(need)
    for _ in range(max_rounds):
        best = knn_join(
            qdf, slim, k=kmax, max_dist_milli=d,
            left_id="query_id", right_id=id_col, exclude_self=False,
        ).localCheckpoint()  # bound: reused for the count AND the output
        got = {
            r.query_id: r.n
            for r in best.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        unsat = [qid for qid, k in need.items() if got.get(qid, 0) < k]
        if not unsat or d >= cap:
            break
        d = min(d * 4, cap)

    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col(id_col).asc()
    )
    out = (
        best.join(F.broadcast(qdf.select("query_id", "k")), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id", "rank",
            F.col("neighbor_id").alias(id_col),
            "dist2_milli",
        )
    )
    if unsat:
        # sparse stragglers: exact brute force, still fully distributed
        pend = qdf.filter(F.col("query_id").isin(unsat)).select(
            "query_id",
            F.col("lon_milli").alias("_qlon"),
            F.col("lat_milli").alias("_qlat"),
            "k",
        )
        brute = (
            slim.crossJoin(F.broadcast(pend))
            .withColumn(
                "_d",
                U.planar_wrap_dist2_col(
                    F.col("lon_milli"), F.col("lat_milli"),
                    F.col("_qlon"), F.col("_qlat"),
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", id_col, F.col("_d").alias("dist2_milli"))
        )
        # materialize the straggler union so it stops referencing the
        # cached projection before the release below (a later re-execution
        # of ``out`` must not silently recompute the full slim scan)
        out = out.filter(~F.col("query_id").isin(unsat)).unionByName(
            brute
        ).localCheckpoint()
    # every round's result is localCheckpoint-materialized (straggler arm
    # included, just above), so nothing downstream re-reads the cached
    # projection — release it on BOTH paths; leaking it accumulated a full
    # (id, lon, lat) copy in executor storage per query_knn call
    slim.unpersist(False)
    return out


# ---------------------------------------------------------------------------
# Dataset-scale kNN join (no driver loop, no collect) — the actual shape of
# the reference's NN machinery: every left row is a query.
# ---------------------------------------------------------------------------


def knn_join_res(max_dist_milli: int, max_res: int = C.MAX_RES) -> int:
    """Finest grid resolution whose cell height covers ``max_dist_milli``.

    With lat cell height 180000/2^r >= max_dist (lon width is 2x that), any
    pair within planar distance max_dist lies within one Chebyshev ring of
    each other's cell — the reference's partitioner invariant
    (analytics/api/.../partitioner/AbstractPartitioner.java:88-137: cell
    size derived from the NN distance so primary + expansion neighborhood
    is a complete candidate set).
    """
    r = 0
    while r + 1 <= max_res and (C.LAT_SPAN_MILLI >> (r + 1)) >= max_dist_milli:
        r += 1
    return r


_OFFSETS_3X3 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _offset_explode():
    """Literal (dx, dy) 3x3 offset explode.  Explode-then-compute keeps the
    key expression in whole-stage codegen: building an ARRAY of 9 keys and
    filtering it with a higher-order function drops the whole expression
    (with the per-key re-inlined input derivation) into interpreted
    evaluation — measured 70s vs ~2s on 9k rows (the Catalyst re-inlining
    trap, see CLAUDE.md)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dx).cast("long").alias("dx"),
                    F.lit(dy).cast("long").alias("dy"),
                )
                for dx, dy in _OFFSETS_3X3
            ]
        )
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    max_dist_milli: int,
    left_id: str = "event_id",
    right_id: str = "event_id",
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
    exclude_self: bool = True,
    res: int | None = None,
) -> DataFrame:
    """All-rows kNN join: for EVERY left row, its top-k right rows within
    ``max_dist_milli`` (exact planar milli-deg metric with date-line wrap).

    The Spark re-expression of NNMapReduce
    (analytics/mapreduce/.../nn/NNMapReduce.java:129-340): the reference
    duplicates each entry into its primary + expansion partition cells and
    does within-partition pairwise scoring; here the LEFT side explodes to
    its 3x3 neighbor keys (<=9x, usually <=6x after lat clamp), the right
    side keeps its single primary key, and a shuffle equi-join on the key
    replaces the MR partitioner.  Cell resolution is derived from the
    distance bound (cell >= max_dist), so the neighborhood is a provably
    complete candidate set — the join is EXACT, not approximate.  Per-left
    top-k is one window; ties break on the right id (deterministic).

    100 TB posture: one explode (<=9x on the smaller side — pass the
    smaller relation as ``left``), one shuffle join on a fine spatial key
    (res auto-picked fine => bounded per-cell density; AQE splits residual
    hot-blob skew), one window shuffle on left id.  No driver loop, no
    collect, no broadcast requirement on either side.

    Returns (query_id, rank, neighbor_id, dist2_milli).
    """
    if res is None:
        res = knn_join_res(max_dist_milli)

    # fan-out-dense: make sure a tiny (few-split) input doesn't serialize
    # the whole join onto one core (no-op when the source has real splits)
    from geowave_spark.session import spread

    left = spread(left)
    right = spread(right)

    n = 1 << res
    lhs = left.select(
        F.col(left_id).alias("query_id"),
        F.col(lon_milli).alias("_qlon"),
        F.col(lat_milli).alias("_qlat"),
    ).withColumn("_o", _offset_explode())
    l_ix = X.grid_milli_col(F.col("_qlon"), 180_000, C.LON_SPAN_MILLI, F.lit(res))
    l_iy = X.grid_milli_col(F.col("_qlat"), 90_000, C.LAT_SPAN_MILLI, F.lit(res))
    nx = F.pmod(l_ix + F.col("_o.dx"), F.lit(n))
    ny = l_iy + F.col("_o.dy")
    # lat clamps off the poles (rows whose neighbor row is off-world drop);
    # lon wraps via pmod.  With n > 3 the 9 keys are distinct by
    # construction, so no dedup is needed (assert guards tiny grids).
    assert n > 3, "knn_join needs res >= 2 (coarser grids alias neighbors)"
    lhs = (
        lhs.withColumn("_jkey", X._pack(nx, ny.cast("long"), res))
        .filter((ny >= 0) & (ny < n))
        .drop("_o")
    )
    rhs = right.select(
        F.col(right_id).alias("neighbor_id"),
        F.col(lon_milli).alias("_nlon"),
        F.col(lat_milli).alias("_nlat"),
        X.cell_encode_milli_col(F.col(lon_milli), F.col(lat_milli), res).alias("_jkey"),
    )

    pairs = lhs.join(rhs, "_jkey").withColumn(
        "_d",
        U.planar_wrap_dist2_col(
            F.col("_qlon"), F.col("_qlat"), F.col("_nlon"), F.col("_nlat")
        ),
    )
    pred = F.col("_d") <= F.lit(int(max_dist_milli) ** 2)
    if exclude_self:
        pred = pred & (F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.filter(pred)

    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.col("_d").alias("dist2_milli"))
    )


KNN_ADAPTIVE_MIN_BYTES = 8 << 20  # right-side estimate below this: one pass


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst optimizer size estimate in bytes; Long.MaxValue ("unknown",
    statless leaves) maps to huge so unknown sources take the scale path."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return 1 << 62


def knn_join_adaptive(
    left: DataFrame,
    right: DataFrame,
    k: int,
    max_dist_milli: int,
    left_id: str = "event_id",
    right_id: str = "event_id",
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
    exclude_self: bool = True,
    divisors: tuple[int, ...] = (16, 4, 1),
) -> DataFrame:
    """Escalating-radius dataset-scale kNN join — output IDENTICAL to
    :func:`knn_join` (same rows, same oracle), with candidate work bounded
    by each query's LOCAL density instead of the spec radius.

    Why (sf1 scale gate): the fixed-radius plan's candidate set is
    N·density·R² — at 10× data BOTH factors grow, so candidates grew 100×
    while the output (≤N·k) grew 10× and rows/sec DROPPED 3×.  Here round
    i runs the exact join at d_i = max_dist/16, /4, /1; a query that
    already found k neighbors within d_i is FINAL — every point outside
    d_i is farther than its kth hit, so its top-k cannot change — which
    finalizes exactly the dense queries whose full-radius candidate sets
    explode, leaving only sparse stragglers (few candidates by
    definition) for the big radius.  Rounds are driver-bounded
    (len(divisors)) and each remaining set is localCheckpointed (the
    driver-looped-iteration plan-explosion rule).

    Ties are safe across rounds: equal dist2 ≤ d_i² means the tied point
    is inside d_i and therefore in the round's complete candidate set.

    Small inputs take the single-pass :func:`knn_join` instead — the
    escalation's fixed per-round cost (extra joins + checkpoints, ~3s on
    local[32]) only pays for itself when the candidate fan-out is large.
    The probe is the free Catalyst size estimate (the session.spread
    contract: estimate-first, never a count job); unknown-stat sources
    escalate, which at worst re-pays the fixed overhead."""
    if _estimated_bytes(right) < KNN_ADAPTIVE_MIN_BYTES:
        return knn_join(
            left, right, k, max_dist_milli,
            left_id=left_id, right_id=right_id, lon_milli=lon_milli,
            lat_milli=lat_milli, exclude_self=exclude_self,
        )
    dists = sorted({max(1, int(max_dist_milli) // int(dv)) for dv in divisors})
    if dists[-1] != int(max_dist_milli):
        dists.append(int(max_dist_milli))
    kw = dict(
        left_id=left_id, right_id=right_id, lon_milli=lon_milli,
        lat_milli=lat_milli, exclude_self=exclude_self,
    )
    remaining = left
    finals: list[DataFrame] = []
    for d in dists[:-1]:
        got = knn_join(remaining, right, k, d, **kw).localCheckpoint()
        done = (
            got.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == k)
            .select("query_id")
        )
        finals.append(got.join(done, "query_id", "semi"))
        remaining = remaining.join(
            done.withColumnRenamed("query_id", left_id), left_id, "left_anti"
        ).localCheckpoint()
    finals.append(knn_join(remaining, right, k, max_dist_milli, **kw))
    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f)
    return out
