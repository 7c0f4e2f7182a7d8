"""Distributed clustering analytics: grid-DBSCAN and KMeans.

The reference ships MapReduce analytics reusing its SFC partitioning:
DBSCAN (analytics/mapreduce/.../dbscan/DBScanMapReduce.java — NN-join
based density clustering), KMeans (analytics/spark/.../kmeans/
KMeansRunner.java:112-240 — MLlib over extracted vectors), and the NN
partition join they share (AbstractPartitioner.java:88-137).

Spark-first re-expressions:

* **DBSCAN** — the cell grid IS the spatial partitioner: with cell size ≥
  eps, a point's eps-neighbors live in its 3×3 cell neighborhood, so the
  neighbor count (core-point test) is one self-join on the exploded
  neighborhood keys, and cluster formation is spatially-partitioned
  connected components (per-coarse-cell union-find + boundary-graph
  contraction — one distributed pass, see ``_components_spatial``; the
  round-1 iterative label propagation needed O(diameter) rounds).
* **KMeans** — fixed-point Lloyd's: assign = ZERO-SHUFFLE literal-key
  argmin column expression (centroids are driver-side each round),
  update = one map-side-combinable groupBy sum; centroid means are
  re-quantized to integer milli-degrees so every round replays exactly
  in DuckDB (the registry oracle unrolls seeding + iterations in SQL).
  :func:`kmeans_mllib` is the production drop-in (the reference's own
  KMeansRunner wraps MLlib); the hand-rolled one is the deterministic
  correctness gate.

Both use the exact integer planar-milli metric shared with kNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X


def dbscan(
    data: DataFrame,
    eps_milli: int,
    min_pts: int,
    id_col: str = "event_id",
    max_rounds: int = 20,
) -> DataFrame:
    """Grid-DBSCAN over milli-degree integer coordinates.

    Returns (id, cluster) for CORE points and their border points;
    noise rows are absent.  ``cluster`` is the minimum member id —
    deterministic.  Requires ``lon_milli``/``lat_milli`` columns.

    Scale notes: cell res is chosen so cell span ≥ eps (3×3 neighborhood
    suffices); the neighbor join is an equi-join on neighborhood keys
    (never a cross join); label propagation shuffles only core points.
    """
    # finest res whose cell span (lat dimension is the tighter one) ≥ eps
    res = 0
    while (C.LAT_SPAN_MILLI >> (res + 1)) >= eps_milli and res < 20:
        res += 1
    n = 1 << res

    from geowave_spark.session import spread

    pts = spread(
        data.select(
            F.col(id_col).alias("pid"),
            F.col("lon_milli").cast("long").alias("px"),
            F.col("lat_milli").cast("long").alias("py"),
        )
    )
    gx = X.grid_milli_col(F.col("px"), 180_000, C.LON_SPAN_MILLI, F.lit(res))
    gy = X.grid_milli_col(F.col("py"), 90_000, C.LAT_SPAN_MILLI, F.lit(res))
    pts = pts.withColumn("_gx", gx).withColumn("_gy", gy)

    # explode each point to its 3×3 neighborhood (lon wraps, lat clamps)
    dx = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dx")
    nb = pts.select("pid", "px", "py", "_gx", "_gy", dx)
    dy = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dy")
    nb = nb.select("pid", "px", "py", "_gx", "_gy", "_dx", dy)
    nb = nb.select(
        "pid", "px", "py",
        F.pmod(F.col("_gx") + F.col("_dx"), F.lit(n)).alias("_nx"),
        (F.col("_gy") + F.col("_dy")).alias("_ny"),
    ).filter((F.col("_ny") >= 0) & (F.col("_ny") < n))

    home = pts.select(
        F.col("pid").alias("qid"), F.col("px").alias("qx"), F.col("py").alias("qy"),
        F.col("_gx").alias("_nx"), F.col("_gy").alias("_ny"),
    )
    # candidate pairs share a (neighbor-cell == home-cell) key
    dlon = F.least(
        F.abs(F.col("px") - F.col("qx")),
        F.lit(C.LON_SPAN_MILLI) - F.abs(F.col("px") - F.col("qx")),
    )
    dlat = F.col("py") - F.col("qy")
    dist2 = dlon * dlon + dlat * dlat  # exact int64 (no pow → no double)
    pairs = (
        nb.join(home, ["_nx", "_ny"])
        .filter(dist2 <= F.lit(int(eps_milli) ** 2))
        .select("pid", "qid")  # qid is within eps of pid (includes self)
        .distinct()
    )
    deg = pairs.groupBy("pid").agg(F.count("*").alias("_deg"))
    core = deg.filter(F.col("_deg") >= min_pts).select("pid")

    # core-core adjacency; connected components give cluster labels
    core_pairs = (
        pairs.join(core, "pid")
        .join(core.select(F.col("pid").alias("qid")), "qid")
        .filter(F.col("pid") != F.col("qid"))
    )
    labels = _components_spatial(
        core_pairs, pts.select("pid", "_gx", "_gy"), core, coarse_shift=3
    )

    # attach border points: non-core points within eps of a core point
    border = (
        pairs.join(core.select(F.col("pid").alias("qid")), "qid")
        .join(labels.withColumnRenamed("pid", "qid"), "qid")
        .join(core, "pid", "left_anti")
        .groupBy("pid")
        .agg(F.min("cluster").alias("cluster"))
    )
    return labels.select(F.col("pid").alias(id_col), "cluster").unionByName(
        border.select(F.col("pid").alias(id_col), "cluster")
    )


def _components_spatial(
    core_pairs: DataFrame,
    cells: DataFrame,
    core: DataFrame,
    coarse_shift: int = 3,
) -> DataFrame:
    """Connected components of the (spatially local) core graph in ONE
    distributed pass + one tiny contraction — replaces iterative label
    propagation, whose round count grows with component diameter (round-1
    weakness: a dense blob at sf0.1 has diameter ≫ 20).

    Exploits DBSCAN's structure: edges span ≤ eps, so partitioning nodes by
    a COARSE cell (the eps-derived grid coarsened ``coarse_shift`` levels)
    makes almost every edge internal to one partition.  Per coarse cell a
    numpy/dict union-find labels the local subgraph (union-by-min → local
    root = min member).  Only BOUNDARY edges (endpoints in different
    coarse cells — a perimeter-sized set) survive, contracted to local-root
    pairs and solved on the driver; the final label (= min pid of the
    whole component) broadcasts back.  Deterministic, independent of
    partitioning.  At 10^12 rows the driver step becomes a second
    distributed contraction round (the boundary graph shrinks by the
    area/perimeter ratio every round) — same machinery, no collect.

    ``cells``: (pid, _gx, _gy) grid coords; ``core``: (pid) core points.
    Returns (pid, cluster).
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = core_pairs.sparkSession
    ccell = (
        F.shiftright(F.col("_gx"), coarse_shift) * F.lit(1 << 32)
        + F.shiftright(F.col("_gy"), coarse_shift)
    )
    c = cells.join(core, "pid").select("pid", ccell.alias("ccell"))
    e = (
        core_pairs.join(c.select("pid", F.col("ccell").alias("_ca")), "pid")
        .join(
            c.select(F.col("pid").alias("qid"), F.col("ccell").alias("_cb")), "qid"
        )
    )
    internal = e.filter(F.col("_ca") == F.col("_cb")).select(
        "pid", "qid", F.col("_ca").alias("ccell")
    )

    def _uf_run(edge_iter):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in edge_iter:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union-by-min: root stays the set minimum
        return parent, find

    uf_schema = T.StructType(
        [T.StructField("pid", T.LongType()), T.StructField("lroot", T.LongType())]
    )

    def local_uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent, find = _uf_run(
            zip(pdf.pid.astype("int64"), pdf.qid.astype("int64"))
        )
        nodes = list(parent)
        return pd.DataFrame({"pid": nodes, "lroot": [find(v) for v in nodes]})

    local = internal.groupBy("ccell").applyInPandas(local_uf, uf_schema)
    # allc feeds THREE downstream subtrees (both boundary-edge joins and
    # the final labeling) — without severing, each re-runs the Python
    # union-find pass; one materialization here (executor-local, no
    # driver traffic) replaces three applyInPandas executions
    allc = (
        core.join(local, "pid", "left")
        .withColumn("lroot", F.coalesce("lroot", F.col("pid")))
        .localCheckpoint()
    )
    bnd = (
        e.filter(F.col("_ca") != F.col("_cb"))
        .join(allc.select("pid", F.col("lroot").alias("_ra")), "pid")
        .join(
            allc.select(F.col("pid").alias("qid"), F.col("lroot").alias("_rb")),
            "qid",
        )
        .select("_ra", "_rb")
        .distinct()
    )
    edges = [(int(r._ra), int(r._rb)) for r in bnd.collect()]
    parent, find = _uf_run(edges)
    remap = [(int(r), int(find(r))) for r in parent]
    if remap:
        remap_df = spark.createDataFrame(remap, "lroot long, cluster long")
        labels = (
            allc.join(F.broadcast(remap_df), "lroot", "left")
            .withColumn("cluster", F.coalesce("cluster", F.col("lroot")))
            .select("pid", "cluster")
        )
    else:
        labels = allc.select("pid", F.col("lroot").alias("cluster"))
    return labels


KM_ENC = 1024  # argmin key packing: key = d2 * KM_ENC + cluster  (k bound)
KM_OFF = 180_000  # coordinate shift to non-negative before integer rounding
KM_LITERAL_MAX = 64  # above this, literal least() chains strain codegen


def _km_round_mean(s: int, n: int) -> int:
    """Half-up integer mean of a SHIFTED (non-negative) coordinate sum.

    Truncating and flooring division agree on non-negative operands, so
    the same formula replays exactly in DuckDB (whose ``//`` truncates
    toward zero, unlike Python's floor ``//``) — the engine/oracle
    parity hinge for the fixed-point Lloyd iteration."""
    return (2 * s + n) // (2 * n) - KM_OFF


def _km_assign(spark, pts: DataFrame, centroids) -> DataFrame:
    """Nearest-centroid assignment; ties go to the smaller cluster id.

    k ≤ KM_LITERAL_MAX: ZERO-SHUFFLE — centroids are driver-side, so the
    argmin is one ``F.least`` chain over k literal packed BIGINT keys
    (d2*KM_ENC + cluster): pure column arithmetic, whole-stage codegen,
    no join, no window, no exchange.  Larger k: broadcast the centroid
    table and take the packed-key ``min`` groupBy argmin (the ivf_assign
    shape, operators/embed.py:732-737) — map-side combinable, one
    partial-agg shuffle of N rows, never a per-pid window (a window has
    no partial aggregation and would hash-exchange all N×k fanned rows)."""
    if len(centroids) <= KM_LITERAL_MAX:
        keys = [
            (
                (F.col("px") - F.lit(cx)) * (F.col("px") - F.lit(cx))
                + (F.col("py") - F.lit(cy)) * (F.col("py") - F.lit(cy))
            )
            * F.lit(KM_ENC)
            + F.lit(c)
            for c, cx, cy in centroids
        ]
        best = keys[0] if len(keys) == 1 else F.least(*keys)
        return pts.withColumn("cluster", (best % F.lit(KM_ENC)).cast("int"))
    cdf = spark.createDataFrame(
        [(c, int(cx), int(cy)) for c, cx, cy in centroids],
        "cluster int, cx bigint, cy bigint",
    )
    d2 = (F.col("px") - F.col("cx")) * (F.col("px") - F.col("cx")) + (
        F.col("py") - F.col("cy")
    ) * (F.col("py") - F.col("cy"))
    return (
        pts.crossJoin(F.broadcast(cdf))
        .withColumn("_key", d2 * F.lit(KM_ENC) + F.col("cluster"))
        .groupBy("pid", "px", "py")
        .agg((F.min("_key") % F.lit(KM_ENC)).cast("int").alias("cluster"))
    )


def kmeans(
    data: DataFrame,
    k: int,
    id_col: str = "event_id",
    max_iter: int = 10,
    init: str | None = None,
) -> DataFrame:
    """Deterministic fixed-point Lloyd's KMeans over milli-degree coords
    (the reference's KMeansRunner.java:112-240 role, made deterministic).

    Exact-integer end-to-end: coords are BIGINT milli-degrees and the
    centroid means are re-quantized to integer milli-degrees each round
    (half-up, via :func:`_km_round_mean`), so every iteration is
    replayable bit-for-bit in ANSI SQL — the registry's ``kmeans`` oracle
    unrolls the same seeding + rounds in DuckDB.  Early convergence is a
    fixed point (same centroids → same assignment → same means), so the
    fully-unrolled oracle and the early-breaking engine agree.

    Plan shape (what must survive 100 TB): assignment is zero-shuffle
    column arithmetic (see :func:`_km_assign`); the update is one
    ``groupBy(cluster).sum`` — map-side combinable, k-row result.  Per
    iteration that is ONE partial-agg exchange of k rows, not the N×k
    window sort-exchange of a crossJoin+row_number plan.  Empty clusters
    keep their previous centroid.

    ``init=None`` picks ``'farthest'`` (k sequential driver argmax scans
    — fine for small k) for k ≤ 16 and ``'parallel'``
    (:func:`kmeans_parallel_init`, kmeans|| — fixed rounds independent of
    k) above.  Returns (id, cluster 0..k-1)."""
    if k < 1 or k > KM_ENC:
        raise ValueError(f"k={k} outside [1, {KM_ENC}] (argmin key packing bound)")
    if init is None:
        init = "farthest" if k <= 16 else "parallel"
    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("bigint").alias("px"),
        F.col("lat_milli").cast("bigint").alias("py"),
    ).localCheckpoint()

    if init == "parallel":
        centroids = [
            (c, int(x), int(y))
            for c, x, y in kmeans_parallel_init(data, k, id_col=id_col)
        ]
    elif init == "farthest":
        first = pts.orderBy("pid").limit(1).collect()[0]
        seeds = [(0, int(first["px"]), int(first["py"]))]
        for i in range(1, k):
            near = None
            for _, cx, cy in seeds:
                d = (F.col("px") - F.lit(cx)) * (F.col("px") - F.lit(cx)) + (
                    F.col("py") - F.lit(cy)
                ) * (F.col("py") - F.lit(cy))
                near = d if near is None else F.least(near, d)
            far = (
                pts.withColumn("_nd", near)
                .orderBy(F.col("_nd").desc(), F.col("pid").asc())
                .limit(1)
                .collect()[0]
            )
            seeds.append((i, int(far["px"]), int(far["py"])))
        centroids = seeds
    else:
        raise ValueError(f"init {init!r} (farthest | parallel)")
    spark = data.sparkSession
    assigned = None
    for _ in range(max_iter):
        assigned = _km_assign(spark, pts, centroids)
        stats = assigned.groupBy("cluster").agg(
            F.sum(F.col("px") + F.lit(KM_OFF)).alias("sx"),
            F.sum(F.col("py") + F.lit(KM_OFF)).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        upd = {
            r["cluster"]: (
                _km_round_mean(int(r["sx"]), int(r["n"])),
                _km_round_mean(int(r["sy"]), int(r["n"])),
            )
            for r in stats
        }
        new_centroids = [(c, *upd.get(c, (cx, cy))) for c, cx, cy in centroids]
        if new_centroids == centroids:
            break
        centroids = new_centroids
    if assigned is None:  # max_iter == 0: assign once against the seeds
        assigned = _km_assign(spark, pts, centroids)
    return assigned.select(F.col("pid").alias(id_col), "cluster")


def cluster_hulls(
    labeled: DataFrame,
    points: DataFrame,
    id_col: str = "event_id",
    x_col: str = "lon_milli",
    y_col: str = "lat_milli",
    concave_threshold: float | None = None,
) -> DataFrame:
    """Per-cluster convex (and optionally concave) hull — the reference's
    cluster-output geometry (analytics/api/.../GeometryHullTool.java, 1112
    LoC of JTS hull stitching; DBScanIT expects hull geometries, not bare
    labels; its concave path is the Park & Oh dig with concaveThreshold
    1.8, GeometryHullTool.java:279-392).

    One groupBy(cluster).applyInPandas with a numpy monotone chain per
    group: clusters are small relative to the corpus, and the shuffle is
    keyed by cluster id, so hull construction parallelizes per cluster.
    Returns (cluster, n_points, n_vertices, area2_milli, hull_wkb):
    ``area2_milli`` is the integer-exact doubled shoelace area over
    milli-degree coords; ``hull_wkb`` a standard WKB polygon (CCW).

    ``concave_threshold`` (e.g. 1.8, the reference default) adds
    (concave_n_vertices, concave_area2_milli, concave_wkb) columns.  Scale
    note: stage 1 then reduces each shard to its local CONCAVE hull
    vertices (for convex hulls the two-stage reduction is lossless; for
    concave it keeps each shard's notch-defining boundary points and drops
    only shard-interior points, so the cluster-level dig is an
    approximation whose candidate set is the union of shard boundaries —
    exact when a cluster's points land in one shard)."""
    import pandas as pd
    from pyspark.sql import types as T

    from geowave_spark.functions import geometry as G

    joined = labeled.join(
        points.select(F.col(id_col), F.col(x_col).alias("_hx"), F.col(y_col).alias("_hy")),
        id_col,
    )
    # two-stage hull (convex hulls compose: hull(A∪B) = hull(verts(hull A) ∪
    # verts(hull B))): stage 1 reduces each (cluster, shard) to its local
    # hull vertices, so no single task ever holds a whole giant cluster —
    # the final group sees only O(shards × hull_size) vertices.
    n_shards = 16
    shard_schema = T.StructType(
        [
            T.StructField("cluster", T.LongType()),
            T.StructField("_hx", T.DoubleType()),
            T.StructField("_hy", T.DoubleType()),
        ]
    )

    def local_hull(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pts = pdf[["_hx", "_hy"]].to_numpy(dtype=np.float64)
        if concave_threshold is None:
            ring = G.convex_hull(pts)
        else:
            ring = G.concave_hull(pts, threshold=concave_threshold)
        return pd.DataFrame(
            {
                "cluster": int(pdf.cluster.iloc[0]),
                "_hx": ring[:, 0],
                "_hy": ring[:, 1],
            }
        )

    shards = joined.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    hull_verts = shards.groupBy("cluster", "_shard").applyInPandas(
        local_hull, shard_schema
    )
    sizes = joined.groupBy("cluster").agg(F.count("*").alias("_n_points"))
    fields = [
        T.StructField("cluster", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("n_vertices", T.IntegerType()),
        T.StructField("area2_milli", T.DoubleType()),
        T.StructField("hull_wkb", T.BinaryType()),
    ]
    if concave_threshold is not None:
        fields += [
            T.StructField("concave_n_vertices", T.IntegerType()),
            T.StructField("concave_area2_milli", T.DoubleType()),
            T.StructField("concave_wkb", T.BinaryType()),
        ]
    out_schema = T.StructType(fields)

    def _ring_out(ring, np):
        if len(ring) >= 3:
            return G.wkb_polygon([ring]), G.ring_area2(ring), len(ring)
        # degenerate cluster (point/segment): zero-area ring
        pad = np.vstack([ring, ring[:1], ring[:1]])[:3]
        return G.wkb_polygon([pad]), 0.0, len(ring)

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pts = pdf[["_hx", "_hy"]].to_numpy(dtype=np.float64)
        ring = G.convex_hull(pts)
        wkb, area2, nv = _ring_out(ring, np)
        row = {
            "cluster": [int(pdf.cluster.iloc[0])],
            "n_points": [int(pdf._n_points.iloc[0])],
            "n_vertices": [int(nv)],
            "area2_milli": [area2],
            "hull_wkb": [wkb],
        }
        if concave_threshold is not None:
            cring = G.concave_hull(pts, threshold=concave_threshold)
            cwkb, carea2, cnv = _ring_out(cring, np)
            row.update(
                {
                    "concave_n_vertices": [int(cnv)],
                    "concave_area2_milli": [carea2],
                    "concave_wkb": [cwkb],
                }
            )
        return pd.DataFrame(row)

    return (
        hull_verts.join(sizes, "cluster")  # AQE broadcasts when small
        .groupBy("cluster")
        .applyInPandas(one, out_schema)
    )


def kmeans_mllib(
    data: DataFrame,
    k: int,
    id_col: str = "event_id",
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Production KMeans: Spark MLlib over the milli-degree coords — the
    same engine the reference's KMeansRunner wraps
    (analytics/spark/.../kmeans/KMeansRunner.java:112-240 uses
    org.apache.spark.mllib.clustering.KMeans).  The hand-rolled
    :func:`kmeans` above stays as the deterministic correctness gate;
    this is the drop-in for real workloads (DataFrame-native, seeded
    k-means||, no driver loop).  Returns (id, cluster)."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.feature import VectorAssembler

    pts = data.select(
        F.col(id_col),
        F.col("lon_milli").cast("double").alias("_px"),
        F.col("lat_milli").cast("double").alias("_py"),
    )
    feats = VectorAssembler(inputCols=["_px", "_py"], outputCol="features").transform(pts)
    model = MLKMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    return model.transform(feats).select(
        F.col(id_col), F.col("prediction").cast("long").alias("cluster")
    )


# ---------------------------------------------------------------------------
# KMeans family: sampling, kmeans|| init, distortion / jump, strip-weak.
#
# The reference's cluster-count machinery (analytics/mapreduce/.../kmeans/
# runner/): KSamplerJobRunner draws rank samples as initial centroids,
# KMeansParallelJobRunner implements Bahmani et al's scalable k-means++
# (BahmanEtAlSampleProbabilityFn.java: p(x) = l*d2(x,C)/phi),
# KMeansDistortionJobRunner computes the Sugar–James transformed distortion
# (KMeansDistortionMapReduce.java:238-257: (E/p)^(-p/2) with E the mean
# squared distance, p the dimension count), and DistortionGroupManagement
# .bestCount (DistortionGroupManagement.java:335-360) picks the k with the
# largest jump d_k - d_{k-1}.  StripWeakCentroidsRunner.java:95-215 drops
# the weak tail of centroids at the largest count gap (MaxChange strategy).
#
# Spark-first shapes: the rank sample is one ORDER BY hash LIMIT k; the
# whole distortion table over a k-range comes out of ONE cross join with a
# running-min window (rank-r prefix of the sample = the r-centroid set, so
# every k shares a single pass); kmeans|| rounds are broadcast argmin +
# hash-uniform filters (no RNG state anywhere — md5-derived uniforms keep
# every path replayable, incl. by the DuckDB oracle).
# ---------------------------------------------------------------------------

NUM_DIMS = 2  # planar milli-degree (x, y); p in the Sugar–James transform


def rank_sample(data: DataFrame, k: int, id_col: str = "event_id") -> DataFrame:
    """KSampler parity: deterministic hash-rank sample of ``k`` points.

    The reference samples k items by random rank (KSamplerJobRunner); the
    md5-derived 60-bit hash replaces the RNG so the draw is reproducible
    and oracle-replayable.  Returns (rank 0..k-1, cx, cy) — ranks are
    ordered by (hash, id), so the rank-r prefix is itself a valid
    r-point sample (nested samples — what :func:`kmeans_distortion_table`
    exploits to share one pass across a whole k range).
    """
    from geowave_spark.operators.text import h64_col
    from pyspark.sql import Window

    # orderBy().limit(k) = distributed TakeOrdered (per-partition top-k +
    # driver merge) — no global single-partition window over the data; the
    # row_number window runs over the k-row result only
    top = (
        data.select(
            F.col(id_col).alias("_sid"),
            F.col("lon_milli").cast("bigint").alias("cx"),
            F.col("lat_milli").cast("bigint").alias("cy"),
        )
        .withColumn("_h", h64_col(F.col("_sid").cast("string")))
        .orderBy("_h", "_sid")
        .limit(k)
    )
    w = Window.orderBy("_h", "_sid")
    return top.withColumn("rank", F.row_number().over(w) - F.lit(1)).select(
        "rank", "cx", "cy"
    )


def kmeans_distortion_table(
    data: DataFrame,
    k_values: list[int],
    id_col: str = "event_id",
) -> DataFrame:
    """Sugar–James distortion + jump over a k range in ONE distributed pass.

    For each k the centroid set is the rank-k prefix of the deterministic
    rank sample (the KSampler -> KMeansDistortionJobRunner flow, without
    the Lloyd refinement — :func:`kmeans_jump` adds that).  Because the
    samples nest, a single cross join against the max-k sample plus a
    running-min window gives every k's per-point nearest distance at once:

      point x sample(kmax)  ->  d2 per (pid, rank)
      running min over rank ->  rmin[r] = d2(x, first r+1 centroids)
      filter rank+1 in k_values, group by k -> sum/count -> distortion

    Distortion is exact-rational at p=2: (E/2)^(-p/2) = 2n/sum_d2, one
    IEEE division on exact BIGINT sums, so the DuckDB oracle matches to
    the bit.  Jump = d_k - d_{k-1} (0 base, ascending k;
    DistortionGroupManagement.java:345-360); ``best`` marks the first k
    at the maximum jump.  Output: (k, n, sum_d2, distortion, jump, best).
    """
    from pyspark.sql import Window

    kmax = max(k_values)
    sample = rank_sample(data, kmax, id_col=id_col)
    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("bigint").alias("px"),
        F.col("lat_milli").cast("bigint").alias("py"),
    )
    d2 = (F.col("px") - F.col("cx")) * (F.col("px") - F.col("cx")) + (
        F.col("py") - F.col("cy")
    ) * (F.col("py") - F.col("cy"))
    w = Window.partitionBy("pid").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_k = (
        pts.crossJoin(F.broadcast(sample))
        .withColumn("_d2", d2)
        .withColumn("_rmin", F.min("_d2").over(w))
        .withColumn("k", F.col("rank") + F.lit(1))
        .filter(F.col("k").isin([int(k) for k in k_values]))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_rmin").alias("sum_d2"),
        )
        .withColumn(
            "distortion",
            F.lit(float(NUM_DIMS)) * F.col("n") / F.col("sum_d2"),
        )
    )
    wk = Window.orderBy("k")
    wall = Window.partitionBy()
    jump = F.col("distortion") - F.lag("distortion", 1, 0.0).over(wk)
    out = (
        per_k.withColumn("jump", jump)
        .withColumn("_maxj", F.max("jump").over(wall))
        .withColumn(
            "_bestk",
            F.min(F.when(F.col("jump") == F.col("_maxj"), F.col("k"))).over(wall),
        )
    )
    return out.withColumn("best", (F.col("k") == F.col("_bestk")).cast("boolean")).select(
        "k", "n", "sum_d2", "distortion", "jump", "best"
    )


def kmeans_distortion(
    data: DataFrame, centroids: list[tuple[int, float, float]]
) -> float:
    """Transformed distortion of one fitted centroid set
    (KMeansDistortionMapReduce.java:238-257, p=2)."""
    pts = data.select(
        F.col("lon_milli").cast("double").alias("px"),
        F.col("lat_milli").cast("double").alias("py"),
    )
    near = None
    for _, cx, cy in centroids:
        d = (F.col("px") - F.lit(float(cx))) ** 2 + (F.col("py") - F.lit(float(cy))) ** 2
        near = d if near is None else F.least(near, d)
    row = pts.agg(
        F.count(F.lit(1)).alias("n"), F.sum(near).alias("s")
    ).collect()[0]
    expectation = row["s"] / row["n"] / NUM_DIMS
    return float(expectation ** (-NUM_DIMS / 2))


def kmeans_jump(
    data: DataFrame,
    k_values: list[int],
    id_col: str = "event_id",
    max_iter: int = 10,
) -> tuple[int, list[tuple[int, float, float]]]:
    """Sugar–James jump over FITTED kmeans runs (KMeansJumpJobRunner flow:
    kmeans per k -> distortion per k -> max-jump selection).

    Each k runs the deterministic Lloyd :func:`kmeans` (k jobs over a small
    k range — the reference runs one MR pipeline per k too); the winner's
    assignment is what callers keep.  Returns (best_k, jump table rows as
    (k, distortion, jump)).
    """
    table = []
    prev = 0.0
    best_k, best_jump = None, float("-inf")
    for k in sorted(k_values):
        assigned = kmeans(data, k, id_col=id_col, max_iter=max_iter)
        cents = (
            assigned.join(
                data.select(F.col(id_col), "lon_milli", "lat_milli"), on=id_col
            )
            .groupBy("cluster")
            .agg(
                F.avg(F.col("lon_milli").cast("double")).alias("cx"),
                F.avg(F.col("lat_milli").cast("double")).alias("cy"),
            )
            .collect()
        )
        cent_list = [(r["cluster"], r["cx"], r["cy"]) for r in cents]
        d = kmeans_distortion(data, cent_list)
        jump = d - prev
        table.append((k, d, jump))
        if jump > best_jump:
            best_jump, best_k = jump, k
        prev = d
    return best_k, table


def kmeans_parallel_init(
    data: DataFrame,
    k: int,
    rounds: int = 3,
    oversample: int | None = None,
    id_col: str = "event_id",
) -> list[tuple[int, float, float]]:
    """Deterministic kmeans|| initialization (Bahmani et al VLDB'12; the
    reference's KMeansParallelJobRunner + BahmanEtAlSampleProbabilityFn).

    Each round keeps point x with probability min(1, l*d2(x,C)/phi) where
    phi = sum d2(.,C); the RNG is replaced by an md5-derived uniform on
    (id, round) so the draw is reproducible.  Candidates (a few * l rows)
    are weighted by nearest-point counts and reduced to k seeds with
    weighted farthest-point on the driver — the same final reclustering
    role the reference delegates to StripWeakCentroids + local kmeans.
    Returns k (cluster_id, cx, cy) seeds for :func:`kmeans`-style Lloyd
    refinement or MLlib handoff.
    """
    from geowave_spark.operators.text import h64_col

    el = oversample if oversample is not None else 2 * k
    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("double").alias("px"),
        F.col("lat_milli").cast("double").alias("py"),
    ).localCheckpoint()

    first = pts.orderBy(
        h64_col(F.col("pid").cast("string")), F.col("pid")
    ).limit(1).collect()[0]
    cand = [(float(first["px"]), float(first["py"]))]

    # fixed rounds, then EXTRA rounds while the candidate pool is still
    # short of k (heavy-tailed phi can starve acceptance — e.g. one far
    # outlier holding nearly all of phi makes every other p(x) ~ 0);
    # bounded so degenerate inputs (all points coincident) terminate
    rnd, extra_cap = 0, rounds + 8
    while rnd < rounds or (len(cand) < k and rnd < extra_cap):
        near = None
        for cx, cy in cand:
            d = (F.col("px") - F.lit(cx)) ** 2 + (F.col("py") - F.lit(cy)) ** 2
            near = d if near is None else F.least(near, d)
        scored = pts.withColumn("_d2", near).localCheckpoint()
        phi = scored.agg(F.sum("_d2")).collect()[0][0]
        if not phi or phi <= 0:
            break  # all points already coincide with a candidate
        # u(x) in [0,1): 60-bit md5 hash of (pid, round) scaled; accept
        # when u < l * d2 / phi  (Bahman p(x), clamped at 1 implicitly)
        u = h64_col(
            F.concat_ws(":", F.col("pid").cast("string"), F.lit(str(rnd)))
        ).cast("double") / F.lit(float(1 << 60))
        picked = scored.filter(
            u * F.lit(float(phi)) < F.lit(float(el)) * F.col("_d2")
        ).select("px", "py").collect()
        cand.extend((float(r["px"]), float(r["py"])) for r in picked)
        cand = sorted(set(cand))
        rnd += 1

    if len(cand) < k:
        # top-up: deterministic farthest-point draws FROM THE DATA against
        # the current candidate set — guarantees k seeds whenever the data
        # has >= k distinct points (ties by id, no RNG)
        while len(cand) < k:
            near = None
            for cx, cy in cand:
                d = (F.col("px") - F.lit(cx)) ** 2 + (F.col("py") - F.lit(cy)) ** 2
                near = d if near is None else F.least(near, d)
            far = (
                pts.withColumn("_nd", near)
                .orderBy(F.col("_nd").desc(), F.col("pid").asc())
                .limit(1)
                .collect()[0]
            )
            if far["_nd"] <= 0:
                break  # fewer than k distinct points exist
            cand = sorted(set(cand) | {(float(far["px"]), float(far["py"]))})

    # weight candidates by nearest-point counts — map-side-combinable
    # min_by argmin (the ivf_assign shape), NOT a per-pid row_number
    # window, which would sort-shuffle all n*|cand| fanned-out rows
    spark = data.sparkSession
    cdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(cand)], "cid int, cx double, cy double"
    )
    d2 = (F.col("px") - F.col("cx")) ** 2 + (F.col("py") - F.col("cy")) ** 2
    weights = {
        r["cid"]: r["w"]
        for r in pts.crossJoin(F.broadcast(cdf))
        .withColumn("_d2", d2)
        .groupBy("pid")
        .agg(F.min_by("cid", F.struct("_d2", "cid")).alias("cid"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    }

    # weighted farthest-point reduction to k seeds (driver-side: |cand| is
    # a few * oversample, independent of data size)
    import numpy as np

    arr = np.asarray(cand, dtype=np.float64)
    wts = np.asarray([weights.get(i, 0) for i in range(len(cand))], dtype=np.float64)
    seeds = [int(np.argmax(wts))]  # heaviest candidate first
    while len(seeds) < min(k, len(cand)):
        dmin = None
        for s in seeds:
            d = ((arr - arr[s]) ** 2).sum(axis=1)
            dmin = d if dmin is None else np.minimum(dmin, d)
        score = wts * dmin
        nxt = int(np.argmax(score))
        if score[nxt] <= 0:
            # zero-WEIGHT candidates (no point nearest to them) still count
            # as seeds when geometrically distinct — fall back to distance
            # alone; only a zero-DISTANCE max (duplicate candidate) stops
            nxt = int(np.argmax(dmin))
            if dmin[nxt] <= 0:
                break
        seeds.append(nxt)
    return [(i, float(arr[s][0]), float(arr[s][1])) for i, s in enumerate(seeds)]


def strip_weak_break_point(counts: list[int]) -> int:
    """MaxChangeBreakStrategy (StripWeakCentroidsRunner.java:163-215):
    given association counts sorted DESCENDING, the break position is the
    index just after the largest consecutive drop (>= keeps the LAST
    maximal gap, matching the reference's checkDoublesEqual(max(max,chg),
    chg) update); scanning stops at the first count <= 1.

    Faithfully ports the reference's `if (position == 0)` guard on the
    early break — dead in BOTH implementations (position initializes to
    len(counts), Java line 171: `int position = centroids.size()`), so a
    count <= 1 reached before any gap was recorded keeps everything, as
    GeoWave does; callers wanting a harder floor use ``maximum``."""
    position = len(counts)
    mx = 0.0
    prior = None
    count = 0
    for c in counts:
        if c <= 1:
            if position == 0:
                position = count
            break
        if prior is not None:
            chg = abs(prior - c)
            if chg >= mx:
                position = count
                mx = chg
        prior = c
        count += 1
    return position


def strip_weak_centroids(
    assigned: DataFrame,
    minimum: int = 1,
    maximum: int = 1000,
    cluster_col: str = "cluster",
) -> list[int]:
    """Which clusters survive the weak-centroid strip
    (StripWeakCentroidsRunner.java:95-160): sort clusters by size
    descending, cut at the MaxChange break point clamped to
    [minimum, maximum]; returns the surviving cluster ids.  The counts
    aggregate is distributed; the break scan runs on the k-row result."""
    rows = (
        assigned.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(cluster_col).asc())
        .collect()
    )
    if len(rows) <= minimum:
        return [r[cluster_col] for r in rows]
    position = strip_weak_break_point([r["n"] for r in rows])
    position = min(max(minimum, position), maximum)
    return [r[cluster_col] for r in rows[:position]]


def kmeans_grouped(
    pts: DataFrame,
    k: int,
    max_iter: int = 10,
) -> DataFrame:
    """Deterministic Lloyd's KMeans WITHIN every group simultaneously —
    the engine of :func:`kmeans_multilevel`.  ``pts`` needs
    (pid, px, py, grp); returns (pid, grp, cluster 0..k-1).

    All groups advance in ONE job per step (never one job per group —
    the reference runs its per-zoom clustering as single MR passes over
    all groups too, GroupAssignmentMapReduce.java).  Seeding is the
    deterministic farthest-point rule per group: first seed = the
    group's min pid, then k-1 rounds each picking every group's argmax
    of min-distance-to-seeds via one window.  Driver state is bounded by
    groups × k centroid rows (the kNN-ring collect discipline)."""
    from pyspark.sql import Window

    spark = pts.sparkSession
    pts = pts.select("pid", "px", "py", "grp").localCheckpoint()

    w_first = Window.partitionBy("grp").orderBy(F.col("pid").asc())
    seeds = (
        pts.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select("grp", F.lit(0).alias("cluster"), F.col("px").alias("cx"),
                F.col("py").alias("cy"))
        .localCheckpoint()
    )
    for i in range(1, k):
        d2 = (F.col("px") - F.col("cx")) ** 2 + (F.col("py") - F.col("cy")) ** 2
        near = (
            pts.join(F.broadcast(seeds), "grp")
            .groupBy("grp", "pid", "px", "py")
            .agg(F.min(d2).alias("_nd"))
        )
        w = Window.partitionBy("grp").orderBy(
            F.col("_nd").desc(), F.col("pid").asc()
        )
        nxt = (
            near.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("grp", F.lit(i).alias("cluster"),
                    F.col("px").alias("cx"), F.col("py").alias("cy"))
        )
        seeds = seeds.unionByName(nxt).localCheckpoint()

    # sorted like the per-iteration rebuild below, so an already-converged
    # seeding exits after ONE Lloyd pass instead of never matching on order
    centroids = sorted(
        (r["grp"], int(r["cluster"]), float(r["cx"]), float(r["cy"]))
        for r in seeds.collect()
    )
    assigned = None
    for _ in range(max_iter):
        cdf = spark.createDataFrame(
            centroids, "grp long, cluster int, cx double, cy double"
        )
        d2 = (F.col("px") - F.col("cx")) ** 2 + (F.col("py") - F.col("cy")) ** 2
        w = Window.partitionBy("grp", "pid").orderBy(
            d2.asc(), F.col("cluster").asc()
        )
        assigned = (
            pts.join(F.broadcast(cdf), "grp")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("pid", "grp", "px", "py", "cluster")
        )
        new_c = (
            assigned.groupBy("grp", "cluster")
            .agg(F.avg("px").alias("cx"), F.avg("py").alias("cy"))
            .collect()
        )
        nc = sorted(
            (r["grp"], int(r["cluster"]), r["cx"], r["cy"]) for r in new_c
        )
        if nc == centroids:
            break
        centroids = nc
    return assigned.select("pid", "grp", "cluster")


def kmeans_multilevel(
    data: DataFrame,
    k: int,
    zoom_levels: int,
    id_col: str = "event_id",
    max_iter: int = 10,
) -> DataFrame:
    """Zoom-hierarchy clustering — the reference's multi-level runners
    (analytics/mapreduce/.../clustering/runner/
    MultiLevelClusteringJobRunner.java:160-205: per zoom level, cluster
    WITHIN each previous-level group, then group-assign for the next
    level; MultiLevelKMeansClusteringJobRunner / ...JumpKMeans... pick
    the per-level engine).

    Returns one row per (point, level): (id, zoom_level, cluster) where
    ``cluster`` at level L nests in its parent by integer division —
    ``cluster // k`` is the level L-1 label (the reference threads the
    same lineage through its group ids).  Labels are deterministic
    (farthest-point seeding, id tie-breaks).

    Scale: each level runs ALL parent groups in one Lloyd job per
    iteration; driver state is bounded by k^level centroid rows per
    collect, and the per-level label table is localCheckpoint'd so the
    lineage never compounds across levels (driver-looped iteration
    rule)."""
    if zoom_levels < 1:
        raise ValueError(f"zoom_levels must be >= 1, got {zoom_levels}")
    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("double").alias("px"),
        F.col("lat_milli").cast("double").alias("py"),
    ).withColumn("grp", F.lit(0).cast("long"))

    out = None
    for level in range(1, zoom_levels + 1):
        lab = kmeans_grouped(pts, k, max_iter=max_iter)
        lab = lab.withColumn(
            "cluster", (F.col("grp") * k + F.col("cluster")).cast("long")
        )
        lvl = lab.select(
            F.col("pid").alias(id_col),
            F.lit(level).alias("zoom_level"),
            "cluster",
        )
        out = lvl if out is None else out.unionByName(lvl)
        pts = (
            pts.drop("grp")
            .join(lab.select("pid", F.col("cluster").alias("grp")), "pid")
            .localCheckpoint()
        )
    return out


def grid_hull_vertices(
    pts: DataFrame,
    cell_col: str = "cell",
    x_col: str = "x",
    y_col: str = "y",
    min_pts: int = 5,
    max_pts: int = 120,
) -> DataFrame:
    """Convex-hull VERTEX SET per grid cluster — the SQL-checkable convex
    arm of cluster_hulls (GeometryHullTool analogue): clusters are grid
    cells (deterministic, shared with the oracle), points dedup to
    distinct coordinates, and the per-cluster kernel is the monotone
    chain.  Output (cell, x, y) hull-vertex rows replay exactly in SQL
    via the O(n³) support-line characterization: p is a hull vertex iff
    ∃q such that every other point is strictly left of ray p→q or on it
    ahead of p — the reason the size window [min_pts, max_pts] exists
    (both sides filter identically; the oracle's n³ stays bounded).

    Fully-collinear clusters emit the two lexicographic endpoints (the
    strict-turn hull), matching the characterization."""
    import numpy as np
    import pandas as pd

    from geowave_spark.functions import geometry as G

    slim = pts.select(
        F.col(cell_col).cast("long").alias("cell"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).distinct()
    w = Window.partitionBy("cell")
    sized = slim.withColumn("_n", F.count("*").over(w)).filter(
        (F.col("_n") >= min_pts) & (F.col("_n") <= max_pts)
    ).drop("_n")

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[["x", "y"]].to_numpy(np.float64)
        ring = G.convex_hull(p)
        if len(ring) >= 3 and G.ring_area2(ring) != 0:
            v = ring
        else:  # degenerate (collinear) cluster: strict-turn endpoints
            u = np.unique(p, axis=0)
            v = u[[0, -1]]
        return pd.DataFrame(
            {
                "cell": pdf["cell"].iloc[0],
                "x": v[:, 0].astype(np.int64),
                "y": v[:, 1].astype(np.int64),
            }
        )

    return sized.groupBy("cell").applyInPandas(hull, "cell long, x long, y long")
