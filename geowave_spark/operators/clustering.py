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
* **KMeans** — Lloyd's algorithm as DataFrame aggregation: assign =
  broadcast-join argmin over centroids, update = one groupBy mean;
  deterministic seeding (first-k by id — reproducible, no RNG state).
  :func:`kmeans_mllib` is the production drop-in (the reference's own
  KMeansRunner wraps MLlib); the hand-rolled one is the deterministic
  correctness gate.

Both use the exact integer planar-milli metric shared with kNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


def kmeans(
    data: DataFrame,
    k: int,
    id_col: str = "event_id",
    max_iter: int = 10,
) -> DataFrame:
    """Deterministic Lloyd's KMeans over milli-degree coords.

    Seeding: farthest-point (deterministic k-means++ analogue — first seed
    is the smallest id, each next seed maximizes distance to its nearest
    chosen seed, ties by id; no RNG state).  Returns (id, cluster 0..k-1).
    Each iteration = one broadcast argmin + one groupBy mean — the minimal
    shuffle structure."""
    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("double").alias("px"),
        F.col("lat_milli").cast("double").alias("py"),
    ).localCheckpoint()

    first = pts.orderBy("pid").limit(1).collect()[0]
    seeds = [(0, float(first["px"]), float(first["py"]))]
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
        seeds.append((i, float(far["px"]), float(far["py"])))
    centroids = seeds
    spark = data.sparkSession
    for _ in range(max_iter):
        cdf = spark.createDataFrame(centroids, "cluster int, cx double, cy double")
        d2 = (F.col("px") - F.col("cx")) ** 2 + (F.col("py") - F.col("cy")) ** 2
        from pyspark.sql import Window

        w = Window.partitionBy("pid").orderBy(d2.asc(), F.col("cluster").asc())
        assigned = (
            pts.crossJoin(F.broadcast(cdf))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("pid", "px", "py", "cluster")
        )
        new_c = (
            assigned.groupBy("cluster")
            .agg(F.avg("px").alias("cx"), F.avg("py").alias("cy"))
            .collect()
        )
        new_centroids = sorted((r["cluster"], r["cx"], r["cy"]) for r in new_c)
        if new_centroids == centroids:
            break
        centroids = new_centroids
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
