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
  neighborhood keys, and cluster formation is label propagation over the
  core-core adjacency — iterated `min(label)` joins that converge in
  O(log diameter) rounds (the standard distributed connected-components
  loop, driven from the driver on a convergence count exactly like the
  kNN ring loop).
* **KMeans** — Lloyd's algorithm as DataFrame aggregation: assign =
  broadcast-join argmin over centroids, update = one groupBy mean;
  deterministic seeding (first-k by id — reproducible, no RNG state).
  MLlib's KMeans is the drop-in for production (this one exists so the
  semantics are explicit and deterministic for the correctness gate).

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

    pts = data.select(
        F.col(id_col).alias("pid"),
        F.col("lon_milli").cast("long").alias("px"),
        F.col("lat_milli").cast("long").alias("py"),
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

    # core-core adjacency; label propagation to the min reachable core id
    core_pairs = (
        pairs.join(core, "pid")
        .join(core.select(F.col("pid").alias("qid")), "qid")
        .filter(F.col("pid") != F.col("qid"))
    )
    # materialize the (small) core adjacency once; each propagation round
    # then starts from a lineage-truncated snapshot — without the eager
    # localCheckpoint the plan doubles per round and analysis time
    # explodes (driven-from-the-driver loop, like the kNN rings)
    adj = core_pairs.localCheckpoint()
    labels = core.withColumn("cluster", F.col("pid")).localCheckpoint()
    for _ in range(max_rounds):
        # new label = min(own, min over neighbors' labels)
        nbr_min = (
            adj.join(labels.withColumnRenamed("pid", "qid"), "qid")
            .groupBy("pid")
            .agg(F.min("cluster").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "pid", "left")
            .withColumn("_new", F.least(F.col("cluster"), F.coalesce("_nbr", "cluster")))
            .select("pid", F.col("_new").alias("cluster"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "pid")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation converges in O(component diameter) rounds;
        # a chain longer than max_rounds would silently split clusters —
        # fail loudly instead (production swap-in: large-star/small-star
        # connected components, O(log n) rounds).
        raise RuntimeError(
            f"dbscan label propagation did not converge in {max_rounds} "
            "rounds (component diameter exceeds max_rounds); raise "
            "max_rounds or use the large-star/small-star variant"
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
) -> DataFrame:
    """Per-cluster convex hull — the reference's cluster-output geometry
    (analytics/api/.../GeometryHullTool.java, 1112 LoC of JTS hull
    stitching; DBScanIT expects hull geometries, not bare labels).

    One groupBy(cluster).applyInPandas with a numpy monotone chain per
    group: clusters are small relative to the corpus, and the shuffle is
    keyed by cluster id, so hull construction parallelizes per cluster.
    Returns (cluster, n_points, n_vertices, area2_milli, hull_wkb):
    ``area2_milli`` is the integer-exact doubled shoelace area over
    milli-degree coords; ``hull_wkb`` a standard WKB polygon (CCW).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from geowave_spark.functions import geometry as G

    joined = labeled.join(
        points.select(F.col(id_col), F.col(x_col).alias("_hx"), F.col(y_col).alias("_hy")),
        id_col,
    )
    out_schema = T.StructType(
        [
            T.StructField("cluster", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("n_vertices", T.IntegerType()),
            T.StructField("area2_milli", T.DoubleType()),
            T.StructField("hull_wkb", T.BinaryType()),
        ]
    )

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pts = pdf[["_hx", "_hy"]].to_numpy(dtype=np.float64)
        ring = G.convex_hull(pts)
        if len(ring) >= 3:
            wkb = G.wkb_polygon([ring])
            area2 = G.ring_area2(ring)
        else:  # degenerate cluster (point/segment): zero-area ring
            pad = np.vstack([ring, ring[:1], ring[:1]])[:3]
            wkb = G.wkb_polygon([pad])
            area2 = 0.0
        return pd.DataFrame(
            {
                "cluster": [int(pdf.cluster.iloc[0])],
                "n_points": [len(pdf)],
                "n_vertices": [int(len(ring))],
                "area2_milli": [area2],
                "hull_wkb": [wkb],
            }
        )

    return joined.groupBy("cluster").applyInPandas(one, out_schema)
