"""Raster→vector: polygonize contiguous occupied grid regions.

Completes the raster↔vector arc (BASELINE north_star): the engine renders
vector→raster (operators/tiling.render_point_tiles, operators/kde) — this
is the inverse step, extracting VECTOR regions from a rasterized density
mask (GDAL's ``gdal_polygonize`` shape; the reference stops at raster
products — no analogue, listed as an addition in SURVEY §8).

Semantics: grid the points at ``res`` (same exact integer grid as
DBSCAN/KDE: ``(coord + offset) * 2^res // span``); cells with
``>= min_count`` points form the occupancy mask; 4-adjacent mask cells
(lon wraps at the antimeridian, lat does not) merge into regions.  Output
is one row per region: deterministic ``region_id`` = min packed (gx, gy)
member, cell/point counts and the grid-integer envelope — integer-pure,
so a SQL oracle replays it bit-for-bit.

Scale posture: one groupBy builds the mask (map-side partial counts); the
adjacency is TWO equi-joins (east + north neighbor — one direction each,
the component solver treats edges as undirected); components reuse the
spatially-partitioned union-find of clustering._components_spatial (one
distributed pass + perimeter-sized contraction — adjacency spans exactly
one cell, the ideal case for coarse-cell partitioning).  No cross join,
no driver loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.operators.clustering import _components_spatial

_PACK = 1 << 32  # pid = gx * 2^32 + gy (gx < 2^res << 2^32: exact, ordered)


def polygonize_occupancy(
    data: DataFrame,
    res: int,
    min_count: int = 1,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
) -> DataFrame:
    """→ (region_id, n_cells, n_points, gx_min, gx_max, gy_min, gy_max).

    A region crossing the antimeridian reports the raw min/max gx (not a
    split envelope) — disclosed, matching the integer-envelope convention
    of the bbox operators."""
    from geowave_spark.session import spread

    n = 1 << res
    gx = X.grid_milli_col(F.col(lon_col), 180_000, C.LON_SPAN_MILLI, F.lit(res))
    gy = X.grid_milli_col(F.col(lat_col), 90_000, C.LAT_SPAN_MILLI, F.lit(res))
    mask = (
        spread(data.select(lon_col, lat_col))
        .select(gx.alias("_gx"), gy.alias("_gy"))
        .groupBy("_gx", "_gy")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .withColumn("pid", F.col("_gx") * _PACK + F.col("_gy"))
    )
    # 4-adjacency, one direction per axis (undirected for the solver):
    # east neighbor wraps in lon, north neighbor clamps at the pole row
    east = mask.select(
        "pid",
        F.pmod(F.col("_gx") + 1, F.lit(n)).alias("_jx"),
        F.col("_gy").alias("_jy"),
    )
    north = mask.select(
        "pid", F.col("_gx").alias("_jx"), (F.col("_gy") + 1).alias("_jy")
    )
    nbr = mask.select(
        F.col("pid").alias("qid"),
        F.col("_gx").alias("_jx"),
        F.col("_gy").alias("_jy"),
    )
    edges = (
        east.unionByName(north)
        .join(nbr, ["_jx", "_jy"])
        .select("pid", "qid")
    )
    labels = _components_spatial(
        edges,
        mask.select("pid", "_gx", "_gy"),
        mask.select("pid"),
        coarse_shift=3,
    )
    return (
        mask.join(labels, "pid")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("_n").alias("n_points"),
            F.min("_gx").alias("gx_min"),
            F.max("_gx").alias("gx_max"),
            F.min("_gy").alias("gy_min"),
            F.max("_gy").alias("gy_max"),
        )
        .select(
            F.col("cluster").alias("region_id"),
            "n_cells", "n_points",
            "gx_min", "gx_max", "gy_min", "gy_max",
        )
    )


def polygonize_oracle(
    events_sql: str, res: int, min_count: int = 1
) -> str:
    """DuckDB twin: same integer grid, OR-joined 4-adjacency, recursive-CTE
    closure, min-pid region labels."""
    n = 1 << res

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    return f"""
WITH RECURSIVE geo_events AS ({events_sql}),
g AS (
  SELECT {idiv(f"(lon_milli + 180000) * {n}", "360000")} AS gx,
         {idiv(f"(lat_milli + 90000) * {n}", "180000")} AS gy,
         COUNT(*) AS cnt
  FROM geo_events GROUP BY 1, 2
),
cells AS (
  SELECT gx * {_PACK} + gy AS pid, gx, gy, cnt FROM g WHERE cnt >= {min_count}
),
e AS (
  SELECT a.pid AS pid, b.pid AS qid
  FROM cells a JOIN cells b
    ON (b.gx = (a.gx + 1) % {n} AND b.gy = a.gy)
    OR (b.gx = a.gx AND b.gy = a.gy + 1)
),
sym AS (SELECT pid, qid FROM e UNION SELECT qid, pid FROM e),
closure(pid, lbl) AS (
  SELECT pid, pid FROM cells
  UNION
  SELECT sym.pid, c.lbl FROM closure c JOIN sym ON sym.qid = c.pid
),
labels AS (SELECT pid, MIN(lbl) AS region_id FROM closure GROUP BY pid)
SELECT l.region_id,
       COUNT(*) AS n_cells,
       CAST(SUM(c.cnt) AS BIGINT) AS n_points,
       MIN(c.gx) AS gx_min, MAX(c.gx) AS gx_max,
       MIN(c.gy) AS gy_min, MAX(c.gy) AS gy_max
FROM cells c JOIN labels l ON l.pid = c.pid
GROUP BY l.region_id
"""
