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

# Masks up to this grid bound are solved with one driver union-find pass
# (~24 B/cell: 2M cells ≈ 50 MB, well under driver heap); the distributed
# solver covers everything beyond.  The bound is on 4^res — the GRID, not
# the data — so the arm choice is deterministic at plan time.
DRIVER_CC_MAX_CELLS = 2_000_000


def _driver_components(cells: list[tuple[int, int, int]], n: int) -> list[tuple[int, int]]:
    """Union-find over 4-adjacent (pid, gx, gy) cells; lon wraps mod ``n``.
    Returns (pid, component-min-pid) — same labels as the distributed arm."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # union-by-min: root stays the set minimum

    by_xy = {(gx, gy): pid for pid, gx, gy in cells}
    for pid, gx, gy in cells:
        parent.setdefault(pid, pid)
        east = by_xy.get(((gx + 1) % n, gy))
        if east is not None:
            union(pid, east)
        north = by_xy.get((gx, gy + 1))
        if north is not None:
            union(pid, north)
    return [(pid, find(pid)) for pid, _, _ in cells]


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
        # the mask is referenced 6+ times downstream (two adjacency arms,
        # the neighbor probe, the component solver, the final stats join);
        # without severing, EACH reference re-runs the full input scan +
        # groupBy (measured 7.8s → 1s at sf0.1).  The mask is grid-bounded
        # (≤ 4^res cells ≪ input rows), so materializing it once is the
        # 100 TB plan too.
        .localCheckpoint()
    )
    # Two component-solver arms, selected by the GRID bound (4^res cells —
    # known a priori, independent of input size, the caller's resolution
    # choice): below the threshold the whole mask fits on the driver and a
    # single union-find pass beats ~4 scheduler rounds of distributed
    # machinery (measured 5.0s → 1.6s at sf0.1; same bounded-driver-work
    # pattern as DBSCAN's perimeter contraction); above it, the
    # spatially-partitioned union-find (adjacency spans one cell — its
    # ideal partitioning) takes over.
    if (1 << (2 * res)) <= DRIVER_CC_MAX_CELLS:
        cells = [(r.pid, r._gx, r._gy) for r in mask.select("pid", "_gx", "_gy").collect()]
        labels = F.broadcast(
            data.sparkSession.createDataFrame(
                _driver_components(cells, n), "pid long, cluster long"
            )
        )
    else:
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
