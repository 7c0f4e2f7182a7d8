"""Registry of driver-checkable queries and their DuckDB oracles.

Each entry pairs an engine plan (index-accelerated: cover join + refine)
with a brute-force ANSI-SQL oracle over the same deterministic derivation —
the same shape as the reference's golden-set ITs, which compare
index-accelerated scans against precomputed expected feature sets
(GeoWaveBasicSpatialVectorIT.java:36-167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geowave_spark.operators import bbox as OB
from geowave_spark.operators import index as OI
from geowave_spark.plans import planner as P
from geowave_spark.sources import tables as TB

ENTRY_SF_DIR = "/root/testdata/sf0.001"

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# BBOX suite (SURVEY §2.3 BasicQueryFilter/SpatialQueryFilter box path,
# §2.4 SpatialQuery → range decomposition)
# ---------------------------------------------------------------------------

BBOX_SUITE = [
    P.BoxQuery("hot_nyc", -74.5, 40.2, -73.5, 41.2),
    P.BoxQuery("hot_tokyo_small", 139.5, 35.4, 139.9, 35.9),
    P.BoxQuery("country", -10.0, 35.0, 30.0, 60.0),
    P.BoxQuery("empty_ocean", -40.0, -55.0, -39.9, -54.9),
    P.BoxQuery("antimeridian", 170.0, -20.0, -170.0, 20.0),
]


def _bbox_lon_pred(q: P.BoxQuery) -> str:
    if q.minx <= q.maxx:
        return f"(lon >= {q.minx} AND lon <= {q.maxx})"
    return f"(lon >= {q.minx} OR lon <= {q.maxx})"


def q_bbox_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    out = OB.query_bbox(geo, BBOX_SUITE, tiers=[OI.C.MAX_RES])
    return out.select("query_id", "event_id", "lon", "lat")


def _bbox_suite_oracle() -> str:
    arms = [
        f"SELECT '{q.query_id}' AS query_id, event_id, lon, lat FROM geo_events "
        f"WHERE {_bbox_lon_pred(q)} AND lat >= {q.miny} AND lat <= {q.maxy}"
        for q in BBOX_SUITE
    ]
    return TB.oracle_with(TB.GEO_EVENTS_SQL, "geo_events", " UNION ALL ".join(arms))


register("bbox_suite", q_bbox_suite, _bbox_suite_oracle())


def q_bbox_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    q = P.BoxQuery("hot_nyc", -74.5, 40.2, -73.5, 41.2)
    return OB.query_bbox(geo, [q], tiers=[OI.C.MAX_RES]).select("event_id", "lon", "lat", "event_type")


register(
    "bbox_hot",
    q_bbox_hot,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, lon, lat, event_type FROM geo_events "
        "WHERE lon >= -74.5 AND lon <= -73.5 AND lat >= 40.2 AND lat <= 41.2",
    ),
)


# ---------------------------------------------------------------------------
# Polygon PIP (SURVEY §2.3 SpatialQueryFilter exact refine, §2.4
# SpatialQuery; interior-cell skip ≙ IndexOnlySpatialQuery)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geowave_spark.functions import geometry as G  # noqa: E402
from geowave_spark.operators import polygon as OP  # noqa: E402

# CCW convex pentagon over the NYC blob; vertices off the milli-degree
# lattice so no derived point sits exactly on an edge.
PENTAGON = np.array(
    [
        [-73.2003, 40.7601],
        [-73.7004, 41.4002],
        [-74.5001, 41.2003],
        [-74.7002, 40.4004],
        [-73.8005, 40.1005],
    ]
)
# Concave L-shape with a hole over the Paris blob (no SQL oracle — checked
# rows-only by the driver, exactly by pytest brute force).
PARIS_LSHAPE = [
    np.array([[1.4, 48.0], [3.4, 48.0], [3.4, 49.0], [2.4, 49.0], [2.4, 49.8], [1.4, 49.8]]),
    np.array([[2.0, 48.4], [2.6, 48.4], [2.6, 48.7], [2.0, 48.7]]),
]


def q_pip_convex(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    q = OP.PolygonQuery("pent_nyc", G.wkb_polygon([PENTAGON]), "INTERSECTS")
    return OP.query_polygon(geo, [q], tiers=[OI.C.MAX_RES]).select("event_id", "lon", "lat")


def _halfplane_pred(ring: np.ndarray) -> str:
    terms = []
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        terms.append(
            f"(({x1!r} - {x0!r}) * (lat - {y0!r}) - ({y1!r} - {y0!r}) * (lon - {x0!r})) >= 0.0"
        )
    return " AND ".join(terms)


register(
    "pip_convex",
    q_pip_convex,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT event_id, lon, lat FROM geo_events WHERE {_halfplane_pred(PENTAGON)}",
    ),
)


def q_pip_concave_hole(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    q = OP.PolygonQuery("paris_L", G.wkb_polygon(PARIS_LSHAPE), "INTERSECTS")
    return OP.query_polygon(geo, [q], tiers=[OI.C.MAX_RES]).select("event_id", "lon", "lat")


def _evenodd_pred(rings: list[np.ndarray]) -> str:
    """Canonical copy lives in geometry.evenodd_sql (shared with the
    S2 polygon-query refine so both sides carry identical literals)."""
    return G.evenodd_sql(rings)


register(
    "pip_concave_hole",
    q_pip_concave_hole,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT event_id, lon, lat FROM geo_events WHERE {_evenodd_pred(PARIS_LSHAPE)}",
    ),
)


# ---------------------------------------------------------------------------
# kNN (SURVEY §2.5 NN partition join → cell-ring expansion join)
# ---------------------------------------------------------------------------

from geowave_spark.operators import knn as OK  # noqa: E402

KNN_SUITE = [
    OK.KnnQuery("knn_nyc", -73.985, 40.758, 5),       # dense blob center
    OK.KnnQuery("knn_tokyo", 139.692, 35.690, 50),    # dense, large k
    OK.KnnQuery("knn_ocean", -35.0, -45.0, 5),        # sparse → ring expansion
    OK.KnnQuery("knn_dateline", 179.9, 0.0, 3),       # wrap
    OK.KnnQuery("knn_one", 77.209, 28.614, 1),
]


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OK.query_knn(geo, KNN_SUITE).select(
        "query_id", "rank", "event_id", "dist2_milli"
    )


def _knn_oracle() -> str:
    vals = ", ".join(
        f"('{q.query_id}', {q.lon_milli}, {q.lat_milli}, {q.k})" for q in KNN_SUITE
    )
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
q(query_id, q_lon_milli, q_lat_milli, k) AS (VALUES {vals}),
d AS (
  SELECT q.query_id, e.event_id, q.k,
         LEAST(ABS(e.lon_milli - q.q_lon_milli),
               360000 - ABS(e.lon_milli - q.q_lon_milli)) AS dlon,
         ABS(e.lat_milli - q.q_lat_milli) AS dlat
  FROM geo_events e CROSS JOIN q
),
ranked AS (
  SELECT query_id, event_id, k,
         CAST(dlon * dlon + dlat * dlat AS BIGINT) AS dist2_milli,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY dlon * dlon + dlat * dlat, event_id) AS INTEGER) AS rank
  FROM d
)
SELECT query_id, rank, event_id, dist2_milli FROM ranked WHERE rank <= k
"""


register("knn", q_knn, _knn_oracle())


# Dataset-scale kNN join (NNMapReduce parity — every left row is a query;
# no driver loop, no collect).  Left = deterministic ~9% slice of events.
KNN_JOIN_K = 4
KNN_JOIN_DIST = 250  # milli-degrees (~3x the hot-blob mean NN spacing)


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir)
    left = geo.filter(F.col("event_id") % 11 == 0)
    # adaptive (escalating-radius) variant: identical rows to knn_join,
    # candidate work bounded by local density — the sf1-gate fix
    return OK.knn_join_adaptive(left, geo, KNN_JOIN_K, KNN_JOIN_DIST)


def _knn_join_oracle() -> str:
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
l AS (
  SELECT event_id AS query_id, lon_milli AS qlon, lat_milli AS qlat
  FROM geo_events WHERE event_id % 11 = 0
),
d AS (
  SELECT l.query_id, e.event_id AS neighbor_id,
         LEAST(ABS(e.lon_milli - l.qlon),
               360000 - ABS(e.lon_milli - l.qlon)) AS dlon,
         ABS(e.lat_milli - l.qlat) AS dlat
  FROM l JOIN geo_events e ON e.event_id <> l.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(dlon * dlon + dlat * dlat AS BIGINT) AS dist2_milli,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY dlon * dlon + dlat * dlat, neighbor_id) AS INTEGER) AS rank
  FROM d
  WHERE dlon * dlon + dlat * dlat <= {KNN_JOIN_DIST ** 2}
)
SELECT query_id, rank, neighbor_id, dist2_milli FROM ranked
WHERE rank <= {KNN_JOIN_K}
"""


register("knn_join", q_knn_join, _knn_join_oracle())


# ---------------------------------------------------------------------------
# KDE Gaussian-smoothed density pyramid (SURVEY §2.9 KDE gap —
# analytics/mapreduce/.../kde/GaussianFilter.java fixed 7-tap kernel,
# GaussianCellMapper 2^(L+1) x 2^L posts grid, AccumuloKDEReducer bands)
# ---------------------------------------------------------------------------

from geowave_spark.operators import kde as OKDE  # noqa: E402

KDE_LEVELS = [4, 5, 6]


def q_kde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir)
    return OKDE.kde_levels(OKDE.kde_grid(geo, KDE_LEVELS))


def _kde_oracle() -> str:
    r = 3
    offs = ", ".join(
        f"({lv}, {dx}, {dy}, {OKDE.KERNEL_FP[dx + r] * OKDE.KERNEL_FP[dy + r]})"
        for lv in KDE_LEVELS
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
    )

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
o(lvl, dx, dy, w) AS (VALUES {offs}),
scat AS (
  SELECT o.lvl AS level,
         {idiv("(e.lon_milli + 180000) * (2::BIGINT << o.lvl)", "360000")} + o.dx AS gx,
         {idiv("(e.lat_milli + 90000) * (1::BIGINT << o.lvl)", "180000")} + o.dy AS gy,
         o.w, o.lvl
  FROM geo_events e CROSS JOIN o
),
grid AS (
  SELECT level, gx, gy, CAST(SUM(w) AS BIGINT) AS weight_fp
  FROM scat
  WHERE gx >= 0 AND gx < (2::BIGINT << lvl)
    AND gy >= 0 AND gy < (1::BIGINT << lvl)
  GROUP BY level, gx, gy
)
SELECT level, gx, gy, weight_fp,
       CAST(weight_fp AS DOUBLE) / CAST(1000000 AS DOUBLE) AS weight,
       CAST(weight_fp AS DOUBLE)
         / CAST(MAX(weight_fp) OVER (PARTITION BY level) AS DOUBLE) AS normalized,
       CAST(RANK() OVER (PARTITION BY level ORDER BY weight_fp ASC) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY level) AS DOUBLE) AS percentile
FROM grid
"""


register("kde_grid", q_kde_grid, _kde_oracle())


def q_kde_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KDE raster-pyramid output (AccumuloKDEReducer GridCoverage tiles).
    The binary band rasters stay pytest-pinned; the numeric per-tile
    columns (post count, max normalized) ARE SQL-expressible from the
    posts grid, so the driver gets an exact oracle."""
    geo = TB.geo_events(spark, sf_dir)
    return OKDE.kde_tiles(geo, level=3, tile_size=64).select(
        "level", "tile_x", "tile_y", "n_posts", "max_norm"
    )


def _kde_tiles_oracle() -> str:
    # posts grid at level 3 + log2(64) = 9; tile = post >> 6
    lv, shift = 9, 6
    r = 3
    offs = ", ".join(
        f"({dx}, {dy}, {OKDE.KERNEL_FP[dx + r] * OKDE.KERNEL_FP[dy + r]})"
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
    )

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
o(dx, dy, w) AS (VALUES {offs}),
scat AS (
  SELECT {idiv(f"(e.lon_milli + 180000) * {2 << lv}", "360000")} + o.dx AS gx,
         {idiv(f"(e.lat_milli + 90000) * {1 << lv}", "180000")} + o.dy AS gy,
         o.w
  FROM geo_events e CROSS JOIN o
),
grid AS (
  SELECT gx, gy, CAST(SUM(w) AS BIGINT) AS weight_fp
  FROM scat
  WHERE gx >= 0 AND gx < {2 << lv} AND gy >= 0 AND gy < {1 << lv}
  GROUP BY gx, gy
),
normd AS (
  SELECT gx, gy,
         CAST(weight_fp AS DOUBLE) / CAST(MAX(weight_fp) OVER () AS DOUBLE)
           AS normalized
  FROM grid
)
SELECT CAST(3 AS BIGINT) AS level,
       (gx >> {shift}) AS tile_x, (gy >> {shift}) AS tile_y,
       CAST(COUNT(*) AS INTEGER) AS n_posts,
       MAX(normalized) AS max_norm
FROM normd GROUP BY 2, 3
"""


register("kde_tiles", q_kde_tiles, _kde_tiles_oracle())


def q_render_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed render: point features -> per-tile density PNG renders
    (binary pixels -> rows-only; placement/intensity pinned by pytest)."""
    geo = TB.geo_events(spark, sf_dir)
    return OTL.render_point_tiles(geo, level=3, tile_size=64).select(
        "level", "tile_ix", "tile_iy", "n_points", "max_count"
    )


def _render_tiles_oracle() -> str:
    # pixel grid = square Morton grid at res 3 + log2(64) = 9
    res, shift = 9, 6
    n = 1 << res

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
px AS (
  SELECT {idiv(f"(lon_milli + 180000) * {n}", "360000")} AS ix,
         {idiv(f"(lat_milli + 90000) * {n}", "180000")} AS iy
  FROM geo_events
),
cnt AS (
  SELECT (ix >> {shift}) AS tile_ix, (iy >> {shift}) AS tile_iy, ix, iy,
         COUNT(*) AS c
  FROM px GROUP BY 1, 2, 3, 4
)
SELECT CAST(3 AS BIGINT) AS level, tile_ix, tile_iy,
       CAST(SUM(c) AS BIGINT) AS n_points, CAST(MAX(c) AS BIGINT) AS max_count
FROM cnt GROUP BY 2, 3
"""


register("render_point_tiles", q_render_tiles, _render_tiles_oracle())


AUDIO_N = 200


def q_audio_features(spark, sf_dir):
    """PCM-WAVE decode + features over the deterministic synthetic clip
    table; oracle-exact end-to-end (closed-form sine RMS/ZCR additionally
    pinned by pytest test_media.py)."""
    return OM.audio_features(SYN.audio(spark, AUDIO_N, partitions=8))


def _audio_features_oracle() -> str:
    """Replays tone generation + WAVE round trip + features in SQL.  The
    int16 quantization step is bit-identical between numpy's sin and
    DuckDB's (verified over every sample of every clip on this platform —
    a 1-ulp libm divergence would surface as a red driver row, which is
    the desired behavior for a codec oracle).  Energy and zero-crossing
    counts are exact integers; the two float divisions + sqrt are the same
    IEEE ops in both engines."""
    return f"""
WITH clips AS (SELECT range AS i FROM range({AUDIO_N})),
smp AS (
  SELECT i, t.t AS t,
    CAST(round(sin(2*pi()*(200.0 + (i%32)*25.0)*(t.t/8000.0))
         * (0.25 + (i%4)*0.15) * 32767.0) AS BIGINT) AS s
  FROM clips, LATERAL unnest(generate_series(0, 1999)) AS t(t)
),
lagd AS (
  SELECT i, t, s, lag(s) OVER (PARTITION BY i ORDER BY t) AS ps FROM smp
),
agg AS (
  SELECT i,
    CAST(SUM(s*s) AS BIGINT) AS energy,
    CAST(SUM(CASE WHEN ps IS NOT NULL AND ((s < 0) != (ps < 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zc
  FROM lagd GROUP BY i
)
SELECT 'aud' || lpad(CAST(i AS VARCHAR), 9, '0') AS media_id,
  2000::BIGINT AS n_samples, 1 AS n_channels, 8000 AS sample_rate,
  250::BIGINT AS duration_ms,
  CAST(round(sqrt((energy / 1073741824.0) / 2000.0) * 1000) AS BIGINT) AS rms_milli,
  CAST(round((zc / 1999.0) * 1000) AS BIGINT) AS zcr_milli
FROM agg
"""


register("audio_features", q_audio_features, _audio_features_oracle())


VIDEO_N = 100


def q_video_frames(spark, sf_dir):
    """Uncompressed-AVI frame sampling + per-frame dhash, one row per
    sampled frame.  Oracle-exact end-to-end: the procedural RGB frames
    make the channel mean (R + roll(R) + (255-R))/3 collapse to integer
    math on the G channel alone, so the AVI encode→decode→dhash pipeline
    replays in pure SQL."""
    vf = OM.video_frame_sample(SYN.videos(spark, VIDEO_N, partitions=8))
    return vf.select(
        "media_id", "n_frames", "fps", "w", "h",
        F.posexplode("frame_dhash").alias("pos", "frame_dhash"),
    ).select(
        "media_id", "n_frames", "fps", "w", "h",
        (F.col("pos") * 2).cast("long").alias("frame_idx"),  # every_n = 2
        "frame_dhash",
    )


def _video_frames_oracle() -> str:
    # g = truncated mean of the 3 channels at the 9x8 resize sample point:
    # (255 + p(i*7+f, (jx-f) mod 32, 3*by)) // 3 with p the F1 pixel
    # formula — R and B cancel, G is the rolled base frame
    p = (
        "(255 + ((i*7 + frame_idx)*31"
        " + ((((CAST((bx*32 - (bx*32) % 9) / 9 AS BIGINT)) - frame_idx)"
        " % 32 + 32) % 32) * 7"
        " + (by*3)*13) % 256)"
    )
    return f"""
WITH vids AS (SELECT range AS i, 6 + range % 6 AS nf FROM range({VIDEO_N})),
fr AS (
  SELECT i, nf, f.f AS frame_idx
  FROM vids, LATERAL unnest(generate_series(0, nf-1, 2)) AS f(f)
),
grid AS (
  SELECT i, frame_idx, by, bx,
         CAST(({p} - {p} % 3) / 3 AS BIGINT) AS g
  FROM fr,
       LATERAL unnest(generate_series(0, 7)) AS by(by),
       LATERAL unnest(generate_series(0, 8)) AS bx(bx)
),
bits AS (
  SELECT a.i AS i, a.frame_idx AS frame_idx, a.by AS by, a.bx AS bx,
         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM grid a JOIN grid b
    ON a.i = b.i AND a.frame_idx = b.frame_idx AND a.by = b.by AND b.bx = a.bx + 1
  WHERE a.bx < 8
),
dh AS (
  SELECT i, frame_idx,
    CAST(SUM(CASE WHEN by*8+bx < 63 THEN bit * (1::BIGINT << (by*8+bx)) ELSE 0 END) AS BIGINT)
      + CASE WHEN MAX(CASE WHEN by*8+bx = 63 THEN bit ELSE 0 END) = 1
             THEN -9223372036854775807 - 1 ELSE 0 END AS frame_dhash
  FROM bits GROUP BY i, frame_idx
)
SELECT 'vid' || lpad(CAST(vids.i AS VARCHAR), 9, '0') AS media_id,
       CAST(vids.nf AS INTEGER) AS n_frames, 10 AS fps,
       32 AS w, 24 AS h, dh.frame_idx, dh.frame_dhash
FROM vids JOIN dh ON vids.i = dh.i
"""


register("video_frames", q_video_frames, _video_frames_oracle())


# ---------------------------------------------------------------------------
# Spatial-temporal compound (SURVEY §2.4 SpatialTemporalQuery, §1.4 binning)
# ---------------------------------------------------------------------------

from geowave_spark.operators import temporal as OT  # noqa: E402

ST_SUITE = [
    OT.STQuery("st_nyc_w1", -74.5, 40.2, -73.5, 41.2, "2024-01-01 00:00:00", "2024-01-07 23:59:59"),
    OT.STQuery("st_tokyo_mid", 139.0, 35.0, 140.5, 36.5, "2024-01-10 12:00:00", "2024-01-20 11:59:59"),
    OT.STQuery("st_global_day", -180.0, -90.0, 180.0, 90.0, "2024-01-15 00:00:00", "2024-01-15 23:59:59"),
    OT.STQuery("st_wrap_week", 170.0, -20.0, -170.0, 20.0, "2024-01-05 00:00:00", "2024-01-12 00:00:00"),
]


def q_spatial_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = OT.with_time_bin(
        OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id"),
        periodicity="day",
    )
    return OT.query_spatial_temporal(geo, ST_SUITE, tiers=[OI.C.MAX_RES]).select(
        "query_id", "event_id", "lon", "lat", "ts"
    )


def _st_oracle() -> str:
    arms = []
    for q in ST_SUITE:
        lon_pred = (
            f"(lon >= {q.minx} AND lon <= {q.maxx})"
            if q.minx <= q.maxx
            else f"(lon >= {q.minx} OR lon <= {q.maxx})"
        )
        arms.append(
            f"SELECT '{q.query_id}' AS query_id, event_id, lon, lat, ts FROM geo_events "
            f"WHERE {lon_pred} AND lat >= {q.miny} AND lat <= {q.maxy} "
            f"AND ts >= TIMESTAMP '{q.t0}' AND ts <= TIMESTAMP '{q.t1}'"
        )
    return TB.oracle_with(TB.GEO_EVENTS_SQL, "geo_events", " UNION ALL ".join(arms))


register("spatial_temporal", q_spatial_temporal, _st_oracle())


def q_temporal_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir)
    return OT.query_temporal(
        geo, "2024-01-03 00:00:00", "2024-01-05 00:00:00"
    ).select("event_id", "ts", "event_type")


register(
    "temporal_range",
    q_temporal_range,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, ts, event_type FROM geo_events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts <= TIMESTAMP '2024-01-05 00:00:00'",
    ),
)


# ---------------------------------------------------------------------------
# Tile assignment (SURVEY §2.9 RasterDataAdapter level selection + per-level
# cover explode) — exact integer grid, SQL-reproducible
# ---------------------------------------------------------------------------

from geowave_spark.operators import tiling as OTL  # noqa: E402


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = TB.geo_footprints(spark, sf_dir)
    assigned = OTL.assign_tiles(fps)
    return assigned.select(
        "event_id",
        F.col("level").cast("long").alias("level"),
        F.col("tile_ix").alias("ix"),
        F.col("tile_iy").alias("iy"),
    )


def _tile_assign_oracle_sql() -> str:
    # integer div a//b as (a - a%b)/b — exact and portable across engines
    def idiv(a: str, b: int) -> str:
        return f"CAST((({a}) - (({a}) % {b})) / {b} AS BIGINT)"

    return f"""
WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL}),
g AS (
  SELECT event_id, native_level AS level,
         CASE native_level WHEN 6 THEN 64 WHEN 7 THEN 128 WHEN 8 THEN 256
              WHEN 9 THEN 512 WHEN 10 THEN 1024 ELSE 2048 END AS n,
         minx_m, miny_m, maxx_m, maxy_m
  FROM geo_footprints
),
b AS (
  SELECT event_id, level, n,
         {idiv("(minx_m + 180000) * n", 360000)} AS ix0,
         {idiv("(maxx_m + 180000) * n", 360000)} AS ix1,
         {idiv("(miny_m + 90000) * n", 180000)} AS iy0,
         {idiv("(maxy_m + 90000) * n", 180000)} AS iy1
  FROM g
)
SELECT event_id, level, ix0 + dx.v AS ix, iy0 + dy.v AS iy
FROM b
CROSS JOIN (VALUES (0), (1)) AS dx(v)
CROSS JOIN (VALUES (0), (1)) AS dy(v)
WHERE dx.v <= ix1 - ix0 AND dy.v <= iy1 - iy0
"""


register("tile_assign", q_tile_assign, _tile_assign_oracle_sql())

QK_MAX_LEVEL = 16  # footprint native levels are 6..11; margin for retile


def q_tile_quadkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slippy-map interop: the tile_assign ladder keyed as Bing-style
    quadkey strings (functions/cols.quadkey_col — one flat codegen concat,
    variable per-row level, no UDF), so rendered/mosaicked tiles can be
    addressed by any XYZ/quadkey map consumer."""
    from geowave_spark.functions import cols as X

    t = q_tile_assign(spark, sf_dir)
    return t.select(
        "event_id", "level", "ix", "iy",
        X.quadkey_col(F.col("ix"), F.col("iy"), F.col("level"),
                      max_level=QK_MAX_LEVEL).alias("qk"),
    )


def _tile_quadkeys_oracle_sql() -> str:
    terms = " || ".join(
        f"(CASE WHEN {s} < level THEN "
        f"CAST(((ix >> {s}) & 1) + 2 * ((iy >> {s}) & 1) AS VARCHAR) "
        f"ELSE '' END)"
        for s in range(QK_MAX_LEVEL - 1, -1, -1)
    )
    # mirror the engine's never-truncate guard (quadkey_col raises on
    # level > max_level): without it the oracle would silently emit a
    # truncated key and a future level growth would surface as a
    # confusing hash mismatch instead of a loud error on both sides
    qk = (
        f"CASE WHEN level > {QK_MAX_LEVEL} "
        f"THEN error('quadkey level > {QK_MAX_LEVEL}') ELSE {terms} END"
    )
    return f"""
SELECT event_id, level, ix, iy, {qk} AS qk
FROM ({_tile_assign_oracle_sql()})
"""


# registered in the EXTRA section below (register_extra is defined there)


# ---------------------------------------------------------------------------
# Training-data pipeline: deduplication (exact, MinHash-LSH, SimHash,
# blocked Jaccard) over the documents table
# ---------------------------------------------------------------------------

from geowave_spark.operators import dedup as OD  # noqa: E402
from geowave_spark.operators import text as OTX  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TB.load_tables(spark, sf_dir, names=("documents",))["documents"]


def q_exact_dedup(spark, sf_dir):
    return OD.exact_dedup(_docs(spark, sf_dir))


register("exact_dedup", q_exact_dedup, OD.exact_dedup_oracle())


def q_minhash_lsh(spark, sf_dir):
    # arrow engine: bit-identical numpy signature kernel (tests assert
    # cross-path equality) at pandas-batch speed
    return OD.minhash_lsh_pairs(_docs(spark, sf_dir), engine="arrow")


register("minhash_lsh_pairs", q_minhash_lsh, OD.minhash_lsh_pairs_oracle())


# NOTE: the per-doc `simhash` query was retired from the registry in round
# 3 to keep the roster at the driver's 50-row gate (round 2 registered 51
# and the 51st, json_props, was silently dropped from CORRECTNESS_r02).
# Coverage is unchanged: simhash_pairs' oracle re-derives every signature
# in SQL (transitively oracle-exact), and pytest pins the per-doc values
# plus Arrow/Catalyst cross-path equality (test_dedup_scale.py).


def q_simhash_pairs(spark, sf_dir):
    return OD.simhash_pairs(_docs(spark, sf_dir), engine="arrow")


register("simhash_pairs", q_simhash_pairs, OD.simhash_pairs_oracle())


JACCARD_MAX_DF = 50  # doc-frequency stoplist: hot tokens skip candidate gen


def q_jaccard_pairs(spark, sf_dir):
    return OD.jaccard_pairs(_docs(spark, sf_dir), max_df=JACCARD_MAX_DF)


register(
    "jaccard_pairs",
    q_jaccard_pairs,
    OD.jaccard_pairs_oracle(max_df=JACCARD_MAX_DF),
)


# ---------------------------------------------------------------------------
# Text analysis: language-ID, quality scoring, token stats, fingerprints
# ---------------------------------------------------------------------------


def q_lang_id(spark, sf_dir):
    return OTX.lang_id(_docs(spark, sf_dir))


register("lang_id", q_lang_id, OTX.lang_id_oracle())


def q_text_quality(spark, sf_dir):
    return OTX.quality_score(_docs(spark, sf_dir))


register("text_quality", q_text_quality, OTX.quality_score_oracle())


def q_token_stats(spark, sf_dir):
    return OTX.token_stats(_docs(spark, sf_dir))


register("token_stats", q_token_stats, OTX.token_stats_oracle())


def q_fingerprints(spark, sf_dir):
    # arrow twin: bit-identical winnowing at pandas-batch speed
    return OTX.fingerprints_arrow(_docs(spark, sf_dir))


register("winnow_fingerprints", q_fingerprints, OTX.fingerprints_oracle())


# ---------------------------------------------------------------------------
# Embedding similarity: brute-force cosine top-k, blocked near-dup, LSH ANN
# ---------------------------------------------------------------------------

from geowave_spark.operators import embed as OE  # noqa: E402


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TB.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]


def q_embed_topk(spark, sf_dir):
    return OE.cosine_topk(_emb(spark, sf_dir))


register("embed_topk", q_embed_topk, OE.cosine_topk_oracle())


def q_embed_neardup(spark, sf_dir):
    """Computed-quantizer blocking (round 2): the blocking key is derived
    from the embedding (integer hyperplane signs), not a given label."""
    return OE.neardup_pairs_q(_emb(spark, sf_dir))


register("embed_neardup", q_embed_neardup, OE.neardup_pairs_q_oracle())


def q_embed_neardup_label(spark, sf_dir):
    """Given-key blocking variant (kept: the IVF path when an upstream
    cluster/label assignment already exists)."""
    return OE.neardup_pairs(_emb(spark, sf_dir))


register("embed_neardup_label", q_embed_neardup_label, OE.neardup_pairs_oracle())


def q_embed_ann_join(spark, sf_dir):
    """All-pairs approximate kNN (every vector a query) via quantizer
    buckets — the embedding analogue of knn_join."""
    return OE.ann_knn_join(_emb(spark, sf_dir))


register("embed_ann_join", q_embed_ann_join, OE.ann_knn_join_oracle())


def q_embed_ann_lsh(spark, sf_dir):
    return OE.ann_lsh(_emb(spark, sf_dir))


register("embed_ann_lsh", q_embed_ann_lsh, OE.ann_lsh_oracle())
# (approximate operator, EXACT oracle: the integer bucket + probe + re-rank
# candidate-set definition is deterministic and replayed in SQL)


# ---------------------------------------------------------------------------
# Multimodal: image decode/feature kernel + raster mosaic (rows-only —
# no SQL engine can decode PNG; pytest pins the pixel math)
# ---------------------------------------------------------------------------

from geowave_spark.operators import multimodal as OM  # noqa: E402
from geowave_spark.sources import synthetic as SYN  # noqa: E402


IMGFEAT_N = 500


def q_image_features(spark, sf_dir):
    imgs = SYN.images(spark, n=IMGFEAT_N, partitions=16)
    return OM.image_features(imgs).select(
        "image_id", "w", "h", "fmt", "sum_lum", "dhash"
    )


def _image_features_oracle() -> str:
    """The synthetic pixels are procedural ((i*31 + x*7 + y*13) % 256) and
    the stub-lossy 'jpeg' quantization is v - v%4, so the WHOLE feature
    pipeline — PNG/LOSY encode, decode, luminance sum, 9x8 nearest-resize
    difference hash — replays in pure SQL: the oracle states what decode
    must yield, making this an end-to-end codec check, not just a feature
    check.  (mean_lum_milli / thumb_png stay pytest-pinned: float rounding
    and PNG bytes don't belong in SQL.)"""
    return f"""
WITH imgs AS (
  SELECT range AS i,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END AS w,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 256 END AS h,
         CASE range % 3 WHEN 2 THEN 'jpeg' ELSE 'png' END AS fmt
  FROM range({IMGFEAT_N})
),
pix AS (
  SELECT i, CASE WHEN fmt='jpeg' THEN v - (v % 4) ELSE v END AS vq
  FROM (
    SELECT imgs.i, imgs.fmt, (imgs.i*31 + x.x*7 + y.y*13) % 256 AS v
    FROM imgs,
         LATERAL unnest(generate_series(0, w-1)) AS x(x),
         LATERAL unnest(generate_series(0, h-1)) AS y(y)
  )
),
sums AS (SELECT i, CAST(SUM(vq) AS BIGINT) AS sum_lum FROM pix GROUP BY i),
grid AS (
  SELECT i, by, bx,
         CASE WHEN fmt='jpeg' THEN vv - (vv % 4) ELSE vv END AS g
  FROM (
    SELECT imgs.i, imgs.fmt, by.by, bx.bx,
      (imgs.i*31
        + CAST(((bx.bx*imgs.w) - ((bx.bx*imgs.w) % 9)) / 9 AS BIGINT) * 7
        + CAST(((by.by*imgs.h) - ((by.by*imgs.h) % 8)) / 8 AS BIGINT) * 13) % 256 AS vv
    FROM imgs,
         LATERAL unnest(generate_series(0, 7)) AS by(by),
         LATERAL unnest(generate_series(0, 8)) AS bx(bx)
  )
),
bits AS (
  SELECT a.i AS i, a.by AS by, a.bx AS bx,
         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM grid a JOIN grid b ON a.i = b.i AND a.by = b.by AND b.bx = a.bx + 1
  WHERE a.bx < 8
),
dh AS (
  SELECT i,
    CAST(SUM(CASE WHEN by*8+bx < 63 THEN bit * (1::BIGINT << (by*8+bx)) ELSE 0 END) AS BIGINT)
      + CASE WHEN MAX(CASE WHEN by*8+bx = 63 THEN bit ELSE 0 END) = 1
             THEN -9223372036854775807 - 1 ELSE 0 END AS dhash
  FROM bits GROUP BY i
)
SELECT 'img' || lpad(CAST(imgs.i AS VARCHAR), 12, '0') AS image_id,
       imgs.w, imgs.h, imgs.fmt, sums.sum_lum, dh.dhash
FROM imgs JOIN sums ON imgs.i = sums.i JOIN dh ON imgs.i = dh.i
"""


register("image_features", q_image_features, _image_features_oracle())
# full-pipeline oracle: procedural pixels + stub-lossy quantization + dhash
# replayed in SQL; thumbnails/mean stay pytest-pinned


def _syn_images_env_sql(n: int) -> str:
    """DuckDB mirror of sources/synthetic.py's image envelopes: the exact
    integer derivation of ``_locate`` + half-extent + world clamp replayed
    over ``range(n)`` (same math as GEO_FOOTPRINTS_SQL with i for
    event_id)."""
    from geowave_spark.sources.tables import BLOBS_MILLI

    lon_case = " ".join(
        f"WHEN {i} THEN {lon}" for i, (lon, _) in enumerate(BLOBS_MILLI[:-1])
    ) + f" ELSE {BLOBS_MILLI[-1][0]}"
    lat_case = " ".join(
        f"WHEN {i} THEN {lat}" for i, (_, lat) in enumerate(BLOBS_MILLI[:-1])
    ) + f" ELSE {BLOBS_MILLI[-1][1]}"
    return f"""
SELECT i,
       GREATEST(lon_milli - half_m, -180000) AS minx_m,
       GREATEST(lat_milli - half_m, -90000) AS miny_m,
       LEAST(lon_milli + half_m, 179999) AS maxx_m,
       LEAST(lat_milli + half_m, 89999) AS maxy_m
FROM (
  SELECT i,
         CASE WHEN h1 % 10 < 8
              THEN (CASE h2 % 5 {lon_case} END) + (h1 % 2001) - 1000
              ELSE (h1 % 360000) - 180000 END AS lon_milli,
         CASE WHEN h1 % 10 < 8
              THEN (CASE h2 % 5 {lat_case} END) + (h2 % 2001) - 1000
              ELSE (h2 % 170000) - 85000 END AS lat_milli,
         CASE (i * 40503) % 6
              WHEN 0 THEN 32 WHEN 1 THEN 64 WHEN 2 THEN 128
              WHEN 3 THEN 256 WHEN 4 THEN 512 ELSE 1024 END AS half_m
  FROM (
    SELECT range AS i,
           (range * 2654435761) % 4294967296 AS h1,
           ((range + 1) * 2246822519) % 4294967296 AS h2
    FROM range({n})
  ) hashed
) located
"""


def _duck_pack_sql(res: int, ix: str, iy: str) -> str:
    """DuckDB Morton pack at fixed ``res``: (res<<58) + interleave(ix, iy)
    — the SQL mirror of functions/cells.pack."""
    terms = []
    for b in range(res):
        terms.append(f"((({ix}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({iy}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    z = " + ".join(terms) if terms else "0"
    return f"({res}::BIGINT << 58) + ({z})"


def _idiv_sql(a: str, b: int) -> str:
    return f"CAST((({a}) - (({a}) % {b})) / {b} AS BIGINT)"


def _syn_cover_sql(n_imgs: int, level: int) -> str:
    """CTE body: level-``level`` tile cover (i, ix, iy) of the synthetic
    image envelopes — one row per (image, covered tile)."""
    n = 1 << level
    return f"""
WITH env AS ({_syn_images_env_sql(n_imgs)}),
b AS (
  SELECT i,
         {_idiv_sql("(minx_m + 180000) * " + str(n), 360_000)} AS ix0,
         {_idiv_sql("(maxx_m + 180000) * " + str(n), 360_000)} AS ix1,
         {_idiv_sql("(miny_m + 90000) * " + str(n), 180_000)} AS iy0,
         {_idiv_sql("(maxy_m + 90000) * " + str(n), 180_000)} AS iy1
  FROM env
),
cover AS (
  SELECT i, ix0 + dx.v AS ix, iy0 + dy.v AS iy
  FROM b
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS dx(v)
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS dy(v)
  WHERE dx.v <= ix1 - ix0 AND dy.v <= iy1 - iy0
)
"""


MOSAIC_N_IMGS, MOSAIC_LEVEL = 300, 7


def q_mosaic(spark, sf_dir):
    imgs = SYN.images(spark, n=MOSAIC_N_IMGS, partitions=16)
    assigned = OTL.assign_tiles(imgs, level=MOSAIC_LEVEL)
    tiles = OTL.render_tiles(assigned)
    return tiles.select(
        "tile_cell", "level", "tile_ix", "tile_iy",
        F.col("n_src").cast("long").alias("n_src"),
    )


def _mosaic_oracle() -> str:
    return f"""
{_syn_cover_sql(MOSAIC_N_IMGS, MOSAIC_LEVEL)}
SELECT {_duck_pack_sql(MOSAIC_LEVEL, "ix", "iy")} AS tile_cell,
       {MOSAIC_LEVEL}::BIGINT AS level, ix AS tile_ix, iy AS tile_iy,
       CAST(COUNT(*) AS BIGINT) AS n_src
FROM cover GROUP BY ix, iy
"""


register("mosaic", q_mosaic, _mosaic_oracle())
# numeric columns oracle-exact; pixel bytes (tile_png/valid_frac) pinned in
# tests/test_tiling.py closed-form pytest


# ---------------------------------------------------------------------------
# Statistics (SURVEY §2.6 DataStatistics family: count / bbox / time range /
# cardinality as one partial-aggregated pass)
# ---------------------------------------------------------------------------

from geowave_spark import stats as ST  # noqa: E402


def q_stats_summary(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return ST.summary_stats(geo).select(
        "n_rows", "min_lon", "max_lon", "min_lat", "max_lat",
        "n_ids", "min_ts", "max_ts",
    )


register(
    "stats_summary",
    q_stats_summary,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT COUNT(*) AS n_rows, MIN(lon) AS min_lon, MAX(lon) AS max_lon, "
        "MIN(lat) AS min_lat, MAX(lat) AS max_lat, "
        "COUNT(DISTINCT event_id) AS n_ids, MIN(ts) AS min_ts, MAX(ts) AS max_ts "
        "FROM geo_events",
    ),
)


# ---------------------------------------------------------------------------
# Scan-time operator surface (SURVEY §2.3/2.6/2.7: aggregation pushdown,
# fixed-cardinality subsampling, secondary index JOIN, DWithin, prefix /
# coordinate-range query, deterministic limit)
# ---------------------------------------------------------------------------

from geowave_spark.functions import cells as CE  # noqa: E402
from geowave_spark.operators import scan as OS  # noqa: E402


def duck_cell_sql(res: int, lon_m: str = "lon_milli", lat_m: str = "lat_milli") -> str:
    """DuckDB expression for the packed cell id at ``res`` from milli-degree
    integer coords — closed-form integer grid + explicit Morton interleave
    (the SQL mirror of functions/cells.pack ∘ grid_xy_milli)."""
    n = 1 << res
    ix = f"least(greatest((({lon_m}) + 180000) * {n} // 360000, 0), {n - 1})"
    iy = f"least(greatest((({lat_m}) + 90000) * {n} // 180000, 0), {n - 1})"
    terms = []
    for b in range(res):
        terms.append(f"((({ix}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({iy}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    z = " + ".join(terms) if terms else "0"
    return f"({res}::BIGINT << 58) + ({z})"


def q_count_agg(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.count_by_query(geo, BBOX_SUITE, tiers=[OI.C.MAX_RES])


def _count_agg_oracle() -> str:
    arms = [
        f"SELECT '{q.query_id}' AS query_id FROM geo_events "
        f"WHERE {_bbox_lon_pred(q)} AND lat >= {q.miny} AND lat <= {q.maxy}"
        for q in BBOX_SUITE
    ]
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT query_id, COUNT(*) AS n_rows FROM ("
        + " UNION ALL ".join(arms)
        + ") GROUP BY query_id",
    )


register("count_agg", q_count_agg, _count_agg_oracle())


SUBSAMPLE_RES = 6


def q_subsample(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.subsample(geo, SUBSAMPLE_RES)


def _subsample_oracle() -> str:
    cell = duck_cell_sql(SUBSAMPLE_RES)
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""
SELECT cell_r, event_id, lon, lat FROM (
  SELECT {cell} AS cell_r, event_id, lon, lat,
         ROW_NUMBER() OVER (PARTITION BY {cell} ORDER BY event_id ASC) AS rn
  FROM geo_events
) WHERE rn = 1
""",
    )


register("subsample", q_subsample, _subsample_oracle())


SECIDX_VALUES = ["click", "view"]


def q_secondary_index(spark, sf_dir):
    geo = TB.geo_events(spark, sf_dir)
    aux = OS.build_secondary_index(geo, "event_type")
    return OS.secondary_index_query(geo, aux, SECIDX_VALUES).select(
        "event_id", "event_type", "lon", "lat"
    )


register(
    "secondary_index",
    q_secondary_index,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, event_type, lon, lat FROM geo_events "
        f"WHERE event_type IN ({', '.join(repr(v) for v in SECIDX_VALUES)})",
    ),
)


DW_LON, DW_LAT, DW_DIST = -73.985, 40.758, 300


def q_dwithin(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.dwithin(geo, DW_LON, DW_LAT, DW_DIST, tiers=[OI.C.MAX_RES]).select(
        "event_id", "lon", "lat", "dist2_milli"
    )


def _dwithin_oracle() -> str:
    qx, qy = int(round(DW_LON * 1000)), int(round(DW_LAT * 1000))
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""
SELECT event_id, lon, lat, dist2_milli FROM (
  SELECT event_id, lon, lat,
         LEAST(ABS(lon_milli - {qx}), 360000 - ABS(lon_milli - {qx}))
           * LEAST(ABS(lon_milli - {qx}), 360000 - ABS(lon_milli - {qx}))
         + (lat_milli - {qy}) * (lat_milli - {qy}) AS dist2_milli
  FROM geo_events
) WHERE dist2_milli <= {DW_DIST * DW_DIST}
""",
    )


register("dwithin", q_dwithin, _dwithin_oracle())


PREFIX_RES = 5
PREFIX_CELL = int(CE.encode(-73.985, 40.758, PREFIX_RES)[()])


def q_prefix_scan(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.parent_cell_scan(geo, PREFIX_CELL).select("event_id", "lon", "lat")


def _prefix_oracle() -> str:
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT event_id, lon, lat FROM geo_events "
        f"WHERE {duck_cell_sql(PREFIX_RES)} = {PREFIX_CELL}",
    )


register("prefix_scan", q_prefix_scan, _prefix_oracle())


def q_limit_scan(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.limited_scan(geo, 100).select("cell", "event_id", "lon", "lat")


def _limit_oracle() -> str:
    cell = duck_cell_sql(CE.MAX_RES)
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT {cell} AS cell, event_id, lon, lat FROM geo_events "
        "ORDER BY cell ASC, event_id ASC LIMIT 100",
    )


register("limit_scan", q_limit_scan, _limit_oracle())


# ---------------------------------------------------------------------------
# Raster pyramid / retile / overview (SURVEY §2.9 buildPyramid walk,
# RasterTileResize, OverviewStatistics)
# ---------------------------------------------------------------------------

PYRAMID_MIN_LEVEL = 4


def q_tile_pyramid(spark, sf_dir):
    fps = TB.geo_footprints(spark, sf_dir)
    assigned = OTL.assign_tiles(fps, build_pyramid=True, min_pyramid_level=PYRAMID_MIN_LEVEL)
    return assigned.select(
        "event_id",
        F.col("level").cast("long").alias("level"),
        F.col("tile_ix").alias("ix"),
        F.col("tile_iy").alias("iy"),
    )


def _tile_pyramid_oracle() -> str:
    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    n = "(1::BIGINT << level)"
    return f"""
WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL}),
lv AS (
  SELECT event_id, minx_m, miny_m, maxx_m, maxy_m,
         unnest(generate_series(LEAST({PYRAMID_MIN_LEVEL}, native_level), native_level)) AS level
  FROM geo_footprints
),
b AS (
  SELECT event_id, level,
         {idiv(f"(minx_m + 180000) * {n}", "360000")} AS ix0,
         {idiv(f"(maxx_m + 180000) * {n}", "360000")} AS ix1,
         {idiv(f"(miny_m + 90000) * {n}", "180000")} AS iy0,
         {idiv(f"(maxy_m + 90000) * {n}", "180000")} AS iy1
  FROM lv
)
SELECT event_id, level, ix0 + dx.v AS ix, iy0 + dy.v AS iy
FROM b
CROSS JOIN (VALUES (0), (1)) AS dx(v)
CROSS JOIN (VALUES (0), (1)) AS dy(v)
WHERE dx.v <= ix1 - ix0 AND dy.v <= iy1 - iy0
"""


register("tile_pyramid", q_tile_pyramid, _tile_pyramid_oracle())


RETILE_N_IMGS, RETILE_LEVEL = 200, 6


def q_retile(spark, sf_dir):
    imgs = SYN.images(spark, n=RETILE_N_IMGS, partitions=8)
    tiles = OTL.render_tiles(OTL.assign_tiles(imgs, level=RETILE_LEVEL))
    coarse = OTL.retile_coarser(tiles)
    return coarse.select(
        "tile_cell", "level", "tile_ix", "tile_iy",
        F.col("n_children").cast("long").alias("n_children"),
    )


def _retile_oracle() -> str:
    lvl = RETILE_LEVEL - 1
    return f"""
{_syn_cover_sql(RETILE_N_IMGS, RETILE_LEVEL)},
child AS (SELECT DISTINCT ix, iy FROM cover),
parent AS (
  SELECT {_idiv_sql("ix", 2)} AS pix, {_idiv_sql("iy", 2)} AS piy,
         CAST(COUNT(*) AS BIGINT) AS n_children
  FROM child GROUP BY 1, 2
)
SELECT {_duck_pack_sql(lvl, "pix", "piy")} AS tile_cell,
       {lvl}::BIGINT AS level, pix AS tile_ix, piy AS tile_iy, n_children
FROM parent
"""


register("retile", q_retile, _retile_oracle())
# parent keys + child counts oracle-exact; stitched pixel bytes pinned in
# tests/test_tiling.py quadrant pytest


def q_overview_stats(spark, sf_dir):
    imgs = SYN.images(spark, n=RETILE_N_IMGS, partitions=8)
    tiles = OTL.render_tiles(OTL.assign_tiles(imgs, level=RETILE_LEVEL))
    return OTL.overview_stats(tiles).select(
        "level", "n_tiles", "min_ix", "max_ix", "min_iy", "max_iy",
        "total_contributions",
    )


def _overview_oracle() -> str:
    return f"""
{_syn_cover_sql(RETILE_N_IMGS, RETILE_LEVEL)},
tile AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS n_src FROM cover GROUP BY 1, 2)
SELECT {RETILE_LEVEL}::BIGINT AS level, CAST(COUNT(*) AS BIGINT) AS n_tiles,
       MIN(ix) AS min_ix, MAX(ix) AS max_ix,
       MIN(iy) AS min_iy, MAX(iy) AS max_iy,
       CAST(SUM(n_src) AS BIGINT) AS total_contributions
FROM tile
"""


register("overview_stats", q_overview_stats, _overview_oracle())
# avg_valid_frac (pixel-dependent) stays in pytest; the rest oracle-exact


# ---------------------------------------------------------------------------
# Envelope-indexed bbox query (multi-cell entries + DedupeFilter path,
# SURVEY §2.1 getInsertionIds multi-row-ID + §2.3 DedupeFilter) and the
# CQL-style compound query (§2.4 CQLQuery.createOptimalQuery: geometry +
# time + residual attribute predicate in one plan)
# ---------------------------------------------------------------------------

ENV_BOXES = [
    P.BoxQuery("env_nyc", -75.0, 40.0, -73.0, 42.0),
    P.BoxQuery("env_europe", -5.0, 44.0, 8.0, 52.0),
    P.BoxQuery("env_antimeridian", 176.0, -10.0, -176.0, 10.0),
]


def q_bbox_envelopes(spark, sf_dir):
    fps = TB.geo_footprints(spark, sf_dir)
    # envelopes in degrees for the residual; index on exact milli ints
    fps = fps.withColumn("minx", F.col("minx_m") / F.lit(1000.0)).withColumn(
        "miny", F.col("miny_m") / F.lit(1000.0)
    ).withColumn("maxx", F.col("maxx_m") / F.lit(1000.0)).withColumn(
        "maxy", F.col("maxy_m") / F.lit(1000.0)
    )
    idx = OI.index_envelopes_milli(fps, id_col="event_id")
    out = OB.query_bbox_envelopes(idx, ENV_BOXES)
    return out.select("query_id", "event_id", "minx_m", "maxx_m")


def _bbox_env_oracle() -> str:
    arms = []
    for q in ENV_BOXES:
        qminx, qminy = int(q.minx * 1000), int(q.miny * 1000)
        qmaxx, qmaxy = int(q.maxx * 1000), int(q.maxy * 1000)
        if q.minx <= q.maxx:
            lon_pred = f"(minx_m <= {qmaxx} AND maxx_m >= {qminx})"
        else:  # antimeridian: the box wraps, an (unwrapped) envelope matches either arm
            lon_pred = f"(maxx_m >= {qminx} OR minx_m <= {qmaxx})"
        arms.append(
            f"SELECT '{q.query_id}' AS query_id, event_id, minx_m, maxx_m "
            f"FROM geo_footprints WHERE {lon_pred} "
            f"AND miny_m <= {qmaxy} AND maxy_m >= {qminy}"
        )
    return f"WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL})\n" + " UNION ALL ".join(arms)


register("bbox_envelopes", q_bbox_envelopes, _bbox_env_oracle())


CQL_STRING = (
    "BBOX(geom, -74.5, 40.2, -73.5, 41.2) "
    "AND ts BETWEEN '2024-01-01 00:00:00' AND '2024-01-20 23:59:59' "
    "AND event_type IN ('click', 'purchase')"
)


def q_compound_cql(spark, sf_dir):
    """The CQL STRING front door (round 2 — CQLQuery.createOptimalQuery
    parity): the WHERE string is parsed, the BBOX clause becomes the cover
    join, BETWEEN and the IN predicate ride along as Catalyst residuals."""
    from geowave_spark.plans import cql as PC

    geo = OT.with_time_bin(
        OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id"),
        periodicity="day",
    )
    return PC.cql_query(geo, CQL_STRING, tiers=[OI.C.MAX_RES]).select(
        "event_id", "event_type", "ts", "lon", "lat"
    )


register(
    "compound_cql",
    q_compound_cql,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, event_type, ts, lon, lat FROM geo_events "
        "WHERE lon >= -74.5 AND lon <= -73.5 AND lat >= 40.2 AND lat <= 41.2 "
        "AND ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-20 23:59:59' "
        "AND event_type IN ('click', 'purchase')",
    ),
)


# ---------------------------------------------------------------------------
# Density grid (KDE-lite per-cell surface) + compound-key bias presets
# ---------------------------------------------------------------------------

DENSITY_RES = 6


def q_density_grid(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    return OS.density_grid(geo, DENSITY_RES, value_col="value")


def _density_oracle() -> str:
    cell = duck_cell_sql(DENSITY_RES)
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT {cell} AS cell_r, COUNT(*) AS n_points, "
        "CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS total_value_milli "
        f"FROM geo_events GROUP BY 1",
    )


register("density_grid", q_density_grid, _density_oracle())


def q_compound_bias(spark, sf_dir):
    geo = OT.with_compound_key(TB.geo_events(spark, sf_dir), bias="balanced")
    return geo.groupBy("time_bin", "cell_st").agg(
        F.count("*").alias("n_events")
    )


def _compound_bias_oracle() -> str:
    res = OT.BIAS_PRESETS["balanced"][0]
    cell = duck_cell_sql(res)
    # NOTE: engine uses the float-path encode for cell_st; the oracle's
    # integer path is bit-identical for milli-derived coords (both floor
    # the same exact rationals — verified by the encode parity tests)
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT date_trunc('month', ts) AS time_bin, {cell} AS cell_st, "
        "COUNT(*) AS n_events FROM geo_events GROUP BY 1, 2",
    )


register("compound_bias", q_compound_bias, _compound_bias_oracle())


# ---------------------------------------------------------------------------
# Clustering analytics (SURVEY §2.5/§3.3: DBScanMapReduce, KMeansRunner —
# iterative/distributed, not SQL-expressible → rows-only driver check;
# pytest pins both against brute-force references)
# ---------------------------------------------------------------------------

from geowave_spark.operators import clustering as OC  # noqa: E402


DBSCAN_EPS = 50
DBSCAN_MIN_PTS = 5


def q_dbscan(spark, sf_dir):
    geo = TB.geo_events(spark, sf_dir)
    return OC.dbscan(geo, eps_milli=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)


def _dbscan_oracle() -> str:
    """Exact mirror of grid-DBSCAN: same 3x3-cell candidate generation,
    same core rule (self-inclusive degree), components via a recursive-CTE
    transitive closure over core-core edges, border points labeled by min
    core-neighbor cluster."""
    res = 0
    while (CE.LAT_SPAN_MILLI >> (res + 1)) >= DBSCAN_EPS and res < 20:
        res += 1
    n = 1 << res

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    dlon = "LEAST(ABS(nb.px - p.px), 360000 - ABS(nb.px - p.px))"
    return f"""
WITH RECURSIVE geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS (
  SELECT event_id AS pid, lon_milli AS px, lat_milli AS py,
         {idiv(f"(lon_milli + 180000) * {n}", "360000")} AS gx,
         {idiv(f"(lat_milli + 90000) * {n}", "180000")} AS gy
  FROM geo_events
),
nb AS (
  SELECT pid, px, py, (gx + dx.v + {n}) % {n} AS nx, gy + dy.v AS ny
  FROM pts
  CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
  CROSS JOIN (VALUES (-1), (0), (1)) dy(v)
  WHERE gy + dy.v >= 0 AND gy + dy.v < {n}
),
pairs AS (
  SELECT DISTINCT nb.pid, p.pid AS qid
  FROM nb JOIN pts p ON p.gx = nb.nx AND p.gy = nb.ny
  WHERE {dlon} * {dlon} + (nb.py - p.py) * (nb.py - p.py)
        <= {DBSCAN_EPS ** 2}
),
core AS (SELECT pid FROM pairs GROUP BY pid HAVING COUNT(*) >= {DBSCAN_MIN_PTS}),
cp AS (
  SELECT p.pid, p.qid FROM pairs p
  JOIN core a ON a.pid = p.pid JOIN core b ON b.pid = p.qid
  WHERE p.pid <> p.qid
),
comp(pid, lbl) AS (
  SELECT pid, pid FROM core
  UNION
  SELECT cp.pid, c.lbl FROM comp c JOIN cp ON cp.qid = c.pid
),
labels AS (SELECT pid, MIN(lbl) AS cluster FROM comp GROUP BY pid),
border AS (
  SELECT p.pid, MIN(l.cluster) AS cluster
  FROM pairs p
  JOIN core c ON c.pid = p.qid
  JOIN labels l ON l.pid = p.qid
  WHERE p.pid NOT IN (SELECT pid FROM core)
  GROUP BY p.pid
)
SELECT pid AS event_id, cluster FROM labels
UNION ALL
SELECT pid AS event_id, cluster FROM border
"""


register("dbscan", q_dbscan, _dbscan_oracle())


KMEANS_K = 5
KMEANS_MAX_ITER = 10


def q_kmeans(spark, sf_dir):
    geo = TB.geo_events(spark, sf_dir)
    return OC.kmeans(geo, k=KMEANS_K, max_iter=KMEANS_MAX_ITER)


def _kmeans_oracle(k: int = KMEANS_K, max_iter: int = KMEANS_MAX_ITER) -> str:
    """Bit-exact SQL replay of the fixed-point Lloyd kmeans: farthest-point
    seeding (k unrolled argmax CTEs) then max_iter unrolled assign/update
    rounds.  Exactness hinges (operators/clustering.py): BIGINT milli
    coords; packed argmin key d2*KM_ENC+cluster (ties → smaller cluster);
    half-up integer means on +KM_OFF-shifted sums so DuckDB's truncating
    ``//`` equals Python's floor ``//``; empty clusters keep the previous
    centroid (LEFT JOIN + COALESCE).  The engine may break early at a
    fixed point; extra unrolled rounds are then no-ops, so both agree.
    Every chained CTE is MATERIALIZED: c{t} is referenced twice
    (a{t+1} and c{t+1}), so default inlining would blow up 2^max_iter."""
    from geowave_spark.operators.clustering import KM_ENC, KM_OFF

    parts = [
        f"WITH geo_events AS ({TB.GEO_EVENTS_SQL}),",
        "pts AS MATERIALIZED (\n"
        "  SELECT event_id AS pid,\n"
        "         CAST(lon_milli AS BIGINT) AS px, CAST(lat_milli AS BIGINT) AS py\n"
        "  FROM geo_events\n"
        "),",
        "s0 AS MATERIALIZED (SELECT px AS cx, py AS cy FROM pts ORDER BY pid LIMIT 1),",
    ]
    for i in range(1, k):
        terms = ", ".join(
            f"(p.px - s{j}.cx)*(p.px - s{j}.cx) + (p.py - s{j}.cy)*(p.py - s{j}.cy)"
            for j in range(i)
        )
        nd = f"LEAST({terms})" if i > 1 else terms
        froms = ", ".join(["pts p"] + [f"s{j}" for j in range(i)])
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT p.px AS cx, p.py AS cy FROM {froms}\n"
            f"  ORDER BY {nd} DESC, p.pid ASC LIMIT 1),"
        )
    union = " UNION ALL ".join(
        f"SELECT {i} AS cluster, cx, cy FROM s{i}" for i in range(k)
    )
    parts.append(f"c0 AS MATERIALIZED ({union}),")
    for t in range(1, max_iter + 1):
        parts.append(
            f"a{t} AS MATERIALIZED (\n"
            f"  SELECT p.pid,  p.px, p.py,\n"
            f"         CAST(MIN(((p.px - c.cx)*(p.px - c.cx)"
            f" + (p.py - c.cy)*(p.py - c.cy)) * {KM_ENC} + c.cluster)"
            f" % {KM_ENC} AS INTEGER) AS cluster\n"
            f"  FROM pts p CROSS JOIN c{t - 1} c\n"
            f"  GROUP BY p.pid, p.px, p.py\n"
            f"){',' if t < max_iter else ''}"
        )
        if t < max_iter:
            parts.append(
                f"c{t} AS MATERIALIZED (\n"
                f"  SELECT prev.cluster,\n"
                f"         COALESCE(agg.cx, prev.cx) AS cx,\n"
                f"         COALESCE(agg.cy, prev.cy) AS cy\n"
                f"  FROM c{t - 1} prev LEFT JOIN (\n"
                f"    SELECT cluster,\n"
                f"           CAST((2*SUM(px + {KM_OFF}) + COUNT(*))"
                f" // (2*COUNT(*)) AS BIGINT) - {KM_OFF} AS cx,\n"
                f"           CAST((2*SUM(py + {KM_OFF}) + COUNT(*))"
                f" // (2*COUNT(*)) AS BIGINT) - {KM_OFF} AS cy\n"
                f"    FROM a{t} GROUP BY cluster\n"
                f"  ) agg ON agg.cluster = prev.cluster\n"
                f"),"
            )
    parts.append(f"SELECT pid AS event_id, cluster FROM a{max_iter}")
    return "\n".join(parts)


register("kmeans", q_kmeans, _kmeans_oracle())


def q_cluster_hulls(spark, sf_dir):
    """DBSCAN clusters → convex + concave hull geometries
    (GeometryHullTool analogue incl. the Park & Oh concave dig at the
    reference's concaveThreshold=1.8; wkb columns dropped for the driver
    compare — binary)."""
    geo = TB.geo_events(spark, sf_dir)
    labels = OC.dbscan(geo, eps_milli=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)
    return OC.cluster_hulls(labels, geo, concave_threshold=1.8).select(
        "cluster", "n_points", "n_vertices", "area2_milli",
        "concave_n_vertices", "concave_area2_milli",
    )


register("cluster_hulls", q_cluster_hulls)  # hulls not SQL-expressible;
# pytest pins the monotone chain against brute force (test_clustering.py)


# ---------------------------------------------------------------------------
# CRS query support (GeometryUtils CRS transforms / CustomCRS ITs): a query
# envelope given in Web Mercator metres is transformed driver-side to the
# index CRS, then planned normally.  Both engines see the identical
# transformed literals (computed once here), so the check is exact.
# ---------------------------------------------------------------------------

from geowave_spark.functions import crs as CRS  # noqa: E402

# NYC box in EPSG:3857 metres
_CRS_BOX_3857 = (-8_292_000.0, 4_900_000.0, -8_180_000.0, 5_035_000.0)
CRS_BOX_4326 = CRS.transform_box(*_CRS_BOX_3857, "EPSG:3857")


def q_crs_bbox(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    minx, miny, maxx, maxy = CRS_BOX_4326
    q = P.BoxQuery("crs_nyc", minx, miny, maxx, maxy)
    return OB.query_bbox(geo, [q], tiers=[OI.C.MAX_RES]).select(
        "event_id", "lon", "lat"
    )


register(
    "crs_bbox_3857",
    q_crs_bbox,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"SELECT event_id, lon, lat FROM geo_events "
        f"WHERE lon >= {CRS_BOX_4326[0]!r} AND lon <= {CRS_BOX_4326[2]!r} "
        f"AND lat >= {CRS_BOX_4326[1]!r} AND lat <= {CRS_BOX_4326[3]!r}",
    ),
)


# ---------------------------------------------------------------------------
# Dataset-to-dataset spatial join (the BASELINE metric's general form:
# large × large, sort-merge on cell keys — no broadcast side)
# ---------------------------------------------------------------------------

from geowave_spark.operators import join as OJ  # noqa: E402


def _footprint_spec_tiers() -> list[int]:
    """Occupied tiers DERIVED from the footprint spec constants (half
    extents {32..1024} milli), not a hardcoded literal: a world-box-clamped
    envelope's span lies in [half, 2*half], so its tier-rule tier lies in
    {tier(2*half), tier(half)} — evaluate the same kernel the indexer uses
    over both endpoints.  A spec change can therefore never silently drop
    envelopes at unlisted tiers (the round-2 hardcoded range(6,12) hazard)."""
    import numpy as np

    from geowave_spark.functions import cells as C

    exts = sorted({e for h in (32, 64, 128, 256, 512, 1024) for e in (h, 2 * h)})
    arr = np.asarray(exts, dtype=np.int64)
    return sorted({int(t) for t in C.tier_select_extent_milli(arr, arr)})


def q_spatial_join(spark, sf_dir):
    pts = TB.geo_events(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lon", "lat", "lon_milli", "lat_milli"
    )
    envs = TB.geo_footprints(spark, sf_dir).select(
        F.col("event_id").alias("env_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    # occupied tiers from the footprint table SPEC — stats-hint equivalent,
    # no discovery scan (the production path reads _stats/tier_counts)
    return OJ.points_in_envelopes_join(
        pts, envs, env_tiers=_footprint_spec_tiers()
    ).select("point_id", "env_id")


register(
    "spatial_join",
    q_spatial_join,
    f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL})
SELECT p.event_id AS point_id, f.event_id AS env_id
FROM geo_events p JOIN geo_footprints f
  ON p.lon_milli >= f.minx_m AND p.lon_milli <= f.maxx_m
 AND p.lat_milli >= f.miny_m AND p.lat_milli <= f.maxy_m
""",
)


def q_value_histogram(spark, sf_dir):
    geo = TB.geo_events(spark, sf_dir)
    return ST.fixed_bin_histogram(geo, "value", lo=0.0, hi=100.0, nbins=32)


register(
    "value_histogram",
    q_value_histogram,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT CAST(least(greatest(floor((CAST(value AS DOUBLE) - 0.0) / 100.0 * 32), 0), 31) AS INTEGER) AS bin, "
        "COUNT(*) AS n FROM geo_events GROUP BY 1",
    ),
)


# ---------------------------------------------------------------------------
# Semi-structured residual predicates: JSON property extraction + agg.
# The reference has NO map/JSON type (SURVEY §1.2) — this surface is a
# Spark-native extension its CQL attribute filters can't express.
# ---------------------------------------------------------------------------


def q_json_props(spark, sf_dir):
    ev = TB.load_tables(spark, sf_dir, names=("events",))["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
    )


register(
    "json_props",
    q_json_props,
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
    "CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k, "
    "CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k "
    "FROM events GROUP BY event_type",
)


# ---------------------------------------------------------------------------
# Format ingest plugins (SURVEY §2.2, reference extensions/formats/*):
# distributed format ROUND TRIPS — the engine renders real on-disk format
# files from the events derivation, reads them back through the format
# reader, and the oracle replays the projection directly.  Any parse bug,
# column-position slip, or precision loss in the codec path = red row.
#
# These live in the EXTRA registry: the driver's correctness gate checks at
# most 50 queries (round 2 lost the 51st), and the primary roster is full —
# extras get the SAME oracle-exact comparison from the local pytest sweep
# (tests/test_oracles_all.py) instead of a driver row.
# ---------------------------------------------------------------------------

from geowave_spark.sources import formats as FMT  # noqa: E402

EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict[str, str] = {}


def register_extra(name: str, fn, oracle: str | None = None) -> None:
    EXTRA_QUERIES[name] = fn
    if oracle is not None:
        EXTRA_ORACLES[name] = oracle


register_extra("tile_quadkeys", q_tile_quadkeys, _tile_quadkeys_oracle_sql())


def _mtext(m: int) -> str:
    """Python twin of :func:`_milli_text` (one definition for every format
    render kernel — the parse-back-exactness invariant lives HERE and in
    the column expression below, nowhere else)."""
    return f"{'-' if m < 0 else ''}{abs(m) // 1000}.{abs(m) % 1000:03d}"


def _milli_text(col):
    """Exact decimal text for a milli-degree integer column ("-73.985"):
    integer-only rendering, so parse-back → ×1000 → round is the identity."""
    a = F.abs(col)
    return F.concat(
        F.when(col < 0, F.lit("-")).otherwise(F.lit("")),
        F.floor(a / 1000).cast("string"),
        F.lit("."),
        F.lpad((a % 1000).cast("string"), 3, "0"),
    )


def q_gdelt_ingest(spark, sf_dir):
    """GDELT TSV round trip: events → 58-column TSV lines (distributed
    text write) → read_gdelt → typed features.  Exercises the reader's
    positional extraction, date parse, geo filter, and numeric casts
    end-to-end (GDELTIngestPlugin.java:228-346 parity)."""
    import tempfile

    geo = TB.geo_events(spark, sf_dir)
    lines = geo.select(
        FMT.gdelt_line_col(
            {
                FMT.GDELT_EVENT_ID: F.col("event_id"),
                FMT.GDELT_DATE: F.date_format("ts", "yyyyMMdd"),
                FMT.GDELT_ACTOR1_NAME: F.col("event_type"),
                FMT.GDELT_ACTOR2_NAME: F.concat(F.lit("U"), F.col("user_id")),
                FMT.GDELT_NUM_MENTIONS: (F.col("user_id") % 100).cast("int"),
                FMT.GDELT_NUM_SOURCES: (F.col("user_id") % 10).cast("int"),
                FMT.GDELT_NUM_ARTICLES: (F.col("event_id") % 1000).cast("int"),
                FMT.GDELT_AVG_TONE: F.round(F.col("value") * 100).cast("long"),
                FMT.GDELT_GEO_TYPE: F.lit(1),
                FMT.GDELT_COUNTRY_CC: F.upper(F.substring("event_type", 1, 2)),
                FMT.GDELT_LAT: _milli_text(F.col("lat_milli")),
                FMT.GDELT_LON: _milli_text(F.col("lon_milli")),
                FMT.GDELT_SOURCE_URL: F.concat(
                    F.lit("http://src.example/"), F.col("event_id")
                ),
            }
        ).alias("value")
    )
    d = tempfile.mkdtemp(prefix="gw_gdelt_")
    lines.write.mode("overwrite").text(d)
    feats = FMT.read_gdelt(spark, d)
    return feats.select(
        "event_id",
        "ts",
        "actor1",
        "actor2",
        "num_mentions",
        "num_sources",
        "num_articles",
        F.col("avg_tone").cast("long").alias("tone_c"),
        "country_code",
        F.round(F.col("lon") * 1000).cast("long").alias("lon_milli"),
        F.round(F.col("lat") * 1000).cast("long").alias("lat_milli"),
        "source_url",
    )


register_extra(
    "gdelt_ingest",
    q_gdelt_ingest,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS ts, "
        "event_type AS actor1, 'U' || CAST(user_id AS VARCHAR) AS actor2, "
        "CAST(user_id % 100 AS INTEGER) AS num_mentions, "
        "CAST(user_id % 10 AS INTEGER) AS num_sources, "
        "CAST(event_id % 1000 AS INTEGER) AS num_articles, "
        "CAST(round(value * 100) AS BIGINT) AS tone_c, "
        "upper(substr(event_type, 1, 2)) AS country_code, "
        "lon_milli, lat_milli, "
        "'http://src.example/' || CAST(event_id AS VARCHAR) AS source_url "
        "FROM geo_events",
    ),
)


GPX_BUCKETS = 32


def q_gpx_tracks(spark, sf_dir):
    """GPX XML round trip: events grouped into per-user tracks → GPX docs
    (one file per bucket, written distributed) → read_gpx → gpx_tracks
    summary aggregation (GpxUtils.java:238-300 track feature parity:
    Name/Start/End/Duration/NumberPoints + bbox)."""
    import os
    import tempfile

    import pandas as pd

    from geowave_spark.sources.formats import gpx_doc_xml

    geo = TB.geo_events(spark, sf_dir).withColumn(
        "bucket", (F.col("user_id") % GPX_BUCKETS).cast("int")
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        tracks = []
        for uid, g in pdf.groupby("user_id", sort=True):
            pts = [
                (
                    _mtext(int(la)),
                    _mtext(int(lo)),
                    None,
                    t.strftime("%Y-%m-%dT%H:%M:%S"),
                )
                for lo, la, t in zip(g["lon_milli"], g["lat_milli"], g["ts"])
            ]
            tracks.append((f"u{uid}", [(p[0], p[1], p[2], p[3]) for p in pts]))
        xml = gpx_doc_xml(tracks)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "xml": [xml]})

    d = tempfile.mkdtemp(prefix="gw_gpx_")
    (
        geo.select("bucket", "user_id", "event_id", "ts", "lon_milli", "lat_milli")
        .groupBy("bucket")
        .applyInPandas(render, "bucket int, xml string")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .text(d)
    )
    pts = FMT.read_gpx(spark, os.path.join(d, "bucket=*", "part-*"))
    tr = FMT.gpx_tracks(pts)
    return tr.select(
        F.regexp_extract("name", r"u(\d+)", 1).cast("long").alias("user_id"),
        "n_points",
        "start_ts",
        "end_ts",
        "duration_ms",
        F.round(F.col("minx") * 1000).cast("long").alias("minx_m"),
        F.round(F.col("miny") * 1000).cast("long").alias("miny_m"),
        F.round(F.col("maxx") * 1000).cast("long").alias("maxx_m"),
        F.round(F.col("maxy") * 1000).cast("long").alias("maxy_m"),
    )


register_extra(
    "gpx_tracks",
    q_gpx_tracks,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT user_id, COUNT(*) AS n_points, "
        "MIN(date_trunc('second', ts)) AS start_ts, "
        "MAX(date_trunc('second', ts)) AS end_ts, "
        "CAST(epoch_ms(MAX(date_trunc('second', ts))) - "
        "     epoch_ms(MIN(date_trunc('second', ts))) AS BIGINT) AS duration_ms, "
        "MIN(lon_milli) AS minx_m, MIN(lat_milli) AS miny_m, "
        "MAX(lon_milli) AS maxx_m, MAX(lat_milli) AS maxy_m "
        "FROM geo_events GROUP BY user_id",
    ),
)


def q_shp_roundtrip(spark, sf_dir):
    """Shapefile round trip (GeoTools-vector ingest parity): footprint
    envelopes → rectangle Polygon records + dBASE attributes, one .shp/.dbf
    shard per bucket written by the export sink → read_shapefile → envelope
    + attribute projection.  Exercises both codecs (struct-level .shp
    geometry, fixed-width .dbf attributes) and the binaryFile scan path
    end-to-end; the float64 coordinates survive binary round trip exactly,
    so the milli-degree envelope reconstruction is oracle-exact."""
    import tempfile

    from geowave_spark.sources import shapefile as SHP

    fp = TB.geo_footprints(spark, sf_dir)
    deg = lambda c: (F.col(c) / F.lit(1000.0)).cast("double")  # noqa: E731
    ring = F.array(
        F.array(deg("minx_m"), deg("miny_m")),
        F.array(deg("maxx_m"), deg("miny_m")),
        F.array(deg("maxx_m"), deg("maxy_m")),
        F.array(deg("minx_m"), deg("maxy_m")),
        F.array(deg("minx_m"), deg("miny_m")),
    )
    shaped = fp.select(
        (F.col("event_id") % 32).cast("int").alias("bucket"),
        F.struct(
            F.lit(SHP.SHP_POLYGON).alias("t"), F.array(ring).alias("parts")
        ).alias("shape"),
        "event_id",
        F.col("native_level").cast("long").alias("nat_level"),
    )
    d = tempfile.mkdtemp(prefix="gw_shp_")
    SHP.write_shapefile_shards(
        shaped,
        d,
        fields=[("event_id", "N", 18, 0), ("nat_level", "N", 4, 0)],
        attr_cols=["event_id", "nat_level"],
    )
    feats = SHP.read_shapefile(spark, f"{d}/*.shp")
    return feats.select(
        F.get_json_object("attrs_json", "$.event_id").cast("long").alias("event_id"),
        "shape_type",
        "n_parts",
        "n_points",
        F.round(F.col("minx") * 1000).cast("long").alias("minx_m"),
        F.round(F.col("miny") * 1000).cast("long").alias("miny_m"),
        F.round(F.col("maxx") * 1000).cast("long").alias("maxx_m"),
        F.round(F.col("maxy") * 1000).cast("long").alias("maxy_m"),
        F.get_json_object("attrs_json", "$.nat_level").cast("long").alias("native_level"),
    )


register_extra(
    "shp_roundtrip",
    q_shp_roundtrip,
    TB.oracle_with(
        TB.GEO_FOOTPRINTS_SQL,
        "geo_footprints",
        "SELECT event_id, 5 AS shape_type, 1 AS n_parts, 5 AS n_points, "
        "minx_m, miny_m, maxx_m, maxy_m, "
        "CAST(native_level AS BIGINT) AS native_level "
        "FROM geo_footprints",
    ),
)


GEOTIFF_MOD = 50  # every 50th footprint becomes a scene file


def q_geotiff_tiles(spark, sf_dir):
    """GeoTIFF round trip (GeoTools-raster / Landsat8 ingest parity):
    footprint-georeferenced procedural scenes → GeoTIFF files (one per
    scene, written by the tasks) → read_geotiff → envelope + pixel-sum
    projection.  Scenes deterministically cycle the real-world layouts —
    none/LZW/deflate/packbits compression, predictor 2 on LZW/deflate
    (what actual Landsat ships), both byte orders, multi-strip AND the
    tiled (tags 322-325, COG-style) blocking — so the oracle exactness
    covers every codec and layout path; decoded pixels are identical
    regardless, so the SQL replay is unchanged."""
    import os
    import tempfile

    fp = TB.geo_footprints(spark, sf_dir).filter(
        F.col("event_id") % GEOTIFF_MOD == 0
    )
    d = tempfile.mkdtemp(prefix="gw_tif_")

    def write_scenes(rows):
        from geowave_spark.sources import tiff as TIF
        from geowave_spark.sources.synthetic import pixels_for

        layouts = [  # (compression, predictor, tile_size) — cycled per scene
            (TIF.COMP_NONE, 1, None),
            (TIF.COMP_LZW, 2, None),
            (TIF.COMP_DEFLATE, 2, (16, 16)),  # tiled COG-style blocking
            (TIF.COMP_PACKBITS, 1, None),
            (TIF.COMP_DEFLATE_OLD, 1, None),
            (TIF.COMP_LZW, 2, (16, 16)),
        ]
        for r in rows:
            ev = int(r.event_id)
            pix = pixels_for(ev % 256, 32, 32)
            minx, miny = r.minx_m / 1000.0, r.miny_m / 1000.0
            maxx, maxy = r.maxx_m / 1000.0, r.maxy_m / 1000.0
            comp, pred, tile = layouts[(ev // GEOTIFF_MOD) % len(layouts)]
            buf = TIF.encode_geotiff(
                pix, (minx, maxy), ((maxx - minx) / 32.0, (maxy - miny) / 32.0),
                compression=comp, predictor=pred, tile_size=tile,
                rows_per_strip=8 if (ev // GEOTIFF_MOD) % 2 else None,
                byteorder="MM" if (ev // GEOTIFF_MOD) % 3 == 1 else "II",
            )
            with open(os.path.join(d, f"ev{ev:012d}.tif"), "wb") as fh:
                fh.write(buf)

    fp.select("event_id", "minx_m", "miny_m", "maxx_m", "maxy_m").foreachPartition(
        write_scenes
    )

    from geowave_spark.sources import tiff as TIF

    feats = TIF.read_geotiff(spark, f"{d}/*.tif")
    return feats.select(
        F.regexp_extract("file", r"ev(\d+)\.tif", 1).cast("long").alias("event_id"),
        "w",
        "h",
        "bands",
        "px_sum",
        F.round(F.col("minx") * 1000).cast("long").alias("minx_m"),
        F.round(F.col("miny") * 1000).cast("long").alias("miny_m"),
        F.round(F.col("maxx") * 1000).cast("long").alias("maxx_m"),
        F.round(F.col("maxy") * 1000).cast("long").alias("maxy_m"),
    )


register_extra(
    "geotiff_tiles",
    q_geotiff_tiles,
    TB.oracle_with(
        TB.GEO_FOOTPRINTS_SQL,
        "geo_footprints",
        f"""
SELECT s.event_id, 32 AS w, 32 AS h, 1 AS bands,
       CAST(px.px_sum AS BIGINT) AS px_sum,
       s.minx_m, s.miny_m, s.maxx_m, s.maxy_m
FROM (SELECT event_id, minx_m, miny_m, maxx_m, maxy_m
      FROM geo_footprints WHERE event_id % {GEOTIFF_MOD} = 0) s
JOIN (
  SELECT f.event_id,
         SUM(((f.event_id % 256) * 31 + x.x * 7 + y.y * 13) % 256) AS px_sum
  FROM geo_footprints f,
       LATERAL unnest(generate_series(0, 31)) AS x(x),
       LATERAL unnest(generate_series(0, 31)) AS y(y)
  WHERE f.event_id % {GEOTIFF_MOD} = 0
  GROUP BY f.event_id
) px ON s.event_id = px.event_id
""",
    ),
)


AVRO_BUCKETS = 32

AVRO_FEATURE_SCHEMA = {
    "type": "record",
    "name": "feature",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "etype", "type": ["null", "string"]},
        {"name": "lon", "type": "double"},
        {"name": "lat", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
    ],
}


def q_avro_roundtrip(spark, sf_dir):
    """Avro Object Container round trip (AvroIngestPlugin.java /
    VectorLocalExportCommand parity): geo events → avro records (one
    deflate container per bucket, written by the tasks) → read_avro →
    typed projection.  Exercises the whole binary surface — zigzag longs,
    IEEE doubles, null/string union, long arrays, deflate blocks — and
    float64 coordinates survive exactly, so the milli reconstruction is
    oracle-checked."""
    import os
    import tempfile

    import pandas as pd

    from geowave_spark.sources import avro as AV

    geo = TB.geo_events(spark, sf_dir)
    shaped = geo.select(
        (F.col("event_id") % AVRO_BUCKETS).cast("int").alias("bucket"),
        "event_id",
        F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ).alias("etype"),
        "lon",
        "lat",
        (F.col("user_id") % 5).cast("int").alias("n_tags"),
    )
    d = tempfile.mkdtemp(prefix="gw_avro_")

    def write_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("event_id")
        recs = [
            {
                "event_id": int(r.event_id),
                "etype": None if pd.isna(r.etype) else str(r.etype),
                "lon": float(r.lon),
                "lat": float(r.lat),
                "tags": [int(r.event_id) + i for i in range(int(r.n_tags))],
            }
            for r in pdf.itertuples()
        ]
        buf = AV.avro_encode(AVRO_FEATURE_SCHEMA, recs, codec="deflate")
        b = int(pdf.bucket.iloc[0])
        with open(os.path.join(d, f"b{b:03d}.avro"), "wb") as fh:
            fh.write(buf)
        return pd.DataFrame({"bucket": [b], "n": [len(recs)]})

    shaped.groupBy("bucket").applyInPandas(write_bucket, "bucket int, n long").collect()

    rec = F.from_json(
        F.col("record_json"),
        "struct<event_id:bigint, etype:string, lon:double, lat:double, tags:array<bigint>>",
    ).alias("r")
    feats = AV.read_avro(spark, f"{d}/*.avro").select(rec)
    return feats.select(
        F.col("r.event_id").alias("event_id"),
        F.col("r.etype").alias("etype"),
        F.round(F.col("r.lon") * 1000).cast("long").alias("lon_milli"),
        F.round(F.col("r.lat") * 1000).cast("long").alias("lat_milli"),
        F.size("r.tags").alias("n_tags"),
        F.aggregate(
            "r.tags", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_tags"),
    )


register_extra(
    "avro_roundtrip",
    q_avro_roundtrip,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, "
        "CASE WHEN user_id % 7 = 0 THEN NULL ELSE event_type END AS etype, "
        "lon_milli, lat_milli, "
        "CAST(user_id % 5 AS INTEGER) AS n_tags, "
        "CAST((user_id % 5) * event_id "
        "     + (user_id % 5) * ((user_id % 5) - 1) // 2 AS BIGINT) AS sum_tags "
        "FROM geo_events",
    ),
)


STANAG_BUCKETS = 32


def q_stanag_tracks(spark, sf_dir):
    """STANAG 4676 round trip (Stanag4676IngestPlugin parity): geo events
    grouped into per-user tracks → TrackMessage XML docs (one per bucket,
    written by the tasks) → read_stanag4676 → per-track aggregation over
    the point features the reference's IngestMessageHandler extracts
    (uuid/number/status/classification/time/position/speed).  Coordinates
    ride as exact decimal text and speeds as small integers, so the whole
    encode→decode→aggregate path replays exactly in SQL."""
    import os
    import tempfile

    import pandas as pd

    from geowave_spark.sources.formats import stanag_doc_xml

    geo = TB.geo_events(spark, sf_dir).withColumn(
        "bucket", (F.col("user_id") % STANAG_BUCKETS).cast("int")
    )

    _STATUS = ["CONFIRMED", "TENTATIVE"]
    _CLS = ["UNCLASSIFIED", "NATO_RESTRICTED", "NATO_SECRET"]

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        tracks = []
        for uid, g in pdf.groupby("user_id", sort=True):
            uid = int(uid)
            pts = [
                (
                    f"p{int(ev)}",
                    t.strftime("%Y-%m-%dT%H:%M:%S") + ".000Z",
                    _mtext(int(la)),
                    _mtext(int(lo)),
                    int(ev) % 97,
                    int(ev) % 360,
                )
                for ev, lo, la, t in zip(
                    g["event_id"], g["lon_milli"], g["lat_milli"], g["ts"]
                )
            ]
            tracks.append(
                (f"u{uid}", f"T{uid}", _STATUS[uid % 2], _CLS[uid % 3], pts)
            )
        xml = stanag_doc_xml(tracks)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "xml": [xml]})

    d = tempfile.mkdtemp(prefix="gw_stanag_")
    (
        geo.select("bucket", "user_id", "event_id", "ts", "lon_milli", "lat_milli")
        .groupBy("bucket")
        .applyInPandas(render, "bucket int, xml string")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .text(d)
    )
    pts = FMT.read_stanag4676(spark, os.path.join(d, "bucket=*", "part-*"))
    p = pts.withColumn(
        "ts", F.to_timestamp("time_raw", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    )
    return p.groupBy(
        F.regexp_extract("track_number", r"T(\d+)", 1).cast("long").alias("user_id"),
        "track_status",
        "track_classification",
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(F.min("lon") * 1000).cast("long").alias("minx_m"),
        F.round(F.min("lat") * 1000).cast("long").alias("miny_m"),
        F.round(F.max("lon") * 1000).cast("long").alias("maxx_m"),
        F.round(F.max("lat") * 1000).cast("long").alias("maxy_m"),
        F.sum("speed").cast("long").alias("sum_speed"),
    )


register_extra(
    "stanag_tracks",
    q_stanag_tracks,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT user_id, "
        "CASE WHEN user_id % 2 = 0 THEN 'CONFIRMED' ELSE 'TENTATIVE' END "
        "  AS track_status, "
        "CASE user_id % 3 WHEN 0 THEN 'UNCLASSIFIED' "
        "  WHEN 1 THEN 'NATO_RESTRICTED' ELSE 'NATO_SECRET' END "
        "  AS track_classification, "
        "COUNT(*) AS n_points, "
        "MIN(date_trunc('second', ts)) AS start_ts, "
        "MAX(date_trunc('second', ts)) AS end_ts, "
        "MIN(lon_milli) AS minx_m, MIN(lat_milli) AS miny_m, "
        "MAX(lon_milli) AS maxx_m, MAX(lat_milli) AS maxy_m, "
        "CAST(SUM(event_id % 97) AS BIGINT) AS sum_speed "
        "FROM geo_events GROUP BY user_id",
    ),
)


PHASH_GROUPS = 40


def _planted_phash():
    """A 60-bit perceptual-hash stand-in with PLANTED near-dup structure
    (the synthetic images table's fnv phash is uniform — no near pairs to
    find): docs in the same group share an md5-derived base key; each doc
    flips at most one group-dependent bit, so intra-group pairs sit at
    hamming ≤ 2 and cross-group pairs at ~30.  Same integer derivation on
    both engines."""
    from geowave_spark.operators.text import h64_col

    base = h64_col(F.concat(F.lit("pg"), (F.col("doc_id") % PHASH_GROUPS).cast("string")))
    flip = F.when(F.col("doc_id") % 5 == 0, F.lit(0).cast("long")).otherwise(
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("doc_id") % 59).cast("int")
        )
    )
    return base.bitwiseXOR(flip)


def q_phash_pairs(spark, sf_dir):
    """Image phash near-dup: the generic banded hamming self-join
    (dedup.hamming_pairs — shared with text simhash) over the input table's
    64-bit perceptual-hash column shape."""
    docs = _docs(spark, sf_dir).select("doc_id", _planted_phash().alias("phash"))
    return OD.hamming_pairs(docs, "phash", "doc_id")


def _phash_pairs_oracle() -> str:
    from geowave_spark.operators.text import duck_h64

    base = duck_h64(f"'pg' || CAST(doc_id % {PHASH_GROUPS} AS VARCHAR)")
    return f"""
WITH ph AS (
  SELECT doc_id,
         xor({base},
             CASE WHEN doc_id % 5 = 0 THEN 0
                  ELSE (1::BIGINT << CAST(doc_id % 59 AS INTEGER)) END) AS phash
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM ph a JOIN ph b
  ON a.doc_id % {PHASH_GROUPS} = b.doc_id % {PHASH_GROUPS}
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""


register_extra("phash_pairs", q_phash_pairs, _phash_pairs_oracle())


def q_embed_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN: centroid-bucketed approximate top-k — the
    second scale path next to hyperplane LSH; exact oracle despite being
    an approximate operator (deterministic integer assignment/probing)."""
    return OE.ivf_topk(_emb(spark, sf_dir))


register_extra("embed_ivf_topk", q_embed_ivf_topk, OE.ivf_topk_oracle())


def q_ann_recall(spark, sf_dir):
    """Per-query recall@k + MRR of the IVF approximate top-k against the
    exact scan — the measured evidence behind the n_probes/n_centroids
    dial (an approximate index is only deployable with its recall
    number)."""
    return OE.ann_recall(_emb(spark, sf_dir))


register_extra("ann_recall", q_ann_recall, OE.ann_recall_oracle())


# ---------------------------------------------------------------------------
# XZ-order extent index (XZOrderSFC encode + getQueryRanges; SURVEY §2.1):
# the oracle replays the ENTIRE integer encode — level selection, anchor
# coords, code enumeration — plus the query residual in DuckDB, so a third
# engine checks the codes the Spark plan joined on, not just the pairs.
# ---------------------------------------------------------------------------

XZ_BOXES = [
    ("xz_nyc", -75_000, 40_000, -73_000, 42_000),
    ("xz_europe", -5_000, 44_000, 8_000, 52_000),
    ("xz_wide", -170_000, -20_000, 40_000, 20_000),
    ("xz_sliver", 0, -90_000, 999, 89_999),
    ("xz_point", 12_345, -45_678, 12_345, -45_678),
]


def q_xz_bbox(spark, sf_dir):
    """BBOX queries over XZ-keyed event footprints: ancestor-code equi-join
    (provably dedup-free) + exact milli-int intersect residual; output
    carries the extent's own XZ code so the oracle checks the encode."""
    from geowave_spark.operators import xz as OXZ

    fp = TB.geo_footprints(spark, sf_dir)
    idx = OXZ.index_extents_xz(fp)
    return OXZ.query_bbox_xz(idx, XZ_BOXES).select("query_id", "event_id", "xz")


def _xz_bbox_oracle() -> str:
    from geowave_spark.functions import cells as C

    g, DX, DY = C.XZ_G, C.LON_SPAN_MILLI, C.LAT_SPAN_MILLI
    fits = " + ".join(
        f"(CASE WHEN x1*{1 << l} <= ((x0*{1 << l})//{DX} + 2)*{DX} "
        f"AND y1*{1 << l} <= ((y0*{1 << l})//{DY} + 2)*{DY} "
        f"THEN 1 ELSE 0 END)"
        for l in range(1, g + 1)
    )
    code = " + ".join(
        f"(CASE WHEN lvl >= {i} THEN "
        f"(((ix >> GREATEST(lvl-{i}, 0)) & 1)*2 + "
        f"((iy >> GREATEST(lvl-{i}, 0)) & 1))*{C.xz_step(i, g)} + 1 "
        f"ELSE 0 END)"
        for i in range(1, g + 1)
    )
    boxes = ", ".join(
        f"('{qid}', {x0}::BIGINT, {y0}::BIGINT, {x1}::BIGINT, {y1}::BIGINT)"
        for qid, x0, y0, x1, y1 in XZ_BOXES
    )
    return f"""
WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL}),
env AS (
  SELECT event_id, minx_m, miny_m, maxx_m, maxy_m,
         CAST(minx_m + 180000 AS BIGINT) AS x0,
         CAST(maxx_m + 180000 AS BIGINT) AS x1,
         CAST(miny_m + 90000 AS BIGINT) AS y0,
         CAST(maxy_m + 90000 AS BIGINT) AS y1
  FROM geo_footprints
),
lv AS (SELECT *, CAST({fits} AS BIGINT) AS lvl FROM env),
gxy AS (
  SELECT *,
         LEAST((x0*(1::BIGINT << CAST(lvl AS INTEGER)))//{DX},
               (1::BIGINT << CAST(lvl AS INTEGER)) - 1) AS ix,
         LEAST((y0*(1::BIGINT << CAST(lvl AS INTEGER)))//{DY},
               (1::BIGINT << CAST(lvl AS INTEGER)) - 1) AS iy
  FROM lv
),
coded AS (SELECT *, CAST({code} AS BIGINT) AS xz FROM gxy),
q(query_id, qx0, qy0, qx1, qy1) AS (VALUES {boxes})
SELECT q.query_id, coded.event_id, coded.xz
FROM coded JOIN q
  ON minx_m <= qx1 AND maxx_m >= qx0 AND miny_m <= qy1 AND maxy_m >= qy0
"""


register_extra("xz_bbox", q_xz_bbox, _xz_bbox_oracle())


# ---------------------------------------------------------------------------
# Temporal joins (operators/interval.py): as-of enrichment and interval
# overlap — the 1-D twins of the spatial cover join, no reference analogue
# (its temporal support is range constraints on the compound key only).
# ---------------------------------------------------------------------------

from geowave_spark.operators import interval as OIV  # noqa: E402


def _raw_events(spark, sf_dir):
    return TB.load_tables(spark, sf_dir, names=("events",))["events"]


def q_asof_join(spark, sf_dir):
    """Point-in-time enrichment: each click gets the same user's latest
    at-or-before purchase (id, ts, value) — one union + one window, no
    fan-out (operators/interval.asof_join)."""
    ev = _raw_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("asof_value")
    )
    return OIV.asof_join(
        clicks,
        purchases,
        key="user_id",
        right_vals=("asof_value",),
    )


_ASOF_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT l.event_id, l.user_id, l.ts,
         r.event_id AS asof_id, r.ts AS asof_ts, r.value AS asof_value,
         ROW_NUMBER() OVER (
           PARTITION BY l.event_id ORDER BY r.ts DESC, r.event_id DESC
         ) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
)
SELECT event_id, user_id, ts, asof_id, asof_ts, asof_value
FROM ranked WHERE rn = 1
"""

register_extra("asof_join", q_asof_join, _ASOF_ORACLE)


SESSION_MOD = 14400  # purchase "session" length: 0..4h, hash-derived


def q_interval_join(spark, sf_dir):
    """Session attribution: every click inside a purchase's validity
    window [ts, ts + dur] (dur = hash-derived ≤ 4 h).  Bucketed cover
    join on hour buckets — dedup-free, one equi-join
    (operators/interval.interval_join)."""
    ev = _raw_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("point_id"),
        F.unix_timestamp("ts").alias("pos"),
    )
    sess = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        F.unix_timestamp("ts").alias("lo"),
        (
            F.unix_timestamp("ts")
            + (F.col("event_id") * 2654435761) % SESSION_MOD
        ).alias("hi"),
    )
    return OIV.interval_join(
        clicks, sess, bucket=3600, max_buckets=8
    )


_INTERVAL_ORACLE = f"""
WITH p AS (
  SELECT event_id AS point_id, CAST(floor(epoch(ts)) AS BIGINT) AS pos
  FROM events WHERE event_type = 'click'
),
iv AS (
  SELECT event_id AS interval_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS lo,
         CAST(floor(epoch(ts)) AS BIGINT)
           + (event_id * 2654435761) % {SESSION_MOD} AS hi
  FROM events WHERE event_type = 'purchase'
)
SELECT p.point_id, iv.interval_id, p.pos
FROM p JOIN iv ON p.pos >= iv.lo AND p.pos <= iv.hi
"""

register_extra("interval_join", q_interval_join, _INTERVAL_ORACLE)


def q_dedup_groups(spark, sf_dir):
    """End-to-end near-dup REMOVAL decision: minhash LSH pairs →
    distributed connected components (min-label, diameter-bounded
    rounds) → every document labeled (group_id, keep) with exactly one
    kept representative per group (dedup.canonicalize)."""
    docs = _docs(spark, sf_dir)
    pairs = OD.minhash_lsh_pairs(docs, engine="arrow")
    return OD.canonicalize(docs.select("doc_id"), pairs)


register_extra(
    "dedup_groups",
    q_dedup_groups,
    OD.canonicalize_oracle(OD.minhash_lsh_pairs_oracle("documents")),
)


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment: split hashed on the
    near-dup GROUP id (canonicalize output), so a near-copy of a training
    document can never land in the eval split."""
    docs = _docs(spark, sf_dir)
    pairs = OD.minhash_lsh_pairs(docs, engine="arrow")
    return OD.leakage_safe_split(OD.canonicalize(docs.select("doc_id"), pairs))


register_extra(
    "leakage_split",
    q_leakage_split,
    OD.leakage_safe_split_oracle(OD.minhash_lsh_pairs_oracle("documents")),
)


def q_polygonize(spark, sf_dir):
    """Raster→vector: contiguous occupied-region extraction from the
    res-10 density mask (operators/vectorize.polygonize_occupancy) —
    the inverse of render_point_tiles/kde (vector→raster)."""
    from geowave_spark.operators import vectorize as OV

    return OV.polygonize_occupancy(
        TB.geo_events(spark, sf_dir), res=10, min_count=2
    )


def _polygonize_oracle() -> str:
    from geowave_spark.operators import vectorize as OV

    return OV.polygonize_oracle(TB.GEO_EVENTS_SQL, res=10, min_count=2)


register_extra("polygonize", q_polygonize, _polygonize_oracle())


def q_corpus_prep(spark, sf_dir):
    """The composed training-data pipeline with an auditable per-document
    decision record: language → quality → length → exact dedup → near
    dedup (dedup.corpus_prep); stage='kept' is the training corpus."""
    return OD.corpus_prep(_docs(spark, sf_dir))


register_extra("corpus_prep", q_corpus_prep, OD.corpus_prep_oracle("documents"))


# ---------------------------------------------------------------------------
# Round 3: corpus-preparation operators (operators/corpus.py) — sequence
# packing, benchmark decontamination, repetition quality stats, PII scrub,
# mixture sampling, and cross-modal (image phash ∧ caption simhash) dedup.
# ---------------------------------------------------------------------------

from geowave_spark.operators import corpus as OCORP  # noqa: E402

DECON_MOD = 17  # every 17th doc plays the held-out benchmark


def q_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: each document's token span in the
    block-cut concatenated stream (distributed exact prefix sum — no
    global-order window)."""
    return OCORP.pack_sequences(_docs(spark, sf_dir))


register_extra(
    "pack_sequences", q_pack_sequences, OCORP.pack_sequences_oracle("documents")
)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: winnowing-fingerprint overlap between the
    training split (doc_id % 17 != 0) and the held-out probe split."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    probes = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    return OCORP.decontaminate(train, probes)


register_extra(
    "decontaminate",
    q_decontaminate,
    OCORP.decontaminate_oracle(
        f"(SELECT * FROM documents WHERE doc_id % {DECON_MOD} <> 0)",
        f"(SELECT * FROM documents WHERE doc_id % {DECON_MOD} = 0)",
    ),
)


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (top-bigram / duplicate-bigram ppm)."""
    return OCORP.repetition_stats(_docs(spark, sf_dir))


register_extra(
    "repetition_stats", q_repetition_stats, OCORP.repetition_stats_oracle("documents")
)


def _pii_text_col():
    """Deterministic PII enrichment (the synthetic corpus contains none):
    appended emails/IPs/phones derived from doc_id, identically in both
    engines, so the scrub counts are non-trivially exercised."""
    return F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"), F.lit(".com via 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"), F.lit(" or +1 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


_PII_TEXT_SQL = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '.com via 10.' "
    "|| CAST(doc_id % 256 AS VARCHAR) || '.0.' "
    "|| CAST(doc_id % 100 AS VARCHAR) || ' or +1 555-' "
    "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def q_pii_scrub(spark, sf_dir):
    """PII detect + redact over the (deterministically enriched) corpus."""
    docs = _docs(spark, sf_dir).select("doc_id", _pii_text_col().alias("text"))
    return OCORP.pii_scrub(docs)


register_extra(
    "pii_scrub",
    q_pii_scrub,
    OCORP.pii_scrub_oracle("documents", text_expr=_PII_TEXT_SQL),
)


def q_mixture_sample(spark, sf_dir):
    """Deterministic per-source mixture sampling: source srcN keeps at rate
    (N%5+1)/5 — salt-hashed doc_id, reproducible, no RNG state."""
    rates = {f"src{i}": (i % 5 + 1) / 5 for i in range(20)}
    return OCORP.mixture_sample(_docs(spark, sf_dir), rates).select("doc_id", "source")


register_extra(
    "mixture_sample",
    q_mixture_sample,
    f"""
SELECT doc_id, source FROM documents
WHERE {OTX.duck_h64("'mix1' || CAST(doc_id AS VARCHAR)")} % {OCORP.MIX_DENOM}
      < (CAST(substr(source, 4) AS INTEGER) % 5 + 1) * {OCORP.MIX_DENOM // 5}
""",
)


def q_crossmodal_pairs(spark, sf_dir):
    """Cross-modal near-dup for the image+caption input shape: pairs whose
    IMAGE phash (banded hamming self-join) AND caption simhash both match —
    the conjunctive dedup a multimodal corpus runs before training."""
    docs = _docs(spark, sf_dir)
    img = docs.select("doc_id", _planted_phash().alias("phash"))
    return OCORP.crossmodal_pairs(img, docs)


def _crossmodal_oracle() -> str:
    ip = _phash_pairs_oracle()
    tp = OD.simhash_pairs_oracle("documents")
    return f"""
WITH ip AS ({ip}), tp AS ({tp})
SELECT ip.id_a, ip.id_b,
       CAST(ip.hamming AS INTEGER) AS img_hamming,
       CAST(tp.hamming AS INTEGER) AS txt_hamming
FROM ip JOIN tp USING (id_a, id_b)
"""


register_extra("crossmodal_pairs", q_crossmodal_pairs, _crossmodal_oracle())


# ---------------------------------------------------------------------------
# Comparative (seasonal-variance) KDE — the reference's kde/compare package
# (ComparisonStatsJobRunner, ComparisonGaussianCellMapper, ComparisonCellData)
# ---------------------------------------------------------------------------

KDE_CMP_LEVELS = [4, 5]
_YEAR_US = 1704067200000000  # epoch micros of 2024-01-01 UTC
_YEAR_SECS = 31622400  # 366 days (2024 is leap)


def _season_ts_col():
    """Deterministic full-year timestamp (the synthetic events table spans
    one month; the seasonal operator needs year coverage): second-of-2024
    from the same Knuth hash the geo derivation uses."""
    h = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    return F.timestamp_micros(
        F.lit(_YEAR_US) + (h % F.lit(_YEAR_SECS)) * F.lit(1_000_000)
    )


def q_kde_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir).withColumn("ts_season", _season_ts_col())
    return OKDE.kde_compare(geo, KDE_CMP_LEVELS, ts_col="ts_season")


def _kde_compare_oracle() -> str:
    r = 3
    offs = ", ".join(
        f"({lv}, {dx}, {dy}, {OKDE.KERNEL_FP[dx + r] * OKDE.KERNEL_FP[dy + r]})"
        for lv in KDE_CMP_LEVELS
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
    )
    ppm = ", ".join(f"({i}, {v})" for i, v in enumerate(OKDE.SEASON_PPM))

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    mstart = (
        "epoch_us(make_timestamp(CAST({y} AS BIGINT), CAST({m} AS BIGINT), "
        "1, 0, 0, CAST(0 AS DOUBLE)))"
    )
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
o(lvl, dx, dy, w) AS (VALUES {offs}),
ppm(t_cent, v) AS (VALUES {ppm}),
tsd AS (
  SELECT lon_milli, lat_milli,
         make_timestamp({_YEAR_US}
           + (((event_id * 2654435761) % 4294967296) % {_YEAR_SECS})
             * 1000000) AS ts
  FROM geo_events
),
season AS (
  SELECT lon_milli, lat_milli,
         (month(ts) <= 3 OR month(ts) >= 10) AS wtr,
         CASE WHEN month(ts) <= 3
                THEN epoch_us(ts) - {mstart.format(y="year(ts)", m="1")}
              WHEN month(ts) >= 10
                THEN {mstart.format(y="year(ts) + 1", m="1")} - epoch_us(ts)
              WHEN month(ts) = 4
                THEN {mstart.format(y="year(ts)", m="5")} - epoch_us(ts)
              WHEN month(ts) = 9
                THEN epoch_us(ts) - {mstart.format(y="year(ts)", m="9")}
              ELSE CAST(0 AS BIGINT) END AS delta,
         CASE WHEN month(ts) <= 3
                THEN {mstart.format(y="year(ts)", m="4")}
                     - {mstart.format(y="year(ts)", m="1")}
              WHEN month(ts) >= 10
                THEN {mstart.format(y="year(ts) + 1", m="1")}
                     - {mstart.format(y="year(ts)", m="10")}
              WHEN month(ts) = 4
                THEN {mstart.format(y="year(ts)", m="5")}
                     - {mstart.format(y="year(ts)", m="4")}
              WHEN month(ts) = 9
                THEN {mstart.format(y="year(ts)", m="10")}
                     - {mstart.format(y="year(ts)", m="9")}
              ELSE CAST(1 AS BIGINT) END AS span
  FROM tsd
),
weighted AS (
  SELECT s.lon_milli, s.lat_milli, s.wtr, ppm.v AS contrib_ppm
  FROM season s
  JOIN ppm ON ppm.t_cent = LEAST({idiv("s.delta * 300", "s.span")}, 300)
),
scat AS (
  SELECT o.lvl AS level,
         {idiv("(e.lon_milli + 180000) * (2::BIGINT << o.lvl)", "360000")} + o.dx AS gx,
         {idiv("(e.lat_milli + 90000) * (1::BIGINT << o.lvl)", "180000")} + o.dy AS gy,
         CAST(o.w AS BIGINT) * e.contrib_ppm AS wc, e.wtr, o.lvl
  FROM weighted e CROSS JOIN o
),
grid AS (
  SELECT level, gx, gy,
         CAST(SUM(CASE WHEN NOT wtr THEN wc ELSE 0 END) AS BIGINT) AS summer_fp,
         CAST(SUM(CASE WHEN wtr THEN wc ELSE 0 END) AS BIGINT) AS winter_fp
  FROM scat
  WHERE gx >= 0 AND gx < (2::BIGINT << lvl)
    AND gy >= 0 AND gy < (1::BIGINT << lvl)
  GROUP BY level, gx, gy
)
SELECT level, gx, gy, summer_fp, winter_fp,
       CAST(RANK() OVER (PARTITION BY level ORDER BY summer_fp ASC) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY level) AS DOUBLE) AS summer_pct,
       CAST(RANK() OVER (PARTITION BY level ORDER BY winter_fp ASC) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY level) AS DOUBLE) AS winter_pct,
       CAST(RANK() OVER (PARTITION BY level ORDER BY summer_fp ASC) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY level) AS DOUBLE)
       - CAST(RANK() OVER (PARTITION BY level ORDER BY winter_fp ASC) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY level) AS DOUBLE) AS combined
FROM grid
"""


register_extra("kde_compare", q_kde_compare, _kde_compare_oracle())


# ---------------------------------------------------------------------------
# Image-side curation: quality metrics (full-pipeline SQL oracle over the
# procedural pixels, like image_features) and end-to-end phash dedup groups.
# ---------------------------------------------------------------------------

IMGQ_N = 300


def q_image_quality(spark, sf_dir):
    """Sharpness (total absolute gradient), contrast range, and distinct
    luminance count per decoded image — the junk-image filter for the
    image+caption corpus."""
    imgs = SYN.images(spark, n=IMGQ_N, partitions=16)
    return OM.image_quality(imgs).select(
        "image_id", "w", "h", "fmt",
        "grad_x", "grad_y", "grad_energy",
        "min_lum", "max_lum", "n_distinct_lum",
    )


def _image_quality_oracle() -> str:
    """Replays the procedural pixels ((i*31 + x*7 + y*13) % 256, 'jpeg'
    quantized v - v%4) and takes LAG gradients per row/column in SQL —
    the decode→gradient pipeline stated as what it must yield."""
    return f"""
WITH imgs AS (
  SELECT range AS i,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END AS w,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 256 END AS h,
         CASE range % 3 WHEN 2 THEN 'jpeg' ELSE 'png' END AS fmt
  FROM range({IMGQ_N})
),
pix AS (
  SELECT i, x, y, CASE WHEN fmt='jpeg' THEN v - (v % 4) ELSE v END AS vq
  FROM (
    SELECT imgs.i, imgs.fmt, x.x, y.y,
           (imgs.i*31 + x.x*7 + y.y*13) % 256 AS v
    FROM imgs,
         LATERAL unnest(generate_series(0, w-1)) AS x(x),
         LATERAL unnest(generate_series(0, h-1)) AS y(y)
  )
),
gx AS (
  SELECT i, CAST(SUM(ABS(vq - prev)) AS BIGINT) AS grad_x
  FROM (
    SELECT i, vq,
           LAG(vq) OVER (PARTITION BY i, y ORDER BY x) AS prev
    FROM pix
  ) WHERE prev IS NOT NULL GROUP BY i
),
gy AS (
  SELECT i, CAST(SUM(ABS(vq - prev)) AS BIGINT) AS grad_y
  FROM (
    SELECT i, vq,
           LAG(vq) OVER (PARTITION BY i, x ORDER BY y) AS prev
    FROM pix
  ) WHERE prev IS NOT NULL GROUP BY i
),
rng AS (
  SELECT i, CAST(MIN(vq) AS INTEGER) AS min_lum,
         CAST(MAX(vq) AS INTEGER) AS max_lum,
         CAST(COUNT(DISTINCT vq) AS INTEGER) AS n_distinct_lum
  FROM pix GROUP BY i
)
SELECT 'img' || lpad(CAST(imgs.i AS VARCHAR), 12, '0') AS image_id,
       imgs.w, imgs.h, imgs.fmt,
       gx.grad_x, gy.grad_y, gx.grad_x + gy.grad_y AS grad_energy,
       rng.min_lum, rng.max_lum, rng.n_distinct_lum
FROM imgs JOIN gx ON imgs.i = gx.i JOIN gy ON imgs.i = gy.i
          JOIN rng ON imgs.i = rng.i
"""


register_extra("image_quality", q_image_quality, _image_quality_oracle())


def q_image_dedup_groups(spark, sf_dir):
    """End-to-end IMAGE near-dup removal: phash banded-hamming pairs →
    connected components → (group_id, keep) per image — the image-side
    twin of dedup_groups (minhash) for the image+caption corpus."""
    docs = _docs(spark, sf_dir)
    imgs = docs.select("doc_id", _planted_phash().alias("phash"))
    pairs = OD.hamming_pairs(imgs, "phash", "doc_id")
    return OD.canonicalize(imgs.select("doc_id"), pairs)


register_extra(
    "image_dedup_groups",
    q_image_dedup_groups,
    OD.canonicalize_oracle(_phash_pairs_oracle()),
)


# ---------------------------------------------------------------------------
# Exact 13-gram decontamination (GPT-3 appendix-C criterion) and per-source
# caps (C4-style over-represented-domain control) — operators/corpus.py
# ---------------------------------------------------------------------------


def q_decontaminate_ngram(spark, sf_dir):
    """Exact word-13-gram train×eval overlap over the same mod-17 split as
    the winnowing `decontaminate` — the zero-miss classical criterion."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    probes = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    return OCORP.decontaminate_ngram(train, probes)


register_extra(
    "decontaminate_ngram",
    q_decontaminate_ngram,
    OCORP.decontaminate_ngram_oracle(
        f"(SELECT * FROM documents WHERE doc_id % {DECON_MOD} <> 0)",
        f"(SELECT * FROM documents WHERE doc_id % {DECON_MOD} = 0)",
    ),
)

SOURCE_CAP = 40


def q_source_cap(spark, sf_dir):
    """Per-source top-N by quality rank (rank 0 / keep 1 for the under-cap
    long tail, which never pays the window)."""
    return OCORP.source_cap(_docs(spark, sf_dir), cap=SOURCE_CAP)


register_extra(
    "source_cap", q_source_cap, OCORP.source_cap_oracle("documents", SOURCE_CAP)
)

INCR_BATCH_MOD = 5  # batch = every 5th doc (20%); corpus = the rest


def q_incremental_dedup(spark, sf_dir):
    """New-batch-vs-corpus MinHash LSH dedup: batch band keys join the
    corpus band INDEX plus a per-bucket-min pass within the batch — never
    a corpus×corpus pairing (the 100 TB ingest posture)."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    return OD.incremental_dedup(
        docs.filter(did % INCR_BATCH_MOD != 0),
        docs.filter(did % INCR_BATCH_MOD == 0),
        engine="arrow",
    )


register_extra(
    "incremental_dedup",
    q_incremental_dedup,
    OD.incremental_dedup_oracle("documents", INCR_BATCH_MOD),
)


# ---------------------------------------------------------------------------
# KMeans cluster-count machinery (SURVEY §2 analytics; reference
# KSamplerJobRunner -> KMeansDistortionJobRunner -> DistortionGroupManagement
# .bestCount): deterministic rank sample, Sugar–James transformed distortion
# over a whole k range in one pass, max-jump selection.  At p=2 the
# transform is 2n/sum_d2 — exact integer sums, one IEEE division — so the
# whole jump table is oracle-exact (operators/clustering.py).
# ---------------------------------------------------------------------------

JUMP_KS = list(range(2, 9))


def q_kmeans_jump(spark, sf_dir):
    """Sugar–James jump table at sampled centroids: rank-k prefixes of one
    deterministic hash-rank sample are the centroid sets; one cross join +
    running-min window yields every k's distortion; jump = d_k - d_{k-1},
    best = first k at the max jump (clustering.kmeans_distortion_table)."""
    from geowave_spark.operators import clustering as OCL

    geo = TB.geo_events(spark, sf_dir)
    return OCL.kmeans_distortion_table(geo, JUMP_KS)


def _kmeans_jump_oracle() -> str:
    kmax = max(JUMP_KS)
    klist = ", ".join(str(k) for k in JUMP_KS)
    h = OTX.duck_h64("CAST(event_id AS VARCHAR)")
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
hashed AS (
  SELECT event_id,
         CAST(lon_milli AS BIGINT) AS px, CAST(lat_milli AS BIGINT) AS py,
         {h} AS h
  FROM geo_events
),
sample AS (
  SELECT px AS cx, py AS cy,
         ROW_NUMBER() OVER (ORDER BY h, event_id) - 1 AS rank
  FROM hashed ORDER BY h, event_id LIMIT {kmax}
),
crossd AS (
  SELECT p.event_id AS pid, s.rank,
         (p.px - s.cx)*(p.px - s.cx) + (p.py - s.cy)*(p.py - s.cy) AS d2
  FROM hashed p CROSS JOIN sample s
),
rmin AS (
  SELECT pid, rank + 1 AS k,
         MIN(d2) OVER (PARTITION BY pid ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
  FROM crossd
),
per_k AS (
  SELECT k, COUNT(*) AS n, CAST(SUM(rm) AS BIGINT) AS sum_d2
  FROM rmin WHERE k IN ({klist}) GROUP BY k
),
tbl AS (
  SELECT CAST(k AS INTEGER) AS k, n, sum_d2,
         CAST(2 AS DOUBLE) * n / sum_d2 AS distortion
  FROM per_k
),
j AS (
  SELECT *, distortion - LAG(distortion, 1, CAST(0 AS DOUBLE)) OVER (ORDER BY k) AS jump
  FROM tbl
),
m AS (SELECT *, MAX(jump) OVER () AS maxj FROM j),
b AS (SELECT *, MIN(CASE WHEN jump = maxj THEN k END) OVER () AS bestk FROM m)
SELECT k, n, sum_d2, distortion, jump, (k = bestk) AS best FROM b
"""


register_extra("kmeans_jump", q_kmeans_jump, _kmeans_jump_oracle())


# ---------------------------------------------------------------------------
# SemDeDup (operators/embed.py): cluster-then-near-dup semantic
# deduplication over the embedding column — IVF buckets bound the
# quadratic pair work per list; exact quantized cosine; connected
# components; keep = min-id representative.
# ---------------------------------------------------------------------------


def q_semdedup(spark, sf_dir):
    """SemDeDup labeling (vec_id, group_id, keep) for every vector:
    within-IVF-bucket cosine >= tau pairs -> components -> min-id keep."""
    emb = TB.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    return OE.semdedup(emb)


register_extra("semdedup", q_semdedup, OE.semdedup_oracle())


# ---------------------------------------------------------------------------
# Bucketed co-located spatial join (operators/bucketed.py): both sides
# pre-bucketed on the materialized join key -> sort-merge join with ZERO
# shuffle exchanges (plan-asserted in tests/test_bucketed.py).  Same rows
# as spatial_join, so it shares that oracle.
# ---------------------------------------------------------------------------


def q_spatial_join_colocated(spark, sf_dir):
    """The spatial_join answered from pre-bucketed stores: write both sides
    bucketed on the stored join key (the reference's materialize-insertion-
    ids-at-write layout), then join exchange-free."""
    import tempfile

    from geowave_spark.operators import bucketed as OB

    pts = TB.geo_events(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lon", "lat", "lon_milli", "lat_milli"
    )
    envs = TB.geo_footprints(spark, sf_dir).select(
        F.col("event_id").alias("env_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    root = tempfile.mkdtemp(prefix="gw_bkt_")
    OB.write_point_join_store(
        pts, _footprint_spec_tiers(), "gw_q_pts_bkt", f"{root}/pts", buckets=8
    )
    OB.write_envelope_join_store(envs, "gw_q_env_bkt", f"{root}/envs", buckets=8)
    return OB.colocated_points_in_envelopes(
        spark, "gw_q_pts_bkt", "gw_q_env_bkt"
    ).select("point_id", "env_id")


register_extra(
    "spatial_join_colocated",
    q_spatial_join_colocated,
    f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL})
SELECT p.event_id AS point_id, f.event_id AS env_id
FROM geo_events p JOIN geo_footprints f
  ON p.lon_milli >= f.minx_m AND p.lon_milli <= f.maxx_m
 AND p.lat_milli >= f.miny_m AND p.lat_milli <= f.maxy_m
""",
)


# ---------------------------------------------------------------------------
# Prototype pruning (operators/embed.py): Sorscher et al. 2022 cluster-
# balanced data pruning — cosine-to-own-centroid prototypicality, drop the
# most prototypical prune_frac per IVF bucket.  Exact fixed-point cosine +
# integer drop counts -> bit-exact oracle.
# ---------------------------------------------------------------------------


def q_prototype_prune(spark, sf_dir):
    """(vec_id, bucket, proto_cos, keep): per-cluster prototypicality rank,
    most-prototypical 25% dropped within each bucket."""
    emb = TB.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    return OE.prototype_prune(emb)


register_extra(
    "prototype_prune", q_prototype_prune, OE.prototype_prune_oracle()
)


# ---------------------------------------------------------------------------
# Corrupt-image isolation (operators/multimodal.py on_error='quarantine'):
# planted corruption (every 7th image truncated to 4 bytes) must surface as
# err rows, never as a job failure — the 10^12-row regime where some blobs
# are always bad.  Oracle states exactly which ids must fail.
# ---------------------------------------------------------------------------


def q_image_validate(spark, sf_dir):
    """(image_id, ok): decode succeeded?  Corruption planted on ids % 7 == 0
    (bytes truncated to 4 — not even a magic header); the job must complete
    and flag EXACTLY those rows."""
    imgs = SYN.images(spark, n=IMGFEAT_N, partitions=16)
    i = F.substring("image_id", 4, 12).cast("long")
    corrupted = imgs.withColumn(
        "bytes",
        F.when(i % 7 == 0, F.expr("substring(bytes, 1, 4)")).otherwise(
            F.col("bytes")
        ),
    )
    feats = OM.image_features(corrupted, on_error="quarantine")
    return feats.select(
        "image_id", F.col("err").isNull().alias("ok")
    )


register_extra(
    "image_validate",
    q_image_validate,
    f"""
SELECT printf('img%012d', i) AS image_id, (i % 7 != 0) AS ok
FROM (SELECT range AS i FROM range({IMGFEAT_N}))
""",
)


# ---------------------------------------------------------------------------
# Aspect-ratio batch bucketing (operators/multimodal.py): the image
# analogue of pack_sequences — bin by integer milli-ratio, deterministic
# fixed-size batches per bin via a distributed prefix COUNT (h64 order,
# range-bucketed; never a global window).
# ---------------------------------------------------------------------------


def q_aspect_batches(spark, sf_dir):
    """(image_id, ratio_milli, bin, ordinal, batch_id, complete) over the
    synthetic image corpus, batch_size=16."""
    imgs = SYN.images(spark, n=IMGFEAT_N, partitions=16, with_bytes=False)
    return OM.aspect_bucket_batches(imgs, batch_size=16)


def _aspect_batches_oracle() -> str:
    from geowave_spark.operators.multimodal import ASPECT_EDGES_MILLI
    from geowave_spark.operators.text import duck_h64

    bin_sql = " + ".join(
        f"CASE WHEN ratio_milli >= {e} THEN 1 ELSE 0 END"
        for e in ASPECT_EDGES_MILLI
    )
    return f"""
WITH imgs AS (
  SELECT printf('img%012d', range) AS image_id,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END AS w,
         CASE range % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 256 END AS h
  FROM range({IMGFEAT_N})
),
scored AS (
  SELECT image_id, (1000 * w) // h AS ratio_milli,
         {duck_h64('image_id')} AS key
  FROM imgs
),
binned AS (
  SELECT image_id, ratio_milli, CAST({bin_sql} AS INTEGER) AS bin, key
  FROM scored
),
ranked AS (
  SELECT image_id, ratio_milli, bin,
         ROW_NUMBER() OVER (PARTITION BY bin ORDER BY key, image_id) - 1
           AS ordinal,
         COUNT(*) OVER (PARTITION BY bin) AS nbin
  FROM binned
)
SELECT image_id, ratio_milli, bin, ordinal,
       ordinal // 16 AS batch_id,
       (ordinal // 16) < (nbin // 16) AS complete
FROM ranked
"""


register_extra("aspect_batches", q_aspect_batches, _aspect_batches_oracle())


# ---------------------------------------------------------------------------
# Shard export assignment (operators/corpus.py): WebDataset-style
# training-sample shards — h64-order pseudo-shuffle, block-cut shard ids
# from a distributed exact byte prefix sum; items never split.
# ---------------------------------------------------------------------------


def q_shard_assign(spark, sf_dir):
    """(doc_id, size, byte_start, shard_id) over the documents corpus —
    shard at 64 KB for a populated ladder at sf scale."""
    docs = TB.load_tables(spark, sf_dir, names=("documents",))["documents"]
    sized = docs.select("doc_id", F.length("text").alias("nbytes"))
    return OCORP.shard_assign(
        sized, size_col="nbytes", shard_bytes=1 << 16, id_col="doc_id"
    )


def _shard_assign_oracle() -> str:
    from geowave_spark.operators.text import duck_h64

    return f"""
WITH t AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS size,
         {duck_h64('CAST(doc_id AS VARCHAR)')} AS key
  FROM documents
),
p AS (
  SELECT doc_id, size,
         CAST(COALESCE(SUM(size) OVER (ORDER BY key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS byte_start
  FROM t WHERE size > 0
)
SELECT doc_id, size, byte_start, byte_start // {1 << 16} AS shard_id FROM p
"""


register_extra("shard_assign", q_shard_assign, _shard_assign_oracle())


# ---------------------------------------------------------------------------
# Field-level visibility (operators/visibility.py): per-field JSON policy
# definitions (JsonDefinitionColumnVisibilityManagement parity) — rows
# always return, unauthorized fields mask to NULL.  Three deterministic
# policies cycle by doc_id so every branch (specific-pattern win, all
# visible, unmatched-field public + unsatisfied conjunction) is exercised.
# ---------------------------------------------------------------------------

_FV_DEFS = (
    '{"la.*": "S", ".*": "TS"}',  # lang visible under S, source masked
    '{".*": "S"}',                # everything visible under S
    '{"source": "S&X"}',          # source needs S&X -> masked; lang public
)


def q_field_visibility(spark, sf_dir):
    """(doc_id, lang, source, field_vis) after masking with auths={'S'}."""
    from geowave_spark.operators.visibility import apply_field_visibility

    docs = TB.load_tables(spark, sf_dir, names=("documents",))["documents"]
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.element_at(
            F.array(*[F.lit(v) for v in _FV_DEFS]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("field_vis"),
    )
    out = apply_field_visibility(d, {"S"}, fields=["lang", "source"])
    return out.select("doc_id", "lang", "source", "field_vis")


def _field_visibility_oracle() -> str:
    defs = ", ".join("'%s'" % v.replace("'", "''") for v in _FV_DEFS)
    return f"""
WITH d AS (
  SELECT doc_id, lang, source,
         ([{defs}])[CAST(doc_id % 3 + 1 AS INTEGER)] AS field_vis,
         CAST(doc_id % 3 AS INTEGER) AS pol
  FROM documents
)
SELECT doc_id,
       lang,  -- visible under every policy: la.*->S (pol 0), .*->S (pol 1),
              -- unmatched -> public (pol 2)
       CASE WHEN pol = 1 THEN source ELSE NULL END AS source,
       field_vis
FROM d
"""


register_extra(
    "field_visibility", q_field_visibility, _field_visibility_oracle()
)


# ---------------------------------------------------------------------------
# Large×large points-in-POLYGONS join (operators/join.py): the polygon side
# is a TABLE of WKB geometries (not a broadcast query list) — deterministic
# CCW triangles seeded from every 197th event, integer milli coordinates so
# the convex half-plane refine is bit-exact in SQL.
# ---------------------------------------------------------------------------

_TRI_DX, _TRI_DY = 2000, 1500

import pandas as pd  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


@F.pandas_udf(T.BinaryType())
def _tri_wkb(cx: pd.Series, cy: pd.Series) -> pd.Series:
    from geowave_spark.functions import geometry as G

    out = []
    for x, y in zip(cx.to_numpy(), cy.to_numpy()):
        ring = np.array(
            [
                [x, y - _TRI_DY],
                [x + _TRI_DX, y + _TRI_DY],
                [x - _TRI_DX, y + _TRI_DY],
            ],
            dtype=np.float64,
        )
        out.append(G.wkb_polygon([ring]))
    return pd.Series(out)


def q_points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir)
    seeds = geo.filter(
        (F.col("event_id") % 197 == 0)
        & (F.abs(F.col("lon_milli")) <= 180000 - _TRI_DX)
        & (F.abs(F.col("lat_milli")) <= 90000 - _TRI_DY)
    ).select(
        F.col("event_id").alias("poly_id"),
        _tri_wkb(
            F.col("lon_milli").cast("double"), F.col("lat_milli").cast("double")
        ).alias("wkb"),
    )
    points = geo.select(
        F.col("event_id").alias("point_id"), "lon_milli", "lat_milli"
    )
    from geowave_spark.operators.join import points_in_polygons_join

    return points_in_polygons_join(points, seeds)


def _points_in_polygons_oracle() -> str:
    dx, dy = _TRI_DX, _TRI_DY
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
tri AS (
  SELECT event_id AS poly_id, lon_milli AS cx, lat_milli AS cy
  FROM geo_events
  WHERE event_id % 197 = 0
    AND abs(lon_milli) <= {180000 - dx} AND abs(lat_milli) <= {90000 - dy}
)
SELECT p.event_id AS point_id, t.poly_id, p.lon_milli, p.lat_milli
FROM geo_events p, tri t
WHERE {dx} * (p.lat_milli - (t.cy - {dy})) - {dy * 2} * (p.lon_milli - t.cx) >= 0
  AND p.lat_milli <= t.cy + {dy}
  AND {dx} * (p.lat_milli - (t.cy + {dy})) + {dy * 2} * (p.lon_milli - (t.cx - {dx})) >= 0
"""


register_extra(
    "points_in_polygons", q_points_in_polygons, _points_in_polygons_oracle()
)


# ---------------------------------------------------------------------------
# Extent×extent overlap join (operators/join.envelopes_overlap_join): PBSM
# fixed-grid cover join with reporting-cell dedup — every 13th footprint
# against all footprints, closed-bounds overlap, exact integer intersection
# extents.
# ---------------------------------------------------------------------------


def q_envelopes_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = TB.geo_footprints(spark, sf_dir)
    left = fp.filter(F.col("event_id") % 13 == 0).select(
        F.col("event_id").alias("l_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    right = fp.select(
        F.col("event_id").alias("r_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    from geowave_spark.operators.join import envelopes_overlap_join

    return envelopes_overlap_join(left, right, res=8)


def _envelopes_overlap_oracle() -> str:
    return f"""
WITH fp AS ({TB.GEO_FOOTPRINTS_SQL})
SELECT l.event_id AS l_id, r.event_id AS r_id,
       CAST(least(l.maxx_m, r.maxx_m) - greatest(l.minx_m, r.minx_m) + 1
            AS BIGINT) AS inter_w_milli,
       CAST(least(l.maxy_m, r.maxy_m) - greatest(l.miny_m, r.miny_m) + 1
            AS BIGINT) AS inter_h_milli
FROM fp l, fp r
WHERE l.event_id % 13 = 0
  AND l.minx_m <= r.maxx_m AND r.minx_m <= l.maxx_m
  AND l.miny_m <= r.maxy_m AND r.miny_m <= l.maxy_m
"""


register_extra(
    "envelopes_overlap", q_envelopes_overlap, _envelopes_overlap_oracle()
)


# ---------------------------------------------------------------------------
# Geometry×geometry intersects join (operators/join.geometries_intersect_join):
# two triangle tables (different event strides), PBSM envelope candidates +
# the pair predicate kernel.  Oracle: exact integer separating-axis test for
# translates of one convex shape (axes = the 3 edge normals; interval
# half-width along each = the shape's own projection extent) — verified
# equal to the geometry kernel over 6k cases including every touch boundary
# (test_geometry.py pins the collinear/touch conventions).
# ---------------------------------------------------------------------------


def q_triangles_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = TB.geo_events(spark, sf_dir)

    def tris(mod, idname):
        return geo.filter(
            (F.col("event_id") % mod == 0)
            & (F.abs(F.col("lon_milli")) <= 180000 - _TRI_DX)
            & (F.abs(F.col("lat_milli")) <= 90000 - _TRI_DY)
        ).select(
            F.col("event_id").alias(idname),
            _tri_wkb(
                F.col("lon_milli").cast("double"),
                F.col("lat_milli").cast("double"),
            ).alias("wkb"),
        )

    from geowave_spark.operators.join import geometries_intersect_join

    return geometries_intersect_join(tris(157, "l_id"), tris(89, "r_id"))


def _triangles_intersect_oracle() -> str:
    w, h = _TRI_DX, _TRI_DY
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
l AS (SELECT event_id AS l_id, lon_milli AS cx, lat_milli AS cy FROM geo_events
      WHERE event_id % 157 = 0
        AND abs(lon_milli) <= {180000 - w} AND abs(lat_milli) <= {90000 - h}),
r AS (SELECT event_id AS r_id, lon_milli AS cx, lat_milli AS cy FROM geo_events
      WHERE event_id % 89 = 0
        AND abs(lon_milli) <= {180000 - w} AND abs(lat_milli) <= {90000 - h})
SELECT l.l_id, r.r_id
FROM l, r
WHERE abs({-2 * h} * (r.cx - l.cx) + {w} * (r.cy - l.cy)) <= {4 * w * h}
  AND abs(r.cy - l.cy) <= {2 * h}
  AND abs({2 * h} * (r.cx - l.cx) + {w} * (r.cy - l.cy)) <= {4 * w * h}
"""


register_extra(
    "triangles_intersect", q_triangles_intersect, _triangles_intersect_oracle()
)


# ---------------------------------------------------------------------------
# Styled distributed render (round 4): the reference's
# DistributedRenderProcess renders SLD-styled features server-side and
# composites partials; here the SLD rule list is a Catalyst CASE, the
# composite is a deterministic per-pixel painter argmax, and every numeric
# band/checksum column replays exactly in SQL (the PNG is pinned by pytest).
# ---------------------------------------------------------------------------

STYLED_LEVEL, STYLED_TS = 3, 64  # pixel grid res 3 + log2(64) = 9


def _styled_rules_spark():
    return [
        (F.col("event_type") == "click", 0xDC3C28, 2),
        (F.col("event_type") == "view", 0x3C78DC, 1),
    ]


_STYLED_RULES_SQL = (
    "CASE WHEN event_type = 'click' THEN 14433320 "
    "WHEN event_type = 'view' THEN 3963100 ELSE 7895160 END"
)
_STYLED_HW_SQL = (
    "CASE WHEN event_type = 'click' THEN 2 "
    "WHEN event_type = 'view' THEN 1 ELSE 0 END"
)


def q_render_styled(spark, sf_dir):
    geo = TB.geo_events(spark, sf_dir)
    out = OTL.render_styled_tiles(
        geo, level=STYLED_LEVEL, rules=_styled_rules_spark(), tile_size=STYLED_TS
    )
    return out.select(
        "level", "tile_ix", "tile_iy", "painted", "sum_r", "sum_g", "sum_b", "chk"
    )


def _render_styled_oracle() -> str:
    res = STYLED_LEVEL + 6
    n = 1 << res
    r = OTL.STYLE_MAX_HALFWIDTH

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    gx = f"LEAST(GREATEST({idiv(f'(lon_milli + 180000) * {n}', '360000')}, 0), {n - 1})"
    gy = f"LEAST(GREATEST({idiv(f'(lat_milli + 90000) * {n}', '180000')}, 0), {n - 1})"
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
styled AS (
  SELECT event_id, {gx} AS ix, {gy} AS iy,
         {_STYLED_RULES_SQL} AS rgb, {_STYLED_HW_SQL} AS hw
  FROM geo_events
),
offs AS (
  SELECT unnest(generate_series(-{r}, {r})) AS dx
),
pix AS (
  SELECT s.event_id, s.rgb, s.ix + ox.dx AS gx, s.iy + oy.dx AS gy
  FROM styled s, offs ox, offs oy
  WHERE abs(ox.dx) <= s.hw AND abs(oy.dx) <= s.hw
    AND s.ix + ox.dx >= 0 AND s.ix + ox.dx < {n}
    AND s.iy + oy.dx >= 0 AND s.iy + oy.dx < {n}
),
win AS (
  SELECT gx >> 6 AS tile_ix, gy >> 6 AS tile_iy,
         gx & {STYLED_TS - 1} AS px, gy & {STYLED_TS - 1} AS py,
         arg_max(rgb, event_id) AS rgb
  FROM pix GROUP BY 1, 2, 3, 4
)
SELECT CAST({STYLED_LEVEL} AS BIGINT) AS level, tile_ix, tile_iy,
       COUNT(*) AS painted,
       CAST(SUM((rgb >> 16) & 255) AS BIGINT) AS sum_r,
       CAST(SUM((rgb >> 8) & 255) AS BIGINT) AS sum_g,
       CAST(SUM(rgb & 255) AS BIGINT) AS sum_b,
       bit_xor(((py * {STYLED_TS} + px) << 24) | rgb) AS chk
FROM win GROUP BY 2, 3
"""


register_extra("render_styled_tiles", q_render_styled, _render_styled_oracle())


ENV_RENDER_LEVEL = 4  # res 4 + log2(64) = 10


def _env_rules_spark():
    return [
        (F.col("half_m") >= 512, 0xB43232, None),
        (F.col("half_m") >= 128, 0x32A050, None),
    ]


_ENV_RULES_SQL = (
    "CASE WHEN half_m >= 512 THEN 11809330 "
    "WHEN half_m >= 128 THEN 3317840 ELSE 7895160 END"
)


def q_render_envelopes(spark, sf_dir):
    fp = TB.geo_footprints(spark, sf_dir)
    out = OTL.render_envelope_tiles(
        fp,
        level=ENV_RENDER_LEVEL,
        rules=[(p, rgb) for p, rgb, _ in _env_rules_spark()],
        mode="fill",
        tile_size=STYLED_TS,
    )
    return out.select(
        "level", "tile_ix", "tile_iy", "painted", "sum_r", "sum_g", "sum_b", "chk"
    )


def _render_envelopes_oracle() -> str:
    res = ENV_RENDER_LEVEL + 6
    n = 1 << res

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    def grid(col: str, off: int, span: int) -> str:
        return f"LEAST(GREATEST({idiv(f'({col} + {off}) * {n}', str(span))}, 0), {n - 1})"

    return f"""
WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL}),
envs AS (
  SELECT event_id, {_ENV_RULES_SQL} AS rgb,
         {grid("minx_m", 180_000, 360_000)} AS gx0,
         {grid("maxx_m", 180_000, 360_000)} AS gx1,
         {grid("miny_m", 90_000, 180_000)} AS gy0,
         {grid("maxy_m", 90_000, 180_000)} AS gy1
  FROM geo_footprints
),
xs AS (SELECT event_id, rgb, gy0, gy1, unnest(generate_series(gx0, gx1)) AS gx FROM envs),
pix AS (SELECT event_id, rgb, gx, unnest(generate_series(gy0, gy1)) AS gy FROM xs),
win AS (
  SELECT gx >> 6 AS tile_ix, gy >> 6 AS tile_iy,
         gx & {STYLED_TS - 1} AS px, gy & {STYLED_TS - 1} AS py,
         arg_max(rgb, event_id) AS rgb
  FROM pix GROUP BY 1, 2, 3, 4
)
SELECT CAST({ENV_RENDER_LEVEL} AS BIGINT) AS level, tile_ix, tile_iy,
       COUNT(*) AS painted,
       CAST(SUM((rgb >> 16) & 255) AS BIGINT) AS sum_r,
       CAST(SUM((rgb >> 8) & 255) AS BIGINT) AS sum_g,
       CAST(SUM(rgb & 255) AS BIGINT) AS sum_b,
       bit_xor(((py * {STYLED_TS} + px) << 24) | rgb) AS chk
FROM win GROUP BY 2, 3
"""


register_extra("render_envelope_tiles", q_render_envelopes, _render_envelopes_oracle())


# ---------------------------------------------------------------------------
# OSM PBF ingest (round 4): the reference's extensions/cli/osm
# OsmPbfParser.java stages .osm.pbf (osmosis BinaryParser) into
# node/way/relation tables.  Here: distributed fixture write (one pbf per
# partition, encoded from the deterministic events derivation) → binaryFile
# + mapInPandas decode → typed rows; content replays exactly in SQL, so the
# whole protobuf/zlib/delta-coding path is oracle-checked end to end.
# ---------------------------------------------------------------------------

OSM_WAY_MOD, OSM_REL_MOD = 100, 200


def _osm_write_dir(spark, sf_dir):
    import os
    import tempfile

    geo = TB.geo_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="gw_osm_")

    def write_part(rows):
        from geowave_spark.sources import osm as OSM

        rows = sorted(rows, key=lambda r: r.event_id)
        if not rows:
            return
        nodes = [
            (
                int(r.event_id),
                int(r.lon_milli) * 10**6,
                int(r.lat_milli) * 10**6,
                {"event_type": r.event_type},
            )
            for r in rows
        ]
        ways = [
            (int(r.event_id), [int(r.event_id) + i for i in range(3)],
             {"kind": "track"})
            for r in rows
            if r.event_id % OSM_WAY_MOD == 0
        ]
        rels = [
            (
                int(r.event_id),
                [("node", int(r.event_id), "stop"),
                 ("way", int(r.event_id), "route")],
                {"type": "route"},
            )
            for r in rows
            if r.event_id % OSM_REL_MOD == 0
        ]
        buf = OSM.encode_osm_pbf(nodes, ways, rels)
        with open(os.path.join(d, f"part{int(rows[0].event_id):012d}.osm.pbf"),
                  "wb") as fh:
            fh.write(buf)

    geo.select("event_id", "lon_milli", "lat_milli", "event_type").foreachPartition(
        write_part
    )
    return d


def q_osm_nodes(spark, sf_dir):
    """OSM PBF node round trip: encode → decode → exact integer coords +
    canonical tag string (sources/osm.py; OsmPbfParser.java parity)."""
    from geowave_spark.sources import osm as OSM

    d = _osm_write_dir(spark, sf_dir)
    return OSM.read_osm_nodes(spark, f"{d}/*.osm.pbf").select(
        F.col("node_id").alias("event_id"),
        "lon_milli",
        "lat_milli",
        "n_tags",
        "tags",
    )


register_extra(
    "osm_nodes",
    q_osm_nodes,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, lon_milli, lat_milli, 1 AS n_tags, "
        "'event_type=' || event_type AS tags FROM geo_events",
    ),
)


def q_osm_ways(spark, sf_dir):
    """OSM PBF way + relation round trip projections (delta-coded refs,
    member types/roles, string tables)."""
    from geowave_spark.sources import osm as OSM

    d = _osm_write_dir(spark, sf_dir)
    ways = OSM.read_osm_ways(spark, f"{d}/*.osm.pbf").select(
        F.col("way_id").alias("osm_id"),
        F.lit("way").alias("kind"),
        "n_refs",
        F.col("ref_sum").alias("id_sum"),
        F.col("tags"),
    )
    rels = OSM.read_osm_relations(spark, f"{d}/*.osm.pbf").select(
        F.col("rel_id").alias("osm_id"),
        F.concat(F.lit("rel:"), "member_types", F.lit(":"), "roles").alias("kind"),
        F.col("n_members").alias("n_refs"),
        F.col("memid_sum").alias("id_sum"),
        F.col("tags"),
    )
    return ways.unionByName(rels)


register_extra(
    "osm_ways",
    q_osm_ways,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""
SELECT event_id AS osm_id, 'way' AS kind, 3 AS n_refs,
       3 * event_id + 3 AS id_sum, 'kind=track' AS tags
FROM geo_events WHERE event_id % {OSM_WAY_MOD} = 0
UNION ALL
SELECT event_id AS osm_id, 'rel:node,way:stop,route' AS kind, 2 AS n_refs,
       2 * event_id AS id_sum, 'type=route' AS tags
FROM geo_events WHERE event_id % {OSM_REL_MOD} = 0
""",
    ),
)


# ---------------------------------------------------------------------------
# Hexagonal binning (H3-analogue density + k-ring hotspots) — the brief's
# H3/S2 axis.  Assignment is an exact-integer two-candidate nearest-center
# argmin (functions/hexgrid.py has the two-row proof); the oracles replay
# the identical arithmetic, so both queries are hash-exact.
# ---------------------------------------------------------------------------

from geowave_spark.functions import hexgrid as HG  # noqa: E402
from geowave_spark.operators import hexbin as HXB  # noqa: E402

HEX_RES = 6  # W = 512 milli-deg ≈ 0.5° hexes — blob-scale at sf testdata
HEX_RING_MIN = 20  # hotspot threshold on the 7-hex ring sum


def _hex_cand_sql(dj: int) -> str:
    w, h = HG.wh(HEX_RES)
    n_i = HG.ni(HEX_RES)
    j = f"(y // {h} + {dj})"
    off = f"(({j}) % 2) * {w // 2}"
    i = f"((x - {off} + {w // 2}) // {w})"
    dx = f"(x - (({i}) * {w} + {off}))"
    dy = f"(y - ({j}) * {h})"
    return f"(({dx})*({dx}) + ({dy})*({dy})) * {HG.PACK} + (({j}) * {n_i} + ({i}))"


def _hex_density_ctes() -> str:
    """Shared CTE chain: shifted coords → packed-key argmin → density.
    MATERIALIZED where re-referenced (DuckDB re-inlines chained CTEs)."""
    n_i = HG.ni(HEX_RES)
    return f"""
p AS (SELECT lon_milli + {HG.X_OFF} AS x, lat_milli + {HG.Y_OFF} AS y FROM geo_events),
k AS (SELECT LEAST({_hex_cand_sql(0)}, {_hex_cand_sql(1)}) % {HG.PACK} AS hid FROM p),
d AS MATERIALIZED (
  SELECT hid % {n_i} AS hex_i, hid // {n_i} AS hex_j, COUNT(*) AS cnt
  FROM k GROUP BY 1, 2)"""


def q_hex_density(spark, sf_dir):
    """Per-hex event density at HEX_RES with exact integer hex centers —
    one map-side-combinable groupBy over a zero-shuffle column-math
    assignment (no UDF anywhere in the plan)."""
    return HXB.hex_density(TB.geo_events(spark, sf_dir), HEX_RES).select(
        "hex_i", "hex_j", "cnt", "lon_c", "lat_c"
    )


def _hex_density_oracle() -> str:
    w, h = HG.wh(HEX_RES)
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f""", {_hex_density_ctes()}
SELECT hex_i, hex_j, cnt,
       hex_i * {w} + (hex_j % 2) * {w // 2} - {HG.X_OFF} AS lon_c,
       hex_j * {h} - {HG.Y_OFF} AS lat_c
FROM d""",
    )


register_extra("hex_density", q_hex_density, _hex_density_oracle())


def q_hex_hotspots(spark, sf_dir):
    """k=1 ring-smoothed hotspots: occupied hexes whose 7-hex ring mass
    meets HEX_RING_MIN.  Density is contraction-sized before the literal
    7-offset scatter, so the fan-out never touches raw rows."""
    d = HXB.hex_density(TB.geo_events(spark, sf_dir), HEX_RES)
    return (
        HXB.hex_smooth(d)
        .filter(F.col("ring_cnt") >= HEX_RING_MIN)
        .select("hex_i", "hex_j", "cnt", "ring_cnt")
    )


def _hex_hotspots_oracle() -> str:
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f""", {_hex_density_ctes()},
contrib AS (
  SELECT d.hex_i + CASE WHEN d.hex_j % 2 = 1 THEN o.dio ELSE o.die END AS ti,
         d.hex_j + o.dj AS tj, d.cnt AS c
  FROM d CROSS JOIN (VALUES (0,0,0),(1,1,0),(-1,-1,0),(0,1,-1),(-1,0,-1),(0,1,1),(-1,0,1))
       o(die, dio, dj)),
ring AS (SELECT ti, tj, CAST(SUM(c) AS BIGINT) AS ring_cnt FROM contrib GROUP BY 1, 2)
SELECT d.hex_i, d.hex_j, d.cnt, r.ring_cnt
FROM d JOIN ring r ON d.hex_i = r.ti AND d.hex_j = r.tj
WHERE r.ring_cnt >= {HEX_RING_MIN}""",
    )


register_extra("hex_hotspots", q_hex_hotspots, _hex_hotspots_oracle())


# ---------------------------------------------------------------------------
# S2-analogue cell family — the brief's H3/S2 axis, S2 half (hexgrid.py
# is the H3 half).  One sortable id space for every level: face bits |
# Morton position | sentinel lsb, descendants = one contiguous id range.
# The oracles replay the full encode (face CASE -> quantize -> parallel-
# prefix Morton spread -> id compose) bit-for-bit in DuckDB.
# ---------------------------------------------------------------------------

from geowave_spark.functions import s2cells as S2C  # noqa: E402
from geowave_spark.operators import s2 as S2OP  # noqa: E402

S2_LEVEL = 10  # density aggregation level (~350 m equatorial u-step)
# bbox crossing the equatorial/north-cap face seam at lat 45° AND
# holding the NYC hot blob — exercises multi-face covers + skew cells.
S2_BOX = (-76_000, 40_000, -72_000, 47_000)
S2_MAX_CELLS = 48  # covering budget (S2RegionCoverer max_cells)


def _s2_spread_sql(col: str) -> str:
    """Parallel-prefix bit spread (bit i -> 2i) — same mask ladder as
    cols.spread_col, decimal literals for DuckDB."""
    masks = (
        (16, 281470681808895),
        (8, 71777214294589695),
        (4, 1085102592571150095),
        (2, 3689348814741910323),
        (1, 6148914691236517205),
    )
    e = f"({col} & 4294967295)"
    for sh, m in masks:
        e = f"(({e} | ({e} << {sh})) & {m})"
    return e


def _s2_leaf_ctes() -> str:
    """geo_events -> leaf ids, the shared oracle CTE chain (MATERIALIZED:
    each stage is re-referenced by the next via two expressions)."""
    ml = S2C.MAX_LEVEL
    n = 1 << ml
    return f"""
s2f AS MATERIALIZED (
  SELECT event_id, lon_milli, lat_milli,
    CASE WHEN lat_milli >= {S2C.EQ_LAT} THEN 4
         WHEN lat_milli < {-S2C.EQ_LAT} THEN 5
         ELSE LEAST((lon_milli + {S2C.X_OFF}) // {S2C.EQ_SPAN}, 3) END AS face
  FROM geo_events),
s2uv AS MATERIALIZED (
  SELECT event_id, lon_milli, lat_milli, face,
    CASE WHEN face >= 4 THEN LEAST(lon_milli + {S2C.X_OFF}, {S2C.CAP_USPAN - 1})
         ELSE LEAST((lon_milli + {S2C.X_OFF}) - face * {S2C.EQ_SPAN},
                    {S2C.EQ_SPAN - 1}) END AS u,
    CASE WHEN face = 4 THEN LEAST(lat_milli - {S2C.EQ_LAT}, {S2C.CAP_VSPAN - 1})
         WHEN face = 5 THEN -lat_milli - {S2C.EQ_LAT + 1}
         ELSE lat_milli + {S2C.EQ_LAT} END AS v,
    CASE WHEN face >= 4 THEN {S2C.CAP_USPAN} ELSE {S2C.EQ_SPAN} END AS us,
    CASE WHEN face >= 4 THEN {S2C.CAP_VSPAN} ELSE {S2C.EQ_SPAN} END AS vs
  FROM s2f),
s2q AS MATERIALIZED (
  SELECT event_id, lon_milli, lat_milli, face,
    LEAST(u * {n} // us, {n - 1}) AS iu,
    LEAST(v * {n} // vs, {n - 1}) AS iv
  FROM s2uv),
s2leaf AS MATERIALIZED (
  SELECT event_id, lon_milli, lat_milli,
    (((face << {2 * ml}) |
      ({_s2_spread_sql('iu')} | ({_s2_spread_sql('iv')} << 1))) << 1) | 1 AS leaf
  FROM s2q)"""


def q_s2_cells(spark, sf_dir):
    """Per-cell event density at S2_LEVEL with each cell's contiguous
    descendant leaf-id range — one map-side-combinable groupBy on the
    single packed id, whole-stage codegen end-to-end (no UDF)."""
    return S2OP.s2_density(TB.geo_events(spark, sf_dir), S2_LEVEL)


def _s2_cells_oracle() -> str:
    lsb = 1 << (2 * (S2C.MAX_LEVEL - S2_LEVEL))
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f""", {_s2_leaf_ctes()},
s2cell AS (SELECT (leaf & {-lsb}) | {lsb} AS cell_id FROM s2leaf)
SELECT cell_id,
       cell_id >> {S2C.FACE_SHIFT} AS face,
       cell_id - (cell_id & (-cell_id)) + 1 AS range_min,
       cell_id + (cell_id & (-cell_id)) - 1 AS range_max,
       COUNT(*) AS cnt
FROM s2cell GROUP BY 1""",
    )


register_extra("s2_cells", q_s2_cells, _s2_cells_oracle())


def q_s2_bbox(spark, sf_dir):
    """Box query through the budgeted mixed-level covering (driver-side
    literal, ≤ S2_MAX_CELLS cells) translated to merged leaf-id ranges:
    interior ranges match outright, boundary ranges AND the exact
    predicate — one scan filter of two-compare arms, no join.  The
    oracle is the plain box predicate, so an exact match proves the
    whole covering + contiguity + refinement path."""
    return S2OP.s2_bbox_query(
        TB.geo_events(spark, sf_dir), *S2_BOX, max_cells=S2_MAX_CELLS
    ).select("event_id", "lon_milli", "lat_milli")


def _s2_bbox_oracle() -> str:
    x0, y0, x1, y1 = S2_BOX
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""SELECT event_id, lon_milli, lat_milli
FROM geo_events
WHERE lon_milli BETWEEN {x0} AND {x1} AND lat_milli BETWEEN {y0} AND {y1}""",
    )


register_extra("s2_bbox", q_s2_bbox, _s2_bbox_oracle())


# Concave L-shape with a hole over the NYC blob, vertices in MILLI floats
# off the integer lattice (no derived point sits exactly on an edge).
S2_POLY = [
    np.array(
        [
            [-75_800.3, 39_900.7],
            [-72_900.1, 39_900.7],
            [-72_900.1, 41_800.9],
            [-74_200.7, 41_800.9],
            [-74_200.7, 40_900.3],
            [-75_800.3, 40_900.3],
        ]
    ),
    np.array(
        [
            [-74_500.9, 40_200.1],
            [-73_600.3, 40_200.1],
            [-73_600.3, 40_700.9],
            [-74_500.9, 40_700.9],
        ]
    ),
]


def q_s2_polygon(spark, sf_dir):
    """Concave-with-hole polygon query via the generalized
    S2RegionCoverer (classify_cells_vs_polygon as the region oracle):
    interior leaf ranges match outright, boundary ranges AND the
    even-odd parity predicate — generated by the SAME function as the
    DuckDB oracle below, so the refine literals are bit-identical.
    One scan filter, whole-stage codegen (the parity sum is column
    CASE math), no join."""
    return S2OP.s2_polygon_query(
        TB.geo_events(spark, sf_dir), S2_POLY, max_cells=64
    ).select("event_id", "lon_milli", "lat_milli")


def _s2_polygon_oracle() -> str:
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""SELECT event_id, lon_milli, lat_milli
FROM geo_events
WHERE {G.evenodd_sql(S2_POLY, lon="lon_milli", lat="lat_milli")}""",
    )


register_extra("s2_polygon", q_s2_polygon, _s2_polygon_oracle())


# Antimeridian-wrapping box over the Tokyo blob's longitude band:
# minx > maxx means [170°E, 180°] ∪ [-180°, -170°E]… here a band wide
# enough to hold data on both sides of the date line.
S2_WRAP_BOX = (139_000, -10_000, -170_000, 50_000)


def q_s2_bbox_wrap(spark, sf_dir):
    """Date-line-wrapping box (minx > maxx — LongitudeDefinition bin
    semantics): union-of-two-boxes covering via the elementwise-max
    classifier, wrapped OR refine.  Same scan-filter shape as s2_bbox."""
    return S2OP.s2_bbox_query(
        TB.geo_events(spark, sf_dir), *S2_WRAP_BOX, max_cells=S2_MAX_CELLS
    ).select("event_id", "lon_milli", "lat_milli")


def _s2_bbox_wrap_oracle() -> str:
    x0, y0, x1, y1 = S2_WRAP_BOX
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f"""SELECT event_id, lon_milli, lat_milli
FROM geo_events
WHERE (lon_milli >= {x0} OR lon_milli <= {x1})
  AND lat_milli BETWEEN {y0} AND {y1}""",
    )


register_extra("s2_bbox_wrap", q_s2_bbox_wrap, _s2_bbox_wrap_oracle())


S2_CQL_STRING = (
    "BBOX(geom, -76.0, 40.0, -72.0, 47.0) "
    "AND ts BETWEEN '2024-01-01 00:00:00' AND '2024-01-20 23:59:59' "
    "AND event_type IN ('click', 'purchase')"
)


def q_s2_cql(spark, sf_dir):
    """The CQL string front door routed through the S2 leaf-range
    planner (plans/s2cql.py) — the reference's pluggable-index-under-
    one-query-surface property (CQLQuery.createOptimalQuery planning
    against whatever index the store carries): the SAME grammar as
    compound_cql, but the BBOX becomes a driver-side covering → merged
    leaf-id range arms (one scan filter, no cover join); BETWEEN and
    the IN predicate ride as Catalyst residuals."""
    from geowave_spark.plans.s2cql import s2_cql_query

    return s2_cql_query(
        TB.geo_events(spark, sf_dir), S2_CQL_STRING, max_cells=S2_MAX_CELLS
    ).select("event_id", "event_type", "ts", "lon_milli", "lat_milli")


def _s2_cql_oracle() -> str:
    return TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        """SELECT event_id, event_type, ts, lon_milli, lat_milli
FROM geo_events
WHERE lon_milli BETWEEN -76000 AND -72000 AND lat_milli BETWEEN 40000 AND 47000
  AND ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-20 23:59:59'
  AND event_type IN ('click', 'purchase')""",
    )


register_extra("s2_cql", q_s2_cql, _s2_cql_oracle())


def q_geotiff_overview(spark, sf_dir):
    """COG overview read path (read_geotiff(level=1)): scenes written
    with a 2x-decimated overview as a chained IFD (NewSubfileType=1),
    cycling classic/BigTIFF containers and tiled/strip layouts; the
    reader decodes ONLY the overview IFD — w/h halve, px_sum is the
    strided sum, and the envelope is IDENTICAL to full-res (IFD-0
    georef scaled — the level-invariance the tile-server path relies
    on).  The oracle replays the decimated procedural pixels and the
    SAME envelope arithmetic as geotiff_tiles."""
    import os
    import tempfile

    fp = TB.geo_footprints(spark, sf_dir).filter(
        F.col("event_id") % GEOTIFF_MOD == 0
    )
    d = tempfile.mkdtemp(prefix="gw_cog_")

    def write_scenes(rows):
        from geowave_spark.sources import tiff as TIF
        from geowave_spark.sources.synthetic import pixels_for

        for r in rows:
            ev = int(r.event_id)
            pix = pixels_for(ev % 256, 32, 32)
            minx, miny = r.minx_m / 1000.0, r.miny_m / 1000.0
            maxx, maxy = r.maxx_m / 1000.0, r.maxy_m / 1000.0
            k = ev // GEOTIFF_MOD
            buf = TIF.encode_geotiff(
                pix, (minx, maxy), ((maxx - minx) / 32.0, (maxy - miny) / 32.0),
                compression=TIF.COMP_DEFLATE if k % 2 else TIF.COMP_LZW,
                predictor=2,
                tile_size=(16, 16) if k % 3 == 0 else None,
                bigtiff=k % 2 == 1,
                byteorder="MM" if k % 3 == 1 else "II",
                overviews=[pix[::2, ::2].copy()],
            )
            with open(os.path.join(d, f"ev{ev:012d}.tif"), "wb") as fh:
                fh.write(buf)

    fp.select("event_id", "minx_m", "miny_m", "maxx_m", "maxy_m").foreachPartition(
        write_scenes
    )

    from geowave_spark.sources import tiff as TIF

    feats = TIF.read_geotiff(spark, f"{d}/*.tif", level=1)
    return feats.select(
        F.regexp_extract("file", r"ev(\d+)\.tif", 1).cast("long").alias("event_id"),
        "w",
        "h",
        "px_sum",
        F.round(F.col("minx") * 1000).cast("long").alias("minx_m"),
        F.round(F.col("miny") * 1000).cast("long").alias("miny_m"),
        F.round(F.col("maxx") * 1000).cast("long").alias("maxx_m"),
        F.round(F.col("maxy") * 1000).cast("long").alias("maxy_m"),
    )


register_extra(
    "geotiff_overview",
    q_geotiff_overview,
    TB.oracle_with(
        TB.GEO_FOOTPRINTS_SQL,
        "geo_footprints",
        f"""
SELECT s.event_id, 16 AS w, 16 AS h,
       CAST(px.px_sum AS BIGINT) AS px_sum,
       s.minx_m, s.miny_m, s.maxx_m, s.maxy_m
FROM (SELECT event_id, minx_m, miny_m, maxx_m, maxy_m
      FROM geo_footprints WHERE event_id % {GEOTIFF_MOD} = 0) s
JOIN (
  SELECT f.event_id,
         SUM(((f.event_id % 256) * 31 + x.x * 7 + y.y * 13) % 256) AS px_sum
  FROM geo_footprints f,
       LATERAL unnest(generate_series(0, 31, 2)) AS x(x),
       LATERAL unnest(generate_series(0, 31, 2)) AS y(y)
  WHERE f.event_id % {GEOTIFF_MOD} = 0
  GROUP BY f.event_id
) px ON s.event_id = px.event_id
""",
    ),
)


def q_landsat_best_scenes(spark, sf_dir):
    """Landsat8 scene-selection parity (SceneFeatureIterator.nBestScenes
    + BandFeatureIterator, extensions/cli/landsat8): a deterministic
    synthetic scene catalog (integer-derived WRS2 path/row + cloud
    cover), the 2 lowest-cloud scenes per (path, row) cell via a rank
    window (groups are scene-counts-per-cell — never data-sized), then
    the literal-array band explode.  Every step is integer/window math,
    so the DuckDB oracle replays the whole pipeline exactly."""
    from geowave_spark.sources import landsat as LS

    ev = TB.geo_events(spark, sf_dir).select("event_id")
    cat = ev.select(
        F.concat(F.lit("LC08_"), F.col("event_id").cast("string")).alias("entityId"),
        (F.col("event_id") % 13 + 1).cast("int").alias("path"),
        ((F.col("event_id") * 7) % 11 + 1).cast("int").alias("row"),
        (((F.col("event_id") * 7919) % 1001).cast("double") / F.lit(10.0)).alias(
            "cloudCover"
        ),
    )
    best = LS.n_best_scenes(cat, 2)
    bands = LS.expand_bands(best, ("B2", "B3", "B4"))
    return bands.select(
        F.col("entityId").alias("entity_id"),
        F.col("path").alias("wrs_path"),
        F.col("row").alias("wrs_row"),
        F.col("cloudCover").alias("cloud_cover"),
        "band",
        "band_file",
    )


register_extra(
    "landsat_best_scenes",
    q_landsat_best_scenes,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        """, cat AS (
  SELECT 'LC08_' || CAST(event_id AS VARCHAR) AS entity_id,
         CAST(event_id % 13 + 1 AS INTEGER) AS wrs_path,
         CAST((event_id * 7) % 11 + 1 AS INTEGER) AS wrs_row,
         CAST((event_id * 7919) % 1001 AS DOUBLE) / CAST(10 AS DOUBLE)
           AS cloud_cover
  FROM geo_events),
best AS (
  SELECT entity_id, wrs_path, wrs_row, cloud_cover FROM (
    SELECT cat.*, row_number() OVER (
      PARTITION BY wrs_path, wrs_row
      ORDER BY cloud_cover ASC, entity_id ASC) AS rk
    FROM cat) t
  WHERE rk <= 2)
SELECT entity_id, wrs_path, wrs_row, cloud_cover, band,
       entity_id || '_' || band || '.TIF' AS band_file
FROM best CROSS JOIN unnest(['B2', 'B3', 'B4']) AS b(band)""",
    ),
)


def q_landsat_analyze(spark, sf_dir):
    """Landsat8 `analyze` parity (AnalyzeRunner.java:104-162): the
    catalog-wide AnalysisInfo ranges (path/row, lon/lat, dates, cloud
    cover, scene count) as ONE map-side-combinable aggregation over a
    deterministic synthetic catalog.  avg_cloud_cover is dropped from
    the gated projection only because a double mean is summation-order-
    dependent across engines (the repo's fixed-point rule); min/max/count
    are order-free and replay exactly."""
    from geowave_spark.sources import landsat as LS

    fp = TB.geo_footprints(spark, sf_dir)
    cat = fp.select(
        (F.col("event_id") % 13 + 1).cast("int").alias("path"),
        ((F.col("event_id") * 7) % 11 + 1).cast("int").alias("row"),
        (((F.col("event_id") * 7919) % 1001).cast("double") / F.lit(10.0)).alias(
            "cloudCover"
        ),
        F.col("ts").alias("acquisitionDate"),
        (F.col("minx_m").cast("double") / F.lit(1000.0)).alias("minx"),
        (F.col("miny_m").cast("double") / F.lit(1000.0)).alias("miny"),
        (F.col("maxx_m").cast("double") / F.lit(1000.0)).alias("maxx"),
        (F.col("maxy_m").cast("double") / F.lit(1000.0)).alias("maxy"),
    )
    return LS.analyze_catalog(cat).drop("avg_cloud_cover")


register_extra(
    "landsat_analyze",
    q_landsat_analyze,
    TB.oracle_with(
        TB.GEO_FOOTPRINTS_SQL,
        "geo_footprints",
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_scenes,
       MIN(CAST(event_id % 13 + 1 AS INTEGER)) AS min_path,
       MAX(CAST(event_id % 13 + 1 AS INTEGER)) AS max_path,
       MIN(CAST((event_id * 7) % 11 + 1 AS INTEGER)) AS min_row,
       MAX(CAST((event_id * 7) % 11 + 1 AS INTEGER)) AS max_row,
       MIN(CAST(minx_m AS DOUBLE) / CAST(1000 AS DOUBLE)) AS min_lon,
       MAX(CAST(maxx_m AS DOUBLE) / CAST(1000 AS DOUBLE)) AS max_lon,
       MIN(CAST(miny_m AS DOUBLE) / CAST(1000 AS DOUBLE)) AS min_lat,
       MAX(CAST(maxy_m AS DOUBLE) / CAST(1000 AS DOUBLE)) AS max_lat,
       MIN(ts) AS start_date,
       MAX(ts) AS end_date,
       MIN(CAST((event_id * 7919) % 1001 AS DOUBLE) / CAST(10 AS DOUBLE))
         AS min_cloud_cover,
       MAX(CAST((event_id * 7919) % 1001 AS DOUBLE) / CAST(10 AS DOUBLE))
         AS max_cloud_cover
FROM geo_footprints""",
    ),
)


def q_osm_way_geometry(spark, sf_dir):
    """OSM way-geometry assembly (the reference's feature-conversion
    step, extensions/cli/osm): way refs posexploded, ONE node-id
    equi-join (the only big×big step — bucket-by-node_id at planet
    scale), per-way ordered reassembly with bounded collect_list (OSM
    caps ways at 2000 nodes).  The oracle replays the ref expansion +
    node join in SQL; refs past the last event id surface as
    complete=false, never silently-shorter geometry."""
    from geowave_spark.sources import osm as OSM

    d = _osm_write_dir(spark, sf_dir)
    ways = OSM.read_osm_ways(spark, f"{d}/*.osm.pbf")
    nodes = OSM.read_osm_nodes(spark, f"{d}/*.osm.pbf")
    return OSM.assemble_ways(ways, nodes).select(
        "way_id", "n_refs", "n_found", "complete", "closed",
        "minx_m", "miny_m", "maxx_m", "maxy_m",
    )


register_extra(
    "osm_way_geometry",
    q_osm_way_geometry,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        f""", ways AS (
  SELECT event_id AS way_id FROM geo_events
  WHERE event_id % {OSM_WAY_MOD} = 0),
refs AS (
  SELECT way_id, way_id + o.o AS node_id
  FROM ways CROSS JOIN unnest(generate_series(0, 2)) AS o(o)),
j AS (
  SELECT r.way_id, g.lon_milli, g.lat_milli
  FROM refs r JOIN geo_events g ON g.event_id = r.node_id)
SELECT way_id, 3 AS n_refs, CAST(COUNT(*) AS INTEGER) AS n_found,
       COUNT(*) = 3 AS complete, FALSE AS closed,
       MIN(lon_milli) AS minx_m, MIN(lat_milli) AS miny_m,
       MAX(lon_milli) AS maxx_m, MAX(lat_milli) AS maxy_m
FROM j GROUP BY way_id""",
    ),
)


def q_chunk_documents(spark, sf_dir):
    """Fixed-token-window chunking with overlap (the retrieval/embedding
    chunk pass): token array bound once per row behind a Generate
    barrier, bounded sequence() explode per document, pure array slices
    — zero shuffle.  The oracle replays the windows with DuckDB list
    slicing over the SAME tokenization."""
    return OCORP.chunk_documents(_docs(spark, sf_dir))


register_extra(
    "chunk_documents", q_chunk_documents, OCORP.chunk_documents_oracle("documents")
)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (the memory-bound regime's family next
    to LSH and IVF): zero-shuffle literal-argmin encode against
    driver-side codebooks, ADC top-k as m array lookups summed per
    candidate — one broadcast of the tiny query-table frame and the
    per-query rank window.  The oracle replays quantize → codebooks →
    packed-arg_min codes → ADC → rank, integer end-to-end."""
    return OE.pq_topk(_emb(spark, sf_dir))


register_extra("pq_topk", q_pq_topk, OE.pq_topk_oracle())


def q_pq_recall(spark, sf_dir):
    """PQ retrieval quality vs the exact L2 scan — the measured evidence
    for the (m, K) compression dial, same contract as ann_recall."""
    return OE.pq_recall(_emb(spark, sf_dir))


register_extra("pq_recall", q_pq_recall, OE.pq_recall_oracle())


def _snapshot_store(spark, sf_dir):
    """Build a two-commit snapshot store over indexed geo events in a
    temp dir (deterministic split on event_id % 4) — shared by the
    snapshot queries below."""
    import tempfile

    from geowave_spark.operators import snapshots as SNAP

    geo = TB.geo_events(spark, sf_dir)
    pts = OI.index_points(
        geo.select("event_id", "lon", "lat", "lon_milli", "lat_milli"),
        lon_col="lon", lat_col="lat", id_col="event_id",
    )
    d = tempfile.mkdtemp(prefix="gw_snap_")
    SNAP.commit(pts.filter(F.col("event_id") % 4 < 3), d, mode="append")
    SNAP.commit(pts.filter(F.col("event_id") % 4 == 3), d, mode="append")
    return d, SNAP


_SNAP_PROJ = [
    "event_id", "lon_milli", "lat_milli",
]


def q_snapshot_incremental(spark, sf_dir):
    """Iceberg-style incremental scan (operators/snapshots.py): two
    atomic commits land in a snapshot log; the v1→v2 delta reads ONLY
    the second commit's files (asserted via inputFiles in pytest) —
    the resume/backfill path of the north rule's "checkpoints
    per-partition lineage + row counts to Iceberg".  The oracle
    replays the deterministic batch split."""
    d, SNAP = _snapshot_store(spark, sf_dir)
    inc = SNAP.incremental(spark, d, from_version=1, to_version=2)
    return inc.select(*_SNAP_PROJ, F.col("commit").cast("int").alias("commit"))


register_extra(
    "snapshot_incremental",
    q_snapshot_incremental,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, lon_milli, lat_milli, CAST(2 AS INTEGER) AS commit "
        "FROM geo_events WHERE event_id % 4 = 3",
    ),
)


def q_snapshot_time_travel(spark, sf_dir):
    """Time travel: after the second commit, reading snapshot v1 returns
    exactly the first batch — the training-data provenance contract
    (which corpus state a model trained on), reproducible forever.
    The oracle is the first batch's split predicate."""
    d, SNAP = _snapshot_store(spark, sf_dir)
    v1 = SNAP.read(spark, d, version=1)
    return v1.select(*_SNAP_PROJ, F.col("commit").cast("int").alias("commit"))


register_extra(
    "snapshot_time_travel",
    q_snapshot_time_travel,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, lon_milli, lat_milli, CAST(1 AS INTEGER) AS commit "
        "FROM geo_events WHERE event_id % 4 < 3",
    ),
)


def _idiv_sql(a: str, b: str) -> str:
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"


def q_mvt_points(spark, sf_dir):
    """Vector-tile export, point arm (operators/mvt.py over the
    sources/mvt.py codec): exact-integer quantization to tile-local
    screen coords, ONE tile groupBy, per-tile protobuf assembly.  The
    projected aggregates are computed from the DECODED payload, so a
    green row proves encode→decode→values end-to-end (the codec-oracle
    pattern); byte-level geometry/tags pinned by test_mvt.py including
    the public spec's golden command vectors."""
    from geowave_spark.operators import mvt as OMV

    geo = TB.geo_events(spark, sf_dir)
    return OMV.mvt_point_tiles(geo, level=3, tag_cols=("event_type",)).select(
        "level", "tile_ix", "tile_iy", "n_features", "sum_x", "sum_y", "xor_id"
    )


def _mvt_points_oracle() -> str:
    n = 1 << 15  # res = level 3 + log2(4096)
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
px AS (
  SELECT event_id,
         {_idiv_sql(f"(lon_milli + 180000) * {n}", "360000")} AS ix,
         {_idiv_sql(f"(lat_milli + 90000) * {n}", "180000")} AS iy
  FROM geo_events
)
SELECT CAST(3 AS BIGINT) AS level, (ix >> 12) AS tile_ix, (iy >> 12) AS tile_iy,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(ix & 4095) AS BIGINT) AS sum_x,
       CAST(SUM(4095 - (iy & 4095)) AS BIGINT) AS sum_y,
       bit_xor(event_id) AS xor_id
FROM px GROUP BY 2, 3
"""


register_extra("mvt_points", q_mvt_points, _mvt_points_oracle())


def q_mvt_envelopes(spark, sf_dir):
    """Vector-tile export, polygon arm: image-footprint envelopes →
    per-tile clipped CW box rings (clip coords span [0, extent] so
    adjacent tiles share exact boundary geometry).  Aggregates decoded
    from the payload; the oracle replays grid → bounded tile explode →
    clip → ring-vertex sums in integer SQL."""
    from geowave_spark.operators import mvt as OMV

    fps = TB.geo_footprints(spark, sf_dir)
    return OMV.mvt_envelope_tiles(fps, level=6).select(
        "level", "tile_ix", "tile_iy", "n_features", "sum_x", "sum_y", "xor_id"
    )


def _mvt_envelopes_oracle() -> str:
    n = 1 << 18  # res = level 6 + log2(4096)
    return f"""
WITH geo_footprints AS ({TB.GEO_FOOTPRINTS_SQL}),
g AS (
  SELECT event_id,
         {_idiv_sql(f"(minx_m + 180000) * {n}", "360000")} AS gx0,
         {_idiv_sql(f"(maxx_m + 180000) * {n}", "360000")} AS gx1,
         {_idiv_sql(f"(miny_m + 90000) * {n}", "180000")} AS gy0,
         {_idiv_sql(f"(maxy_m + 90000) * {n}", "180000")} AS gy1
  FROM geo_footprints
),
tx AS (SELECT *, unnest(generate_series(gx0 >> 12, gx1 >> 12)) AS tile_ix FROM g),
ty AS (SELECT *, unnest(generate_series(gy0 >> 12, gy1 >> 12)) AS tile_iy FROM tx),
cl AS (
  SELECT event_id, tile_ix, tile_iy,
         greatest(gx0 - tile_ix * 4096, 0) AS cx0,
         least(gx1 - tile_ix * 4096 + 1, 4096) AS cx1,
         greatest(gy0 - tile_iy * 4096, 0) AS cy0,
         least(gy1 - tile_iy * 4096 + 1, 4096) AS cy1
  FROM ty
)
SELECT CAST(6 AS BIGINT) AS level, tile_ix, tile_iy,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(2 * (cx0 + cx1)) AS BIGINT) AS sum_x,
       CAST(SUM(2 * (8192 - cy0 - cy1)) AS BIGINT) AS sum_y,
       bit_xor(event_id) AS xor_id
FROM cl GROUP BY 2, 3
"""


register_extra("mvt_envelopes", q_mvt_envelopes, _mvt_envelopes_oracle())


def _track_pts(spark, sf_dir):
    from geowave_spark.operators import tracks as TRK

    return TRK.track_points(TB.geo_events(spark, sf_dir))


_TRACK_PTS_SQL = """
SELECT user_id AS track_id, event_id AS pt_id, ts,
       CAST(floor(epoch(ts)) AS BIGINT) AS t,
       lon_milli AS x, lat_milli AS y
FROM geo_events
"""


def q_track_segments(spark, sf_dir):
    """Trajectory segmentation + summaries (operators/tracks.py over the
    reference's GPX/GeoLife/T-Drive track model): time-gap sessionization
    (one window per track) then per-segment counts, duration, exact
    integer Manhattan path length.  The oracle replays both windows and
    the aggregation."""
    from geowave_spark.operators import tracks as TRK

    seg = TRK.segment_tracks(_track_pts(spark, sf_dir), gap_s=86_400)
    return TRK.segment_summary(seg)


def _track_segments_oracle() -> str:
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS ({_TRACK_PTS_SQL}),
brk AS (
  SELECT *, CASE WHEN t - lag(t) OVER w > 86400 THEN 1 ELSE 0 END AS b
  FROM pts WINDOW w AS (PARTITION BY track_id ORDER BY ts, pt_id)
),
segd AS (
  SELECT *, CAST(SUM(b) OVER (PARTITION BY track_id ORDER BY ts, pt_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
  FROM brk
),
stepd AS (
  SELECT *, CASE WHEN lag(seg) OVER w2 = seg
                 THEN abs(x - lag(x) OVER w2) + abs(y - lag(y) OVER w2)
                 ELSE 0 END AS st
  FROM segd WINDOW w2 AS (PARTITION BY track_id ORDER BY ts, pt_id)
)
SELECT track_id, seg, CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(t) AS t_start, MAX(t) AS t_end, MAX(t) - MIN(t) AS dur_s,
       CAST(SUM(st) AS BIGINT) AS path_m, MAX(st) AS max_step_m
FROM stepd GROUP BY 1, 2
"""


register_extra("track_segments", q_track_segments, _track_segments_oracle())


def q_track_stays(spark, sf_dir):
    """Grid-dwell stay points: maximal same-cell runs per track kept when
    the dwell lasts ≥ 1h — the SQL-replayable run-length variant of
    GeoLife stay-point detection.  Exact integer cell math; the oracle
    replays the change-flag running sum and the run aggregation."""
    from geowave_spark.operators import tracks as TRK

    stays = TRK.stay_points(
        _track_pts(spark, sf_dir), cell_milli=2_000, min_dur_s=3_600
    )
    return stays.select(
        "track_id", "gx", "gy", "t_start", "t_end", "dur_s", "n_points"
    )


def _track_stays_oracle() -> str:
    idiv = _idiv_sql
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS ({_TRACK_PTS_SQL}),
celled AS (
  SELECT *, {idiv("x + 180000", "2000")} AS gx,
            {idiv("y + 90000", "2000")} AS gy
  FROM pts
),
flagged AS (
  SELECT *, CASE WHEN lag(gx) OVER w = gx AND lag(gy) OVER w = gy
                 THEN 0 ELSE 1 END AS chg
  FROM celled WINDOW w AS (PARTITION BY track_id ORDER BY ts, pt_id)
),
runs AS (
  SELECT *, CAST(SUM(chg) OVER (PARTITION BY track_id ORDER BY ts, pt_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
  FROM flagged
),
agg AS (
  SELECT track_id, run, gx, gy, MIN(t) AS t_start, MAX(t) AS t_end,
         MAX(t) - MIN(t) AS dur_s, CAST(COUNT(*) AS BIGINT) AS n_points
  FROM runs GROUP BY 1, 2, 3, 4
)
SELECT track_id, gx, gy, t_start, t_end, dur_s, n_points
FROM agg WHERE dur_s >= 3600
"""


register_extra("track_stays", q_track_stays, _track_stays_oracle())


def q_track_hausdorff(spark, sf_dir):
    """Symmetric discrete Hausdorff² between candidate track pairs
    (candidates = tracks whose FIRST points share a 2° cell — banding,
    never all-pairs).  max-min as two map-side-combinable groupBys over a
    role-swapped union; exact integer milli-degree distances, replayed
    verbatim in the oracle."""
    from geowave_spark.operators import tracks as TRK

    return TRK.track_hausdorff_pairs(_track_pts(spark, sf_dir), cell_milli=2_000)


def _track_hausdorff_oracle() -> str:
    idiv = _idiv_sql
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS ({_TRACK_PTS_SQL}),
ranked AS (
  SELECT track_id, x, y,
         row_number() OVER (PARTITION BY track_id ORDER BY ts, pt_id) AS rn
  FROM pts
),
starts AS (
  SELECT track_id, {idiv("x + 180000", "2000")} AS gx,
         {idiv("y + 90000", "2000")} AS gy
  FROM ranked WHERE rn = 1
),
cand AS (
  SELECT a.track_id AS ta, b.track_id AS tb
  FROM starts a JOIN starts b
    ON a.gx = b.gx AND a.gy = b.gy AND a.track_id < b.track_id
),
ab AS (
  SELECT c.ta, c.tb, pa.pt_id AS pid, 0 AS side,
         (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y) AS d2
  FROM cand c JOIN pts pa ON pa.track_id = c.ta
              JOIN pts pb ON pb.track_id = c.tb
  UNION ALL
  SELECT c.ta, c.tb, pb.pt_id AS pid, 1 AS side,
         (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y) AS d2
  FROM cand c JOIN pts pa ON pa.track_id = c.ta
              JOIN pts pb ON pb.track_id = c.tb
),
per_point AS (
  SELECT ta, tb, side, pid, MIN(d2) AS min_d2 FROM ab GROUP BY 1, 2, 3, 4
)
SELECT ta AS track_a, tb AS track_b, MAX(min_d2) AS hausdorff2
FROM per_point GROUP BY 1, 2
"""


register_extra("track_hausdorff", q_track_hausdorff, _track_hausdorff_oracle())


def q_od_flows(spark, sf_dir):
    """Origin–destination flow matrix over track cell transitions: lag
    window per track → cell-pair groupBy (output is cells², never
    points²).  n_tracks is a distinct count per flow — the one extra
    shuffle a distinct needs, bounded by the flow-matrix size."""
    from geowave_spark.operators import tracks as TRK

    return TRK.od_flows(_track_pts(spark, sf_dir), cell_milli=20_000)


def _od_flows_oracle() -> str:
    idiv = _idiv_sql
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS ({_TRACK_PTS_SQL}),
celled AS (
  SELECT track_id, ts, pt_id,
         {idiv("x + 180000", "20000")} AS gx,
         {idiv("y + 90000", "20000")} AS gy
  FROM pts
),
hops AS (
  SELECT track_id,
         lag(gx) OVER w AS gx0, lag(gy) OVER w AS gy0,
         gx AS gx1, gy AS gy1
  FROM celled WINDOW w AS (PARTITION BY track_id ORDER BY ts, pt_id)
)
SELECT gx0, gy0, gx1, gy1, CAST(COUNT(*) AS BIGINT) AS n_trips,
       CAST(COUNT(DISTINCT track_id) AS BIGINT) AS n_tracks
FROM hops
WHERE gx0 IS NOT NULL AND (gx0 != gx1 OR gy0 != gy1)
GROUP BY 1, 2, 3, 4
"""


register_extra("od_flows", q_od_flows, _od_flows_oracle())


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training (embed.py): per
    anchor the k most-similar DIFFERENT-label vectors, with a cosine
    ceiling as the false-negative filter.  Anchors broadcast; the label
    filter rides the join, excluded pairs never reach the rank window."""
    return OE.hard_negatives(_emb(spark, sf_dir), max_cos=0.95)


register_extra(
    "hard_negatives",
    q_hard_negatives,
    OE.hard_negatives_oracle(max_cos=0.95),
)


def q_density_contours(spark, sf_dir):
    """Marching-squares isoline extraction over the event density grid
    (operators/contours.py): corner gather via a literal 4-struct
    explode, ONE groupBy pivot, case table + fixed-point edge
    interpolation as ONE generated SQL fragment shared verbatim with the
    oracle (the evenodd_sql pattern).  Raster→vector closing arm next to
    polygonize."""
    from geowave_spark.operators import contours as CT

    geo = TB.geo_events(spark, sf_dir)
    grid = CT.grid_density(geo, res=9)
    return CT.contour_segments(grid, threshold=10)


def _density_contours_oracle() -> str:
    from geowave_spark.operators import contours as CT

    n = 1 << 9
    grid_sql = (
        f"SELECT {_idiv_sql(f'(lon_milli + 180000) * {n}', '360000')} AS gx, "
        f"{_idiv_sql(f'(lat_milli + 90000) * {n}', '180000')} AS gy, "
        f"CAST(COUNT(*) AS BIGINT) AS v "
        f"FROM ({TB.GEO_EVENTS_SQL}) geo GROUP BY 1, 2"
    )
    return CT.contour_oracle_sql(grid_sql, threshold=10)


register_extra("density_contours", q_density_contours, _density_contours_oracle())


def q_snapshot_upsert(spark, sf_dir):
    """Merge-on-read upsert (Iceberg v2 equality deletes): batch 1 is the
    full corpus; batch 2 re-commits every event_id % 5 == 0 row with a
    shifted longitude via commit_upsert (ONE atomic snapshot: equality
    delete on the batch's keys + append — the delete masks EARLIER
    commits only, so the batch's own rows survive).  The head read is
    latest-wins; the oracle replays the CASE."""
    import tempfile

    from geowave_spark.operators import snapshots as SNAP

    geo = TB.geo_events(spark, sf_dir)
    pts = OI.index_points(
        geo.select("event_id", "lon", "lat", "lon_milli", "lat_milli"),
        lon_col="lon", lat_col="lat", id_col="event_id",
    )
    d = tempfile.mkdtemp(prefix="gw_ups_")
    SNAP.commit(pts, d, mode="append")
    upd = pts.filter(F.col("event_id") % 5 == 0).withColumn(
        "lon_milli", F.col("lon_milli") + F.lit(7)
    )
    SNAP.commit_upsert(upd, d, key_col="event_id")
    head = SNAP.read(spark, d)
    return head.select(
        "event_id", "lon_milli", "lat_milli",
        F.col("commit").cast("int").alias("commit"),
    )


register_extra(
    "snapshot_upsert",
    q_snapshot_upsert,
    TB.oracle_with(
        TB.GEO_EVENTS_SQL,
        "geo_events",
        "SELECT event_id, "
        "CASE WHEN event_id % 5 = 0 THEN lon_milli + 7 ELSE lon_milli END "
        "AS lon_milli, lat_milli, "
        "CAST(CASE WHEN event_id % 5 = 0 THEN 3 ELSE 1 END AS INTEGER) "
        "AS commit FROM geo_events",
    ),
)


def q_morans_i(spark, sf_dir):
    """Global spatial autocorrelation (Moran's I, queen adjacency) over
    the res-8 event density grid, as exact integer components (the
    overflow-safe shape — see morans_i_components; the float statistic
    is a driver-side arbitrary-precision assembly).  Adjacency = one
    literal 8-offset explode + self-equi-join, never a cross join."""
    from geowave_spark.operators import contours as CT

    geo = TB.geo_events(spark, sf_dir)
    grid = CT.grid_density(geo, res=8)
    return CT.morans_i_components(grid)


def _morans_i_oracle() -> str:
    n = 1 << 8
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
grid AS (
  SELECT {_idiv_sql(f"(lon_milli + 180000) * {n}", "360000")} AS gx,
         {_idiv_sql(f"(lat_milli + 90000) * {n}", "180000")} AS gy,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM geo_events GROUP BY 1, 2
),
nbr AS (
  SELECT gx + d.dx AS ngx, gy + d.dy AS ngy, x AS x_i
  FROM grid, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
       AS d(dx, dy)
),
pair_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
         CAST(SUM(n.x_i * g.x) AS BIGINT) AS s1,
         CAST(SUM(n.x_i + g.x) AS BIGINT) AS s2
  FROM nbr n JOIN grid g ON g.gx = n.ngx AND g.gy = n.ngy
),
cell_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(x) AS BIGINT) AS s_tot,
         CAST(SUM(x * x) AS BIGINT) AS q_sum
  FROM grid
)
SELECT n_cells, w_pairs, s_tot, q_sum, s1, s2 FROM cell_agg, pair_agg
"""


register_extra("morans_i", q_morans_i, _morans_i_oracle())


def q_gi_star(spark, sf_dir):
    """Getis–Ord Gi* local hotspot components over the res-8 density
    grid (exact integer neighborhood sums; the float z-score is one
    column expression via gi_star) — the per-cell companion to the
    global morans_i query, same literal-offset adjacency plan."""
    from geowave_spark.operators import contours as CT

    geo = TB.geo_events(spark, sf_dir)
    grid = CT.grid_density(geo, res=8)
    return CT.gi_star_components(grid)


def _gi_star_oracle() -> str:
    n = 1 << 8
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
grid AS (
  SELECT {_idiv_sql(f"(lon_milli + 180000) * {n}", "360000")} AS gx,
         {_idiv_sql(f"(lat_milli + 90000) * {n}", "180000")} AS gy,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM geo_events GROUP BY 1, 2
),
nbr AS (
  SELECT gx + d.dx AS ngx, gy + d.dy AS ngy, x AS x_src
  FROM grid, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)) AS d(dx, dy)
),
sums AS (
  SELECT ngx, ngy, CAST(SUM(x_src) AS BIGINT) AS nbr_sum,
         CAST(COUNT(*) AS BIGINT) AS n_nbr
  FROM nbr GROUP BY 1, 2
)
SELECT g.gx, g.gy, g.x, s.nbr_sum, s.n_nbr
FROM grid g JOIN sums s ON s.ngx = g.gx AND s.ngy = g.gy
"""


register_extra("gi_star", q_gi_star, _gi_star_oracle())


def q_track_resample(spark, sf_dir):
    """Fixed-grid track resampling with exact integer linear
    interpolation (tracks.resample_tracks): per-track bounded sequence
    explode + ONE as-of interleave window per track — no point×grid
    join.  The oracle replays bounds, grid, interleave, and the
    shifted-floor interpolation."""
    from geowave_spark.operators import tracks as TRK

    return TRK.resample_tracks(_track_pts(spark, sf_dir), step_s=43_200)


def _track_resample_oracle(step: int = 43_200) -> str:
    idiv = _idiv_sql
    lerp = (
        "CASE WHEN t1 IS NULL THEN {v0} WHEN t1 = t0 THEN {v0} ELSE "
        "{v0} + " + idiv("({v1} - {v0}) * (t - t0) + 360000 * (t1 - t0)",
                         "t1 - t0") + " - 360000 END"
    )
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS ({_TRACK_PTS_SQL}),
bounds AS (
  SELECT track_id, MIN(t) AS tmin, MAX(t) AS tmax FROM pts GROUP BY 1
),
gridded AS (
  SELECT track_id, unnest(generate_series(
    CAST(ceil(tmin / CAST({step} AS DOUBLE)) AS BIGINT) * {step},
    CAST(floor(tmax / CAST({step} AS DOUBLE)) AS BIGINT) * {step},
    {step})) AS t
  FROM bounds
  WHERE CAST(floor(tmax / CAST({step} AS DOUBLE)) AS BIGINT)
        >= CAST(ceil(tmin / CAST({step} AS DOUBLE)) AS BIGINT)
),
inter AS (
  SELECT track_id, t, 0 AS is_grid, x, y, pt_id FROM pts
  UNION ALL
  SELECT track_id, t, 1, NULL, NULL, NULL FROM gridded
),
marked AS (
  SELECT track_id, t, is_grid,
    last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wb AS t0,
    last_value(CASE WHEN is_grid = 0 THEN x END IGNORE NULLS) OVER wb AS x0,
    last_value(CASE WHEN is_grid = 0 THEN y END IGNORE NULLS) OVER wb AS y0,
    first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wf AS t1,
    first_value(CASE WHEN is_grid = 0 THEN x END IGNORE NULLS) OVER wf AS x1,
    first_value(CASE WHEN is_grid = 0 THEN y END IGNORE NULLS) OVER wf AS y1
  FROM inter
  WINDOW
    wb AS (PARTITION BY track_id
           ORDER BY t, is_grid, COALESCE(pt_id, 4611686018427387904)
           ROWS UNBOUNDED PRECEDING),
    wf AS (PARTITION BY track_id
           ORDER BY t, is_grid, COALESCE(pt_id, 4611686018427387904)
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT track_id, t AS t_grid,
       {lerp.format(v0="x0", v1="x1")} AS x,
       {lerp.format(v0="y0", v1="y1")} AS y
FROM marked WHERE is_grid = 1
"""


register_extra("track_resample", q_track_resample, _track_resample_oracle())


# ---------------------------------------------------------------------------
# LineString family — segment-grain line store, exact integer line∩box and
# line∩polygon query paths (operators/lines.py).  Reference golden shape:
# GeoWaveBasicSpatialVectorIT.java:41-43 (tornado_tracks LINESTRING dataset,
# box + polygon filters).  The refine predicate SQL text is generated ONCE
# (operators/lines.sql_*) and evaluated by BOTH engines — Spark via F.expr
# inside the engine's cover-join path, DuckDB directly over the closed-form
# segment derivation; any divergence in the index prefilter, dedup gating,
# or predicate arithmetic is a red row.
# ---------------------------------------------------------------------------

from geowave_spark.operators import lines as LN  # noqa: E402

LINES_BBOX_QUERIES = [
    ("tokyo_box", 138_900, 34_900, 140_500, 36_300),
    ("paris_box", 1_800, 48_300, 3_100, 49_400),
    ("la_box", -119_000, 33_500, -117_800, 34_700),
]

# concave pentagon with a rectangular hole over the Tokyo blob
LINES_POLY_RINGS = [
    [(138_500, 34_800), (140_800, 34_800), (140_800, 36_500),
     (139_700, 35_600), (138_500, 36_500)],
    [(139_400, 35_100), (139_900, 35_100), (139_900, 35_450),
     (139_400, 35_450)],
]

_LINES_SEGS_SQL = """
SELECT * FROM (
  SELECT track_id, j - 1 AS seg_j,
         lag(x) OVER (PARTITION BY track_id ORDER BY j) AS x0,
         lag(y) OVER (PARTITION BY track_id ORDER BY j) AS y0,
         x AS x1, y AS y1
  FROM geo_track_points
) s WHERE x0 IS NOT NULL
"""


def _lines_oracle_prefix() -> str:
    return (
        f"WITH geo_track_points AS ({TB.GEO_TRACK_POINTS_SQL}),\n"
        f"segs AS MATERIALIZED ({_LINES_SEGS_SQL})\n"
    )


def q_lines_bbox(spark, sf_dir):
    pts = TB.geo_track_points(spark, sf_dir)
    segs = LN.line_segments(pts)
    idx = LN.index_line_segments(segs)
    return LN.query_bbox_lines(idx, LINES_BBOX_QUERIES)


def _lines_bbox_oracle() -> str:
    arms = [
        f"SELECT '{qid}' AS query_id, track_id, "
        f"COUNT(*) AS n_segs_hit FROM segs "
        f"WHERE {LN.sql_seg_box(mnx, mny, mxx, mxy)} GROUP BY track_id"
        for qid, mnx, mny, mxx, mxy in LINES_BBOX_QUERIES
    ]
    return _lines_oracle_prefix() + "\nUNION ALL\n".join(arms)


def q_lines_polygon(spark, sf_dir):
    pts = TB.geo_track_points(spark, sf_dir)
    segs = LN.line_segments(pts)
    idx = LN.index_line_segments(segs)
    sizes = segs.groupBy("track_id").agg(F.count("*").alias("n_segs"))
    return LN.query_polygon_lines(
        idx,
        [("poly_i", LINES_POLY_RINGS, "INTERSECTS"),
         ("poly_w", LINES_POLY_RINGS, "WITHIN")],
        track_sizes=sizes,
    )


def _lines_polygon_oracle() -> str:
    hit = LN.sql_seg_poly_hit(LINES_POLY_RINGS)
    within = LN.sql_seg_poly_within(LINES_POLY_RINGS)
    return _lines_oracle_prefix() + f"""
SELECT 'poly_i' AS query_id, track_id, COUNT(*) AS n_segs_hit
FROM segs WHERE {hit} GROUP BY track_id
UNION ALL
SELECT 'poly_w' AS query_id, track_id, n_segs_hit FROM (
  SELECT h.track_id, h.n_hit AS n_segs_hit, t.n AS n_total
  FROM (SELECT track_id, COUNT(*) AS n_hit FROM segs
        WHERE {within} GROUP BY track_id) h
  JOIN (SELECT track_id, COUNT(*) AS n FROM segs GROUP BY track_id) t
    ON h.track_id = t.track_id
) w WHERE n_segs_hit = n_total
"""


register_extra("lines_bbox", q_lines_bbox, _lines_bbox_oracle())
register_extra("lines_polygon", q_lines_polygon, _lines_polygon_oracle())


def _mvt_lines_level(n_events: int) -> int:
    """Density-ADAPTIVE export level: a fixed level hits the per-tile
    never-truncate guard when data density grows (sf1 gate: a blob tile
    held 307k > 262k features at level 6).  Each deeper level quarters
    per-tile density; deterministic from the events row count so the
    oracle replays the same level."""
    lvl = 6
    while n_events > 150_000 << (2 * (lvl - 6)):
        lvl += 1
    return lvl


def q_mvt_lines(spark, sf_dir):
    """Vector-tile export, LINESTRING arm (operators/mvt.mvt_line_tiles):
    segment-grain track store → exact quantized tile assignment
    (separating-axis in pixel space, no clip — MVT permits out-of-extent
    coords) → per-tile MoveTo+LineTo runs with seg_j-gap part breaks.
    Aggregates decoded from the payload; the oracle replays quantize →
    tile explode → SAT → run-merge vertex sums in integer SQL."""
    from geowave_spark.operators import mvt as OMV

    lvl = _mvt_lines_level(
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    pts = TB.geo_track_points(spark, sf_dir)
    segs = LN.line_segments(pts)
    return OMV.mvt_line_tiles(segs, level=lvl).select(
        "level", "tile_ix", "tile_iy", "n_features", "sum_x", "sum_y", "xor_id"
    )


def _mvt_lines_oracle(sf_dir: str) -> str:
    import duckdb

    con = duckdb.connect()
    n_events = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    con.close()
    return _mvt_lines_oracle_sql(_mvt_lines_level(int(n_events)))


def _mvt_lines_oracle_sql(level: int) -> str:
    n = 1 << (level + 12)  # res = level + log2(4096)
    sat = (
        "(LEAST(gx0, gx1) <= bx1 AND GREATEST(gx0, gx1) >= bx0 "
        "AND LEAST(gy0, gy1) <= by1 AND GREATEST(gy0, gy1) >= by0 "
        "AND LEAST(nx*bx0 + ny*by0, nx*bx0 + ny*by1, nx*bx1 + ny*by0, "
        "nx*bx1 + ny*by1) <= cc "
        "AND cc <= GREATEST(nx*bx0 + ny*by0, nx*bx0 + ny*by1, "
        "nx*bx1 + ny*by0, nx*bx1 + ny*by1))"
    )
    return f"""
WITH geo_track_points AS ({TB.GEO_TRACK_POINTS_SQL}),
segs AS MATERIALIZED ({_LINES_SEGS_SQL}),
q AS MATERIALIZED (
  SELECT track_id, seg_j,
         {_idiv_sql(f"(x0 + 180000) * {n}", 360000)} AS gx0,
         {_idiv_sql(f"(y0 + 90000) * {n}", 180000)} AS gy0,
         {_idiv_sql(f"(x1 + 180000) * {n}", 360000)} AS gx1,
         {_idiv_sql(f"(y1 + 90000) * {n}", 180000)} AS gy1
  FROM segs
),
tx AS MATERIALIZED (
  SELECT *, unnest(generate_series(LEAST(gx0, gx1) >> 12,
                                   GREATEST(gx0, gx1) >> 12)) AS tile_ix
  FROM q
),
txy AS MATERIALIZED (
  SELECT *, unnest(generate_series(LEAST(gy0, gy1) >> 12,
                                   GREATEST(gy0, gy1) >> 12)) AS tile_iy
  FROM tx
),
hits AS MATERIALIZED (
  SELECT track_id, seg_j, tile_ix, tile_iy,
         gx0 - tile_ix * 4096 AS lx0, 4095 - (gy0 - tile_iy * 4096) AS ly0,
         gx1 - tile_ix * 4096 AS lx1, 4095 - (gy1 - tile_iy * 4096) AS ly1
  FROM (
    SELECT *, gy0 - gy1 AS nx, gx1 - gx0 AS ny,
           (gy0 - gy1) * gx0 + (gx1 - gx0) * gy0 AS cc,
           tile_ix * 4096 AS bx0, tile_ix * 4096 + 4095 AS bx1,
           tile_iy * 4096 AS by0, tile_iy * 4096 + 4095 AS by1
    FROM txy
  ) s WHERE {sat}
),
runs AS (
  SELECT *, CASE WHEN lag(seg_j) OVER (
        PARTITION BY tile_ix, tile_iy, track_id ORDER BY seg_j
      ) = seg_j - 1 THEN 0 ELSE 1 END AS new_part
  FROM hits
)
SELECT CAST({level} AS BIGINT) AS level, tile_ix, tile_iy,
       CAST(COUNT(DISTINCT track_id) AS BIGINT) AS n_features,
       CAST(SUM(lx1 + CASE WHEN new_part = 1 THEN lx0 ELSE 0 END)
            AS BIGINT) AS sum_x,
       CAST(SUM(ly1 + CASE WHEN new_part = 1 THEN ly0 ELSE 0 END)
            AS BIGINT) AS sum_y,
       bit_xor(DISTINCT track_id) AS xor_id
FROM runs GROUP BY tile_ix, tile_iy
"""


register_extra("mvt_lines", q_mvt_lines, _mvt_lines_oracle)


LINE_RENDER_LEVEL = 7  # pixel grid res 7 + log2(256) = 15


def _line_rules_spark():
    step = F.abs(F.col("x1") - F.col("x0")) + F.abs(F.col("y1") - F.col("y0"))
    return [(step >= 200, 0xB43232, 1), (step >= 100, 0x32A050, 0)]


_LINE_RULES_SQL = (
    "CASE WHEN abs(x1 - x0) + abs(y1 - y0) >= 200 THEN 11809330 "
    "WHEN abs(x1 - x0) + abs(y1 - y0) >= 100 THEN 3317840 "
    "ELSE 7895160 END"
)
_LINE_HW_SQL = (
    "CASE WHEN abs(x1 - x0) + abs(y1 - y0) >= 200 THEN 1 ELSE 0 END"
)


def q_render_line_tiles(spark, sf_dir):
    """Styled polyline raster render (operators/tiling.render_line_tiles):
    exact integer supercover rasterization — doubled pixel grid, per-column
    row bands from division-free floor/ceil — + Chebyshev stroke dilation
    and painter compositing, sharing the point arm's assembly/aggregates.
    The oracle replays quantize → column explode → row band → dilate →
    per-pixel arg_max → tile sums in integer SQL."""
    from geowave_spark.operators import tiling as OTL2

    pts = TB.geo_track_points(spark, sf_dir)
    segs = LN.line_segments(pts).withColumn(
        "seg_ord", F.col("track_id") * 4 + F.col("seg_j")
    )
    out = OTL2.render_line_tiles(
        segs, level=LINE_RENDER_LEVEL, rules=_line_rules_spark()
    )
    return out.select(
        "level", "tile_ix", "tile_iy", "painted", "sum_r", "sum_g", "sum_b", "chk"
    )


def _render_lines_oracle() -> str:
    res = LINE_RENDER_LEVEL + 8
    n = 1 << res
    r = 3  # STYLE_MAX_HALFWIDTH

    def idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS BIGINT)"

    gq = lambda c, off, span: (  # noqa: E731
        f"LEAST(GREATEST({idiv(f'({c} + {off}) * {n}', str(span))}, 0), {n - 1})"
    )
    return f"""
WITH geo_track_points AS ({TB.GEO_TRACK_POINTS_SQL}),
segs AS MATERIALIZED ({_LINES_SEGS_SQL}),
styled AS MATERIALIZED (
  SELECT track_id * 4 + seg_j AS ord,
         {_LINE_RULES_SQL} AS rgb, {_LINE_HW_SQL} AS hw,
         CASE WHEN g0x <= g1x THEN g0x ELSE g1x END AS xa,
         CASE WHEN g0x <= g1x THEN g0y ELSE g1y END AS ya,
         CASE WHEN g0x <= g1x THEN g1x ELSE g0x END AS xb,
         CASE WHEN g0x <= g1x THEN g1y ELSE g0y END AS yb
  FROM (
    SELECT *, {gq('x0', 180000, 360000)} AS g0x, {gq('y0', 90000, 180000)} AS g0y,
           {gq('x1', 180000, 360000)} AS g1x, {gq('y1', 90000, 180000)} AS g1y
    FROM segs
  ) s
),
colx AS MATERIALIZED (
  SELECT *, unnest(generate_series(xa, xb)) AS pxc FROM styled
),
bands AS MATERIALIZED (
  SELECT ord, rgb, hw, pxc,
         CASE WHEN dx = 0 THEN LEAST(ya, yb)
              ELSE {idiv('nmin + 3*dx - 1', 'NULLIF(2*dx, 0)')} - 1
         END AS py_lo,
         CASE WHEN dx = 0 THEN GREATEST(ya, yb)
              ELSE {idiv('nmax + dx', 'NULLIF(2*dx, 0)')}
         END AS py_hi
  FROM (
    SELECT *, LEAST(na, nb) AS nmin, GREATEST(na, nb) AS nmax
    FROM (
      SELECT *, 2*ya*dx + dy*(GREATEST(2*xa, 2*pxc - 1) - 2*xa) AS na,
             2*ya*dx + dy*(LEAST(2*xb, 2*pxc + 1) - 2*xa) AS nb
      FROM (
        SELECT *, 2*xb - 2*xa AS dx, 2*yb - 2*ya AS dy FROM colx
      ) d
    ) nn
  ) mm
),
sup AS MATERIALIZED (
  SELECT ord, rgb, hw, pxc AS sx,
         unnest(generate_series(GREATEST(py_lo, 0),
                                LEAST(py_hi, {n - 1}))) AS sy
  FROM bands
),
offs AS (SELECT unnest(generate_series(-{r}, {r})) AS d),
pix AS (
  SELECT s.ord, s.rgb, s.sx + ox.d AS gx, s.sy + oy.d AS gy
  FROM sup s, offs ox, offs oy
  WHERE abs(ox.d) <= s.hw AND abs(oy.d) <= s.hw
    AND s.sx + ox.d >= 0 AND s.sx + ox.d < {n}
    AND s.sy + oy.d >= 0 AND s.sy + oy.d < {n}
),
win AS (
  SELECT gx >> 8 AS tile_ix, gy >> 8 AS tile_iy,
         gx & 255 AS px, gy & 255 AS py,
         arg_max(rgb, ord) AS rgb
  FROM pix GROUP BY 1, 2, 3, 4
)
SELECT CAST({LINE_RENDER_LEVEL} AS BIGINT) AS level, tile_ix, tile_iy,
       COUNT(*) AS painted,
       CAST(SUM((rgb >> 16) & 255) AS BIGINT) AS sum_r,
       CAST(SUM((rgb >> 8) & 255) AS BIGINT) AS sum_g,
       CAST(SUM(rgb & 255) AS BIGINT) AS sum_b,
       bit_xor(((py * 256 + px) << 24) | rgb) AS chk
FROM win GROUP BY 2, 3
"""


register_extra("render_line_tiles", q_render_line_tiles, _render_lines_oracle())


# ---------------------------------------------------------------------------
# cluster_hulls_convex — the convex arm of cluster_hulls with a REAL SQL
# oracle, closing the registry's last no_oracle row (the concave dig stays
# pytest-pinned; the driver row keeps its rows-only status).  Clusters are
# deterministic 0.25° grid cells; the oracle derives the hull vertex set
# from first principles via the support-line characterization (p is a
# vertex iff some ray p→q keeps every other point strictly left or ahead),
# proven equivalent to the strict-turn monotone chain in
# tests/test_clustering.py::test_grid_hull_vertices_*.
# ---------------------------------------------------------------------------

HULL_CELL_MILLI = 250
HULL_MIN_PTS, HULL_MAX_PTS = 5, 120


def q_cluster_hulls_convex(spark, sf_dir):
    from geowave_spark.operators.clustering import grid_hull_vertices

    geo = TB.geo_events(spark, sf_dir)
    cells = geo.select(
        (
            F.floor((F.col("lon_milli") + 180_000) / HULL_CELL_MILLI) * 4096
            + F.floor((F.col("lat_milli") + 90_000) / HULL_CELL_MILLI)
        ).alias("cell"),
        F.col("lon_milli").alias("x"),
        F.col("lat_milli").alias("y"),
    )
    return grid_hull_vertices(
        cells, min_pts=HULL_MIN_PTS, max_pts=HULL_MAX_PTS
    )


def _cluster_hulls_convex_oracle() -> str:
    c = HULL_CELL_MILLI
    cross = "(q.x - p.x)*(r.y - p.y) - (q.y - p.y)*(r.x - p.x)"
    dot = "(r.x - p.x)*(q.x - p.x) + (r.y - p.y)*(q.y - p.y)"
    return f"""
WITH geo_events AS ({TB.GEO_EVENTS_SQL}),
pts AS MATERIALIZED (
  SELECT DISTINCT
         {_idiv_sql('lon_milli + 180000', c)} * 4096
         + {_idiv_sql('lat_milli + 90000', c)} AS cell,
         lon_milli AS x, lat_milli AS y
  FROM geo_events
),
sized AS MATERIALIZED (
  SELECT p.cell, p.x, p.y FROM pts p
  JOIN (SELECT cell, COUNT(*) AS n FROM pts GROUP BY cell) cc
    ON cc.cell = p.cell
  WHERE cc.n BETWEEN {HULL_MIN_PTS} AND {HULL_MAX_PTS}
)
SELECT DISTINCT p.cell, p.x, p.y
FROM sized p JOIN sized q
  ON q.cell = p.cell AND (q.x <> p.x OR q.y <> p.y)
WHERE NOT EXISTS (
  SELECT 1 FROM sized r
  WHERE r.cell = p.cell AND (r.x <> p.x OR r.y <> p.y)
    AND ({cross} < 0 OR ({cross} = 0 AND {dot} <= 0))
)
"""


register_extra(
    "cluster_hulls_convex", q_cluster_hulls_convex,
    _cluster_hulls_convex_oracle(),
)


# ---------------------------------------------------------------------------
# pack_sequences_bpe — the pluggable subword tokenizer closing the "regex
# counts aren't BPE counts" realism gap (functions/bpe.py): merges trained
# on the corpus itself (deterministic: sorted iteration, lexicographic tie
# break), counts via the Arrow-batched memoized encoder, packing through
# the SAME distributed prefix-sum machinery as pack_sequences.  The oracle
# is sf-dependent (a callable): it re-derives the merges and per-doc counts
# INDEPENDENTLY in pure python over a duckdb read of the same parquet, then
# replays the pack math (prefix sums, block cuts) in SQL over that
# (doc_id, token_count) VALUES table — the Spark side's UDF plumbing,
# broadcast closure, filter, and three-job prefix sum are all on trial.
# ---------------------------------------------------------------------------

BPE_MERGES = 48


def _train_corpus_bpe_spark(docs):
    from geowave_spark.functions import bpe as BPE
    from geowave_spark.operators import text as OTX2

    freqs = (
        docs.select(F.explode(OTX2.tokens_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )  # bounded by vocabulary size, not corpus size
    return BPE.train_bpe_from_word_counts(
        [(r["w"], r["count"]) for r in freqs], n_merges=BPE_MERGES
    )


def q_pack_sequences_bpe(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tok = _train_corpus_bpe_spark(docs)
    return OCORP.pack_sequences(docs, tokenizer=tok)


def _pack_bpe_oracle(sf_dir: str) -> str:
    import duckdb

    from geowave_spark.functions import bpe as BPE
    from geowave_spark.operators.text import py_tokens

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    freqs: dict[str, int] = {}
    for _, text in rows:
        for w in py_tokens(text or ""):
            freqs[w] = freqs.get(w, 0) + 1
    tok = BPE.BpeTokenizer(BPE.train_bpe(freqs, BPE_MERGES))
    counts = [(int(d), tok.count_text(t or "")) for d, t in rows]
    values = ", ".join(f"({d}, {n})" for d, n in counts if n > 0)
    block = OCORP.PACK_BLOCK
    return f"""
WITH counts(doc_id, n_tokens) AS (VALUES {values}),
pref AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM counts
)
SELECT doc_id, n_tokens, tok_start,
       CAST(tok_start // {block} AS BIGINT) AS seq_first,
       CAST((tok_start + n_tokens - 1) // {block} AS BIGINT) AS seq_last
FROM pref
"""


register_extra("pack_sequences_bpe", q_pack_sequences_bpe, _pack_bpe_oracle)


# ---------------------------------------------------------------------------
# track_frechet — the minimax DP gets a real SQL oracle after all (VERDICT
# r4 stretch item): the synthetic tracks have EXACTLY 5 vertices, so the
# Eiter–Mannila recurrence unrolls into 9 chained MATERIALIZED diagonal
# CTEs (the kmeans unrolled-Lloyd pattern — MATERIALIZED because each CTE
# is referenced by the next two diagonals and DuckDB re-inlines chained
# CTEs 2^N otherwise).  Candidates replay the engine's start-cell banding;
# everything is integer-exact (d² < 2^39).
# ---------------------------------------------------------------------------

FRECHET_CELL_MILLI = 2_000
FRECHET_TRACK_TARGET = 270  # tracks kept by the shared subsample


def _frechet_mod(n_events: int) -> int:
    """Scale-ADAPTIVE track subsample (the sf1-gate lesson: a fixed mod
    makes banded pair count quadratic in sf — measured 671 s at sf0.1).
    Keeping ~FRECHET_TRACK_TARGET tracks holds the candidate pair set
    sf-invariant, so the bench measures the operator, not the subsample;
    deterministic from the events row count, replayed by the oracle."""
    return max(37, n_events // FRECHET_TRACK_TARGET)


def q_track_frechet(spark, sf_dir):
    from geowave_spark.operators import tracks as OTR2

    mod = _frechet_mod(
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    tp = TB.geo_track_points(spark, sf_dir).filter(
        F.col("track_id") % mod == 0
    )
    pts = tp.select(
        "track_id", F.col("j").alias("pt_id"), F.col("j").alias("ts"),
        "x", "y",
    )
    return OTR2.track_frechet_pairs(pts, cell_milli=FRECHET_CELL_MILLI)


def _track_frechet_oracle(sf_dir: str) -> str:
    import duckdb

    con = duckdb.connect()
    n_events = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    con.close()
    return _track_frechet_oracle_sql(_frechet_mod(int(n_events)))


def _track_frechet_oracle_sql(track_mod: int) -> str:
    nv = TB.TRACK_N_VERTS
    piv_x = ", ".join(
        f"MAX(CASE WHEN j = {j} THEN x END) AS ax{j}" for j in range(nv)
    )
    piv_y = ", ".join(
        f"MAX(CASE WHEN j = {j} THEN y END) AS ay{j}" for j in range(nv)
    )
    bcols = ", ".join(
        f"b.ax{j} AS bx{j}, b.ay{j} AS by{j}" for j in range(nv)
    )
    c_cols = ", ".join(
        f"(ax{i} - bx{j}) * (ax{i} - bx{j}) "
        f"+ (ay{i} - by{j}) * (ay{i} - by{j}) AS c{i}{j}"
        for i in range(nv) for j in range(nv)
    )
    diag_ctes = []
    for k in range(1, 2 * nv - 1):
        exprs = []
        for i in range(nv):
            j = k - i
            if not 0 <= j < nv:
                continue
            c = f"c{i}{j}"
            if i == 0:
                e = f"GREATEST({c}, d0{j - 1})"
            elif j == 0:
                e = f"GREATEST({c}, d{i - 1}0)"
            else:
                e = (f"GREATEST({c}, LEAST(d{i - 1}{j}, d{i}{j - 1}, "
                     f"d{i - 1}{j - 1}))")
            exprs.append(f"{e} AS d{i}{j}")
        diag_ctes.append(
            f"d{k} AS MATERIALIZED (SELECT *, {', '.join(exprs)} FROM d{k - 1})"
        )
    gcell = lambda c, off: _idiv_sql(f"{c} + {off}", FRECHET_CELL_MILLI)  # noqa: E731
    diag_sql = ",\n".join(diag_ctes)
    a_cols = ", ".join(f"a.ax{j}, a.ay{j}" for j in range(nv))
    return f"""
WITH geo_track_points AS ({TB.GEO_TRACK_POINTS_SQL}),
tv AS MATERIALIZED (
  SELECT track_id, {piv_x}, {piv_y}
  FROM geo_track_points
  WHERE track_id % {track_mod} = 0
  GROUP BY track_id
),
base AS MATERIALIZED (
  SELECT a.track_id AS ta, b.track_id AS tb,
         {a_cols}, {bcols}
  FROM tv a JOIN tv b
    ON {gcell('a.ax0', 180000)} = {gcell('b.ax0', 180000)}
   AND {gcell('a.ay0', 90000)} = {gcell('b.ay0', 90000)}
   AND a.track_id < b.track_id
),
c AS MATERIALIZED (SELECT ta, tb, {c_cols} FROM base),
d0 AS (SELECT *, c00 AS d00 FROM c),
{diag_sql}
SELECT ta AS track_a, tb AS track_b, d{nv - 1}{nv - 1} AS frechet2,
       CAST({nv} AS BIGINT) AS n_a, CAST({nv} AS BIGINT) AS n_b
FROM d{2 * nv - 2}
"""


register_extra("track_frechet", q_track_frechet, _track_frechet_oracle)


# ---------------------------------------------------------------------------
# lines_cql — the tornado_tracks golden shape end-to-end THROUGH the CQL
# string surface (plans/cql.lines_cql_query): a top-level OR of a BBOX and
# a concave-polygon INTERSECTS over the segment-grain line store, unioned
# and per-track max-count deduped.  The oracle replays both predicates
# (same generated SQL text) and the max-dedup.
# ---------------------------------------------------------------------------

LINES_CQL = (
    "BBOX(geom, 138.6, 34.9, 140.5, 36.3) OR "
    "INTERSECTS(geom, POLYGON((2.0 48.4, 3.0 48.4, 3.0 49.3, "
    "2.35 48.9, 2.0 49.3)))"
)
_LINES_CQL_RINGS = [[(2_000, 48_400), (3_000, 48_400), (3_000, 49_300),
                     (2_350, 48_900), (2_000, 49_300)]]


def q_lines_cql(spark, sf_dir):
    from geowave_spark.plans.cql import lines_cql_query

    pts = TB.geo_track_points(spark, sf_dir)
    idx = LN.index_line_segments(LN.line_segments(pts))
    return lines_cql_query(idx, LINES_CQL)


def _lines_cql_oracle() -> str:
    box = LN.sql_seg_box(138_600, 34_900, 140_500, 36_300)
    poly = LN.sql_seg_poly_hit(_LINES_CQL_RINGS)
    return _lines_oracle_prefix() + f"""
SELECT track_id, MAX(n_segs_hit) AS n_segs_hit FROM (
  SELECT track_id, COUNT(*) AS n_segs_hit FROM segs
  WHERE {box} GROUP BY track_id
  UNION ALL
  SELECT track_id, COUNT(*) AS n_segs_hit FROM segs
  WHERE {poly} GROUP BY track_id
) u GROUP BY track_id
"""


register_extra("lines_cql", q_lines_cql, _lines_cql_oracle())


# ---------------------------------------------------------------------------
# lines_in_polygons — large×large LINE×polygon join: the geometry-join
# matrix row the line family completes.  The track LineStrings (milli-grid
# WKB) join the triangle table through the SHARED PBSM machinery + the
# geom_op_batch line∩polygon arm (operators/join.geometries_intersect_join
# — no new join code; the round-5 line kernels light the path up).  The
# oracle replays per (track, triangle): EXISTS a segment with an endpoint
# inside (3 half-planes, convex CCW) or a closed crossing against one of
# the 3 edges — expression-endpoint seg×edge SQL (lines.sql_seg_edge_expr),
# agreeing with the kernel even on boundary contact because a boundary
# endpoint always satisfies the crossing arm on both sides.
# ---------------------------------------------------------------------------

LINES_TRI_MOD = 211


def q_lines_in_polygons(spark, sf_dir):
    from geowave_spark.operators.join import geometries_intersect_join

    geo = TB.geo_events(spark, sf_dir)
    tri = geo.filter(
        (F.col("event_id") % LINES_TRI_MOD == 0)
        & (F.abs(F.col("lon_milli")) <= 180000 - _TRI_DX)
        & (F.abs(F.col("lat_milli")) <= 90000 - _TRI_DY)
    ).select(
        F.col("event_id").alias("poly_id"),
        _tri_wkb(
            F.col("lon_milli").cast("double"), F.col("lat_milli").cast("double")
        ).alias("wkb"),
    )
    pts = TB.geo_track_points(spark, sf_dir)
    lines_wkb = LN.tracks_to_wkb(LN.line_segments(pts), milli=True)
    return geometries_intersect_join(
        lines_wkb, tri, left_id="track_id", right_id="poly_id"
    ).select("track_id", "poly_id")


def _lines_in_polygons_oracle() -> str:
    dx, dy = _TRI_DX, _TRI_DY
    # CCW triangle vertices around seed (cx, cy): (cx, cy-dy),
    # (cx+dx, cy+dy), (cx-dx, cy+dy) — _tri_wkb's ring
    v = [("t.cx", f"t.cy - {dy}"), (f"t.cx + {dx}", f"t.cy + {dy}"),
         (f"t.cx - {dx}", f"t.cy + {dy}")]

    def inside(px: str, py: str) -> str:
        arms = []
        for i in range(3):
            ax, ay = v[i]
            bx, by = v[(i + 1) % 3]
            arms.append(
                f"(({bx}) - ({ax})) * ({py} - ({ay})) "
                f"- (({by}) - ({ay})) * ({px} - ({ax})) >= 0"
            )
        return "(" + " AND ".join(arms) + ")"

    crossing = " OR ".join(
        LN.sql_seg_edge_expr(*v[i], *v[(i + 1) % 3], "s.x0", "s.y0",
                             "s.x1", "s.y1")
        for i in range(3)
    )
    return f"""
WITH geo_track_points AS ({TB.GEO_TRACK_POINTS_SQL}),
segs AS MATERIALIZED ({_LINES_SEGS_SQL}),
geo_events AS MATERIALIZED ({TB.GEO_EVENTS_SQL}),
tri AS MATERIALIZED (
  SELECT event_id AS poly_id, lon_milli AS cx, lat_milli AS cy
  FROM geo_events
  WHERE event_id % {LINES_TRI_MOD} = 0
    AND abs(lon_milli) <= {180000 - dx} AND abs(lat_milli) <= {90000 - dy}
)
SELECT DISTINCT s.track_id, t.poly_id
FROM segs s JOIN tri t
  ON LEAST(s.x0, s.x1) <= t.cx + {dx} AND GREATEST(s.x0, s.x1) >= t.cx - {dx}
 AND LEAST(s.y0, s.y1) <= t.cy + {dy} AND GREATEST(s.y0, s.y1) >= t.cy - {dy}
WHERE {inside('s.x0', 's.y0')} OR {inside('s.x1', 's.y1')} OR ({crossing})
"""


register_extra(
    "lines_in_polygons", q_lines_in_polygons, _lines_in_polygons_oracle()
)
