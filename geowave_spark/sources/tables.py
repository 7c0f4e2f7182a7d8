"""Testdata loaders and deterministic geo-derived views.

The driver testdata (TPC-H-ish, /root/testdata/sf*/ — see TESTDATA.md) has no
coordinates, so spatial operators run over *derived* views that attach
deterministic lon/lat to integer keys.  The derivation uses ONLY integer
``*``, ``%``, ``CASE`` and a final ``/1000.0`` — every operation produces
bit-identical results in Spark SQL and DuckDB, so the DuckDB correctness
oracles replay the exact same geometry.

The spatial distribution is intentionally skewed like real imagery corpora
(the reference's hot-tile concern that motivates its hash-prefix partitioner,
HashKeyIndexStrategy.java): 80% of rows land in 5 "urban" blobs of ±1°, 20%
uniform world-wide.  This drives the salting/AQE-skew behavior we benchmark.

NOTE on the hash: ``(id * KNUTH) % 2^32`` is test scaffolding sized for the
sandbox's ≤2^40 ids; production ingest uses ``F.xxhash64`` (no overflow at
10^12 rows) — the operators never depend on this particular derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Five hot-blob centers in milli-degrees (NYC, Paris, Tokyo, LA, Delhi).
BLOBS_MILLI = [
    (-73_985, 40_758),
    (2_352, 48_857),
    (139_692, 35_690),
    (-118_243, 34_052),
    (77_209, 28_614),
]

_LON_CASE = " ".join(
    f"WHEN {i} THEN {lon}" for i, (lon, _) in enumerate(BLOBS_MILLI[:-1])
) + f" ELSE {BLOBS_MILLI[-1][0]}"
_LAT_CASE = " ".join(
    f"WHEN {i} THEN {lat}" for i, (_, lat) in enumerate(BLOBS_MILLI[:-1])
) + f" ELSE {BLOBS_MILLI[-1][1]}"

# Shared Spark-SQL/DuckDB derivation: events → georeferenced points.
# 80% hot (±1° around a blob center), 20% uniform.  lat limited to ±85°.
GEO_EVENTS_SQL = f"""
SELECT event_id, ts, user_id, event_type, value,
       lon_milli, lat_milli,
       CAST(lon_milli AS DOUBLE) / CAST(1000 AS DOUBLE) AS lon,
       CAST(lat_milli AS DOUBLE) / CAST(1000 AS DOUBLE) AS lat
FROM (
  SELECT event_id, ts, user_id, event_type, value,
         CASE WHEN h1 % 10 < 8
              THEN (CASE h2 % 5 {_LON_CASE} END) + (h1 % 2001) - 1000
              ELSE (h1 % 360000) - 180000 END AS lon_milli,
         CASE WHEN h1 % 10 < 8
              THEN (CASE h2 % 5 {_LAT_CASE} END) + (h2 % 2001) - 1000
              ELSE (h2 % 170000) - 85000 END AS lat_milli
  FROM (
    SELECT event_id, ts, user_id, event_type, value,
           (event_id * 2654435761) % 4294967296 AS h1,
           ((event_id + 1) * 2246822519) % 4294967296 AS h2
    FROM events
  ) hashed
) located
"""

# events → square image footprints (envelopes) for tile-assignment parity.
# Half-extent ∈ {32..1024} milli-deg; envelopes clamped to the world box.
# ``native_level`` is the closed-form of the extent tier rule
# (finest r with ext*2^r <= 180000): exact for these power-of-two extents.
GEO_FOOTPRINTS_SQL = """
SELECT event_id, ts, lon_milli, lat_milli, half_m,
       2 * half_m AS ext_m,
       CASE hk WHEN 0 THEN 11 WHEN 1 THEN 10 WHEN 2 THEN 9
               WHEN 3 THEN 8 WHEN 4 THEN 7 ELSE 6 END AS native_level,
       CASE WHEN lon_milli - half_m < -180000 THEN -180000
            ELSE lon_milli - half_m END AS minx_m,
       CASE WHEN lat_milli - half_m < -90000 THEN -90000
            ELSE lat_milli - half_m END AS miny_m,
       CASE WHEN lon_milli + half_m > 179999 THEN 179999
            ELSE lon_milli + half_m END AS maxx_m,
       CASE WHEN lat_milli + half_m > 89999 THEN 89999
            ELSE lat_milli + half_m END AS maxy_m
FROM (
  SELECT *,
         (event_id * 40503) % 6 AS hk,
         CASE (event_id * 40503) % 6
              WHEN 0 THEN 32 WHEN 1 THEN 64 WHEN 2 THEN 128
              WHEN 3 THEN 256 WHEN 4 THEN 512 ELSE 1024 END AS half_m
  FROM ({GEO_EVENTS})
) sized
""".replace("{GEO_EVENTS}", GEO_EVENTS_SQL)


# events → short polyline tracks (the tornado_tracks / GPX model: many
# bounded-extent LINESTRINGs).  Each event seeds one 5-vertex zigzag track
# anchored at its geo point; step/wobble are hash-derived integers ≤ ~0.3°
# so every track stays local (envelope ≤ ~1.3° per axis) and the whole
# derivation is closed-form in (event_id, j) — the SAME SQL text runs in
# Spark and DuckDB (vertex fan-out is a literal 5-row cross join, no
# lateral).  Coordinates clamped to the world box with GREATEST/LEAST.
TRACK_N_VERTS = 5

_TRACK_PARAMS_SQL = f"""
  SELECT event_id AS track_id, lon_milli, lat_milli,
         ((event_id * 40503) % 7 - 3) * 60 AS sx,
         ((event_id * 69069) % 7 - 3) * 60 AS sy,
         ((event_id * 12345) % 5 - 2) * 35 AS wx,
         ((event_id * 31337) % 5 - 2) * 35 AS wy
  FROM ({GEO_EVENTS_SQL}) ge
"""

_TRACK_JS = " UNION ALL ".join(
    f"SELECT {j} AS j" for j in range(TRACK_N_VERTS)
)

GEO_TRACK_POINTS_SQL = f"""
SELECT track_id, j,
       GREATEST(-179999, LEAST(179999,
           lon_milli + j * sx + (j % 2) * wx)) AS x,
       GREATEST(-89999, LEAST(89999,
           lat_milli + j * sy - (j % 2) * wy)) AS y
FROM ({_TRACK_PARAMS_SQL}) par
CROSS JOIN ({_TRACK_JS}) js
"""


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Register each testdata parquet as a temp view; return the DataFrames."""
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    df = spark.sql(GEO_EVENTS_SQL)
    df.createOrReplaceTempView("geo_events")
    return df


def geo_footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    df = spark.sql(GEO_FOOTPRINTS_SQL)
    df.createOrReplaceTempView("geo_footprints")
    return df


def geo_track_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered polyline vertices: (track_id, j, x, y) — milli-degree ints."""
    load_tables(spark, sf_dir, names=("events",))
    df = spark.sql(GEO_TRACK_POINTS_SQL)
    df.createOrReplaceTempView("geo_track_points")
    return df


def oracle_with(derivation_sql: str, view: str, body: str) -> str:
    """Wrap an oracle query body with the shared derivation as a CTE."""
    return f"WITH {view} AS ({derivation_sql})\n{body}"
