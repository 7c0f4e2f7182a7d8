"""Format ingest plugins (SURVEY §2.2, reference ``extensions/formats/*``).

The reference ships per-format ``LocalFileIngestPlugin``s that walk local
files and emit typed SimpleFeatures, one iterator row at a time
(extensions/formats/gdelt/.../GDELTIngestPlugin.java,
tdrive/.../TdriveIngestPlugin.java, geolife/.../GeoLifeIngestPlugin.java,
gpx/.../GpxIngestPlugin.java, twitter).  Re-expressed Spark-first:

* line-oriented formats (GDELT TSV, T-Drive CSV, GeoLife PLT) are native
  ``spark.read.csv``/``spark.read.text`` scans — splittable, predicate-
  pushdown-able, zero Python in the parse path;
* record-per-file XML (GPX) is a ``binaryFile`` scan + one Arrow-batched
  ``mapInPandas`` parse kernel (embarrassingly parallel per file — the
  right shape for millions of small track files);
* JSON (Twitter) is ``spark.read.json`` + column extraction.

Every reader returns a typed feature DataFrame whose ``lon``/``lat``/``ts``
columns feed directly into :func:`geowave_spark.operators.index.index_points`
— the IndexWriter ingest path — so a format plugin here is exactly
"reader → index_points → write_indexed".

Malformed rows are DROPPED via ``try_cast``/``try_to_timestamp`` (the
reference plugins log-and-skip unparseable rows, e.g.
GDELTIngestPlugin.java:228-246's catch-continue) — never a job failure,
never a silent wrong value; ANSI mode stays on for everything downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# GDELT (tab-separated event records; column ids from GDELTUtils.java:61-101)
# ---------------------------------------------------------------------------

GDELT_N_COLS = 58
GDELT_EVENT_ID = 0          # GDELT_EVENT_ID_COLUMN_ID
GDELT_DATE = 1              # GDELT_TIMESTAMP_COLUMN_ID (yyyyMMdd)
GDELT_ACTOR1_NAME = 6       # ACTOR_1_NAME_COLUMN_ID
GDELT_ACTOR2_NAME = 16      # ACTOR_2_NAME_COLUMN_ID
GDELT_NUM_MENTIONS = 31     # NUM_MENTIONS_COLUMN_ID
GDELT_NUM_SOURCES = 32      # NUM_SOURCES_COLUMN_ID
GDELT_NUM_ARTICLES = 33     # NUM_ARTICLES_COLUMN_ID
GDELT_AVG_TONE = 34         # AVG_TONE_COLUMN_ID
GDELT_ACTOR1_CC = 37        # ACTOR_1_COUNTRY_CODE_COLUMN_ID
GDELT_ACTOR2_CC = 44        # ACTOR_2_COUNTRY_CODE_COLUMN_ID
GDELT_GEO_TYPE = 49         # GDELT_ACTION_GEO_TYPE_COLUMN_ID
GDELT_COUNTRY_CC = 51       # ACTION_COUNTRY_CODE_COLUMN_ID
GDELT_LAT = 53              # GDELT_ACTION_LATITUDE_COLUMN_ID
GDELT_LON = 54              # GDELT_ACTION_LONGITUDE_COLUMN_ID
GDELT_SOURCE_URL = 57       # SOURCE_URL_COLUMN_ID

_GDELT_SCHEMA = T.StructType(
    [T.StructField(f"_c{i}", T.StringType()) for i in range(GDELT_N_COLS)]
)


def read_gdelt(spark: SparkSession, path: str) -> DataFrame:
    """GDELT 1.0 event TSV → typed feature frame.

    Mirrors GDELTIngestPlugin.java:228-346 field extraction: rows without a
    usable action geography (geo type < 1 per GDELTUtils, or unparseable
    lat/lon) are skipped, everything else is typed.  The scan is a plain
    splittable CSV read — at 100 TB this is N parallel text splits with the
    projection pushed to the parser (only referenced positions are kept)."""
    c = lambda i: F.col(f"_c{i}")  # noqa: E731
    raw = spark.read.csv(path, sep="\t", header=False, schema=_GDELT_SCHEMA)
    out = raw.select(
        c(GDELT_EVENT_ID).try_cast("long").alias("event_id"),
        F.try_to_timestamp(c(GDELT_DATE), F.lit("yyyyMMdd")).alias("ts"),
        c(GDELT_ACTOR1_NAME).alias("actor1"),
        c(GDELT_ACTOR2_NAME).alias("actor2"),
        c(GDELT_NUM_MENTIONS).try_cast("int").alias("num_mentions"),
        c(GDELT_NUM_SOURCES).try_cast("int").alias("num_sources"),
        c(GDELT_NUM_ARTICLES).try_cast("int").alias("num_articles"),
        c(GDELT_AVG_TONE).try_cast("double").alias("avg_tone"),
        c(GDELT_ACTOR1_CC).alias("actor1_cc"),
        c(GDELT_ACTOR2_CC).alias("actor2_cc"),
        c(GDELT_GEO_TYPE).try_cast("int").alias("geo_type"),
        c(GDELT_COUNTRY_CC).alias("country_code"),
        c(GDELT_LAT).try_cast("double").alias("lat"),
        c(GDELT_LON).try_cast("double").alias("lon"),
        c(GDELT_SOURCE_URL).alias("source_url"),
    )
    return out.filter(
        F.col("event_id").isNotNull()
        & (F.coalesce(F.col("geo_type"), F.lit(0)) >= 1)
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    )


def gdelt_line_col(fields: dict[int, Column], n_cols: int = GDELT_N_COLS) -> Column:
    """Build a GDELT TSV line from a sparse {column index → Column} map —
    the export/round-trip twin of :func:`read_gdelt` (unmapped positions are
    empty, as in real GDELT extracts with unused fields)."""
    cols = [
        fields[i].cast("string") if i in fields else F.lit("")
        for i in range(n_cols)
    ]
    # concat_ws skips NULLs (would shift columns); make missing explicit ''
    return F.concat_ws("\t", *[F.coalesce(col, F.lit("")) for col in cols])


# ---------------------------------------------------------------------------
# T-Drive (taxi traces: "taxiid,yyyy-MM-dd HH:mm:ss,lon,lat" per line;
# TdriveIngestPlugin.java:128-142)
# ---------------------------------------------------------------------------

_TDRIVE_SCHEMA = "taxiid INT, ts_raw STRING, lon DOUBLE, lat DOUBLE"


def read_tdrive(spark: SparkSession, path: str) -> DataFrame:
    """T-Drive CSV → per-point features (taxiid, pointinstance, ts, lon, lat).

    ``pointinstance`` re-creates the plugin's per-trace running counter
    (TdriveIngestPlugin.java:125-146) declaratively: a row_number window per
    taxi in time order — one shuffle keyed by taxiid, which is exactly the
    partitioning a trajectory pipeline wants next anyway."""
    raw = spark.read.csv(path, header=False, schema=_TDRIVE_SCHEMA)
    pts = (
        raw.withColumn(
            "ts", F.try_to_timestamp("ts_raw", F.lit("yyyy-MM-dd HH:mm:ss"))
        )
        .drop("ts_raw")
        .filter(
            F.col("taxiid").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("lon").isNotNull()
            & F.col("lat").isNotNull()
        )
    )
    w = Window.partitionBy("taxiid").orderBy("ts", "lon", "lat")
    return pts.withColumn("pointinstance", F.row_number().over(w) - 1)


# ---------------------------------------------------------------------------
# GeoLife (.plt trajectory files: 6 header lines then
# "lat,lon,0,alt_ft,days,yyyy-MM-dd,HH:mm:ss"; GeoLifeIngestPlugin.java:198-243)
# ---------------------------------------------------------------------------


def read_geolife(spark: SparkSession, path: str) -> DataFrame:
    """GeoLife PLT → per-point features; track id from the file name (the
    plugin derives it from the path).  Header lines simply fail the numeric
    casts and drop out — no per-file imperative skip-6-lines state, so the
    read stays a plain splittable text scan."""
    raw = spark.read.text(path).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.plt$", 1).alias("trackid"),
        F.split(F.col("value"), ",").alias("p"),
    )
    out = raw.filter(F.size("p") == 7).select(
        "trackid",
        F.element_at("p", 1).try_cast("double").alias("lat"),
        F.element_at("p", 2).try_cast("double").alias("lon"),
        F.element_at("p", 4).try_cast("double").alias("elevation_ft"),
        F.try_to_timestamp(
            F.concat_ws(" ", F.element_at("p", 6), F.element_at("p", 7)),
            F.lit("yyyy-MM-dd HH:mm:ss"),
        ).alias("ts"),
    )
    out = out.filter(
        F.col("lat").isNotNull() & F.col("lon").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("trackid").orderBy("ts", "lat", "lon")
    return out.withColumn("pointinstance", F.row_number().over(w) - 1)


# ---------------------------------------------------------------------------
# GPX (XML; GpxIngestPlugin.java / GPXConsumer.java / GpxUtils.java:238-300)
# ---------------------------------------------------------------------------

GPX_POINT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("kind", T.StringType()),     # wpt | trkpt | rtept
        T.StructField("trk", T.IntegerType()),     # track/route index in file, -1 for wpt
        T.StructField("seg", T.IntegerType()),     # segment index, -1 outside tracks
        T.StructField("idx", T.IntegerType()),     # point index within segment
        T.StructField("name", T.StringType()),     # owning trk/rte/wpt name
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("ele", T.DoubleType()),
        T.StructField("time_raw", T.StringType()),
    ]
)


def read_gpx(spark: SparkSession, path: str) -> DataFrame:
    """GPX files → one row per waypoint/trackpoint/routepoint.

    One XML parse per file inside an Arrow-batched ``mapInPandas`` kernel
    (files are the natural parallel grain for GPX — the reference's consumer
    is also a per-file stream parser, GPXConsumer.java).  Namespace-agnostic
    tag matching, bad points skipped like the plugin's catch-continue."""

    def kernel(batches):
        import xml.etree.ElementTree as ET

        import pandas as pd

        def local(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        cols = [f.name for f in GPX_POINT_SCHEMA.fields]

        def pt_row(el, fname, kind, trk, seg, idx, name):
            try:
                lat, lon = float(el.get("lat")), float(el.get("lon"))
            except (TypeError, ValueError):
                return None
            ele, tm = None, None
            for ch in el:
                lt = local(ch.tag)
                if lt == "ele":
                    try:
                        ele = float(ch.text)
                    except (TypeError, ValueError):
                        ele = None
                elif lt == "time" and ch.text:
                    tm = ch.text.strip()
                elif lt == "name" and name is None:
                    name = ch.text
            return (fname, kind, trk, seg, idx, name, lat, lon, ele, tm)

        for b in batches:
            rows = []
            for r in b.itertuples():
                try:
                    root = ET.fromstring(bytes(r.content))
                except ET.ParseError:
                    continue  # unreadable file: skip, like the plugin
                ti = 0
                for el in root:
                    lt = local(el.tag)
                    if lt == "wpt":
                        row = pt_row(el, r.path, "wpt", -1, -1, 0, None)
                        if row:
                            rows.append(row)
                    elif lt in ("trk", "rte"):
                        name = next(
                            (c.text for c in el if local(c.tag) == "name"), None
                        )
                        if lt == "rte":
                            pts = [c for c in el if local(c.tag) == "rtept"]
                            for i, p in enumerate(pts):
                                row = pt_row(p, r.path, "rtept", ti, -1, i, name)
                                if row:
                                    rows.append(row)
                        else:
                            si = 0
                            for segel in el:
                                if local(segel.tag) != "trkseg":
                                    continue
                                pts = [c for c in segel if local(c.tag) == "trkpt"]
                                for i, p in enumerate(pts):
                                    row = pt_row(p, r.path, "trkpt", ti, si, i, name)
                                    if row:
                                        rows.append(row)
                                si += 1
                        ti += 1
            pdf = pd.DataFrame(rows, columns=cols)
            for icol in ("trk", "seg", "idx"):
                pdf[icol] = pdf[icol].astype("int32")
            yield pdf

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(kernel, GPX_POINT_SCHEMA)


def gpx_tracks(points: DataFrame) -> DataFrame:
    """Per-track summary features matching the reference's GPX track type
    (GpxUtils.java:238-300: Name, StartTimeStamp, EndTimeStamp, Duration,
    NumberPoints, TrackId) + the bbox used for envelope indexing.  Pure
    groupBy aggregation — the track "geometry build" the plugin does
    imperatively is declarative here (map-side partial aggregation)."""
    p = points.filter(F.col("kind") == "trkpt").withColumn(
        "ts", F.try_to_timestamp("time_raw")
    )
    return p.groupBy("file", "trk").agg(
        F.max("name").alias("name"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
        F.count(F.lit(1)).alias("n_points"),
        F.min("lon").alias("minx"),
        F.min("lat").alias("miny"),
        F.max("lon").alias("maxx"),
        F.max("lat").alias("maxy"),
    )


def gpx_doc_xml(track_rows) -> str:
    """Single-line GPX document from an iterable of
    ``(track_name, [(lat, lon, ele, time_iso), ...])`` — the writer twin of
    :func:`read_gpx` for export and round-trip tests."""
    parts = ['<?xml version="1.0"?><gpx version="1.1" creator="geowave_spark">']
    for name, pts in track_rows:
        parts.append(f"<trk><name>{name}</name><trkseg>")
        for lat, lon, ele, tm in pts:
            seg = f'<trkpt lat="{lat}" lon="{lon}">'
            if ele is not None:
                seg += f"<ele>{ele}</ele>"
            if tm is not None:
                seg += f"<time>{tm}</time>"
            parts.append(seg + "</trkpt>")
        parts.append("</trkseg></trk>")
    parts.append("</gpx>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Twitter (JSON statuses with GeoJSON point coordinates)
# ---------------------------------------------------------------------------


def read_twitter(spark: SparkSession, path: str) -> DataFrame:
    """Tweet JSON → point features.  ``spark.read.json`` does the heavy
    lifting (schema inference or a caller-supplied schema at scale);
    geometry comes from the GeoJSON ``coordinates`` member ([lon, lat]).
    Twitter's legacy ``created_at`` ("Wed Aug 27 13:08:45 +0000 2008") needs
    the day-name stripped — Spark's parser rejects text day-of-week fields —
    so we parse the tail and coalesce with plain ISO for modern dumps."""
    raw = spark.read.json(path)
    cols = set(raw.columns)
    if "coordinates" in cols:
        lon = F.col("coordinates.coordinates").getItem(0)
        lat = F.col("coordinates.coordinates").getItem(1)
    elif "geo" in cols:  # legacy [lat, lon] order
        lon = F.col("geo.coordinates").getItem(1)
        lat = F.col("geo.coordinates").getItem(0)
    else:
        raise ValueError("twitter input has neither 'coordinates' nor 'geo'")
    created = F.col("created_at").cast("string")
    ts = F.coalesce(
        F.try_to_timestamp(created),
        F.try_to_timestamp(
            F.substring(created, 5, 128), F.lit("MMM dd HH:mm:ss xx yyyy")
        ),
    )
    out = raw.select(
        F.col("id_str").alias("tweet_id"),
        ts.alias("ts"),
        F.col("text").alias("text"),
        lon.cast("double").alias("lon"),
        lat.cast("double").alias("lat"),
    )
    return out.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())


# ---------------------------------------------------------------------------
# STANAG 4676 (NATO track XML; Stanag4676IngestPlugin.java,
# parser/NATO4676Decoder.java:248-470 readTrackMessage/readTrackEvent/
# readTrackPoint, parser/NATO4676Encoder.java:264-368 the emit shape,
# IngestMessageHandler.java:85-244 the per-point feature projection)
# ---------------------------------------------------------------------------

_XSI = "{http://www.w3.org/2001/XMLSchema-instance}type"

STANAG_POINT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("track_uuid", T.StringType()),
        T.StructField("track_number", T.StringType()),
        T.StructField("track_status", T.StringType()),
        T.StructField("track_classification", T.StringType()),
        T.StructField("item_uuid", T.StringType()),
        T.StructField("time_raw", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("course", T.DoubleType()),
    ]
)


def read_stanag4676(spark: SparkSession, path: str) -> DataFrame:
    """STANAG 4676 TrackMessage XML files → one row per TrackPoint.

    Mirrors the reference decode surface that its ingest actually consumes
    (NATO4676Decoder.readTrackMessage → readTrackEvent → readTrackPoint;
    IngestMessageHandler keeps track uuid/number/status/classification +
    point uuid/time/position/speed/course): ``tracks`` children of the
    message, ``items`` children with ``xsi:type="TrackPoint"`` (other item
    kinds — classification/management/motion-imagery — are skipped, like
    the handler's point-only loop), nested ``trackPointPosition``
    latitude/longitude.  One XML parse per file inside an Arrow-batched
    kernel (same grain as the GPX reader); unparseable files and points
    without a position are skipped like the plugin's catch-continue."""

    def kernel(batches):
        import xml.etree.ElementTree as ET

        import pandas as pd

        def local(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        def text(el) -> str | None:
            return el.text.strip() if el.text and el.text.strip() else None

        cols = [f.name for f in STANAG_POINT_SCHEMA.fields]

        def point_row(item, fname, trk):
            uuid = tm = None
            lat = lon = speed = course = None
            for ch in item:
                lt = local(ch.tag)
                if lt == "trackItemUUID":
                    uuid = text(ch)
                elif lt == "trackItemTime":
                    tm = text(ch)
                elif lt == "trackPointPosition":
                    for p in ch:
                        pt = local(p.tag)
                        try:
                            if pt == "latitude":
                                lat = float(p.text)
                            elif pt == "longitude":
                                lon = float(p.text)
                        except (TypeError, ValueError):
                            pass
                elif lt == "trackPointSpeed":
                    try:
                        speed = float(ch.text)
                    except (TypeError, ValueError):
                        speed = None
                elif lt == "trackPointCourse":
                    try:
                        course = float(ch.text)
                    except (TypeError, ValueError):
                        course = None
            if lat is None or lon is None:
                return None  # positionless point: skip, like the handler
            return (fname, *trk, uuid, tm, lat, lon, speed, course)

        for b in batches:
            rows = []
            for r in b.itertuples():
                try:
                    root = ET.fromstring(bytes(r.content))
                except ET.ParseError:
                    continue
                if local(root.tag) != "TrackMessage":
                    continue  # MissionSummaryMessage etc: no point features
                for track in root:
                    if local(track.tag) != "tracks":
                        continue
                    uuid = num = status = cls = None
                    for ch in track:
                        lt = local(ch.tag)
                        if lt == "trackUUID":
                            uuid = text(ch)
                        elif lt == "trackNumber":
                            num = text(ch)
                        elif lt == "trackStatus":
                            status = text(ch)
                        elif lt == "trackSecurity":
                            cls = next(
                                (
                                    text(c)
                                    for c in ch
                                    if local(c.tag) == "securityClassification"
                                ),
                                None,
                            )
                    trk = (uuid, num, status, cls)
                    for item in track:
                        if (
                            local(item.tag) == "items"
                            and item.get(_XSI) == "TrackPoint"
                        ):
                            row = point_row(item, r.path, trk)
                            if row:
                                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(kernel, STANAG_POINT_SCHEMA)


def stanag_track_summary(points: DataFrame) -> DataFrame:
    """Per-track summary (the handler's track-line feature: point count,
    time span, bbox) — declarative groupBy over the point rows."""
    p = points.withColumn(
        "ts", F.to_timestamp("time_raw", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    )
    return p.groupBy("track_uuid").agg(
        F.max("track_number").alias("track_number"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_points"),
        F.min("lon").alias("minx"),
        F.min("lat").alias("miny"),
        F.max("lon").alias("maxx"),
        F.max("lat").alias("maxy"),
    )


def stanag_doc_xml(tracks) -> str:
    """Single TrackMessage document from an iterable of
    ``(track_uuid, track_number, status, classification,
    [(item_uuid, time_iso, lat, lon, speed, course), ...])`` — the writer
    twin of :func:`read_stanag4676`, matching the reference encoder's
    element shape (NATO4676Encoder.java:150,226,264-368)."""
    parts = [
        '<?xml version="1.0"?>',
        '<TrackMessage xmlns="urn:int:nato:stanag4676:0.14" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'schemaVersion="0.14">',
        "<stanagVersion>1.0</stanagVersion>",
    ]
    for uuid, num, status, cls, pts in tracks:
        parts.append(
            f"<tracks><trackUUID>{uuid}</trackUUID>"
            f"<trackNumber>{num}</trackNumber>"
            f"<trackStatus>{status}</trackStatus>"
            f"<trackSecurity><securityClassification>{cls}"
            "</securityClassification><securityPolicyName>NATO"
            "</securityPolicyName></trackSecurity>"
            "<exerciseIndicator>OPERATIONAL</exerciseIndicator>"
            "<simulationIndicator>REAL</simulationIndicator>"
        )
        for item_uuid, tm, lat, lon, speed, course in pts:
            parts.append(
                '<items xsi:type="TrackPoint">'
                f"<trackItemUUID>{item_uuid}</trackItemUUID>"
                "<trackItemSecurity><securityClassification>UNCLASSIFIED"
                "</securityClassification></trackItemSecurity>"
                f"<trackItemTime>{tm}</trackItemTime>"
                "<trackPointPosition>"
                f"<latitude>{lat}</latitude><longitude>{lon}</longitude>"
                "</trackPointPosition>"
                f"<trackPointSpeed>{speed}</trackPointSpeed>"
                f"<trackPointCourse>{course}</trackPointCourse>"
                "<trackPointType>MANUAL_ESTIMATED</trackPointType>"
                "</items>"
            )
        parts.append("</tracks>")
    parts.append("</TrackMessage>")
    return "".join(parts)
