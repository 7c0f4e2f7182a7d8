"""Format ingest plugins (SURVEY §2.2, reference extensions/formats/*):
GDELT TSV, T-Drive CSV, GeoLife PLT, GPX XML, Twitter JSON.

Each test writes a tiny fixture file of the real on-disk format and checks
typed extraction, malformed-row skipping, and (for GPX) the track-summary
aggregation against hand-computed values."""

import json

from geowave_spark.sources import formats as FMT


def _gdelt_line(**kw):
    f = [""] * FMT.GDELT_N_COLS
    for k, v in kw.items():
        f[getattr(FMT, f"GDELT_{k}")] = str(v)
    return "\t".join(f)


def test_gdelt_reader(spark, tmp_path):
    lines = [
        _gdelt_line(
            EVENT_ID=101, DATE="20240301", ACTOR1_NAME="GOV", ACTOR2_NAME="PRESS",
            NUM_MENTIONS=4, NUM_SOURCES=2, NUM_ARTICLES=3, AVG_TONE="-1.25",
            ACTOR1_CC="USA", ACTOR2_CC="FRA", GEO_TYPE=3, COUNTRY_CC="US",
            LAT="40.7", LON="-74.0", SOURCE_URL="http://example.com/a",
        ),
        # geo type 0 = no usable geography -> skipped (GDELTIngestPlugin)
        _gdelt_line(EVENT_ID=102, DATE="20240301", GEO_TYPE=0, LAT="1", LON="1"),
        # malformed lat -> skipped, not a job failure
        _gdelt_line(EVENT_ID=103, DATE="20240301", GEO_TYPE=1, LAT="oops", LON="2"),
    ]
    p = tmp_path / "ev.tsv"
    p.write_text("\n".join(lines) + "\n")

    rows = FMT.read_gdelt(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.event_id, r.actor1, r.actor2) == (101, "GOV", "PRESS")
    assert (r.num_mentions, r.num_sources, r.num_articles) == (4, 2, 3)
    assert r.avg_tone == -1.25
    assert (r.lat, r.lon) == (40.7, -74.0)
    assert (r.geo_type, r.country_code) == (3, "US")
    assert str(r.ts).startswith("2024-03-01")
    assert r.source_url == "http://example.com/a"


def test_gdelt_line_col_roundtrip(spark):
    """Writer twin: a sparse field map renders at the right positions and
    survives the reader."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        FMT.gdelt_line_col(
            {
                FMT.GDELT_EVENT_ID: F.col("id"),
                FMT.GDELT_DATE: F.lit("20240115"),
                FMT.GDELT_GEO_TYPE: F.lit(1),
                FMT.GDELT_LAT: F.lit("10.5"),
                FMT.GDELT_LON: F.lit("-3.25"),
            }
        ).alias("line")
    )
    lines = [r.line for r in df.collect()]
    assert all(len(ln.split("\t")) == FMT.GDELT_N_COLS for ln in lines)
    assert lines[0].split("\t")[FMT.GDELT_LON] == "-3.25"


def test_tdrive_reader(spark, tmp_path):
    p = tmp_path / "1.txt"
    p.write_text(
        "1,2008-02-02 15:36:08,116.51172,39.92123\n"
        "1,2008-02-02 15:46:08,116.51135,39.93883\n"
        "2,2008-02-02 15:30:00,116.60000,39.90000\n"
        "bad line,,,\n"
    )
    rows = FMT.read_tdrive(spark, str(p)).orderBy("taxiid", "pointinstance").collect()
    assert [(r.taxiid, r.pointinstance) for r in rows] == [(1, 0), (1, 1), (2, 0)]
    assert rows[0].lon == 116.51172 and rows[0].lat == 39.92123
    assert str(rows[2].ts) == "2008-02-02 15:30:00"


def test_geolife_reader(spark, tmp_path):
    header = "\n".join(["Geolife trajectory", "WGS 84", "Altitude is in Feet",
                        "Reserved 3", "0,2,255,My Track,0,0,2,8421376", "0"])
    p = tmp_path / "20081023025304.plt"
    p.write_text(
        header + "\n"
        "39.906631,116.385564,0,492,39925.4486,2009-04-22,10:46:00\n"
        "39.906554,116.385625,0,492,39925.4486,2009-04-22,10:46:05\n"
    )
    rows = FMT.read_geolife(spark, str(p)).orderBy("pointinstance").collect()
    assert len(rows) == 2  # the 6 header lines dropped by the casts
    assert rows[0].trackid == "20081023025304"
    assert rows[0].lat == 39.906631 and rows[0].lon == 116.385564
    assert rows[0].elevation_ft == 492.0
    assert str(rows[1].ts) == "2009-04-22 10:46:05"
    assert [r.pointinstance for r in rows] == [0, 1]


def test_gpx_reader_and_tracks(spark, tmp_path):
    doc = FMT.gpx_doc_xml(
        [
            ("morning", [(40.0, -74.0, 12.5, "2024-01-01T08:00:00"),
                         (40.1, -74.2, None, "2024-01-01T08:10:00")]),
            ("evening", [(41.0, -73.0, None, "2024-01-01T18:00:00")]),
        ]
    )
    # splice in a waypoint to exercise the wpt arm
    doc = doc.replace(
        "</gpx>", '<wpt lat="39.5" lon="-75.5"><name>home</name></wpt></gpx>'
    )
    p = tmp_path / "a.gpx"
    p.write_text(doc)

    pts = FMT.read_gpx(spark, str(p))
    rows = pts.orderBy("kind", "trk", "idx").collect()
    kinds = [r.kind for r in rows]
    assert kinds == ["trkpt", "trkpt", "trkpt", "wpt"]
    assert rows[0].name == "morning" and rows[0].ele == 12.5
    assert rows[3].name == "home" and rows[3].lat == 39.5

    tr = {r.trk: r for r in FMT.gpx_tracks(pts).collect()}
    assert tr[0].n_points == 2 and tr[0].name == "morning"
    assert tr[0].duration_ms == 600_000
    assert (tr[0].minx, tr[0].maxy) == (-74.2, 40.1)
    assert tr[1].n_points == 1 and tr[1].duration_ms == 0


def test_twitter_reader(spark, tmp_path):
    tweets = [
        {
            "id_str": "t1",
            "created_at": "Wed Aug 27 13:08:45 +0000 2008",
            "text": "hello world",
            "coordinates": {"type": "Point", "coordinates": [-74.0, 40.7]},
        },
        {"id_str": "t2", "created_at": "Wed Aug 27 13:08:45 +0000 2008",
         "text": "no geo", "coordinates": None},
    ]
    p = tmp_path / "tweets.json"
    p.write_text("\n".join(json.dumps(t) for t in tweets) + "\n")

    rows = FMT.read_twitter(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.tweet_id == "t1" and (r.lon, r.lat) == (-74.0, 40.7)
    assert r.ts is not None and str(r.ts).startswith("2008-08-27")


def test_format_feeds_index_points(spark, tmp_path):
    """A format reader's output drops straight into the IndexWriter path."""
    from geowave_spark.operators import index as OI

    p = tmp_path / "ev.tsv"
    p.write_text(
        _gdelt_line(EVENT_ID=7, DATE="20240301", GEO_TYPE=1, LAT="48.85", LON="2.35")
        + "\n"
    )
    feats = FMT.read_gdelt(spark, str(p))
    indexed = OI.index_points(feats, id_col="event_id")
    row = indexed.select("cell", "tier", "cell_p", "salt").collect()[0]
    assert row.tier == 29 and row.cell is not None


def test_stanag4676_reader(spark, tmp_path):
    """TrackMessage round trip: two tracks, point-only item filtering,
    nested position, float64 coordinate exactness, track summary."""
    doc = FMT.stanag_doc_xml(
        [
            (
                "u-1",
                "T001",
                "CONFIRMED",
                "NATO_SECRET",
                [
                    ("p-1", "2020-01-01T00:00:00.000Z", 40.7585, -73.9855, 12.0, 270.5),
                    ("p-2", "2020-01-01T00:00:01.500Z", 40.759, -73.986, 13.0, 271.0),
                ],
            ),
            (
                "u-2",
                "T002",
                "TENTATIVE",
                "UNCLASSIFIED",
                [("p-3", "2020-01-01T01:00:00.000Z", -85.0, 179.999, 0.0, 0.0)],
            ),
        ]
    )
    # a non-point item rides along and must be skipped (xsi:type filter)
    doc = doc.replace(
        "</tracks></TrackMessage>",
        '<items xsi:type="TrackClassificationInformation">'
        "<trackItemUUID>c-1</trackItemUUID><numberofObjects>1</numberofObjects>"
        "</items></tracks></TrackMessage>",
    )
    (tmp_path / "a.xml").write_text(doc)
    (tmp_path / "junk.xml").write_text("<not even xml")  # skipped

    pts = FMT.read_stanag4676(spark, str(tmp_path / "*.xml"))
    rows = {r.item_uuid: r for r in pts.collect()}
    assert set(rows) == {"p-1", "p-2", "p-3"}
    r = rows["p-1"]
    assert r.track_uuid == "u-1" and r.track_number == "T001"
    assert r.track_status == "CONFIRMED" and r.track_classification == "NATO_SECRET"
    assert (r.lat, r.lon) == (40.7585, -73.9855)
    assert (r.speed, r.course) == (12.0, 270.5)
    assert rows["p-3"].lon == 179.999

    summ = {r.track_uuid: r for r in FMT.stanag_track_summary(pts).collect()}
    assert summ["u-1"].n_points == 2
    assert str(summ["u-1"].start_ts).startswith("2020-01-01 00:00:00")
    assert str(summ["u-1"].end_ts).startswith("2020-01-01 00:00:01.5")
    assert summ["u-1"].minx == -73.986 and summ["u-2"].maxx == 179.999
