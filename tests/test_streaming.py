"""Streaming ingest parity + resume (SURVEY §2.2 Kafka-ingest analogue).

Batch and streaming share one indexing code path, so the assertion is
exact: streaming sink contents == batch index_points over the same files;
a restart with the same checkpoint ingests only newly staged files."""

from __future__ import annotations

from pyspark.sql import functions as F

from geowave_spark.operators import index as OI
from geowave_spark.sources import tables as TB
from geowave_spark.streaming.ingest import stream_cell_window_counts, stream_index_events


def _stage(spark, sf_dir, out, part):
    geo = TB.geo_events(spark, sf_dir)
    half = geo.filter(F.pmod("event_id", F.lit(2)) == part)
    half.coalesce(1).write.mode("overwrite").parquet(out)
    return half


def test_stream_ingest_matches_batch_and_resumes(spark, sf_dir, tmp_path):
    src = str(tmp_path / "staged")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    geo = TB.geo_events(spark, sf_dir)
    schema = geo.schema

    # stage half the stream, drain it
    _stage(spark, sf_dir, src + "/f0", 0)
    q = stream_index_events(spark, src + "/f0", sink, ckpt, schema)
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    want = OI.index_points(geo.filter(F.pmod("event_id", F.lit(2)) == 0), id_col="event_id")
    assert got.count() == want.count()
    a = {r["event_id"]: r["cell"] for r in got.select("event_id", "cell").collect()}
    b = {r["event_id"]: r["cell"] for r in want.select("event_id", "cell").collect()}
    assert a == b

    # stage the second half into the same dir; resume from checkpoint —
    # only the new file is read (offsets recorded), totals now complete
    geo.filter(F.pmod("event_id", F.lit(2)) == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src + "/f0")
    q2 = stream_index_events(spark, src + "/f0", sink, ckpt, schema)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == geo.count()


def test_stream_window_counts(spark, sf_dir, tmp_path):
    src = str(tmp_path / "wsrc")
    geo = TB.geo_events(spark, sf_dir)
    geo.coalesce(1).write.mode("overwrite").parquet(src)

    agg = stream_cell_window_counts(spark, src, geo.schema, cell_res=4, window="1 day")
    sink = str(tmp_path / "wsink")
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    # watermark append-mode emits only windows closed by the final
    # watermark; every emitted (window, cell) count must match batch
    from geowave_spark.functions import cols as X

    batch = (
        geo.withColumn("cell_r", X.cell_encode_col(F.col("lon"), F.col("lat"), 4))
        .groupBy(F.window("ts", "1 day").alias("win"), "cell_r")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "cell_r", F.col("n_events").alias("n_batch"))
    )
    joined = out.join(batch, ["win_start", "cell_r"], "left")
    assert joined.count() > 0
    assert joined.filter(F.col("n_events") != F.col("n_batch")).count() == 0


def test_stream_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: only the FIRST doc per content hash
    passes, across micro-batches (state persists between batches)."""
    import pandas as pd

    from geowave_spark.streaming.ingest import stream_dedup_docs

    src = str(tmp_path / "docs_src")
    rows1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["hello world", "Hello   WORLD", "unique one"],
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02"]),
        }
    )
    sdf1 = spark.createDataFrame(rows1)
    sdf1.coalesce(1).write.mode("overwrite").parquet(src)

    out = stream_dedup_docs(spark, src, sdf1.schema)
    sink = str(tmp_path / "dedup_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(sink).toPandas()
    # "hello world" and "Hello   WORLD" normalize to the same hash -> doc 1
    assert sorted(got1.doc_id) == [1, 3]

    # second micro-batch: a new duplicate of hash(hello world) + a new doc —
    # state from batch 1 must suppress the duplicate
    rows2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": ["HELLO world ", "another new"],
            "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:06"]),
        }
    )
    spark.createDataFrame(rows2).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        stream_dedup_docs(spark, src, sdf1.schema)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(sink).toPandas()
    assert sorted(got2.doc_id) == [1, 3, 5], "doc 4 duplicates batch-1 state"

def test_kafka_decode_contract(spark, sf_dir):
    """Kafka-source contract: rows JSON-encoded into the exact Kafka wire
    schema (key/value binary + topic/partition/offset/timestamp) decode
    back to the typed schema via decode_kafka_records — the same transform
    open_stream applies to a live kafka stream — and feed the identical
    downstream indexing path as file ingest."""
    from pyspark.sql import types as T

    from geowave_spark.streaming.ingest import decode_kafka_records

    geo = TB.geo_events(spark, sf_dir).limit(200)
    wire = geo.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*geo.columns)).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    decoded = decode_kafka_records(wire, geo.schema)
    assert [f.name for f in decoded.schema.fields] == geo.columns
    a = {r.event_id: (r.lon_milli, r.lat_milli) for r in decoded.collect()}
    b = {r.event_id: (r.lon_milli, r.lat_milli) for r in geo.collect()}
    assert a == b
    idx = OI.index_points(decoded, id_col="event_id")
    want = OI.index_points(geo, id_col="event_id")
    assert {r.event_id: r.cell for r in idx.collect()} == {
        r.event_id: r.cell for r in want.collect()
    }


def test_open_stream_sources(spark, sf_dir, tmp_path):
    """open_stream: a directory yields a streaming file source; a
    KafkaSource wires format('kafka') options and fails only at the
    connector boundary (no kafka jar in this sandbox)."""
    import pytest

    from geowave_spark.streaming.ingest import KafkaSource, open_stream

    geo = TB.geo_events(spark, sf_dir)
    src = str(tmp_path / "osrc")
    geo.limit(10).coalesce(1).write.mode("overwrite").parquet(src)
    sdf = open_stream(spark, src, geo.schema)
    assert sdf.isStreaming and sdf.schema == geo.schema

    with pytest.raises(Exception, match="(?i)kafka"):
        open_stream(
            spark,
            KafkaSource(bootstrap_servers="localhost:9092", topic="events"),
            geo.schema,
        )


def test_socket_source_reads_wire_end_to_end(spark, sf_dir):
    """The stream actually reads from a SOCKET: a TCP server thread sends
    JSON-encoded event rows over a real connection; open_stream's
    SocketSource arm decodes them through the SAME value decode as the
    Kafka arm and the rows land typed and complete.  (The kafka connector
    jar itself is absent in-sandbox — see SocketSource's docstring for the
    one-constructor production swap.)"""
    import json
    import socket
    import threading
    import time

    from geowave_spark.streaming.ingest import SocketSource, open_stream

    geo = TB.geo_events(spark, sf_dir).limit(50)
    rows = [r.asDict() for r in geo.collect()]
    payload = (
        "\n".join(json.dumps(r, default=str) for r in rows) + "\n"
    ).encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    conns = []

    def serve():
        conn, _ = srv.accept()
        conns.append(conn)
        conn.sendall(payload)
        # keep the connection open: the socket source treats EOF as query
        # failure; the test closes it after stopping the query

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    # timestamp columns arrive as strings over the JSON wire — compare on
    # the integer/string columns (the kafka contract test pins full typing)
    schema = geo.select("event_id", "event_type", "lon_milli", "lat_milli").schema
    sdf = open_stream(spark, SocketSource("127.0.0.1", port), schema)
    assert sdf.isStreaming
    q = sdf.writeStream.format("memory").queryName("sock_wire").start()
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM sock_wire").first().c >= len(rows):
                break
            time.sleep(0.5)
        got = {
            r.event_id: (r.event_type, r.lon_milli, r.lat_milli)
            for r in spark.sql("SELECT * FROM sock_wire").collect()
        }
    finally:
        q.stop()
        for c in conns:
            c.close()
        srv.close()
    want = {
        r["event_id"]: (r["event_type"], r["lon_milli"], r["lat_milli"])
        for r in rows
    }
    assert got == want


def test_stream_sink_gains_tier_hints(spark, sf_dir, tmp_path):
    """finalize_stream_stats gives a streamed sink the same stats-driven
    tier hints as a batch write_indexed table: read_indexed attaches
    _gw_tiers and they match the sink's actual tier occupancy."""
    from geowave_spark.streaming.ingest import finalize_stream_stats

    src = str(tmp_path / "tstage")
    sink = str(tmp_path / "tsink")
    geo = TB.geo_events(spark, sf_dir)
    geo.limit(2000).coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_index_events(spark, src, sink, str(tmp_path / "tckpt"), geo.schema)
    q.awaitTermination(120)

    finalize_stream_stats(spark, sink)
    got = OI.read_indexed(spark, sink)
    want = sorted(
        r.tier
        for r in spark.read.parquet(sink)
        .select(F.shiftright("cell", 58).alias("tier"))
        .distinct()
        .collect()
    )
    assert got._gw_tiers == want and len(want) >= 1


def test_stream_geofence_matches_batch(spark, sf_dir, tmp_path):
    """Streaming geofence == batch query_polygon over the same staged
    events (stream-static broadcast cover join + exact refine)."""
    from geowave_spark import registry as R
    from geowave_spark.functions import geometry as G
    from geowave_spark.operators import polygon as OP
    from geowave_spark.streaming.ingest import stream_geofence

    src = str(tmp_path / "gfsrc")
    geo = TB.geo_events(spark, sf_dir)
    geo.coalesce(1).write.mode("overwrite").parquet(src)

    fences = [
        OP.PolygonQuery("pent", G.wkb_polygon([R.PENTAGON]), "INTERSECTS")
    ]
    sink, ckpt = str(tmp_path / "gfsink"), str(tmp_path / "gfckpt")
    q = stream_geofence(spark, src, fences, geo.schema, sink, ckpt)
    q.awaitTermination(180)

    got = {
        (r.query_id, r.event_id)
        for r in spark.read.parquet(sink).select("query_id", "event_id").collect()
    }
    batch = OI.index_points(geo, id_col="event_id")
    want = {
        (r.query_id, r.event_id)
        for r in OP.query_polygon(batch, fences).select(
            "query_id", "event_id"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_knn_matches_batch(spark, sf_dir, tmp_path):
    """Streaming kNN enrichment == batch knn_join over the same staged
    queries (foreachBatch reuse of the batch operator)."""
    from geowave_spark.operators.knn import knn_join
    from geowave_spark.streaming.ingest import stream_knn

    geo = TB.geo_events(spark, sf_dir)
    queries = geo.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "lon_milli", "lat_milli"
    )
    static = geo.filter(F.col("event_id") % 97 != 0).select(
        "event_id", "lon_milli", "lat_milli"
    )
    src = str(tmp_path / "knnsrc")
    queries.coalesce(1).write.mode("overwrite").parquet(src)

    sink, ckpt = str(tmp_path / "knnsink"), str(tmp_path / "knnckpt")
    q = stream_knn(
        spark, src, static, queries.schema, sink, ckpt, k=3, max_dist_milli=5000
    )
    q.awaitTermination(180)

    got = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in spark.read.parquet(sink)
        .select("query_id", "rank", "neighbor_id")
        .collect()
    }
    want = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in knn_join(
            queries, static, k=3, max_dist_milli=5000, exclude_self=False
        )
        .select("query_id", "rank", "neighbor_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming LSH dedup vs the stored corpus band index == the batch
    incremental_dedup over the same staged docs (foreachBatch reuse)."""
    from geowave_spark.operators import dedup as OD
    from geowave_spark.streaming.ingest import stream_incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # the stored index: band_keys materialized at a prior ingest
    idx_path = str(tmp_path / "corpus_bands")
    OD.band_keys(corpus).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    src = str(tmp_path / "idsrc")
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    sink, ckpt = str(tmp_path / "idsink"), str(tmp_path / "idckpt")
    q = stream_incremental_dedup(spark, src, idx, batch.schema, sink, ckpt)
    q.awaitTermination(180)

    got = {
        (r.doc_id, r.hit_corpus, r.hit_batch, r.keep)
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r.doc_id, r.hit_corpus, r.hit_batch, r.keep)
        for r in OD.incremental_dedup(None, batch, corpus_bands=idx).collect()
    }
    assert got == want and len(want) > 0


def test_stream_cql_matches_batch(spark, sf_dir, tmp_path):
    """Streaming CQL (S2 leaf-range scan filter — no join, no state) ==
    the batch S2 planner over the same staged events; compound string
    with time + residual predicates."""
    from geowave_spark.plans.s2cql import s2_cql_query
    from geowave_spark.streaming.ingest import stream_cql

    src = str(tmp_path / "cqlsrc")
    geo = TB.geo_events(spark, sf_dir)
    geo.coalesce(1).write.mode("overwrite").parquet(src)

    where = (
        "BBOX(geom, -76.0, 40.0, -72.0, 47.0) "
        "AND ts BETWEEN '2024-01-01 00:00:00' AND '2024-01-20 23:59:59' "
        "AND event_type IN ('click', 'purchase')"
    )
    sink, ckpt = str(tmp_path / "cqlsink"), str(tmp_path / "cqlckpt")
    q = stream_cql(spark, src, where, geo.schema, sink, ckpt)
    q.awaitTermination(180)

    got = {r.event_id for r in spark.read.parquet(sink).select("event_id").collect()}
    want = {r.event_id for r in s2_cql_query(geo, where).select("event_id").collect()}
    assert got == want and len(want) > 0


def test_stream_cql_rejects_or_group(spark, sf_dir, tmp_path):
    import pytest

    from geowave_spark.streaming.ingest import stream_cql

    geo = TB.geo_events(spark, sf_dir)
    with pytest.raises(ValueError, match="one spatial clause"):
        stream_cql(
            spark, str(tmp_path), 
            "BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 2, 2, 3, 3)",
            geo.schema, str(tmp_path / "s"), str(tmp_path / "c"),
        )


def test_stream_segment_tracks_matches_batch(spark, sf_dir, tmp_path):
    """Streaming sessionization == batch segment_tracks when points
    arrive in time order (two micro-batches split on the median ts;
    state carries last_t/seg across the restart)."""
    from geowave_spark.operators import tracks as TK
    from geowave_spark.sources import tables as TB
    from geowave_spark.streaming.ingest import stream_segment_tracks

    geo = TB.geo_events(spark, sf_dir).select(
        "event_id", "ts", "user_id"
    ).filter(F.col("user_id") % 7 == 0)
    # chronological split: first half (by ts rank) lands first
    from pyspark.sql import Window as W

    ranked = geo.withColumn(
        "_rk",
        F.row_number().over(W.orderBy("ts", "event_id")),
    )
    n = ranked.count()
    first = ranked.filter(F.col("_rk") <= n // 2).drop("_rk")
    second = ranked.filter(F.col("_rk") > n // 2).drop("_rk")
    src = str(tmp_path / "trk_src")
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        out = stream_segment_tracks(
            spark, src, first.schema, gap_s=86_400
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "trk_sink"))
            .option("checkpointLocation", str(tmp_path / "trk_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    second.coalesce(1).write.mode("append").parquet(src)
    run()
    got = {
        (r["track_id"], r["pt_id"]): r["seg"]
        for r in spark.read.parquet(str(tmp_path / "trk_sink")).collect()
    }
    batch = TK.segment_tracks(
        TK.track_points(
            geo.withColumn("lon_milli", F.lit(0)).withColumn(
                "lat_milli", F.lit(0)
            )
        ),
        gap_s=86_400,
    )
    exp = {
        (r["track_id"], r["pt_id"]): r["seg"] for r in batch.collect()
    }
    assert got == exp and len(got) > 0


def test_stream_track_geofence_matches_batch(spark, sf_dir, tmp_path):
    """Streaming segment geofence == batch line_segments + the same
    predicate, across a two-micro-batch split (the pairing state carries
    the last point over the restart) — including a crossing whose BOTH
    endpoints are outside the fence."""
    from geowave_spark.operators import lines as LN
    from geowave_spark.sources import tables as TB
    from geowave_spark.streaming.ingest import stream_track_geofence

    rings = [[(139_000, 35_000), (140_200, 35_000), (140_200, 36_000),
              (139_000, 36_000)]]
    pts = TB.geo_track_points(spark, sf_dir).filter(
        F.col("track_id") % 11 == 0
    ).select("track_id", F.col("j").alias("pt_id"), "x", "y")
    # synthetic crossing track: both endpoints OUTSIDE the fence, the
    # segment straight through — the case a point geofence misses
    cross = spark.createDataFrame(
        [(999_901, 0, 138_500, 35_500), (999_901, 1, 140_900, 35_500)],
        "track_id long, pt_id long, x long, y long",
    )
    pts = pts.unionByName(cross)
    src = str(tmp_path / "gf_src")
    first = pts.filter(F.col("pt_id") <= 1)
    second = pts.filter(F.col("pt_id") > 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        out = stream_track_geofence(spark, src, rings, first.schema)
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "gf_sink"))
            .option("checkpointLocation", str(tmp_path / "gf_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    second.coalesce(1).write.mode("append").parquet(src)
    run()
    got = {
        (r["track_id"], r["seg_end_pt"])
        for r in spark.read.parquet(str(tmp_path / "gf_sink")).collect()
    }
    batch_segs = LN.line_segments(
        pts.withColumnRenamed("pt_id", "j")
    ).filter(F.expr(LN.sql_seg_poly_hit(rings)))
    exp = {
        (r["track_id"], r["seg_j"] + 1) for r in batch_segs.collect()
    }
    assert got == exp
    assert (999_901, 1) in got  # the through-crossing is caught
