"""Structured Streaming ingest: continuous cell-indexed ingestion with
exactly-once sink semantics, plus watermarked per-cell window aggregation.

The reference's only streaming-adjacent piece is Kafka ingest staging
(core/ingest/.../kafka/IngestFromKafkaDriver.java, StageToKafkaDriver.java)
— consume records, decode, hand to the same IndexWriter as batch.  The
Spark-native re-expression: ``readStream`` on a source (file source here;
``format("kafka")`` is a one-line swap), the IDENTICAL codegen indexing
transforms as batch ingest (operators/index.py — streaming and batch share
one code path), and a partitioned parquet sink with a checkpoint — Spark's
offset tracking gives the restart/exactly-once behavior the reference gets
from recoverable staging.

The windowed aggregation (events per cell per window with a watermark for
late data) covers the stateful-streaming surface the reference lacks
entirely — listed in SURVEY §2.10 as absent there, present here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.operators import index as OI


def stream_index_events(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    res: int | None = None,
    available_now: bool = True,
):
    """File-source streaming ingest → cell-indexed partitioned parquet.

    ``available_now=True`` drains everything currently staged and stops
    (micro-batch catch-up — the test/backfill mode); ``False`` runs
    continuously.  Restarting with the same checkpoint resumes from the
    recorded offsets — already-ingested files are not re-read.
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    indexed = OI.index_points(
        raw, res=res if res is not None else OI.C.MAX_RES, id_col="event_id"
    )
    writer = (
        indexed.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell_p")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cell_window_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    cell_res: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-cell event counts per event-time window.

    Late rows beyond ``watermark`` are dropped (state is bounded — the
    requirement for an unbounded 10^12-row stream); the coarse ``cell_res``
    keeps state cardinality at 4^res worldwide.
    Returns the streaming DataFrame (caller attaches a sink)."""
    from geowave_spark.functions import cols as X

    raw = spark.readStream.schema(schema).parquet(source_dir)
    # event-time watermarks require TIMESTAMP (with timezone); NTZ sources
    # (like the parquet testdata) cast losslessly under the UTC session tz
    with_cell = raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "cell_r", X.cell_encode_col(F.col("lon"), F.col("lat"), cell_res)
    )
    return (
        with_cell.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("cell_r"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cell_r",
            "n_events",
        )
    )


def stream_dedup_docs(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "1 hour",
    state_timeout_hours: int = 24,
) -> DataFrame:
    """Custom stateful streaming operator: continuous EXACT dedup — only
    the first document per content hash passes (the streaming form of
    operators/dedup.exact_dedup, the operation a continuously-ingesting
    training pipeline runs on every batch).

    ``applyInPandasWithState`` keyed by the content hash keeps one tiny
    state row (first id + count) per distinct hash; state expires
    ``state_timeout_hours`` after the watermark passes it, so state stays
    bounded on an unbounded stream (re-emission after expiry is the
    documented trade-off — size the timeout to the dedup horizon).
    Emits (dup_key, doc_id, ts) for FIRST occurrences only.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    raw = spark.readStream.schema(schema).parquet(source_dir)
    hashed = raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "dup_key",
        F.md5(
            F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))).cast(
                "binary"
            )
        ),
    ).withWatermark("ts", watermark)

    out_schema = T.StructType(
        [
            T.StructField("dup_key", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("first_id", T.LongType()), T.StructField("n_seen", T.LongType())]
    )

    def dedup_fn(key, pdfs, state: GroupState):
        seen = state.exists
        total = 0
        first_rows = None
        for pdf in pdfs:
            total += len(pdf)
            if not seen and first_rows is None and len(pdf):
                first = pdf.sort_values(["ts", "doc_id"]).iloc[0]
                first_rows = pd.DataFrame(
                    {
                        "dup_key": [key[0]],
                        "doc_id": [int(first.doc_id)],
                        "ts": [first.ts],
                    }
                )
        if seen:
            (first_id, n_seen) = state.get
            state.update((first_id, n_seen + total))
        else:
            state.update((int(first_rows.doc_id.iloc[0]), total))
        state.setTimeoutDuration(state_timeout_hours * 3600 * 1000)
        if not seen and first_rows is not None:
            yield first_rows

    return hashed.groupBy("dup_key").applyInPandasWithState(
        dedup_fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
