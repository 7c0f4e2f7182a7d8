"""Store compaction: row invariance, file-count reduction, range-disjoint
sorted output files, idempotence, crash recovery."""

import os

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import compact as OC
from geowave_spark.operators import index as OI
from geowave_spark.sources import tables as TB


def _store_files(store):
    out = {}
    for d in sorted(os.listdir(store)):
        full = os.path.join(store, d)
        if "=" in d and os.path.isdir(full):
            out[d] = OC._data_files(full)
    return out


@pytest.fixture()
def fragmented_store(spark, sf_dir, tmp_path):
    """3 append batches -> every partition has several small files."""
    store = str(tmp_path / "store")
    geo = TB.geo_events(spark, sf_dir)
    batches = [
        geo.filter(F.col("event_id") % 3 == i).select(
            "event_id", "lon", "lat", "lon_milli", "lat_milli"
        )
        for i in range(3)
    ]
    for i, b in enumerate(batches):
        idx = OI.index_points(b, id_col="event_id")
        OI.write_indexed(idx, store, mode="overwrite" if i == 0 else "append")
    return store


def _content_hash(spark, store):
    df = spark.read.parquet(store)
    return (
        df.select(
            F.expr("bit_xor(xxhash64(event_id, cell, salt))").alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]
    )


def test_compact_reduces_files_rows_invariant(spark, fragmented_store):
    store = fragmented_store
    before_files = _store_files(store)
    assert any(len(fs) >= 2 for fs in before_files.values())
    h0 = _content_hash(spark, store)
    tiers0 = OI.read_stats_tiers(spark, store)

    rep = OC.compact_store(spark, store, target_file_bytes=128 << 20)
    assert rep["partitions_compacted"] > 0
    assert rep["files_after"] < rep["files_before"]
    # every compacted partition collapses to one file at this target
    after_files = _store_files(store)
    assert all(len(fs) == 1 for fs in after_files.values())

    h1 = _content_hash(spark, store)
    assert (h0["n"], h0["h"]) == (h1["n"], h1["h"])
    assert OI.read_stats_tiers(spark, store) == tiers0

    # idempotent: a second run finds nothing to do
    rep2 = OC.compact_store(spark, store, target_file_bytes=128 << 20)
    assert rep2["partitions_compacted"] == 0
    assert rep2["files_after"] == rep["files_after"]


def test_compact_files_are_sorted_and_range_disjoint(spark, tmp_path):
    """When a compacted partition still needs SEVERAL files, they must be
    pairwise range-disjoint on `cell` (the sorted-run property parquet
    footer pruning needs).  Dense store: 4 append batches of clustered
    points, target sized to merge 4 files -> 2."""
    import pyarrow.parquet as pq

    store = str(tmp_path / "dense")
    base = spark.range(4000).selectExpr(
        "id AS event_id",
        "10.0 + (id % 900) / 1000.0 AS lon",
        "20.0 + ((id * 7) % 900) / 1000.0 AS lat",
        "CAST(10000 + (id % 900) AS BIGINT) AS lon_milli",
        "CAST(20000 + ((id * 7) % 900) AS BIGINT) AS lat_milli",
    )
    for i in range(4):
        b = base.filter(F.col("event_id") % 4 == i)
        idx = OI.index_points(b, id_col="event_id")
        OI.write_indexed(idx, store, mode="overwrite" if i == 0 else "append")
    sizes = {
        d: sum(os.path.getsize(os.path.join(store, d, f)) for f in fs)
        for d, fs in _store_files(store).items()
    }
    target = max(sizes.values()) // 2 + 1  # biggest partition -> 2 files
    rep = OC.compact_store(spark, store, target_file_bytes=target)
    multi = {
        d: fs
        for d, fs in _store_files(store).items()
        if len(fs) >= 2 and d in set(rep["compacted"])
    }
    assert multi, "target should split at least one compacted partition"
    for d, fs in multi.items():
        ranges = []
        for f in fs:
            md = pq.ParquetFile(os.path.join(store, d, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["cell"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b, f"overlapping cell ranges in {d}"


def test_recover_partial(spark, fragmented_store):
    store = fragmented_store
    n0 = spark.read.parquet(store).count()
    parts = [d for d in os.listdir(store) if "=" in d]
    victim = os.path.join(store, parts[0])
    os.rename(victim, victim + ".old")  # simulate crash between renames
    healed = OC.recover_partial(store)
    assert healed == [parts[0]]
    assert spark.read.parquet(store).count() == n0


def test_decommission_then_compact_stream_sink(spark, sf_dir, tmp_path):
    """Streaming sink -> decommission (orphan reconciliation + log drop) ->
    compaction.  An injected orphan file (uncommitted micro-batch debris)
    must be removed — a naive log delete would have surfaced it as
    duplicate rows."""
    import shutil

    from geowave_spark.streaming.ingest import (
        decommission_stream_sink,
        stream_index_events,
    )

    src = str(tmp_path / "staged")
    sink = str(tmp_path / "sink")
    geo = TB.geo_events(spark, sf_dir)
    for i in range(2):  # two drains -> two files per touched partition
        geo.filter(F.pmod("event_id", F.lit(2)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_index_events(
            spark, src, sink, str(tmp_path / "ckpt"), geo.schema
        )
        q.awaitTermination(120)
    n_want = geo.count()
    assert spark.read.parquet(sink).count() == n_want

    # a live sink must refuse compaction outright
    with pytest.raises(ValueError, match="_spark_metadata"):
        OC.compact_store(spark, sink)

    # inject an orphan: a data file no micro-batch ever committed
    parts = [d for d in os.listdir(sink) if d.startswith("cell_p=")]
    pdir = os.path.join(sink, parts[0])
    victim = OC._data_files(pdir)[0]
    shutil.copy(
        os.path.join(pdir, victim), os.path.join(pdir, "part-orphan.parquet")
    )

    rep = decommission_stream_sink(spark, sink)
    assert rep["orphans_removed"] == 1
    assert not os.path.isdir(os.path.join(sink, "_spark_metadata"))
    assert spark.read.parquet(sink).count() == n_want  # no dup rows surfaced

    crep = OC.compact_store(spark, sink, target_file_bytes=128 << 20)
    assert crep["files_after"] <= crep["files_before"]
    assert spark.read.parquet(sink).count() == n_want


def test_write_indexed_files_sorted_on_cell(spark, sf_dir, tmp_path):
    """The store's sorted-run property holds PHYSICALLY: every data file's
    row order is ascending cell (checked via pyarrow, not a Spark read
    that could reorder)."""
    import pyarrow.parquet as pq

    store = str(tmp_path / "sorted_store")
    geo = TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "lon_milli", "lat_milli"
    )
    OI.write_indexed(OI.index_points(geo, id_col="event_id"), store)
    checked = 0
    for d, fs in _store_files(store).items():
        for f in fs:
            cells = pq.read_table(
                os.path.join(store, d, f), columns=["cell"]
            )["cell"].to_pylist()
            assert cells == sorted(cells), f"unsorted {d}/{f}"
            checked += len(cells)
    assert checked == geo.count()
