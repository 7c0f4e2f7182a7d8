"""Snapshot store: atomic commits, time travel, incremental scans,
rollback, expiry GC, per-partition lineage, and the concurrency/crash
contracts (operators/snapshots.py)."""

import os

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import index as OI
from geowave_spark.operators import snapshots as SN
from geowave_spark.sources import tables as TB


def _batches(spark, sf_dir):
    """Two disjoint deterministic batches of indexed points."""
    geo = TB.geo_events(spark, sf_dir)
    pts = OI.index_points(
        geo.select("event_id", "lon", "lat", "lon_milli", "lat_milli"),
        lon_col="lon", lat_col="lat", id_col="event_id",
    )
    b1 = pts.filter(F.col("event_id") % 4 < 3)
    b2 = pts.filter(F.col("event_id") % 4 == 3)
    return b1, b2


def _ids(df):
    return sorted(r["event_id"] for r in df.select("event_id").collect())


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("snapstore"))
    b1, b2 = _batches(spark, sf_dir)
    v1 = SN.commit(b1, path, mode="append")
    v2 = SN.commit(b2, path, mode="append")
    assert (v1, v2) == (1, 2)
    return path, b1, b2


def test_head_read_is_union(spark, store):
    path, b1, b2 = store
    got = SN.read(spark, path)
    assert _ids(got) == sorted(_ids(b1) + _ids(b2))
    # lineage column present and correct per batch
    assert set(r["commit"] for r in got.select("commit").distinct().collect()) == {1, 2}


def test_time_travel_v1_unchanged_after_append(spark, store):
    path, b1, _ = store
    assert _ids(SN.read(spark, path, version=1)) == _ids(b1)


def test_time_travel_lists_only_snapshot_files(spark, store):
    path, _, _ = store
    files = SN.read(spark, path, version=1).inputFiles()
    assert files and all("commit=1" in f for f in files)


def test_incremental_reads_only_new_commit(spark, store):
    path, _, b2 = store
    inc = SN.incremental(spark, path, from_version=1, to_version=2)
    assert _ids(inc) == _ids(b2)
    assert all("commit=2" in f for f in inc.inputFiles())


def test_partition_metrics_match_data(spark, store):
    path, _, _ = store
    pm = SN.partition_metrics(spark, path)
    per_commit = {
        r["commit"]: r["n"]
        for r in pm.groupBy("commit").agg(F.sum("n_rows").alias("n")).collect()
    }
    data = SN.read(spark, path)
    actual = {
        r["commit"]: r["n"]
        for r in data.groupBy("commit").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_commit == actual
    # and per-partition granularity agrees for commit 1
    pm1 = {
        r["cell_p"]: r["n_rows"]
        for r in pm.filter(F.col("commit") == 1).collect()
    }
    d1 = {
        str(r["cell_p"]): r["n"]
        for r in data.filter(F.col("commit") == 1)
        .groupBy("cell_p").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert pm1 == d1


def test_tier_hint_attached(spark, store):
    path, _, _ = store
    df = SN.read(spark, path)
    assert getattr(df, "_gw_tiers", None), "planner tier fast-path hint missing"


def test_overwrite_resets_and_incremental_refuses(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ovw")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path, mode="append")
    SN.commit(b2, path, mode="overwrite")
    assert _ids(SN.read(spark, path)) == _ids(b2)
    # v1 stays readable (time travel across the overwrite)
    assert _ids(SN.read(spark, path, version=1)) == _ids(b1)
    with pytest.raises(ValueError, match="lineage reset"):
        SN.incremental(spark, path, from_version=1, to_version=2)


def test_rollback_restores_and_ids_never_reused(spark, sf_dir, tmp_path):
    path = str(tmp_path / "rb")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    SN.commit(b2, path)
    v3 = SN.rollback(path, version=1)
    assert v3 == 3
    assert _ids(SN.read(spark, path)) == _ids(b1)
    # a post-rollback append must NOT reuse commit id 2 (its dir exists)
    v4 = SN.commit(b2, path, mode="append")
    man = SN.manifest(path, v4)
    assert man["commits"] == [1, 3]
    assert _ids(SN.read(spark, path)) == sorted(_ids(b1) + _ids(b2))


def test_expire_gc(spark, sf_dir, tmp_path):
    path = str(tmp_path / "exp")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    SN.commit(b2, path, mode="overwrite")  # commit=1 now dead at HEAD
    res = SN.expire(path, keep_last=1)
    assert res["expired_versions"] == [1]
    assert res["removed_commits"] == [1]
    assert not os.path.isdir(os.path.join(path, "data", "commit=1"))
    # HEAD read unaffected; expired version raises loudly
    assert _ids(SN.read(spark, path)) == _ids(b2)
    with pytest.raises(ValueError, match="expired"):
        SN.read(spark, path, version=1)


def test_expire_keeps_referenced_commits(spark, sf_dir, tmp_path):
    path = str(tmp_path / "expref")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    SN.commit(b2, path)  # v2 references commits [1, 2]
    res = SN.expire(path, keep_last=1)
    # v1 manifest expired but commit=1 is still live in v2 — must survive
    assert res["expired_versions"] == [1]
    assert res["removed_commits"] == []
    assert _ids(SN.read(spark, path)) == sorted(_ids(b1) + _ids(b2))


def test_crashed_commit_is_invisible_then_gcd(spark, sf_dir, tmp_path):
    path = str(tmp_path / "crash")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    # simulate a writer that died after writing data, before publishing:
    # data dir exists, no manifest references it
    (
        b2.limit(10).write.mode("errorifexists")
        .partitionBy("cell_p").parquet(os.path.join(path, "data", "commit=99"))
    )
    assert _ids(SN.read(spark, path)) == _ids(b1)  # reader never sees it
    res = SN.expire(path, keep_last=5)
    assert res["removed_commits"] == [99]


def test_append_schema_mismatch_raises(spark, sf_dir, tmp_path):
    path = str(tmp_path / "schema")
    b1, _ = _batches(spark, sf_dir)
    SN.commit(b1, path)
    with pytest.raises(ValueError, match="schema mismatch"):
        SN.commit(b1.withColumn("extra", F.lit(1)), path, mode="append")


def test_unindexed_frame_rejected(spark, sf_dir, tmp_path):
    geo = TB.geo_events(spark, sf_dir).limit(5)
    with pytest.raises(ValueError, match="cell_p"):
        SN.commit(geo, str(tmp_path / "raw"))


def test_commit_lock_contention(spark, sf_dir, tmp_path, monkeypatch):
    path = str(tmp_path / "lock")
    b1, _ = _batches(spark, sf_dir)
    SN.commit(b1, path)
    monkeypatch.setattr(SN, "LOCK_TIMEOUT", 0.2)
    lockfile = os.path.join(path, SN.SNAP_DIR, "commit.lock")
    with open(lockfile, "w") as f:
        f.write("held")
    try:
        with pytest.raises(RuntimeError, match="commit lock held"):
            SN.commit(b1, path)
    finally:
        os.unlink(lockfile)


def test_history_log(spark, sf_dir, tmp_path):
    path = str(tmp_path / "hist")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    SN.commit(b2, path)
    SN.rollback(path, version=1)
    h = {r["version"]: r for r in SN.history(spark, path).collect()}
    assert [h[v]["operation"] for v in (1, 2, 3)] == [
        "append", "append", "rollback"]
    assert h[3]["total_rows"] == h[1]["total_rows"]
    assert h[2]["n_commits"] == 2 and h[3]["n_commits"] == 1
