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


# ---------------------------------------------------------------------------
# merge-on-read: equality deletes + upsert (Iceberg v2 semantics)
# ---------------------------------------------------------------------------


def test_upsert_latest_wins_and_time_travel(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ups")
    b1, _ = _batches(spark, sf_dir)
    SN.commit(b1, path)
    upd = b1.filter(F.col("event_id") % 5 == 0).withColumn(
        "lon_milli", F.col("lon_milli") + 7
    )
    v2 = SN.commit_upsert(upd, path, key_col="event_id")
    assert v2 == 2
    head = SN.read(spark, path)
    # row count unchanged; updated rows carry the new lon and commit 3
    assert head.count() == b1.count()
    upd_ids = {r["event_id"] for r in upd.select("event_id").collect()}
    got = {r["event_id"]: (r["lon_milli"], r["commit"]) for r in head.collect()}
    base = {r["event_id"]: r["lon_milli"] for r in b1.collect()}
    for eid, (lon, cmt) in got.items():
        if eid in upd_ids:
            assert lon == base[eid] + 7 and cmt == 3
        else:
            assert lon == base[eid] and cmt == 1
    # time travel: v1 shows the original rows
    v1 = {r["event_id"]: r["lon_milli"]
          for r in SN.read(spark, path, version=1).collect()}
    assert v1 == base
    # repeated upsert of the same keys: latest wins
    upd2 = upd.withColumn("lon_milli", F.col("lon_milli") + 100)
    SN.commit_upsert(upd2, path, key_col="event_id")
    got3 = {r["event_id"]: r["lon_milli"]
            for r in SN.read(spark, path).collect()}
    for eid in upd_ids:
        assert got3[eid] == base[eid] + 107


def test_commit_delete_masks_earlier_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "dels")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    kill = b1.filter(F.col("event_id") % 3 == 0).select("event_id")
    v2 = SN.commit_delete(kill, path, key_col="event_id")
    assert v2 == 2
    left = {r["event_id"] for r in SN.read(spark, path).collect()}
    killed = {r["event_id"] for r in kill.collect()}
    assert left == set(_ids(b1)) - killed
    # a LATER append of a killed key is visible (delete masks earlier only)
    revived = b1.filter(F.col("event_id") % 3 == 0).limit(5)
    SN.commit(revived, path, mode="append")
    left2 = {r["event_id"] for r in SN.read(spark, path).collect()}
    assert {r["event_id"] for r in revived.collect()} <= left2


def test_incremental_refuses_across_upsert(spark, sf_dir, tmp_path):
    path = str(tmp_path / "incu")
    b1, b2 = _batches(spark, sf_dir)
    SN.commit(b1, path)
    SN.commit_upsert(b2, path, key_col="event_id")
    with pytest.raises(ValueError, match="not append-only"):
        SN.incremental(spark, path, from_version=1, to_version=2)


def test_materialize_folds_delete_debt(spark, sf_dir, tmp_path):
    path = str(tmp_path / "mat")
    b1, _ = _batches(spark, sf_dir)
    SN.commit(b1, path)
    upd = b1.filter(F.col("event_id") % 4 == 0).withColumn(
        "lat_milli", F.col("lat_milli") + 3
    )
    SN.commit_upsert(upd, path, key_col="event_id")
    before = sorted(
        (r["event_id"], r["lon_milli"], r["lat_milli"])
        for r in SN.read(spark, path).collect()
    )
    v = SN.materialize(spark, path)
    man = SN.manifest(path, v)
    assert man["operation"] == "overwrite" and man["deletes"] == []
    after = sorted(
        (r["event_id"], r["lon_milli"], r["lat_milli"])
        for r in SN.read(spark, path).collect()
    )
    assert after == before
    # expiring old versions GCs the delete files
    res = SN.expire(path, keep_last=1)
    assert os.path.isdir(os.path.join(path, "deletes")) is False or \
        os.listdir(os.path.join(path, "deletes")) == []


def test_delete_guards(spark, sf_dir, tmp_path):
    path = str(tmp_path / "guard")
    b1, _ = _batches(spark, sf_dir)
    with pytest.raises(ValueError, match="empty store"):
        SN.commit_delete(b1.select("event_id"), path, key_col="event_id")
    SN.commit(b1, path)
    with pytest.raises(ValueError, match="not a stored column"):
        SN.commit_delete(
            b1.select(F.col("event_id").alias("nope")), path, key_col="nope"
        )
    SN.commit_delete(b1.limit(3).select("event_id"), path, key_col="event_id")
    with pytest.raises(ValueError, match="one delete key per store"):
        SN.commit_upsert(b1, path, key_col="lon_milli")


def test_version_parse_beyond_six_digits(spark, tmp_path):
    # v1000000.json is 7 digits — the fixed-width [1:7] slice would parse
    # a truncated version; history/expire must strip suffix instead
    path = str(tmp_path / "bigver")
    sd = os.path.join(path, SN.SNAP_DIR)
    os.makedirs(sd)
    for v in (999_999, 1_000_000):
        man = {
            "version": v, "operation": "append", "ts": 0.0,
            "commits": [], "added_commit": None, "added_rows": 0,
            "total_rows": 0, "partition_col": "cell_p",
            "schema_cols": [], "schema_json": "{}",
            "partitions": {}, "tiers": {}, "deletes": [],
        }
        SN._publish(path, man)
    assert SN.head_version(path) == 1_000_000
    hist = SN.history(spark, path).collect()
    assert [r["version"] for r in hist] == [999_999, 1_000_000]
    res = SN.expire(path, keep_last=1)
    assert res["expired_versions"] == [999_999]
    assert SN.manifest(path)["version"] == 1_000_000
