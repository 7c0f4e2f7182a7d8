"""Snapshot log over the indexed store — the Iceberg-commit surface, lite.

The deployment target is an Iceberg table (BASELINE.json input_hint; every
``write_indexed`` docstring names the production swap).  What Iceberg's
metadata layer actually buys the 100 TB pipeline is FOUR capabilities the
bare parquet layout lacks, and this module provides all four with the same
user-visible semantics so the swap is mechanical:

* **atomic commits** — readers never observe a half-written append; a
  crashed writer leaves garbage that is invisible (never referenced by a
  manifest) rather than corrupting the table;
* **time travel** — ``read(spark, path, version=v)`` returns the table
  exactly as of snapshot ``v``, forever reproducible (the training-data
  provenance requirement: *which* corpus state did this model train on);
* **incremental scans** — ``incremental(spark, path, v0, v1)`` reads ONLY
  the files appended between two snapshots (the resume/backfill path: a
  downstream stage that checkpointed at ``v0`` catches up without
  re-reading the corpus);
* **per-partition lineage + row counts** — every manifest records, per
  commit, per ``cell_p`` partition, the row count written (the north
  rule's "checkpoints per-partition lineage + row counts to Iceberg");
  ``partition_metrics`` exposes the log as a queryable DataFrame, the
  analogue of Iceberg's ``.snapshots`` / ``.partitions`` metadata tables.

Layout (all commits immutable once published; the ONLY mutable object is
the one-line ``HEAD`` pointer, published by atomic rename)::

    store/
      data/commit=3/cell_p=1234/part-*.parquet   one dir per commit
      _snapshots/v000001.json ...                immutable manifests
      _snapshots/HEAD                            current version (int)
      _snapshots/commit.lock                     writer mutex

``commit=N`` is a Hive-style key=value segment, so a multi-commit read is
one ``spark.read.option("basePath", data).parquet(*live_dirs)`` — Spark
recovers ``commit`` and ``cell_p`` as partition columns, partition pruning
and row-group pushdown work unchanged, and time travel/incremental reads
never even LIST files outside their snapshot (O(files-in-scope), not
O(files-in-table) — the property that matters at 10^12 rows).

Concurrency: one writer at a time (O_CREAT|O_EXCL lock, the
``_tier_counts_lock`` pattern); production Iceberg gets the same
serialization from optimistic snapshot retry.  Readers take no lock — the
HEAD rename is atomic, manifests are immutable.

Reference parity: the reference has no table-format layer (its KV stores
version nothing); this is engine-native capability the north rule adds.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SNAP_DIR = "_snapshots"
LOCK_TIMEOUT = 30.0  # seconds a contending committer waits


# ---------------------------------------------------------------------------
# manifest plumbing
# ---------------------------------------------------------------------------


def _snap_path(path: str) -> str:
    return os.path.join(path, SNAP_DIR)


def _manifest_file(path: str, version: int) -> str:
    return os.path.join(_snap_path(path), f"v{version:06d}.json")


def head_version(path: str) -> int:
    """Current snapshot version (0 = empty store, no commits yet)."""
    head = os.path.join(_snap_path(path), "HEAD")
    if not os.path.exists(head):
        return 0
    with open(head) as f:
        return int(f.read().strip())


def manifest(path: str, version: int | None = None) -> dict:
    """Load one immutable manifest (default: HEAD)."""
    v = head_version(path) if version is None else version
    if v <= 0:
        raise ValueError(f"{path}: no snapshot yet (version {v})")
    mf = _manifest_file(path, v)
    if not os.path.exists(mf):
        raise ValueError(
            f"{path}: snapshot v{v} does not exist or was expired "
            f"(HEAD is v{head_version(path)})"
        )
    with open(mf) as f:
        return json.load(f)


def _publish(path: str, man: dict) -> int:
    """Write the manifest (immutable, write-once) then swing HEAD by atomic
    rename — the single instant the commit becomes visible."""
    sd = _snap_path(path)
    os.makedirs(sd, exist_ok=True)
    v = man["version"]
    mf = _manifest_file(path, v)
    tmp = mf + ".staging"
    with open(tmp, "w") as f:
        json.dump(man, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, mf)
    head_tmp = os.path.join(sd, "HEAD.staging")
    with open(head_tmp, "w") as f:
        f.write(str(v))
        f.flush()
        os.fsync(f.fileno())
    os.rename(head_tmp, os.path.join(sd, "HEAD"))  # atomic publish
    return v


def _commit_lock(path: str):
    """Exclusive writer mutex for the read-HEAD → write-data → publish
    critical section (O_CREAT|O_EXCL; see index._tier_counts_lock for why
    stale locks are removed by the operator, never guessed stale)."""
    import contextlib

    @contextlib.contextmanager
    def _lock():
        os.makedirs(_snap_path(path), exist_ok=True)
        lockfile = os.path.join(_snap_path(path), "commit.lock")
        deadline = time.monotonic() + LOCK_TIMEOUT
        while True:
            try:
                fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise RuntimeError(
                        f"snapshot commit lock held: {lockfile} — another "
                        "writer is committing to this store (or crashed "
                        "mid-commit; verify and remove the lock file)"
                    ) from None
                time.sleep(0.05)
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            yield
        finally:
            os.unlink(lockfile)

    return _lock()


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------


def commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_col: str = "cell_p",
    sort_col: str = "cell",
) -> int:
    """Commit ``df`` as one immutable snapshot; returns the new version.

    ``df`` is an indexed table (``index_points`` / ``index_envelopes``
    output — any frame carrying ``partition_col``).  The data lands in its
    own ``data/commit=N/`` directory with the same layout contract as
    ``write_indexed`` (partitioned by ``cell_p``, files sorted on ``cell``
    so range scans prune row groups); the manifest then records per-
    partition row counts, the occupied-tier histogram, and the commit list
    (previous + new for ``append``; just the new one for ``overwrite``).

    A crash anywhere before the final HEAD rename leaves the store at the
    previous snapshot with an unreferenced ``commit=N`` directory —
    harmless garbage that the next ``expire()`` removes.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, not {mode!r}")
    if partition_col not in df.columns:
        raise ValueError(
            f"snapshot commit needs the {partition_col!r} partition column "
            "(index the frame first: operators.index.index_points/envelopes)"
        )
    with _commit_lock(path):
        return _commit_unlocked(df, path, mode, partition_col, sort_col)


def _commit_unlocked(
    df: DataFrame,
    path: str,
    mode: str,
    partition_col: str,
    sort_col: str,
) -> int:
    """Body of :func:`commit`; caller MUST hold ``_commit_lock``.  Split out
    so ``materialize`` can hold the lock across its whole read-effective-rows
    → rewrite → publish sequence (otherwise a commit landing between the
    read and the publish would be silently discarded)."""
    prev_v = head_version(path)
    prev = manifest(path, prev_v) if prev_v else None
    if prev is not None and mode == "append":
        stored = set(prev["schema_cols"])
        incoming = {f"{c.name}:{c.dataType.simpleString()}"
                    for c in df.schema.fields}
        if incoming != stored:
            raise ValueError(
                f"append schema mismatch vs snapshot v{prev_v}: "
                f"stored={sorted(stored)} incoming={sorted(incoming)}"
            )
    commit_id = _next_commit_id(path, prev)
    parts, tiers, added_rows = _write_data_commit(
        df, path, commit_id, partition_col, sort_col
    )
    commits = ([*prev["commits"], commit_id]
               if (prev and mode == "append") else [commit_id])
    man = {
        "version": prev_v + 1,
        "operation": mode,
        "ts": time.time(),
        "commits": commits,
        "added_commit": commit_id,
        "added_rows": added_rows,
        "total_rows": added_rows + (
            prev["total_rows"] if (prev and mode == "append") else 0
        ),
        "partition_col": partition_col,
        "schema_cols": sorted(
            f"{c.name}:{c.dataType.simpleString()}"
            for c in df.schema.fields
        ),
        "schema_json": df.schema.json(),
        "partitions": {str(commit_id): parts},
        "tiers": {str(commit_id): tiers},
        # equality-delete entries (merge-on-read) carry forward on
        # append; an overwrite resets the table, so they clear
        "deletes": (list(prev.get("deletes", []))
                    if (prev and mode == "append") else []),
    }
    if prev and mode == "append":
        man["partitions"].update(prev["partitions"])
        man["tiers"].update(prev["tiers"])
    return _publish(path, man)


def _next_commit_id(path: str, prev: dict | None) -> int:
    """1 + max over EVERY commit dir on disk (data AND deletes — after a
    rollback, rolled-past commits still exist and their ids must never be
    reused) and the previous manifest's live sets."""
    on_disk: list[int] = []
    for sub in ("data", "deletes"):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            on_disk += [
                int(e.split("=", 1)[1])
                for e in os.listdir(d)
                if e.startswith("commit=")
            ]
    prev_ids = (
        [*prev["commits"], *(d["commit"] for d in prev.get("deletes", []))]
        if prev
        else []
    )
    return 1 + max([0, *on_disk, *prev_ids])


def _write_data_commit(
    df: DataFrame, path: str, commit_id: int, partition_col: str, sort_col: str
):
    """Write one immutable ``data/commit=N`` dir (partitioned, sorted)
    and return (per-partition counts, tier histogram, added_rows) —
    lineage from the FILES JUST WRITTEN (read-back, never the input plan
    twice); both aggs are map-side combinable over the new commit only."""
    commit_dir = os.path.join(path, "data", f"commit={commit_id}")
    sort_cols = [partition_col] + ([sort_col] if sort_col in df.columns else [])
    (
        df.repartition(F.col(partition_col))
        .sortWithinPartitions(*sort_cols)
        .write.mode("errorifexists")
        .partitionBy(partition_col)
        .parquet(commit_dir)
    )
    spark = df.sparkSession
    written = spark.read.parquet(commit_dir)
    parts = {
        str(r[partition_col]): r["n"]
        for r in written.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tiers: dict[str, int] = {}
    if "tier" in written.columns:
        tiers = {
            str(r["tier"]): r["n"]
            for r in written.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return parts, tiers, sum(parts.values())


def _write_delete_commit(
    keys_df: DataFrame, path: str, commit_id: int, key_col: str
) -> int:
    """Write one immutable ``deletes/commit=N`` key file; returns the
    distinct-key count."""
    del_dir = os.path.join(path, "deletes", f"commit={commit_id}")
    keys = keys_df.select(F.col(key_col)).distinct()
    keys.coalesce(1).write.mode("errorifexists").parquet(del_dir)
    return keys_df.sparkSession.read.parquet(del_dir).count()


def _check_delete_key(prev: dict | None, key_col: str) -> None:
    if prev:
        for d in prev.get("deletes", []):
            if d["key"] != key_col:
                raise ValueError(
                    f"store already carries equality deletes on "
                    f"{d['key']!r}; one delete key per store"
                )
        if prev["commits"]:
            stored_names = {c.split(":", 1)[0] for c in prev["schema_cols"]}
            if key_col not in stored_names:
                raise ValueError(
                    f"delete key {key_col!r} is not a stored column"
                )


def commit_delete(keys_df: DataFrame, path: str, key_col: str) -> int:
    """Commit an equality-delete (Iceberg v2 merge-on-read): every stored
    row from an EARLIER commit whose ``key_col`` appears in ``keys_df``
    becomes invisible to reads at this and later snapshots.  No data file
    is rewritten — the mask applies at read time; ``materialize`` folds
    the debt away.  Returns the new version."""
    with _commit_lock(path):
        prev_v = head_version(path)
        if prev_v == 0:
            raise ValueError(f"{path}: cannot delete from an empty store")
        prev = manifest(path, prev_v)
        _check_delete_key(prev, key_col)
        commit_id = _next_commit_id(path, prev)
        n_keys = _write_delete_commit(keys_df, path, commit_id, key_col)
        man = dict(prev)
        man.update(
            version=prev_v + 1,
            operation="delete",
            ts=time.time(),
            added_commit=None,
            added_rows=0,
            deleted_keys=n_keys,
            deletes=[*prev.get("deletes", []),
                     {"commit": commit_id, "key": key_col, "n_keys": n_keys}],
        )
        return _publish(path, man)


def commit_upsert(
    df: DataFrame,
    path: str,
    key_col: str,
    partition_col: str = "cell_p",
    sort_col: str = "cell",
) -> int:
    """MERGE semantics in ONE atomic snapshot: rows whose ``key_col``
    matches an existing row replace it (equality delete on the batch's
    keys + append of the batch — the delete only masks EARLIER commits,
    so the batch's own rows survive).  Latest-upsert-wins under repeated
    upserts of one key.  Returns the new version."""
    if partition_col not in df.columns:
        raise ValueError(
            f"snapshot upsert needs the {partition_col!r} partition column"
        )
    with _commit_lock(path):
        prev_v = head_version(path)
        prev = manifest(path, prev_v) if prev_v else None
        if prev is not None and prev["commits"]:
            stored = set(prev["schema_cols"])
            incoming = {f"{c.name}:{c.dataType.simpleString()}"
                        for c in df.schema.fields}
            if incoming != stored:
                raise ValueError(
                    f"upsert schema mismatch vs snapshot v{prev_v}: "
                    f"stored={sorted(stored)} incoming={sorted(incoming)}"
                )
        _check_delete_key(prev, key_col)
        del_id = _next_commit_id(path, prev)
        data_id = del_id + 1
        n_keys = _write_delete_commit(df, path, del_id, key_col)
        parts, tiers, added_rows = _write_data_commit(
            df, path, data_id, partition_col, sort_col
        )
        man = {
            "version": (prev_v + 1),
            "operation": "upsert",
            "ts": time.time(),
            "commits": [*(prev["commits"] if prev else []), data_id],
            "added_commit": data_id,
            "added_rows": added_rows,
            "deleted_keys": n_keys,
            "total_rows": added_rows + (prev["total_rows"] if prev else 0),
            "partition_col": partition_col,
            "schema_cols": sorted(
                f"{c.name}:{c.dataType.simpleString()}"
                for c in df.schema.fields
            ),
            "schema_json": df.schema.json(),
            "partitions": {str(data_id): parts},
            "tiers": {str(data_id): tiers},
            "deletes": [*(prev.get("deletes", []) if prev else []),
                        {"commit": del_id, "key": key_col, "n_keys": n_keys}],
        }
        if prev:
            man["partitions"].update(prev["partitions"])
            man["tiers"].update(prev["tiers"])
        return _publish(path, man)


def materialize(spark: SparkSession, path: str) -> int:
    """Fold the merge-on-read delete debt away: rewrite HEAD's effective
    rows as one fresh overwrite snapshot (Iceberg's rewrite_data_files).
    Time travel to pre-materialize versions still works until expired."""
    with _commit_lock(path):
        man = manifest(path)
        if not man.get("deletes"):
            return man["version"]  # nothing to fold
        # read + checkpoint INSIDE the lock: a commit/upsert/delete landing
        # between the effective-rows read and the overwrite publish would
        # otherwise be silently discarded (lost update)
        eff = read(spark, path).drop("commit").localCheckpoint()
        return _commit_unlocked(
            eff, path, mode="overwrite",
            partition_col=man["partition_col"], sort_col="cell",
        )


def rollback(path: str, version: int) -> int:
    """Roll HEAD back to snapshot ``version`` — Iceberg semantics: a NEW
    snapshot whose file list equals the old one (history is append-only;
    nothing is deleted, so the rolled-past snapshots stay readable until
    expired)."""
    with _commit_lock(path):
        target = manifest(path, version)  # raises if expired/absent
        head_v = head_version(path)
        man = dict(target)
        man["version"] = head_v + 1
        man["operation"] = "rollback"
        man["rolled_back_to"] = version
        man["ts"] = time.time()
        man["added_commit"] = None
        man["added_rows"] = 0
        # lineage maps must cover exactly the live commits
        man["partitions"] = {
            str(c): target["partitions"][str(c)] for c in target["commits"]
        }
        man["tiers"] = {
            str(c): target["tiers"].get(str(c), {}) for c in target["commits"]
        }
        return _publish(path, man)


def expire(path: str, keep_last: int = 2) -> dict:
    """Expire all but the last ``keep_last`` snapshots and GC every
    ``commit=N`` directory no retained manifest references (including
    orphans from crashed commits).  Returns
    ``{expired_versions, removed_commits, kept_versions}``.

    Expired versions become unreadable (``read(version=...)`` raises,
    loudly naming the expiry) — exactly Iceberg's ``expire_snapshots``."""
    import shutil

    with _commit_lock(path):
        head_v = head_version(path)
        if head_v == 0:
            return {"expired_versions": [], "removed_commits": [],
                    "kept_versions": []}
        sd = _snap_path(path)
        all_versions = sorted(
            int(f[1:-5]) for f in os.listdir(sd)  # v{N}.json, N may exceed 6 digits
            if f.startswith("v") and f.endswith(".json")
        )
        keep = set(v for v in all_versions[-max(keep_last, 1):])
        keep.add(head_v)  # HEAD is never expired
        expired = [v for v in all_versions if v not in keep]
        live: set[int] = set()
        for v in keep:
            m = manifest(path, v)
            live.update(m["commits"])
            live.update(d["commit"] for d in m.get("deletes", []))
        removed: list[int] = []
        for sub in ("data", "deletes"):
            sub_dir = os.path.join(path, sub)
            if not os.path.isdir(sub_dir):
                continue
            for d in sorted(os.listdir(sub_dir)):
                if not d.startswith("commit="):
                    continue
                cid = int(d.split("=", 1)[1])
                if cid not in live:
                    shutil.rmtree(os.path.join(sub_dir, d))
                    removed.append(cid)
        for v in expired:
            os.unlink(_manifest_file(path, v))
        return {"expired_versions": expired, "removed_commits": removed,
                "kept_versions": sorted(keep)}


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------


def _read_commits(spark: SparkSession, path: str, man: dict,
                  commits: list[int]) -> DataFrame:
    data_dir = os.path.join(path, "data")
    if not commits:  # empty snapshot (overwrite of nothing): typed empty DF
        schema = StructType.fromJson(json.loads(man["schema_json"]))
        return (
            spark.createDataFrame([], schema)
            .withColumn("commit", F.lit(None).cast("int"))
        )
    dirs = [os.path.join(data_dir, f"commit={c}") for c in commits]
    # explicit dirs + basePath: Spark recovers commit/cell_p as partition
    # columns and never LISTS a commit outside the snapshot — time travel
    # is O(files in scope), the property Iceberg manifests exist for.
    return spark.read.option("basePath", data_dir).parquet(*dirs)


def read(spark: SparkSession, path: str,
         version: int | None = None) -> DataFrame:
    """Read the store as of snapshot ``version`` (default HEAD).  The
    result carries a ``commit`` lineage column (which snapshot commit each
    row arrived in) alongside the stored partition column."""
    man = manifest(path, version)
    df = _read_commits(spark, path, man, man["commits"])
    dels = man.get("deletes", [])
    if dels and man["commits"]:
        # merge-on-read equality deletes: a delete masks rows from EARLIER
        # commits only (an upsert's own batch survives its own delete).
        # One anti-join against the union of key files — the Iceberg v2
        # read path; materialize() folds the debt into a fresh snapshot.
        key = dels[0]["key"]
        frames = [
            spark.read.parquet(
                os.path.join(path, "deletes", f"commit={d['commit']}")
            ).select(
                F.col(d["key"]).alias("_dk"),
                F.lit(d["commit"]).alias("_dc"),
            )
            for d in dels
        ]
        all_d = frames[0]
        for fr in frames[1:]:
            all_d = all_d.unionByName(fr)
        df = df.join(
            all_d,
            on=[df[key] == all_d["_dk"], df["commit"] < all_d["_dc"]],
            how="left_anti",
        )
    # planner fast path: occupied tiers for cover joins, merged across the
    # snapshot's live commits (the _stats/tier_counts analogue)
    tiers = sorted(
        {int(t) for per in man["tiers"].values() for t, n in per.items()
         if n > 0}
    )
    if tiers:
        df._gw_tiers = tiers
    return df


def incremental(spark: SparkSession, path: str, from_version: int,
                to_version: int | None = None) -> DataFrame:
    """Rows appended strictly AFTER ``from_version`` up to ``to_version``
    (default HEAD) — reads ONLY the new commits' files.  Raises if the
    range crosses an overwrite/rollback (lineage reset: there is no
    append-only delta to hand out), matching Iceberg's incremental-scan
    contract."""
    from_man = manifest(path, from_version)
    to_man = manifest(path, to_version)
    from_dels = {d["commit"] for d in from_man.get("deletes", [])}
    to_dels = {d["commit"] for d in to_man.get("deletes", [])}
    if from_dels != to_dels:
        raise ValueError(
            f"incremental scan v{from_man['version']}→v{to_man['version']} "
            "crosses delete/upsert commits — the delta is not append-only; "
            "read the full snapshot instead"
        )
    frm, to = set(from_man["commits"]), set(to_man["commits"])
    if not frm <= to:
        raise ValueError(
            f"incremental scan v{from_man['version']}→v{to_man['version']} "
            "crosses a lineage reset (overwrite/rollback removed commits "
            f"{sorted(frm - to)}); read the full snapshot instead"
        )
    new = [c for c in to_man["commits"] if c not in frm]
    return _read_commits(spark, path, to_man, new)


# ---------------------------------------------------------------------------
# metadata tables (Iceberg .snapshots / .partitions analogues)
# ---------------------------------------------------------------------------


def history(spark: SparkSession, path: str) -> DataFrame:
    """The snapshot log as a DataFrame: one row per retained version."""
    rows = []
    sd = _snap_path(path)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(sd)
        if f.startswith("v") and f.endswith(".json")
    )  # numeric sort: zero-padding runs out at 7 digits
    for v in versions:
        m = manifest(path, v)
        rows.append((
            m["version"], m["operation"], m.get("added_commit"),
            m["added_rows"], m["total_rows"], len(m["commits"]),
        ))
    return spark.createDataFrame(
        rows,
        "version int, operation string, added_commit int, "
        "added_rows bigint, total_rows bigint, n_commits int",
    )


def partition_metrics(spark: SparkSession, path: str,
                      version: int | None = None) -> DataFrame:
    """Per-(commit, partition) lineage row counts as of one snapshot —
    the per-partition lineage table the north rule requires, queryable."""
    man = manifest(path, version)
    rows = [
        (int(c), pv, n)
        for c, parts in man["partitions"].items()
        for pv, n in parts.items()
        if int(c) in set(man["commits"])
    ]
    return spark.createDataFrame(
        rows, f"commit int, {man['partition_col']} string, n_rows bigint"
    )
