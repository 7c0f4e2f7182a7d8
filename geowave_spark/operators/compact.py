"""Store compaction — the small-files maintenance pass a 100 TB lake needs.

The reference never compacts its own data: it delegates to the KV store's
major compaction (Accumulo/HBase rewrite sorted small files into big sorted
files in the background).  A parquet/Iceberg lake has the same problem with
no background daemon: streaming micro-batches and incremental ``append``
ingests leave each ``cell_p=`` partition littered with small files, and at
scale that destroys scan throughput (per-file open cost, tiny row groups,
useless min/max pruning).  This operator is the explicit equivalent:
rewrite only the partitions that need it, restoring BOTH invariants the
fast query path relies on —

* few large files per partition (~``target_file_bytes``);
* files RANGE-DISJOINT and sorted on ``cell`` (``repartitionByRange`` +
  ``sortWithinPartitions``), so a cover-join range scan prunes whole files
  from parquet footers — the KV store's sorted-run property, re-established.

Rows are bit-identical before/after (pytest-pinned); the co-written
``_stats`` store is untouched (tier counts are content stats, invariant
under re-layout).  The directory swap is best-effort-atomic (write aside,
rename in); production is Iceberg's ``rewrite_data_files`` where the swap
is a snapshot commit and readers never observe a partial state.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _data_files(d: str) -> list[str]:
    return [
        f
        for f in sorted(os.listdir(d))
        if not f.startswith((".", "_")) and os.path.isfile(os.path.join(d, f))
    ]


def compact_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
    sort_col: str = "cell",
) -> dict:
    """Compact every ``key=value`` partition of an indexed store whose file
    layout is worse than ``target_file_bytes`` would produce.  Returns
    ``{partitions_seen, partitions_compacted, files_before, files_after}``.

    Skip rule: a partition is left untouched unless it has ≥ ``min_files``
    files AND merging would actually reduce the file count — compaction is
    idempotent and safe to run on a schedule.
    """
    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        # a live streaming sink's reads go through its _spark_metadata
        # transaction log — rewriting files underneath it breaks every
        # read AND would surface uncommitted orphans.  Reconcile first.
        raise ValueError(
            f"{path} is a streaming file sink (_spark_metadata present); "
            "stop the query and run "
            "streaming.ingest.decommission_stream_sink() before compacting"
        )
    part_dirs = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    seen = before = after = 0
    compacted: list[str] = []
    for pd in part_dirs:
        files = _data_files(pd)
        seen += 1
        before += len(files)
        total = sum(os.path.getsize(os.path.join(pd, f)) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if len(files) < min_files or n_out >= len(files):
            after += len(files)
            continue
        # read ONLY this partition's files (the partition column lives in
        # the directory name, not the files — the rewrite preserves that)
        df = spark.read.parquet(pd)
        tmp = pd + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.repartitionByRange(n_out, F.col(sort_col))
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # swap in: rename the old dir aside, the new one in, drop the old.
        # A crash between the renames leaves `<dir>.old` next to a missing
        # partition — recover_partial() below heals it; Iceberg's snapshot
        # commit is the production form with no window at all.
        bak = pd + ".old"
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(pd, bak)
        os.rename(tmp, pd)
        shutil.rmtree(bak)
        compacted.append(os.path.basename(pd))
        after += len(_data_files(pd))
    return {
        "partitions_seen": seen,
        "partitions_compacted": len(compacted),
        "compacted": compacted,
        "files_before": before,
        "files_after": after,
    }


def recover_partial(path: str) -> list[str]:
    """Heal a store after a crash mid-swap: any ``<dir>.old`` whose live
    directory is missing is renamed back; stray ``.compacting`` /
    orphaned ``.old`` dirs are dropped.  Returns the healed partitions."""
    healed = []
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if d.endswith(".compacting"):
            shutil.rmtree(full, ignore_errors=True)
        elif d.endswith(".old"):
            live = full[: -len(".old")]
            if not os.path.exists(live):
                os.rename(full, live)
                healed.append(os.path.basename(live))
            else:
                shutil.rmtree(full, ignore_errors=True)
    return healed
