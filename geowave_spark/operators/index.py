"""Ingest-side indexing: attach cell keys, explode footprints, salt, write.

The reference's IndexWriter computes per-entry insertion IDs (tier + SFC key,
possibly several per entry) and writes them as sorted KV rows
(core/store/.../index/DataStoreIndexWriter.java).  Here the same step is a
DataFrame transform: points get one ``cell`` at MAX_RES; envelopes get a
tier from the duplicate-bound rule and ≤4 exploded cells; rows carry
``n_dup`` so query-side dedup can be skipped when nothing was duplicated
(reference DedupeFilter gating, EntryRowID.java:76-78).

Scale notes (100 TB posture):
* the table is written partitioned by ``cell_p`` (coarse parent, res
  PARTITION_RES) and sorted by ``cell`` within files → partition pruning +
  parquet row-group min/max pruning stand in for the KV store's sorted scan.
* ``salt`` spreads hot cells (dense urban tiles) across writers/readers —
  the reference's hash-prefix partitioner (HashKeyIndexStrategy.java:247).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.functions import cols as X
from geowave_spark.functions import udfs as U

PARTITION_RES = 4  # 256 coarse partitions world-wide; tune per deployment
DEFAULT_SALT_BUCKETS = 16


def _invariant_guard(bad, msg: str):
    """Fail-fast predicate for ``.filter``: raises when ``bad``, passes every
    row otherwise.  Keeping the guard in a standalone filter (instead of
    folding raise_error into an explode bound) confines any interpreted-eval
    fallback to ONE cheap comparison per pre-explode row while the sequence
    bounds stay whole-stage codegen."""
    return F.when(
        bad, F.expr(f"raise_error('{msg}')").cast("boolean")
    ).otherwise(F.lit(True))


def parent_cell_col(cell: str, res: int):
    """JVM-side (codegen) parent-cell derivation: (res<<58) | (z >> 2Δ).

    Valid when every input cell's resolution ≥ ``res``; the bit layout makes
    tier coarsening a pure shift (SURVEY §2.1 'multiple resolutions =
    bit-shift of the same key').  Expressed via SQL so the shift amount can
    be a column (the PySpark wrapper only accepts int literals)."""
    return F.expr(
        f"shiftleft(cast({res} as bigint), {C.RES_SHIFT}) | "
        f"shiftrightunsigned({cell} & {int(C.COORD_MASK)}, "
        f"cast((shiftright({cell}, {C.RES_SHIFT}) - {res}) * 2 as int))"
    )


def index_points(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = C.MAX_RES,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    id_col: str | None = None,
    salt_mode: str = "hash",
) -> DataFrame:
    """Attach ``cell`` (res 29 by default), ``cell_p`` and ``salt`` columns.

    The encode is pure JVM column math (functions/cols.py) — no Python
    worker in the ingest hot path; the pandas-UDF variant (functions/udfs.py)
    is kept for SQL registration and per-row-resolution cases.

    ``salt_mode``: 'hash' = content-deterministic hash prefix (reference
    HashKeyIndexStrategy.java); 'round_robin' = per-task rotating prefix
    (reference RoundRobinKeyIndexStrategy — perfectly even write spread,
    NOT content-deterministic, so reads must fan over all buckets; prefer
    'hash' unless the write path is the bottleneck)."""
    out = df.withColumn(
        "cell", X.cell_encode_col(F.col(lon_col), F.col(lat_col), res)
    ).withColumn("tier", F.lit(res).cast("long"))
    out = out.withColumn("cell_p", parent_cell_col("cell", PARTITION_RES))
    if salt_mode == "round_robin":
        # monotonically_increasing_id is (partition << 33) | seq — taking it
        # mod buckets rotates within each task, the reference's per-writer
        # round-robin counter re-expressed without shared state
        out = out.withColumn(
            "salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
        )
    elif salt_mode == "hash":
        salt_src = F.col(id_col) if id_col else F.col(lon_col) * 100000 + F.col(lat_col)
        out = out.withColumn("salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
    else:
        raise ValueError(salt_mode)
    out = out.withColumn("n_dup", F.lit(0))
    # statically-known tier metadata: queries skip the tier-discovery scan
    out._gw_tiers = [res]
    return out


def index_envelopes(
    df: DataFrame,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    id_col: str | None = None,
) -> DataFrame:
    """Tier-select each envelope, explode into its ≤4 covering cells.

    Output grain: one row per (entry, cell).  ``n_dup`` = number of extra
    copies (0 for single-cell entries) so queries can skip dedup when the
    whole table is duplicate-free."""
    tiered = df.withColumn(
        "tier", U.tier_select(F.col(minx), F.col(miny), F.col(maxx), F.col(maxy))
    )
    covered = tiered.withColumn(
        "cells",
        U.cover_envelope(
            F.col(minx), F.col(miny), F.col(maxx), F.col(maxy), F.col("tier")
        ),
    ).withColumn("n_dup", F.size("cells") - 1)
    out = covered.withColumn("cell", F.explode("cells")).drop("cells")
    out = out.withColumn("cell_p", parent_cell_col("cell", PARTITION_RES))
    salt_src = F.col(id_col) if id_col else F.col(minx) * 100000 + F.col(miny)
    return out.withColumn("salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))


def write_indexed(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist an indexed table partitioned by coarse cell, sorted by cell.

    On a production deployment this is an Iceberg ``writeTo(...).append()``
    with PARTITIONED BY (cell_p) + SORTED BY (cell); the sandbox has no
    Iceberg runtime jar, so we emit the same layout as partitioned parquet —
    identical pruning behavior for these plans."""
    (
        df.repartition(F.col("cell_p"), F.col("salt"))
        # the sort prefix MUST start with the write's partition column:
        # partitionBy requires [cell_p] ordering, and a bare `cell` sort
        # would make FileFormatWriter insert its own NON-STABLE sort on
        # cell_p that can scramble the within-file cell order on spill —
        # the sorted-run property row-group pruning depends on
        .sortWithinPartitions("cell_p", "cell")
        .write.mode(mode)
        .partitionBy("cell_p")
        .parquet(path)
    )
    # co-write the stats store (reference DataStatistics metadata table):
    # tier occupancy drives query-side tier selection with NO discovery
    # scan (TieredSFCIndexStrategy.java:131-138 tier metadata analogue).
    # On append, MERGE with the existing counts — overwriting with only the
    # appended batch's tiers would silently drop rows at the missing tiers
    # from every later cover join.
    from geowave_spark import stats as ST

    tc = ST.tier_counts(df)
    if mode == "append":
        from pyspark.errors import AnalysisException

        # the merge below is read-modify-write: two concurrent appenders
        # interleaving it would each merge against the same `prev` and the
        # second publish would silently drop the first batch's counts from
        # every later cover join — serialize writers for the whole
        # critical section (production: an Iceberg metadata-table commit,
        # where optimistic snapshot retry gives the same guarantee)
        with _tier_counts_lock(path):
            _heal_tier_counts(path)  # BEFORE the read: a crashed swap's
            # counts live in tier_counts.old and must join the merge
            try:
                prev = df.sparkSession.read.parquet(f"{path}/_stats/tier_counts")
                tc = (
                    tc.unionByName(prev)
                    .groupBy("tier")
                    .agg(F.sum("n_rows").alias("n_rows"))
                )
            except AnalysisException as e:
                # ONLY "store doesn't exist yet" means nothing-to-merge; any
                # other failure (corrupt file, permission, concurrent writer)
                # must abort — overwriting with batch-only counts would
                # silently drop every historical tier from later cover joins.
                msg = str(e)
                if "PATH_NOT_FOUND" not in msg and "does not exist" not in msg:
                    raise
            tc = tc.localCheckpoint()  # sever lineage from the replaced file
            _publish_tier_counts(tc, path)
    else:
        _publish_tier_counts(tc, path)


TIER_LOCK_TIMEOUT = 30.0  # seconds a contending appender waits for the lock


def _tier_counts_lock(path: str):
    """Exclusive writer lock over the tier-count read-merge-publish.

    O_CREAT|O_EXCL lock file — atomic on POSIX local/NFS4 filesystems
    (where this parquet layout runs; object-store deployments use Iceberg
    commits instead).  Contention waits up to TIER_LOCK_TIMEOUT then
    raises loudly, naming the lock file: a crashed writer's stale lock is
    removed by the operator, never silently — guessing staleness risks
    the exact lost update the lock exists to prevent."""
    import contextlib
    import os
    import time

    @contextlib.contextmanager
    def _lock():
        os.makedirs(f"{path}/_stats", exist_ok=True)
        lockfile = f"{path}/_stats/tier_counts.lock"
        deadline = time.monotonic() + TIER_LOCK_TIMEOUT
        while True:
            try:
                fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise RuntimeError(
                        f"tier_counts writer lock held: {lockfile} — another "
                        "writer is appending to this store (or crashed while "
                        "doing so; verify and remove the lock file)"
                    ) from None
                time.sleep(0.05)
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            yield
        finally:
            os.unlink(lockfile)

    return _lock()


def _heal_tier_counts(path: str) -> None:
    """Recover from a crash between the two publish renames: a
    ``tier_counts.old`` with no live dir is the previous store — rename
    it back so the merge sees it.  Stray staging dirs are discarded
    (never committed)."""
    import os
    import shutil

    if "://" in path:
        return
    target = f"{path}/_stats/tier_counts"
    if not os.path.exists(target) and os.path.exists(target + ".old"):
        os.rename(target + ".old", target)
    shutil.rmtree(target + ".staging", ignore_errors=True)


def _publish_tier_counts(tc: DataFrame, path: str) -> None:
    """Swap-in publish of ``_stats/tier_counts`` (the compact.py pattern):
    write aside, rename the live dir out, rename the new one in.  A bare
    ``mode("overwrite")`` deletes before it writes, so a concurrent reader
    could observe a missing/partial store; with the swap the live dir is
    whole at every instant.  A crash between the renames leaves
    ``tier_counts.old`` next to a missing live dir — healed before the
    next merge reads (:func:`_heal_tier_counts`)."""
    import os
    import shutil

    target = f"{path}/_stats/tier_counts"
    if "://" in path:  # non-local URI: no rename primitive; plain overwrite
        tc.write.mode("overwrite").parquet(target)
        return
    staging, bak = target + ".staging", target + ".old"
    tc.write.mode("overwrite").parquet(staging)
    shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(target):
        os.rename(target, bak)
    os.rename(staging, target)
    shutil.rmtree(bak, ignore_errors=True)


def read_indexed(spark, path: str) -> DataFrame:
    """Read an indexed table; attaches occupied-tier metadata from the
    co-written stats store so cover joins skip the tier-discovery scan.

    The ``_gw_tiers`` attribute is a fast-path hint only — ANY DataFrame
    transformation returns a new object and drops it.  The DURABLE channel
    is the stats store itself: query builders recover it through
    :func:`stats_tiers_for`, which walks the (transformation-surviving)
    plan back to the source files and reads ``_stats/tier_counts``."""
    df = spark.read.parquet(path)
    try:
        df._gw_tiers = read_stats_tiers(spark, path)
    except Exception:
        pass  # no stats store (externally-written table): queries fall back
    return df


def read_stats_tiers(spark, path: str) -> list[int]:
    """Occupied tiers from a table's co-written stats store."""
    return sorted(
        int(r["tier"])
        for r in spark.read.parquet(f"{path}/_stats/tier_counts")
        .filter(F.col("n_rows") > 0)
        .collect()
    )


def cell_p_is_stored(df: DataFrame) -> bool:
    """True iff some LEAF of ``df``'s plan outputs a ``cell_p`` attribute
    — i.e. the column originates from storage (a partitioned file scan, a
    materialized local batch, an RDD), not from a projection expression.

    The distinction is load-bearing: on a frame whose ``cell_p`` is
    DERIVED (index_points over a view), a ``cell_p`` filter makes
    Catalyst re-inline the whole cell derivation into the pushed-down
    scan filter — measured 3× on the bbox suite — while pruning nothing.
    On a stored column the same filter is a directory PartitionFilters
    prune (cell_p-partitioned store) or a cheap row predicate on a
    materialized column (e.g. the in-memory tail of a store ∪ batch
    union), so ANY-leaf-carries-it is the right gate — predicates push to
    each union/join branch independently."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            out = leaves.apply(i).output()
            for j in range(out.size()):
                if str(out.apply(j).name()) == "cell_p":
                    return True
        return False
    except Exception:
        return False


def stats_tiers_for(df: DataFrame) -> list[int] | None:
    """Occupied tiers for ``df`` from its source table's co-written stats
    store — survives arbitrary DataFrame transformations (filter/select/
    alias), unlike the ``_gw_tiers`` attribute.

    Walks the plan's input files up past ``key=value`` partition dirs to
    the table root(s) and reads ``_stats/tier_counts`` (a tiny metadata
    parquet — reading it is O(tiers), not a data scan).  Returns None when
    ``df`` is not file-backed or no source has a stats store, in which
    case callers fall back to a tier-discovery scan.  Production callers
    that know the store path should pass ``tiers=``/``stats_path=``
    explicitly and skip even this driver-side file listing."""
    import os

    try:
        # inputFiles() only reports FILE-SCAN leaves: a plan that unions a
        # stored table with an in-memory/RDD-backed batch would yield the
        # stored table's files alone, and the batch's tiers would be
        # silently missing — the exact partial-list failure this function
        # exists to prevent.  Demand that EVERY leaf is a file relation.
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() != "LogicalRelation":
                return None
            rel = leaf.relation()
            if rel.getClass().getSimpleName() != "HadoopFsRelation":
                return None
        files = df.inputFiles()
    except Exception:
        return None
    # EVERY file's root must contribute: a truncated listing (or a root
    # without a stats store) would yield a partial tier list, and a cover
    # join over partial tiers silently drops rows at the missing tiers.
    # Dirname-dedupe first — the per-file python cost is one dict op.
    roots = set()
    for d in {os.path.dirname(f) for f in files}:
        while "=" in os.path.basename(d):
            d = os.path.dirname(d)
        roots.add(d)
    if not roots:
        return None
    tiers: set[int] = set()
    for root in roots:
        try:
            tiers.update(read_stats_tiers(df.sparkSession, root))
        except Exception:
            return None  # any statless source ⇒ whole answer unusable
    return sorted(tiers)


def index_envelopes_milli(
    df: DataFrame,
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    id_col: str | None = None,
    max_cells_per_dim: int = 4,
) -> DataFrame:
    """Exact-integer envelope indexing — the multi-cell getInsertionIds path
    (TieredSFCIndexStrategy.java:175-231) as pure JVM codegen.

    Tier from the extent rule (≤2 cells/dim guaranteed), cover via
    sequence() explodes, cell packed with the Morton columns; ``n_dup`` =
    extra copies for the reference's DedupeFilter gating.  Integer
    milli-degree arithmetic end-to-end → bit-reproducible in SQL oracles.
    """
    from geowave_spark.session import spread

    # fan-out-dense: don't let a few-split source serialize the cover
    df = spread(df)

    mnx, mny, mxx, mxy = env_cols
    tier = X.tier_extent_milli_col(F.col(mxx) - F.col(mnx), F.col(mxy) - F.col(mny))
    # Bind tier as a RUNTIME attribute (1-element explode = a Generate
    # barrier): neither project-collapse nor filter-pushdown can substitute
    # a generated attribute, so the large tier expression is evaluated
    # exactly once per row and downstream expressions (grid bounds, the
    # invariant guard filter) stay small enough for whole-stage codegen.
    # A plain withColumn alias gets re-inlined by predicate pushdown —
    # measured: the guard filter blew the 64 KB codegen limit and dropped
    # the stage to interpreted eval.
    d = df.withColumn("tier", F.explode(F.array(tier)))
    t = F.col("tier")
    ix0 = X.grid_milli_col(F.col(mnx), 180_000, C.LON_SPAN_MILLI, t)
    ix1 = X.grid_milli_col(F.col(mxx), 180_000, C.LON_SPAN_MILLI, t)
    iy0 = X.grid_milli_col(F.col(mny), 90_000, C.LAT_SPAN_MILLI, t)
    iy1 = X.grid_milli_col(F.col(mxy), 90_000, C.LAT_SPAN_MILLI, t)
    d = (
        d.withColumn("_ix0", ix0)
        .withColumn("_ix1", ix1)
        .withColumn("_iy0", iy0)
        .withColumn("_iy1", iy1)
    )
    # The extent tier rule guarantees ≤2 cells/dim; a wider span means the
    # invariant was violated (e.g. inverted envelope) — fail fast, never
    # silently truncate the cover.  The guard runs ONCE per pre-explode row
    # as a filter (a filter cannot be pruned and cannot move past the
    # generate), keeping the sequence bounds clean codegen expressions —
    # folding raise_error into _ix1 dropped the whole explode tree to
    # interpreted eval (measured ~11s on the sf0.1 spatial_join suite).
    d = d.filter(_invariant_guard(
        (F.col("_ix1") - F.col("_ix0") + 1 > max_cells_per_dim)
        | (F.col("_iy1") - F.col("_iy0") + 1 > max_cells_per_dim)
        | (F.col("_ix1") < F.col("_ix0"))  # inverted envelope: sequence()
        | (F.col("_iy1") < F.col("_iy0")),  # would silently DESCEND
        "index_envelopes_milli: envelope cover exceeds max_cells_per_dim "
        "at its selected tier or is inverted — tier-rule invariant violated",
    ))
    d = d.withColumn(
        "n_dup",
        ((F.col("_ix1") - F.col("_ix0") + 1) * (F.col("_iy1") - F.col("_iy0") + 1) - 1).cast("int"),
    )
    d = (
        d.withColumn("_cx", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))))
        .withColumn("_cy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
        .withColumn("cell", X.pack_col(F.col("_cx"), F.col("_cy"), t))
        .drop("_ix0", "_ix1", "_iy0", "_iy1", "_cx", "_cy")
    )
    d = d.withColumn("cell_p", parent_cell_col("cell", PARTITION_RES))
    salt_src = F.col(id_col) if id_col else F.col(mnx)
    return d.withColumn("salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
