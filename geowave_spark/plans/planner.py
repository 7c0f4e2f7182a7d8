"""Query planner: spatial constraints → broadcast cell-cover join plan.

This is the engine's version of the reference's query lifecycle stages 2-4
(BaseDataStore.internalQuery → ConstraintsQuery range decomposition →
scanner; SURVEY §3.1): the driver decomposes each query geometry into a
bounded set of cover cells (numpy, ≤ ``max_cells`` — the analogue of
MAX_RANGE_DECOMPOSITION=2000, ConstraintsQuery.java:35-36), broadcasts them,
and equi-joins against the indexed table on a JVM-side computed parent key.

Key idea: data rows live at per-row tier resolutions; a query with cover
resolution ``r_q`` joins on ``parent(cell, min(tier, r_q))`` — a pure
bit-shift column expression (whole-stage codegen) — while its cover is
materialized at ``min(t, r_q)`` for every occupied tier ``t``.  Queries with
different ``r_q`` are grouped, one broadcast join per group, results
unioned.  The reference walks tiers the same way on its sorted-scan side
(TieredSFCIndexStrategy.getQueryRanges:119-165, tier-skip :136-138).

Everything downstream (residual predicates, PIP refinement, dedup, top-k) is
appended by the operator modules.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C


@dataclass
class BoxQuery:
    """One bbox query; ``minx > maxx`` means antimeridian wrap."""

    query_id: str
    minx: float
    miny: float
    maxx: float
    maxy: float
    # optional payload passed through to the result (e.g. temporal bounds)
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        self.minx = float(self.minx)
        self.miny = float(self.miny)
        self.maxx = float(self.maxx)
        self.maxy = float(self.maxy)

    def boxes(self) -> list[tuple[float, float, float, float]]:
        return C.split_antimeridian(self.minx, self.miny, self.maxx, self.maxy)


def cover_resolution(q: BoxQuery, max_cells: int, max_res: int = C.MAX_RES) -> int:
    """Finest resolution whose cover of the query box fits the budget."""
    res = max_res
    while res > 0:
        if sum(C.cover_count(*b, res) for b in q.boxes()) <= max_cells:
            break
        res -= 1
    return res


def _cover_rows(q: BoxQuery, resolutions: set[int]) -> pd.DataFrame:
    """Materialize the union of this query's covers at each resolution."""
    parts = []
    for r in resolutions:
        cells = np.unique(
            np.concatenate([C.cover_bbox(*b, r) for b in q.boxes()])
        )
        parts.append(cells)
    cells = np.unique(np.concatenate(parts))
    return pd.DataFrame({"query_id": q.query_id, "jcell": cells})


def partition_prune_cells(jcells: np.ndarray, p_res: int) -> np.ndarray:
    """The ≤ 4^p_res coarse partition keys any join-matching row can carry.

    A row matches the cover join only if its parent at some resolution r
    equals a cover cell; its ``cell_p`` (parent at ``p_res``) is then
    forced: parent(c, p_res) when r ≥ p_res, else one of c's res-p_res
    descendants.  Filtering ``cell_p`` to this closed set is therefore
    implied by the join — it changes NO output row, but on the partitioned
    store (write_indexed: partitionBy cell_p) it becomes a
    PartitionFilters entry, so only the matching directory partitions are
    listed/read (the Iceberg partition-pruning shape at 100 TB).

    Returns None — prune nothing — when any cover cell is coarser than
    ``p_res``: such a cell can match rows whose tier is also coarser than
    ``p_res``, and those rows' ``cell_p`` is not a refinement of their key
    (parent_cell_col requires tier ≥ p_res), so no closed key set exists.
    Cover cells at res ≥ p_res only ever match rows with tier ≥ res (the
    key embeds its resolution), whose ``cell_p`` IS the cover cell's
    p_res ancestor — the exact case."""
    jc = np.unique(np.asarray(jcells, dtype=np.int64)).astype(np.uint64)
    res = (jc >> np.uint64(C.RES_SHIFT)).astype(np.int64)
    if (res < p_res).any():
        return None
    z = jc & np.uint64(C.COORD_MASK)
    p_key = np.uint64(p_res) << np.uint64(C.RES_SHIFT)
    shift = ((res - p_res) * 2).astype(np.uint64)
    return np.unique(p_key | (z >> shift)).astype(np.int64)


def data_join_key(r_q: int):
    """parent(cell, min(tier, r_q)) as a codegen'd column expression.

    Uses SQL text because the shift amount is a column (the PySpark
    shift wrappers only accept int literals)."""
    return F.expr(
        f"shiftleft(least(tier, {r_q}), {C.RES_SHIFT}) | "
        f"shiftrightunsigned(cell & {int(C.COORD_MASK)}, "
        f"cast((tier - least(tier, {r_q})) * 2 as int))"
    )


def cover_join(
    data: DataFrame,
    queries: list[BoxQuery],
    tiers: list[int] | None = None,
    max_cells: int = 1024,
    stats_path: str | None = None,
) -> DataFrame:
    """Broadcast cover join: returns ``data`` rows × matching ``query_id``.

    This is the *prefilter* (index scan analogue) — a superset of the true
    result.  Callers append exact refinement.  Rows from multi-cell entries
    (``n_dup > 0``) may appear once per matched copy; callers dedupe
    conditionally (reference DedupeFilter semantics).
    """
    spark = data.sparkSession
    if tiers is None:
        # resolution order: the attribute fast path (index_points static
        # tier — survives only on the unmodified object), then an explicit
        # stats store path, then the stats store RECOVERED from the plan's
        # source files (survives filter/select — operators/index.py
        # stats_tiers_for); the tier-discovery distinct scan is the LAST
        # resort (at 100 TB it is a full extra pass per query)
        tiers = getattr(data, "_gw_tiers", None)
    if tiers is None and stats_path is not None:
        from geowave_spark.operators.index import read_stats_tiers

        tiers = read_stats_tiers(spark, stats_path)
    if tiers is None:
        from geowave_spark.operators.index import stats_tiers_for

        tiers = stats_tiers_for(data)
    if tiers is None:
        tiers = [row[0] for row in data.select("tier").distinct().collect()]
    tiers = sorted(int(t) for t in tiers)

    groups: dict[int, list[BoxQuery]] = {}
    for q in queries:
        r_q = cover_resolution(q, max_cells)
        groups.setdefault(r_q, []).append(q)

    # Broadcast side: union of every group's cover (cell keys embed their
    # resolution, so keys from different groups never collide spuriously).
    cover_pdf = pd.concat(
        [
            _cover_rows(q, {min(t, r_q) for t in tiers})
            for r_q, qs in groups.items()
            for q in qs
        ]
    )
    cover = spark.createDataFrame(cover_pdf)

    # Data side: ONE scan.  Each row explodes to its parent key at each
    # group resolution; ``array_distinct`` collapses groups that coincide
    # for this row's tier (tier <= r_q1 < r_q2 ⇒ same key), which would
    # otherwise double-match that key's cover cells.  Explode factor =
    # number of distinct cover-resolution groups (small: queries bucket
    # into few resolutions), each key a pure bit-shift — all codegen.
    # Partition pruning: the cell_p filter is implied by the join (see
    # partition_prune_cells) — a no-op on output rows, a PartitionFilters
    # prune on the partitioned store.  Gated to frames whose cell_p comes
    # FROM A LEAF (stored column): on a derived frame the same filter
    # re-inlines the whole cell derivation into the scan's DataFilters
    # (measured 3× on the bbox suite) while pruning nothing.
    if "cell_p" in data.columns:
        from geowave_spark.operators.index import (
            PARTITION_RES,
            cell_p_is_stored,
        )

        if cell_p_is_stored(data):
            pcs = partition_prune_cells(
                cover_pdf["jcell"].to_numpy(np.int64), PARTITION_RES
            )
            if pcs is not None:
                data = data.filter(F.col("cell_p").isin([int(v) for v in pcs]))

    keys = F.array_distinct(F.array(*[data_join_key(r_q) for r_q in groups]))
    joined = data.withColumn("_jkey", F.explode(keys)).join(
        F.broadcast(cover), F.col("_jkey") == F.col("jcell"), "inner"
    )
    return joined.drop("_jkey", "jcell")


def bbox_residual(q_minx, q_miny, q_maxx, q_maxy, lon=None, lat=None):
    """Exact point-in-box residual as JVM column predicate, with
    antimeridian wrap on longitude (LongitudeDefinition bin semantics)."""
    lon = F.col("lon") if lon is None else lon
    lat = F.col("lat") if lat is None else lat
    lat_ok = (lat >= q_miny) & (lat <= q_maxy)
    normal = (lon >= q_minx) & (lon <= q_maxx)
    wrapped = (lon >= q_minx) | (lon <= q_maxx)
    if isinstance(q_minx, F.Column) or isinstance(q_maxx, F.Column):
        return lat_ok & F.when(q_minx > q_maxx, wrapped).otherwise(normal)
    return lat_ok & (wrapped if q_minx > q_maxx else normal)
