"""S2-analogue cell index operators: leaf indexing, per-cell density,
and covering-driven bbox queries.

The scale story this family adds over the repo's tiered Morton index
(operators/index.py, plans/planner.py — the TieredSFCIndexStrategy.java
parity path): ONE sortable int64 key space for every level.  Because an
S2-style cell's descendants occupy a contiguous id interval
(functions/s2cells.py), a region query is a union of ranges over the
SAME leaf-sorted table — range scans and parquet min/max pruning apply
with no per-tier unions, and the covering can mix levels freely
(coarse interior cells, fine boundary cells).

Plan shapes:

* ``s2_index``   — pure column math (cols.s2_leaf_col), zero shuffle.
  The encode is LET-BOUND per stage (interpreted lambda, ~60 int
  ops/row): the spread ladder self-references 2^5 times, and unbound
  it duplicates whatever derivation the optimizer inlines upstream —
  measured 564 KB plans / 25 s of driver fixed-point time over the
  derived geo_events coords.  Bound plans are O(expr) sized.
* ``s2_density`` — ONE map-side-combinable groupBy on the level-L
  ancestor id (single packed key — the hexbin.py codegen lesson).
* ``s2_bbox_query`` — the covering is computed DRIVER-SIDE from the
  query literal (≤ max_cells cells, never data-dependent), translated
  to MERGED LEAF-ID RANGES, and evaluated as two-compare range arms:
  interior ranges need NO exact refinement (fully inside the box by
  construction), boundary ranges AND the exact box predicate.  No
  join, no shuffle — a scan filter; over a stored leaf column the
  arms push down to parquet row-group min/max (test_s2.py asserts
  PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import numpy as np

from geowave_spark.functions import cols as X
from geowave_spark.functions import geometry as G
from geowave_spark.functions import s2cells as S2
from geowave_spark.session import spread


def s2_index(
    df: DataFrame,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    out_col: str = "s2_leaf",
) -> DataFrame:
    """Attach the MAX_LEVEL leaf cell id — column math only."""
    return df.withColumn(out_col, X.s2_leaf_col(F.col(lon_col), F.col(lat_col)))


def s2_density(
    df: DataFrame,
    level: int,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
) -> DataFrame:
    """Per-cell counts at ``level`` with the cell's descendant leaf-id
    range (the contiguity invariant, emitted so downstream range scans
    can consume the aggregate directly).  One partial-aggregated
    shuffle on the single packed cell id."""
    leaf = X.s2_leaf_col(F.col(lon_col), F.col(lat_col))
    cell = X.s2_parent_col(leaf, level)
    # Interpreted leaf eval (let-bound HOF) is the per-row cost: unlock
    # cores when the source is one tiny split (no-op at real scale).
    df = spread(df.select(lon_col, lat_col))
    out = df.select(cell.alias("cell_id")).groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rmin, rmax = X.s2_range_cols(F.col("cell_id"))
    return out.select(
        "cell_id",
        F.shiftright(F.col("cell_id"), S2.FACE_SHIFT).alias("face"),
        rmin.alias("range_min"),
        rmax.alias("range_max"),
        "cnt",
    )


def _range_arms(leaf: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR over merged leaf-id ranges: each arm is two long compares."""
    cond = F.lit(False)
    for lo, hi in ranges:
        cond = cond | ((leaf >= F.lit(lo)) & (leaf <= F.lit(hi)))
    return cond


# ---------------------------------------------------------------------------
# Leaf-sorted store: the single-SFC analogue of operators/index.py's
# tiered cell_p store.  One partition column (the level-LEAF_PARTITION_LEVEL
# ancestor id — ≤ 6*4^L directories, never data-dependent) gives
# directory-level PartitionFilters pruning; the within-file sort on the
# leaf id gives parquet row-group min/max pruning for the range arms.
# Together a box query reads only the directories AND row groups its
# covering touches — the reference's range-scan read path
# (core/store/.../base/BaseDataStore.java query over sorted KV ranges)
# re-expressed as parquet layout.
# ---------------------------------------------------------------------------

LEAF_PARTITION_LEVEL = 2  # 6 faces × 4^2 = 96 directories max
LEAF_PARTITION_COL = "leaf_p"
_PRUNE_CAP = 96  # isin wider than the directory count prunes nothing


def write_s2_store(
    df: DataFrame,
    path: str,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    mode: str = "overwrite",
    leaf_col: str = "s2_leaf",
) -> None:
    """Persist a leaf-sorted S2 store: attach the leaf id + its
    level-LEAF_PARTITION_LEVEL ancestor, repartition by the ancestor
    (one writer task family per directory), sort within partitions by
    (leaf_p, leaf) — partitionBy requires the partition-column prefix,
    and the leaf suffix is what makes every file a sorted run for
    row-group min/max pruning (the write_indexed lesson,
    operators/index.py:128).  Production: Iceberg PARTITIONED BY
    (leaf_p) SORTED BY (s2_leaf); the sandbox emits the same layout as
    partitioned parquet."""
    out = s2_index(df, lon_col=lon_col, lat_col=lat_col, out_col=leaf_col)
    out = out.withColumn(
        LEAF_PARTITION_COL, X.s2_parent_col(F.col(leaf_col), LEAF_PARTITION_LEVEL)
    )
    (
        out.repartition(F.col(LEAF_PARTITION_COL))
        .sortWithinPartitions(LEAF_PARTITION_COL, leaf_col)
        .write.mode(mode)
        .partitionBy(LEAF_PARTITION_COL)
        .parquet(path)
    )


def read_s2_store(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _partition_prune_ids(
    ranges: list[tuple[int, int]], level: int = LEAF_PARTITION_LEVEL
) -> list[int] | None:
    """Level-``level`` ancestor ids of every leaf in the merged ranges —
    the directory prune set.  Ancestors of a contiguous leaf interval are
    themselves contiguous in id space (stride 2·lsb), so each range
    contributes an arithmetic progression.  Returns None when the set
    reaches the directory count (prune would be vacuous)."""
    step = np.int64(2) << np.int64(2 * (S2.MAX_LEVEL - level))
    ids: set[int] = set()
    for lo, hi in ranges:
        p_lo = int(S2.parent(np.int64(lo), level))
        p_hi = int(S2.parent(np.int64(hi), level))
        n = (p_hi - p_lo) // int(step) + 1
        if len(ids) + n > _PRUNE_CAP:
            return None
        ids.update(range(p_lo, p_hi + 1, int(step)))
    return sorted(ids)


def _stored_filter(
    df: DataFrame,
    leaf_col: str,
    int_ranges: list[tuple[int, int]],
    bnd_ranges: list[tuple[int, int]],
    exact: Column,
) -> DataFrame:
    """Range arms over a STORED leaf column, plus the directory prune
    when the store carries the leaf_p partition column."""
    stored = F.col(leaf_col)
    cond = _range_arms(stored, int_ranges) | (
        _range_arms(stored, bnd_ranges) & exact
    )
    if LEAF_PARTITION_COL in df.columns:
        prune = _partition_prune_ids(int_ranges + bnd_ranges)
        if prune is not None:
            cond = F.col(LEAF_PARTITION_COL).isin(prune) & cond
    return df.filter(cond)


def s2_bbox_query(
    df: DataFrame,
    minx_m: int,
    miny_m: int,
    maxx_m: int,
    maxy_m: int,
    max_cells: int = 48,
    fine_level: int = S2.MAX_LEVEL,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    leaf_col: str | None = None,
) -> DataFrame:
    """Rows inside the closed milli-degree box, answered through the
    budgeted mixed-level covering TRANSLATED TO LEAF-ID RANGES (the
    contiguity invariant): interior-range membership alone is sufficient
    (no refinement), boundary ranges AND the exact integer box
    predicate.  Exactly the reference's coarse-range + fine-filter
    decomposition (BasicQueryFilter over decomposed SFC ranges,
    core/index/.../sfc/tiered/TieredSFCIndexStrategy.java) collapsed
    into one scan predicate of ≤ max_cells two-compare arms.

    ``minx_m > maxx_m`` means ANTIMERIDIAN WRAP (LongitudeDefinition bin
    semantics, same contract as plans/planner.py): the region is the
    union of [minx, 180°] and [-180°, maxx] — covered as the
    elementwise-max of the two boxes' classifiers (cells never wrap, so
    union-interior ⇔ interior in one part) and refined with the wrapped
    predicate.

    ``leaf_col``: name of a STORED leaf-id column (written by
    ``s2_index`` at ingest).  With it the range arms are plain column
    compares — pushable to parquet row-group min/max on a leaf-sorted
    table, which is the actual 100 TB read path (asserted in
    test_s2.py).  Without it the leaf is computed on the fly and MUST be
    let-bound: inlined naively the encode tree is copied into every arm
    and Catalyst's fixed-point passes OOM (measured at 9 isin arms)."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    if minx_m > maxx_m:  # antimeridian wrap: two-box union
        c1 = S2.box_classifier(minx_m, miny_m, 180_000, maxy_m)
        c2 = S2.box_classifier(-180_000, miny_m, maxx_m, maxy_m)
        interior, boundary = S2.covering_region(
            lambda cids: np.maximum(c1(cids), c2(cids)),
            max_cells=max_cells,
            fine_level=fine_level,
        )
        lon_ok = (lon >= F.lit(minx_m)) | (lon <= F.lit(maxx_m))
    else:
        interior, boundary = S2.covering(
            minx_m, miny_m, maxx_m, maxy_m,
            max_cells=max_cells, fine_level=fine_level,
        )
        lon_ok = (lon >= F.lit(minx_m)) & (lon <= F.lit(maxx_m))
    int_ranges = S2.merged_leaf_ranges(interior)
    bnd_ranges = S2.merged_leaf_ranges(boundary)
    exact = lon_ok & (lat >= F.lit(miny_m)) & (lat <= F.lit(maxy_m))
    if leaf_col is not None:
        return _stored_filter(df, leaf_col, int_ranges, bnd_ranges, exact)
    return df.filter(
        X.let(
            X.s2_leaf_col(lon, lat),
            lambda leaf: _range_arms(leaf, int_ranges)
            | (_range_arms(leaf, bnd_ranges) & exact),
        )
    )


def s2_polygon_query(
    df: DataFrame,
    rings_milli: list[np.ndarray],
    max_cells: int = 64,
    fine_level: int = S2.MAX_LEVEL,
    lon_col: str = "lon_milli",
    lat_col: str = "lat_milli",
    leaf_col: str | None = None,
) -> DataFrame:
    """Rows inside the (Multi)Polygon (rings in MILLI-degree floats,
    even-odd semantics — holes ride on parity), answered the
    S2RegionCoverer way: budgeted driver-side covering of the polygon
    (geometry.classify_cells_vs_polygon as the region oracle), merged
    leaf-id ranges, interior ranges unrefined, boundary ranges AND the
    exact even-odd predicate.

    The refine is geometry.evenodd_sql via F.expr — a pure column CASE
    parity sum inside whole-stage codegen, and the SAME generator the
    DuckDB oracle uses, so both sides carry identical vertex literals
    (the repo's bit-identical-refine convention).  Parity with the
    reference's decomposeRange-over-geometry + DistributableFilter
    split (core/index/.../sfc/tiered/TieredSFCIndexStrategy.java,
    core/geotime/.../store/query/filter/SpatialQueryFilter.java)."""
    polys = [rings_milli]

    def classify(cids: np.ndarray) -> np.ndarray:
        lo_lon, lo_lat, hi_lon, hi_lat = S2.cell_box_milli(cids)
        return G.classify_cells_vs_polygon(lo_lon, lo_lat, hi_lon, hi_lat, polys)

    interior, boundary = S2.covering_region(
        classify, max_cells=max_cells, fine_level=fine_level
    )
    int_ranges = S2.merged_leaf_ranges(interior)
    bnd_ranges = S2.merged_leaf_ranges(boundary)
    exact = F.expr(G.evenodd_sql(rings_milli, lon=lon_col, lat=lat_col))
    if leaf_col is not None:
        return _stored_filter(df, leaf_col, int_ranges, bnd_ranges, exact)
    return df.filter(
        X.let(
            X.s2_leaf_col(F.col(lon_col), F.col(lat_col)),
            lambda leaf: _range_arms(leaf, int_ranges)
            | (_range_arms(leaf, bnd_ranges) & exact),
        )
    )
