"""Raster↔vector tiling: pyramid level selection, tile assignment, per-tile
crop/resample, and NoData mosaic merge.

Re-expresses the reference RasterDataAdapter mosaic semantics
(extensions/adapters/raster/.../adapter/RasterDataAdapter.java):

* level selection (:497-612) — pick the tier whose tile ground resolution is
  closest to the image's native resolution without going under; here the
  extent-based tier rule (functions/cells.tier_select_extent_milli), plus
  all coarser levels when ``build_pyramid``;
* tile assignment (:660-700, MosaicPerPyramidLevelBuilder.convert) — every
  SFC cell intersecting the footprint at the level becomes one output tile:
  ``explode(cover(footprint, level))`` — identical machinery to vector
  covers;
* tile render (:700-860) — world→tile-pixel affine, crop/resample (nearest),
  footprint-exterior pixels marked NoData;
* mosaic merge (merge/nodata/NoDataMergeStrategy.java:38-110) — overlapping
  same-key tiles: newest wins, NoData pixels filled from older tiles.
  Merge order is a stable sort on an explicit ingest sequence (ts, image_id)
  — never task order (SURVEY §7 hard part (d)).

Execution shape: assignment is JVM-side explode of an Arrow-batch cover UDF;
rendering/merging is ``groupBy(tile).applyInPandas`` — one Python invocation
per tile with all overlapping images, numpy-vectorized inside.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geowave_spark.functions import cells as C
from geowave_spark.sources import png as PNG

TILE_SIZE = 256


# ---------------------------------------------------------------------------
# Tile assignment
# ---------------------------------------------------------------------------


def assign_tiles(
    footprints: DataFrame,
    level: int | None = None,
    build_pyramid: bool = False,
    min_pyramid_level: int = 3,
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
    max_cells_per_dim: int = 4,
    max_explode_cells: int = 65_536,
) -> DataFrame:
    """footprint rows → (row × tile_cell) assignment — pure JVM codegen.

    ``level=None`` selects each row's native level from its extent (the
    RasterDataAdapter rule, re-expressed as functions/cols.py column math);
    ``build_pyramid`` additionally assigns every coarser level down to
    ``min_pyramid_level`` (RasterDataAdapter.java:497 'increment and
    continue' pyramid walk); a footprint whose native level is already
    coarser than ``min_pyramid_level`` emits just its native level (the
    sequence is guarded — Spark ``sequence`` DESCENDS when stop < start).
    The cover is two ``sequence()`` explodes over the spanned grid range —
    the DataFrame analogue of getInsertionIds' multi-row-ID emission
    (TieredSFCIndexStrategy.java:175-231) with zero Python in the path.

    The cover is NEVER silently truncated.  In native-level mode the tier
    rule guarantees ≤2 cells/dim; a span above ``max_cells_per_dim`` means
    the invariant was violated and the job fails with ``raise_error``.  At
    an explicit ``level`` the FULL cover is emitted (a large image at a
    fine level legitimately spans many tiles — the reference's mosaic walk,
    MosaicPerPyramidLevelBuilder.convert); a per-row cover above
    ``max_explode_cells`` fails fast instead of exploding unboundedly.
    Adds columns: ``level``, ``tile_cell``, ``tile_ix``, ``tile_iy``.
    """
    from geowave_spark.functions import cols as X
    from geowave_spark.session import spread

    # fan-out-dense (three Generates per row): a few-split source would
    # serialize the whole cover on one core — conditional repartition
    # first (no-op at scale / on well-partitioned generators)
    footprints = spread(footprints)

    mnx, mny, mxx, mxy = env_cols
    if level is None:
        # 1-element explode = Generate barrier: binds the large tier-rule
        # expression as a runtime attribute so the guard filter below can't
        # re-inline it via predicate pushdown (see index_envelopes_milli)
        df = footprints.withColumn(
            "level",
            F.explode(F.array(
                X.tier_extent_milli_col(F.col(mxx) - F.col(mnx), F.col(mxy) - F.col(mny))
            )),
        )
    else:
        df = footprints.withColumn("level", F.lit(level).cast("long"))

    if build_pyramid:
        df = df.withColumn(
            "level",
            F.explode(
                F.sequence(
                    F.least(F.lit(min_pyramid_level).cast("long"), F.col("level")),
                    F.col("level"),
                )
            ),
        )

    lvl = F.col("level")
    ix0 = X.grid_milli_col(F.col(mnx), 180_000, C.LON_SPAN_MILLI, lvl)
    ix1 = X.grid_milli_col(F.col(mxx), 180_000, C.LON_SPAN_MILLI, lvl)
    iy0 = X.grid_milli_col(F.col(mny), 90_000, C.LAT_SPAN_MILLI, lvl)
    iy1 = X.grid_milli_col(F.col(mxy), 90_000, C.LAT_SPAN_MILLI, lvl)
    df = df.withColumn("_ix0", ix0).withColumn("_iy0", iy0)
    nx = ix1 - F.col("_ix0") + 1
    ny = iy1 - F.col("_iy0") + 1
    if level is None:
        # tier-rule invariant: ≤2 cells/dim; above the cap = broken
        # invariant; inverted footprints would make sequence() DESCEND
        bad = (
            (nx > max_cells_per_dim) | (ny > max_cells_per_dim)
            | (nx < 1) | (ny < 1)
        )
        msg = (
            "assign_tiles: footprint cover exceeds max_cells_per_dim at its "
            "native tier or is inverted — tier-selection invariant violated"
        )
    else:
        bad = (nx * ny > max_explode_cells) | (nx < 1) | (ny < 1)
        msg = (
            f"assign_tiles: footprint covers more than {max_explode_cells} "
            f"tiles at level {level}; use a coarser level or raise "
            "max_explode_cells"
        )
    # The guard runs ONCE per pre-explode row as a standalone filter (cannot
    # be pruned, cannot move past the generate) so the sequence bounds stay
    # clean whole-stage codegen — folding raise_error into the explode bound
    # dropped the whole tree to interpreted eval (spatial_join A/B: ~11s).
    from geowave_spark.operators.index import _invariant_guard

    df = (
        df.withColumn("_ix1", ix1)
        .withColumn("_iy1", iy1)
        .filter(_invariant_guard(bad, msg))
        .withColumn("tile_ix", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))))
        .withColumn("tile_iy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
        .drop("_ix0", "_ix1", "_iy0", "_iy1")
    )
    return df.withColumn(
        "tile_cell", X.pack_col(F.col("tile_ix"), F.col("tile_iy"), lvl)
    )


# ---------------------------------------------------------------------------
# Tile rendering + mosaic merge
# ---------------------------------------------------------------------------


def _render_one(
    pixels: np.ndarray,
    fp: tuple[float, float, float, float],
    tile: tuple[float, float, float, float],
    tile_size: int,
    method: str = "nearest",
) -> tuple[np.ndarray, np.ndarray]:
    """Resample one image's footprint onto the tile grid.

    ``pixels``: (h, w) or (h, w, bands), any dtype.  ``method``: 'nearest'
    or 'bilinear' (edge-clamped, pixel-center aligned) — the reference
    defaults to bilinear and drops to nearest for float data
    (RasterDataAdapter.java:700-860 interpolation choice).  Returns
    (canvas same dtype/bands, valid mask bool).  Row 0 of the image is the
    footprint's NORTH edge (image convention)."""
    h, w = pixels.shape[:2]
    fminx, fminy, fmaxx, fmaxy = fp
    tminx, tminy, tmaxx, tmaxy = tile
    # tile pixel centers in world coords
    xs = tminx + (np.arange(tile_size) + 0.5) * (tmaxx - tminx) / tile_size
    ys = tmaxy - (np.arange(tile_size) + 0.5) * (tmaxy - tminy) / tile_size
    # inverse affine into continuous source pixel coords
    sx = (xs - fminx) / (fmaxx - fminx) * w
    sy = (fmaxy - ys) / (fmaxy - fminy) * h
    jx = np.floor(sx).astype(np.int64)
    jy = np.floor(sy).astype(np.int64)
    okx = (jx >= 0) & (jx < w)
    oky = (jy >= 0) & (jy < h)
    mask = oky[:, None] & okx[None, :]
    shape = (tile_size, tile_size) + pixels.shape[2:]
    if method == "nearest":
        jyc = np.clip(jy, 0, h - 1)
        jxc = np.clip(jx, 0, w - 1)
        canvas = pixels[jyc][:, jxc].copy()
    elif method == "bilinear":
        # sample at pixel CENTERS (j + 0.5); edge-clamp the 2x2 support
        px = sx - 0.5
        py = sy - 0.5
        x0 = np.clip(np.floor(px).astype(np.int64), 0, w - 1)
        y0 = np.clip(np.floor(py).astype(np.int64), 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        fx = np.clip(px - np.floor(px), 0.0, 1.0)
        fy = np.clip(py - np.floor(py), 0.0, 1.0)
        # kill the fraction where the support was clamped (pure edge clamp)
        fx = np.where(np.floor(px) < 0, 0.0, np.where(np.floor(px) >= w - 1, 0.0, fx))
        fy = np.where(np.floor(py) < 0, 0.0, np.where(np.floor(py) >= h - 1, 0.0, fy))
        p = pixels.astype(np.float64)
        wx = fx[None, :]
        wy = fy[:, None]
        if pixels.ndim == 3:
            wx = wx[..., None]
            wy = wy[..., None]
        top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
        bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
        blend = top * (1 - wy) + bot * wy
        if np.issubdtype(pixels.dtype, np.integer):
            canvas = np.floor(blend + 0.5).astype(pixels.dtype)
        else:
            canvas = blend.astype(pixels.dtype)
    else:
        raise ValueError(method)
    canvas = np.ascontiguousarray(canvas)
    canvas[~mask] = 0
    assert canvas.shape == shape
    return canvas, mask


def render_tiles(
    assigned: DataFrame,
    tile_size: int = TILE_SIZE,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    seq_cols: tuple[str, ...] = ("ts", "image_id"),
    resample: str = "auto",
) -> DataFrame:
    """groupBy(tile_cell) → one mosaic tile per cell.

    Merge semantics = NoDataMergeStrategy: iterate contributions newest →
    oldest (stable explicit order on ``seq_cols``), fill only still-empty
    (NoData) pixels.  ``n_src`` reports ALL contributions assigned to the
    tile (the SQL-checkable assignment count); the merge loop still stops
    early once every pixel is filled — a pure occlusion optimization with
    no observable effect on any output column.  ``resample='auto'`` follows the reference's rule
    (RasterDataAdapter.java:700-860): BILINEAR for integer rasters,
    NEAREST for float data; pass 'nearest'/'bilinear' to force.  Bands and
    dtype come from the contributions (grayscale, RGB, or float): uint8
    tiles serialize as PNG, float tiles as the RAWF container.  Output:
    tile_cell, level, tile_ix, tile_iy, n_src, valid_frac, tile_png.
    """
    out_schema = T.StructType(
        [
            T.StructField("tile_cell", T.LongType()),
            T.StructField("level", T.LongType()),
            T.StructField("tile_ix", T.LongType()),
            T.StructField("tile_iy", T.LongType()),
            T.StructField("n_src", T.IntegerType()),
            T.StructField("valid_frac", T.DoubleType()),
            T.StructField("tile_png", T.BinaryType()),
        ]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf.tile_cell.iloc[0])
        res, ix, iy = C.unpack(np.asarray([cell]))
        tminx, tminy, tmaxx, tmaxy = (float(v[0]) for v in C.cell_bounds(np.asarray([cell])))
        # stable newest-first ingest order — never task order
        pdf = pdf.sort_values(list(seq_cols), ascending=False, kind="mergesort")
        canvas = None
        filled = np.zeros((tile_size, tile_size), dtype=bool)
        n = len(pdf)
        for r in pdf.itertuples():
            pix = PNG.decode_image(getattr(r, bytes_col), getattr(r, fmt_col))
            if resample == "auto":
                method = (
                    "nearest" if np.issubdtype(pix.dtype, np.floating) else "bilinear"
                )
            else:
                method = resample
            cv, mask = _render_one(
                pix,
                (r.fp_minx, r.fp_miny, r.fp_maxx, r.fp_maxy),
                (tminx, tminy, tmaxx, tmaxy),
                tile_size,
                method=method,
            )
            if canvas is None:
                canvas = np.zeros_like(cv)
            elif canvas.shape != cv.shape or canvas.dtype != cv.dtype:
                raise ValueError(
                    "mixed band counts/dtypes within one mosaic tile "
                    f"({canvas.shape}/{canvas.dtype} vs {cv.shape}/{cv.dtype})"
                )
            take = mask & ~filled
            canvas[take] = cv[take]
            filled |= mask
            if filled.all():
                break  # remaining older tiles fully occluded
        if canvas is None:
            canvas = np.zeros((tile_size, tile_size), dtype=np.uint8)
        blob = (
            PNG.raw_encode(canvas)
            if np.issubdtype(canvas.dtype, np.floating)
            else PNG.png_encode(canvas)
        )
        return pd.DataFrame(
            {
                "tile_cell": [cell],
                "level": [int(res[0])],
                "tile_ix": [int(ix[0])],
                "tile_iy": [int(iy[0])],
                "n_src": [n],
                "valid_frac": [float(filled.mean())],
                "tile_png": [blob],
            }
        )

    return assigned.groupBy("tile_cell").applyInPandas(merge_group, out_schema)


# ---------------------------------------------------------------------------
# Tile retile / pyramid coarsening + per-coverage overview stats
# ---------------------------------------------------------------------------


def retile_coarser(tiles: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """Rendered tiles at level L → stitched tiles at level L-1.

    The Spark form of the reference's raster resize job (RasterTileResize
    JobRunner/Mapper/Reducer, extensions/adapters/raster/.../resize/): group
    the ≤4 child tiles under each parent cell, paste each child into its
    quadrant (child parity gives the quadrant), 2× box-downsample back to
    ``tile_size``.  One groupBy on the parent key — the combiner/reducer
    pair collapses into a single applyInPandas.

    Input: (tile_cell, level, tile_ix, tile_iy, tile_png); output the same
    schema one level coarser plus n_children.
    """
    out_schema = T.StructType(
        [
            T.StructField("tile_cell", T.LongType()),
            T.StructField("level", T.LongType()),
            T.StructField("tile_ix", T.LongType()),
            T.StructField("tile_iy", T.LongType()),
            T.StructField("n_children", T.IntegerType()),
            T.StructField("tile_png", T.BinaryType()),
        ]
    )
    half = tile_size // 2

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lvl = int(pdf.level.iloc[0]) - 1
        pix = int(pdf.tile_ix.iloc[0]) >> 1
        piy = int(pdf.tile_iy.iloc[0]) >> 1
        canvas = None
        n = 0
        for r in pdf.itertuples():
            child = PNG.decode_image(r.tile_png)
            if canvas is None:
                canvas = np.zeros((tile_size, tile_size) + child.shape[2:], child.dtype)
            # 2x2 box mean then paste into the child's quadrant; row 0 is
            # NORTH, so a child with odd iy (northern half) goes to the top
            # (bands, if any, ride along on the trailing axis)
            ds = (
                child.reshape((tile_size // 2, 2, tile_size // 2, 2) + child.shape[2:])
                .mean(axis=(1, 3))
                .astype(child.dtype)
            )
            qx = (int(r.tile_ix) & 1) * half
            qy = (1 - (int(r.tile_iy) & 1)) * half
            canvas[qy : qy + half, qx : qx + half] = ds
            n += 1
        if canvas is None:
            canvas = np.zeros((tile_size, tile_size), dtype=np.uint8)
        cell = int(
            C.pack(
                np.asarray([lvl], dtype=np.int64),
                np.asarray([pix], dtype=np.int64),
                np.asarray([piy], dtype=np.int64),
            )[0]
        )
        blob = (
            PNG.raw_encode(canvas)
            if np.issubdtype(canvas.dtype, np.floating)
            else PNG.png_encode(canvas)
        )
        return pd.DataFrame(
            {
                "tile_cell": [cell],
                "level": [lvl],
                "tile_ix": [pix],
                "tile_iy": [piy],
                "n_children": [n],
                "tile_png": [blob],
            }
        )

    # parent at level-1: a pure shift of the same interleaved key
    parent = tiles.withColumn(
        "_parent",
        F.call_function(
            "shiftrightunsigned",
            F.col("tile_cell").bitwiseAND(F.lit(int(C.COORD_MASK))),
            F.lit(2),
        )
        + F.call_function("shiftleft", (F.col("level") - 1).cast("long"), F.lit(C.RES_SHIFT)),
    )
    return parent.groupBy("_parent").applyInPandas(merge, out_schema)


def overview_stats(
    tiles: DataFrame, contributions_col: str = "n_src"
) -> DataFrame:
    """Per-level coverage statistics (reference OverviewStatistics /
    RasterBoundingBoxStatistics / HistogramStatistics: one groupBy).

    ``contributions_col`` names the per-tile contribution count (``n_src``
    for rendered base tiles, ``n_children`` for stitched pyramid tiles);
    ``avg_valid_frac`` is emitted only when the input carries
    ``valid_frac`` (pyramid tiles don't)."""
    aggs = [
        F.count("*").alias("n_tiles"),
        F.min("tile_ix").alias("min_ix"),
        F.max("tile_ix").alias("max_ix"),
        F.min("tile_iy").alias("min_iy"),
        F.max("tile_iy").alias("max_iy"),
    ]
    if "valid_frac" in tiles.columns:
        aggs.append(F.avg("valid_frac").alias("avg_valid_frac"))
    aggs.append(F.sum(contributions_col).alias("total_contributions"))
    return tiles.groupBy("level").agg(*aggs)


def render_point_tiles(
    points: DataFrame,
    level: int,
    tile_size: int = TILE_SIZE,
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Distributed render: point features → per-tile grayscale PNG density
    renders (the reference's server-side distributed render process,
    analytics 'RenderedStyle' / GeoServer WPS path, re-expressed as two
    aggregations).

    Pixel grid = the square Morton grid at res ``level + log2(tile_size)``
    (same tile scheme as assign_tiles, so rendered tiles align with mosaic
    tiles).  Stage 1: groupBy (tile, pixel) count — map-side partial agg
    collapses the point mass before any shuffle.  Stage 2: one
    applyInPandas per tile scatters counts onto the canvas; intensity =
    255·count/tile_max (deterministic).  Row 0 is NORTH.  Output:
    (level, tile_ix, tile_iy, n_points, max_count, tile_png).
    """
    import math

    from geowave_spark.functions import cols as X
    from geowave_spark.session import spread

    shift = int(math.log2(tile_size))
    if 1 << shift != tile_size:
        raise ValueError("tile_size must be a power of two")
    res = level + shift
    ix = X.grid_milli_col(F.col(lon_milli), 180_000, 360_000, F.lit(res))
    iy = X.grid_milli_col(F.col(lat_milli), 90_000, 180_000, F.lit(res))
    counts = (
        spread(points.select(ix.alias("_ix"), iy.alias("_iy")))
        .groupBy(
            F.shiftright(F.col("_ix"), shift).alias("tile_ix"),
            F.shiftright(F.col("_iy"), shift).alias("tile_iy"),
            F.col("_ix").bitwiseAND(F.lit(tile_size - 1)).alias("_px"),
            F.col("_iy").bitwiseAND(F.lit(tile_size - 1)).alias("_py"),
        )
        .agg(F.count("*").alias("_n"))
    )
    out_schema = T.StructType(
        [
            T.StructField("level", T.LongType()),
            T.StructField("tile_ix", T.LongType()),
            T.StructField("tile_iy", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("max_count", T.LongType()),
            T.StructField("tile_png", T.BinaryType()),
        ]
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((tile_size, tile_size), dtype=np.float64)
        px = pdf._px.to_numpy(np.int64)
        py = tile_size - 1 - pdf._py.to_numpy(np.int64)  # row 0 = NORTH
        n = pdf._n.to_numpy(np.int64)
        canvas[py, px] = n
        mx = int(n.max())
        img = np.floor(canvas * 255.0 / mx + 0.5).astype(np.uint8)
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [int(pdf.tile_ix.iloc[0])],
                "tile_iy": [int(pdf.tile_iy.iloc[0])],
                "n_points": [int(n.sum())],
                "max_count": [mx],
                "tile_png": [PNG.png_encode(img)],
            }
        )

    return counts.groupBy("tile_ix", "tile_iy").applyInPandas(render, out_schema)


# ---------------------------------------------------------------------------
# Styled distributed render (SLD-rule analogue)
# ---------------------------------------------------------------------------

STYLE_MAX_HALFWIDTH = 3  # marker footprint bound: (2*3+1)^2 = 49 offsets


def _style_case(rules, values, default):
    """First-match-wins CASE over the rule predicates — the SLD rule-list
    evaluation order, as one Catalyst expression."""
    expr = F.lit(default)
    for pred, val in reversed(list(zip(rules, values))):
        expr = F.when(pred, F.lit(val)).otherwise(expr)
    return expr


_STYLED_SCHEMA = T.StructType(
    [
        T.StructField("level", T.LongType()),
        T.StructField("tile_ix", T.LongType()),
        T.StructField("tile_iy", T.LongType()),
        T.StructField("painted", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("chk", T.LongType()),
        T.StructField("tile_png", T.BinaryType()),
    ]
)


def _assemble_styled(level: int, tile_size: int):
    """Per-tile compositor: winner pixels → RGB canvas PNG + exact integer
    aggregates (painted px, per-band sums, xor checksum over the packed
    (pixel, rgb) value — summation-order-free, so engine and SQL agree)."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        px = pdf["_px"].to_numpy(np.int64)
        py = pdf["_py"].to_numpy(np.int64)
        rgb = pdf["rgb"].to_numpy(np.int64)
        canvas = np.zeros((tile_size, tile_size, 3), dtype=np.uint8)
        rows = tile_size - 1 - py  # row 0 = NORTH (png orientation only)
        canvas[rows, px, 0] = (rgb >> 16) & 0xFF
        canvas[rows, px, 1] = (rgb >> 8) & 0xFF
        canvas[rows, px, 2] = rgb & 0xFF
        packed = ((py * tile_size + px) << 24) | rgb
        chk = np.bitwise_xor.reduce(packed) if len(packed) else 0
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [int(pdf["tile_ix"].iloc[0])],
                "tile_iy": [int(pdf["tile_iy"].iloc[0])],
                "painted": [len(pdf)],
                "sum_r": [int(((rgb >> 16) & 0xFF).sum())],
                "sum_g": [int(((rgb >> 8) & 0xFF).sum())],
                "sum_b": [int((rgb & 0xFF).sum())],
                "chk": [int(chk)],
                "tile_png": [PNG.png_encode(canvas)],
            }
        )

    return assemble


def render_styled_tiles(
    points: DataFrame,
    level: int,
    rules,
    default_rgb: int = 0x787878,
    default_halfwidth: int = 0,
    tile_size: int = TILE_SIZE,
    order_col: str = "event_id",
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Styled distributed render of point features — the reference's
    server-side render path (extensions/adapters/vector/.../plugin/
    DistributedRenderProcess.java:32-60 + render/DistributedRenderOptions:
    each server renders styled partials, the client composites), with the
    SLD rule list re-expressed as Catalyst CASE columns and the composite
    made DETERMINISTIC: painter's order is ``order_col`` (max wins per
    pixel), not task arrival order.

    ``rules`` = [(predicate Column, rgb int 0xRRGGBB, halfwidth int), ...]
    evaluated first-match-wins (the SLD rule semantics); unmatched rows get
    the defaults.  Markers are squares of side 2*halfwidth+1 (≤
    STYLE_MAX_HALFWIDTH), exploded from one LITERAL offset array (the KDE
    49-tap shape — never a computed-array HOF) and filtered per row, so a
    marker crossing a tile border paints the neighbor tile naturally.

    Plan: style CASE → literal explode (≤49×) → per-PIXEL ``max_by``
    groupBy (map-side combinable painter argmax — the winner compresses
    before the shuffle) → one applyInPandas per tile for the PNG + exact
    integer aggregates.  Output: (level, tile_ix, tile_iy, painted,
    sum_r, sum_g, sum_b, chk, tile_png); everything but the PNG replays
    exactly in SQL."""
    import math

    from geowave_spark.functions import cols as X
    from geowave_spark.session import spread

    shift = int(math.log2(tile_size))
    if 1 << shift != tile_size:
        raise ValueError("tile_size must be a power of two")
    for _, rgb, hw in rules:
        if not (0 <= hw <= STYLE_MAX_HALFWIDTH):
            raise ValueError(f"halfwidth {hw} outside [0, {STYLE_MAX_HALFWIDTH}]")
        if not (0 <= rgb <= 0xFFFFFF):
            raise ValueError(f"rgb {rgb:#x} outside 24-bit range")
    res = level + shift
    n = 1 << res
    preds = [p for p, _, _ in rules]
    rgb_col = _style_case(preds, [r for _, r, _ in rules], default_rgb)
    hw_col = _style_case(preds, [h for _, _, h in rules], default_halfwidth)
    # size the literal marker footprint by the rules actually in force —
    # thin styles (the common case) explode (2r_eff+1)², not the 49-tap
    # worst case (measured: the explode row count IS the hot-path cost)
    r = max([hw for _, _, hw in rules] + [default_halfwidth])
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
        ]
    )
    base = spread(
        points.select(
            F.col(order_col).cast("long").alias("_ord"),
            rgb_col.cast("long").alias("rgb"),
            hw_col.cast("long").alias("_hw"),
            X.grid_milli_col(F.col(lon_milli), 180_000, 360_000, F.lit(res)).alias("_ix"),
            X.grid_milli_col(F.col(lat_milli), 90_000, 180_000, F.lit(res)).alias("_iy"),
        )
    )
    px = F.col("_ix") + F.col("o.dx")
    py = F.col("_iy") + F.col("o.dy")
    pixels = (
        base.select("*", F.explode(offsets).alias("o"))
        .filter(
            (F.abs(F.col("o.dx")) <= F.col("_hw"))
            & (F.abs(F.col("o.dy")) <= F.col("_hw"))
        )
        .select(
            "_ord",
            "rgb",
            px.alias("_gx"),
            py.alias("_gy"),
        )
        .filter(
            (F.col("_gx") >= 0) & (F.col("_gx") < n)
            & (F.col("_gy") >= 0) & (F.col("_gy") < n)
        )
    )
    winners = (
        pixels.groupBy(
            F.shiftright(F.col("_gx"), shift).alias("tile_ix"),
            F.shiftright(F.col("_gy"), shift).alias("tile_iy"),
            F.col("_gx").bitwiseAND(F.lit(tile_size - 1)).alias("_px"),
            F.col("_gy").bitwiseAND(F.lit(tile_size - 1)).alias("_py"),
        )
        .agg(F.max_by("rgb", F.col("_ord")).alias("rgb"))
    )
    return winners.groupBy("tile_ix", "tile_iy").applyInPandas(
        _assemble_styled(level, tile_size), _STYLED_SCHEMA
    )


MAX_TILES_PER_ENVELOPE = 64  # per-axis explode guard for envelope render


def render_envelope_tiles(
    envelopes: DataFrame,
    level: int,
    rules,
    default_rgb: int = 0x787878,
    mode: str = "fill",
    tile_size: int = TILE_SIZE,
    order_col: str = "event_id",
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
) -> DataFrame:
    """Styled render of envelope (polygon-box) features: fill or 1-px
    stroke, deterministic painter's order (max ``order_col`` per pixel) —
    the polygon arm of the DistributedRenderProcess analogue.

    Plan: style CASE → envelope grid-rect → ≤MAX_TILES_PER_ENVELOPE²
    tile explode (never-truncate guard raises past the bound) → one
    applyInPandas per TILE rasterizes its clipped rects in painter order
    (numpy, bounded by tile_size²) and emits the same schema as
    :func:`render_styled_tiles`.  The per-pixel winner is
    order-independent (max order paints last), so the whole raster
    replays exactly in SQL via per-pixel arg_max."""
    import math

    from geowave_spark.functions import cols as X
    from geowave_spark.operators.index import _invariant_guard
    from geowave_spark.session import spread

    shift = int(math.log2(tile_size))
    if 1 << shift != tile_size:
        raise ValueError("tile_size must be a power of two")
    if mode not in ("fill", "stroke"):
        raise ValueError(f"mode {mode!r} (fill | stroke)")
    res = level + shift
    minx, miny, maxx, maxy = env_cols
    preds = [p for p, _ in rules]
    rgb_col = _style_case(preds, [r for _, r in rules], default_rgb)
    g = lambda c, off, span: X.grid_milli_col(F.col(c), off, span, F.lit(res))  # noqa: E731
    base = spread(
        envelopes.select(
            F.col(order_col).cast("long").alias("_ord"),
            rgb_col.cast("long").alias("rgb"),
            g(minx, 180_000, 360_000).alias("gx0"),
            g(maxx, 180_000, 360_000).alias("gx1"),
            g(miny, 90_000, 180_000).alias("gy0"),
            g(maxy, 90_000, 180_000).alias("gy1"),
        )
    )
    tx0, tx1 = F.shiftright(F.col("gx0"), shift), F.shiftright(F.col("gx1"), shift)
    ty0, ty1 = F.shiftright(F.col("gy0"), shift), F.shiftright(F.col("gy1"), shift)
    guarded = base.filter(
        _invariant_guard(
            ((tx1 - tx0) >= MAX_TILES_PER_ENVELOPE)
            | ((ty1 - ty0) >= MAX_TILES_PER_ENVELOPE),
            f"envelope spans more than {MAX_TILES_PER_ENVELOPE} tiles per "
            "axis at this level — render at a coarser level",
        )
    )
    per_tile = guarded.select(
        "_ord",
        "rgb",
        "gx0", "gx1", "gy0", "gy1",
        F.explode(F.sequence(tx0, tx1)).alias("tile_ix"),
        ty0.alias("_ty0"),
        ty1.alias("_ty1"),
    ).select(
        "*", F.explode(F.sequence(F.col("_ty0"), F.col("_ty1"))).alias("tile_iy")
    ).drop("_ty0", "_ty1")

    fill = mode == "fill"

    def rasterize(pdf: pd.DataFrame) -> pd.DataFrame:
        tix = int(pdf["tile_ix"].iloc[0])
        tiy = int(pdf["tile_iy"].iloc[0])
        ox, oy = tix << shift, tiy << shift
        order = np.argsort(pdf["_ord"].to_numpy(np.int64), kind="stable")
        rgb_img = np.zeros((tile_size, tile_size), dtype=np.int64)
        hit = np.zeros((tile_size, tile_size), dtype=bool)
        gx0 = pdf["gx0"].to_numpy(np.int64)
        gx1 = pdf["gx1"].to_numpy(np.int64)
        gy0 = pdf["gy0"].to_numpy(np.int64)
        gy1 = pdf["gy1"].to_numpy(np.int64)
        rgbv = pdf["rgb"].to_numpy(np.int64)
        for i in order:  # ascending painter order: later (higher) overwrites
            x0 = max(int(gx0[i]) - ox, 0)
            x1 = min(int(gx1[i]) - ox, tile_size - 1)
            y0 = max(int(gy0[i]) - oy, 0)
            y1 = min(int(gy1[i]) - oy, tile_size - 1)
            if x0 > x1 or y0 > y1:
                continue
            if fill:
                rgb_img[y0 : y1 + 1, x0 : x1 + 1] = rgbv[i]
                hit[y0 : y1 + 1, x0 : x1 + 1] = True
            else:  # stroke: the rect borders that fall inside this tile
                for yy in (int(gy0[i]) - oy, int(gy1[i]) - oy):
                    if 0 <= yy < tile_size:
                        rgb_img[yy, x0 : x1 + 1] = rgbv[i]
                        hit[yy, x0 : x1 + 1] = True
                for xx in (int(gx0[i]) - ox, int(gx1[i]) - ox):
                    if 0 <= xx < tile_size:
                        rgb_img[y0 : y1 + 1, xx] = rgbv[i]
                        hit[y0 : y1 + 1, xx] = True
        py, px = np.nonzero(hit)
        rgb = rgb_img[py, px]
        canvas = np.zeros((tile_size, tile_size, 3), dtype=np.uint8)
        rows = tile_size - 1 - py
        canvas[rows, px, 0] = (rgb >> 16) & 0xFF
        canvas[rows, px, 1] = (rgb >> 8) & 0xFF
        canvas[rows, px, 2] = rgb & 0xFF
        packed = ((py * tile_size + px) << 24) | rgb
        chk = np.bitwise_xor.reduce(packed) if len(packed) else 0
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [tix],
                "tile_iy": [tiy],
                "painted": [int(hit.sum())],
                "sum_r": [int(((rgb >> 16) & 0xFF).sum())],
                "sum_g": [int(((rgb >> 8) & 0xFF).sum())],
                "sum_b": [int((rgb & 0xFF).sum())],
                "chk": [int(chk)],
                "tile_png": [PNG.png_encode(canvas)],
            }
        )

    return per_tile.groupBy("tile_ix", "tile_iy").applyInPandas(
        rasterize, _STYLED_SCHEMA
    )


MAX_LINE_SPAN_PX = 256  # per-segment pixel-column explode bound


def render_line_tiles(
    segs: DataFrame,
    level: int,
    rules,
    default_rgb: int = 0x787878,
    default_halfwidth: int = 0,
    tile_size: int = TILE_SIZE,
    order_col: str = "seg_ord",
) -> DataFrame:
    """Styled distributed render of POLYLINE features — the line arm of the
    DistributedRenderProcess analogue (the reference renders arbitrary
    geometry server-side, DistributedRenderProcess.java:32-60).

    Rasterization is the exact integer SUPERCOVER: endpoints snap to the
    pixel grid at ``res = level + log2(tile_size)``, coordinates double so
    each pixel owns the closed box [2p-1, 2p+1]², and per pixel COLUMN the
    crossed row interval comes from the segment's rational y-range over
    the column's x-window, rounded with division-free integer floor/ceil
    (numerators stay non-negative, so Spark and DuckDB integer division
    agree) — every pixel whose box the doubled segment touches, no misses,
    no bbox waste, all Catalyst.  Stroke width is Chebyshev dilation by
    the rule's halfwidth via the same LITERAL offset explode as
    render_styled_tiles.  Painter compositing, aggregates, and the PNG
    assembly are shared with the point arm (max ``order_col`` wins per
    pixel; everything but the PNG replays exactly in SQL).

    ``segs``: line-segment grain (operators/lines.py) — x0/y0/x1/y1
    milli-int columns plus ``order_col``.
    """
    import math

    from geowave_spark.functions import cols as X
    from geowave_spark.operators.index import _invariant_guard
    from geowave_spark.session import spread

    shift = int(math.log2(tile_size))
    if 1 << shift != tile_size:
        raise ValueError("tile_size must be a power of two")
    for _, rgb, hw in rules:
        if not (0 <= hw <= STYLE_MAX_HALFWIDTH):
            raise ValueError(f"halfwidth {hw} outside [0, {STYLE_MAX_HALFWIDTH}]")
        if not (0 <= rgb <= 0xFFFFFF):
            raise ValueError(f"rgb {rgb:#x} outside 24-bit range")
    res = level + shift
    n = 1 << res
    preds = [p for p, _, _ in rules]
    rgb_col = _style_case(preds, [r for _, r, _ in rules], default_rgb)
    hw_col = _style_case(preds, [h for _, _, h in rules], default_halfwidth)
    g = lambda c, off, span: X.grid_milli_col(F.col(c), off, span, F.lit(res))  # noqa: E731
    base = spread(
        segs.select(
            F.col(order_col).cast("long").alias("_ord"),
            rgb_col.cast("long").alias("rgb"),
            hw_col.cast("long").alias("_hw"),
            g("x0", 180_000, 360_000).alias("gx0"),
            g("y0", 90_000, 180_000).alias("gy0"),
            g("x1", 180_000, 360_000).alias("gx1"),
            g("y1", 90_000, 180_000).alias("gy1"),
        )
    )
    base = base.filter(
        _invariant_guard(
            (F.greatest("gx0", "gx1") - F.least("gx0", "gx1")
             > MAX_LINE_SPAN_PX)
            | (F.greatest("gy0", "gy1") - F.least("gy0", "gy1")
               > MAX_LINE_SPAN_PX),
            f"segment spans more than {MAX_LINE_SPAN_PX} pixels at this "
            "render level — render coarser or split segments upstream",
        )
    )
    # x-sort the endpoints as ONE struct bound through a 1-element explode
    # (a Generate barrier: the swap CASE evaluates once per row and the
    # downstream ladder cannot be re-inlined into four copies)
    swapped = F.when(
        F.col("gx0") <= F.col("gx1"),
        F.struct(F.col("gx0").alias("xa"), F.col("gy0").alias("ya"),
                 F.col("gx1").alias("xb"), F.col("gy1").alias("yb")),
    ).otherwise(
        F.struct(F.col("gx1").alias("xa"), F.col("gy1").alias("ya"),
                 F.col("gx0").alias("xb"), F.col("gy0").alias("yb")),
    )
    e = base.withColumn("e", F.explode(F.array(swapped)))
    cols = e.select(
        "_ord", "rgb", "_hw",
        F.col("e.xa").alias("xa"), F.col("e.ya").alias("ya"),
        F.col("e.xb").alias("xb"), F.col("e.yb").alias("yb"),
        F.explode(F.sequence(F.col("e.xa"), F.col("e.xb"))).alias("pxc"),
    )
    # doubled space: endpoints at even coords, pixel column window
    # [2px-1, 2px+1] clipped to the segment's x-extent
    X0 = F.col("xa") * 2
    Y0 = F.col("ya") * 2
    X1 = F.col("xb") * 2
    Y1 = F.col("yb") * 2
    a = F.greatest(X0, F.col("pxc") * 2 - 1)
    b = F.least(X1, F.col("pxc") * 2 + 1)
    dx = X1 - X0
    dy = Y1 - Y0
    na = Y0 * dx + dy * (a - X0)
    nb = Y0 * dx + dy * (b - X0)
    nmin = F.least(na, nb)
    nmax = F.greatest(na, nb)

    def _idiv(num, den):
        # num >= 0 and den > 0 by construction: (num - num % den) is an
        # exact multiple, the float divide is exact, floor == truncate
        return ((num - F.pmod(num, den)) / den).cast("long")

    q = dx * 2
    py_lo = F.when(dx == 0, F.least("ya", "yb")).otherwise(
        _idiv(nmin + dx + q - 1, q) - 1
    )
    py_hi = F.when(dx == 0, F.greatest("ya", "yb")).otherwise(
        _idiv(nmax + dx, q)
    )
    rows = cols.select(
        "_ord", "rgb", "_hw", F.col("pxc").alias("_sx"),
        F.explode(
            F.sequence(F.greatest(py_lo, F.lit(0)),
                       F.least(py_hi, F.lit(n - 1)))
        ).alias("_sy"),
    )
    # Chebyshev dilation via per-row sequence explodes: exactly
    # (2·hw+1)² rows per supercover pixel, ZERO waste for hw=0 strokes —
    # on a thin-stroke style the literal-array+filter form (the point
    # arm's 49-tap shape) amplified every supercover row 9-49× before
    # the filter, and the supercover row count is already the hot-path
    # volume here (markers explode per POINT; strokes per painted pixel)
    pixels = (
        rows.select(
            "*",
            F.explode(F.sequence(-F.col("_hw"), F.col("_hw"))).alias("_dx"),
        )
        .select(
            "*",
            F.explode(F.sequence(-F.col("_hw"), F.col("_hw"))).alias("_dy"),
        )
        .select(
            "_ord", "rgb",
            (F.col("_sx") + F.col("_dx")).alias("_gx"),
            (F.col("_sy") + F.col("_dy")).alias("_gy"),
        )
        .filter(
            (F.col("_gx") >= 0) & (F.col("_gx") < n)
            & (F.col("_gy") >= 0) & (F.col("_gy") < n)
        )
    )
    winners = (
        pixels.groupBy(
            F.shiftright(F.col("_gx"), shift).alias("tile_ix"),
            F.shiftright(F.col("_gy"), shift).alias("tile_iy"),
            F.col("_gx").bitwiseAND(F.lit(tile_size - 1)).alias("_px"),
            F.col("_gy").bitwiseAND(F.lit(tile_size - 1)).alias("_py"),
        )
        .agg(F.max_by("rgb", F.col("_ord")).alias("rgb"))
    )
    return winners.groupBy("tile_ix", "tile_iy").applyInPandas(
        _assemble_styled(level, tile_size), _STYLED_SCHEMA
    )
