"""Distributed vector-tile (MVT) export — the client-styled serving path.

The reference's serving story is GeoServer: server-side styled rendering
(DistributedRenderProcess.java:32-60) behind a WMS.  `tiling.render_*`
covers that raster arm; this module is the VECTOR arm — per-tile Mapbox
Vector Tile payloads (sources/mvt.py codec) that a browser styles
client-side, the protocol every modern tile consumer (MapLibre, deck.gl)
speaks.

Plan shape (both operators):

* quantization is pure Catalyst integer math — the same exact
  ``(coord + off) * 2^res // span`` grid as every other tile operator, at
  ``res = level + log2(extent)``, so MVT local coordinates are exact
  integers and the whole assignment replays in the DuckDB oracle;
* the shuffle is ONE groupBy on (tile_ix, tile_iy) — map-side combine
  does not apply (payload assembly), but the shuffled rows are slim
  (id + 2 ints + tag columns), never geometry blobs;
* protobuf assembly is per-tile python (`applyInPandas`) — bounded by
  features-per-tile, the same envelope every MVT server has; the
  data-volume-proportional work (quantize, clip, tile explode) stays
  JVM-side;
* each kernel DECODES its own payload and emits the aggregates
  (n_features / coordinate sums / id XOR) from the decoded bytes — the
  registry oracle then replays those aggregates in SQL, so a green row
  proves encode→decode→values end-to-end, the codec-oracle pattern of
  avro/tiff/osm.

Envelope features follow the reference's box-geometry model
(index_envelopes' minx/miny/maxx/maxy grain); rings are emitted CW in
screen coordinates per spec 4.3.3.2.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geowave_spark.sources import mvt as W

MAX_TILES_PER_ENVELOPE = 64  # explode bound, as tiling.render_envelope_tiles
MAX_FEATURES_PER_TILE = 262_144  # payload-assembly bound (never truncate)


def _tile_guard(n: int, tix: int, tiy: int, level: int) -> None:
    """A vector tile is a BOUNDED payload by design; a tile that exceeds
    the bound at 10^12-row scale means the export level is too coarse —
    raise loudly (the never-truncate rule) instead of assembling a
    multi-GB protobuf on one task."""
    if n > MAX_FEATURES_PER_TILE:
        raise ValueError(
            f"tile ({tix}, {tiy}) at level {level} holds {n} features "
            f"(> {MAX_FEATURES_PER_TILE}); export at a deeper level or "
            "pre-aggregate (render_point_tiles) instead"
        )

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("level", T.LongType()),
        T.StructField("tile_ix", T.LongType()),
        T.StructField("tile_iy", T.LongType()),
        T.StructField("n_features", T.LongType()),
        T.StructField("sum_x", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("xor_id", T.LongType()),
        T.StructField("mvt_len", T.LongType()),
        T.StructField("mvt", T.BinaryType()),
    ]
)


def _extent_shift(extent: int) -> int:
    shift = int(math.log2(extent))
    if 1 << shift != extent:
        raise ValueError("extent must be a power of two")
    return shift


def _decoded_aggs(buf: bytes, layer: str):
    """(n_features, sum_x, sum_y, xor_id) from the DECODED payload — the
    self-verifying numbers the oracle replays."""
    feats = W.decode_tile(buf)[layer]["features"]
    n = len(feats)
    sx = sy = xr = 0
    for f in feats:
        xr ^= int(f["id"])
        for part in f["parts"]:
            for x, y in part:
                sx += x
                sy += y
    return n, sx, sy, xr


def mvt_point_tiles(
    points: DataFrame,
    level: int,
    extent: int = W.DEFAULT_EXTENT,
    layer: str = "points",
    id_col: str = "event_id",
    tag_cols: tuple[str, ...] = (),
    lon_milli: str = "lon_milli",
    lat_milli: str = "lat_milli",
) -> DataFrame:
    """Point features → one MVT payload per XYZ tile at ``level``.

    Output: (level, tile_ix, tile_iy, n_features, sum_x, sum_y, xor_id,
    mvt_len, mvt) — the numeric columns are computed from the decoded
    payload (codec-oracle contract).  Tile rows are y-up world indices
    (same as assign_tiles); INSIDE a tile, MVT y points down (screen
    coords), hence the ``(extent-1) - local_y`` flip."""
    from geowave_spark.functions import cols as X
    from geowave_spark.session import spread

    shift = _extent_shift(extent)
    res = level + shift
    mask = extent - 1
    ix = X.grid_milli_col(F.col(lon_milli), 180_000, 360_000, F.lit(res))
    iy = X.grid_milli_col(F.col(lat_milli), 90_000, 180_000, F.lit(res))
    slim = spread(
        points.select(
            F.col(id_col).cast("long").alias("_id"),
            *[F.col(c).cast("string").alias(c) for c in tag_cols],
            ix.alias("_ix"),
            iy.alias("_iy"),
        )
    ).select(
        "_id",
        *tag_cols,
        F.shiftright(F.col("_ix"), shift).alias("tile_ix"),
        F.shiftright(F.col("_iy"), shift).alias("tile_iy"),
        F.col("_ix").bitwiseAND(F.lit(mask)).alias("_mx"),
        (F.lit(mask) - F.col("_iy").bitwiseAND(F.lit(mask))).alias("_my"),
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        _tile_guard(
            len(pdf), int(pdf["tile_ix"].iloc[0]),
            int(pdf["tile_iy"].iloc[0]), level,
        )
        pdf = pdf.sort_values("_id", kind="mergesort")
        ids = pdf["_id"].to_numpy(np.int64)
        mx = pdf["_mx"].to_numpy(np.int64)
        my = pdf["_my"].to_numpy(np.int64)
        # pre-extract tag columns ONCE (per-row .iloc access is the
        # pandas slow path — measured 2× the whole encode cost)
        tag_vals = {c: pdf[c].astype(str).tolist() for c in tag_cols}
        zx, zy = (mx << 1), (my << 1)  # zigzag of non-negative = 2v
        feats = []
        for i in range(len(ids)):
            feats.append(
                {
                    "id": int(ids[i]),
                    "type": W.POINT,
                    "geometry": [9, int(zx[i]), int(zy[i])],
                    "tags": {c: tag_vals[c][i] for c in tag_cols},
                }
            )
        buf = W.encode_tile({layer: feats}, extent=extent)
        n, sx, sy, xr = _decoded_aggs(buf, layer)
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [int(pdf["tile_ix"].iloc[0])],
                "tile_iy": [int(pdf["tile_iy"].iloc[0])],
                "n_features": [n],
                "sum_x": [sx],
                "sum_y": [sy],
                "xor_id": [xr],
                "mvt_len": [len(buf)],
                "mvt": [buf],
            }
        )

    return slim.groupBy("tile_ix", "tile_iy").applyInPandas(encode, _OUT_SCHEMA)


def mvt_envelope_tiles(
    envelopes: DataFrame,
    level: int,
    extent: int = W.DEFAULT_EXTENT,
    layer: str = "boxes",
    id_col: str = "event_id",
    env_cols: tuple[str, str, str, str] = ("minx_m", "miny_m", "maxx_m", "maxy_m"),
) -> DataFrame:
    """Envelope (box-polygon) features → per-tile MVT payloads: grid-rect
    quantize → bounded tile explode (never-truncate guard) → per-tile
    clip + CW-ring polygon encode.  Clipped local coords span
    ``[0, extent]`` inclusive (exclusive upper cell edge), so adjacent
    tiles share exact boundary geometry."""
    from geowave_spark.functions import cols as X
    from geowave_spark.operators.index import _invariant_guard
    from geowave_spark.session import spread

    shift = _extent_shift(extent)
    res = level + shift
    minx, miny, maxx, maxy = env_cols
    g = lambda c, off, span: X.grid_milli_col(F.col(c), off, span, F.lit(res))  # noqa: E731
    base = spread(
        envelopes.select(
            F.col(id_col).cast("long").alias("_id"),
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
            "axis at this level — export at a coarser level",
        )
    )
    per_tile = (
        guarded.select(
            "_id", "gx0", "gx1", "gy0", "gy1",
            F.explode(F.sequence(tx0, tx1)).alias("tile_ix"),
            ty0.alias("_ty0"), ty1.alias("_ty1"),
        )
        .select(
            "*",
            F.explode(F.sequence(F.col("_ty0"), F.col("_ty1"))).alias("tile_iy"),
        )
        .drop("_ty0", "_ty1")
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tix = int(pdf["tile_ix"].iloc[0])
        tiy = int(pdf["tile_iy"].iloc[0])
        _tile_guard(len(pdf), tix, tiy, level)
        ox, oy = tix << shift, tiy << shift
        pdf = pdf.sort_values("_id", kind="mergesort")
        ids = pdf["_id"].to_numpy(np.int64)
        gx0 = pdf["gx0"].to_numpy(np.int64)
        gx1 = pdf["gx1"].to_numpy(np.int64)
        gy0 = pdf["gy0"].to_numpy(np.int64)
        gy1 = pdf["gy1"].to_numpy(np.int64)
        feats = []
        for i in range(len(ids)):
            cx0 = max(int(gx0[i]) - ox, 0)
            cx1 = min(int(gx1[i]) - ox + 1, extent)
            cy0 = max(int(gy0[i]) - oy, 0)
            cy1 = min(int(gy1[i]) - oy + 1, extent)
            sy_top, sy_bot = extent - cy1, extent - cy0
            ring = [(cx0, sy_top), (cx1, sy_top), (cx1, sy_bot), (cx0, sy_bot)]
            feats.append(
                {
                    "id": int(ids[i]),
                    "type": W.POLYGON,
                    "geometry": W.geom_polygon([ring]),
                    "tags": {},
                }
            )
        buf = W.encode_tile({layer: feats}, extent=extent)
        n, sx, sy, xr = _decoded_aggs(buf, layer)
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [tix],
                "tile_iy": [tiy],
                "n_features": [n],
                "sum_x": [sx],
                "sum_y": [sy],
                "xor_id": [xr],
                "mvt_len": [len(buf)],
                "mvt": [buf],
            }
        )

    return per_tile.groupBy("tile_ix", "tile_iy").applyInPandas(
        encode, _OUT_SCHEMA
    )


def mvt_line_tiles(
    segs: DataFrame,
    level: int,
    extent: int = W.DEFAULT_EXTENT,
    layer: str = "lines",
    track_col: str = "track_id",
) -> DataFrame:
    """Polyline features (segment-grain line store, operators/lines.py) →
    per-tile MVT payloads — the serving arm the trajectory family lacked
    (reference renders arbitrary geometry via DistributedRenderProcess.java:32-60;
    MVT 2.1 §4.3.5.3 LineTo command runs).

    Tile assignment is EXACT in quantized space: endpoints snap to the
    global integer grid at ``res = level + log2(extent)`` first, then a
    segment joins every tile whose pixel box its quantized image touches
    (the same separating-axis test as the line query path) — no clipping;
    MVT permits coordinates outside the tile extent and renderers clip,
    so geometry stays exact integers and the whole assignment replays in
    SQL.  Consecutive surviving segments of a track merge into one
    MoveTo + LineTo run (cursor-relative deltas, spec §4.3.5.3); a seg_j
    gap starts a new part — deterministic, lag-replayable.
    """
    from geowave_spark.functions import cols as X
    from geowave_spark.operators.index import _invariant_guard
    from geowave_spark.session import spread

    shift = _extent_shift(extent)
    res = level + shift
    g = lambda c, off, span: X.grid_milli_col(F.col(c), off, span, F.lit(res))  # noqa: E731
    if "n_dup" in segs.columns:
        # an INDEXED line store carries one row per covering cell
        # (multi-cell insertion ids) — emit each segment once per tile,
        # the DedupeFilter gating every multi-cell reader applies
        segs = segs.dropDuplicates([track_col, "seg_j"])
    base = spread(
        segs.select(
            F.col(track_col).cast("long").alias("_id"),
            F.col("seg_j").cast("long").alias("seg_j"),
            g("x0", 180_000, 360_000).alias("gx0"),
            g("y0", 90_000, 180_000).alias("gy0"),
            g("x1", 180_000, 360_000).alias("gx1"),
            g("y1", 90_000, 180_000).alias("gy1"),
        )
    )
    tx0 = F.shiftright(F.least("gx0", "gx1"), shift)
    tx1 = F.shiftright(F.greatest("gx0", "gx1"), shift)
    ty0 = F.shiftright(F.least("gy0", "gy1"), shift)
    ty1 = F.shiftright(F.greatest("gy0", "gy1"), shift)
    guarded = base.filter(
        _invariant_guard(
            ((tx1 - tx0) >= MAX_TILES_PER_ENVELOPE)
            | ((ty1 - ty0) >= MAX_TILES_PER_ENVELOPE),
            f"segment spans more than {MAX_TILES_PER_ENVELOPE} tiles per "
            "axis at this level — export at a coarser level",
        )
    )
    per_tile = (
        guarded.select(
            "_id", "seg_j", "gx0", "gy0", "gx1", "gy1",
            F.explode(F.sequence(tx0, tx1)).alias("tile_ix"),
            ty0.alias("_ty0"), ty1.alias("_ty1"),
        )
        .select(
            "*",
            F.explode(F.sequence(F.col("_ty0"), F.col("_ty1"))).alias("tile_iy"),
        )
        .drop("_ty0", "_ty1")
    )
    # exact separating-axis test of the quantized segment against the
    # tile's pixel box [ox, ox+extent-1]^2 — pure column integer math
    # (lines.sql_seg_box's column twin; res <= 28 keeps every product
    # far inside int64)
    bx0 = F.col("tile_ix") * F.lit(extent)
    by0 = F.col("tile_iy") * F.lit(extent)
    bx1 = bx0 + F.lit(extent - 1)
    by1 = by0 + F.lit(extent - 1)
    nx = F.col("gy0") - F.col("gy1")
    ny = F.col("gx1") - F.col("gx0")
    c = nx * F.col("gx0") + ny * F.col("gy0")
    d1 = nx * bx0 + ny * by0
    d2 = nx * bx0 + ny * by1
    d3 = nx * bx1 + ny * by0
    d4 = nx * bx1 + ny * by1
    hit = (
        (F.least("gx0", "gx1") <= bx1) & (F.greatest("gx0", "gx1") >= bx0)
        & (F.least("gy0", "gy1") <= by1) & (F.greatest("gy0", "gy1") >= by0)
        & (F.least(d1, d2, d3, d4) <= c) & (c <= F.greatest(d1, d2, d3, d4))
    )
    survivors = per_tile.filter(hit)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tix = int(pdf["tile_ix"].iloc[0])
        tiy = int(pdf["tile_iy"].iloc[0])
        _tile_guard(len(pdf), tix, tiy, level)
        ox, oy = tix << shift, tiy << shift
        top = extent - 1
        pdf = pdf.sort_values(["_id", "seg_j"], kind="mergesort")
        ids = pdf["_id"].to_numpy(np.int64)
        sj = pdf["seg_j"].to_numpy(np.int64)
        lx0 = pdf["gx0"].to_numpy(np.int64) - ox
        ly0 = top - (pdf["gy0"].to_numpy(np.int64) - oy)
        lx1 = pdf["gx1"].to_numpy(np.int64) - ox
        ly1 = top - (pdf["gy1"].to_numpy(np.int64) - oy)
        feats = []
        i = 0
        n_rows = len(ids)
        while i < n_rows:
            tid = ids[i]
            parts: list[list[tuple[int, int]]] = []
            prev_j = None
            while i < n_rows and ids[i] == tid:
                if prev_j is not None and sj[i] == prev_j + 1:
                    parts[-1].append((int(lx1[i]), int(ly1[i])))
                else:
                    parts.append([(int(lx0[i]), int(ly0[i])),
                                  (int(lx1[i]), int(ly1[i]))])
                prev_j = sj[i]
                i += 1
            feats.append(
                {
                    "id": int(tid),
                    "type": W.LINESTRING,
                    "geometry": W.geom_linestring(parts),
                    "tags": {},
                }
            )
        buf = W.encode_tile({layer: feats}, extent=extent)
        n, sx, sy, xr = _decoded_aggs(buf, layer)
        return pd.DataFrame(
            {
                "level": [int(level)],
                "tile_ix": [tix],
                "tile_iy": [tiy],
                "n_features": [n],
                "sum_x": [sx],
                "sum_y": [sy],
                "xor_id": [xr],
                "mvt_len": [len(buf)],
                "mvt": [buf],
            }
        )

    return survivors.groupBy("tile_ix", "tile_iy").applyInPandas(
        encode, _OUT_SCHEMA
    )
