"""Arrow-vectorized pandas UDFs wrapping the numpy kernels, plus SQL
registration.

These replace the reference's per-row JTS UDFs
(analytics/spark/.../sparksql/udf/GeomFunctionRegistry.java:31-100 registered
UDF2<String,String,Boolean> over WKT) with Arrow record-batch kernels — the
per-batch numpy evaluation is the engine's axis-A performance win.  Envelope
algebra and distance math that can stay JVM-side (whole-stage codegen) is
NOT here — operators express those as Spark column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geowave_spark.functions import cells as C
from geowave_spark.functions import geometry as G


@F.pandas_udf(T.LongType())
def cell_encode(lon: pd.Series, lat: pd.Series, res: pd.Series) -> pd.Series:
    """Point → cell id at per-row resolution."""
    n = (np.int64(1) << res.to_numpy(np.int64)).astype(np.float64)
    ix = np.clip(
        np.floor((lon.to_numpy(np.float64) + 180.0) / 360.0 * n), 0, n - 1
    ).astype(np.int64)
    iy = np.clip(
        np.floor((lat.to_numpy(np.float64) + 90.0) / 180.0 * n), 0, n - 1
    ).astype(np.int64)
    return pd.Series(C.pack(res.to_numpy(np.int64), ix, iy))


@F.pandas_udf(T.LongType())
def cell_encode_milli(lon_milli: pd.Series, lat_milli: pd.Series, res: pd.Series) -> pd.Series:
    """Exact integer-path encode (matches the SQL-oracle closed form)."""
    r = res.to_numpy(np.int64)
    n = np.int64(1) << r
    lon_m = lon_milli.to_numpy(np.int64)
    lat_m = lat_milli.to_numpy(np.int64)
    ix = np.clip((lon_m + 180_000) * n // 360_000, 0, n - 1)
    iy = np.clip((lat_m + 90_000) * n // 180_000, 0, n - 1)
    return pd.Series(C.pack(r, ix, iy))


@F.pandas_udf(T.LongType())
def cell_parent(cell: pd.Series, parent_res: pd.Series) -> pd.Series:
    res, ix, iy = C.unpack(cell.to_numpy(np.int64))
    pr = parent_res.to_numpy(np.int64)
    shift = np.maximum(res - pr, 0)
    return pd.Series(C.pack(pr, ix >> shift, iy >> shift))


_BOUNDS_SCHEMA = T.StructType(
    [
        T.StructField("minlon", T.DoubleType()),
        T.StructField("minlat", T.DoubleType()),
        T.StructField("maxlon", T.DoubleType()),
        T.StructField("maxlat", T.DoubleType()),
    ]
)


@F.pandas_udf(_BOUNDS_SCHEMA)
def cell_bounds(cell: pd.Series) -> pd.DataFrame:
    minlon, minlat, maxlon, maxlat = C.cell_bounds(cell.to_numpy(np.int64))
    return pd.DataFrame(
        {"minlon": minlon, "minlat": minlat, "maxlon": maxlon, "maxlat": maxlat}
    )


@F.pandas_udf(T.LongType())
def tier_select(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    return pd.Series(
        C.tier_select(
            minx.to_numpy(np.float64),
            miny.to_numpy(np.float64),
            maxx.to_numpy(np.float64),
            maxy.to_numpy(np.float64),
        )
    )


@F.pandas_udf(T.LongType())
def tier_select_extent_milli(ex_milli: pd.Series, ey_milli: pd.Series) -> pd.Series:
    return pd.Series(
        C.tier_select_extent_milli(ex_milli.to_numpy(np.int64), ey_milli.to_numpy(np.int64))
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def cover_envelope(
    minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series, res: pd.Series
) -> pd.Series:
    """Per-row envelope → array of covering cells at the row's resolution
    (callers explode).  Resolution from tier_select guarantees ≤4 cells."""
    row, cc = C.cover_envelopes(
        minx.to_numpy(np.float64),
        miny.to_numpy(np.float64),
        maxx.to_numpy(np.float64),
        maxy.to_numpy(np.float64),
        res.to_numpy(np.int64),
    )
    out = [[] for _ in range(len(minx))]
    for r, c in zip(row.tolist(), cc.tolist()):
        out[r].append(c)
    return pd.Series(out)


def make_pip_refine(wkb: bytes):
    """Build a pandas UDF testing point containment in a fixed (Multi)Polygon.

    The polygon is parsed once per executor (closure capture), then each
    Arrow batch is one vectorized even-odd evaluation — the refinement stage
    of cover+refine (reference SpatialQueryFilter.java:43-190)."""
    polys = G.polygon_rings(wkb)
    # convex fast path: single ring, CCW convex → half-plane sign tests
    # (no division; bit-identical to a SQL half-plane predicate)
    convex_ring = G.convex_open_ring(wkb)

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        if convex_ring is not None:
            return pd.Series(G.points_in_convex(px, py, convex_ring))
        return pd.Series(G.points_in_polygon(px, py, polys))

    return pip


def make_pip_refine_multi(wkbs: dict[str, bytes]):
    """PIP refine over (query_id, lon, lat) for a SET of polygons — one
    UDF for a whole query group, so the cover-join prefilter scans the
    data once for any number of polygon queries (the reference's iterator
    makes one pass over all ranges; per-query scan branches would be N
    scans).  Polygons are parsed once per executor; rows group by
    query_id into one vectorized even-odd evaluation per polygon.
    Unknown query_ids return False — those rows belong to a convex
    codegen refine that precedes this UDF in the CASE chain."""
    parsed = {qid: G.polygon_rings(w) for qid, w in wkbs.items()}

    @F.pandas_udf(T.BooleanType())
    def pip_multi(qid: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        ids = qid.to_numpy()
        out = np.zeros(len(ids), dtype=bool)
        for q in pd.unique(ids):
            polys = parsed.get(q)
            if polys is None:
                continue
            pos = np.nonzero(ids == q)[0]
            out[pos] = G.points_in_polygon(px[pos], py[pos], polys)
        return pd.Series(out)

    return pip_multi


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType()),
        ]
    )
)
def wkb_envelope_cols(wkb: pd.Series) -> pd.DataFrame:
    """Vectorized WKB → envelope extraction for a POLYGON TABLE (each row
    its own geometry, so the parse is per row — one embarrassingly
    parallel pass; the reference computes the same envelope at ingest in
    GeometryUtils.basicConstraintsFromGeometry)."""
    envs = [G.envelope_of_wkb(b) for b in wkb]
    return pd.DataFrame(envs, columns=["minx", "miny", "maxx", "maxy"])


@F.pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("x0", T.DoubleType()),
                T.StructField("y0", T.DoubleType()),
                T.StructField("dx", T.DoubleType()),
                T.StructField("dy", T.DoubleType()),
            ]
        )
    )
)
def convex_edges_col(wkb: pd.Series) -> pd.Series:
    """CCW convex single-ring polygons → their edge strip
    (x0, y0, dx, dy) so the PIP refine runs as a pure JVM
    ``forall(edges, sign >= 0)`` — zero Python in the pair path; NULL for
    general geometries (they fall back to the Arrow even-odd kernel).
    One parse per POLYGON row (the small side), not per candidate pair."""
    out = []
    for buf in wkb:
        ring = G.convex_open_ring(buf)
        if ring is None:
            out.append(None)
            continue
        edges = []
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            edges.append(
                {"x0": float(x0), "y0": float(y0),
                 "dx": float(x1 - x0), "dy": float(y1 - y0)}
            )
        out.append(edges)
    return pd.Series(out)


UNROLL_EDGE_CAP = 24


def convex_forall_refine(edges, px, py, max_edges: int | None = None):
    """JVM half-plane refine over an edge-strip column — the same exact
    IEEE multiply/subtract as points_in_convex and the SQL sign-test
    oracles.

    Higher-order functions are NOT whole-stage-codegen'd (measured 4.5s
    forall vs 1.0s unrolled on a 6M-pair refine), so when the group's
    max edge count is known (one tiny aggregate on the polygon side) the
    test unrolls into a plain conjunction: term i is null-safe
    ``coalesce(sign(get(edges, i)), TRUE)`` — a missing edge (shorter
    ring) is vacuously true.  Rings beyond ``UNROLL_EDGE_CAP`` fall back
    to forall rather than risk the 64 KB codegen limit."""
    if max_edges is None or max_edges > UNROLL_EDGE_CAP:
        return F.forall(
            edges,
            lambda e: (e["dx"] * (py - e["y0"]) - e["dy"] * (px - e["x0"]))
            >= F.lit(0.0),
        )
    pred = F.lit(True)
    for i in range(max_edges):
        e = F.get(edges, i)
        term = F.coalesce(
            (e["dx"] * (py - e["y0"]) - e["dy"] * (px - e["x0"])) >= F.lit(0.0),
            F.lit(True),
        )
        pred = pred & term
    return pred


def pip_pairs_refine(wkb: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    """Exact PIP over candidate (polygon-wkb, point) PAIRS — the refine
    stage of the large×large points-in-polygons join.  Rows group by
    identical WKB bytes so each distinct polygon in the batch parses once
    and refines as one vectorized kernel call (convex rings take the
    half-plane fast path — bit-identical to a SQL sign-test oracle).
    Candidate pairs arrive clustered by cell key, so batches are dominated
    by few polygons."""
    x = px.to_numpy(np.float64)
    y = py.to_numpy(np.float64)
    out = np.zeros(len(x), dtype=bool)
    codes, uniques = pd.factorize(wkb)
    for u, buf in enumerate(uniques):
        pos = np.nonzero(codes == u)[0]
        ring = G.convex_open_ring(buf)
        if ring is not None:
            out[pos] = G.points_in_convex(x[pos], y[pos], ring)
        else:
            out[pos] = G.points_in_polygon(x[pos], y[pos], G.polygon_rings(buf))
    return pd.Series(out)


pip_pairs_refine_udf = F.pandas_udf(pip_pairs_refine, T.BooleanType())


def make_envelope_refine(wkb: bytes):
    """Envelope-vs-polygon exact intersection refine (for footprints, not
    just centers)."""
    polys = G.polygon_rings(wkb)

    @F.pandas_udf(T.BooleanType())
    def env_refine(
        minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series
    ) -> pd.Series:
        return pd.Series(
            G.envelope_intersects_polygon(
                minx.to_numpy(np.float64),
                miny.to_numpy(np.float64),
                maxx.to_numpy(np.float64),
                maxy.to_numpy(np.float64),
                polys,
            )
        )

    return env_refine


def haversine_m_col(lon1, lat1, lon2, lat2):
    """Haversine metres as a pure Spark column expression — JVM-side,
    whole-stage-codegen'd, no UDF (reference computed this per-row in Java,
    CoordinateCircleDistanceFn)."""
    rlon1, rlat1, rlon2, rlat2 = (F.radians(c) for c in (lon1, lat1, lon2, lat2))
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return 2 * F.lit(G.EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def planar_wrap_dist2_col(lon1_m, lat1_m, lon2_m, lat2_m):
    """Exact integer squared planar distance (milli-deg, date-line wrap) as
    JVM-side column math — the oracle-reproducible kNN metric."""
    dlon = F.abs(lon1_m - lon2_m)
    dlon = F.least(dlon, F.lit(360_000) - dlon)
    dlat = F.abs(lat1_m - lat2_m)
    return dlon * dlon + dlat * dlat


def register_sql_functions(spark: SparkSession) -> None:
    """Register the cell/geometry functions for SQL use — the analogue of the
    reference's GeomFunctionRegistry.registerGeometryFunctions."""
    spark.udf.register("gw_cell_encode", cell_encode)
    spark.udf.register("gw_cell_encode_milli", cell_encode_milli)
    spark.udf.register("gw_cell_parent", cell_parent)
    spark.udf.register("gw_tier_select", tier_select)
    spark.udf.register("gw_tier_select_extent_milli", tier_select_extent_milli)
    spark.udf.register("gw_cover_envelope", cover_envelope)


def make_geom_predicate(op: str):
    """Arrow-batched pairwise geometry predicate over two WKB columns —
    the engine's version of the reference's registered geometry UDFs
    (GeomFunctionRegistry.java UDF2<String,String,Boolean> over WKT, which
    parsed both geometries per row).  Each distinct geometry in the batch
    is parsed once and point-vs-area rows sharing an area geometry are one
    vectorized PIP call (geometry.geom_op_batch) — the common shape
    `geomIntersects(point_col, lit(query_wkb))` costs one polygon parse
    per batch plus a single numpy crossing test."""
    opl = op.lower()

    @F.pandas_udf(T.BooleanType())
    def pred(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(G.geom_op_batch(opl, a.to_list(), b.to_list()), dtype="object")

    return pred


def register_geom_predicates(spark: SparkSession) -> None:
    """Register the reference's 9 predicate names
    (GeomFunctionRegistry.java:31-100): geomEquals, geomWithin,
    geomContains, geomIntersects, geomCrosses, geomTouches, geomCovers,
    geomDisjoint, geomOverlaps — over WKB (an improvement on the
    reference's WKT strings)."""
    for op in G.GEOM_OPS:
        spark.udf.register(f"geom{op.capitalize()}", make_geom_predicate(op))
