"""ESRI shapefile (.shp + .dbf) codec and Spark reader — the canonical
GeoTools-vector ingest format (SURVEY §2.2; reference
extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin.java
ingests any GeoTools store, shapefiles first among them; the reference's own
golden ITs ingest hail/tornado_tracks shapefiles,
test/.../GeoWaveBasicSpatialVectorIT.java:36-167).

Pure struct/numpy parsing of the PUBLIC format specs (ESRI Shapefile
Technical Description whitepaper; dBASE III header layout) — same
dependency-free posture as sources/png.py / media.py.  Supported shapes:
Point(1), PolyLine(3), Polygon(5), MultiPoint(8) + Null(0); dBASE C/N/F/L
fields.  Compressed sidecars (.sbn/.shx indexes) are unnecessary for a full
scan and ignored.

Spark shape: shapefiles are NOT splittable (record headers carry no sync
marks), so the parallel grain is one file per task — ``binaryFile`` scan +
Arrow-batched decode, the same pattern as GPX/media.  Attributes join back
to geometry on (path, recno): both parses preserve the record order the
formats define.
"""

from __future__ import annotations

import struct

import numpy as np

SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT = 0, 1, 3, 5, 8


# ---------------------------------------------------------------------------
# .shp codec
# ---------------------------------------------------------------------------


def _shape_content(shape_type: int, parts: list[np.ndarray]) -> bytes:
    """Record content for one shape.  ``parts`` = list of (n,2) float64
    arrays (rings/paths); Point/MultiPoint take a single part."""
    if shape_type == SHP_NULL:
        return struct.pack("<i", SHP_NULL)
    if shape_type == SHP_POINT:
        (pt,) = parts
        return struct.pack("<idd", SHP_POINT, float(pt[0, 0]), float(pt[0, 1]))
    allp = np.vstack(parts)
    bbox = (allp[:, 0].min(), allp[:, 1].min(), allp[:, 0].max(), allp[:, 1].max())
    if shape_type == SHP_MULTIPOINT:
        return (
            struct.pack("<i4di", SHP_MULTIPOINT, *bbox, len(allp))
            + allp.astype("<f8").tobytes()
        )
    if shape_type in (SHP_POLYLINE, SHP_POLYGON):
        offsets, off = [], 0
        for p in parts:
            offsets.append(off)
            off += len(p)
        return (
            struct.pack("<i4dii", shape_type, *bbox, len(parts), len(allp))
            + np.asarray(offsets, dtype="<i4").tobytes()
            + allp.astype("<f8").tobytes()
        )
    raise ValueError(f"unsupported shape type {shape_type}")


def encode_shp(shapes: list[tuple[int, list[np.ndarray]]]) -> bytes:
    """Shapes → .shp main file bytes.  All records must share one shape type
    (a shapefile invariant; Null is always allowed)."""
    types = {t for t, _ in shapes if t != SHP_NULL}
    if len(types) > 1:
        raise ValueError(f"mixed shape types in one shapefile: {sorted(types)}")
    ftype = types.pop() if types else SHP_NULL

    recs = []
    gmin = [np.inf, np.inf]
    gmax = [-np.inf, -np.inf]
    for i, (t, parts) in enumerate(shapes):
        content = _shape_content(t, parts)
        recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
        if t != SHP_NULL:
            allp = np.vstack(parts)
            gmin = [min(gmin[0], allp[:, 0].min()), min(gmin[1], allp[:, 1].min())]
            gmax = [max(gmax[0], allp[:, 0].max()), max(gmax[1], allp[:, 1].max())]
    if not np.isfinite(gmin[0]):
        gmin = gmax = [0.0, 0.0]
    body = b"".join(recs)
    header = struct.pack(
        ">i20xi", 9994, (100 + len(body)) // 2
    )  # file code, 5 unused int32, length in 16-bit words
    header += struct.pack("<ii", 1000, ftype)
    header += struct.pack("<4d", gmin[0], gmin[1], gmax[0], gmax[1])
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    assert len(header) == 100
    return header + body


def decode_shp(buf: bytes) -> list[tuple[int, int, list[np.ndarray]]]:
    """.shp bytes → [(recno, shape_type, parts)] with parts as (n,2) arrays."""
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (bad file code)")
    out = []
    off = 100
    while off + 8 <= len(buf):
        recno, clen = struct.unpack_from(">ii", buf, off)
        off += 8
        content = buf[off : off + clen * 2]
        off += clen * 2
        (t,) = struct.unpack_from("<i", content, 0)
        if t == SHP_NULL:
            out.append((recno, t, []))
        elif t == SHP_POINT:
            x, y = struct.unpack_from("<dd", content, 4)
            out.append((recno, t, [np.array([[x, y]])]))
        elif t == SHP_MULTIPOINT:
            (n,) = struct.unpack_from("<i", content, 36)
            pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40)
            out.append((recno, t, [pts.reshape(n, 2).astype(np.float64)]))
        elif t in (SHP_POLYLINE, SHP_POLYGON):
            nparts, npts = struct.unpack_from("<ii", content, 36)
            parts_idx = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
            pts = np.frombuffer(
                content, dtype="<f8", count=2 * npts, offset=44 + 4 * nparts
            ).reshape(npts, 2)
            bounds = list(parts_idx) + [npts]
            out.append(
                (
                    recno,
                    t,
                    [
                        pts[bounds[k] : bounds[k + 1]].astype(np.float64)
                        for k in range(nparts)
                    ],
                )
            )
        else:
            raise ValueError(f"unsupported shape type {t} in record {recno}")
    return out


def shp_record_wkb(shape_type: int, parts: list[np.ndarray]) -> bytes | None:
    """Decoded shape → WKB via the engine's geometry kernels (polygons keep
    their ring structure; polylines become LineString/MultiLineString and
    feed the segment-grain line store via operators/lines.segments_from_wkb;
    multipoints have no WKB consumer in the query surface, so they return
    None and callers keep the raw parts)."""
    from geowave_spark.functions import geometry as G

    if shape_type == SHP_POINT:
        return G.wkb_point(float(parts[0][0, 0]), float(parts[0][0, 1]))
    if shape_type == SHP_POLYGON:
        return G.wkb_polygon([p for p in parts])
    if shape_type == SHP_POLYLINE:
        if len(parts) == 1:
            return G.wkb_linestring(parts[0])
        return G.wkb_multilinestring([p for p in parts])
    return None


# ---------------------------------------------------------------------------
# .dbf codec (dBASE III attribute table)
# ---------------------------------------------------------------------------


def encode_dbf(
    fields: list[tuple[str, str, int, int]], records: list[tuple]
) -> bytes:
    """``fields`` = [(name≤10, type C|N|F|L, width, decimals)] — classic
    dBASE III layout, ASCII fixed-width records."""
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(w for _, _, w, _ in fields)
    out = bytearray()
    out += struct.pack(
        "<B3BIHH20x", 0x03, 95, 1, 1, len(records), hdr_size, rec_size
    )
    for name, ftype, width, dec in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode()[:10], ftype.encode(), width, dec
        )
    out += b"\x0d"
    for rec in records:
        out += b" "  # not-deleted flag
        for (name, ftype, width, dec), val in zip(fields, rec):
            if ftype in ("N", "F"):
                txt = ("" if val is None else (f"%.{dec}f" % val if dec else str(int(val))))
                if len(txt) > width:
                    # keeping the LEADING chars of an over-wide number
                    # silently drops orders of magnitude (123456 @ width 4
                    # → 1234) and round-trips as a plausible wrong value —
                    # fail loudly like the ring/tile guards do
                    raise ValueError(
                        f"dbf field {name!r}: value {txt!r} exceeds "
                        f"declared width {width}"
                    )
                out += txt.rjust(width).encode()
            elif ftype == "L":
                out += (b"T" if val else b"F").ljust(width)
            else:
                out += str("" if val is None else val).ljust(width).encode()[:width]
    out += b"\x1a"
    return bytes(out)


def decode_dbf(
    buf: bytes,
) -> tuple[list[tuple[str, str, int, int]], list[dict | None]]:
    """→ (fields, records) with ``records`` POSITIONALLY ALIGNED to the
    physical record slots: a deleted record (0x2A flag) yields ``None``
    rather than being skipped — the .shp↔.dbf pairing is by position, so
    dropping a slot would attach record k+1's attributes to shape k for
    every feature after the deletion."""
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name, ftype, width, dec = struct.unpack_from("<11sc4xBB14x", buf, off)
        fields.append((name.split(b"\x00")[0].decode(), ftype.decode(), width, dec))
        off += 32
    records: list[dict | None] = []
    off = hdr_size
    for _ in range(n_rec):
        if buf[off : off + 1] == b"*":  # deleted — keep the slot
            records.append(None)
            off += rec_size
            continue
        pos = off + 1
        rec = {}
        for name, ftype, width, dec in fields:
            raw = buf[pos : pos + width].decode(errors="replace").strip()
            pos += width
            if ftype in ("N", "F"):
                rec[name] = (float(raw) if dec else int(raw)) if raw else None
            elif ftype == "L":
                rec[name] = raw.upper() in ("T", "Y")
            else:
                rec[name] = raw
        records.append(rec)
        off += rec_size
    return fields, records


# ---------------------------------------------------------------------------
# Spark reader / writer
# ---------------------------------------------------------------------------

import json  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

SHP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("recno", T.IntegerType()),
        T.StructField("shape_type", T.IntegerType()),
        T.StructField("n_parts", T.IntegerType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("wkb", T.BinaryType()),
        T.StructField("attrs_json", T.StringType()),
    ]
)


def read_shapefile(spark: SparkSession, shp_glob: str) -> DataFrame:
    """Shapefiles → one feature row per record: geometry envelope + WKB
    (points/polygons) + the .dbf attribute record as a JSON string column
    (schema-on-read via ``F.get_json_object``/``from_json`` — attribute
    schemas vary per shapefile, exactly why GeoWave keys adapters per type).

    One file per task; the sibling .dbf is read inside the same task (it is
    a fixed sidecar of its .shp — the format couples them by basename)."""

    def kernel(batches):
        import os

        import pandas as pd

        cols = [f.name for f in SHP_FEATURE_SCHEMA.fields]
        for b in batches:
            rows = []
            for r in b.itertuples():
                shapes = decode_shp(bytes(r.content))
                dbf_path = r.path.replace("file:", "")[: -len(".shp")] + ".dbf"
                attrs: list[dict] = []
                if os.path.exists(dbf_path):
                    with open(dbf_path, "rb") as fh:
                        _, attrs = decode_dbf(fh.read())
                for k, (recno, t, parts) in enumerate(shapes):
                    if parts:
                        allp = np.vstack(parts)
                        env = (
                            float(allp[:, 0].min()),
                            float(allp[:, 1].min()),
                            float(allp[:, 0].max()),
                            float(allp[:, 1].max()),
                        )
                        npts = int(len(allp))
                    else:
                        env, npts = (None, None, None, None), 0
                    rows.append(
                        (
                            r.path,
                            recno,
                            t,
                            len(parts),
                            npts,
                            *env,
                            shp_record_wkb(t, parts),
                            json.dumps(attrs[k])
                            if k < len(attrs) and attrs[k] is not None
                            else None,
                        )
                    )
            pdf = pd.DataFrame(rows, columns=cols)
            for icol in ("recno", "shape_type", "n_parts", "n_points"):
                pdf[icol] = pdf[icol].astype("int32")
            yield pdf

    files = spark.read.format("binaryFile").load(shp_glob)
    return files.select("path", "content").mapInPandas(kernel, SHP_FEATURE_SCHEMA)


def write_shapefile_shards(
    df: DataFrame,
    out_dir: str,
    shape_col: str = "shape",
    bucket_col: str = "bucket",
    fields: list[tuple[str, str, int, int]] | None = None,
    attr_cols: list[str] | None = None,
) -> None:
    """Write one .shp/.dbf pair per ``bucket_col`` value — the vector-export
    twin of :func:`read_shapefile` (VectorLocalExportCommand analogue).

    ``shape_col`` holds rows of (shape_type int, parts = array of array of
    [x, y]).  Each task writes its buckets' files directly (the standard
    one-file-per-task sink shape; a cluster deployment points ``out_dir`` at
    a shared filesystem).
    """
    import os

    fields = fields or []
    attr_cols = attr_cols or []
    cols = [bucket_col, shape_col, *attr_cols]
    picked = df.select(*cols).repartition(F.col(bucket_col))

    def write_partition(rows):
        by_bucket: dict = {}
        for row in rows:
            by_bucket.setdefault(row[bucket_col], []).append(row)
        for bucket, rs in by_bucket.items():
            shapes, recs = [], []
            for row in rs:
                t, parts = row[shape_col]
                shapes.append(
                    (int(t), [np.asarray(p, dtype=np.float64) for p in parts])
                )
                recs.append(tuple(row[c] for c in attr_cols))
            base = os.path.join(out_dir, f"shard{int(bucket):05d}")
            with open(base + ".shp", "wb") as fh:
                fh.write(encode_shp(shapes))
            if fields:
                with open(base + ".dbf", "wb") as fh:
                    fh.write(encode_dbf(fields, recs))

    os.makedirs(out_dir, exist_ok=True)
    picked.foreachPartition(write_partition)
