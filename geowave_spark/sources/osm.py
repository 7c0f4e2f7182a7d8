"""OSM PBF codec + Spark readers — the reference's OSM ingest staging
(extensions/cli/osm/.../parser/OsmPbfParser.java: osmosis BinaryParser over
.osm.pbf, staged as node/way/relation tables the analytics then index).

Pure-python implementation of the PUBLIC OSMPBF wire format
(fileformat.proto / osmformat.proto, github.com/openstreetmap/OSM-binary):
protobuf varint wire parsing, [len][BlobHeader][Blob] framing, zlib blobs,
PrimitiveBlock string tables, DenseNodes delta+zigzag packed coords with
granularity/offset, Way ref deltas, Relation member deltas — the same
dependency-free codec posture as sources/avro.py / sources/tiff.py.

Spark shape (the OsmPbfParser's Avro staging, DataFrame-native): one file
per task via binaryFile + mapInPandas, yielding typed node/way/relation
rows; nodes carry exact integer nano/milli coords so they feed
``index_points`` and every spatial operator directly.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------


def _uv(n: int) -> bytes:
    """unsigned varint."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sv(n: int) -> bytes:
    """sint64: zigzag then varint."""
    return _uv((n << 1) ^ (n >> 63) if n < 0 else n << 1)


def _read_uv(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _unzig(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over one protobuf message.
    wire 0 → varint int, wire 2 → bytes, wire 5/1 → fixed raw."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_uv(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_uv(buf, pos)
        elif wire == 2:
            ln, pos = _read_uv(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            v = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            v = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, v


def _packed_uv(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_uv(buf, pos)
        out.append(v)
    return out


def _packed_sv(buf: bytes) -> list[int]:
    return [_unzig(u) for u in _packed_uv(buf)]


def _msg(field: int, payload: bytes) -> bytes:
    return _uv((field << 3) | 2) + _uv(len(payload)) + payload


def _vint(field: int, v: int) -> bytes:
    return _uv(field << 3) + _uv(v)


def _packed(field: int, enc, values) -> bytes:
    return _msg(field, b"".join(enc(v) for v in values))


def _delta(values: list[int]) -> list[int]:
    prev, out = 0, []
    for v in values:
        out.append(v - prev)
        prev = v
    return out


def _undelta(values: list[int]) -> list[int]:
    acc, out = 0, []
    for v in values:
        acc += v
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# OSMPBF encode (fixture writer) / decode
# ---------------------------------------------------------------------------

GRANULARITY = 100  # nanodegrees per unit (the format default)

MEMBER_TYPES = ("node", "way", "relation")


class _Strings:
    """PrimitiveBlock string table: index 0 is reserved empty."""

    def __init__(self):
        self.idx = {"": 0}
        self.items = [""]

    def __call__(self, s: str) -> int:
        i = self.idx.get(s)
        if i is None:
            i = len(self.items)
            self.idx[s] = i
            self.items.append(s)
        return i


def _tag_ids(st: _Strings, tags: dict) -> tuple[list[int], list[int]]:
    keys = sorted(tags)
    return [st(k) for k in keys], [st(str(tags[k])) for k in keys]


def encode_osm_pbf(
    nodes: list[tuple[int, int, int, dict]],
    ways: list[tuple[int, list[int], dict]] = (),
    relations: list[tuple[int, list[tuple[str, int, str]], dict]] = (),
    compress: bool = True,
    lat_offset: int = 0,
    lon_offset: int = 0,
) -> bytes:
    """(id, lon_nano, lat_nano, tags) nodes (+ ways (id, refs, tags) and
    relations (id, [(type, memid, role)], tags)) → one .osm.pbf file:
    OSMHeader blob + one OSMData blob (DenseNodes + ways + relations).
    Coordinates must be multiples of GRANULARITY (exact round trip)."""
    st = _Strings()
    groups = []
    if nodes:
        for _, lon, lat, _t in nodes:
            if (lon - lon_offset) % GRANULARITY or (lat - lat_offset) % GRANULARITY:
                raise ValueError("node coord not on the granularity grid")
        kv = []
        for _, _, _, tags in nodes:
            for k in sorted(tags):
                kv += [st(k), st(str(tags[k]))]
            kv.append(0)
        dense = (
            _packed(1, _sv, _delta([n[0] for n in nodes]))
            + _packed(8, _sv, _delta([(n[2] - lat_offset) // GRANULARITY for n in nodes]))
            + _packed(9, _sv, _delta([(n[1] - lon_offset) // GRANULARITY for n in nodes]))
            + _packed(10, _uv, kv)
        )
        groups.append(_msg(2, dense))
    for wid, refs, tags in ways:
        ks, vs = _tag_ids(st, tags)
        way = (
            _vint(1, wid)
            + _packed(2, _uv, ks)
            + _packed(3, _uv, vs)
            + _packed(8, _sv, _delta(refs))
        )
        groups.append(_msg(3, way))
    for rid, members, tags in relations:
        ks, vs = _tag_ids(st, tags)
        rel = (
            _vint(1, rid)
            + _packed(2, _uv, ks)
            + _packed(3, _uv, vs)
            + _packed(8, _uv, [st(role) for _, _, role in members])
            + _packed(9, _sv, _delta([m for _, m, _ in members]))
            + _packed(10, _uv, [MEMBER_TYPES.index(t) for t, _, _ in members])
        )
        groups.append(_msg(4, rel))

    strtab = _msg(1, b"".join(_msg(1, s.encode()) for s in st.items))
    block = (
        strtab
        + b"".join(_msg(2, g) for g in groups)
        + _vint(17, GRANULARITY)
        + _vint(19, lat_offset)
        + _vint(20, lon_offset)
    )
    header_block = _msg(4, b"OsmSchema-V0.6") + _msg(4, b"DenseNodes")

    out = bytearray()
    for btype, payload in (("OSMHeader", header_block), ("OSMData", block)):
        if compress:
            blob = _vint(2, len(payload)) + _msg(3, zlib.compress(payload, 6))
        else:
            blob = _msg(1, payload)
        bh = _msg(1, btype.encode()) + _vint(3, len(blob))
        out += struct.pack(">I", len(bh)) + bh + blob
    return bytes(out)


def decode_osm_pbf(buf: bytes) -> dict:
    """.osm.pbf bytes → {'nodes': [(id, lon_nano, lat_nano, tags)],
    'ways': [(id, refs, tags)], 'relations': [(id, members, tags)]} with
    members = [(type, memid, role)].  Handles raw and zlib blobs, dense
    and plain nodes, granularity/offset."""
    nodes, ways, relations = [], [], []
    pos = 0
    while pos < len(buf):
        (hlen,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        header = buf[pos : pos + hlen]
        pos += hlen
        btype, datasize = "", 0
        for f, _w, v in _fields(header):
            if f == 1:
                btype = v.decode()
            elif f == 3:
                datasize = v
        blob = buf[pos : pos + datasize]
        pos += datasize
        payload = None
        for f, _w, v in _fields(blob):
            if f == 1:
                payload = bytes(v)
            elif f == 3:
                payload = zlib.decompress(v)
        if btype != "OSMData" or payload is None:
            continue
        _decode_block(payload, nodes, ways, relations)
    return {"nodes": nodes, "ways": ways, "relations": relations}


def _decode_block(block: bytes, nodes, ways, relations) -> None:
    strings: list[str] = []
    groups = []
    gran, lat_off, lon_off = GRANULARITY, 0, 0
    for f, _w, v in _fields(block):
        if f == 1:
            strings = [bytes(s).decode() for _f2, _w2, s in _fields(v) if _f2 == 1]
        elif f == 2:
            groups.append(v)
        elif f == 17:
            gran = v
        elif f == 19:
            lat_off = v
        elif f == 20:
            lon_off = v
    for g in groups:
        for f, _w, v in _fields(g):
            if f == 2:  # DenseNodes
                ids = lats = lons = []
                kv: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _undelta(_packed_sv(v2))
                    elif f2 == 8:
                        lats = _undelta(_packed_sv(v2))
                    elif f2 == 9:
                        lons = _undelta(_packed_sv(v2))
                    elif f2 == 10:
                        kv = _packed_uv(v2)
                tag_runs: list[dict] = []
                cur: dict = {}
                i = 0
                while i < len(kv):
                    if kv[i] == 0:
                        tag_runs.append(cur)
                        cur = {}
                        i += 1
                    else:
                        cur[strings[kv[i]]] = strings[kv[i + 1]]
                        i += 2
                for j, nid in enumerate(ids):
                    tags = tag_runs[j] if j < len(tag_runs) else {}
                    nodes.append(
                        (
                            nid,
                            lon_off + gran * lons[j],
                            lat_off + gran * lats[j],
                            tags,
                        )
                    )
            elif f == 1:  # plain Node
                nid = lat = lon = 0
                ks: list[int] = []
                vs: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _unzig(v2)
                    elif f2 == 2:
                        ks = _packed_uv(v2)
                    elif f2 == 3:
                        vs = _packed_uv(v2)
                    elif f2 == 8:
                        lat = _unzig(v2)
                    elif f2 == 9:
                        lon = _unzig(v2)
                nodes.append(
                    (
                        nid,
                        lon_off + gran * lon,
                        lat_off + gran * lat,
                        {strings[k]: strings[x] for k, x in zip(ks, vs)},
                    )
                )
            elif f == 3:  # Way
                wid = 0
                ks, vs, refs = [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        ks = _packed_uv(v2)
                    elif f2 == 3:
                        vs = _packed_uv(v2)
                    elif f2 == 8:
                        refs = _undelta(_packed_sv(v2))
                ways.append(
                    (wid, refs, {strings[k]: strings[x] for k, x in zip(ks, vs)})
                )
            elif f == 4:  # Relation
                rid = 0
                ks, vs, roles, memids, types = [], [], [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        ks = _packed_uv(v2)
                    elif f2 == 3:
                        vs = _packed_uv(v2)
                    elif f2 == 8:
                        roles = _packed_uv(v2)
                    elif f2 == 9:
                        memids = _undelta(_packed_sv(v2))
                    elif f2 == 10:
                        types = _packed_uv(v2)
                members = [
                    (MEMBER_TYPES[t], m, strings[r])
                    for t, m, r in zip(types, memids, roles)
                ]
                relations.append(
                    (rid, members, {strings[k]: strings[x] for k, x in zip(ks, vs)})
                )


# ---------------------------------------------------------------------------
# Spark readers
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

OSM_NODES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("node_id", T.LongType()),
        T.StructField("lon_nano", T.LongType()),
        T.StructField("lat_nano", T.LongType()),
        T.StructField("lon_milli", T.LongType()),  # floor(nano / 1e6): exact
        T.StructField("lat_milli", T.LongType()),
        T.StructField("lon", T.DoubleType()),  # nano / 1e9: operator-ready
        T.StructField("lat", T.DoubleType()),
        T.StructField("n_tags", T.IntegerType()),
        T.StructField("tags", T.StringType()),  # canonical "k=v\x1f..." sorted
    ]
)

OSM_WAYS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("way_id", T.LongType()),
        T.StructField("n_refs", T.IntegerType()),
        T.StructField("ref_first", T.LongType()),
        T.StructField("ref_last", T.LongType()),
        T.StructField("ref_sum", T.LongType()),
        T.StructField("refs", T.ArrayType(T.LongType())),
        T.StructField("tags", T.StringType()),
    ]
)

OSM_RELATIONS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("rel_id", T.LongType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("member_types", T.StringType()),  # e.g. "node,way"
        T.StructField("memid_sum", T.LongType()),
        T.StructField("roles", T.StringType()),
        T.StructField("tags", T.StringType()),
        # full member triples (needed by assemble_multipolygons)
        T.StructField("member_ids", T.ArrayType(T.LongType())),
        T.StructField("member_types_arr", T.ArrayType(T.StringType())),
        T.StructField("member_roles", T.ArrayType(T.StringType())),
    ]
)


def _tags_str(tags: dict) -> str:
    return "\x1f".join(f"{k}={tags[k]}" for k in sorted(tags))


def _reader(which: str, schema):
    def read(spark: SparkSession, glob: str) -> DataFrame:
        def kernel(batches):
            import pandas as pd

            for b in batches:
                rows = []
                for r in b.itertuples():
                    parsed = decode_osm_pbf(bytes(r.content))
                    if which == "nodes":
                        for nid, lon, lat, tags in parsed["nodes"]:
                            rows.append(
                                (
                                    r.path,
                                    nid,
                                    lon,
                                    lat,
                                    lon // 10**6,
                                    lat // 10**6,
                                    lon / 1e9,
                                    lat / 1e9,
                                    len(tags),
                                    _tags_str(tags),
                                )
                            )
                    elif which == "ways":
                        for wid, refs, tags in parsed["ways"]:
                            rows.append(
                                (
                                    r.path,
                                    wid,
                                    len(refs),
                                    refs[0] if refs else None,
                                    refs[-1] if refs else None,
                                    sum(refs),
                                    refs,
                                    _tags_str(tags),
                                )
                            )
                    else:
                        for rid, members, tags in parsed["relations"]:
                            rows.append(
                                (
                                    r.path,
                                    rid,
                                    len(members),
                                    ",".join(t for t, _, _ in members),
                                    sum(m for _, m, _ in members),
                                    ",".join(ro for _, _, ro in members),
                                    _tags_str(tags),
                                    [m for _, m, _ in members],
                                    [t for t, _, _ in members],
                                    [ro for _, _, ro in members],
                                )
                            )
                pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
                for f in schema.fields:
                    if isinstance(f.dataType, T.IntegerType):
                        pdf[f.name] = pdf[f.name].astype("int32")
                yield pdf

        files = spark.read.format("binaryFile").load(glob)
        return files.select("path", "content").mapInPandas(kernel, schema)

    return read


read_osm_nodes = _reader("nodes", OSM_NODES_SCHEMA)
read_osm_ways = _reader("ways", OSM_WAYS_SCHEMA)
read_osm_relations = _reader("relations", OSM_RELATIONS_SCHEMA)


def assemble_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Way node-refs → ordered vertex geometry — the reference's OSM
    feature-conversion step (extensions/cli/osm: ways resolve their node
    coordinates before becoming line/polygon features).

    Scale shape: posexplode the refs (one row per (way, ordinal, node)),
    ONE equi-join against the node table on node_id — the only big×big
    step; at planet scale both sides bucket/sort by node_id so this is
    the co-located join — then per-way reassembly via sort_array over
    (ordinal, vertex) structs.  The per-way array is bounded by OSM's
    2000-node way cap, so collect_list groups stay small regardless of
    data volume.  Nodes missing from the extract surface as
    ``complete = false`` (n_found < n_refs) instead of silently shorter
    geometry; ``closed`` comes from the ref ids (first == last), exact
    even when the boundary nodes are missing."""
    refs = ways.select(
        "way_id", F.posexplode("refs").alias("ord", "node_id")
    )
    j = refs.join(
        nodes.select("node_id", "lon_milli", "lat_milli", "lon", "lat"),
        "node_id",
    )
    agg = j.groupBy("way_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("ord", "lon", "lat", "lon_milli", "lat_milli")
            )
        ).alias("pts"),
        F.count(F.lit(1)).alias("n_found"),
        F.min("lon_milli").alias("minx_m"),
        F.min("lat_milli").alias("miny_m"),
        F.max("lon_milli").alias("maxx_m"),
        F.max("lat_milli").alias("maxy_m"),
    )
    out = agg.join(
        ways.select("way_id", "n_refs", "ref_first", "ref_last", "tags"),
        "way_id",
    )
    return out.select(
        "way_id",
        "tags",
        "n_refs",
        "ref_first",
        "ref_last",
        F.col("n_found").cast("int").alias("n_found"),
        (F.col("n_found") == F.col("n_refs")).alias("complete"),
        (
            (F.col("ref_first") == F.col("ref_last")) & (F.col("n_refs") >= 4)
        ).alias("closed"),
        F.transform("pts", lambda p: p["lon"]).alias("lons"),
        F.transform("pts", lambda p: p["lat"]).alias("lats"),
        "minx_m", "miny_m", "maxx_m", "maxy_m",
        (F.col("minx_m") / F.lit(1000.0)).alias("minx"),
        (F.col("miny_m") / F.lit(1000.0)).alias("miny"),
        (F.col("maxx_m") / F.lit(1000.0)).alias("maxx"),
        (F.col("maxy_m") / F.lit(1000.0)).alias("maxy"),
    )


_MP_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.LongType()),
        T.StructField("tags", T.StringType()),
        T.StructField("n_ways", T.IntegerType()),
        T.StructField("n_missing", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("n_outer", T.IntegerType()),
        T.StructField("n_inner", T.IntegerType()),
        T.StructField("complete", T.BooleanType()),  # all ways found + all rings closed
        T.StructField("minx_m", T.LongType()),
        T.StructField("miny_m", T.LongType()),
        T.StructField("maxx_m", T.LongType()),
        T.StructField("maxy_m", T.LongType()),
        # rings as arrays-of-arrays: lons/lats per ring, outer rings first
        T.StructField("ring_roles", T.ArrayType(T.StringType())),
        T.StructField("ring_lons", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("ring_lats", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def assemble_multipolygons(
    relations: DataFrame, assembled_ways: DataFrame
) -> DataFrame:
    """type=multipolygon relations → stitched rings (the reference's OSM
    relation feature conversion: outer/inner member WAYS chained
    end-to-end into closed rings).

    Scale shape: explode the relation's way members (role outer/inner),
    ONE equi-join against :func:`assemble_ways` output on way_id, then
    one ``applyInPandas`` stitch per relation — a relation's member set
    is tens-to-hundreds of ways (bounded by OSM practice), so the greedy
    endpoint-matching loop is per-group small no matter the data volume.
    Stitching matches way ENDPOINT NODE IDS (ref_first/ref_last),
    reversing a way when it chains backwards — coordinates never decide
    identity.  Missing member ways or unclosable chains surface as
    ``complete = false`` with the partial rings kept."""
    import numpy as np
    import pandas as pd

    mem = relations.filter(
        # exact tag match against the \x1f-joined canonical string — a
        # substring test would also hit e.g. "subtype=multipolygon"
        F.array_contains(F.split(F.col("tags"), "\x1f"), "type=multipolygon")
    ).select(
        "rel_id",
        F.col("tags").alias("rel_tags"),
        F.explode(
            F.arrays_zip(
                F.col("member_ids").alias("mid"),
                F.col("member_types_arr").alias("mtype"),
                F.col("member_roles").alias("mrole"),
            )
        ).alias("m"),
    ).filter(
        (F.col("m.mtype") == "way") & F.col("m.mrole").isin("outer", "inner")
    ).select(
        "rel_id", "rel_tags",
        F.col("m.mid").alias("way_id"), F.col("m.mrole").alias("role"),
    )
    j = mem.join(
        assembled_ways.select(
            "way_id", "ref_first", "ref_last", "complete",
            "lons", "lats", "minx_m", "miny_m", "maxx_m", "maxy_m",
        ),
        "way_id",
        "left",
    )

    def stitch(key, pdf):
        (rel_id,) = key
        rel_tags = pdf.iloc[0]["rel_tags"]
        found = pdf[pdf["ref_first"].notna()]
        n_missing = int(len(pdf) - len(found)) + int(
            (~found["complete"].astype(bool)).sum()
        )
        segs = [
            (
                int(r.ref_first), int(r.ref_last), str(r.role),
                list(r.lons), list(r.lats),
            )
            for r in found.itertuples()
            if bool(r.complete)
        ]
        rings, all_closed = [], True
        used = [False] * len(segs)
        for i in range(len(segs)):
            if used[i]:
                continue
            used[i] = True
            first, last, role, lons, lats = segs[i]
            roles = [role]
            while last != first:
                hit = None
                for k in range(len(segs)):
                    if used[k]:
                        continue
                    f2, l2, r2, lo2, la2 = segs[k]
                    if f2 == last:
                        hit = (k, l2, r2, lo2[1:], la2[1:])
                    elif l2 == last:
                        hit = (k, f2, r2, lo2[::-1][1:], la2[::-1][1:])
                    if hit:
                        break
                if hit is None:
                    all_closed = False
                    break
                k, last, r2, lo2, la2 = hit
                used[k] = True
                roles.append(r2)
                lons += lo2
                lats += la2
            # majority role of the constituent ways labels the ring
            rings.append(
                (max(set(roles), key=roles.count), lons, lats)
            )
        rings.sort(key=lambda r: (r[0] != "outer", len(r[1])))
        env = (None, None, None, None)
        if len(found):
            env = (
                int(found["minx_m"].min()), int(found["miny_m"].min()),
                int(found["maxx_m"].max()), int(found["maxy_m"].max()),
            )
        return pd.DataFrame(
            [
                (
                    rel_id, rel_tags, int(len(pdf)), n_missing,
                    len(rings),
                    sum(1 for r in rings if r[0] == "outer"),
                    sum(1 for r in rings if r[0] == "inner"),
                    bool(n_missing == 0 and all_closed and rings),
                    *env,
                    [r[0] for r in rings],
                    [r[1] for r in rings],
                    [r[2] for r in rings],
                )
            ],
            columns=[f.name for f in _MP_SCHEMA.fields],
        )

    _ = np  # numpy reserved for larger kernels; keep the import local-stable
    return j.groupBy("rel_id").applyInPandas(stitch, _MP_SCHEMA)
