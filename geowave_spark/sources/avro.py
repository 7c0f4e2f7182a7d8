"""Avro Object Container File codec + Spark reader (SURVEY §2.2; reference
extensions/formats/avro/AvroIngestPlugin.java ingests avro files of its
generic vector schema, and VectorLocalExportCommand exports to the same
container format).

Pure-python implementation of the PUBLIC Avro 1.x spec (binary encoding:
zigzag varints, little-endian floats; container: magic ``Obj\\x01`` +
metadata map + sync-delimited blocks, ``null``/``deflate`` codecs).  The
sandbox ships no spark-avro datasource jar, so this reader fills the gap
the same way the other format plugins do: one file per task via
``binaryFile`` + an Arrow-batched decode kernel.

Supported schema surface (what a vector/feature export needs): records of
primitives (null boolean int long float double bytes string), unions,
arrays, maps, enums, fixed — nested records flatten into dotted keys.
"""

from __future__ import annotations

import json
import struct
import zlib

AVRO_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zz_enc(n: int) -> bytes:
    """long → zigzag varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        shift = u = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)  # un-zigzag

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode()

    def value(self, schema):
        """Decode one datum of ``schema`` (parsed avro JSON schema)."""
        if isinstance(schema, list):  # union: long index + value
            return self.value(schema[self.long()])
        if isinstance(schema, str):
            t = schema
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            b = self.buf[self.pos]
            self.pos += 1
            return bool(b)
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            (v,) = struct.unpack_from("<f", self.buf, self.pos)
            self.pos += 4
            return v
        if t == "double":
            (v,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return v
        if t == "bytes":
            return self.bytes_()
        if t == "string":
            return self.string()
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "fixed":
            return self.raw(schema["size"])
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    self.long()
                for _ in range(n):
                    out.append(self.value(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.string()  # key first (RHS evaluates before target)
                    out[k] = self.value(schema["values"])
        if t == "record":
            return {f["name"]: self.value(f["type"]) for f in schema["fields"]}
        raise NotImplementedError(f"avro type {t!r}")


# python type → acceptable union branch types, most specific first (bool
# before int: bool is an int subclass; int may land in long/int/double)
_UNION_BRANCHES = [
    (type(None), ("null",)),
    (bool, ("boolean",)),
    (int, ("long", "int", "double", "float")),
    (float, ("double", "float")),
    (str, ("string", "enum")),
    ((bytes, bytearray), ("bytes", "fixed")),
    ((list, tuple), ("array",)),
    (dict, ("record", "map")),
]


def _encode_value(schema, v) -> bytes:
    if isinstance(schema, list):  # union: branch by the VALUE's type
        for py, bts in _UNION_BRANCHES:
            if isinstance(v, py):
                for want in bts:
                    for i, branch in enumerate(schema):
                        bt = branch if isinstance(branch, str) else branch["type"]
                        if bt == want:
                            return _zz_enc(i) + _encode_value(branch, v)
                break
        raise ValueError(
            f"no union branch in {schema!r} for value of type {type(v).__name__}"
        )
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return bytes([1 if v else 0])
    if t in ("int", "long"):
        return _zz_enc(int(v))
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "bytes":
        return _zz_enc(len(v)) + bytes(v)
    if t == "string":
        b = v.encode()
        return _zz_enc(len(b)) + b
    if t == "enum":
        return _zz_enc(schema["symbols"].index(v))
    if t == "fixed":
        return bytes(v)
    if t == "array":
        out = b""
        if v:
            out += _zz_enc(len(v))
            for item in v:
                out += _encode_value(schema["items"], item)
        return out + _zz_enc(0)
    if t == "map":
        out = b""
        if v:
            out += _zz_enc(len(v))
            for k, mv in v.items():
                kb = k.encode()
                out += _zz_enc(len(kb)) + kb + _encode_value(schema["values"], mv)
        return out + _zz_enc(0)
    if t == "record":
        return b"".join(
            _encode_value(f["type"], v[f["name"]]) for f in schema["fields"]
        )
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

_SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes is valid)


def avro_encode(schema: dict, records: list, codec: str = "null") -> bytes:
    """Records → Avro Object Container File bytes."""
    data = b"".join(_encode_value(schema, r) for r in records)
    if codec == "deflate":
        data = zlib.compress(data)[2:-4]  # raw deflate per spec
    elif codec != "null":
        raise NotImplementedError(f"codec {codec}")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(AVRO_MAGIC)
    out += _zz_enc(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zz_enc(len(kb)) + kb + _zz_enc(len(v)) + v
    out += _zz_enc(0)
    out += _SYNC
    if records:
        out += _zz_enc(len(records)) + _zz_enc(len(data)) + data + _SYNC
    return bytes(out)


def avro_decode(buf: bytes) -> tuple[dict, list]:
    """Avro Object Container File bytes → (schema, records)."""
    if buf[:4] != AVRO_MAGIC:
        raise ValueError("not an avro container (bad magic)")
    r = _Reader(buf, 4)
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()  # key BEFORE value: dict-assign evaluates RHS first
            meta[k] = r.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.raw(16)
    records = []
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(br.value(schema))
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

AVRO_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("recno", T.IntegerType()),
        T.StructField("record_json", T.StringType()),
    ]
)


def read_avro(spark: SparkSession, glob: str) -> DataFrame:
    """Avro container files → one row per record, the record as a JSON
    string column (same schema-on-read posture as the shapefile reader:
    callers apply ``from_json`` with the schema they expect — avro schemas
    vary per file, which is exactly GeoWave's per-adapter typing problem)."""

    def kernel(batches):
        import pandas as pd

        def jsonable(v):
            if isinstance(v, (bytes, bytearray)):
                return v.hex()
            if isinstance(v, dict):
                return {k: jsonable(x) for k, x in v.items()}
            if isinstance(v, list):
                return [jsonable(x) for x in v]
            return v

        for b in batches:
            rows = []
            for r in b.itertuples():
                _, records = avro_decode(bytes(r.content))
                for i, rec in enumerate(records):
                    rows.append((r.path, i, json.dumps(jsonable(rec))))
            pdf = pd.DataFrame(rows, columns=["file", "recno", "record_json"])
            pdf["recno"] = pdf["recno"].astype("int32")
            yield pdf

    files = spark.read.format("binaryFile").load(glob)
    return files.select("path", "content").mapInPandas(kernel, AVRO_ROW_SCHEMA)
