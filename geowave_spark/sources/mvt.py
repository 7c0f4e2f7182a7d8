"""Mapbox Vector Tile (MVT 2.1) codec — pure python, zero dependencies.

The reference serves rendered map output through its GeoServer plugin
(`extensions/cli/geoserver/`, DistributedRenderProcess partials composited
server-side); the modern equivalent of that serving surface is VECTOR
tiles — per-tile protobuf payloads a browser styles client-side.  This
module is the wire codec (spec: github.com/mapbox/vector-tile-spec, 2.1);
`operators/mvt.py` is the distributed encode over the tile pyramid.

Same design rules as the other in-repo codecs (avro.py, tiff.py, osm.py):
encode AND decode implemented so every byte path is round-trip-testable
in-sandbox; golden vectors from the public spec pin the geometry command
encoding (point (25,17) → [9, 50, 34]).

Wire shape (proto2, all field numbers from vector_tile.proto):

    Tile:    repeated Layer = 3
    Layer:   version = 15 (uint, must be 2), name = 1 (string),
             features = 2, keys = 3 (string), values = 4 (Value),
             extent = 5 (uint, default 4096)
    Feature: id = 1 (uint64), tags = 2 (packed uint32 key/value index
             pairs), type = 3 (enum 1=POINT 2=LINESTRING 3=POLYGON),
             geometry = 4 (packed uint32 command stream)
    Value:   exactly one of string=1, float=2, double=3, int=4,
             uint=5, sint=6, bool=7

Geometry command stream: CommandInteger = (id & 0x7) | (count << 3) with
id MoveTo=1 / LineTo=2 / ClosePath=7; parameters are zigzag-encoded
deltas from a cursor that persists across a feature's rings.
"""

from __future__ import annotations

import struct

from geowave_spark.sources.osm import (  # shared protobuf primitives
    _fields,
    _msg,
    _packed_uv,
    _read_uv,
    _unzig,
    _uv,
    _vint,
)

MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7
POINT, LINESTRING, POLYGON = 1, 2, 3
DEFAULT_EXTENT = 4096

# varint fast path: geometry parameters are zigzagged tile-local coords
# (< 2·extent) and tag indices are table offsets — all < 2^14, so one
# precomputed table covers the hot encode loop (~0.5 MB, built once)
_UV_TABLE = None


def _uv_fast(n: int) -> bytes:
    global _UV_TABLE
    if _UV_TABLE is None:
        _UV_TABLE = [_uv(i) for i in range(16384)]
    return _UV_TABLE[n] if 0 <= n < 16384 else _uv(n)


def _zig(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


# ---------------------------------------------------------------------------
# geometry command streams
# ---------------------------------------------------------------------------


def geom_point(coords: list[tuple[int, int]]) -> list[int]:
    """(Multi)point: ONE MoveTo with count = n, cursor-delta params."""
    out = [_cmd(MOVE_TO, len(coords))]
    cx = cy = 0
    for x, y in coords:
        out += [_zig(x - cx), _zig(y - cy)]
        cx, cy = x, y
    return out


def geom_linestring(lines: list[list[tuple[int, int]]]) -> list[int]:
    """(Multi)linestring: per part MoveTo(1) + LineTo(n-1); the cursor
    persists across parts (spec §4.3.5.3)."""
    out: list[int] = []
    cx = cy = 0
    for pts in lines:
        if len(pts) < 2:
            raise ValueError("linestring part needs >= 2 points")
        out.append(_cmd(MOVE_TO, 1))
        out += [_zig(pts[0][0] - cx), _zig(pts[0][1] - cy)]
        cx, cy = pts[0]
        out.append(_cmd(LINE_TO, len(pts) - 1))
        for x, y in pts[1:]:
            out += [_zig(x - cx), _zig(y - cy)]
            cx, cy = x, y
    return out


def geom_polygon(rings: list[list[tuple[int, int]]]) -> list[int]:
    """Polygon rings (exterior CW in tile/screen coords, interiors CCW —
    caller's responsibility): per ring MoveTo(1) + LineTo(n-1) +
    ClosePath; the closing vertex is NOT repeated."""
    out: list[int] = []
    cx = cy = 0
    for pts in rings:
        if len(pts) < 3:
            raise ValueError("polygon ring needs >= 3 distinct vertices")
        out.append(_cmd(MOVE_TO, 1))
        out += [_zig(pts[0][0] - cx), _zig(pts[0][1] - cy)]
        cx, cy = pts[0]
        out.append(_cmd(LINE_TO, len(pts) - 1))
        for x, y in pts[1:]:
            out += [_zig(x - cx), _zig(y - cy)]
            cx, cy = x, y
        out.append(_cmd(CLOSE_PATH, 1))
    return out


def decode_geometry(stream: list[int], geom_type: int):
    """Command stream → list of parts, each a list of absolute (x, y)."""
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(stream):
        c = stream[i]
        i += 1
        cmd_id, count = c & 0x7, c >> 3
        if cmd_id == MOVE_TO:
            for _ in range(count):
                cx += _unzig(stream[i]); cy += _unzig(stream[i + 1])
                i += 2
                if geom_type == POINT:
                    parts.append([(cx, cy)])
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(cx, cy)]
        elif cmd_id == LINE_TO:
            for _ in range(count):
                cx += _unzig(stream[i]); cy += _unzig(stream[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == CLOSE_PATH:
            if count != 1:
                raise ValueError("ClosePath count must be 1")
        else:
            raise ValueError(f"unknown geometry command {cmd_id}")
    if cur:
        parts.append(cur)
    return parts


# ---------------------------------------------------------------------------
# Value messages (typed attributes)
# ---------------------------------------------------------------------------


def _enc_value(v) -> bytes:
    if isinstance(v, bool):
        return _vint(7, 1 if v else 0)
    if isinstance(v, str):
        return _msg(1, v.encode("utf-8"))
    if isinstance(v, int):
        return _uv((6 << 3)) + _uv(_zig(v))  # sint64: zigzag varint
    if isinstance(v, float):
        return _uv((3 << 3) | 1) + struct.pack("<d", v)
    raise TypeError(f"unsupported MVT value type {type(v).__name__}")


def _dec_value(buf: bytes):
    for field, wire, v in _fields(buf):
        if field == 1:
            return v.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 4:
            # int64: external encoders emit negatives as 10-byte
            # two's-complement varints — fold back to signed
            return v - (1 << 64) if v >= (1 << 63) else v
        if field == 5:
            return v  # uint64: raw
        if field == 6:
            return _unzig(v)
        if field == 7:
            return bool(v)
    raise ValueError("empty MVT Value message")


# ---------------------------------------------------------------------------
# tile encode / decode
# ---------------------------------------------------------------------------


def encode_tile(layers: dict, extent: int = DEFAULT_EXTENT) -> bytes:
    """``layers`` maps name → list of feature dicts
    ``{id: int, type: POINT|LINESTRING|POLYGON, geometry: [cmd ints],
    tags: {str: str|int|float|bool}}``.  Key/value tables are built in
    first-seen order (deterministic given deterministic feature order —
    callers sort features by id)."""
    out = bytearray()
    for name, feats in layers.items():
        keys: dict[str, int] = {}
        vals: dict[tuple, int] = {}
        val_bytes: list[bytes] = []
        body = bytearray()
        body += _vint(15, 2)
        body += _msg(1, name.encode("utf-8"))
        for f in feats:
            tag_ixs: list[int] = []
            for k, v in f.get("tags", {}).items():
                if k not in keys:
                    keys[k] = len(keys)
                vk = (type(v).__name__, v)
                if vk not in vals:
                    vals[vk] = len(vals)
                    val_bytes.append(_enc_value(v))
                tag_ixs += [keys[k], vals[vk]]
            fbody = bytearray()
            if "id" in f:
                fbody += _vint(1, int(f["id"]))
            if tag_ixs:
                fbody += _msg(2, b"".join(_uv_fast(t) for t in tag_ixs))
            fbody += _vint(3, f["type"])
            fbody += _msg(4, b"".join(_uv_fast(g) for g in f["geometry"]))
            body += _msg(2, bytes(fbody))
        for k in keys:
            body += _msg(3, k.encode("utf-8"))
        for vb in val_bytes:
            body += _msg(4, vb)
        body += _vint(5, extent)
        out += _msg(3, bytes(body))
    return bytes(out)


def decode_tile(buf: bytes) -> dict:
    """bytes → {layer_name: {extent, version, features: [...]}} with each
    feature ``{id, type, parts: [[(x, y), ...]], tags: {k: v}}``."""
    layers: dict = {}
    for field, wire, lbuf in _fields(buf):
        if field != 3:
            continue
        name, extent, version = "", DEFAULT_EXTENT, None
        keys: list[str] = []
        vals: list = []
        raw_feats: list[bytes] = []
        for f2, w2, v2 in _fields(lbuf):
            if f2 == 15:
                version = v2
            elif f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                raw_feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                vals.append(_dec_value(v2))
            elif f2 == 5:
                extent = v2
        if version != 2:
            raise ValueError(f"MVT layer {name!r}: unsupported version {version}")
        feats = []
        for fb in raw_feats:
            fid, ftype, tags, stream = None, None, {}, []
            for f3, w3, v3 in _fields(fb):
                if f3 == 1:
                    fid = v3
                elif f3 == 2:
                    ixs = _packed_uv(v3)
                    for j in range(0, len(ixs), 2):
                        tags[keys[ixs[j]]] = vals[ixs[j + 1]]
                elif f3 == 3:
                    ftype = v3
                elif f3 == 4:
                    stream = _packed_uv(v3)
            feats.append({
                "id": fid, "type": ftype, "tags": tags,
                "parts": decode_geometry(stream, ftype),
            })
        layers[name] = {"extent": extent, "version": 2, "features": feats}
    return layers


__all__ = [
    "POINT", "LINESTRING", "POLYGON", "DEFAULT_EXTENT",
    "geom_point", "geom_linestring", "geom_polygon", "decode_geometry",
    "encode_tile", "decode_tile",
]
