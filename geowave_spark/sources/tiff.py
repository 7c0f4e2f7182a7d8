"""Baseline GeoTIFF codec + Spark reader — the GeoTools-raster ingest
format (SURVEY §2.2; reference
extensions/formats/geotools-raster/.../GeoToolsRasterDataStoreIngestPlugin.java
wraps any GridCoverage reader, GeoTIFF first among them; the Landsat8 CLI
ingests per-band GeoTIFF scenes, RasterIngestRunner.java:77-300).

Pure struct/numpy implementation of the PUBLIC specs (TIFF 6.0:
little/big-endian IFDs, 8-bit samples, strip layouts; GeoTIFF 1.1
georeferencing tags ModelPixelScale 33550 + ModelTiepoint 33922) — the same
dependency-free posture as sources/png.py.  Compression codecs implemented
per TIFF 6.0 §7 (PackBits, 32773), §13 (LZW with the spec's early-change
code widths, 5) and the Adobe/old Deflate extensions (8 / 32946, zlib
streams), each with the horizontal-differencing Predictor (tag 317 = 2)
real Landsat/earth-observation scenes ship with; both the strip and the
tiled (§15, COG-style) layouts; 8- and 16-bit unsigned samples (real
Landsat Level-1 is 16-bit).  JPEG-in-TIFF, other sample depths and
planar-separate files still raise NotImplementedError with a clear
message — exactly where a deployment slots in rasterio/GDAL.

Spark shape: one file per task (binaryFile scan + Arrow-batched decode),
yielding georeferenced raster rows (pixels + envelope) that feed the
existing tiling operators (assign_tiles / render_tiles) — a GeoTIFF ingest
is "read_geotiff → tile pyramid", the RasterDataAdapter path.
"""

from __future__ import annotations

import struct

import numpy as np

_T_SHORT, _T_LONG, _T_DOUBLE, _T_LONG8 = 3, 4, 12, 16
_SZ = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8, _T_LONG8: 8}
_FMT_OF = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d", _T_LONG8: "Q"}

TAG_SUBFILE = 254  # NewSubfileType: bit 0 = reduced-resolution (overview)
TAG_WIDTH, TAG_HEIGHT, TAG_BITS, TAG_COMPRESSION = 256, 257, 258, 259
TAG_PHOTOMETRIC, TAG_STRIP_OFFSETS, TAG_SAMPLES = 262, 273, 277
TAG_ROWS_PER_STRIP, TAG_STRIP_COUNTS, TAG_PLANAR = 278, 279, 284
TAG_PREDICTOR = 317
TAG_TILE_WIDTH, TAG_TILE_LENGTH = 322, 323
TAG_TILE_OFFSETS, TAG_TILE_COUNTS = 324, 325
TAG_SAMPLE_FORMAT = 339
TAG_MODEL_PIXEL_SCALE, TAG_MODEL_TIEPOINT = 33550, 33922
TAG_GEO_KEYS = 34735  # GeoKeyDirectory (GeoTIFF 1.1 §7.1)

# GeoKey ids (GeoTIFF 1.1 public spec)
GKEY_MODEL_TYPE = 1024       # 1 = projected, 2 = geographic
GKEY_GEOGRAPHIC_CS = 2048    # EPSG geographic code (e.g. 4326)
GKEY_PROJECTED_CS = 3072     # EPSG projected code (e.g. 32633 = UTM 33N)

COMP_NONE, COMP_LZW, COMP_DEFLATE = 1, 5, 8
COMP_PACKBITS, COMP_DEFLATE_OLD = 32773, 32946


# ---------------------------------------------------------------------------
# Strip codecs (TIFF 6.0 §7 PackBits, §13 LZW; Adobe deflate extension)
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12 bit
    codes with the spec's EARLY code-width change (the width grows when
    the table reaches 2^width - 1 entries, one code earlier than plain
    LZW), Clear=256 / EndOfInformation=257."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def _reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    _reset()
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            _reset()
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table is one entry
        # BEHIND the encoder's (the encoder adds before emitting the next
        # code, the decoder adds while consuming it), so it must widen at
        # 2^w - 2 where the encoder widened at 2^w - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (mirror of :func:`_lzw_decode`): emits
    Clear first, clears when the table would exceed 12 bits (at 4094 —
    one before 2^12 - 1, keeping reader/writer early-change symmetric),
    EOI last."""
    out = bytearray()
    acc = 0
    accbits = 0

    def _emit(code: int, width: int):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    _emit(_LZW_CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        _emit(table[run], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        elif nxt == 4094:  # table full at 12 bits: clear and restart
            _emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([b])
    if run:
        _emit(table[run], width)
    _emit(_LZW_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 §7 PackBits: n in [0,127] → copy n+1 literal bytes;
    n in [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i : i + 1] * (1 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of ≥3 as replicate packets, else literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run: until the next ≥3 repeat or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _deflate_decode(data: bytes) -> bytes:
    import zlib

    return zlib.decompress(data)


def _deflate_encode(data: bytes) -> bytes:
    import zlib

    return zlib.compress(data, 6)


_STRIP_DECODERS = {
    COMP_NONE: lambda b: b,
    COMP_LZW: _lzw_decode,
    COMP_DEFLATE: _deflate_decode,
    COMP_DEFLATE_OLD: _deflate_decode,
    COMP_PACKBITS: _packbits_decode,
}
_STRIP_ENCODERS = {
    COMP_NONE: lambda b: b,
    COMP_LZW: _lzw_encode,
    COMP_DEFLATE: _deflate_encode,
    COMP_DEFLATE_OLD: _deflate_encode,
    COMP_PACKBITS: _packbits_encode,
}


def _diff_rows(pix: np.ndarray) -> np.ndarray:
    """Horizontal-differencing predictor (tag 317 = 2), forward.  Operates
    on SAMPLE VALUES (mod 2^bits — for 16-bit samples the differencing is
    on the 16-bit words, not the bytes, per TIFF 6.0 §14)."""
    mod = 1 << (8 * pix.itemsize)
    body = pix.astype(np.int64)
    body[:, 1:, :] = (body[:, 1:, :] - body[:, :-1, :]) % mod
    return body.astype(pix.dtype)


def _undiff_rows(pix: np.ndarray) -> np.ndarray:
    """Horizontal-differencing predictor, inverse (per-row cumsum mod
    2^bits).  Applied per decompression chunk: each strip/tile restarts
    the accumulator at its own first column (TIFF 6.0 §14)."""
    mod = 1 << (8 * pix.itemsize)
    return (np.cumsum(pix, axis=1, dtype=np.int64) % mod).astype(pix.dtype)


def encode_geotiff(
    pix: np.ndarray,
    origin: tuple[float, float],
    scale: tuple[float, float],
    compression: int = COMP_NONE,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    tile_size: tuple[int, int] | None = None,
    byteorder: str = "II",
    epsg: int | None = None,
    bigtiff: bool = False,
    overviews: list[np.ndarray] | None = None,
) -> bytes:
    """uint8/uint16 raster (h,w) or (h,w,bands) → GeoTIFF bytes.

    ``origin`` = (lon, lat) of the TOP-LEFT corner (raster space 0,0 —
    GeoTIFF tiepoint convention), ``scale`` = (deg/px east, deg/px south),
    both positive.  Chunky planar layout; ``compression`` ∈ {1 none,
    5 LZW, 8/32946 deflate, 32773 packbits}; ``predictor=2`` applies
    horizontal differencing before compression (the layout real Landsat
    scenes use); ``byteorder`` 'II' little / 'MM' big.  uint16 input
    writes BitsPerSample=16 with sample bytes in the file's byte order —
    the layout actual Landsat Level-1 band files use.

    ``tile_size`` = (tile_width, tile_height) switches to the TILED
    layout (TIFF 6.0 §15, tags 322-325 — the cloud-optimized-GeoTIFF /
    Landsat internal blocking): the raster is cut into fixed tiles in
    row-major tile order, right/bottom edge tiles zero-padded to full
    size as the spec requires; dims must be multiples of 16.

    ``bigtiff=True`` writes the BigTIFF variant (magic 43: 8-byte
    offsets, 20-byte IFD entries, LONG8 chunk offsets — the public
    64-bit extension real >4 GB scenes/COGs use).  ``overviews`` =
    reduced-resolution rasters appended as chained IFDs flagged
    NewSubfileType=1 (the COG overview-pyramid layout); read them back
    with ``decode_geotiff(buf, ifd=i)``."""
    if compression not in _STRIP_ENCODERS:
        raise ValueError(f"unsupported compression {compression}")
    if byteorder not in ("II", "MM"):
        raise ValueError("byteorder must be 'II' or 'MM'")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    e = "<" if byteorder == "II" else ">"
    images = [pix] + list(overviews or [])
    hdr_len = 16 if bigtiff else 8

    cursor = hdr_len
    datas: list[bytes] = []
    image_tags: list[list[tuple[int, int, list]]] = []
    for lvl, img in enumerate(images):
        if img.dtype == np.uint8:
            bits = 8
        elif img.dtype == np.uint16:
            bits = 16
        else:
            raise ValueError("encoder writes 8- or 16-bit unsigned samples")
        # sample bytes follow the FILE byte order (TIFF 6.0: multi-byte
        # samples are stored in the header's byte order)
        sdt = np.uint8 if bits == 8 else np.dtype(e + "u2")
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, bands = img.shape
        enc = _STRIP_ENCODERS[compression]
        rps = None
        if tile_size is not None:
            tw, th = tile_size
            if tw % 16 or th % 16 or tw <= 0 or th <= 0:
                raise ValueError(
                    "TIFF tile dimensions must be positive multiples of 16"
                )
            ta, td = -(-w // tw), -(-h // th)
            padded = np.zeros((td * th, ta * tw, bands), img.dtype)
            padded[:h, :w] = img  # pad BEFORE predictor: decode undoes per tile
            chunks = []
            for r in range(td):
                for c in range(ta):
                    t = padded[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
                    if predictor == 2:
                        t = _diff_rows(t)
                    chunks.append(enc(t.astype(sdt).tobytes()))
        else:
            if predictor == 2:
                img = _diff_rows(img)
            rps = h if rows_per_strip is None else int(rows_per_strip)
            chunks = [
                enc(img[r : r + rps].astype(sdt).tobytes())
                for r in range(0, h, rps)
            ]
        offsets, counts = [], []
        for s in chunks:
            offsets.append(cursor)
            counts.append(len(s))
            cursor += len(s)
        datas.append(b"".join(chunks))

        off_t = _T_LONG8 if bigtiff else _T_LONG
        tags: list[tuple[int, int, list]] = []
        if lvl > 0:  # overview IFDs: reduced-resolution subfile, no georef
            tags.append((TAG_SUBFILE, _T_LONG, [1]))
        tags += [
            (TAG_WIDTH, _T_LONG, [w]),
            (TAG_HEIGHT, _T_LONG, [h]),
            (TAG_BITS, _T_SHORT, [bits] * bands),
            (TAG_COMPRESSION, _T_SHORT, [compression]),
            (TAG_PHOTOMETRIC, _T_SHORT, [2 if bands >= 3 else 1]),
        ]
        if tile_size is None:
            tags.append((TAG_STRIP_OFFSETS, off_t, offsets))
        tags.append((TAG_SAMPLES, _T_SHORT, [bands]))
        if tile_size is None:
            tags.append((TAG_ROWS_PER_STRIP, _T_LONG, [rps]))
            tags.append((TAG_STRIP_COUNTS, _T_LONG, counts))
        tags.append((TAG_PLANAR, _T_SHORT, [1]))
        tags.append((TAG_PREDICTOR, _T_SHORT, [predictor]))
        if tile_size is not None:
            tags.append((TAG_TILE_WIDTH, _T_LONG, [tile_size[0]]))
            tags.append((TAG_TILE_LENGTH, _T_LONG, [tile_size[1]]))
            tags.append((TAG_TILE_OFFSETS, off_t, offsets))
            tags.append((TAG_TILE_COUNTS, _T_LONG, counts))
        tags.append((TAG_SAMPLE_FORMAT, _T_SHORT, [1] * bands))
        if lvl == 0:
            tags += [
                (
                    TAG_MODEL_PIXEL_SCALE,
                    _T_DOUBLE,
                    [float(scale[0]), float(scale[1]), 0.0],
                ),
                (
                    TAG_MODEL_TIEPOINT,
                    _T_DOUBLE,
                    [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0],
                ),
            ]
            if epsg is not None:
                # GeoKeyDirectory (GeoTIFF 1.1 §7.1): version header +
                # inline SHORT keys; geographic CRS → GeographicTypeGeoKey,
                # projected (UTM — real Landsat) → ProjectedCSTypeGeoKey
                geographic = epsg == 4326
                gkeys = [1, 1, 0, 2, GKEY_MODEL_TYPE, 0, 1,
                         2 if geographic else 1]
                gkeys += [
                    GKEY_GEOGRAPHIC_CS if geographic else GKEY_PROJECTED_CS,
                    0, 1, epsg,
                ]
                tags.append((TAG_GEO_KEYS, _T_SHORT, gkeys))
        # IFD entries MUST be sorted by tag (TIFF 6.0); the lists above are
        # in tag order by construction for every layout combination
        image_tags.append(tags)

    ifds = _render_ifds(e, bigtiff, image_tags, cursor)
    first_extras, _ = _ifd_sizes(bigtiff, image_tags[0])
    first_ifd_off = cursor + first_extras  # IFD0 sits after its own extras
    if bigtiff:
        # BigTIFF header: magic 43, offset size 8, pad 0, 8-byte IFD offset
        head = struct.pack(
            e + "2sHHHQ", byteorder.encode(), 43, 8, 0, first_ifd_off
        )
    else:
        head = struct.pack(e + "2sHI", byteorder.encode(), 42, first_ifd_off)
    return head + b"".join(datas) + ifds


def _ifd_sizes(big: bool, tags: list[tuple[int, int, list]]) -> tuple[int, int]:
    """(out-of-line extras length incl. even padding, IFD block length)."""
    inline = 8 if big else 4
    entry_sz = 20 if big else 12
    extras_len = 0
    for _tag, typ, values in tags:
        plen = _SZ[typ] * len(values)
        if plen > inline:
            extras_len += plen + (plen % 2)
    ifd_len = (
        (8 + entry_sz * len(tags) + 8) if big else (2 + entry_sz * len(tags) + 4)
    )
    return extras_len, ifd_len


def _render_ifds(
    e: str, big: bool, image_tags: list[list[tuple[int, int, list]]], data_end: int
) -> bytes:
    """Render the IFD chain (one IFD per image, each preceded by its
    out-of-line value area) starting at ``data_end``.  Two-phase: sizes
    are closed-form (so every next-IFD pointer and payload offset is known
    before a byte is written), then everything is materialized."""
    inline = 8 if big else 4
    placements, pos = [], data_end
    for tags in image_tags:
        extras_len, ifd_len = _ifd_sizes(big, tags)
        placements.append((pos, extras_len))
        pos += extras_len + ifd_len
    out = bytearray()
    for i, tags in enumerate(image_tags):
        base, extras_len = placements[i]
        next_off = 0
        if i + 1 < len(image_tags):
            nb, nel = placements[i + 1]
            next_off = nb + nel  # the next IFD sits after ITS extras
        extras = bytearray()
        entries = []
        for tag, typ, values in tags:
            payload = b"".join(struct.pack(e + _FMT_OF[typ], v) for v in values)
            head = struct.pack(
                e + ("HHQ" if big else "HHI"), tag, typ, len(values)
            )
            if len(payload) <= inline:
                entries.append(head + payload.ljust(inline, b"\x00"))
            else:
                off = base + len(extras)
                extras.extend(payload)
                if len(extras) % 2:
                    extras.append(0)
                entries.append(head + struct.pack(e + ("Q" if big else "I"), off))
        if big:
            ifd = (
                struct.pack(e + "Q", len(entries))
                + b"".join(entries)
                + struct.pack(e + "Q", next_off)
            )
        else:
            ifd = (
                struct.pack(e + "H", len(entries))
                + b"".join(entries)
                + struct.pack(e + "I", next_off)
            )
        out += bytes(extras) + ifd
    return bytes(out)


def _tiff_header(buf: bytes) -> tuple[str, bool, int]:
    """→ (endianness char, is_bigtiff, first IFD offset).  Accepts both
    classic (magic 42) and BigTIFF (magic 43) headers."""
    bom = buf[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(e + "H", buf, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
        return e, False, ifd_off
    if magic == 43:
        osize, pad = struct.unpack_from(e + "HH", buf, 4)
        if osize != 8 or pad != 0:
            raise ValueError(f"bad BigTIFF header (offset size {osize})")
        (ifd_off,) = struct.unpack_from(e + "Q", buf, 8)
        return e, True, ifd_off
    raise ValueError("not a TIFF (bad magic)")


def _read_ifd_at(
    buf: bytes, e: str, big: bool, ifd_off: int
) -> tuple[dict[int, list], int]:
    """One IFD at ``ifd_off`` → ({tag: values}, next-IFD offset or 0)."""
    if big:
        (n,) = struct.unpack_from(e + "Q", buf, ifd_off)
        entry_base, entry_sz, inline = ifd_off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(e + "H", buf, ifd_off)
        entry_base, entry_sz, inline = ifd_off + 2, 12, 4
    tags: dict[int, list] = {}
    for k in range(n):
        off = entry_base + entry_sz * k
        if big:
            tag, typ = struct.unpack_from(e + "HH", buf, off)
            (count,) = struct.unpack_from(e + "Q", buf, off + 4)
            vfield = off + 12
        else:
            tag, typ, count = struct.unpack_from(e + "HHI", buf, off)
            vfield = off + 8
        if typ not in _SZ:
            continue  # rational/ascii tags: not needed for baseline decode
        size = _SZ[typ] * count
        voff = (
            vfield
            if size <= inline
            else struct.unpack_from(e + ("Q" if big else "I"), buf, vfield)[0]
        )
        tags[tag] = list(
            struct.unpack_from(e + str(count) + _FMT_OF[typ], buf, voff)
        )
    next_off_pos = entry_base + entry_sz * n
    (next_off,) = struct.unpack_from(e + ("Q" if big else "I"), buf, next_off_pos)
    return tags, next_off


def _parse_ifd(buf: bytes, index: int = 0) -> tuple[str, dict[int, list]]:
    """TIFF header + the ``index``-th IFD of the chain → (endianness char,
    {tag: values}).  index 0 = the full-resolution image; higher indexes
    are chained subfiles (COG overview levels)."""
    e, big, ifd_off = _tiff_header(buf)
    for _ in range(index):
        _, ifd_off = _read_ifd_at(buf, e, big, ifd_off)
        if ifd_off == 0:
            raise IndexError(f"TIFF has no IFD #{index}")
    tags, _ = _read_ifd_at(buf, e, big, ifd_off)
    return e, tags


def geotiff_ifd_count(buf: bytes) -> int:
    """Number of chained IFDs (1 + overview levels)."""
    e, big, ifd_off = _tiff_header(buf)
    n = 0
    while ifd_off:
        _, ifd_off = _read_ifd_at(buf, e, big, ifd_off)
        n += 1
    return n


def geotiff_epsg(buf: bytes) -> int | None:
    """EPSG code from the GeoKeyDirectory (tag 34735), or None.

    Reads ProjectedCSTypeGeoKey (3072) for projected scenes (real Landsat
    is UTM — EPSG:326xx) and GeographicTypeGeoKey (2048) for geographic
    ones; only inline SHORT values are consulted (codes always are)."""
    _, tags = _parse_ifd(buf)
    gk = tags.get(TAG_GEO_KEYS)
    if not gk or len(gk) < 4:
        return None
    keys = {}
    n_keys = gk[3]
    for i in range(1, n_keys + 1):
        base = 4 * i
        if base + 4 > len(gk):
            break
        kid, loc, cnt, val = gk[base : base + 4]
        if loc == 0:  # inline SHORT value
            keys[kid] = val
    model = keys.get(GKEY_MODEL_TYPE)
    if model == 1:
        return keys.get(GKEY_PROJECTED_CS)
    if model == 2:
        return keys.get(GKEY_GEOGRAPHIC_CS)
    return keys.get(GKEY_PROJECTED_CS) or keys.get(GKEY_GEOGRAPHIC_CS)


def decode_geotiff(
    buf: bytes,
    ifd: int = 0,
) -> tuple[np.ndarray, tuple[float, float] | None, tuple[float, float] | None]:
    """GeoTIFF bytes → (pixels (h,w) or (h,w,bands) uint8/uint16, origin,
    scale).

    Handles both byte orders, multi-strip AND tiled layouts (TIFF 6.0
    §15 tags 322-325 — the cloud-optimized-GeoTIFF / Landsat internal
    blocking; edge tiles are stored full-size and cropped here), 8- and
    16-bit unsigned samples (16-bit is real Landsat Level-1 — sample
    words follow the file byte order, output is native uint16), inline
    and out-of-line values, LZW/deflate/packbits chunks,
    horizontal-differencing predictor (undone per chunk on sample
    values — each strip or tile restarts the accumulator).  Raises
    NotImplementedError for JPEG-in-TIFF / other depths /
    planar-separate."""
    e, tags = _parse_ifd(buf, ifd)
    comp = tags.get(TAG_COMPRESSION, [1])[0]
    if comp not in _STRIP_DECODERS:
        raise NotImplementedError(
            f"unsupported TIFF compression {comp} (have: none/LZW/deflate/"
            "packbits) — plug in rasterio/GDAL for JPEG-in-TIFF etc."
        )
    bits_list = tags.get(TAG_BITS, [8])
    if len(set(bits_list)) != 1 or bits_list[0] not in (8, 16):
        raise NotImplementedError(
            f"unsupported BitsPerSample {bits_list} — uniform 8- or 16-bit "
            "unsigned samples only (16-bit is the real Landsat Level-1 depth)"
        )
    bits = bits_list[0]
    predictor = tags.get(TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"unsupported TIFF predictor {predictor}")

    if tags.get(TAG_PLANAR, [1])[0] != 1:
        raise NotImplementedError(
            "planar-separate (PlanarConfiguration=2) TIFF not supported — "
            "chunky interleaved only"
        )
    w, h = tags[TAG_WIDTH][0], tags[TAG_HEIGHT][0]
    bands = tags.get(TAG_SAMPLES, [1])[0]
    # sample bytes are in the FILE byte order; normalized to native below
    sdt = np.uint8 if bits == 8 else np.dtype(e + "u2")
    dec = _STRIP_DECODERS[comp]
    if TAG_TILE_OFFSETS in tags:  # tiled layout (tags 322-325)
        tw, th = tags[TAG_TILE_WIDTH][0], tags[TAG_TILE_LENGTH][0]
        ta, td = -(-w // tw), -(-h // th)
        offs, cnts = tags[TAG_TILE_OFFSETS], tags[TAG_TILE_COUNTS]
        if len(offs) != ta * td:
            raise ValueError(
                f"tile count {len(offs)} != grid {ta}x{td} for {w}x{h} "
                f"raster with {tw}x{th} tiles"
            )
        full = np.zeros((td * th, ta * tw, bands), sdt)
        for i, (o, c) in enumerate(zip(offs, cnts)):
            t = np.frombuffer(
                dec(buf[o : o + c]), dtype=sdt, count=tw * th * bands
            ).reshape(th, tw, bands)
            if predictor == 2:
                t = _undiff_rows(t)
            r, cx = divmod(i, ta)
            full[r * th : (r + 1) * th, cx * tw : (cx + 1) * tw] = t
        pix = full[:h, :w]
    else:
        strips = b"".join(
            dec(buf[o : o + c])
            for o, c in zip(tags[TAG_STRIP_OFFSETS], tags[TAG_STRIP_COUNTS])
        )
        pix = np.frombuffer(strips, dtype=sdt, count=w * h * bands).reshape(
            h, w, bands
        )
        if predictor == 2:
            pix = _undiff_rows(pix)
    pix = pix.astype(np.uint8 if bits == 8 else np.uint16, copy=False)
    if bands == 1:
        pix = pix[:, :, 0]

    origin = scale = None
    if TAG_MODEL_TIEPOINT in tags and TAG_MODEL_PIXEL_SCALE in tags:
        tp, sc = tags[TAG_MODEL_TIEPOINT], tags[TAG_MODEL_PIXEL_SCALE]
        # tiepoint maps raster (i,j) -> model (x,y); baseline: i=j=0
        origin = (tp[3] - tp[0] * sc[0], tp[4] + tp[1] * sc[1])
        scale = (sc[0], sc[1])
    return pix, origin, scale


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

GEOTIFF_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),  # sample depth (8 or 16)
        T.StructField("epsg", T.IntegerType()),  # GeoKeyDirectory CRS (null = none)
        T.StructField("lon0", T.DoubleType()),   # top-left corner, NATIVE CRS units
        T.StructField("lat0", T.DoubleType()),
        T.StructField("sx", T.DoubleType()),     # units/px east (native CRS)
        T.StructField("sy", T.DoubleType()),     # units/px south (native CRS)
        T.StructField("minx", T.DoubleType()),   # envelope in EPSG:4326 degrees
        T.StructField("miny", T.DoubleType()),   # (reprojected from UTM/3857
        T.StructField("maxx", T.DoubleType()),   # via the closed forms when the
        T.StructField("maxy", T.DoubleType()),   # scene is projected)
        T.StructField("px_sum", T.LongType()),
        # raw chunky samples, LITTLE-endian words regardless of source
        # file order (one canonical layout for downstream consumers)
        T.StructField("pixels", T.BinaryType()),
    ]
)


def read_geotiff(spark: SparkSession, glob: str, level: int = 0) -> DataFrame:
    """GeoTIFF files → georeferenced raster rows.  The envelope columns feed
    ``index_envelopes``/``assign_tiles`` directly (the RasterDataAdapter
    ingest: scene → footprint → pyramid tiles); ``pixels`` carries the
    decoded raster for the mosaic/retile operators.

    Scenes whose GeoKeyDirectory names a projected CRS the engine has a
    closed form for (WGS84 UTM zones, Web Mercator) get their envelope
    REPROJECTED to EPSG:4326 — the canonical index grid — via a densified
    corner walk (crs.transform_box), exactly the reference's Landsat8
    path (RasterIngestRunner reprojects scene footprints before
    indexing).  Projected scenes with no built-in closed form keep a
    null envelope and their native origin/scale + epsg, so the caller
    can route them through pyproj rather than silently mis-indexing
    metres as degrees.

    ``level`` selects a COG overview: IFD ``min(level, levels-1)`` is
    decoded instead of the full-resolution image (the tile-server read
    path — a coarse zoom never pays the full-res decode), with georef
    scaled from IFD 0 so the envelope is identical at every level."""

    def kernel(batches):
        import pandas as pd

        from geowave_spark.functions import crs as CRS

        cols = [f.name for f in GEOTIFF_SCHEMA.fields]
        for b in batches:
            rows = []
            for r in b.itertuples():
                content = bytes(r.content)
                use = min(level, geotiff_ifd_count(content) - 1) if level else 0
                pix, origin, scale = decode_geotiff(content, ifd=use)
                if use > 0:
                    # overview IFDs carry no georef: scale IFD 0's.  The
                    # envelope below is level-invariant because
                    # w_lvl * sx_lvl == w0 * sx0 by construction.
                    _, tags0 = _parse_ifd(content, 0)
                    if (
                        TAG_MODEL_TIEPOINT in tags0
                        and TAG_MODEL_PIXEL_SCALE in tags0
                    ):
                        tp, sc = (
                            tags0[TAG_MODEL_TIEPOINT],
                            tags0[TAG_MODEL_PIXEL_SCALE],
                        )
                        origin = (tp[3] - tp[0] * sc[0], tp[4] + tp[1] * sc[1])
                        w0, h0 = tags0[TAG_WIDTH][0], tags0[TAG_HEIGHT][0]
                        hl, wl = pix.shape[:2]
                        scale = (sc[0] * w0 / wl, sc[1] * h0 / hl)
                epsg = geotiff_epsg(content)
                h, w = pix.shape[:2]
                bands = 1 if pix.ndim == 2 else pix.shape[2]
                bits = 8 * pix.itemsize
                lon0, lat0 = origin if origin else (None, None)
                sx, sy = scale if scale else (None, None)
                env = (None, None, None, None)
                if origin:
                    env = (lon0, lat0 - h * sy, lon0 + w * sx, lat0)
                    if epsg is not None and epsg != 4326:
                        try:
                            env = CRS.transform_box(
                                env[0], env[1], env[2], env[3], f"EPSG:{epsg}"
                            )
                        except NotImplementedError:
                            env = (None, None, None, None)  # no closed form:
                            # native units must NOT pose as degrees
                out_pix = pix if bits == 8 else pix.astype("<u2")
                rows.append(
                    (
                        r.path, w, h, bands, bits, epsg, lon0, lat0, sx, sy,
                        *env, int(pix.sum(dtype=np.int64)), out_pix.tobytes(),
                    )
                )
            pdf = pd.DataFrame(rows, columns=cols)
            for icol in ("w", "h", "bands", "bits"):
                pdf[icol] = pdf[icol].astype("int32")
            # epsg is nullable: pandas would infer float64 (the mixed-null
            # int trap) — route through nullable Int32
            pdf["epsg"] = pdf["epsg"].astype("Int32")
            pdf["px_sum"] = pdf["px_sum"].astype("int64")
            yield pdf

    files = spark.read.format("binaryFile").load(glob)
    return files.select("path", "content").mapInPandas(kernel, GEOTIFF_SCHEMA)
