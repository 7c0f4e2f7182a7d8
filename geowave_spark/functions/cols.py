"""JVM-side column kernels: Morton cell encode as pure Spark expressions.

The reference's SFC encode is per-row Java (ZOrderSFC.java:72 bit
interleaving).  Our hot ingest/query path re-expresses the identical bit
algebra as Catalyst column expressions — shifts, masks, OR — so cell
assignment runs inside whole-stage codegen with NO Python worker at all.
The numpy kernels in functions/cells.py remain the definitional oracle
(tests assert bit-equality between the two paths).

Bit layout matches cells.py exactly: cell = (res << 58) | morton(ix, iy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geowave_spark.functions import cells as C


def let(value: Column, fn) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE and use
    it via a lambda variable.  Catalyst re-inlines projected expressions
    into every lambda evaluation (O(n²) traps — projection boundaries do
    not stop it); lambda variables are the supported way to force reuse.
    Canonical copy — operators/dedup.py and friends re-export this."""
    return F.element_at(F.transform(F.array(value), fn), 1)

# Parallel-prefix spread masks (same constants as cells._B; all < 2^63).
_MASKS = [
    (16, 0x0000_FFFF_0000_FFFF),
    (8, 0x00FF_00FF_00FF_00FF),
    (4, 0x0F0F_0F0F_0F0F_0F0F),
    (2, 0x3333_3333_3333_3333),
    (1, 0x5555_5555_5555_5555),
]


def spread_col(v: Column) -> Column:
    """Spread the low 32 bits of a long so bit i lands at position 2i."""
    v = v.bitwiseAND(F.lit(0x0000_0000_FFFF_FFFF))
    for shift, mask in _MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _clamp(ix: Column, n: int) -> Column:
    return F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))


def _pack(ix: Column, iy: Column, res: int) -> Column:
    z = spread_col(ix).bitwiseOR(F.shiftleft(spread_col(iy), 1))
    return F.lit(res << C.RES_SHIFT).bitwiseOR(z)


def cell_encode_col(lon: Column, lat: Column, res: int) -> Column:
    """Float path: degrees → int64 cell id at ``res`` (matches cells.encode)."""
    n = 1 << res
    ix = _clamp(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))), n)
    iy = _clamp(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))), n)
    return _pack(ix.cast("long"), iy.cast("long"), res)


def _idiv(a: Column, b: int) -> Column:
    """Exact integer floor-division for non-negative ``a`` (a - a%b)/b.

    The division is exact (numerator is a multiple of b), so the double
    round-trip is lossless for quotients < 2^53."""
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def cell_encode_milli_col(lon_milli: Column, lat_milli: Column, res: int) -> Column:
    """Exact integer path (matches cells.encode_milli and the SQL oracles):
    ix = (lon_milli + 180000) * 2^r // 360000, pure int64 arithmetic."""
    n = 1 << res
    ix = _clamp(_idiv((lon_milli + F.lit(180_000)) * F.lit(n), C.LON_SPAN_MILLI), n)
    iy = _clamp(_idiv((lat_milli + F.lit(90_000)) * F.lit(n), C.LAT_SPAN_MILLI), n)
    return _pack(ix, iy, res)


def _shiftleft_var(v: Column, amount: Column) -> Column:
    """shiftleft with a *column* shift amount (SQL builtin via call_function;
    the PySpark wrapper only accepts int literals)."""
    return F.call_function("shiftleft", v, amount.cast("int"))


def pack_col(ix: Column, iy: Column, res: Column) -> Column:
    """(ix, iy, res) → cell key with *column* resolution (codegen)."""
    z = spread_col(ix).bitwiseOR(F.shiftleft(spread_col(iy), 1))
    return _shiftleft_var(res.cast("long"), F.lit(C.RES_SHIFT)).bitwiseOR(z)


def _idiv_col(a: Column, b: Column) -> Column:
    """Exact integer floor-division for non-negative ``a`` with column ``b``."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def tier_extent_milli_col(ex_milli: Column, ey_milli: Column) -> Column:
    """JVM mirror of cells.tier_select_extent_milli: finest r with
    ``extent << r <= span`` per dimension, min over dims, clipped to
    [0, MAX_RES].  log2 seed + one-step exact shift fix-up — bit-identical
    to the numpy kernel (tests assert parity)."""

    def per_dim(ext: Column, span: int) -> Column:
        e = F.greatest(ext.cast("long"), F.lit(1))
        r = F.floor(F.log2(F.lit(float(span)) / e)).cast("long")
        up = _shiftleft_var(e, F.greatest(F.least(r + 1, F.lit(62)), F.lit(0)))
        r = F.when(up <= F.lit(span), r + 1).otherwise(r)
        cur = _shiftleft_var(e, F.greatest(F.least(r, F.lit(62)), F.lit(0)))
        return F.when(cur > F.lit(span), r - 1).otherwise(r)

    rx = per_dim(ex_milli, C.LON_SPAN_MILLI)
    ry = per_dim(ey_milli, C.LAT_SPAN_MILLI)
    return F.greatest(F.least(F.least(rx, ry), F.lit(C.MAX_RES)), F.lit(0))


def grid_milli_col(coord_milli: Column, offset: int, span: int, res: Column) -> Column:
    """Exact integer grid coord at *column* resolution:
    (coord + offset) * 2^res // span, clipped to [0, 2^res - 1]."""
    n = _shiftleft_var(F.lit(1).cast("long"), res)
    raw = _idiv_col((coord_milli.cast("long") + F.lit(offset)) * n, F.lit(span).cast("long"))
    return F.least(F.greatest(raw, F.lit(0).cast("long")), n - 1)


def parent_col(cell: Column, parent_res: int) -> Column:
    """Coarsen a cell key to ``parent_res`` — a pure bit-shift of the
    interleaved key (valid when every input's res >= parent_res).

    The shift amount is a *column* (2 × res delta), which the PySpark shift
    wrappers don't accept — ``call_function`` reaches the SQL builtin, which
    does."""
    shift = ((F.shiftright(cell, C.RES_SHIFT) - F.lit(parent_res)) * 2).cast("int")
    z = F.call_function(
        "shiftrightunsigned", cell.bitwiseAND(F.lit(int(C.COORD_MASK))), shift
    )
    return F.lit(parent_res << C.RES_SHIFT).bitwiseOR(z)


def _shiftright_var(v: Column, amount: Column) -> Column:
    """shiftrightunsigned with a *column* shift amount."""
    return F.call_function("shiftrightunsigned", v, amount.cast("int"))


def xz_prefix_codes_milli_col(
    minx_m: Column, miny_m: Column, maxx_m: Column, maxy_m: Column,
    g: int = C.XZ_G,
) -> Column:
    """JVM mirror of cells.xz_encode_milli's prefix matrix: the int64 array
    ``[code(level 0), …, code(level lvl)]`` of ancestor codes on the
    root→anchor path (last element = the extent's own XZ code).  Bit-parity
    with the numpy kernel is pinned by tests/test_xz.py.

    All integer arithmetic, unrolled over the ``g`` levels.  ``lvl``/``ix``/
    ``iy`` are LET-BOUND (:func:`let`): inlined naively they are copied
    into every level × every array slot and the expression tree alone
    takes minutes to analyze (measured: >5 min vs 2 s)."""
    X0 = minx_m.cast("long") + F.lit(180_000)
    X1 = maxx_m.cast("long") + F.lit(180_000)
    Y0 = miny_m.cast("long") + F.lit(90_000)
    Y1 = maxy_m.cast("long") + F.lit(90_000)
    DX, DY = C.LON_SPAN_MILLI, C.LAT_SPAN_MILLI

    # lvl = Σ fits(l): the extent fits the 2×-enlarged anchor at level l
    # (monotone in l, so the indicator sum IS the max fitting level).
    fits = []
    for l in range(1, g + 1):
        n = 1 << l
        fx = X1 * n <= (_idiv(X0 * n, DX) + 2) * F.lit(DX)
        fy = Y1 * n <= (_idiv(Y0 * n, DY) + 2) * F.lit(DY)
        fits.append((fx & fy).cast("long"))
    lvl_expr = sum(fits[1:], fits[0])

    def with_lvl(lvl: Column) -> Column:
        n = _shiftleft_var(F.lit(1).cast("long"), lvl)
        ix_expr = F.least(_idiv_col(X0 * n, F.lit(DX).cast("long")), n - 1)
        iy_expr = F.least(_idiv_col(Y0 * n, F.lit(DY).cast("long")), n - 1)

        def with_xy(ix: Column, iy: Column) -> Column:
            code = F.lit(0).cast("long")
            prefix = [code]
            for i in range(1, g + 1):
                sh = F.greatest(lvl - i, F.lit(0).cast("long"))
                bx = _shiftright_var(ix, sh).bitwiseAND(F.lit(1).cast("long"))
                by = _shiftright_var(iy, sh).bitwiseAND(F.lit(1).cast("long"))
                code = code + (bx * 2 + by) * F.lit(C.xz_step(i, g)) + 1
                prefix.append(code)
            return F.slice(F.array(*prefix), 1, (lvl + 1).cast("int"))

        return let(ix_expr, lambda ix: let(iy_expr, lambda iy: with_xy(ix, iy)))

    return let(lvl_expr, with_lvl)


def quadkey_col(ix: Column, iy: Column, level: Column,
                max_level: int = C.MAX_RES) -> Column:
    """Bing-maps-style quadkey string of a tile on THIS engine's grid:
    digit i (most-significant first) = bit of ``ix`` plus twice the bit of
    ``iy`` at that position, ``level`` digits total (level 0 = the empty
    string, the standard single-world-tile convention).  The engine's grid
    is south-origin milli-degrees; a web-mercator consumer flips
    ``iy' = 2^level - 1 - iy`` before keying.

    Variable per-row ``level``: one flat ``concat`` of ``max_level``
    codegen terms, each emitting '' beyond the row's level — no UDF, no
    HOF (stays inside whole-stage codegen).  A row whose level EXCEEDS
    ``max_level`` or is NEGATIVE fails fast (the key would otherwise
    silently truncate to a coarser — possibly whole-world — address; the
    never-truncate rule every cover operator follows).  A NULL level
    yields a NULL key, matching NULL ix/iy concat propagation."""
    lvl = level.cast("long")
    guard = (
        F.when(lvl.isNull(), F.lit(None).cast("string"))
        .when(
            (lvl > F.lit(max_level)) | (lvl < 0),
            F.expr(
                f"raise_error('quadkey_col: level outside [0, "
                f"{max_level}] — raise max_level, never truncate a key')"
            ).cast("string"),
        )
        .otherwise(F.lit(""))
    )
    terms = [guard]
    for s in range(max_level - 1, -1, -1):
        d = (
            F.shiftright(ix.cast("long"), s).bitwiseAND(F.lit(1))
            + F.shiftright(iy.cast("long"), s).bitwiseAND(F.lit(1)) * 2
        )
        terms.append(
            F.when(F.lit(s) < lvl, d.cast("string")).otherwise(F.lit(""))
        )
    return F.concat(*terms)


# ---------------------------------------------------------------------------
# Hexagonal binning (H3-analogue) — JVM twin of functions/hexgrid.py.
# ---------------------------------------------------------------------------

from geowave_spark.functions import hexgrid as HG  # noqa: E402


def hex_key_col(lon_milli: Column, lat_milli: Column, res: int) -> Column:
    """Packed nearest-center comparison key ``d2*PACK + (j*NI + i)`` —
    minimum over the two candidate rows (see hexgrid.py for the proof
    that two rows suffice).  Pure integer column math on shifted
    non-negative coordinates, so Spark DIV / DuckDB ``//`` / Python
    ``//`` agree exactly; stays inside whole-stage codegen (no UDF).
    Extract the hex id with ``% PACK``; decode i/j with ``% NI`` and
    ``DIV NI`` (hex_id_cols below)."""
    w, h = HG.wh(res)
    n_i = HG.ni(res)
    x = lon_milli.cast("long") + F.lit(HG.X_OFF)
    y = lat_milli.cast("long") + F.lit(HG.Y_OFF)
    keys = []
    for dj in (0, 1):
        j = _idiv(y, h) + F.lit(dj)
        off = F.pmod(j, F.lit(2)) * F.lit(w // 2)
        i = _idiv(x - off + F.lit(w // 2), w)
        dx = x - (i * F.lit(w) + off)
        dy = y - j * F.lit(h)
        keys.append((dx * dx + dy * dy) * F.lit(HG.PACK) + (j * F.lit(n_i) + i))
    return F.least(*keys)


def hex_id_cols(key: Column, res: int) -> tuple[Column, Column]:
    """(hex_i, hex_j) from a hex_key_col result."""
    n_i = HG.ni(res)
    hid = F.pmod(key, F.lit(HG.PACK))
    return F.pmod(hid, F.lit(n_i)).cast("long"), _idiv(hid, n_i)


def hex_center_cols(hex_i: Column, hex_j: Column, res: int) -> tuple[Column, Column]:
    """Hex (i, j) → center (lon_milli, lat_milli) — exact integers."""
    w, h = HG.wh(res)
    lon_c = hex_i * F.lit(w) + F.pmod(hex_j, F.lit(2)) * F.lit(w // 2) - F.lit(HG.X_OFF)
    return lon_c, hex_j * F.lit(h) - F.lit(HG.Y_OFF)


# ---------------------------------------------------------------------------
# S2-analogue cell ids — JVM twin of functions/s2cells.py.
# ---------------------------------------------------------------------------

from geowave_spark.functions import s2cells as S2  # noqa: E402


def s2_leaf_col(lon_milli: Column, lat_milli: Column) -> Column:
    """Point → MAX_LEVEL S2-style leaf id.  Pure integer CASE + DIV +
    the parallel-prefix Morton spread; bit-identical to s2cells.leaf_id
    and to the DuckDB oracle replay (registry.py s2_cells/s2_bbox).

    Every stage is LET-BOUND (cols.let): the spread ladder references
    its input twice per mask stage (2^5 = 32 self-copies), and the
    optimizer inlines upstream projections into whatever tree reaches
    it — with derived inputs (geo_events computes lon_milli from
    events) the naive single expression held 32 copies of the whole
    coordinate derivation, a 564 KB plan and ~25 s of driver-side
    fixed-point time at sf0.1.  Bound, each derivation appears in the
    plan ONCE and duplication copies lambda variables.  The lambda
    makes evaluation interpreted rather than codegen — measured noise
    at sf0.1 (~60 scalar int ops/row; same posture as simhash's
    bit-sum ladder, operators/dedup.py)."""
    return let(
        lon_milli.cast("long"),
        lambda lon: let(lat_milli.cast("long"), lambda lat: _s2_leaf_body(lon, lat)),
    )


def _s2_leaf_body(lon: Column, lat: Column) -> Column:
    n = 1 << S2.MAX_LEVEL
    north = lat >= F.lit(S2.EQ_LAT)
    south = lat < F.lit(-S2.EQ_LAT)
    cap = north | south
    x = lon + F.lit(S2.X_OFF)
    eq_face = F.least(_idiv(x, S2.EQ_SPAN), F.lit(3))
    face = F.when(north, F.lit(4)).when(south, F.lit(5)).otherwise(eq_face)
    u = F.when(cap, F.least(x, F.lit(S2.CAP_USPAN - 1))).otherwise(
        F.least(x - eq_face * F.lit(S2.EQ_SPAN), F.lit(S2.EQ_SPAN - 1))
    )
    v = (
        F.when(north, F.least(lat - F.lit(S2.EQ_LAT), F.lit(S2.CAP_VSPAN - 1)))
        .when(south, -lat - F.lit(S2.EQ_LAT + 1))
        .otherwise(lat + F.lit(S2.EQ_LAT))
    )
    us = F.when(cap, F.lit(S2.CAP_USPAN)).otherwise(F.lit(S2.EQ_SPAN))
    vs = F.when(cap, F.lit(S2.CAP_VSPAN)).otherwise(F.lit(S2.EQ_SPAN))
    iu = F.least(_idiv_col(u * F.lit(n), us), F.lit(n - 1))
    iv = F.least(_idiv_col(v * F.lit(n), vs), F.lit(n - 1))

    def compose(iu_b: Column, iv_b: Column) -> Column:
        pos = spread_col(iu_b).bitwiseOR(F.shiftleft(spread_col(iv_b), 1))
        base = F.shiftleft(face.cast("long"), 2 * S2.MAX_LEVEL).bitwiseOR(pos)
        return F.shiftleft(base, 1).bitwiseOR(F.lit(1))

    return let(iu, lambda a: let(iv, lambda b: compose(a, b)))


def s2_parent_col(cell: Column, level: int) -> Column:
    """Ancestor id at ``level`` — S2's ``(id & -new_lsb) | new_lsb``."""
    new_lsb = 1 << (2 * (S2.MAX_LEVEL - level))
    return cell.bitwiseAND(F.lit(-new_lsb)).bitwiseOR(F.lit(new_lsb))


def s2_range_cols(cell: Column) -> tuple[Column, Column]:
    """(range_min, range_max): the contiguous leaf-id interval of the
    cell's descendants — ``lsb = id & -id`` in column math."""
    lsb = cell.bitwiseAND(-cell)
    return cell - lsb + F.lit(1), cell + lsb - F.lit(1)
