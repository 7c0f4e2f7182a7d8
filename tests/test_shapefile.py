"""Shapefile codec + Spark reader (SURVEY §2.2 GeoTools-vector ingest;
reference golden ITs ingest hail/tornado_tracks shapefiles).

Codec checks are closed-form byte-level round trips; the Spark reader is
checked against hand-written files; the full distributed export→ingest
round trip is oracle-checked in the registry (shp_roundtrip)."""

import numpy as np
import pytest

from geowave_spark.sources import shapefile as SHP


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=np.float64,
    )


def test_shp_point_roundtrip():
    shapes = [(SHP.SHP_POINT, [np.array([[1.25, -2.5]])]),
              (SHP.SHP_POINT, [np.array([[-73.985, 40.758]])])]
    out = SHP.decode_shp(SHP.encode_shp(shapes))
    assert [(r, t) for r, t, _ in out] == [(1, 1), (2, 1)]
    assert out[1][2][0][0, 0] == -73.985  # float64 exact round trip


def test_shp_polygon_with_hole_roundtrip():
    outer, hole = _sq(0, 0, 10), _sq(4, 4, 2)[::-1].copy()
    out = SHP.decode_shp(SHP.encode_shp([(SHP.SHP_POLYGON, [outer, hole])]))
    recno, t, parts = out[0]
    assert (recno, t, len(parts)) == (1, SHP.SHP_POLYGON, 2)
    np.testing.assert_array_equal(parts[0], outer)
    np.testing.assert_array_equal(parts[1], hole)


def test_shp_polyline_multipart_and_null():
    line1 = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])
    line2 = np.array([[5.0, 5.0], [6.0, 5.0]])
    out = SHP.decode_shp(
        SHP.encode_shp(
            [(SHP.SHP_POLYLINE, [line1, line2]), (SHP.SHP_NULL, [])]
        )
    )
    assert len(out[0][2]) == 2 and len(out[0][2][1]) == 2
    assert out[1][1] == SHP.SHP_NULL and out[1][2] == []


def test_shp_mixed_types_rejected():
    with pytest.raises(ValueError, match="mixed"):
        SHP.encode_shp(
            [
                (SHP.SHP_POINT, [np.array([[0.0, 0.0]])]),
                (SHP.SHP_POLYGON, [_sq(0, 0, 1)]),
            ]
        )


def test_shp_record_wkb_matches_geometry_kernels():
    from geowave_spark.functions import geometry as G

    ring = _sq(-1, -1, 2)
    wkb = SHP.shp_record_wkb(SHP.SHP_POLYGON, [ring])
    assert wkb == G.wkb_polygon([ring])
    assert G.envelope_of_wkb(wkb) == (-1.0, -1.0, 1.0, 1.0)
    line_wkb = SHP.shp_record_wkb(SHP.SHP_POLYLINE, [ring])
    assert line_wkb == G.wkb_linestring(ring)
    two = SHP.shp_record_wkb(SHP.SHP_POLYLINE, [ring, ring + 5])
    assert two == G.wkb_multilinestring([ring, ring + 5])
    assert G.envelope_of_wkb(two) == (-1.0, -1.0, 6.0, 6.0)


def test_dbf_roundtrip():
    fields = [("name", "C", 12, 0), ("count", "N", 8, 0),
              ("tone", "F", 10, 3), ("active", "L", 1, 0)]
    records = [("alpha", 42, -1.25, True), ("beta", None, 0.5, False)]
    got_fields, got = SHP.decode_dbf(SHP.encode_dbf(fields, records))
    assert [f[0] for f in got_fields] == ["name", "count", "tone", "active"]
    assert got[0] == {"name": "alpha", "count": 42, "tone": -1.25, "active": True}
    assert got[1]["count"] is None and got[1]["active"] is False


def test_dbf_numeric_overflow_raises():
    """A numeric value wider than its declared field must raise — the old
    head-truncation wrote 123456 @ width 4 as b'1234', which round-trips
    as a plausible wrong number (silent order-of-magnitude corruption)."""
    import pytest

    fields = [("count", "N", 4, 0)]
    with pytest.raises(ValueError, match="exceeds declared width"):
        SHP.encode_dbf(fields, [(123456,)])
    # boundary: exactly-width values still encode
    _, got = SHP.decode_dbf(SHP.encode_dbf(fields, [(9999,)]))
    assert got[0]["count"] == 9999


def test_read_shapefile_spark(spark, tmp_path):
    shapes = [(SHP.SHP_POLYGON, [_sq(10, 20, 4)]), (SHP.SHP_POLYGON, [_sq(-5, -5, 1)])]
    (tmp_path / "a.shp").write_bytes(SHP.encode_shp(shapes))
    (tmp_path / "a.dbf").write_bytes(
        SHP.encode_dbf([("fid", "N", 8, 0)], [(7,), (9,)])
    )
    rows = (
        SHP.read_shapefile(spark, str(tmp_path / "*.shp"))
        .orderBy("recno")
        .collect()
    )
    assert len(rows) == 2
    assert (rows[0].shape_type, rows[0].n_parts, rows[0].n_points) == (5, 1, 5)
    assert (rows[0].minx, rows[0].maxy) == (10.0, 24.0)
    assert rows[0].attrs_json == '{"fid": 7}'
    assert rows[1].wkb is not None and rows[1].miny == -5.0


def test_write_shapefile_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(6).select(
        (F.col("id") % 2).cast("int").alias("bucket"),
        F.struct(
            F.lit(SHP.SHP_POINT).alias("t"),
            F.array(
                F.array(F.array(F.col("id").cast("double"), F.lit(0.5)))
            ).alias("parts"),
        ).alias("shape"),
        F.col("id").alias("fid"),
    )
    out = tmp_path / "shards"
    SHP.write_shapefile_shards(
        df, str(out), fields=[("fid", "N", 8, 0)], attr_cols=["fid"]
    )
    back = SHP.read_shapefile(spark, str(out / "*.shp"))
    import json

    got = sorted(
        (json.loads(r.attrs_json)["fid"], r.minx) for r in back.collect()
    )
    assert got == [(float(i), float(i)) for i in range(6)]


def test_dbf_deleted_record_keeps_positional_alignment():
    """A 0x2A-flagged (deleted) .dbf record must occupy its slot as None —
    skipping it would misalign every subsequent shape's attributes
    (round-3 review finding)."""
    import struct

    fields = [("ID", "N", 10, 0)]
    records = [[i] for i in range(4)]
    buf = bytearray(SHP.encode_dbf(fields, records))
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    buf[hdr_size + rec_size] = 0x2A  # delete record index 1
    got_fields, got = SHP.decode_dbf(bytes(buf))
    assert [r["ID"] if r else None for r in got] == [0, None, 2, 3]
