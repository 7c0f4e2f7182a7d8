"""Avro Object Container codec + Spark reader (SURVEY §2.2 avro format
plugin / vector-export parity).  Byte-level round trips over the supported
schema surface, deflate codec, corruption detection, and the binaryFile
reader path."""

import json

import pytest

from geowave_spark.sources import avro as AV

FEATURE_SCHEMA = {
    "type": "record",
    "name": "feature",
    "fields": [
        {"name": "fid", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "lon", "type": "double"},
        {"name": "lat", "type": "double"},
        {"name": "visible", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "wkb", "type": "bytes"},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "k", "symbols": ["pt", "poly"]},
        },
    ],
}

RECORDS = [
    {
        "fid": 1,
        "name": "alpha",
        "lon": -73.985,
        "lat": 40.758,
        "visible": True,
        "tags": ["a", "b"],
        "props": {"k": 87},
        "wkb": b"\x01\x02",
        "kind": "pt",
    },
    {
        "fid": -9007199254740993,  # needs >53-bit varint handling
        "name": None,
        "lon": 0.0,
        "lat": -85.0,
        "visible": False,
        "tags": [],
        "props": {},
        "wkb": b"",
        "kind": "poly",
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip(codec):
    buf = AV.avro_encode(FEATURE_SCHEMA, RECORDS, codec=codec)
    schema, got = AV.avro_decode(buf)
    assert schema["name"] == "feature"
    assert got == RECORDS


def test_avro_zigzag_edges():
    for n in (0, -1, 1, 63, -64, 2**40, -(2**40), 2**62):
        r = AV._Reader(AV._zz_enc(n))
        assert r.long() == n


def test_avro_corrupt_sync_detected():
    buf = bytearray(AV.avro_encode(FEATURE_SCHEMA, RECORDS))
    buf[-1] ^= 0xFF  # flip a sync byte of the last block
    with pytest.raises(ValueError, match="sync"):
        AV.avro_decode(bytes(buf))
    with pytest.raises(ValueError, match="magic"):
        AV.avro_decode(b"NOPE" + bytes(16))


def test_avro_empty_file_and_unknown_codec():
    buf = AV.avro_encode(FEATURE_SCHEMA, [])
    _, got = AV.avro_decode(buf)
    assert got == []
    with pytest.raises(NotImplementedError):
        AV.avro_encode(FEATURE_SCHEMA, RECORDS, codec="snappy")


def test_read_avro_spark(spark, tmp_path):
    (tmp_path / "a.avro").write_bytes(
        AV.avro_encode(FEATURE_SCHEMA, RECORDS, codec="deflate")
    )
    rows = AV.read_avro(spark, str(tmp_path / "*.avro")).orderBy("recno").collect()
    assert len(rows) == 2
    rec = json.loads(rows[0].record_json)
    assert rec["fid"] == 1 and rec["name"] == "alpha"
    assert rec["wkb"] == "0102"  # bytes surface as hex in the JSON column
    assert json.loads(rows[1].record_json)["name"] is None


def test_union_branch_selected_by_value_type():
    """Multi-branch unions pick the branch matching the VALUE's python
    type (round-3 review: null-ness alone sent 2.5 down a 'long' branch,
    silently truncating to 2)."""
    import pytest

    from geowave_spark.sources.avro import _encode_value, avro_decode, avro_encode

    def rt(ftype, v):
        schema = {
            "type": "record", "name": "R",
            "fields": [{"name": "x", "type": ftype}],
        }
        _s, recs = avro_decode(avro_encode(schema, [{"x": v}]))
        return recs[0]["x"]

    u = ["null", "long", "double"]
    assert rt(u, None) is None
    assert rt(u, 7) == 7
    assert rt(u, 2.5) == 2.5
    assert rt(["null", "int", "string"], "abc") == "abc"
    assert rt(["null", "boolean", "long"], True) is True
    got = rt(["null", "boolean", "long"], 5)
    assert got == 5 and not isinstance(got, bool)
    with pytest.raises(ValueError, match="union branch"):
        _encode_value(["null", "long"], "oops")
