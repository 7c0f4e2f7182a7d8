"""OSM PBF codec + Spark readers (reference extensions/cli/osm/
OsmPbfParser.java staging path).  Registry round trips (osm_nodes,
osm_ways EXTRA) are oracle-exact; here the wire-format edges."""

import numpy as np
import pytest

from geowave_spark.sources import osm as O

NODES = [
    (1, -74_500_000_000, 40_700_000_000, {"amenity": "cafe", "name": "x"}),
    (2, 2_300_000_000, 48_800_000_000, {}),
    (9_007_199_254_740_993, 179_999_000_000, -89_999_000_000, {"k": "v"}),
]
WAYS = [(11, [1, 2, 9_007_199_254_740_993], {"highway": "residential"}), (12, [2, 1], {})]
RELS = [(21, [("node", 1, "stop"), ("way", 11, "route"), ("relation", 21, "")], {"type": "route"})]


@pytest.mark.parametrize("compress", [True, False])
def test_pbf_roundtrip(compress):
    buf = O.encode_osm_pbf(NODES, WAYS, RELS, compress=compress)
    d = O.decode_osm_pbf(buf)
    assert d["nodes"] == NODES
    assert d["ways"] == WAYS
    assert d["relations"] == RELS


def test_varint_edges():
    for n in (0, 1, 127, 128, 300, 2**35, 2**63 - 1):
        assert O._read_uv(O._uv(n), 0)[0] == n
    for n in (0, -1, 1, -(2**62), 2**62, -2**63):
        enc = O._sv(n)
        u, _ = O._read_uv(enc, 0)
        assert O._unzig(u) == n


def test_delta_roundtrip_negative_jumps():
    vals = [100, -50, 7, 7, 10**15, -(10**15)]
    assert O._undelta(O._delta(vals)) == vals


def test_granularity_guard():
    with pytest.raises(ValueError, match="granularity"):
        O.encode_osm_pbf([(1, 101, 0, {})])  # not a multiple of 100


def test_plain_node_decode():
    """A hand-built PrimitiveGroup with a PLAIN Node (field 1) — decoders
    must handle both layouts even though the encoder emits DenseNodes."""
    st = O._msg(1, O._msg(1, b"") + O._msg(1, b"hw") + O._msg(1, b"yes"))
    node = (
        O._uv(1 << 3) + O._sv(42)  # id sint64 = 42
        + O._msg(2, O._uv(1))  # keys: ["hw"]
        + O._msg(3, O._uv(2))  # vals: ["yes"]
        + O._uv(8 << 3) + O._sv(40_700_000)  # lat units (x100 nano)
        + O._uv(9 << 3) + O._sv(-74_500_000)  # lon units
    )
    group = O._msg(1, node)
    block = st + O._msg(2, group) + O._vint(17, 100) + O._vint(19, 0) + O._vint(20, 0)
    import struct

    bh = O._msg(1, b"OSMData") + O._vint(3, len(O._msg(1, block)))
    buf = struct.pack(">I", len(bh)) + bh + O._msg(1, block)
    d = O.decode_osm_pbf(buf)
    assert d["nodes"] == [(42, -7_450_000_000, 4_070_000_000, {"hw": "yes"})]


def test_spark_readers(spark, tmp_path):
    p = tmp_path / "a.osm.pbf"
    p.write_bytes(O.encode_osm_pbf(NODES, WAYS, RELS))
    nodes = O.read_osm_nodes(spark, str(tmp_path / "*.osm.pbf")).collect()
    assert {r.node_id for r in nodes} == {n[0] for n in NODES}
    byid = {r.node_id: r for r in nodes}
    assert byid[1].lon_milli == -74_500 and byid[1].lat_milli == 40_700
    assert byid[1].tags == "amenity=cafe\x1fname=x" and byid[1].n_tags == 2
    ways = {r.way_id: r for r in O.read_osm_ways(spark, str(p)).collect()}
    assert ways[11].n_refs == 3 and list(ways[11].refs) == WAYS[0][1]
    assert ways[11].ref_sum == sum(WAYS[0][1])
    rels = O.read_osm_relations(spark, str(p)).collect()
    assert rels[0].member_types == "node,way,relation"
    assert rels[0].roles == "stop,route,"
    assert rels[0].memid_sum == 1 + 11 + 21


def test_nodes_feed_index_points(spark, tmp_path):
    """The staged nodes drive the standard spatial path (the reference's
    whole point of OSM staging): index_points accepts the reader output."""
    from geowave_spark.operators import index as OI

    (tmp_path / "b.osm.pbf").write_bytes(O.encode_osm_pbf(NODES))
    nodes = O.read_osm_nodes(spark, str(tmp_path / "*.osm.pbf"))
    idx = OI.index_points(nodes, id_col="node_id")
    assert idx.count() == len(NODES)
    assert "cell" in idx.columns


def test_assemble_ways(spark, tmp_path):
    """Way refs → ordered vertices: order preserved (not node-id order),
    missing refs flagged complete=false, closed ring detected from the
    ref ids, exact milli envelope."""
    nodes = [
        (1, -74_500_000_000, 40_700_000_000, {}),
        (2, 2_300_000_000, 48_800_000_000, {}),
        (3, 139_600_000_000, 35_600_000_000, {}),
    ]
    ways = [
        (11, [3, 1, 2], {"highway": "residential"}),   # order ≠ id order
        (12, [1, 2, 999], {}),                          # 999 missing
        (13, [1, 2, 3, 1], {"building": "yes"}),        # closed ring
    ]
    (tmp_path / "w.osm.pbf").write_bytes(O.encode_osm_pbf(nodes, ways))
    w = O.read_osm_ways(spark, str(tmp_path / "*.osm.pbf"))
    n = O.read_osm_nodes(spark, str(tmp_path / "*.osm.pbf"))
    out = {r.way_id: r for r in O.assemble_ways(w, n).collect()}

    r = out[11]
    assert r.complete and not r.closed
    assert r.lons == [139.6, -74.5, 2.3]  # ref order, exactly
    assert (r.minx_m, r.miny_m, r.maxx_m, r.maxy_m) == (
        -74_500, 35_600, 139_600, 48_800
    )
    r = out[12]
    assert not r.complete and r.n_found == 2 and r.n_refs == 3
    r = out[13]
    assert r.closed and r.complete and len(r.lons) == 4


def test_assemble_multipolygons(spark, tmp_path):
    """type=multipolygon relations: outer ring split across three ways
    (one stored reversed), an inner hole ring, a relation with a missing
    member way — stitched by endpoint NODE ids, partials flagged."""
    M = 1_000_000_000  # degree in nanodegrees
    nodes = [
        # outer square corners 1..4 (0,0) (4,0) (4,4) (0,4) degrees
        (1, 0, 0, {}), (2, 4 * M, 0, {}), (3, 4 * M, 4 * M, {}),
        (4, 0, 4 * M, {}),
        # inner hole corners 5..8
        (5, 1 * M, 1 * M, {}), (6, 2 * M, 1 * M, {}),
        (7, 2 * M, 2 * M, {}), (8, 1 * M, 2 * M, {}),
    ]
    ways = [
        (31, [1, 2, 3], {}),        # outer part a
        (32, [4, 3], {}),           # outer part b, REVERSED direction
        (33, [4, 1], {}),           # outer part c
        (34, [5, 6, 7, 8, 5], {}),  # hole, already closed
        (35, [1, 2], {}),           # member of the incomplete relation
    ]
    rels = [
        (61, [("way", 31, "outer"), ("way", 32, "outer"),
              ("way", 33, "outer"), ("way", 34, "inner")],
         {"type": "multipolygon"}),
        (62, [("way", 35, "outer"), ("way", 999, "outer")],
         {"type": "multipolygon"}),
        (63, [("node", 1, "stop")], {"type": "route"}),  # not a multipolygon
    ]
    (tmp_path / "mp.osm.pbf").write_bytes(O.encode_osm_pbf(nodes, ways, rels))
    w = O.read_osm_ways(spark, str(tmp_path / "*.osm.pbf"))
    n = O.read_osm_nodes(spark, str(tmp_path / "*.osm.pbf"))
    r = O.read_osm_relations(spark, str(tmp_path / "*.osm.pbf"))
    aw = O.assemble_ways(w, n)
    out = {x.rel_id: x for x in O.assemble_multipolygons(r, aw).collect()}

    assert set(out) == {61, 62}  # route relation excluded
    a = out[61]
    assert a.complete and a.n_rings == 2 and a.n_outer == 1 and a.n_inner == 1
    assert a.ring_roles == ["outer", "inner"]
    outer_lons = a.ring_lons[0]
    # stitched outer ring closes: first vertex == last vertex
    assert outer_lons[0] == outer_lons[-1]
    assert len(outer_lons) == 5  # 4 corners + closing vertex
    assert (a.minx_m, a.miny_m, a.maxx_m, a.maxy_m) == (0, 0, 4000, 4000)

    b = out[62]
    assert not b.complete and b.n_missing == 1 and b.n_ways == 2
