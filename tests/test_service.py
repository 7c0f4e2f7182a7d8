"""Embedded HTTP read service (service.py): live-socket endpoint tests —
JSON queries through the CQL planner, on-demand vector tiles, stats,
error contracts — plus the exact tile-bounds inversion."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from geowave_spark import service as SV
from geowave_spark.operators import index as OI
from geowave_spark.sources import tables as TB


def test_tile_bounds_inverse_exact():
    # every milli-degree lon in the returned interval maps back to the
    # tile, and the neighbors' boundary values don't
    for z, x, y in [(3, 0, 0), (3, 7, 7), (5, 13, 9), (8, 100, 200)]:
        minx, miny, maxx, maxy = SV.tile_bounds_milli(z, x, y)
        n = 1 << z

        def gx(m):
            return (m + 180_000) * n // 360_000

        def gy(m):
            return (m + 90_000) * n // 180_000

        assert gx(minx) == x and gx(maxx - 1) == x
        assert gy(miny) == y and gy(maxy - 1) == y
        if minx > -180_000:
            assert gx(minx - 1) == x - 1
        if maxx < 180_000:
            assert gx(maxx) == x + 1


@pytest.fixture(scope="module")
def server(spark, sf_dir, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("svc") / "store")
    pts = OI.index_points(
        TB.geo_events(spark, sf_dir).select(
            "event_id", "lon", "lat", "lon_milli", "lat_milli"
        ),
        id_col="event_id",
    )
    OI.write_indexed(pts, store)
    srv = SV.serve(spark, {"ev": store}, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    yield spark, base, store
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_version_and_stores(server):
    _, base, _ = server
    st, _, body = _get(base, "/v0/version")
    assert st == 200 and json.loads(body)["engine"] == "geowave_spark"
    st, _, body = _get(base, "/v0/stores")
    assert json.loads(body)["stores"] == ["ev"]


def test_stats_endpoint(server):
    spark, base, store = server
    st, _, body = _get(base, "/v0/stores/ev/stats")
    d = json.loads(body)
    assert d["rows"] == spark.read.parquet(store).count()
    assert d["tiers"] == [29]


def test_query_endpoint_matches_direct(server):
    spark, base, store = server
    cql = "BBOX(geom, -10, -10, 10, 10)"
    st, ct, body = _get(
        base, "/v0/stores/ev/query?cql=" + urllib.request.quote(cql)
        + "&limit=10000"
    )
    assert st == 200 and ct == "application/json"
    d = json.loads(body)
    from geowave_spark.plans.cql import cql_query

    direct = cql_query(OI.read_indexed(spark, store), cql).count()
    assert d["n"] == min(direct, 10_000) and direct > 0
    ids = {r["event_id"] for r in d["rows"]}
    assert len(ids) == d["n"]


def test_tile_endpoint_decodes_to_exact_points(server):
    spark, base, store = server
    from geowave_spark.sources import mvt as W

    # pick the tile holding the densest blob (NYC: lon -73.985, lat 40.758)
    z = 4
    n = 1 << z
    x = (-73_985 + 180_000) * n // 360_000
    y = (40_758 + 90_000) * n // 180_000
    st, ct, body = _get(base, f"/v0/tiles/ev/{z}/{x}/{y}.mvt")
    assert st == 200 and ct == "application/vnd.mapbox-vector-tile"
    feats = W.decode_tile(body)["points"]["features"]
    minx, miny, maxx, maxy = SV.tile_bounds_milli(z, x, y)
    exp = (
        spark.read.parquet(store)
        .filter(
            (F.col("lon_milli") >= minx) & (F.col("lon_milli") < maxx)
            & (F.col("lat_milli") >= miny) & (F.col("lat_milli") < maxy)
        )
        .count()
    )
    assert len(feats) == exp > 0


def test_empty_tile_is_204(server):
    _, base, _ = server
    # mid-Pacific tile at a deep level: almost surely empty
    req = urllib.request.Request(base + "/v0/tiles/ev/10/5/500.mvt")
    with urllib.request.urlopen(req, timeout=120) as r:
        st = r.status
        body = r.read()
    assert st in (200, 204)
    if st == 204:
        assert body == b""


def test_error_contracts(server):
    _, base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/v0/stores/nope/stats")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/v0/stores/ev/query")  # missing cql
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/v0/tiles/ev/3/99/0.mvt")  # out of range
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/v0/nothing")
    assert e.value.code == 404


def test_cli_serve_binds(spark, tmp_path):
    import io

    from geowave_spark.cli import main

    out = io.StringIO()
    rc = main(
        ["--config", str(tmp_path / "cfg.json"), "serve", "--port", "0",
         "--no-block"],
        spark=spark, out=out,
    )
    assert rc == 0 and "serving 0 store(s) on http://127.0.0.1:" in out.getvalue()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def wserver(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wsvc")
    stores = {"w": str(root / "w"), "snap": str(root / "snap")}
    srv = SV.serve(spark, stores, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    yield spark, base, stores
    srv.shutdown()


def test_post_ingest_then_query_roundtrip(wserver):
    spark, base, stores = wserver
    rows = [{"id": i, "lon": i / 10.0, "lat": -i / 20.0} for i in range(50)]
    st, d = _post(base, "/v0/stores/w/ingest", {"rows": rows})
    assert st == 200 and d["ingested"] == 50
    st, d = _post(base, "/v0/stores/w/ingest",
                  {"rows": [{"id": 100, "lon": 1.0, "lat": 1.0}]})
    assert st == 200  # append, schema matches
    st, _, body = _get(base, "/v0/stores/w/query?cql="
                       + urllib.request.quote("BBOX(geom, 0, -2, 2, 2)")
                       + "&limit=1000")
    got = {r["event_id"] for r in json.loads(body)["rows"]}
    exp = {i for i in range(50) if 0 <= i / 10.0 <= 2 and -2 <= -i / 20.0 <= 2}
    exp.add(100)
    assert got == exp


def test_post_ingest_contracts(wserver):
    _, base, _ = wserver
    st, d = _post(base, "/v0/stores/w/ingest", {"rows": []})
    assert st == 400
    st, d = _post(base, "/v0/stores/w/ingest",
                  {"rows": [{"id": 1, "lon": 2.0}]})
    assert st == 400 and "lat" in d["error"]
    st, d = _post(base, "/v0/stores/nope/ingest",
                  {"rows": [{"id": 1, "lon": 0.0, "lat": 0.0}]})
    assert st == 404
    # append with a drifted schema is refused loudly
    st, d = _post(base, "/v0/stores/w/ingest",
                  {"rows": [{"id": 1, "lon": 0.0, "lat": 0.0, "extra": "x"}]})
    assert st == 400 and "schema mismatch" in d["error"]


def test_post_snapshot_verbs(wserver):
    spark, base, stores = wserver
    rows1 = [{"id": i, "lon": float(i), "lat": 0.0} for i in range(5)]
    rows2 = [{"id": i + 10, "lon": float(i), "lat": 1.0} for i in range(3)]
    st, d = _post(base, "/v0/stores/snap/snapshot/commit", {"rows": rows1})
    assert (st, d["version"]) == (200, 1)
    st, d = _post(base, "/v0/stores/snap/snapshot/commit", {"rows": rows2})
    assert (st, d["version"]) == (200, 2)
    from geowave_spark.operators import snapshots as SN

    assert SN.read(spark, stores["snap"]).count() == 8
    st, d = _post(base, "/v0/stores/snap/snapshot/rollback", {"version": 1})
    assert (st, d["version"]) == (200, 3)
    assert SN.read(spark, stores["snap"]).count() == 5
    st, d = _post(base, "/v0/stores/snap/snapshot/expire", {"keep_last": 1})
    assert st == 200 and d["kept_versions"]
    st, d = _post(base, "/v0/stores/snap/snapshot/rollback", {})
    assert st == 400
    st, d = _post(base, "/v0/stores/snap/snapshot/frobnicate", {})
    assert st == 400


def test_line_store_tile_endpoint(spark, tmp_path):
    """A segment-grain line store serves MVT line tiles: the endpoint's
    envelope-prefiltered payload equals the operator's direct output for
    the same tile."""
    from geowave_spark.operators import lines as LN
    from geowave_spark.operators import mvt as OMV
    from geowave_spark.sources import mvt as W

    pts = spark.createDataFrame(
        [(t, j, 10_000 + t * 100 + j * 120, 10_000 + j * 90)
         for t in range(4) for j in range(4)],
        "track_id long, j long, x long, y long",
    )
    segs = LN.line_segments(pts)
    store = str(tmp_path / "linestore")
    segs.write.parquet(store)
    srv = SV.serve(spark, {"ln": store}, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        z = 6
        direct = {(r["tile_ix"], r["tile_iy"]): bytes(r["mvt"])
                  for r in OMV.mvt_line_tiles(segs, level=z).collect()}
        assert direct
        (tx, ty), payload = sorted(direct.items())[0]
        st, ct, body = _get(base, f"/v0/tiles/ln/{z}/{tx}/{ty}.mvt")
        assert st == 200 and body == payload
        dec = W.decode_tile(body)["lines"]
        assert dec["features"]
        # a far-away empty tile is a 204
        st, _, body = _get(base, f"/v0/tiles/ln/{z}/0/0.mvt")
        assert st == 204 and body == b""
    finally:
        srv.shutdown()
