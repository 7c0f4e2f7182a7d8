"""CLI surface (cli.py) — the reference's `geowave` operation tree:
config addstore/addindex, ingest, stat recalc/liststats, CQL query
(+ --explain), analytics, export — driven in-process with an injected
SparkSession and captured stdout."""

from __future__ import annotations

import io
import json
import os

import numpy as np

from geowave_spark.cli import main
from geowave_spark.sources import tables as TB


def _run(spark, tmp_path, *argv) -> str:
    out = io.StringIO()
    rc = main(
        ["--config", str(tmp_path / "cfg.json"), *argv], spark=spark, out=out
    )
    assert rc == 0
    return out.getvalue()


def test_cli_config_roundtrip(spark, tmp_path):
    _run(spark, tmp_path, "config", "addstore", "s1", "--path", str(tmp_path / "s1"))
    _run(spark, tmp_path, "config", "addindex", "spatial", "--res", "12")
    listed = _run(spark, tmp_path, "config", "list")
    cfg = json.loads(listed)
    assert cfg["stores"]["s1"]["path"].endswith("s1")
    assert cfg["indexes"]["spatial"]["res"] == 12
    assert "0." in _run(spark, tmp_path, "version")


def test_cli_ingest_query_stats_export(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "value"
    ).write.parquet(src)
    store = str(tmp_path / "store")
    _run(spark, tmp_path, "config", "addstore", "ev", "--path", store)
    _run(spark, tmp_path, "config", "addindex", "sp")

    got = _run(
        spark, tmp_path, "ingest", src, "ev", "sp", "--format", "parquet"
    )
    n_src = spark.read.parquet(src).count()
    assert f"now holds {n_src} rows" in got  # points → one row per entry

    _run(spark, tmp_path, "stat", "recalc", "ev")
    stats = _run(spark, tmp_path, "stat", "liststats", "ev")
    assert f"n_rows\t{n_src}" in stats and "tiers\t[29]" in stats

    # CQL query: count matches a direct filter
    q = _run(
        spark, tmp_path, "query", "ev",
        "BBOX(geom, -10, -10, 10, 10)", "--limit", "100000",
    )
    n_q = len(q.strip().splitlines()) - 1  # header line
    from pyspark.sql import functions as F

    want = (
        spark.read.parquet(src)
        .filter(
            (F.col("lon") >= -10) & (F.col("lon") <= 10)
            & (F.col("lat") >= -10) & (F.col("lat") <= 10)
        )
        .count()
    )
    assert n_q == want > 0

    plan = _run(
        spark, tmp_path, "query", "ev",
        "BBOX(geom, -10, -10, 10, 10)", "--explain",
    )
    assert "Physical Plan" in plan

    dest = str(tmp_path / "exp")
    _run(spark, tmp_path, "export", "ev", dest, "--format", "parquet")
    assert spark.read.parquet(dest).count() == n_src


def test_cli_analytics(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select("event_id", "lon", "lat").limit(
        800
    ).write.parquet(src)
    store = str(tmp_path / "store")
    _run(spark, tmp_path, "config", "addstore", "ev", "--path", store)
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(spark, tmp_path, "ingest", src, "ev", "sp", "--format", "parquet")

    kde_out = str(tmp_path / "kde")
    _run(
        spark, tmp_path, "analytic", "kde", "ev",
        "--min-level", "4", "--max-level", "4", "--out", kde_out,
    )
    kde = spark.read.parquet(kde_out)
    assert kde.count() > 0 and "percentile" in kde.columns

    nn = _run(
        spark, tmp_path, "analytic", "nn", "ev",
        "--lon", "0.0", "--lat", "0.0", "-k", "5", "--limit", "10",
    )
    assert len(nn.strip().splitlines()) == 6  # header + k rows

    db = _run(
        spark, tmp_path, "analytic", "dbscan", "ev",
        "--eps-milli", "2000", "--min-pts", "3", "--limit", "5",
    )
    assert "cluster" in db.splitlines()[0]

    # --cql input filter (KMeansRunner setCqlFilter parity): kNN restricted
    # to the east half returns only lon >= 0 neighbors
    nn_e = _run(
        spark, tmp_path, "analytic", "nn", "ev",
        "--lon", "0.0", "--lat", "0.0", "-k", "5", "--limit", "10",
        "--cql", "BBOX(geom, 0, -90, 180, 90)",
    )
    cols = nn_e.splitlines()[0].split("\t")
    east_ids = {
        str(r["event_id"])
        for r in spark.read.parquet(src).filter("lon >= 0").collect()
    }
    got_ids = {
        dict(zip(cols, line.split("\t")))["event_id"]
        for line in nn_e.strip().splitlines()[1:]
    }
    assert got_ids and got_ids <= east_ids

    # --hulls (KmeansSparkCommand setGenerateHulls parity): kmeans emits
    # per-cluster hull geometry rows instead of bare labels
    km = _run(
        spark, tmp_path, "analytic", "kmeans", "ev",
        "-k", "3", "--hulls", "--limit", "10",
    )
    head = km.splitlines()[0].split("\t")
    assert "hull_wkb" in head and "n_points" in head
    assert len(km.strip().splitlines()) == 4  # header + k hull rows


def test_cli_sql(spark, sf_dir, tmp_path):
    """`sql` verb (SparkSqlCommand/SqlQueryRunner parity): store names after
    FROM/JOIN become temp views, geometry UDFs are registered, results match
    direct DataFrame runs."""
    from pyspark.sql import functions as F

    from geowave_spark.functions import geometry as G

    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "value"
    ).limit(2000).write.parquet(src)
    store = str(tmp_path / "store")
    _run(spark, tmp_path, "config", "addstore", "ev", "--path", store)
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(spark, tmp_path, "ingest", src, "ev", "sp", "--format", "parquet")

    # single-store aggregate: view resolution + result parity
    got = _run(
        spark, tmp_path, "sql",
        "SELECT count(*) AS n FROM ev WHERE lon BETWEEN -10 AND 10",
    )
    want = (
        spark.read.parquet(src)
        .filter((F.col("lon") >= -10) & (F.col("lon") <= 10))
        .count()
    )
    assert got.splitlines()[0] == "n" and int(got.splitlines()[1]) == want

    # self-join through the FROM/JOIN token walk (the reference's two-store
    # path) — every row matches itself exactly once on the id column
    n_src = spark.read.parquet(src).count()
    got = _run(
        spark, tmp_path, "sql",
        "SELECT count(*) AS n FROM ev a JOIN ev b ON a.event_id = b.event_id",
    )
    assert int(got.splitlines()[1]) == n_src

    # geometry predicate UDFs are registered (GeomFunctionRegistry parity):
    # point-in-polygon through SQL over WKB literals
    box = G.wkb_polygon(
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]
    )
    inside, outside = G.wkb_point(1.0, 1.0), G.wkb_point(9.0, 9.0)
    got = _run(
        spark, tmp_path, "sql",
        "SELECT geomIntersects(unhex('%s'), unhex('%s')) AS a, "
        "geomIntersects(unhex('%s'), unhex('%s')) AS b"
        % (inside.hex(), box.hex(), outside.hex(), box.hex()),
    )
    assert got.splitlines()[1].split("\t") == ["True", "False"]

    # --explain prints a plan without running
    plan = _run(
        spark, tmp_path, "sql", "SELECT count(*) AS n FROM ev", "--explain"
    )
    assert "Physical Plan" in plan


def test_cli_remote(spark, sf_dir, tmp_path):
    """`remote` group (020-remote-commands.adoc parity): copy, mergedata,
    listadapter, listindex, clear."""
    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "value"
    ).limit(500).write.parquet(src)
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    _run(spark, tmp_path, "config", "addstore", "a", "--path", s1)
    _run(spark, tmp_path, "config", "addstore", "b", "--path", s2)
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(spark, tmp_path, "ingest", src, "a", "sp", "--format", "parquet")

    n = spark.read.parquet(s1).count()
    got = _run(spark, tmp_path, "remote", "copy", "a", "b")
    assert f"{n} rows" in got
    assert spark.read.parquet(s2).count() == n

    merged = json.loads(_run(spark, tmp_path, "remote", "mergedata", "b"))
    assert merged["partitions_seen"] > 0
    assert spark.read.parquet(s2).count() == n  # compaction preserves rows

    adapter = _run(spark, tmp_path, "remote", "listadapter", "a")
    assert "event_id\t" in adapter and "cell\tbigint" in adapter

    idx = json.loads(_run(spark, tmp_path, "remote", "listindex"))
    assert idx["sp"]["res"] == 29

    _run(spark, tmp_path, "remote", "clear", "b")
    assert not os.path.exists(s2)


def test_cli_kmeans_multilevel(spark, sf_dir, tmp_path):
    """--zoom-levels (Clustering.ZOOM_LEVELS parity): per-level labels;
    with --hulls only the finest level's cluster geometries emit."""
    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select("event_id", "lon", "lat").limit(
        400
    ).write.parquet(src)
    _run(spark, tmp_path, "config", "addstore", "ev", "--path", str(tmp_path / "s"))
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(spark, tmp_path, "ingest", src, "ev", "sp", "--format", "parquet")

    got = _run(
        spark, tmp_path, "analytic", "kmeans", "ev",
        "-k", "2", "--zoom-levels", "2", "--limit", "1000",
    )
    head = got.splitlines()[0].split("\t")
    assert "zoom_level" in head
    levels = {line.split("\t")[head.index("zoom_level")]
              for line in got.strip().splitlines()[1:]}
    assert levels == {"1", "2"}

    hulls = _run(
        spark, tmp_path, "analytic", "kmeans", "ev",
        "-k", "2", "--zoom-levels", "2", "--hulls", "--limit", "10",
    )
    hh = hulls.splitlines()[0].split("\t")
    assert "hull_wkb" in hh and "zoom_level" not in hh
    assert len(hulls.strip().splitlines()) <= 5  # header + ≤4 leaf hulls


def test_cli_pipeline_verb(spark, sf_dir, tmp_path):
    """`pipeline corpus` runs the checkpointed DAG, rerun skips, and
    --invalidate re-runs exactly the suffix."""
    _run(spark, tmp_path, "config", "addstore", "pl",
         "--path", str(tmp_path / "plstore"))
    out1 = _run(spark, tmp_path, "pipeline", "corpus", sf_dir, "pl",
                "--shard-bytes", str(1 << 14))
    assert out1.count("ran\t") == 4 and "skipped" not in out1
    out2 = _run(spark, tmp_path, "pipeline", "corpus", sf_dir, "pl",
                "--shard-bytes", str(1 << 14))
    assert out2.count("skipped\t") == 4 and "ran" not in out2
    out3 = _run(
        spark, tmp_path, "pipeline", "corpus", sf_dir, "pl",
        "--shard-bytes", str(1 << 14), "--invalidate", "corpus_split",
    )
    assert out3.count("ran\t") == 2 and out3.count("skipped\t") == 2

    # unknown stage / unknown store fail loudly, like every other verb
    import pytest

    with pytest.raises(SystemExit, match="unknown stage"):
        _run(spark, tmp_path, "pipeline", "corpus", sf_dir, "pl",
             "--invalidate", "splits")
    with pytest.raises(SystemExit, match="unknown store"):
        _run(spark, tmp_path, "pipeline", "corpus", sf_dir, "nope")


def test_cli_ingest_utm_crs(spark, tmp_path):
    """`ingest --crs EPSG:32633` transforms projected x/y to WGS84 via the
    closed-form Krüger inverse before indexing; a degree-space BBOX query
    then finds the rows."""
    import numpy as np

    from geowave_spark.functions import crs as CRS

    rng = np.random.RandomState(9)
    ex = rng.uniform(400_000, 600_000, 50)
    ey = rng.uniform(5_000_000, 5_300_000, 50)
    src = str(tmp_path / "utmsrc")
    spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(ex, ey))],
        "event_id long, x double, y double",
    ).write.parquet(src)
    store = str(tmp_path / "utmstore")
    _run(spark, tmp_path, "config", "addstore", "u", "--path", store)
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(
        spark, tmp_path, "ingest", src, "u", "sp", "--format", "parquet",
        "--crs", "EPSG:32633", "--lon-col", "x", "--lat-col", "y",
    )
    lon, lat = CRS.utm_inverse(ex, ey, 33)
    q = _run(
        spark, tmp_path, "query", "u",
        "BBOX(geom, 13.0, 45.0, 17.0, 48.5)", "--limit", "1000",
    )
    n_q = len(q.strip().splitlines()) - 1
    want = int(
        ((lon >= 13.0) & (lon <= 17.0) & (lat >= 45.0) & (lat <= 48.5)).sum()
    )
    assert n_q == want and want > 0


def test_cli_ingest_geotiff_scenes(spark, tmp_path):
    """`ingest --format geotiff`: UTM scenes land as 4326 envelopes in a
    tiered envelope store, queryable with a degree BBOX (the Landsat8
    RasterIngestRunner story end-to-end at the CLI surface)."""
    import numpy as np

    from geowave_spark.sources import tiff as TIF

    scenes = str(tmp_path / "scenes")
    os.makedirs(scenes)
    rng = np.random.RandomState(21)
    for i in range(6):
        pix = rng.randint(0, 65536, size=(32, 32), dtype=np.uint16)
        x0 = 400_000.0 + i * 20_000.0
        buf = TIF.encode_geotiff(
            pix, origin=(x0, 5_200_000.0), scale=(30.0, 30.0),
            compression=TIF.COMP_LZW, predictor=2, tile_size=(16, 16),
            epsg=32633,
        )
        with open(f"{scenes}/scene{i}.tif", "wb") as fh:
            fh.write(buf)
    store = str(tmp_path / "rstore")
    _run(spark, tmp_path, "config", "addstore", "r", "--path", store)
    _run(spark, tmp_path, "config", "addindex", "sp")
    got = _run(spark, tmp_path, "ingest", scenes, "r", "sp", "--format", "geotiff")
    assert "now holds" in got  # one row per (scene, covering cell)
    stored = spark.read.parquet(store)
    assert stored.select("file").distinct().count() == 6
    assert stored.filter(stored.epsg == 32633).select("file").distinct().count() == 6
    # a degree-space box over zone 33 mid-latitudes finds every scene
    q = _run(
        spark, tmp_path, "query", "r",
        "BBOX(geom, 13.0, 46.0, 15.5, 48.0)", "--limit", "100",
        "--id-col", "file",
    )
    assert len(q.strip().splitlines()) - 1 == 6


def test_cli_snapshot_and_mvt_export(spark, sf_dir, tmp_path):
    """snapshot commit/upsert/log/rollback/expire/metrics verbs + the
    z/x/y.mvt export tree."""
    from geowave_spark.sources import mvt as W

    src = str(tmp_path / "snap_src")
    TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "lon_milli", "lat_milli"
    ).write.parquet(src)
    store = str(tmp_path / "snap_store_src")
    snap = str(tmp_path / "snap_store")
    _run(spark, tmp_path, "config", "addstore", "ev", "--path", store)
    _run(spark, tmp_path, "config", "addstore", "sn", "--path", snap)
    _run(spark, tmp_path, "config", "addindex", "sp")
    _run(spark, tmp_path, "ingest", src, "ev", "sp", "--format", "parquet")

    got = _run(spark, tmp_path, "snapshot", "commit", "ev", "sn")
    assert "v1" in got
    got = _run(spark, tmp_path, "snapshot", "commit", "ev", "sn",
               "--upsert-key", "event_id")
    assert "v2" in got
    log = _run(spark, tmp_path, "snapshot", "log", "sn")
    assert "v1" in log and "upsert" in log
    metrics = _run(spark, tmp_path, "snapshot", "metrics", "sn")
    assert "commit=" in metrics and "rows=" in metrics
    _run(spark, tmp_path, "snapshot", "rollback", "sn", "1")
    _run(spark, tmp_path, "snapshot", "materialize", "sn")
    got = _run(spark, tmp_path, "snapshot", "expire", "sn", "--keep", "1")
    assert "expired versions" in got

    # MVT export: z/x/y.mvt tree decodes back to the ingested point count
    dest = str(tmp_path / "mvt_out")
    got = _run(spark, tmp_path, "export", "ev", dest, "--format", "mvt",
               "--level", "3")
    assert "mvt tiles at level 3" in got
    n = 0
    for root, _dirs, files in os.walk(dest):
        for f in files:
            assert f.endswith(".mvt")
            with open(os.path.join(root, f), "rb") as fh:
                layers = W.decode_tile(fh.read())
            n += len(layers["points"]["features"])
    assert n == spark.read.parquet(src).count()


def test_cli_query_auth_file(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from geowave_spark.operators import index as OI

    store = tmp_path / "visstore"
    geo = TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "lon_milli", "lat_milli"
    ).withColumn(
        "vis", F.when(F.col("event_id") % 2 == 0, "secret").otherwise("public")
    )
    OI.write_indexed(OI.index_points(geo, id_col="event_id"), str(store))
    _run(spark, tmp_path, "config", "addstore", "vs", "--path", str(store))
    auths = tmp_path / "auths.json"
    auths.write_text(json.dumps({"authorizationSet": {
        "alice": ["secret", "public"], "bob": ["public"]}}))
    cql = "BBOX(geom, -180, -90, 180, 90)"
    out_a = _run(spark, tmp_path, "query", "vs", cql,
                 "--out", str(tmp_path / "qa"),
                 "--auth-file", str(auths), "--user", "alice")
    out_b = _run(spark, tmp_path, "query", "vs", cql,
                 "--out", str(tmp_path / "qb"),
                 "--auth-file", str(auths), "--user", "bob")
    n_a = int(out_a.split("wrote ")[1].split()[0])
    n_b = int(out_b.split("wrote ")[1].split()[0])
    total = geo.count()
    evens = geo.filter(F.col("event_id") % 2 == 0).count()
    assert n_a == total
    assert n_b == total - evens


def test_cli_debug_verbs(spark, sf_dir, tmp_path):
    from geowave_spark.operators import index as OI

    store = tmp_path / "dbgstore"
    geo = TB.geo_events(spark, sf_dir).select(
        "event_id", "lon", "lat", "lon_milli", "lat_milli"
    )
    OI.write_indexed(OI.index_points(geo, id_col="event_id"), str(store))
    _run(spark, tmp_path, "config", "addstore", "dg", "--path", str(store))

    o = _run(spark, tmp_path, "debug", "fullscanMinimal", "dg")
    assert f"rows={geo.count()}" in o and "seconds=" in o
    o = _run(spark, tmp_path, "debug", "fullscan", "dg")
    assert f"rows={geo.count()}" in o
    o = _run(spark, tmp_path, "debug", "bbox", "dg", "138.6", "34.9",
             "140.5", "36.3")
    from pyspark.sql import functions as F

    exp = geo.filter(
        (F.col("lon") >= 138.6) & (F.col("lon") <= 140.5)
        & (F.col("lat") >= 34.9) & (F.col("lat") <= 36.3)
    ).count()
    assert f"rows={exp}" in o
    o = _run(spark, tmp_path, "debug", "decomp", "dg", "138.6", "34.9",
             "140.5", "36.3")
    lines = o.strip().splitlines()
    assert lines[0].startswith("cover_resolution\t")
    n_cells = int(lines[-1].split("\t")[1])
    assert n_cells >= 1 and sum(1 for L in lines if L.startswith("cell\t")) == n_cells


def test_cli_query_line_store(spark, sf_dir, tmp_path):
    from geowave_spark.operators import index as OI
    from geowave_spark.operators import lines as LN
    from geowave_spark.plans.cql import lines_cql_query

    store = tmp_path / "linestore"
    pts = TB.geo_track_points(spark, sf_dir)
    idx = LN.index_line_segments(LN.line_segments(pts))
    OI.write_indexed(idx, str(store))
    _run(spark, tmp_path, "config", "addstore", "ln", "--path", str(store))
    cql = "BBOX(geom, 138.6, 34.9, 140.5, 36.3)"
    out = _run(spark, tmp_path, "query", "ln", cql,
               "--out", str(tmp_path / "lq"))
    n = int(out.split("wrote ")[1].split()[0])
    want = lines_cql_query(OI.read_indexed(spark, str(store)), cql).count()
    assert n == want > 0


def test_cli_export_mvt_line_store(spark, tmp_path):
    from geowave_spark.operators import index as OI
    from geowave_spark.operators import lines as LN
    from geowave_spark.sources import mvt as W

    pts = spark.createDataFrame(
        [(t, j, 10_000 + t * 100 + j * 120, 10_000 + j * 90)
         for t in range(3) for j in range(4)],
        "track_id long, j long, x long, y long",
    )
    segs = LN.line_segments(pts)
    store = tmp_path / "lnstore"
    OI.write_indexed(LN.index_line_segments(segs), str(store))
    _run(spark, tmp_path, "config", "addstore", "lx", "--path", str(store))
    dest = tmp_path / "tiles"
    out = _run(spark, tmp_path, "export", "lx", str(dest),
               "--format", "mvt", "--level", "6")
    assert "mvt tiles" in out
    found = list(dest.rglob("*.mvt"))
    assert found
    dec = W.decode_tile(found[0].read_bytes())
    assert dec["lines"]["features"]
