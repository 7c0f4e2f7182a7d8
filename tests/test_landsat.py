"""Landsat8 scene-catalog operators (sources/landsat.py): catalog CSV
reader, n-best-scenes-by-cloud-cover selection, band expansion, and the
per-scene band stack — the reference's landsat8 CLI surface
(SceneFeatureIterator / BandFeatureIterator / RasterIngestRunner)."""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark.sources import landsat as LS
from geowave_spark.sources import tiff as TIF

CSV_HEADER = (
    "entityId,acquisitionDate,cloudCover,processingLevel,path,row,"
    "min_lat,min_lon,max_lat,max_lon,download_url"
)


def _catalog_csv(tmp_path, rows):
    p = tmp_path / "scene_list.csv"
    p.write_text("\n".join([CSV_HEADER] + rows) + "\n")
    return str(p)


def test_read_scene_catalog(spark, tmp_path):
    src = _catalog_csv(tmp_path, [
        "LC80010012024001LGN00,2024-01-01 10:00:00.000,12.5,L1TP,1,1,"
        "10.0,-20.0,12.0,-18.0,https://example.invalid/a",
        "LC80010012024017LGN00,2024-01-17 10:00:00.000,3.25,L1TP,1,1,"
        "10.0,-20.0,12.0,-18.0,https://example.invalid/b",
    ])
    got = LS.read_scene_catalog(spark, src).orderBy("entityId").collect()
    assert [r.cloudCover for r in got] == [12.5, 3.25]
    assert got[0].minx == -20.0 and got[0].maxy == 12.0
    assert got[0].path == 1 and got[0].row == 1
    assert got[0].acquisitionDate is not None


def test_n_best_scenes_per_path_row(spark, tmp_path):
    rows = []
    for path in (1, 2):
        for i in range(5):
            cc = [40.0, 10.0, 20.0, 10.0, 30.0][i]  # tie at 10.0
            rows.append(
                f"S{path}{i},2024-01-0{i+1} 00:00:00.000,{cc},L1TP,{path},7,"
                "0,0,1,1,u"
            )
    cat = LS.read_scene_catalog(spark, _catalog_csv(tmp_path, rows))
    best = LS.n_best_scenes(cat, 2)
    got = sorted((r.path, r.entityId) for r in best.collect())
    # per cell: the two cc=10.0 scenes, entityId ties broken ascending
    assert got == [(1, "S11"), (1, "S13"), (2, "S21"), (2, "S23")]
    top3 = LS.n_best_scenes(cat, 3, by_path_row=False)
    assert top3.count() == 3
    assert all(r.cloudCover == 10.0 for r in top3.take(2))


def test_expand_bands(spark, tmp_path):
    cat = LS.read_scene_catalog(spark, _catalog_csv(tmp_path, [
        "SC1,2024-01-01 00:00:00.000,1.0,L1TP,9,9,0,0,1,1,u",
    ]))
    bands = LS.expand_bands(cat, ("B2", "B3", "B4"))
    got = sorted(r.band_file for r in bands.collect())
    assert got == ["SC1_B2.TIF", "SC1_B3.TIF", "SC1_B4.TIF"]
    with pytest.raises(ValueError, match="unknown Landsat8 bands"):
        LS.expand_bands(cat, ("B2", "B99"))


def test_stack_bands_end_to_end(spark, tmp_path):
    """Two scenes × three uint16 UTM band files → one multi-band coverage
    row per scene, bands in name order, pixels round-tripping exactly."""
    rng = np.random.RandomState(17)
    want = {}
    for s, x0 in (("LC81", 400_000.0), ("LC82", 500_000.0)):
        planes = []
        for b in ("B2", "B3", "B4"):
            pix = rng.randint(0, 65536, size=(24, 32), dtype=np.uint16)
            planes.append(pix)
            buf = TIF.encode_geotiff(
                pix, origin=(x0, 5_100_000.0), scale=(30.0, 30.0),
                compression=TIF.COMP_LZW, predictor=2, epsg=32633,
            )
            (tmp_path / f"{s}_{b}.TIF").write_bytes(buf)
        want[s] = np.stack(planes, axis=-1)
    feats = TIF.read_geotiff(spark, str(tmp_path / "*.TIF"))
    out = {r.scene_id: r for r in LS.stack_bands(feats).collect()}
    assert set(out) == {"LC81", "LC82"}
    for s, r in out.items():
        assert (r.w, r.h, r.bands, r.bits) == (32, 24, 3, 16)
        assert r.band_names == ["B2", "B3", "B4"]
        back = np.frombuffer(r.pixels, dtype="<u2").reshape(24, 32, 3)
        np.testing.assert_array_equal(back, want[s])
        assert r.px_sum == int(want[s].sum(dtype=np.int64))
        assert r.minx is not None and r.minx < r.maxx  # 4326 envelope rode along


def test_stack_bands_dim_mismatch_raises(spark, tmp_path):
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((16, 24), np.uint8)
    for name, pix in (("SC_B2.TIF", a), ("SC_B3.TIF", b)):
        (tmp_path / name).write_bytes(
            TIF.encode_geotiff(pix, origin=(0.0, 1.0), scale=(0.01, 0.01))
        )
    feats = TIF.read_geotiff(spark, str(tmp_path / "*.TIF"))
    with pytest.raises(Exception, match="band dim/depth mismatch"):
        LS.stack_bands(feats).collect()


def test_analyze_catalog(spark, tmp_path):
    rows = [
        "S1,2024-01-05 00:00:00.000,12.5,L1TP,3,7,10.0,-20.0,12.0,-18.0,u",
        "S2,2024-02-01 00:00:00.000,3.25,L1TP,5,2,-5.0,30.0,-3.0,33.0,u",
        "S3,2024-01-20 00:00:00.000,50.0,L1TP,4,9,40.0,1.0,41.0,2.5,u",
    ]
    cat = LS.read_scene_catalog(spark, _catalog_csv(tmp_path, rows))
    r = LS.analyze_catalog(cat).collect()[0]
    assert r.n_scenes == 3
    assert (r.min_path, r.max_path, r.min_row, r.max_row) == (3, 5, 2, 9)
    assert (r.min_lon, r.max_lon) == (-20.0, 33.0)
    assert (r.min_lat, r.max_lat) == (-5.0, 41.0)
    assert (r.min_cloud_cover, r.max_cloud_cover) == (3.25, 50.0)
    assert abs(r.avg_cloud_cover - (12.5 + 3.25 + 50.0) / 3) < 1e-12
    assert str(r.start_date).startswith("2024-01-05")
    assert str(r.end_date).startswith("2024-02-01")


def test_cli_landsat_catalog_ingest(spark, tmp_path):
    """`ingest --format landsat`: scene footprints land as an envelope
    store; BBOX CQL answers as envelope intersection."""
    import io

    from geowave_spark.cli import main

    def run(*argv):
        out = io.StringIO()
        rc = main(["--config", str(tmp_path / "cfg.json"), *argv], spark=spark, out=out)
        assert rc == 0
        return out.getvalue()

    src = _catalog_csv(tmp_path, [
        "S1,2024-01-05 00:00:00.000,12.5,L1TP,3,7,10.0,-20.0,12.0,-18.0,u",
        "S2,2024-02-01 00:00:00.000,3.25,L1TP,5,2,-5.0,30.0,-3.0,33.0,u",
        "S3,2024-01-20 00:00:00.000,50.0,L1TP,4,9,40.0,1.0,41.0,2.5,u",
    ])
    store = str(tmp_path / "lstore")
    run("config", "addstore", "ls", "--path", store)
    run("config", "addindex", "sp")
    run("ingest", src, "ls", "sp", "--format", "landsat")
    q = run(
        "query", "ls", "BBOX(geom, 25.0, -10.0, 35.0, 0.0)",
        "--id-col", "entityId", "--limit", "10",
    )
    lines = q.strip().splitlines()
    assert len(lines) - 1 == 1 and "S2" in lines[1]


def test_qa_ice_mask_bit_truth_table():
    """Exact QABandToIceMaskConverter.getIceSample mapping."""
    qa = np.array([
        0x0001,          # fill bit -> invalid 0
        0x0004,          # occlusion bit -> invalid 0
        0b11 << 14,      # cloud conf 3 -> cloud 1
        0b11 << 12,      # cirrus conf 3 -> cloud 1
        0b10 << 10,      # snow/ice conf 2 -> ice 3
        0b11 << 10,      # snow/ice conf 3 -> ice 3
        0b01 << 10,      # snow/ice conf 1 -> clear 2
        0x0000,          # nothing -> clear 2
        (0b11 << 14) | 1,  # fill wins over cloud -> 0
    ], dtype=np.uint16)
    got = LS.qa_ice_mask_plane(qa)
    assert got.tolist() == [0, 0, 1, 1, 3, 3, 2, 2, 0]


def test_ndvi_milli_plane_closed_form():
    nir = np.array([[600, 0, 100]], dtype=np.uint16)
    red = np.array([[200, 0, 300]], dtype=np.uint16)
    got = LS.ndvi_milli_plane(nir, red)
    assert got.dtype == np.int16
    # (600-200)*1000 // 800 = 500; 0/0 -> 0; (100-300)*1000 // 400 = -500
    assert got.tolist() == [[500, 0, -500]]


def test_qa_mask_and_ndvi_end_to_end(spark, tmp_path):
    """stack_bands → qa_ice_mask + ndvi over a scene with B4/B5/BQA."""
    rng = np.random.RandomState(23)
    planes = {}
    for b in ("B4", "B5", "BQA"):
        pix = rng.randint(0, 65536, size=(16, 16), dtype=np.uint16)
        planes[b] = pix
        (tmp_path / f"LC89_{b}.TIF").write_bytes(
            TIF.encode_geotiff(pix, origin=(10.0, 50.0), scale=(0.01, 0.01))
        )
    stacked = LS.stack_bands(TIF.read_geotiff(spark, str(tmp_path / "*.TIF")))
    m = LS.qa_ice_mask(stacked).collect()[0]
    want_mask = LS.qa_ice_mask_plane(planes["BQA"])
    assert np.frombuffer(m.mask, np.uint8).reshape(16, 16).tolist() == want_mask.tolist()
    assert (
        m.n_invalid + m.n_cloud + m.n_clear + m.n_ice == 256
        and m.n_invalid == int((want_mask == 0).sum())
    )
    n = LS.ndvi(stacked).collect()[0]
    want = LS.ndvi_milli_plane(planes["B5"], planes["B4"])
    np.testing.assert_array_equal(
        np.frombuffer(n.ndvi, "<i2").reshape(16, 16), want
    )
    assert n.ndvi_sum == int(want.sum(dtype=np.int64))
    # scene without the needed bands raises with the scene named
    import pytest as _pytest

    only_b4 = stacked  # same stack but ask for a missing band name
    with _pytest.raises(Exception, match="needs bands"):
        LS.ndvi(only_b4, nir="B6").collect()


THEIA_JSON = """{
  "type": "FeatureCollection",
  "features": [
    {"type": "Feature", "id": "T1A",
     "properties": {"startDate": "2024-03-01 10:30:00", "cloudCover": 20.0,
       "snowCover": 0.0, "waterCover": 5.0, "processingLevel": "LEVEL2A",
       "productIdentifier": "S2A_T31TCJ_A", "productType": "REFLECTANCE",
       "collection": "SENTINEL2", "platform": "S2A", "location": "T31TCJ",
       "orbitNumber": 100, "relativeOrbitNumber": 51},
     "geometry": {"type": "Polygon",
       "coordinates": [[[1.0, 43.0], [2.1, 43.0], [2.1, 44.1], [1.0, 44.1], [1.0, 43.0]]]}},
    {"type": "Feature", "id": "T1B",
     "properties": {"startDate": "2024-03-11 10:30:00", "cloudCover": 4.5,
       "snowCover": 0.0, "waterCover": 5.0, "processingLevel": "LEVEL2A",
       "productIdentifier": "S2A_T31TCJ_B", "productType": "REFLECTANCE",
       "collection": "SENTINEL2", "platform": "S2A", "location": "T31TCJ",
       "orbitNumber": 101, "relativeOrbitNumber": 51},
     "geometry": {"type": "Polygon",
       "coordinates": [[[1.0, 43.0], [2.1, 43.0], [2.1, 44.1], [1.0, 44.1], [1.0, 43.0]]]}},
    {"type": "Feature", "id": "T2A",
     "properties": {"startDate": "2024-03-02 10:40:00", "cloudCover": 9.0,
       "snowCover": 1.0, "waterCover": 0.0, "processingLevel": "LEVEL2A",
       "productIdentifier": "S2B_T32ULU_A", "productType": "REFLECTANCE",
       "collection": "SENTINEL2", "platform": "S2B", "location": "T32ULU",
       "orbitNumber": 7, "relativeOrbitNumber": 8},
     "geometry": {"type": "Polygon",
       "coordinates": [[[8.0, 48.0], [9.2, 48.0], [9.2, 49.1], [8.0, 49.1], [8.0, 48.0]]]}}
  ]
}"""


def test_read_theia_catalog_and_best_per_tile(spark, tmp_path):
    """Theia/Sentinel-2 GeoJSON catalog: attributes + column-math envelope;
    n_best_scenes grouped on the tile location."""
    p = tmp_path / "theia.json"
    p.write_text(THEIA_JSON)
    cat = LS.read_theia_catalog(spark, str(p))
    rows = {r.entityId: r for r in cat.collect()}
    assert set(rows) == {"T1A", "T1B", "T2A"}
    r = rows["T1A"]
    assert (r.minx, r.miny, r.maxx, r.maxy) == (1.0, 43.0, 2.1, 44.1)
    assert r.location == "T31TCJ" and r.platform == "S2A"
    assert r.cloudCover == 20.0 and r.relativeOrbitNumber == 51
    assert str(r.acquisitionDate).startswith("2024-03-01")

    best = LS.n_best_scenes(cat, 1, group_cols=("location",))
    got = sorted(r.entityId for r in best.collect())
    assert got == ["T1B", "T2A"]  # lowest cloud per tile


def test_landsat_pipeline_end_to_end_and_resume(spark, tmp_path):
    """pipeline landsat: catalog select → band stack (selected scenes
    only) → QA mask + NDVI products, all checkpointed; second run skips
    every stage."""
    import io

    from geowave_spark.cli import main

    # catalog: two (path,row) cells, 2 scenes each; n_best=1 keeps one per
    # cell — LOW1 and LOW2; HIGH* band files on disk must be dropped
    src = _catalog_csv(tmp_path, [
        "LOW1,2024-01-01 00:00:00.000,5.0,L1TP,1,1,40.0,10.0,41.0,11.0,u",
        "HIGH1,2024-01-02 00:00:00.000,80.0,L1TP,1,1,40.0,10.0,41.0,11.0,u",
        "LOW2,2024-01-03 00:00:00.000,7.0,L1TP,2,2,42.0,12.0,43.0,13.0,u",
        "HIGH2,2024-01-04 00:00:00.000,90.0,L1TP,2,2,42.0,12.0,43.0,13.0,u",
    ])
    scenes = tmp_path / "scenes"
    scenes.mkdir()
    rng = np.random.RandomState(31)
    for s in ("LOW1", "HIGH1", "LOW2", "HIGH2"):
        for b in ("B4", "B5", "BQA"):
            pix = rng.randint(0, 65536, size=(16, 16), dtype=np.uint16)
            (scenes / f"{s}_{b}.TIF").write_bytes(
                TIF.encode_geotiff(pix, origin=(10.0, 41.0), scale=(0.01, 0.01))
            )
    store = str(tmp_path / "lpstore")

    def run(*argv):
        out = io.StringIO()
        rc = main(["--config", str(tmp_path / "cfg.json"), *argv], spark=spark, out=out)
        assert rc == 0
        return out.getvalue()

    run("config", "addstore", "lp", "--path", store)
    got = run(
        "pipeline", "landsat", str(scenes / "*.TIF"), "lp",
        "--catalog", src, "--n-best", "1",
    )
    assert got.count("ran\t") == 4 and "skipped" not in got
    stacked = spark.read.parquet(f"{store}/scene_stack")
    assert sorted(r.scene_id for r in stacked.collect()) == ["LOW1", "LOW2"]
    assert spark.read.parquet(f"{store}/scene_mask").count() == 2
    ndvi = spark.read.parquet(f"{store}/scene_ndvi")
    assert ndvi.count() == 2 and "ndvi_sum" in ndvi.columns
    # lineage is queryable per stage
    from geowave_spark.checkpoint import Pipeline

    mt = Pipeline(spark, store).metrics_table()
    assert mt.filter(mt.stage == "scene_stack").count() >= 1

    again = run(
        "pipeline", "landsat", str(scenes / "*.TIF"), "lp",
        "--catalog", src, "--n-best", "1",
    )
    assert again.count("skipped\t") == 4 and "ran\t" not in again
