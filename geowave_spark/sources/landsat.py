"""Landsat8 scene-catalog operators — the reference's landsat8 CLI
re-expressed over DataFrames.

Reference surface (file:line provenance, extensions/cli/landsat8/):

* ``SceneFeatureIterator.java:80-104`` — the public scene catalog
  (``scene_list`` CSV: entityId, acquisitionDate, cloudCover,
  processingLevel, path, row, envelope, download_url) iterated as
  features; ``:67-79`` the ``BestCloudCoverComparator``;
  ``nBestScenes`` keeps the N lowest-cloud scenes, optionally per
  WRS2 (path, row) cell.
* ``BandFeatureIterator.java:60-145`` — scenes × requested bands →
  band features (band name + per-band download URL).
* ``RasterIngestRunner.java:77-300`` — per-band GeoTIFFs merged into
  one multi-band coverage per scene, then ingested through the raster
  adapter.

Re-expression notes: the catalog is a plain splittable CSV scan (no
driver-side iterator); n-best is a rank window over the catalog (a few
KB per (path,row) group — never wide); band expansion is an explode of
a literal band array; band stacking is one ``applyInPandas`` per scene
group (each group holds that scene's ≤11 bands — bounded, no skew).
Scene CQL filtering reuses the engine's planners: the catalog carries
a 4326 envelope, so ``plans/cql.envelope_cql_query`` answers the
reference's ``--cql`` option over the same grammar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# landsat-pds scene_list column order (public dataset layout)
SCENE_LIST_COLUMNS = (
    "entityId", "acquisitionDate", "cloudCover", "processingLevel",
    "path", "row", "min_lat", "min_lon", "max_lat", "max_lon",
    "download_url",
)

# OLI/TIRS band names (public Landsat8 band plan)
ALL_BANDS = tuple(f"B{i}" for i in range(1, 12)) + ("BQA",)


def read_scene_catalog(spark: SparkSession, path: str) -> DataFrame:
    """scene_list CSV → catalog DataFrame with the engine's envelope
    column convention (minx/miny/maxx/maxy degrees) so the catalog drops
    straight into index_envelopes / envelope_cql_query."""
    df = (
        spark.read.option("header", "true")
        .csv(path)
        .select(
            F.col("entityId"),
            F.to_timestamp("acquisitionDate").alias("acquisitionDate"),
            F.col("cloudCover").cast("double").alias("cloudCover"),
            F.col("processingLevel"),
            F.col("path").cast("int").alias("path"),
            F.col("row").cast("int").alias("row"),
            F.col("min_lon").cast("double").alias("minx"),
            F.col("min_lat").cast("double").alias("miny"),
            F.col("max_lon").cast("double").alias("maxx"),
            F.col("max_lat").cast("double").alias("maxy"),
            F.col("download_url"),
        )
    )
    return df


def n_best_scenes(
    catalog: DataFrame,
    n: int,
    by_path_row: bool = True,
    group_cols: tuple[str, ...] = ("path", "row"),
) -> DataFrame:
    """The N lowest-cloud scenes — per spatial cell when ``by_path_row``
    (SceneFeatureIterator.nBestScenes semantics; ``group_cols`` is the
    cell key: WRS2 (path, row) for Landsat, ('location',) for the Theia/
    Sentinel-2 tile grid), else globally.  Deterministic tie-break on
    entityId so reruns and the SQL oracle agree.  A rank window per cell
    is safe at catalog scale: groups are scene counts per cell
    (hundreds), never data-volume-sized; the global variant is a single
    ordered limit."""
    if by_path_row:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("cloudCover").asc(), F.col("entityId").asc()
        )
        return (
            catalog.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= n)
            .drop("rk")
        )
    return catalog.orderBy(
        F.col("cloudCover").asc(), F.col("entityId").asc()
    ).limit(n)


def expand_bands(
    scenes: DataFrame, bands: tuple[str, ...] = ALL_BANDS
) -> DataFrame:
    """scenes × requested bands → band rows (BandFeatureIterator
    parity): a literal-array explode (zero shuffle), with the per-band
    object name derived the landsat-pds way ({entityId}_{band}.TIF)."""
    unknown = [b for b in bands if b not in ALL_BANDS]
    if unknown:
        raise ValueError(f"unknown Landsat8 bands {unknown}; have {ALL_BANDS}")
    out = scenes.withColumn("band", F.explode(F.array(*[F.lit(b) for b in bands])))
    return out.withColumn(
        "band_file", F.concat(F.col("entityId"), F.lit("_"), F.col("band"), F.lit(".TIF"))
    )


def analyze_catalog(catalog: DataFrame) -> DataFrame:
    """Catalog summary — the landsat8 ``analyze`` command's
    ``AnalysisInfo`` accumulator (AnalyzeRunner.java:104-162: path/row,
    lat/lon, date and cloud-cover ranges + scene count) as ONE
    map-side-combinable aggregation instead of a driver-side iterator."""
    return catalog.agg(
        F.count(F.lit(1)).alias("n_scenes"),
        F.min("path").alias("min_path"), F.max("path").alias("max_path"),
        F.min("row").alias("min_row"), F.max("row").alias("max_row"),
        F.min("minx").alias("min_lon"), F.max("maxx").alias("max_lon"),
        F.min("miny").alias("min_lat"), F.max("maxy").alias("max_lat"),
        F.min("acquisitionDate").alias("start_date"),
        F.max("acquisitionDate").alias("end_date"),
        F.min("cloudCover").alias("min_cloud_cover"),
        F.max("cloudCover").alias("max_cloud_cover"),
        F.avg("cloudCover").alias("avg_cloud_cover"),
    )


def read_theia_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Theia/Sentinel-2 scene catalog (GeoJSON FeatureCollection — the
    reference's theia SceneFeatureIterator.java:70-97 attribute set) →
    catalog DataFrame in the same envelope convention as the Landsat
    reader, so n_best_scenes (grouped on the ``location`` tile),
    envelope_cql_query and index_envelopes apply unchanged.

    The footprint envelope is computed from the GeoJSON polygon with
    pure column math (flatten + transform + array_min/max — no UDF)."""
    raw = spark.read.option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f"))
    flat = F.flatten(F.col("f.geometry.coordinates"))
    xs = F.transform(flat, lambda p: p[0])
    ys = F.transform(flat, lambda p: p[1])
    return feats.select(
        F.col("f.id").alias("entityId"),
        F.to_timestamp(F.col("f.properties.startDate")).alias("acquisitionDate"),
        F.col("f.properties.cloudCover").cast("double").alias("cloudCover"),
        F.col("f.properties.snowCover").cast("double").alias("snowCover"),
        F.col("f.properties.waterCover").cast("double").alias("waterCover"),
        F.col("f.properties.processingLevel"),
        F.col("f.properties.productIdentifier"),
        F.col("f.properties.productType"),
        F.col("f.properties.collection"),
        F.col("f.properties.platform"),
        F.col("f.properties.location"),
        F.col("f.properties.orbitNumber").cast("int").alias("orbitNumber"),
        F.col("f.properties.relativeOrbitNumber").cast("int").alias(
            "relativeOrbitNumber"
        ),
        F.array_min(xs).alias("minx"),
        F.array_min(ys).alias("miny"),
        F.array_max(xs).alias("maxx"),
        F.array_max(ys).alias("maxy"),
    )


# ---------------------------------------------------------------------------
# Band converters (Landsat8BandConverterSpi analogues): pure integer numpy
# kernels over the stacked coverage, lifted with mapInPandas.
# ---------------------------------------------------------------------------


def qa_ice_mask_plane(qa) -> "object":
    """QA band (uint16 bit flags) → ice-mask codes, the EXACT integer
    mapping of QABandToIceMaskConverter.getIceSample
    (extensions/cli/landsat8/.../qa/QABandToIceMaskConverter.java:76-96):
    0 = invalid (any of bits 0-2: fill/dropped-frame/occlusion),
    1 = cloud (bits 14-15 == 3 or bits 12-13 == 3),
    3 = ice (bits 10-11 > 1), 2 = clear otherwise."""
    import numpy as np

    qa = np.asarray(qa).astype(np.int64)
    out = np.where((qa >> 10) & 3 > 1, 3, 2).astype(np.uint8)
    cloud = (((qa >> 14) & 3) == 3) | (((qa >> 12) & 3) == 3)
    out[cloud] = 1
    out[(qa & 0x0007) > 0] = 0
    return out


def ndvi_milli_plane(nir, red) -> "object":
    """Fixed-point NDVI: (nir-red)·1000 // (nir+red), 0 where the
    denominator is 0 — integer end-to-end (the repo's oracle-parity
    convention; // floors, documented so a SQL twin can match)."""
    import numpy as np

    nir = np.asarray(nir).astype(np.int64)
    red = np.asarray(red).astype(np.int64)
    den = nir + red
    num = (nir - red) * 1000
    return np.where(den == 0, 0, np.floor_divide(num, np.where(den == 0, 1, den))).astype(np.int16)


_MASK_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_invalid", T.LongType()),
        T.StructField("n_cloud", T.LongType()),
        T.StructField("n_clear", T.LongType()),
        T.StructField("n_ice", T.LongType()),
        T.StructField("mask", T.BinaryType()),  # uint8 codes, row-major
    ]
)


def qa_ice_mask(stacked: DataFrame) -> DataFrame:
    """Stacked coverages → per-scene ice mask from the BQA plane (the
    'icemask' converter applied at ingest).  Scenes without a BQA band
    are dropped (the SPI returns the original coverage for non-QA bands;
    the mask product only exists where QA does)."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for b in batches:
            rows = []
            for r in b.itertuples():
                if "BQA" not in list(r.band_names):
                    continue
                i = list(r.band_names).index("BQA")
                dt = np.uint8 if r.bits == 8 else np.dtype("<u2")
                stack = np.frombuffer(r.pixels, dtype=dt).reshape(
                    r.h, r.w, len(r.band_names)
                )
                mask = qa_ice_mask_plane(stack[:, :, i])
                counts = np.bincount(mask.ravel(), minlength=4)
                rows.append(
                    (
                        r.scene_id, int(r.w), int(r.h),
                        int(counts[0]), int(counts[1]),
                        int(counts[2]), int(counts[3]),
                        mask.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MASK_SCHEMA.fields]
            )

    return stacked.mapInPandas(kernel, _MASK_SCHEMA)


_NDVI_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("ndvi_min", T.IntegerType()),
        T.StructField("ndvi_max", T.IntegerType()),
        T.StructField("ndvi_sum", T.LongType()),
        T.StructField("ndvi", T.BinaryType()),  # int16 milli-NDVI, LE words
    ]
)


def ndvi(stacked: DataFrame, nir: str = "B5", red: str = "B4") -> DataFrame:
    """Per-scene fixed-point NDVI plane + summary from the stacked
    coverage (band math over the RasterIngestRunner merge — the usual
    first derived product of a Landsat ingest)."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for b in batches:
            rows = []
            for r in b.itertuples():
                names = list(r.band_names)
                if nir not in names or red not in names:
                    raise ValueError(
                        f"scene {r.scene_id}: needs bands {nir},{red}; "
                        f"has {names}"
                    )
                dt = np.uint8 if r.bits == 8 else np.dtype("<u2")
                stack = np.frombuffer(r.pixels, dtype=dt).reshape(
                    r.h, r.w, len(names)
                )
                plane = ndvi_milli_plane(
                    stack[:, :, names.index(nir)], stack[:, :, names.index(red)]
                )
                rows.append(
                    (
                        r.scene_id, int(r.w), int(r.h),
                        int(plane.min()), int(plane.max()),
                        int(plane.sum(dtype=np.int64)),
                        plane.astype("<i2").tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _NDVI_SCHEMA.fields]
            )

    return stacked.mapInPandas(kernel, _NDVI_SCHEMA)


_STACK_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("band_names", T.ArrayType(T.StringType())),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("pixels", T.BinaryType()),  # chunky, little-endian words
    ]
)


def stack_bands(band_rasters: DataFrame, scene_regex: str = r"^(.*)_B\w+\.TIF$") -> DataFrame:
    """Per-band raster rows (read_geotiff over {scene}_B*.TIF files) →
    ONE multi-band coverage row per scene (RasterIngestRunner.java's
    per-scene band merge).

    Grouping key = scene id extracted from the file name; each group is
    that scene's band set (≤12 rows — bounded fan-in, no skew), stacked
    in band-name order into a chunky (h, w, n_bands) array.  Bands must
    agree on dims/depth — mismatches raise with the scene named rather
    than producing a silently misaligned stack."""
    import os
    import re

    import numpy as np
    import pandas as pd

    src = band_rasters.withColumn(
        "scene_id",
        F.regexp_extract(
            F.element_at(F.split(F.col("file"), "/"), -1), scene_regex, 1
        ),
    )

    def assemble(key, pdf):
        (scene_id,) = key
        pdf = pdf.sort_values("file")
        dims = {(int(r.w), int(r.h), int(r.bits)) for r in pdf.itertuples()}
        if len(dims) != 1:
            raise ValueError(
                f"scene {scene_id}: band dim/depth mismatch {sorted(dims)}"
            )
        w, h, bits = next(iter(dims))
        dt = np.uint8 if bits == 8 else np.dtype("<u2")
        names, planes = [], []
        for r in pdf.itertuples():
            m = re.search(r"_(B\w+)\.TIF$", os.path.basename(r.file))
            names.append(m.group(1) if m else os.path.basename(r.file))
            planes.append(
                np.frombuffer(r.pixels, dtype=dt).reshape(h, w, -1)[:, :, 0]
            )
        stack = np.stack(planes, axis=-1)  # chunky (h, w, n_bands)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                (
                    scene_id, w, h, len(planes), bits, names,
                    float(first.minx) if first.minx is not None else None,
                    float(first.miny) if first.miny is not None else None,
                    float(first.maxx) if first.maxx is not None else None,
                    float(first.maxy) if first.maxy is not None else None,
                    int(stack.sum(dtype=np.int64)),
                    stack.astype(dt).tobytes(),
                )
            ],
            columns=[f.name for f in _STACK_SCHEMA.fields],
        )

    return src.groupBy("scene_id").applyInPandas(assemble, _STACK_SCHEMA)
