"""Stage checkpointing with per-partition lineage + row-count metrics —
the resumability layer (BASELINE north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

No direct analogue in the reference (its recoverability is the KV store's
durable writes + recoverable ingest staging); for a 100 TB Spark pipeline
the unit of recovery is the *stage*: a deterministic transform from input
tables to one output table.  Each completed stage records a manifest:

* ``fingerprint`` — hash of (stage name, input paths, params) so a changed
  input or config invalidates the checkpoint;
* ``partitions``  — per-partition row counts of the written output (the
  lineage/metrics record, queryable as a DataFrame);
* ``n_rows``, ``wall_sec``.

``Pipeline.run_stage`` skips any stage whose manifest matches the current
fingerprint and whose output exists — a restarted job re-runs only the
stages after the failure point.  The manifest store is a ``_checkpoints``
directory of JSON files (production: an Iceberg table with the same
schema; the write is atomic via rename in both cases).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _input_identity(path: str) -> list:
    """Content identity of one input: (relpath, size, mtime_ns) per file.

    A rewritten-in-place input (same path, new bytes) must invalidate the
    checkpoint; size+mtime is the parquet-on-filesystem stand-in for a
    table snapshot id (the Iceberg production case uses the snapshot id)."""
    out = []
    if os.path.isfile(path):
        st = os.stat(path)
        return [[os.path.basename(path), st.st_size, st.st_mtime_ns]]
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                out.append([os.path.relpath(fp, path), st.st_size, st.st_mtime_ns])
    return sorted(out)


def _fingerprint(stage: str, inputs: list[str], params: dict) -> str:
    blob = json.dumps(
        {
            "stage": stage,
            "inputs": sorted(inputs),
            "identity": [_input_identity(p) for p in sorted(inputs)],
            "params": params,
        },
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


@dataclass
class Pipeline:
    spark: SparkSession
    root: str  # store root; manifests under <root>/_checkpoints
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, "_checkpoints", f"{stage}.json")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def partition_metrics(self, stage: str) -> DataFrame:
        """The recorded per-partition lineage as a DataFrame."""
        m = self.manifest(stage)
        if m is None:
            raise KeyError(f"no checkpoint for stage {stage}")
        return self.spark.createDataFrame(
            [(stage, p["partition_id"], p["n_rows"]) for p in m["partitions"]],
            "stage string, partition_id int, n_rows long",
        )

    METRICS_SCHEMA = (
        "stage string, fingerprint string, partition_id int, "
        "n_rows long, stage_rows long, wall_sec double"
    )

    def metrics_table(self) -> DataFrame:
        """ALL recorded stage lineage as one DataFrame (reads the parquet
        metrics store — the queryable form of the JSON manifests).
        Schema-stable empty result when nothing has been recorded yet."""
        mdir = os.path.join(self.root, "_checkpoints", "metrics")
        stages = (
            [d for d in sorted(os.listdir(mdir)) if not d.startswith((".", "_"))]
            if os.path.isdir(mdir)
            else []
        )
        if not stages:
            return self.spark.createDataFrame([], self.METRICS_SCHEMA)
        return self.spark.read.parquet(*(os.path.join(mdir, s) for s in stages))

    def _write_metrics(self, manifest: dict) -> None:
        self.spark.createDataFrame(
            [
                (manifest["stage"], manifest["fingerprint"],
                 p["partition_id"], p["n_rows"],
                 manifest["n_rows"], manifest["wall_sec"])
                for p in manifest["partitions"]
            ],
            self.METRICS_SCHEMA,
        ).write.mode("overwrite").parquet(
            os.path.join(self.root, "_checkpoints", "metrics", manifest["stage"])
        )

    def run_stage(
        self,
        stage: str,
        build: Callable[[SparkSession], DataFrame],
        inputs: list[str],
        params: dict | None = None,
        out_format: str = "parquet",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Execute (or skip) one stage; returns the stage's output frame.

        The output lands at ``<root>/<stage>``; metrics are collected from
        the *written* data (read back), so the recorded counts describe
        exactly what a resumed run will consume."""
        params = params or {}
        fp = _fingerprint(stage, inputs, params)
        out_path = os.path.join(self.root, stage)
        m = self.manifest(stage)
        if m is not None and m["fingerprint"] == fp and os.path.exists(out_path):
            # backfill the queryable lineage for stores checkpointed before
            # the metrics table existed (skip path never re-runs the stage)
            if not os.path.isdir(
                os.path.join(self.root, "_checkpoints", "metrics", stage)
            ):
                self._write_metrics(m)
            self.stages_skipped.append(stage)
            return self.spark.read.format(out_format).load(out_path)

        t0 = time.time()
        df = build(self.spark)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        getattr(writer, out_format)(out_path)

        written = self.spark.read.format(out_format).load(out_path)
        parts = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
        manifest = {
            "stage": stage,
            "fingerprint": fp,
            "inputs": sorted(inputs),
            "params": params,
            "n_rows": int(sum(p["n_rows"] for p in parts)),
            "wall_sec": round(time.time() - t0, 3),
            "partitions": [
                {"partition_id": int(p["partition_id"]), "n_rows": int(p["n_rows"])}
                for p in sorted(parts, key=lambda r: r["partition_id"])
            ],
        }
        mp = self._manifest_path(stage)
        os.makedirs(os.path.dirname(mp), exist_ok=True)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mp)  # atomic publish
        # the same lineage as a QUERYABLE table (north_rule: "checkpoints
        # per-partition lineage + row counts to Iceberg"): one parquet per
        # stage under _checkpoints/metrics — downstream jobs join/monitor it
        # without the Pipeline object; production is the same rows appended
        # to an Iceberg metrics table.
        self._write_metrics(manifest)
        self.stages_run.append(stage)
        return written

    def invalidate(self, stage: str) -> None:
        import shutil

        p = self._manifest_path(stage)
        if os.path.exists(p):
            os.remove(p)
        # keep the queryable lineage in lockstep with the manifests — a
        # metrics row for a checkpoint that no longer exists is a lie
        shutil.rmtree(
            os.path.join(self.root, "_checkpoints", "metrics", stage),
            ignore_errors=True,
        )


def ingest_pipeline(
    spark: SparkSession, sf_dir: str, store: str, salt_buckets: int = 16
) -> Pipeline:
    """The standard ingest DAG: index → stats, checkpointed per stage.

    A rerun with unchanged inputs skips both stages; deleting the stats
    manifest re-runs only stats (reading the indexed checkpoint)."""
    from geowave_spark import stats as S
    from geowave_spark.operators import index as OI
    from geowave_spark.sources import tables as TB

    pipe = Pipeline(spark, store)

    def build_indexed(sp: SparkSession) -> DataFrame:
        geo = TB.geo_events(sp, sf_dir)
        return OI.index_points(geo, id_col="event_id", salt_buckets=salt_buckets)

    indexed = pipe.run_stage(
        "indexed",
        build_indexed,
        inputs=[f"{sf_dir}/events.parquet"],
        params={"salt_buckets": salt_buckets, "res": OI.C.MAX_RES},
        partition_by=["cell_p"],
    )

    def build_stats(sp: SparkSession) -> DataFrame:
        return S.tier_counts(indexed)

    pipe.run_stage(
        "stats_tier_counts",
        build_stats,
        inputs=[os.path.join(store, "indexed")],
        params={},
    )
    return pipe


def corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    store: str,
    weights: tuple[float, ...] = (0.90, 0.05, 0.05),
    shard_bytes: int | None = None,
) -> Pipeline:
    """The training-data DAG end-to-end, checkpointed per stage:

    1. ``corpus_prep`` — language/quality/length gates + exact and
       near-dup removal with per-doc drop attribution, emitting the
       near-dup GROUP id it derived the verdict from (return_groups —
       the LSH kernel runs exactly once in the DAG);
    2. ``corpus_groups`` — cheap projection of stage 1's checkpoint to
       the (doc_id, group_id, keep) frame the split consumes (docs that
       reached the near-dup gate: stage near_dup|kept);
    3. ``corpus_split`` — leakage-safe train/val/test hashed on the
       GROUP id, so a kept representative and every near-dup it absorbed
       land in the same split (an eval doc can never have a train-side
       twin);
    4. ``corpus_shards`` — WebDataset-style shard assignment over the
       kept train docs (UTF-8 byte-block cut in h64 pseudo-shuffle
       order; default ``corpus.SHARD_BYTES`` nominal shards).

    Stage names are pipeline-prefixed so corpus_pipeline and
    image_pipeline can share one store root without clobbering each
    other's checkpoints.  Each stage persists output + per-partition
    lineage (the north-rule resumability contract); a rerun skips green
    stages, and invalidating one re-runs exactly the dependent suffix."""
    from geowave_spark.operators import corpus as OC
    from geowave_spark.operators import dedup as OD

    if shard_bytes is None:
        shard_bytes = OC.SHARD_BYTES
    pipe = Pipeline(spark, store)
    doc_path = os.path.join(sf_dir, "documents.parquet")

    def build_prep(sp: SparkSession) -> DataFrame:
        return OD.corpus_prep(sp.read.parquet(doc_path), return_groups=True)

    prep = pipe.run_stage(
        "corpus_prep", build_prep, inputs=[doc_path],
        params={"return_groups": True},
    )

    def build_groups(sp: SparkSession) -> DataFrame:
        return prep.filter(F.col("stage").isin("near_dup", "kept")).select(
            "doc_id", "group_id", (F.col("stage") == "kept").alias("keep")
        )

    groups = pipe.run_stage(
        "corpus_groups",
        build_groups,
        inputs=[os.path.join(store, "corpus_prep")],
        params={},
    )

    def build_split(sp: SparkSession) -> DataFrame:
        return OD.leakage_safe_split(groups, weights=weights)

    split = pipe.run_stage(
        "corpus_split",
        build_split,
        inputs=[os.path.join(store, "corpus_groups")],
        params={"weights": list(weights)},
    )

    def build_shards(sp: SparkSession) -> DataFrame:
        docs = sp.read.parquet(doc_path)
        kept = groups.filter(F.col("keep")).select("doc_id")
        train = split.filter(F.col("split") == "train").select("doc_id")
        items = (
            docs.join(kept, "doc_id")
            .join(train, "doc_id")
            .select(
                "doc_id",
                F.octet_length("text").cast("long").alias("n_bytes"),
            )
        )
        return OC.shard_assign(
            items, "n_bytes", shard_bytes=shard_bytes, id_col="doc_id"
        )

    pipe.run_stage(
        "corpus_shards",
        build_shards,
        inputs=[
            doc_path,
            os.path.join(store, "corpus_groups"),
            os.path.join(store, "corpus_split"),
        ],
        params={"shard_bytes": shard_bytes},
    )
    return pipe


def image_pipeline(
    spark: SparkSession,
    images_path: str,
    store: str,
    weights: tuple[float, ...] = (0.90, 0.05, 0.05),
    batch_size: int = 64,
) -> Pipeline:
    """The IMAGE-side training-data DAG (the input_hint table end-to-end),
    checkpointed per stage:

    1. ``image_features`` — decode in quarantine mode (one corrupt blob
       among 10^12 cannot kill the job): w/h/luminance/dhash per image,
       failures kept as err rows for the quarantine sink;
    2. ``dedup_groups`` — banded-hamming pairs over the dhash + union-find
       canonicalization (group_id, keep) per decodable image;
    3. ``split`` — leakage-safe train/val/test hashed on the dup GROUP;
    4. ``train_batches`` — aspect-ratio bucketed fixed-size batches over
       the kept train images (shape-compatible training batches, tails
       flagged).

    Join/dedup key: ``img_num = h64(image_id)`` (the md5-derived 60-bit
    id hash) — assumes NOTHING about the id format, unlike a digit-run
    extraction (which crashes under ANSI on digitless ids and collides
    on 'batch2/img1' vs 'batch3/img1').  Stage names are
    pipeline-prefixed so both DAGs can share one store root.  Same
    resume contract as :func:`corpus_pipeline`."""
    from geowave_spark.operators import dedup as OD
    from geowave_spark.operators import multimodal as MM
    from geowave_spark.operators.text import h64_col

    pipe = Pipeline(spark, store)

    def build_features(sp: SparkSession) -> DataFrame:
        return MM.image_features(
            sp.read.parquet(images_path), on_error="quarantine"
        )

    feats = pipe.run_stage(
        "image_features", build_features, inputs=[images_path], params={}
    )

    def build_groups(sp: SparkSession) -> DataFrame:
        ok = feats.filter(F.col("err").isNull()).select(
            "image_id", h64_col(F.col("image_id")).alias("img_num"), "dhash"
        )
        pairs = OD.hamming_pairs(ok, "dhash", "img_num")
        can = OD.canonicalize(ok.select("img_num"), pairs, id_col="img_num")
        return can.join(ok.select("image_id", "img_num"), "img_num")

    groups = pipe.run_stage(
        "image_dedup_groups",
        build_groups,
        inputs=[os.path.join(store, "image_features")],
        params={},
    )

    def build_split(sp: SparkSession) -> DataFrame:
        return OD.leakage_safe_split(groups, weights=weights, id_col="img_num")

    split = pipe.run_stage(
        "image_split",
        build_split,
        inputs=[os.path.join(store, "image_dedup_groups")],
        params={"weights": list(weights)},
    )

    def build_batches(sp: SparkSession) -> DataFrame:
        kept = groups.filter(F.col("keep")).select("image_id", "img_num")
        train = split.filter(F.col("split") == "train").select("img_num")
        imgs = (
            feats.filter(F.col("err").isNull())
            .join(kept, "image_id")
            .join(train, "img_num")
            .select("image_id", "w", "h")
        )
        return MM.aspect_bucket_batches(imgs, batch_size=batch_size)

    pipe.run_stage(
        "image_batches",
        build_batches,
        inputs=[
            os.path.join(store, "image_features"),
            os.path.join(store, "image_dedup_groups"),
            os.path.join(store, "image_split"),
        ],
        params={"batch_size": batch_size},
    )
    return pipe


def raster_pipeline(
    spark: SparkSession,
    images_path: str,
    store: str,
    level: int = 6,
    min_level: int = 3,
) -> Pipeline:
    """The raster DAG (the reference's RasterDataAdapter ingest story —
    mosaic + resize pyramid + overview statistics) with per-stage resume:

    1. ``raster_tiles`` — assign every image to its level-``level`` tiles
       and mosaic-merge contributions per tile (NoData semantics, newest
       wins);
    2. ``raster_pyramid`` — stitch+downsample L→L-1 repeatedly down to
       ``min_level`` (the RasterTileResize job per step; at production
       scale each level would be its own stage — collapsed here because
       the level count is small and fixed);
    3. ``raster_overviews`` — per-level coverage stats over base +
       pyramid (tile counts, index bounds, total contributions).

    Same fingerprinted-manifest resume contract as the other DAGs."""
    from geowave_spark.operators import tiling as OTL

    if not 0 <= min_level < level:
        raise ValueError(
            f"raster_pipeline: need 0 <= min_level < level "
            f"(got level={level}, min_level={min_level})"
        )
    pipe = Pipeline(spark, store)

    def build_tiles(sp: SparkSession) -> DataFrame:
        imgs = sp.read.parquet(images_path)
        return OTL.render_tiles(OTL.assign_tiles(imgs, level=level))

    base = pipe.run_stage(
        "raster_tiles", build_tiles, inputs=[images_path],
        params={"level": level},
    )

    tile_cols = ["tile_cell", "level", "tile_ix", "tile_iy", "tile_png"]

    def build_pyramid(sp: SparkSession) -> DataFrame:
        cur = base.select(*tile_cols)
        out = None
        for _ in range(level - min_level):
            # localCheckpoint per round: without it the written union's
            # branches chain retile(retile(...)) and each level's PNG
            # decode+re-encode re-executes O(depth^2) times (CLAUDE.md:
            # driver-looped iteration must checkpoint per round)
            nxt = OTL.retile_coarser(cur).localCheckpoint()
            out = nxt if out is None else out.unionByName(nxt)
            cur = nxt.select(*tile_cols)
        return out

    pyramid = pipe.run_stage(
        "raster_pyramid",
        build_pyramid,
        inputs=[os.path.join(store, "raster_tiles")],
        params={"level": level, "min_level": min_level},
        partition_by=["level"],
    )

    cov_cols = [
        "level", "n_tiles", "min_ix", "max_ix", "min_iy", "max_iy",
        "total_contributions",
    ]

    def build_overviews(sp: SparkSession) -> DataFrame:
        base_cov = OTL.overview_stats(base).select(*cov_cols)
        pyr_cov = OTL.overview_stats(
            pyramid, contributions_col="n_children"
        ).select(*cov_cols)
        return base_cov.unionByName(pyr_cov)

    pipe.run_stage(
        "raster_overviews",
        build_overviews,
        inputs=[
            os.path.join(store, "raster_tiles"),
            os.path.join(store, "raster_pyramid"),
        ],
        params={},
    )
    return pipe


def landsat_pipeline(
    spark: SparkSession,
    scenes_glob: str,
    store: str,
    catalog: str,
    n_best: int = 2,
) -> Pipeline:
    """The Landsat scene DAG (the reference's landsat8 analyze →
    download-best → raster-ingest flow, extensions/cli/landsat8), with
    per-stage resume:

    1. ``scene_select`` — catalog CSV → the ``n_best`` lowest-cloud
       scenes per WRS2 (path, row) cell (SceneFeatureIterator.nBestScenes);
    2. ``scene_stack`` — per-band GeoTIFFs under ``scenes_glob`` decoded
       and stacked into one multi-band coverage per scene
       (RasterIngestRunner's band merge), kept only for SELECTED scenes
       (broadcast semi-join on entityId — the selection is
       catalog-sized);
    3. ``scene_mask`` — the QA-band ice-mask product with per-class
       pixel counts (QABandToIceMaskConverter);
    4. ``scene_ndvi`` — fixed-point milli-NDVI plane + summary (band
       math over the merged coverage; scenes must carry B4/B5).

    Same fingerprinted-manifest resume contract as the other DAGs."""
    from geowave_spark.sources import landsat as LS
    from geowave_spark.sources import tiff as TIF

    pipe = Pipeline(spark, store)

    def build_select(sp: SparkSession) -> DataFrame:
        return LS.n_best_scenes(LS.read_scene_catalog(sp, catalog), n_best)

    selected = pipe.run_stage(
        "scene_select", build_select, inputs=[catalog],
        params={"n_best": n_best},
    )

    def build_stack(sp: SparkSession) -> DataFrame:
        stacked = LS.stack_bands(TIF.read_geotiff(sp, scenes_glob))
        keep = selected.select(F.col("entityId").alias("scene_id")).distinct()
        return stacked.join(F.broadcast(keep), "scene_id", "left_semi")

    stacked = pipe.run_stage(
        "scene_stack", build_stack,
        inputs=[scenes_glob, os.path.join(store, "scene_select")],
        params={},
    )

    pipe.run_stage(
        "scene_mask", lambda sp: LS.qa_ice_mask(stacked),
        inputs=[os.path.join(store, "scene_stack")], params={},
    )
    pipe.run_stage(
        "scene_ndvi", lambda sp: LS.ndvi(stacked),
        inputs=[os.path.join(store, "scene_stack")], params={},
    )
    return pipe
