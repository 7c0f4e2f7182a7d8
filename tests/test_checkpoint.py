"""Stats layer + stage checkpointing/resumability (SURVEY §2.6, north_rule
'resumable from checkpoint with per-partition lineage + metrics')."""

from __future__ import annotations

import os

from geowave_spark import stats as S
from geowave_spark.checkpoint import Pipeline, ingest_pipeline
from geowave_spark.operators import index as OI
from geowave_spark.sources import tables as TB


def test_stats_tables(spark, sf_dir, tmp_path):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    summ = S.summary_stats(geo).collect()[0]
    assert summ["n_rows"] == geo.count() == summ["n_ids"]
    assert -180 <= summ["min_lon"] <= summ["max_lon"] < 180
    tc = {r["tier"]: r["n_rows"] for r in S.tier_counts(geo).collect()}
    assert tc == {OI.C.MAX_RES: summ["n_rows"]}
    hist = S.cell_histogram(geo)
    assert hist.agg({"n_rows": "sum"}).collect()[0][0] == summ["n_rows"]
    # skewed synthetic distribution must surface hot cells
    assert S.hot_cells(hist).count() > 0
    store = str(tmp_path / "store")
    S.write_stats(geo, store)
    assert S.read_tiers(spark, store) == [OI.C.MAX_RES]


def test_pipeline_resume_and_lineage(spark, sf_dir, tmp_path):
    store = str(tmp_path / "pipe")
    p1 = ingest_pipeline(spark, sf_dir, store)
    assert p1.stages_run == ["indexed", "stats_tier_counts"]
    n = spark.read.parquet(os.path.join(store, "indexed")).count()

    # per-partition lineage recorded and sums to the table count
    pm = p1.partition_metrics("indexed")
    assert pm.agg({"n_rows": "sum"}).collect()[0][0] == n
    assert pm.count() >= 1

    # rerun: everything skipped
    p2 = ingest_pipeline(spark, sf_dir, store)
    assert p2.stages_run == [] and p2.stages_skipped == ["indexed", "stats_tier_counts"]

    # invalidate downstream stage only → only it re-runs
    p2.invalidate("stats_tier_counts")
    p3 = ingest_pipeline(spark, sf_dir, store)
    assert p3.stages_run == ["stats_tier_counts"]
    assert p3.stages_skipped == ["indexed"]

    # changed params → full re-run (fingerprint mismatch)
    p4 = ingest_pipeline(spark, sf_dir, store, salt_buckets=8)
    assert "indexed" in p4.stages_run


def test_covering_secondary_index(spark, sf_dir, tmp_path):
    """FULL secondary index: sorted covering table answers the lookup
    without the primary; results equal the primary-scan answer and the
    attribute filter is pushed to the parquet scan."""
    from geowave_spark.operators import scan as OS

    geo = TB.geo_events(spark, sf_dir)
    path = str(tmp_path / "secidx")
    OS.build_covering_index(
        geo, "event_type", path, include_cols=("lon", "lat"), id_col="event_id"
    )
    got = (
        OS.covering_index_query(spark, path, ["click"])
        .select("event_id", "lon", "lat")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        geo.filter(geo.event_type == "click")
        .select("event_id", "lon", "lat")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    plan = (
        OS.covering_index_query(spark, path, ["click"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # filter reaches the parquet scan (single value folds isin → EqualTo)
    assert "EqualTo(attr,click)" in plan or "In(attr" in plan


def test_stats_driven_query_planning(spark, sf_dir, tmp_path):
    """End-to-end stats-driven planning (reference ChooseBestMatchIndex /
    tier-skip): ingest → stats store → query passes tiers from stats
    (no per-query distinct scan) and returns the same rows."""
    from geowave_spark import stats as S
    from geowave_spark.operators import bbox as OB
    from geowave_spark.plans import planner as PL

    store = str(tmp_path / "store")
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    OI.write_indexed(geo, store + "/indexed")
    S.write_stats(geo, store)

    tiers = S.read_tiers(spark, store)
    assert tiers == [OI.C.MAX_RES]

    table = OI.read_indexed(spark, store + "/indexed")
    q = PL.BoxQuery("nyc", -74.5, 40.2, -73.5, 41.2)
    got = sorted(
        r["event_id"]
        for r in OB.query_bbox(table, [q], tiers=tiers).select("event_id").collect()
    )
    want = sorted(
        r["event_id"]
        for r in OB.query_bbox(geo, [q], tiers=[OI.C.MAX_RES]).select("event_id").collect()
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Count-min sketch statistic (round 2)
# ---------------------------------------------------------------------------


def test_cms_estimates_and_merge(spark):
    from geowave_spark import stats as ST
    import numpy as np

    # skewed values: value v appears (v+1)*100 times for v in 0..9
    rows = [(v,) for v in range(10) for _ in range((v + 1) * 100)]
    df = spark.createDataFrame(rows, "v long")
    b = bytes(ST.count_min_sketch(df, "v", eps=0.001, confidence=0.99).collect()[0].cms)
    total, depth, width, _, _ = ST.cms_decode(b)
    assert total == len(rows)
    est = ST.cms_estimate(b, np.arange(10))
    true = np.array([(v + 1) * 100 for v in range(10)])
    # CMS guarantee: never undercounts; overshoot <= eps * total w.h.p.
    assert (est >= true).all()
    assert (est <= true + 0.001 * total + 1).all()

    # mergeability: sketch(first half) + sketch(second half) == sketch(all)
    h1 = spark.createDataFrame(rows[: len(rows) // 2], "v long")
    h2 = spark.createDataFrame(rows[len(rows) // 2 :], "v long")
    b1 = bytes(ST.count_min_sketch(h1, "v").collect()[0].cms)
    b2 = bytes(ST.count_min_sketch(h2, "v").collect()[0].cms)
    merged = ST.cms_merge(b1, b2)
    ball = bytes(ST.count_min_sketch(df, "v").collect()[0].cms)
    assert merged == ball


def test_partial_secondary_index(spark, sf_dir, tmp_path):
    """PARTIAL secondary index (SecondaryIndexType.PARTIAL): a covered
    projection is served index-only; an uncovered projection joins back to
    the primary exactly once, with the attribute filter still pushed to
    the index scan; asking for uncovered columns without the primary is an
    error."""
    import pytest

    from geowave_spark.operators import scan as OS

    geo = TB.geo_events(spark, sf_dir)
    path = str(tmp_path / "psecidx")
    OS.build_covering_index(
        geo, "event_type", path, include_cols=("lon",), id_col="event_id"
    )

    # covered projection: index-only (no join in the plan)
    q_cov = OS.covering_index_query(
        spark, path, ["click"], select_cols=("event_id", "lon")
    )
    plan_cov = q_cov._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_cov
    want = geo.filter(geo.event_type == "click")
    assert q_cov.count() == want.count()

    # uncovered projection: one join back fetches lat; values match primary
    q_par = OS.covering_index_query(
        spark, path, ["click"], select_cols=("event_id", "lon", "lat"),
        primary=geo,
    )
    got = q_par.toPandas().sort_values("event_id").reset_index(drop=True)
    exp = (
        want.select("event_id", "lon", "lat")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert got.equals(exp)
    plan_par = q_par._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(attr,click)" in plan_par or "In(attr" in plan_par

    with pytest.raises(ValueError, match="lat"):
        OS.covering_index_query(
            spark, path, ["click"], select_cols=("event_id", "lat")
        )



def test_metrics_table_is_queryable(spark, sf_dir, tmp_path):
    """The per-partition lineage is a queryable parquet table mirroring the
    JSON manifests: stage totals match, partition counts sum to them."""
    from pyspark.sql import functions as F

    from geowave_spark.checkpoint import ingest_pipeline

    pipe = ingest_pipeline(spark, sf_dir, str(tmp_path / "store"))
    m = pipe.metrics_table()
    agg = {
        r["stage"]: (r["sum_parts"], r["stage_rows"])
        for r in m.groupBy("stage", "stage_rows")
        .agg(F.sum("n_rows").alias("sum_parts"))
        .collect()
    }
    assert set(agg) == {"indexed", "stats_tier_counts"}
    for stage, (sum_parts, total) in agg.items():
        assert sum_parts == total == pipe.manifest(stage)["n_rows"]


def test_metrics_backfill_and_invalidate(spark, sf_dir, tmp_path):
    """Pre-metrics stores get their lineage backfilled on the skip path;
    invalidate removes the stage's metrics with its manifest; an empty
    store yields a schema-stable empty table."""
    import shutil

    from geowave_spark.checkpoint import Pipeline, ingest_pipeline

    store = str(tmp_path / "store")
    pipe = ingest_pipeline(spark, sf_dir, store)
    # simulate a pre-upgrade store: manifests exist, metrics do not
    shutil.rmtree(f"{store}/_checkpoints/metrics")
    pipe2 = ingest_pipeline(spark, sf_dir, store)  # all stages skip
    assert pipe2.stages_run == [] and len(pipe2.stages_skipped) == 2
    assert set(
        r["stage"] for r in pipe2.metrics_table().select("stage").collect()
    ) == {"indexed", "stats_tier_counts"}

    pipe2.invalidate("indexed")
    assert set(
        r["stage"] for r in pipe2.metrics_table().select("stage").collect()
    ) == {"stats_tier_counts"}

    empty = Pipeline(spark, str(tmp_path / "nothing"))
    assert empty.metrics_table().count() == 0


def test_corpus_pipeline_resume_and_leakage_invariant(spark, sf_dir, tmp_path):
    """The training-data DAG: all four stages run, rerun skips everything,
    invalidating the split re-runs exactly the suffix; every member of a
    near-dup group shares a split (the leakage guarantee), and train
    shards contain only kept train docs."""
    from pyspark.sql import functions as F

    from geowave_spark.checkpoint import corpus_pipeline

    store = str(tmp_path / "cpipe")
    stages = ["corpus_prep", "corpus_groups", "corpus_split", "corpus_shards"]

    p1 = corpus_pipeline(spark, sf_dir, store, shard_bytes=1 << 14)
    assert p1.stages_run == stages

    p2 = corpus_pipeline(spark, sf_dir, store, shard_bytes=1 << 14)
    assert p2.stages_run == [] and p2.stages_skipped == stages

    p2.invalidate("corpus_split")
    p3 = corpus_pipeline(spark, sf_dir, store, shard_bytes=1 << 14)
    assert p3.stages_run == ["corpus_split", "corpus_shards"]
    assert p3.stages_skipped == ["corpus_prep", "corpus_groups"]

    groups = spark.read.parquet(os.path.join(store, "corpus_groups"))
    split = spark.read.parquet(os.path.join(store, "corpus_split"))
    shards = spark.read.parquet(os.path.join(store, "corpus_shards"))

    # leakage invariant: one split per group
    per_group = (
        split.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert per_group == 1

    # shards = kept ∧ train, nothing else; byte layout gapless per shard
    kept_train = (
        groups.filter(F.col("keep"))
        .join(split.filter(F.col("split") == "train"), "doc_id")
        .select("doc_id")
    )
    assert shards.count() == kept_train.count() > 0
    assert shards.join(kept_train, "doc_id").count() == shards.count()
    n_shards = shards.select("shard_id").distinct().count()
    assert n_shards > 1  # 16 KB nominal shards over the kept train corpus

    # per-partition lineage recorded for every stage
    assert p1.partition_metrics("corpus_shards").count() >= 1


def test_image_pipeline_planted_dups_and_resume(spark, tmp_path):
    """The image-side DAG over the input_hint table: planted byte-identical
    copies (fresh ids) group with their originals and only one survives;
    group members share a split; train batches contain only kept train
    images; rerun skips, invalidated suffix re-runs."""
    from pyspark.sql import functions as F

    from geowave_spark.checkpoint import image_pipeline
    from geowave_spark.sources import synthetic as SY

    base = SY.images(spark, 60, partitions=4)
    dups = (
        base.filter(F.col("image_id") < "img000000000010")
        .withColumn(
            "image_id",
            F.concat(F.lit("img9"), F.substring("image_id", 5, 11)),
        )
    )
    src = str(tmp_path / "imgs")
    base.unionByName(dups).write.mode("overwrite").parquet(src)

    store = str(tmp_path / "ipipe")
    stages = ["image_features", "image_dedup_groups", "image_split",
              "image_batches"]
    p1 = image_pipeline(spark, src, store, batch_size=4)
    assert p1.stages_run == stages

    groups = {
        r.image_id: (int(r.group_id), bool(r.keep))
        for r in spark.read.parquet(
            os.path.join(store, "image_dedup_groups")
        ).collect()
    }
    for i in range(10):
        orig, copy = f"img{i:012d}", f"img9{i:011d}"
        assert groups[copy][0] == groups[orig][0], "copy must join original"
    # exactly one keeper per group, everywhere (a group may absorb more
    # than the planted pair — synthetic gradients can dhash-collide)
    keepers: dict[int, int] = {}
    for gid, keep in groups.values():
        keepers[gid] = keepers.get(gid, 0) + (1 if keep else 0)
    assert all(n == 1 for n in keepers.values())

    split = spark.read.parquet(os.path.join(store, "image_split"))
    assert (
        split.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    ) == 1

    batches = spark.read.parquet(os.path.join(store, "image_batches"))
    n_kept_train = (
        spark.read.parquet(os.path.join(store, "image_dedup_groups"))
        .filter(F.col("keep"))
        .join(split.filter(F.col("split") == "train"), "img_num")
        .count()
    )
    assert batches.count() == n_kept_train > 0

    p2 = image_pipeline(spark, src, store, batch_size=4)
    assert p2.stages_run == [] and p2.stages_skipped == stages
    p2.invalidate("image_split")
    p3 = image_pipeline(spark, src, store, batch_size=4)
    assert p3.stages_run == ["image_split", "image_batches"]


def test_raster_pipeline_pyramid_consistency(spark, tmp_path):
    """The raster DAG: base mosaic → stitched pyramid → per-level
    overviews; every pyramid level's tile set equals the distinct parent
    cells of the level below (no tile lost or invented); resume and
    suffix-rerun hold."""
    from pyspark.sql import functions as F

    from geowave_spark.checkpoint import raster_pipeline
    from geowave_spark.sources import synthetic as SY

    src = str(tmp_path / "rimgs")
    SY.images(spark, 40, partitions=4).write.mode("overwrite").parquet(src)

    store = str(tmp_path / "rpipe")
    stages = ["raster_tiles", "raster_pyramid", "raster_overviews"]
    p1 = raster_pipeline(spark, src, store, level=5, min_level=3)
    assert p1.stages_run == stages

    base = spark.read.parquet(os.path.join(store, "raster_tiles"))
    pyr = spark.read.parquet(os.path.join(store, "raster_pyramid"))
    cov = spark.read.parquet(os.path.join(store, "raster_overviews"))

    tiles_at = {5: base.select("tile_ix", "tile_iy").distinct()}
    for lvl in (4, 3):
        tiles_at[lvl] = (
            pyr.filter(F.col("level") == lvl)
            .select("tile_ix", "tile_iy")
            .distinct()
        )
    for lvl in (4, 3):
        parents = (
            tiles_at[lvl + 1]
            .select(
                (F.col("tile_ix") / 2).cast("long").alias("tile_ix"),
                (F.col("tile_iy") / 2).cast("long").alias("tile_iy"),
            )
            .distinct()
        )
        got = {(r.tile_ix, r.tile_iy) for r in tiles_at[lvl].collect()}
        want = {(r.tile_ix, r.tile_iy) for r in parents.collect()}
        assert got == want and got

    # one overview row per level, counts match the tile tables
    cov_rows = {int(r.level): int(r.n_tiles) for r in cov.collect()}
    assert set(cov_rows) == {3, 4, 5}
    for lvl, df in tiles_at.items():
        assert cov_rows[lvl] == df.count()

    p2 = raster_pipeline(spark, src, store, level=5, min_level=3)
    assert p2.stages_run == [] and p2.stages_skipped == stages
    p2.invalidate("raster_pyramid")
    p3 = raster_pipeline(spark, src, store, level=5, min_level=3)
    assert p3.stages_run == ["raster_pyramid", "raster_overviews"]
