"""Stats-driven defaults (round 2): tier metadata travels with the
DataFrame (index_points static tier, read_indexed stats store) so cover
joins never pay a tier-discovery scan; checkpoint fingerprints include
input content identity."""

import numpy as np
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark import checkpoint as CP
from geowave_spark.operators import index as OI
from geowave_spark.operators import join as OJ
from geowave_spark.plans import planner as P
from geowave_spark.sources import tables as TB


def test_index_points_carries_tier_hint(spark, sf_dir):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    assert geo._gw_tiers == [OI.C.MAX_RES]


def test_cover_join_uses_hint_no_discovery_scan(spark, sf_dir, monkeypatch):
    """With the hint attached, building the cover-join plan must trigger NO
    eager job — the tier-discovery distinct().collect() is gone."""
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")

    def boom(self):
        raise AssertionError("eager collect during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    plan = P.cover_join(geo, [P.BoxQuery("q", -74.5, 40.2, -73.5, 41.2)])
    monkeypatch.undo()
    # and the plan is still correct
    n = plan.filter(
        P.bbox_residual(-74.5, 40.2, -73.5, 41.2)
    ).count()
    assert n > 0


def test_write_read_indexed_roundtrip_tiers(spark, sf_dir, tmp_path):
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    path = str(tmp_path / "idx")
    OI.write_indexed(geo, path)
    back = OI.read_indexed(spark, path)
    assert back._gw_tiers == [OI.C.MAX_RES]
    assert back.count() == geo.count()


def test_spatial_join_uses_envelope_hint(spark, sf_dir, monkeypatch):
    fps = TB.geo_footprints(spark, sf_dir)
    pts = TB.geo_events(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lon_milli", "lat_milli"
    )
    # discovery path still works...
    want = OJ.points_in_envelopes_join(
        pts, fps.select("event_id", "minx_m", "miny_m", "maxx_m", "maxy_m")
        .withColumnRenamed("event_id", "env_id")
    ).count()
    # ...and the hinted path produces the identical result with no eager job
    env = fps.select("event_id", "minx_m", "miny_m", "maxx_m", "maxy_m").withColumnRenamed(
        "event_id", "env_id"
    )
    env._gw_tiers = list(range(6, 12))  # geo_footprints native levels

    def boom(self):
        raise AssertionError("eager collect during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    plan = OJ.points_in_envelopes_join(pts, env)
    monkeypatch.undo()
    assert plan.count() == want


def test_stats_tiers_survive_transformations(spark, sf_dir, tmp_path, monkeypatch):
    """The _gw_tiers attribute dies on ANY transformation; the stats store
    is the durable channel.  read_indexed(...).filter(...) followed by a
    cover join must recover tiers from _stats/tier_counts — no
    tier-discovery distinct scan over the data."""
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    path = str(tmp_path / "idx")
    OI.write_indexed(geo, path)
    back = OI.read_indexed(spark, path).filter(F.col("lat") > -80.0)
    assert not hasattr(back, "_gw_tiers")  # the attribute is gone...
    assert OI.stats_tiers_for(back) == [OI.C.MAX_RES]  # ...the store is not

    def boom(self):
        raise AssertionError("tier-discovery distinct scan ran")

    monkeypatch.setattr(DataFrame, "distinct", boom)
    plan = P.cover_join(back, [P.BoxQuery("q", -74.5, 40.2, -73.5, 41.2)])
    monkeypatch.undo()
    n = plan.filter(P.bbox_residual(-74.5, 40.2, -73.5, 41.2)).count()
    assert n > 0


def test_write_indexed_append_merges_tier_counts(spark, sf_dir, tmp_path):
    """Appending a batch must MERGE tier_counts with the existing store —
    overwriting with only the new batch's tiers would silently drop rows
    at the missing tiers from every later cover join."""
    geo = TB.geo_events(spark, sf_dir)
    a = OI.index_points(geo, id_col="event_id", res=10)
    b = OI.index_points(geo, id_col="event_id", res=14)
    path = str(tmp_path / "idx")
    OI.write_indexed(a, path)
    OI.write_indexed(b, path, mode="append")
    assert OI.read_stats_tiers(spark, path) == [10, 14]
    tc = spark.read.parquet(f"{path}/_stats/tier_counts").toPandas()
    n = geo.count()
    assert sorted(tc.n_rows) == [n, n]


def test_tier_counts_lock_serializes_writers(spark, sf_dir, tmp_path, monkeypatch):
    """A held writer lock makes a concurrent append fail LOUDLY instead of
    silently losing the other writer's counts (read-modify-write race);
    releasing it lets the append proceed and merge."""
    import os

    import geowave_spark.operators.index as idx

    geo = TB.geo_events(spark, sf_dir)
    a = OI.index_points(geo, id_col="event_id", res=10)
    b = OI.index_points(geo, id_col="event_id", res=14)
    path = str(tmp_path / "idx")
    OI.write_indexed(a, path)
    lock = f"{path}/_stats/tier_counts.lock"
    with open(lock, "w") as f:
        f.write("999999")
    monkeypatch.setattr(idx, "TIER_LOCK_TIMEOUT", 0.3)
    with pytest.raises(RuntimeError, match="tier_counts writer lock"):
        OI.write_indexed(b, path, mode="append")
    os.unlink(lock)
    OI.write_indexed(b, path, mode="append")
    assert OI.read_stats_tiers(spark, path) == [10, 14]
    assert not os.path.exists(lock)  # released after the merge


def test_tier_counts_publish_heals_crashed_swap(spark, sf_dir, tmp_path):
    """Crash between the two publish renames leaves tier_counts.old and no
    live dir — the next publish must heal (merge against the OLD counts,
    not restart from zero)."""
    import os

    geo = TB.geo_events(spark, sf_dir)
    a = OI.index_points(geo, id_col="event_id", res=10)
    path = str(tmp_path / "idx")
    OI.write_indexed(a, path)
    tcdir = f"{path}/_stats/tier_counts"
    os.rename(tcdir, tcdir + ".old")  # simulate the crash window
    b = OI.index_points(geo, id_col="event_id", res=14)
    OI.write_indexed(b, path, mode="append")
    assert OI.read_stats_tiers(spark, path) == [10, 14]
    assert not os.path.exists(tcdir + ".old")
    assert not os.path.exists(tcdir + ".staging")


def test_spatial_join_recovers_tiers_from_indexed_envelope_table(
    spark, sf_dir, tmp_path, monkeypatch
):
    """An envelope table written with its stats store, read back and
    transformed, still supplies env_tiers with no discovery scan."""
    fps = TB.geo_footprints(spark, sf_dir).select(
        F.col("event_id").alias("env_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    indexed = OI.index_envelopes_milli(fps, id_col="env_id")
    path = str(tmp_path / "envs")
    OI.write_indexed(indexed, path)
    back = OI.read_indexed(spark, path).filter(F.col("env_id") >= 0)
    pts = TB.geo_events(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lon_milli", "lat_milli"
    )
    want = OJ.points_in_envelopes_join(pts, fps, env_tiers=None).count()

    def boom(self):
        raise AssertionError("tier-discovery distinct scan ran")

    monkeypatch.setattr(DataFrame, "distinct", boom)
    # the stored table is exploded one-row-per-(entry, cell): collapse back
    # to one row per envelope before re-indexing (lazy — runs after undo)
    env_back = back.select(
        "env_id", "tier", "minx_m", "miny_m", "maxx_m", "maxy_m"
    ).dropDuplicates(["env_id"])
    plan = OJ.points_in_envelopes_join(pts, env_back)
    monkeypatch.undo()
    assert plan.count() == want


def test_checkpoint_invalidated_by_inplace_rewrite(tmp_path):
    p = tmp_path / "input.parquet"
    p.write_bytes(b"v1-bytes")
    f1 = CP._fingerprint("stage", [str(p)], {"k": 1})
    # same path, same params, different content -> different fingerprint
    import os
    import time

    p.write_bytes(b"v2-bytes!")
    os.utime(p, ns=(time.time_ns(), time.time_ns() + 1))
    f2 = CP._fingerprint("stage", [str(p)], {"k": 1})
    assert f1 != f2
    # unchanged content -> stable fingerprint
    assert f2 == CP._fingerprint("stage", [str(p)], {"k": 1})


def test_round_robin_salt_spreads_evenly(spark, sf_dir):
    geo = OI.index_points(
        TB.geo_events(spark, sf_dir), id_col="event_id", salt_mode="round_robin"
    )
    counts = geo.groupBy("salt").count().toPandas()
    n = geo.count()
    assert len(counts) == OI.DEFAULT_SALT_BUCKETS
    # round-robin = near-perfect balance (within one per task)
    spread = counts["count"].max() - counts["count"].min()
    assert spread <= spark.sparkContext.defaultParallelism * 2
    assert counts["count"].sum() == n


def test_stats_tiers_multi_root_union(spark, sf_dir, tmp_path):
    """A union over several indexed tables must merge ALL roots' stats —
    and a union with any STATLESS root must return None (fall back to
    discovery), never a partial tier list that would silently drop rows
    at the missing tiers (round-3 review: the first-256-files cap could
    return one root's tiers for a two-root union)."""
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    pa, pb, pc = (str(tmp_path / n) for n in ("a", "b", "c"))
    OI.write_indexed(geo, pa)
    # second root at a DIFFERENT tier so a partial answer is detectable
    coarse = OI.index_points(
        TB.geo_events(spark, sf_dir), id_col="event_id", res=OI.C.MAX_RES - 2
    )
    OI.write_indexed(coarse, pb)
    # statless root: plain parquet write, no co-written _stats
    geo.write.mode("overwrite").parquet(pc)

    both = OI.read_indexed(spark, pa).unionByName(OI.read_indexed(spark, pb))
    assert OI.stats_tiers_for(both) == [OI.C.MAX_RES - 2, OI.C.MAX_RES]

    mixed = OI.read_indexed(spark, pa).unionByName(spark.read.parquet(pc))
    assert OI.stats_tiers_for(mixed) is None

    # a NON-FILE leaf contributes no entry to inputFiles() at all — the
    # file listing alone can't see it, so the leaf scan must refuse
    in_mem = spark.createDataFrame(
        OI.read_indexed(spark, pa).limit(2).collect()
    )
    half_mem = OI.read_indexed(spark, pa).unionByName(in_mem)
    assert OI.stats_tiers_for(half_mem) is None


def test_cover_join_prunes_store_partitions(spark, sf_dir, tmp_path):
    """The cell_p filter implied by the cover (planner.partition_prune_cells)
    must (a) change no output row and (b) surface as a PartitionFilters
    prune on the cell_p-partitioned store — only matching directory
    partitions are listed (the Iceberg shape)."""
    import contextlib
    import io

    store = str(tmp_path / "store")
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    OI.write_indexed(geo, store)
    data = OI.read_indexed(spark, store)

    q = P.BoxQuery("q0", -10.0, -10.0, 10.0, 10.0)
    res = P.cover_join(data, [q])

    # (a) output identity vs the unpruned formulation: same join over the
    # same store with the prune disabled by dropping cell_p pre-join
    res_nop = P.cover_join(data.drop("cell_p"), [q])
    a = sorted(r.event_id for r in res.select("event_id").collect())
    b = sorted(r.event_id for r in res_nop.select("event_id").collect())
    assert a == b and len(a) > 0

    # (b) plan shape: PartitionFilters carries the cell_p In-set and the
    # scan reads fewer partition directories than exist
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):]
    assert "cell_p" in seg[: seg.index("]")]

    import os

    n_dirs = len([d for d in os.listdir(store) if d.startswith("cell_p=")])
    pcs = P.partition_prune_cells(
        np.concatenate(
            [OI.C.cover_bbox(*b, P.cover_resolution(q, 1024)) for b in q.boxes()]
        ),
        OI.PARTITION_RES,
    )
    assert pcs is not None and 0 < len(pcs) < n_dirs


def test_partition_prune_cells_conservative_on_coarse_cover(spark):
    """A cover cell coarser than PARTITION_RES disables pruning (tier <
    p_res rows carry non-refining cell_p — no closed key set exists)."""
    coarse = OI.C.cover_bbox(-170.0, -80.0, 170.0, 80.0, 2)
    assert P.partition_prune_cells(coarse, OI.PARTITION_RES) is None


def test_partition_prune_skipped_on_derived_cell_p(spark, sf_dir, tmp_path):
    """On a frame whose cell_p is DERIVED (index_points over a view, not a
    partitioned store) the prune filter must not apply: pushing it down
    re-inlines the whole cell derivation into the scan's DataFilters
    (measured 3x on the bbox suite) while pruning no directory.  A stored
    frame in the same test proves the plan-shape regex has teeth (the
    filter renders as `cell_p#<exprId> IN (...)`)."""
    import contextlib
    import io
    import re

    def plan_of(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    prune_re = re.compile(r"cell_p#\d+L? IN \(")
    q = P.BoxQuery("q0", -10.0, -10.0, 10.0, 10.0)

    # positive control: the same query over a written store DOES carry the
    # In-list (this pins the regex against explain-format drift)
    store = str(tmp_path / "gate_store")
    geo = OI.index_points(TB.geo_events(spark, sf_dir), id_col="event_id")
    OI.write_indexed(geo, store)
    stored = OI.read_indexed(spark, store)
    assert OI.cell_p_is_stored(stored)
    assert prune_re.search(plan_of(P.cover_join(stored, [q])))

    # derived path: gate off, no In-list anywhere in the plan
    assert not OI.cell_p_is_stored(geo)
    assert not prune_re.search(
        plan_of(P.cover_join(geo, [q], tiers=[OI.C.MAX_RES]))
    )
