"""Bucketed co-located spatial join: row parity with the ad-hoc shuffle
join + the plan property the store exists for (zero shuffle exchanges)."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import bucketed as OB
from geowave_spark.operators import join as OJ
from geowave_spark.registry import _footprint_spec_tiers
from geowave_spark.sources import tables as TB


@pytest.fixture(scope="module")
def sides(spark, sf_dir):
    pts = TB.geo_events(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lon", "lat", "lon_milli", "lat_milli"
    )
    envs = TB.geo_footprints(spark, sf_dir).select(
        F.col("event_id").alias("env_id"), "minx_m", "miny_m", "maxx_m", "maxy_m"
    )
    return pts, envs


@pytest.fixture(scope="module")
def stores(spark, sides, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_store")
    pts, envs = sides
    tiers = _footprint_spec_tiers()
    OB.write_point_join_store(
        pts, tiers, "t_pts_bkt", str(root / "pts"), buckets=4
    )
    OB.write_envelope_join_store(
        envs, "t_env_bkt", str(root / "envs"), buckets=4
    )
    yield "t_pts_bkt", "t_env_bkt"
    spark.sql("DROP TABLE IF EXISTS t_pts_bkt")
    spark.sql("DROP TABLE IF EXISTS t_env_bkt")


def test_colocated_join_matches_adhoc(spark, sides, stores):
    pts, envs = sides
    expected = sorted(
        (r["point_id"], r["env_id"])
        for r in OJ.points_in_envelopes_join(
            pts, envs, env_tiers=_footprint_spec_tiers()
        ).collect()
    )
    got = sorted(
        (r["point_id"], r["env_id"])
        for r in OB.colocated_points_in_envelopes(spark, *stores).collect()
    )
    assert len(expected) > 0
    assert got == expected


def test_colocated_join_has_zero_exchanges(spark, stores):
    joined = OB.colocated_points_in_envelopes(spark, *stores)
    assert OB.n_shuffle_exchanges(joined) == 0
    # sanity on the counter itself: an intentionally mis-bucketed join
    # (repartitioned side loses the bucket alignment) must show a shuffle
    broken = OB.colocated_points_in_envelopes(spark, *stores).repartition(8)
    assert OB.n_shuffle_exchanges(broken) >= 1


def test_adhoc_join_pays_the_shuffle(spark, sides):
    """The derived-key join the store replaces plans ≥1 exchange — the
    per-query cost the bucketed layout amortizes into ingest."""
    pts, envs = sides
    adhoc = OJ.points_in_envelopes_join(
        pts, envs, env_tiers=_footprint_spec_tiers()
    )
    assert OB.n_shuffle_exchanges(adhoc) >= 1


def test_bucket_metadata_visible(spark, stores):
    """The catalog records the bucket spec (what a real deployment persists
    via Iceberg bucket-transform partitioning)."""
    desc = spark.sql("DESCRIBE TABLE EXTENDED t_pts_bkt").collect()
    kv = {r["col_name"]: r["data_type"] for r in desc}
    assert kv.get("Num Buckets") == "4"
    assert "jkey" in kv.get("Bucket Columns", "")
