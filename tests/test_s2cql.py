"""CQL over the S2 leaf-range planner (plans/s2cql.py): same grammar as
plans/cql.py, same rows as brute-force predicates and as the tiered
planner (the pluggable-index-under-one-query-surface property), plus the
stored-store pushdown contract (PushedFilters on the leaf id AND
PartitionFilters on the leaf_p directory column)."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import geometry as G
from geowave_spark.operators import index as OI
from geowave_spark.operators import s2 as OS2
from geowave_spark.plans import cql as PC
from geowave_spark.plans import s2cql as PS2
from geowave_spark.sources import tables as TB

BOX_CQL = "BBOX(geom, -74.5, 40.2, -73.5, 41.2)"
POLY_CQL = (
    "INTERSECTS(geom, POLYGON((1.4 48.0, 3.4 48.0, 3.4 49.0, 2.4 49.0, "
    "2.4 49.8, 1.4 49.8), (2.0 48.4, 2.6 48.4, 2.6 48.7, 2.0 48.7)))"
)


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return TB.geo_events(spark, sf_dir).cache()


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_bbox_matches_brute(spark, geo):
    got = PS2.s2_cql_query(geo, BOX_CQL)
    want = geo.filter(
        (F.col("lon_milli") >= -74_500) & (F.col("lon_milli") <= -73_500)
        & (F.col("lat_milli") >= 40_200) & (F.col("lat_milli") <= 41_200)
    )
    assert _ids(got) == _ids(want) and _ids(got)


def test_compound_time_and_residual(spark, geo):
    where = (
        f"{BOX_CQL} AND ts BETWEEN '2024-01-01 00:00:00' AND "
        "'2024-01-20 23:59:59' AND event_type IN ('click', 'purchase')"
    )
    got = PS2.s2_cql_query(geo, where)
    want = geo.filter(
        (F.col("lon_milli") >= -74_500) & (F.col("lon_milli") <= -73_500)
        & (F.col("lat_milli") >= 40_200) & (F.col("lat_milli") <= 41_200)
        & (F.col("ts") >= F.to_timestamp(F.lit("2024-01-01 00:00:00")))
        & (F.col("ts") <= F.to_timestamp(F.lit("2024-01-20 23:59:59")))
        & F.col("event_type").isin("click", "purchase")
    )
    assert _ids(got) == _ids(want)


def test_intersects_matches_evenodd(spark, geo):
    got = PS2.s2_cql_query(geo, POLY_CQL)
    rings = [
        [(1.4, 48.0), (3.4, 48.0), (3.4, 49.0), (2.4, 49.0), (2.4, 49.8), (1.4, 49.8)],
        [(2.0, 48.4), (2.6, 48.4), (2.6, 48.7), (2.0, 48.7)],
    ]
    import numpy as np

    milli = [np.asarray(r, dtype=np.float64) * 1000.0 for r in rings]
    want = geo.filter(F.expr(G.evenodd_sql(milli, lon="lon_milli", lat="lat_milli")))
    assert _ids(got) == _ids(want) and _ids(got)


def test_dwithin_matches_brute(spark, geo):
    got = PS2.s2_cql_query(geo, "DWITHIN(geom, POINT(-73.985 40.758), 800)")
    from geowave_spark.functions import udfs as U

    d2 = U.planar_wrap_dist2_col(
        F.col("lon_milli"), F.col("lat_milli"), F.lit(-73_985), F.lit(40_758)
    )
    want = geo.filter(d2 <= 800 * 800)
    assert _ids(got) == _ids(want) and _ids(got)


def test_dwithin_bad_units_raises(spark, geo):
    with pytest.raises(ValueError, match="milli-degrees"):
        PS2.s2_cql_query(geo, "DWITHIN(geom, POINT(-73.985 40.758), 100, meters)")


def test_or_linearization_dedup(spark, geo):
    where = (
        "(BBOX(geom, -74.5, 40.2, -73.5, 41.2) OR BBOX(geom, -74.0, 40.5, -73.0, 41.5)) "
        "AND event_type = 'click'"
    )
    got = PS2.s2_cql_query(geo, where)
    in_box1 = (
        (F.col("lon_milli") >= -74_500) & (F.col("lon_milli") <= -73_500)
        & (F.col("lat_milli") >= 40_200) & (F.col("lat_milli") <= 41_200)
    )
    in_box2 = (
        (F.col("lon_milli") >= -74_000) & (F.col("lon_milli") <= -73_000)
        & (F.col("lat_milli") >= 40_500) & (F.col("lat_milli") <= 41_500)
    )
    want = geo.filter((in_box1 | in_box2) & (F.col("event_type") == "click"))
    ids = _ids(got)
    assert ids == _ids(want)
    assert len(ids) == len(set(ids))  # overlap region deduplicated


def test_parity_with_tiered_planner(spark, geo):
    """The pluggable-index property: one CQL string, two planners
    (tiered cover join vs S2 leaf ranges), identical rows."""
    tiered = OI.index_points(geo, id_col="event_id")
    where = f"{BOX_CQL} AND value > 100"
    got_s2 = PS2.s2_cql_query(geo, where)
    got_tiered = PC.cql_query(tiered, where, tiers=[OI.C.MAX_RES])
    assert _ids(got_s2) == _ids(got_tiered)


def test_store_roundtrip_and_pushdown(spark, geo, tmp_path):
    """write_s2_store → s2_cql_query(leaf_col=...): same rows, and the
    plan shows BOTH parquet row-group pushdown on the sorted leaf column
    and directory pruning on the leaf_p partition column."""
    path = str(tmp_path / "s2store")
    OS2.write_s2_store(geo, path)
    stored = OS2.read_s2_store(spark, path)
    assert OS2.LEAF_PARTITION_COL in stored.columns

    got = PS2.s2_cql_query(stored, BOX_CQL, leaf_col="s2_leaf")
    assert _ids(got) == _ids(PS2.s2_cql_query(geo, BOX_CQL))

    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    pushed = plan.split("PushedFilters")[1][:400]
    assert "s2_leaf" in pushed
    part = plan.split("PartitionFilters")[1][:400]
    assert OS2.LEAF_PARTITION_COL in part


def test_prune_ids_cover_ranges():
    """Every leaf in every merged range has its level-P ancestor in the
    prune set; the set is bounded by the directory count."""
    from geowave_spark.functions import s2cells as S2C

    interior, boundary = S2C.covering(-74_500, 40_200, -73_500, 41_200, max_cells=48)
    ranges = S2C.merged_leaf_ranges(interior) + S2C.merged_leaf_ranges(boundary)
    prune = OS2._partition_prune_ids(ranges)
    assert prune is not None and 0 < len(prune) <= OS2._PRUNE_CAP
    import numpy as np

    for lo, hi in ranges:
        assert int(S2C.parent(np.int64(lo), OS2.LEAF_PARTITION_LEVEL)) in prune
        assert int(S2C.parent(np.int64(hi), OS2.LEAF_PARTITION_LEVEL)) in prune


def test_cli_s2_strategy_end_to_end(spark, sf_dir, tmp_path):
    """config addindex --strategy s2 → ingest → query routes through the
    S2 planner and returns the same rows as a brute filter."""
    from geowave_spark.cli import main

    def run(*argv) -> str:
        out = io.StringIO()
        rc = main(["--config", str(tmp_path / "cfg.json"), *argv], spark=spark, out=out)
        assert rc == 0
        return out.getvalue()

    src = str(tmp_path / "src")
    TB.geo_events(spark, sf_dir).select("event_id", "lon", "lat", "value").write.parquet(src)
    store = str(tmp_path / "store")
    run("config", "addstore", "ev", "--path", store)
    run("config", "addindex", "sp", "--strategy", "s2")
    got = run("ingest", src, "ev", "sp", "--format", "parquet")
    n_src = spark.read.parquet(src).count()
    assert f"now holds {n_src} rows" in got
    assert OS2.LEAF_PARTITION_COL in spark.read.parquet(store).columns

    q = run("query", "ev", "BBOX(geom, -10, -10, 10, 10)", "--limit", "100000")
    n_q = len(q.strip().splitlines()) - 1
    want = (
        spark.read.parquet(src)
        .filter(
            (F.round(F.col("lon") * 1000) >= -10_000)
            & (F.round(F.col("lon") * 1000) <= 10_000)
            & (F.round(F.col("lat") * 1000) >= -10_000)
            & (F.round(F.col("lat") * 1000) <= 10_000)
        )
        .count()
    )
    assert n_q == want
