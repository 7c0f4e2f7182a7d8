"""Never-silently-truncate invariant guards (round 3 placement).

Round 2 folded raise_error into the explode bound, which dropped the whole
sequence/explode tree to interpreted eval (~11s on the sf0.1 spatial_join
suite).  Round 3 moves the guard to a standalone pre-explode filter — these
tests pin that the guard STILL FIRES on violated invariants and stays
silent on valid input.
"""

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import index as OI
from geowave_spark.operators import tiling as OTL


def test_index_envelopes_milli_guard_fires_on_inverted_envelope(spark):
    # inverted envelope (maxx < minx): the extent-rule tier is computed from
    # a negative span, so the grid range at that tier violates <=2 cells/dim
    bad = spark.createDataFrame(
        [(1, 10_000, 0, -10_000, 1_000)],
        "env_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="invariant"):
        OI.index_envelopes_milli(bad, id_col="env_id").collect()


def test_index_envelopes_milli_guard_silent_on_valid(spark):
    ok = spark.createDataFrame(
        [(1, -10_000, -1_000, 10_000, 1_000), (2, 5, 5, 6, 6)],
        "env_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    out = OI.index_envelopes_milli(ok, id_col="env_id")
    rows = out.collect()
    assert len(rows) >= 2
    # and the guard survives further transformation (it is part of the plan,
    # not an attribute): selecting a subset of columns still raises
    bad = spark.createDataFrame(
        [(1, 10_000, 0, -10_000, 1_000)],
        "env_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="invariant"):
        OI.index_envelopes_milli(bad, id_col="env_id").select("cell").collect()


def test_assign_tiles_native_guard_fires_on_inverted_footprint(spark):
    bad = spark.createDataFrame(
        [(1, 10_000, 0, -10_000, 1_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="invariant"):
        OTL.assign_tiles(bad).collect()


def test_assign_tiles_explicit_level_guard_still_fires(spark):
    fp = spark.createDataFrame(
        [(1, -170_000, -80_000, 170_000, 80_000)],
        "event_id long, minx_m long, miny_m long, maxx_m long, maxy_m long",
    )
    with pytest.raises(Exception, match="max_explode_cells"):
        OTL.assign_tiles(fp, level=12, max_explode_cells=1000).collect()
