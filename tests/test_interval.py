"""asof_join / interval_join semantics: tie rules, NULL-value atomicity,
inclusive bounds, dedup-freeness, invariant guards, CC canonicalization."""

import datetime as dt

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException
from pyspark.sql import functions as F

from geowave_spark.operators import dedup as OD
from geowave_spark.operators import interval as OIV


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_ties(spark):
    left = _mk(
        spark,
        [(1, 10, _ts(30)), (2, 10, _ts(5)), (3, 20, _ts(30)), (4, 30, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = _mk(
        spark,
        [
            (100, 10, _ts(10), 1.0),
            (101, 10, _ts(30), 2.0),   # exactly simultaneous: must match
            (102, 10, _ts(31), 9.0),   # in the future: must not
            (200, 20, _ts(20), 3.0),
            (201, 20, _ts(20), 4.0),   # same-ts tie → greatest right id wins
        ],
        "event_id long, user_id long, ts timestamp, v double",
    )
    got = {
        r.event_id: (r.asof_id, r.v)
        for r in OIV.asof_join(
            left, right, key="user_id", right_vals=("v",), how="left"
        ).collect()
    }
    assert got[1] == (101, 2.0)       # at-or-before picks the equal-ts row
    assert got[2] == (None, None)     # nothing at-or-before → NULL (how=left)
    assert got[3] == (201, 4.0)       # tie on ts → max right_id
    assert got[4] == (None, None)     # key with no right rows at all
    inner = OIV.asof_join(left, right, key="user_id", right_vals=("v",))
    assert {r.event_id for r in inner.collect()} == {1, 3}


def test_asof_null_value_does_not_mix_rows(spark):
    """A legitimately-NULL right attribute must ride with ITS row — the
    per-column last(ignorenulls) formulation would reach back to an older
    row's value; the struct carry must not."""
    left = _mk(spark, [(1, 7, _ts(50))], "event_id long, user_id long, ts timestamp")
    right = _mk(
        spark,
        [(100, 7, _ts(10), 5.0), (101, 7, _ts(20), None)],
        "event_id long, user_id long, ts timestamp, v double",
    )
    row = OIV.asof_join(left, right, key="user_id", right_vals=("v",)).collect()[0]
    assert row.asof_id == 101 and row.v is None  # NOT 5.0 from event 100


def test_interval_join_inclusive_bounds_and_dedup_free(spark):
    pts = _mk(
        spark,
        [(1, 0), (2, 3600), (3, 7200), (4, 7201), (5, 100)],
        "point_id long, pos long",
    )
    iv = _mk(
        spark,
        [(10, 0, 7200), (11, 3600, 3600), (12, 7300, 7400)],
        "interval_id long, lo long, hi long",
    )
    got = OIV.interval_join(pts, iv, bucket=3600).collect()
    pairs = sorted((r.point_id, r.interval_id) for r in got)
    # closed bounds at both ends; a multi-bucket interval yields each
    # qualifying pair exactly ONCE (no dedup pass exists to hide dupes)
    assert pairs == [(1, 10), (2, 10), (2, 11), (3, 10), (5, 10)]
    assert len(pairs) == len(set(pairs))


def test_interval_join_guard_rejects_wide_and_inverted(spark):
    pts = _mk(spark, [(1, 0)], "point_id long, pos long")
    wide = _mk(spark, [(10, 0, 3600 * 100)], "interval_id long, lo long, hi long")
    with pytest.raises(SparkRuntimeException, match="max_buckets"):
        OIV.interval_join(pts, wide, bucket=3600, max_buckets=8).collect()
    inverted = _mk(spark, [(10, 500, 400)], "interval_id long, lo long, hi long")
    with pytest.raises(SparkRuntimeException, match="inverted"):
        OIV.interval_join(pts, inverted, bucket=3600).collect()


def test_connected_components_chain_and_canonicalize(spark):
    """A path graph exercises multi-round propagation (diameter 4); the
    component label equals the member minimum, canonicalize keeps exactly
    one doc per group and labels singletons as their own group."""
    pairs = _mk(
        spark,
        [(5, 9), (9, 2), (2, 7), (7, 8), (30, 31)],
        "id_a long, id_b long",
    )
    comp = {r.node: r.comp for r in OD.connected_components(pairs).collect()}
    assert comp == {5: 2, 9: 2, 2: 2, 7: 2, 8: 2, 30: 30, 31: 30}

    docs = _mk(spark, [(i,) for i in [2, 5, 7, 8, 9, 30, 31, 99]], "doc_id long")
    lab = OD.canonicalize(docs, pairs).collect()
    keep = {r.doc_id for r in lab if r.keep}
    assert keep == {2, 30, 99}  # one per group + the untouched singleton
    groups = {r.doc_id: r.group_id for r in lab}
    assert groups[99] == 99 and groups[8] == 2 and groups[31] == 30


def test_connected_components_driver_and_loop_paths_agree(spark):
    """The driver union-find fast path and the distributed min-label loop
    produce identical labels (driver_limit=0 forces the loop)."""
    pairs = _mk(
        spark,
        [(5, 9), (9, 2), (2, 7), (7, 8), (30, 31), (40, 41), (41, 40)],
        "id_a long, id_b long",
    )
    fast = {r.node: r.comp for r in OD.connected_components(pairs).collect()}
    loop = {
        r.node: r.comp
        for r in OD.connected_components(pairs, driver_limit=0).collect()
    }
    assert fast == loop
    assert fast[8] == 2 and fast[41] == 40

    empty = _mk(spark, [], "id_a long, id_b long")
    assert OD.connected_components(empty).count() == 0


def test_connected_components_null_edges_dropped(spark):
    """An edge with a null endpoint is meaningless: both paths drop it and
    never emit a null node."""
    pairs = _mk(
        spark,
        [(1, 2), (None, 3), (4, None)],
        "id_a long, id_b long",
    )
    for limit in (4_000_000, 0):
        got = {
            r.node: r.comp
            for r in OD.connected_components(pairs, driver_limit=limit).collect()
        }
        assert got == {1: 1, 2: 1}
