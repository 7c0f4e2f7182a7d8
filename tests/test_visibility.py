"""Visibility filtering (reference cell-level visibility expressions)."""

from __future__ import annotations

import pandas as pd
import pytest

from geowave_spark.operators.visibility import apply_visibility, evaluate_visibility

CASES = [
    ("a", {"a"}, True),
    ("a", {"b"}, False),
    ("a&b", {"a", "b"}, True),
    ("a&b", {"a"}, False),
    ("a|b", {"b"}, True),
    ("a|b", {"c"}, False),
    ("(a|b)&c", {"b", "c"}, True),
    ("(a|b)&c", {"b"}, False),
    ("", {"x"}, True),
    (None, set(), True),
]


@pytest.mark.parametrize("expr,auths,want", CASES)
def test_evaluate(expr, auths, want):
    assert evaluate_visibility(expr, frozenset(auths)) is want


def test_apply_visibility(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "vis": ["a", "a&b", "a|b", "secret", None, "(a|b)&c"],
        }
    )
    df = spark.createDataFrame(pdf)
    got = sorted(
        r["id"] for r in apply_visibility(df, {"a", "c"}).select("id").collect()
    )
    # a ✓; a&b ✗ (no b); a|b ✓; secret ✗; null = public ✓; (a|b)&c ✓
    assert got == [1, 3, 5, 6]


def test_export_vector_roundtrip(spark, sf_dir, tmp_path):
    from geowave_spark.registry import QUERIES
    from geowave_spark.sources.export import export_vector

    res = QUERIES["bbox_hot"](spark, sf_dir)
    for fmt in ("parquet", "csv", "json"):
        p = str(tmp_path / fmt)
        export_vector(res, p, fmt=fmt)
        back = getattr(spark.read, fmt)(p) if fmt != "csv" else spark.read.option(
            "header", "true"
        ).csv(p)
        assert back.count() == res.count()


def test_resolve_field_visibility_patterns():
    from geowave_spark.operators.visibility import resolve_field_visibility

    # the reference's documented example: {"geo.*": "S", ".*": "TS"} —
    # order matters, the specific pattern must win for geo-prefixed fields
    d = '{"geo.*": "S", ".*": "TS"}'
    fields = ["geometry", "geohash", "eventName"]
    assert resolve_field_visibility(d, fields, frozenset({"S"})) == [
        True, True, False,
    ]
    assert resolve_field_visibility(d, fields, frozenset({"TS"})) == [
        False, False, True,
    ]
    # unmatched field -> public; null/empty definition -> all public
    assert resolve_field_visibility('{"x": "S"}', ["y"], frozenset()) == [True]
    assert resolve_field_visibility(None, fields, frozenset()) == [True] * 3
    # boolean expressions inside the values evaluate with the same grammar
    assert resolve_field_visibility(
        '{"a": "s&t", "b": "s|t"}', ["a", "b"], frozenset({"t"})
    ) == [False, True]


def test_apply_field_visibility(spark):
    from geowave_spark.operators.visibility import apply_field_visibility

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "geometry": ["g1", "g2", "g3"],
            "eventName": ["e1", "e2", "e3"],
            "field_vis": [
                '{"geo.*": "S", ".*": "TS"}',
                '{".*": "S"}',
                None,
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["id"]: (r["geometry"], r["eventName"], r["id"])
        for r in apply_field_visibility(
            df, {"S"}, fields=["geometry", "eventName"]
        ).collect()
    }
    # row 1: geo.* visible under S, eventName (.* -> TS) masked
    assert got[1] == ("g1", None, 1)
    # row 2: everything S -> all visible
    assert got[2] == ("g2", "e2", 2)
    # row 3: no definition -> public
    assert got[3] == ("g3", "e3", 3)
    # every ROW returns regardless of masking (Accumulo returns the row
    # minus invisible cells), and unmasked columns are untouched
    assert len(got) == 3

    # masking never drops rows even when no field is visible
    none_vis = apply_field_visibility(
        df, set(), fields=["geometry", "eventName"]
    )
    rows = {r["id"]: r for r in none_vis.collect()}
    assert rows[1]["geometry"] is None and rows[2]["eventName"] is None
    assert rows[3]["geometry"] == "g3"  # null definition stays public


# ---------------------------------------------------------------------------
# JSON auth provider (JsonFileAuthorizationProvider/AuthorizationSet parity)
# ---------------------------------------------------------------------------


def test_json_auth_provider_truth_table(tmp_path):
    import json

    from geowave_spark.operators.visibility import (
        empty_auth_provider,
        load_auth_provider,
    )

    doc = {"authorizationSet": {
        "alice": ["secret", "ops"],
        "bob": ["ops"],
        "carol": [],
    }}
    p = tmp_path / "auths.json"
    p.write_text(json.dumps(doc))
    auths_for = load_auth_provider(str(p))
    assert auths_for("alice") == frozenset({"secret", "ops"})
    assert auths_for("bob") == frozenset({"ops"})
    assert auths_for("carol") == frozenset()
    assert auths_for("mallory") == frozenset()  # unknown -> fail closed
    assert empty_auth_provider()("alice") == frozenset()


def test_json_auth_provider_rejects_malformed(tmp_path):
    import json

    import pytest

    from geowave_spark.operators.visibility import load_auth_provider

    for bad in ({"authorizationSet": ["not", "a", "map"]},
                {"authorizationSet": {"u": "notalist"}},
                {"authorizationSet": {"u": [1, 2]}},
                {"wrong": {}}):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps(bad))
        with pytest.raises(ValueError):
            load_auth_provider(str(p))


def test_auth_provider_drives_row_visibility(spark, tmp_path):
    import json

    from geowave_spark.operators.visibility import (
        apply_visibility,
        load_auth_provider,
    )

    df = spark.createDataFrame(
        [(1, "ops"), (2, "secret&ops"), (3, "secret|public"), (4, None)],
        "event_id long, vis string",
    )
    p = tmp_path / "auths.json"
    p.write_text(json.dumps({"authorizationSet": {
        "alice": ["secret", "ops"], "bob": ["ops"]}}))
    auths_for = load_auth_provider(str(p))
    see = lambda u: sorted(  # noqa: E731
        r["event_id"] for r in apply_visibility(df, set(auths_for(u))).collect()
    )
    assert see("alice") == [1, 2, 3, 4]
    assert see("bob") == [1, 4]
    assert see("mallory") == [4]  # only untagged rows
