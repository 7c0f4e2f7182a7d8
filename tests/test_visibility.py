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
