"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle must match DuckDB row-for-row (order-insensitive) at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    got = canon(E.queries()[name](spark, SF_DIR).toPandas())
    want = canon(run_oracle(E.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.array_equal(g, w.astype(g.dtype)), f"{name}.{c} float mismatch"
        else:
            assert (g == w).all(), f"{name}.{c} mismatch"


def test_registry_fits_driver_gate():
    """The driver checks (at most) the first 50 queries() entries: round 2
    registered 51 and the 51st (json_props) silently vanished from
    CORRECTNESS_r02.json.  Pin the roster at <= 50 so every registered
    query gets a correctness row, and pin the queries that regressed out
    of the gate before."""
    q = E.queries()
    assert len(q) <= 50, f"{len(q)} queries registered; driver gates 50"
    assert "json_props" in q
    assert set(E.oracle_sql()) <= set(q)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_all_queries_run_sf0001(spark):
    """Every registered query (oracle or not) must at least execute."""
    for name, fn in E.queries().items():
        n = fn(spark, "/root/testdata/sf0.001").count()
        assert n >= 0, name
