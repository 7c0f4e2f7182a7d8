"""The driver's correctness gate, in-repo: every oracle-checked registry
query compared row-for-row against its DuckDB SQL at sf0.001.

(test_pipeline.py covers the documents/embeddings family at module level;
this sweep covers the whole registry so a regression in any query fails
fast locally before the driver sees it.)"""

from __future__ import annotations

import duckdb
import pytest

from geowave_spark.registry import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

# driver-gated roster + local-only extras (format round trips) get the
# identical oracle-exact sweep; only the former produce driver rows
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck_all(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck_all, name):
    spdf = ALL_QUERIES[name](spark, sf_dir).toPandas()
    osql = ALL_ORACLES[name]
    if callable(osql):  # sf-dependent oracle (e.g. trained-tokenizer packs)
        osql = osql(sf_dir)
    opdf = duck_all.execute(osql).fetchdf()
    cols = sorted(spdf.columns)
    assert sorted(opdf.columns) == cols, f"{name}: column mismatch"
    a = spdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = opdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            assert (av.astype(float) - bv.astype(float)).abs().max() < 1e-12, (
                f"{name}.{c}"
            )
        else:
            assert (av.astype(str) == bv.astype(str)).all(), f"{name}.{c}"
