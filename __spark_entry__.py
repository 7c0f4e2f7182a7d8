"""Driver contract: entry (smoke), queries (Spark plans), oracle_sql (DuckDB).

Every operator from SURVEY.md §2 that is implemented gets a ``queries()``
entry; when the semantics are ANSI-SQL-expressible the matching
``oracle_sql()`` entry reproduces it in DuckDB on the same parquet tables.
Spatial queries run over deterministic integer-derived geo views
(geowave_spark/sources/tables.py) so both engines see bit-identical
coordinates.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from geowave_spark.registry import ENTRY_SF_DIR, ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-box spatial cover-join over sf0.001 geo events."""
    return QUERIES["bbox_suite"](spark, ENTRY_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
