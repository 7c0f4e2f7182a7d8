"""geowave_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the capabilities of the reference engine (willcohen/geowave — a
multi-dimensional SFC indexing layer over sorted key-value stores) as
idiomatic Spark: DataFrame plans, Arrow-vectorized pandas UDFs for the
geometry hot path, broadcast/sort-merge cell-key joins, and explicit
partitioning/salting for skew.

Layout
------
functions/   pure-numpy cell + geometry kernels and their pandas-UDF wrappers
sources/     deterministic synthetic image table + geo-derived views of the
             driver testdata tables
operators/   query operators (bbox, polygon, kNN, temporal, tiling, dedup,
             similarity, text) — each returns a DataFrame plan
plans/       query planner (constraints → cover join) and checkpointing
streaming/   structured-streaming ingest shape (reference has no stream
             engine; see SURVEY.md §2.10)
"""

__version__ = "0.1.0"

from geowave_spark.session import get_spark  # noqa: F401
