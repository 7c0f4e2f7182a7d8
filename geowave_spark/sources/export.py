"""Vector export — the reference's VectorLocalExportCommand analogue
(extensions/adapters/vector/.../export/VectorLocalExportCommand.java:
query results → Avro files).  Spark-native: any query DataFrame →
columnar files in the requested format; geometry columns travel as WKB
binary (parquet) or hex (csv/json, which can't carry binary)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_vector(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    out = df
    if fmt in ("csv", "json"):
        for f in df.schema.fields:
            if f.dataType.typeName() == "binary":
                out = out.withColumn(f.name, F.hex(F.col(f.name)))
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    getattr(w, fmt)(path)
