"""ORC source/sink — second columnar format next to Parquet.

The reference stores everything as GeoTIFF/CSV/SQLite; its users moving
to a warehouse stack frequently land in ORC (Hive/Trino estates), so the
engine exposes Spark's built-in ORC reader/writer with the same
conventions as the Parquet path: ZSTD compression (matching the session's
``spark.sql.parquet.compression.codec`` policy) and schema-pinned reads —
schema inference on ORC is cheap (footer metadata) but pinning keeps
ingest contracts explicit and catches drift at plan time, not mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink, ZSTD-compressed, sharded by partition."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC scan; pass a schema to pin the ingest contract (recommended),
    or None to trust the file footer. Predicate pushdown and column
    pruning work exactly as on Parquet (ORC carries min/max indexes)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
