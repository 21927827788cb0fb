"""CSV source/sink (S2/K6 — SURVEY.md §2a).

The reference reads its batch manifest with ``csv.DictReader``
(``batch/processing/utils.py:16-18``) and writes the completion ledger as
``rasters.csv`` (``batch/processing/upload.py:17-24,35-44``). Spark's
built-in csv source/sink covers both; these wrappers pin the engine
conventions (header on, explicit schema on read — no inference jobs at
scale, UTC timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K6: header CSV, sharded by partition (job-atomic per directory)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """S2: schema-pinned CSV scan — inference is a full extra pass over
    the data at 100 TB, so the engine requires an explicit schema."""
    return spark.read.schema(schema).option("header", True).csv(path)
