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


# NULLs are written as this sentinel so the reader can tell them from
# genuine empty strings (Spark's default maps BOTH to null on read) —
# pinned on both sides, the round trip is lossless.
NULL_SENTINEL = "\\N"


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K6: header CSV, sharded by partition (job-atomic per directory).
    NULLs write as the ``\\N`` sentinel (empty string stays ``""``)."""
    df.write.mode(mode).option("header", True).option(
        "nullValue", NULL_SENTINEL
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """S2: schema-pinned CSV scan — inference is a full extra pass over
    the data at 100 TB, so the engine requires an explicit schema.
    ``multiLine`` handles quoted embedded newlines; the NULL sentinel
    restores the write side's null-vs-empty distinction."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", "true")
        .option("nullValue", NULL_SENTINEL)
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K7: compact JSON-lines sink (the reference's write_json utility is
    dead code, pipeline/processing/utils.py:17-19 — shipped here because
    the engine's users export manifests/ledgers as JSON)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines scan, schema-pinned like read_csv."""
    return spark.read.schema(schema).json(path)
