"""CSV / JSON-lines IO — interchange formats around the Parquet lake.

The reference ingests only via the Sheets API and stores only Parquet
(SURVEY.md §2.1); real pipelines also exchange CSV and JSONL. Both
formats are row-oriented text — fine as ingest/export edges, wrong as
the lake format — so the helpers here read WITH an explicit schema
(schema inference would scan the data twice and infer per-file at
scale) and write through the same layer-path convention as Parquet.

Scale notes: CSV/JSON scans parallelize per file split, but carry no
column pruning or row-group statistics — a pipeline should land them
to Parquet in bronze and never re-read the text form downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """Read CSV with a pinned schema (no inference pass). Malformed rows
    null out per-column (PERMISSIVE), mirroring the reference's
    coerce-to-null parsing posture (tasks/bronze.py:55-58)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> str:
    """Write CSV (directory of part files — splittable on read)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
    return path


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read JSON lines with a pinned schema."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> str:
    """Write JSON lines."""
    df.write.mode("overwrite").json(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC. Unlike the text formats, ORC is columnar with stripe
    statistics — predicate pushdown and column pruning work as with
    Parquet, so it's an acceptable lake format when the surrounding
    ecosystem (e.g. Hive) is ORC-native; schema comes from the file
    footer, no inference pass."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> str:
    """Write ORC (zlib-compressed by default; splittable stripes)."""
    df.write.mode("overwrite").orc(path)
    return path
