"""Query registry plumbing shared by all query modules."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QueryDef:
    """A declared operator demonstration: Spark plan + DuckDB oracle.

    ``oracle`` is ``None`` for ops whose semantics aren't
    ANSI-SQL-expressible (sinks with side effects, LSH, streaming) — the
    driver then records a weaker rows-only check.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its nano-precision timestamps.

    The testdata writes ``ts`` as parquet TIMESTAMP(NANOS) which Spark
    rejects by default; read the raw int64 nanos and convert to
    micro-precision TIMESTAMP_NTZ (integer `div`, not float division —
    nanos exceed double's 2^53 exact-integer range).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = t(spark, sf_dir, "events")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def scratch_dir() -> str:
    """Writable scratch space for sink demonstrations."""
    path = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/spark_graft_scratch")
    os.makedirs(path, exist_ok=True)
    return path


def all_queries() -> dict[str, QueryDef]:
    """Merge every query module's registry (import here to avoid cycles).

    Key ORDER is load-bearing: the driver's per-round CORRECTNESS check
    caps at the first 50 registry keys. Rounds 1-2 covered the natural
    core→relational head, so round 3 front-loads the surfaces that have
    never had a hard driver row — the LLM-data-pipeline family, then
    streaming, then extensibility — plus the repaired ``ext_approx``
    hoisted to slot 1 so its previously-ERR row re-verifies clean (slot 2
    is the flagship, inserted by ``__spark_entry__.queries()``). That
    window is exactly 1 + 1 + 34 llm + 7 streaming + 7 extensibility =
    50; the already-driver-green core/relational/pipeline keys rotate
    behind it, guarded by tests/test_oracle_parity.py.
    """
    from etl_acordos_spark.queries import (
        core,
        extensibility,
        llm,
        pipeline,
        relational,
        streaming,
    )

    merged: dict[str, QueryDef] = {}
    for mod in (llm, streaming, extensibility, core, relational, pipeline):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(mod.QUERIES)
    out = {"ext_approx": merged.pop("ext_approx")}
    out.update(merged)
    return out
