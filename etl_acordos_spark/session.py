"""SparkSession factory.

The reference runs each pipeline step as a single-threaded pandas process
under Airflow's LocalExecutor (reference docker-compose.yml:68,
tasks/bronze.py:43). Here one Spark application owns the whole dataflow:
the driver plans, executors run partitioned tasks, and all intra-layer
ordering falls out of lazy evaluation.

Defaults are chosen for correctness-at-scale first:
  - AQE on (runtime partition coalescing, skew-join splitting, join
    re-planning) — at 100 TB the static plan is always wrong somewhere.
  - UTC session timezone so timestamp semantics are stable across the
    cluster and reproducible against external oracles.
  - Arrow enabled for the Python boundary (Pandas UDFs, toPandas).
  - shuffle partitions default to a local-friendly 32; a real cluster
    deployment overrides via `extra_conf` (rule of thumb: 2-3x total
    executor cores, with AQE coalescing the tail).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "etl_acordos_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default tuning."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = {
        "spark.sql.shuffle.partitions": DEFAULT_SHUFFLE_PARTITIONS,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.ui.enabled": "false",
        # 48g default for tests/interactive work; bench.py intentionally
        # pins 8g (bench.py, BASELINE.md neutrality check) so recorded
        # timings aren't flattered by an oversized driver heap.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        # Files >128MB split into tasks; at 100 TB this keeps scan tasks
        # memory-bounded regardless of file layout.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Managed (e.g. bucketed) tables land in scratch, not the repo.
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
