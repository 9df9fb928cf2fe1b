"""Round-13 profile for ext_stream_stateful (VERDICT r12 item 3).

Separates the key's wall time into the micro-batch engine's fixed cost
vs the applyInPandasWithState Python path: runs (interleaved, after one
warmup each, min-of-N printed)

  a) the registry query as declared (applyInPandasWithState running
     totals, update mode);
  b) the same streaming run with a built-in count/sum aggregate
     (complete mode) — identical input, shuffle, state store and sink,
     no Python boundary;
  c) batch applyInPandas over the same grouping — the Python
     per-group emit cost without any streaming engine at all.

If (a) - (b) is small, the key is engine-floor-bound and the emit path
is not worth touching (the r12 leave-alone call); if it is large, (c)
says how much of it is the per-group pandas construction.

Usage::

    python tools/stream_profile_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-profile-r13")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_acordos_spark.queries.streaming import q_ext_stream_stateful
    from etl_acordos_spark.streaming.events import (
        run_stream_to_table,
        stream_events,
    )

    def run_a():
        df = q_ext_stream_stateful(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    def run_b():
        agg = (
            stream_events(spark, SF_DIR)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
        )
        df = run_stream_to_table(
            agg, "stream_builtin_profile", output_mode="complete"
        )
        df.write.format("noop").mode("overwrite").save()

    def run_c():
        import pandas as pd

        def totals(pdf: "pd.DataFrame") -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [pdf["user_id"].iloc[0]],
                    "n_events": [len(pdf)],
                    "sum_value": [round(float(pdf["value"].sum()), 4)],
                }
            )

        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        df = ev.groupBy("user_id").applyInPandas(
            totals, "user_id long, n_events long, sum_value double"
        )
        df.write.format("noop").mode("overwrite").save()

    variants = [("stateful(query)", run_a), ("builtin-agg", run_b),
                ("batch-applyInPandas", run_c)]
    for name, fn in variants:  # warmup each once
        fn()
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _ in range(reps):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name:22s} min={min(ts):.3f}s "
            f"all={[round(x, 3) for x in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
