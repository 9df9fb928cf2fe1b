"""Round-13 10x-tile arbitration for the triangle fallback hybrid:
forced-fallback pure wedge (hybrid_core_max_cells=0) vs the skew-split
hybrid (default 20M-cell core budget), same session, alternating runs.
The 10x tile (12M oriented edges, 407M wedges) sits just below the
auto-crossover, so the fallback is FORCED — this is the cheap proxy
for the 100x demoted regime (r12 measured pagerank's forced-shuffle
premium the same way).

Usage::

    python tools/triangle_hybrid_10x_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

os.environ.setdefault("SPARK_GRAFT_SCALE_COPIES", "10")
os.environ.setdefault("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_sf1_r13")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("triangle-hybrid-10x-r13")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/tmp/spark_graft_spill_10x_r13")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.checkpoint.compress", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_smoke import build_scaled_dir

    build_scaled_dir(spark)

    from etl_acordos_spark.operators.graph import (
        co_occurrence_edges,
        triangle_counts,
    )
    from etl_acordos_spark.queries.base import t

    out = os.environ["SPARK_GRAFT_SCALE_DIR"]

    def run(cells: int | None) -> float:
        t0 = time.perf_counter()
        df = triangle_counts(
            co_occurrence_edges(
                t(spark, out, "lineitem"), "l_orderkey", "l_partkey",
                max_group_size=1000,
            ),
            k=20,
            broadcast_edges=False,
            hybrid_core_max_cells=cells,
        )
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times: dict[str, list[float]] = {"pure-wedge": [], "hybrid": []}
    for _ in range(reps):
        times["pure-wedge"].append(run(0))
        times["hybrid"].append(run(20_000_000))
    for name, ts in times.items():
        print(f"{name:10s} min={min(ts):.2f}s all={[round(x,2) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
