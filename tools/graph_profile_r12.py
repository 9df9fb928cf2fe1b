"""Round-12 phase profiler for the two heaviest bench keys
(ext_triangle_count, ext_pagerank) at $SPARK_GRAFT_SF_DIR.

Breaks each query into its blocking phases (the localCheckpoint pins,
the crossover count, the final wedge/rank job) and times each one so
the optimization targets the phase that actually costs (guide §1.1).
Run on an otherwise-idle box.
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
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("graph-profile-r12")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_acordos_spark.queries.base import t
    from etl_acordos_spark.operators.graph import co_occurrence_edges

    PIN = StorageLevel.MEMORY_AND_DISK

    def phase(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {label:42s} {dt:7.3f} s")
        return out

    for rep in range(2):
        print(f"== triangle phases (rep {rep}) ==")
        li = t(spark, SF_DIR, "lineitem")
        edges_plan = co_occurrence_edges(
            li, "l_orderkey", "l_partkey", max_group_size=1000
        )
        edges = phase(
            "edges build+pin",
            lambda: edges_plan.localCheckpoint(eager=True, storageLevel=PIN),
        )
        deg = (
            edges.select(F.col("src").alias("v"))
            .unionAll(edges.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        e = edges.join(
            deg.select(F.col("v").alias("src"), F.col("deg").alias("_ds")),
            "src",
        ).join(
            deg.select(F.col("v").alias("dst"), F.col("deg").alias("_dd")),
            "dst",
        )
        src_first = (F.col("_ds") < F.col("_dd")) | (
            (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
        )
        oriented_plan = e.select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("w"),
        )
        oriented = phase(
            "orient (deg agg + 2 joins) + pin",
            lambda: oriented_plan.localCheckpoint(
                eager=True, storageLevel=PIN
            ),
        )
        n_edges = phase("crossover count", oriented.count)
        print(f"    oriented edges: {n_edges}")
        o1 = oriented.select(F.col("u").alias("a"), F.col("w").alias("b"))
        o2 = F.broadcast(
            oriented.select(F.col("u").alias("b"), F.col("w").alias("c"))
        )
        o3 = F.broadcast(
            oriented.select(F.col("u").alias("a"), F.col("w").alias("c"))
        )
        tri = o1.join(o2, "b").join(o3, ["a", "c"])
        final = (
            tri.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
            .groupBy("vertex")
            .agg(F.count("*").cast("bigint").alias("n_triangles"))
            .orderBy(F.desc("n_triangles"), F.asc("vertex"))
            .limit(20)
        )
        phase(
            "wedge join + agg + topk (noop)",
            lambda: final.write.format("noop").mode("overwrite").save(),
        )

        print(f"== pagerank phases (rep {rep}) ==")
        edges_plan = co_occurrence_edges(
            t(spark, SF_DIR, "lineitem"), "l_orderkey", "l_partkey",
            max_group_size=1000,
        )
        sym = edges_plan.select("src", "dst").unionAll(
            edges_plan.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        degp = sym.groupBy("src").agg(F.count("*").alias("_deg"))
        out = phase(
            "sym+deg join + pin",
            lambda: sym.join(degp, "src")
            .select("src", "dst", "_deg")
            .localCheckpoint(eager=True, storageLevel=PIN),
        )
        n = phase("vertex count", out.select("src").distinct().count)
        print(f"    vertices: {n}")
        ranks = (
            out.select("src")
            .distinct()
            .select(F.col("src").alias("v"), F.lit(1.0 / n).alias("rank"))
        )
        base = (1.0 - 0.85) / n
        from etl_acordos_spark.operators.graph import _pagerank_iteration

        for i in range(10):
            r = ranks
            ranks = phase(
                f"iteration {i}",
                lambda: _pagerank_iteration(
                    out, r, base, 0.85, True
                ).localCheckpoint(eager=True),
            )
        final = (
            ranks.select(F.col("v").alias("vertex"), "rank")
            .orderBy(F.desc("rank"), F.asc("vertex"))
            .limit(20)
        )
        phase(
            "topk (noop)",
            lambda: final.write.format("noop").mode("overwrite").save(),
        )
    spark.stop()


if __name__ == "__main__":
    main()
