"""Round-13 interleaved A/B for the triangle broadcast branch's `adj`
double-aggregate (r12 ADVICE, low): `adj` (shuffle + collect_list over
the pinned oriented list) is referenced twice — exploded as the probe
side and broadcast — so the post-exchange aggregate builds twice per
query. Variant B pins adj with a localCheckpoint so it builds once.

Shared setup (edges + oriented pins) is built ONCE per rep outside the
timed region; only the wedge/contribution phase is timed, alternating
A/B. Rows asserted identical.

Usage::

    python tools/triangle_adj_ab_r13.py [reps]
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
        .appName("triangle-adj-ab-r13")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_acordos_spark.operators.graph import (
        _EDGE_PIN,
        co_occurrence_edges,
    )
    from etl_acordos_spark.queries.base import t

    def build_oriented():
        edges = co_occurrence_edges(
            t(spark, SF_DIR, "lineitem"), "l_orderkey", "l_partkey",
            max_group_size=1000,
        ).localCheckpoint(eager=True, storageLevel=_EDGE_PIN)
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
        return e.select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias(
                "w"
            ),
        ).localCheckpoint(eager=True, storageLevel=_EDGE_PIN)

    def wedge_phase(oriented, pin_adj: bool):
        adj = oriented.groupBy("u").agg(F.collect_list("w").alias("_nbrs"))
        if pin_adj:
            adj = adj.localCheckpoint(eager=True, storageLevel=_EDGE_PIN)
        e2 = adj.select(
            "u", F.explode("_nbrs").alias("w"), F.col("_nbrs").alias("_nu")
        ).join(
            F.broadcast(
                adj.select(F.col("u").alias("w"), F.col("_nbrs").alias("_nw"))
            ),
            "w",
        )
        tri_e = e2.select(
            "u", "w", F.array_intersect("_nu", "_nw").alias("_x")
        ).filter(F.size("_x") > 0)
        csize = F.size("_x").cast("long")
        contribs = (
            tri_e.select(F.col("u").alias("vertex"), csize.alias("c"))
            .unionAll(
                tri_e.select(F.col("w").alias("vertex"), csize.alias("c"))
            )
            .unionAll(
                tri_e.select(
                    F.explode("_x").alias("vertex"),
                    F.lit(1).cast("long").alias("c"),
                )
            )
        )
        return (
            contribs.groupBy("vertex")
            .agg(F.sum("c").cast("bigint").alias("n_triangles"))
            .orderBy(F.desc("n_triangles"), F.asc("vertex"))
            .limit(20)
        )

    oriented = build_oriented()
    ref = sorted(map(tuple, wedge_phase(oriented, False).collect()))
    assert ref == sorted(map(tuple, wedge_phase(oriented, True).collect()))
    times = {"A no-pin": [], "B pin-adj": []}
    for _ in range(reps):
        for name, pin in (("A no-pin", False), ("B pin-adj", True)):
            t0 = time.perf_counter()
            wedge_phase(oriented, pin).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:10s} min={min(ts):.3f}s all={[round(x,3) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
