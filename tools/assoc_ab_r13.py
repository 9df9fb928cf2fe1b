"""Round-13 interleaved A/B for the ext_assoc_rules tail (VERDICT r12
item 5): the `grouped` collect_set aggregate feeds FOUR consumers (the
unordered pair count, the two item_counts join sides, the basket
total); exchange reuse dedups the shuffle at runtime but each
consumer re-executes the post-exchange aggregate, and the
pre-execution plan shows 4 lineitem scans.

Variants (same session, alternating after one warmup each):

  v0  operator as committed (import — not a copy)
  v1  item_counts pinned (dim-sized localCheckpoint)
  v2  grouped pinned (basket-sized localCheckpoint) — kills all
      re-executions, costs one materialization of the arrays

Rows are asserted identical across variants each rep.

Usage::

    python tools/assoc_ab_r13.py [reps]
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


def _rules_pinned(items, group_col, item_col, min_pair, k, pin):
    """association_rules body with a localCheckpoint pin on
    `item_counts` (pin='item') or `grouped` (pin='grouped') —
    measurement mirror of operators/relational.py:association_rules."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.operators.graph import (
        group_item_sets,
        sorted_pair_structs,
    )

    grouped = group_item_sets(items, group_col, item_col)
    if pin == "grouped":
        grouped = grouped.localCheckpoint(eager=True)
    und = (
        grouped.select(F.explode(sorted_pair_structs("_items")).alias("_p"))
        .groupBy(
            F.col("_p.src").alias("item_a"), F.col("_p.dst").alias("item_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    pair_counts = und.select(
        F.explode(
            F.array(
                F.struct(F.col("item_a"), F.col("item_b"), F.col("n_ab")),
                F.struct(
                    F.col("item_b").alias("item_a"),
                    F.col("item_a").alias("item_b"),
                    F.col("n_ab"),
                ),
            )
        ).alias("_r")
    ).select("_r.item_a", "_r.item_b", "_r.n_ab")
    item_counts = (
        grouped.select(F.explode("_items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").cast("bigint").alias("_c"))
    )
    if pin == "item":
        item_counts = item_counts.localCheckpoint(eager=True)
    n_baskets = grouped.agg(F.count("*").cast("bigint").alias("_n"))
    grid = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    support = F.col("n_ab") / F.col("_n")
    confidence = F.col("n_ab") / F.col("_ca")
    lift = (F.col("n_ab") / F.col("_ca")) / (F.col("_cb") / F.col("_n"))
    return (
        pair_counts.join(
            item_counts.select(
                F.col(item_col).alias("item_a"), F.col("_c").alias("_ca")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col(item_col).alias("item_b"), F.col("_c").alias("_cb")
            ),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            grid(support).alias("support"),
            grid(confidence).alias("confidence"),
            grid(lift).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b"))
        .limit(k)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("assoc-ab-r13")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_acordos_spark.operators.relational import association_rules
    from etl_acordos_spark.queries.base import t

    def li():
        return t(spark, SF_DIR, "lineitem")

    def v0():
        return association_rules(
            li(), "l_orderkey", "l_partkey", min_pair=3, k=20
        )

    def v1():
        return _rules_pinned(
            li(), "l_orderkey", "l_partkey", 3, 20, pin="item"
        )

    def v2():
        return _rules_pinned(
            li(), "l_orderkey", "l_partkey", 3, 20, pin="grouped"
        )

    variants = [("v0 current", v0), ("v1 pin item_counts", v1),
                ("v2 pin grouped", v2)]
    ref = None
    for name, fn in variants:  # warmup + row check
        rows = sorted(map(tuple, fn().collect()))
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} rows differ"
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _ in range(reps):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:20s} min={min(ts):.3f}s all={[round(x,3) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
