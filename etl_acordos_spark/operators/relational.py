"""Relational operators over the star schema.

The reference has no joins, aggregations, windows, or sorts (SURVEY.md
§2.6) — these are the extension inventory, built Spark-first:

  - Dimension joins broadcast the small side explicitly; the fact-side
    scan never shuffles for a dim lookup. At 100 TB the fact table is the
    only thing that should ever move, and only when an agg/join keys on it.
  - Aggregations are single-pass hash aggregates (partial map-side combine
    comes free from Catalyst).
  - Top-k per group is a window + row_number, which AQE executes as a
    local sort within hash-partitioned groups — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column | str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Join a fact table with N dimension tables (equi-joins).

    Each element of *dims* is ``(dim_df, join_condition_or_key)``. Small
    dims are broadcast — a 5-row `region` table must never induce a
    shuffle of a 100 TB `lineitem`.
    """
    out = fact
    for dim, cond in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=cond, how="inner")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` for the same key. Spark has no native ASOF —
    this is the scalable composition: tag both sides, union, and carry
    right values forward with ``last(ignorenulls)`` over one
    (key, ts)-sorted window.

    One shuffle + one sort per key — no range self-join, no candidate
    explosion; ties at equal ts sort the right row first (matching
    DuckDB/Pandas ASOF `>=` semantics). Skewed hot keys behave like any
    window: AQE-split, state O(1) per carried column.
    """
    lcols = left.columns
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in right_cols
    ]
    return (
        u.select(*lcols, "_side", *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def range_join_binned(
    fact: DataFrame,
    val_col: str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Range join (fact.value in [lo, hi)) via binning: explode each
    range onto the fixed-width bins it covers, equi-join on bin, then
    refine with the exact predicate.

    The naive plan is a broadcast-nested-loop (O(|fact|·|ranges|)); the
    binned plan is an equi-join a 100 TB fact can shuffle-partition or
    broadcast on, with per-row work O(ranges-per-bin). Choose bin_width
    ~ the median range width so each range explodes to O(1) bins.
    """
    rb = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    fb = fact.withColumn(
        "_bin", F.floor(F.col(val_col) / bin_width).cast("long")
    )
    return (
        fb.join(F.broadcast(rb), "_bin")
        .filter(
            (F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via row_number over a partitioned window.

    *order_cols* must yield a total order (add a unique tiebreaker) or
    results are nondeterministic — determinism matters more at 1000
    executors, not less.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
