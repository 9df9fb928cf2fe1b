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
