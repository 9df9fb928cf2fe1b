"""Graph analytics over co-occurrence edges, DataFrame-first.

The reference has no graph surface; this extends the engine with the
two batch-graph primitives a warehouse actually runs — building an
item co-occurrence graph from a fact table and counting triangles on
it (community density, recommendation strength, fraud rings). The
iterative connected-components labeller already lives in
operators/dedup.py (`ext_dedup_keep`); this module holds the
non-iterative, pure join/agg shapes.

Scale notes: triangle counting uses the degree-orientation algorithm
(each undirected edge directed from its lower-(degree, id) endpoint to
the higher one), which bounds every vertex's out-degree by O(sqrt(m))
on any graph — the wedge join then generates O(m^1.5) candidates
worst-case instead of sum(deg^2), the standard distributed formulation
(cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
Last Reducer", WWW'11). Everything shuffles on vertex ids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def co_occurrence_edges(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Distinct undirected co-occurrence edges (src < dst): two items
    are connected iff they appear in the same group (same order, same
    basket, same document). The self-join is per-group — a group with
    g items emits C(g, 2) pairs, so bound pathological groups upstream
    (a 10k-item basket emits 50M pairs; cap or sample it) the same way
    the LSH buckets cap degenerate bands."""
    li = items.select(group_col, item_col).distinct()
    a = li.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("src")
    )
    b = li.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("dst")
    )
    return (
        a.join(b, "_g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_counts(edges: DataFrame, k: int = 20) -> DataFrame:
    """Top-k vertices by triangle participation over an undirected
    edge list (src < dst, distinct).

    Orients each edge low→high by (degree, id), joins oriented wedges
    (u→v, v→x) against oriented edges (u→x) so every triangle is
    produced exactly once, then explodes the triple to per-vertex
    counts. Per-vertex participation is orientation-invariant, so a
    plain a<b<c three-way self-join reproduces it exactly (the oracle's
    formulation). Ties at the top-k boundary break by vertex id — the
    returned row SET is deterministic.

    Returns (vertex, n_triangles) — k rows.
    """
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        edges.join(
            deg.select(F.col("v").alias("src"), F.col("deg").alias("_ds")),
            "src",
        ).join(
            deg.select(F.col("v").alias("dst"), F.col("deg").alias("_dd")),
            "dst",
        )
    )
    src_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("w"),
    )
    o1 = oriented.select(F.col("u").alias("a"), F.col("w").alias("b"))
    o2 = oriented.select(F.col("u").alias("b"), F.col("w").alias("c"))
    o3 = oriented.select(F.col("u").alias("a"), F.col("w").alias("c"))
    tri = o1.join(o2, "b").join(o3, ["a", "c"])
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("vertex"))
        .limit(k)
    )
