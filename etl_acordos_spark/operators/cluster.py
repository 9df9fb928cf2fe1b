"""Embedding clustering + semantic dedup — corpus-shaping operators an
LLM training-data pipeline runs after near-dedup (LLM-pipeline extension,
SURVEY.md §2.6; no counterpart exists in the 558-line reference, which
has no array/vector processing at all).

Two operators:

- `kmeans_assign` — Lloyd's k-means expressed as DataFrame iterations:
  per-iteration ONE fused Arrow-batched mapInPandas (numpy matmul
  assignment + partition-local `np.add.at` centroid sums) followed by
  one tiny (cluster, pos) shuffle of partial sums — the exchange
  carries O(partitions·k·dim) rows and no per-element explode ever
  materializes. Centroids live on the driver (k·dim doubles —
  kilobytes), the corpus never leaves the executors. This is the same
  aggregation shape MLlib's k-means uses (treeAggregate of
  per-partition sums), declared in DataFrame ops.

- `semantic_dedup_keep` — SemDeDup-style semantic dedup (Abbas et al.
  2023): within each cluster, drop a vector when a lower-id vector in
  the SAME cluster has cosine ≥ threshold. Clustering bounds the pair
  space — the self-join shuffles by cluster id only, so cost is
  Σ|cluster|², never |corpus|². Cosines use the sequential
  `zip_with`/`aggregate` fold (bit-identical to DuckDB's
  `list_dot_product`, so the keep-set is exactly SQL-checkable).
  Divergence from the paper's greedy chain (keep-if-far-from-already-
  KEPT): the one-hop rule is order-free and ANSI-SQL-expressible, which
  buys an exact oracle; at equal thresholds it drops a superset of the
  greedy rule's drops.

At 100 TB: k-means scans are linear per iteration (persist the projected
(id, vec) frame across iterations); SemDeDup's per-cluster pair cost is
controlled by k — more clusters, cheaper dedup, at the price of missing
cross-cluster near-dups (the paper's accepted trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_acordos_spark.operators.simsearch import as_double, cosine


def _assign_udf(centroids: np.ndarray):
    """Nearest-centroid assignment: one (batch × dim) @ (dim × k) matmul
    per Arrow batch; argmin of squared L2 via the -2x·c + |c|² identity
    (|x|² is constant per row). Ties break to the lowest cluster id
    (np.argmin) — deterministic. With int64 centroids (the quantized
    exact mode) every product/sum is exact integer arithmetic, so the
    argmin is order-independent and bit-reproducible in ANY engine."""
    exact = np.issubdtype(np.asarray(centroids).dtype, np.integer)
    C = np.asarray(centroids, dtype=np.int64 if exact else np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(C.dtype)
        scores = -2 * (mat @ C.T) + c_sq
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return assign


def _partial_stats(centroids: np.ndarray):
    """Fused assignment + partition-local centroid sums for one Lloyd
    iteration: each Arrow batch is assigned with the same matmul as
    `_assign_udf`, then folded into per-cluster (sum, count)
    accumulators with `np.add.at` — one output row per non-empty
    (cluster, pos) per PARTITION, i.e. the exchange carries
    O(partitions·k·dim) rows with no 64×-row explode ever
    materializing. The same treeAggregate shape MLlib's k-means uses,
    with numpy doing the partition-local reduction."""
    from collections.abc import Iterator

    exact = np.issubdtype(np.asarray(centroids).dtype, np.integer)
    C = np.asarray(centroids, dtype=np.int64 if exact else np.float64)
    k, dim = C.shape
    c_sq = (C * C).sum(axis=1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dim), dtype=C.dtype)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(C.dtype)
            a = np.argmin(-2 * (mat @ C.T) + c_sq, axis=1)
            np.add.at(sums, a, mat)
            counts += np.bincount(a, minlength=k)
        nz = np.nonzero(counts)[0]
        if len(nz):
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(nz, dim).astype(np.int32),
                    "pos": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                    "s": sums[nz].reshape(-1),
                    "n": np.repeat(counts[nz], dim),
                }
            )

    return run


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-7,
    quantize: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over an embedding column; returns (id, cluster).

    Deterministic end-to-end: init is the first k vectors by id; each
    recomputed centroid component is rounded to 9 dp before broadcast so
    the order-dependent last-ulp noise of a distributed float sum cannot
    leak into assignments. *n_iter* bounds the iterations; the loop
    exits early once the max centroid movement drops below *tol* —
    every converged iteration saved is one full assignment scan plus one
    (cluster, pos) shuffle that never runs.

    With *quantize* = Q (a power of two) the whole run happens in an
    EXACT shifted-integer domain: components become
    ``floor(x·Q + 0.5) + Q`` (int64; x·Q is exact for float32 inputs
    because Q only shifts the exponent, and the +Q shift keeps every
    value non-negative — truncating division == floor in any engine —
    for components in [-1, 1], which an in-plan raise enforces), all
    distances/sums are exact int64 arithmetic with no summation-order
    sensitivity, and centroid updates round half-up via
    ``(2·sum + n) // (2·n)``. That makes the full iteration ANSI-SQL
    replayable (the `ext_kmeans` DuckDB oracle unrolls the rounds as
    chained CTEs); the float path stays the production default — BLAS
    matmuls beat int64 matmuls and real pipelines don't need
    cross-engine bit-equality.
    """
    if quantize:
        q = float(quantize)

        def _quantized(x):
            # The +Q shift keeps values positive only for x >= -1;
            # a negative shifted int would split the engines (DuckDB
            # `//` truncates toward zero, Python floors). Guard the
            # domain inside the used column so the check can't be
            # pruned; normalized embeddings always satisfy it.
            guarded = F.when(
                # isnan is explicit: NaN fails both comparisons, and
                # floor(NaN·Q).cast(long) would otherwise turn it into
                # silent garbage instead of this raise
                F.isnan(x) | (x < F.lit(-1.0)) | (x > F.lit(1.0)),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "kmeans_assign: quantize requires components"
                            " in [-1, 1] (the exact-int domain breaks"
                            " below -1), got "
                        ),
                        x.cast("string"),
                    )
                ),
            ).otherwise(x)
            return (
                F.floor(guarded * F.lit(q) + F.lit(0.5)).cast("long")
                + F.lit(int(quantize))
            )

        vecs = df.select(
            F.col(id_col).alias("id"),
            F.transform(as_double(vec_col), _quantized).alias("v"),
        )
        stats_schema = "cluster int, pos int, s bigint, n bigint"
    else:
        vecs = df.select(
            F.col(id_col).alias("id"), as_double(vec_col).alias("v")
        )
        stats_schema = "cluster int, pos int, s double, n bigint"
    vecs.persist()
    try:
        init = vecs.orderBy("id").limit(k).collect()
        if not init:
            raise ValueError("kmeans_assign: empty input — no vectors to cluster")
        dtype = np.int64 if quantize else np.float64
        C = np.stack([np.asarray(r["v"], dtype=dtype) for r in init])
        dim = C.shape[1]

        for _ in range(n_iter):
            # fused assign + partition-local sums (one mapInPandas),
            # then one tiny (cluster, pos) shuffle of partial sums
            stats = (
                vecs.mapInPandas(_partial_stats(C), schema=stats_schema)
                .groupBy("cluster", "pos")
                .agg(F.sum("s").alias("ss"), F.sum("n").alias("nn"))
                .collect()
            )
            new_C = C.copy()  # empty cluster keeps its old centroid
            for r in stats:
                if quantize:
                    # round-half-up integer mean; operands all positive
                    m = (2 * r["ss"] + r["nn"]) // (2 * r["nn"])
                else:
                    m = r["ss"] / r["nn"]
                new_C[r["cluster"], r["pos"]] = m
            if not quantize:
                new_C = np.round(new_C, 9)
            moved = float(np.max(np.abs(new_C - C)))
            C = new_C
            if moved < (1 if quantize else tol):
                break

        return vecs.select(
            F.col("id").alias(id_col),
            _assign_udf(C)(F.col("v")).alias("cluster"),
        )
    finally:
        vecs.unpersist()


def semantic_dedup_keep(
    df: DataFrame,
    threshold: float,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gram: bool = False,
) -> DataFrame:
    """SemDeDup keep-set: (id, cluster) of vectors NOT dominated by a
    lower-id vector in the same cluster with cosine ≥ threshold.

    Two physical strategies, identical semantics:

    - `gram=False` (oracle form): cluster-keyed self-join + the
      sequential `zip_with`/`aggregate` cosine fold — bit-identical to
      DuckDB's `list_dot_product`, so exactly SQL-checkable. Per-pair
      interpreted-HOF cost: right at verification scale, wrong beyond.
    - `gram=True` (scale path): one `applyInPandas` per cluster builds
      the normalized gram matrix with a single numpy matmul and reads
      the dominated ids off the strict lower triangle — same O(|c|²)
      pair count but vectorized, ~100× the fold's throughput. Requires
      each cluster to fit one task (the standard SemDeDup contract —
      pick k so |cluster| ≲ 10⁵); numpy's blocked summation can differ
      from the sequential fold in the last ulp, so a pair EXACTLY at
      the rounded threshold boundary may flip — calibrate thresholds
      away from observed cosines.

    Both paths round cosines to 6 dp before the compare (same contract
    as `cosine_pairs`) and shuffle only by the cluster id — pair cost is
    Σ|cluster|², never |corpus|²."""
    vecs = df.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("v"),
    )
    if gram:

        def dominated_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id")
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            G = np.round(Mn @ Mn.T, 6)
            hit = np.tril(G >= threshold, k=-1).any(axis=1)
            return pdf.loc[hit, ["id"]]

        dominated = vecs.groupBy("cluster").applyInPandas(
            dominated_in_cluster, "id long"
        )
    else:
        a = vecs.select(
            F.col("cluster"), F.col("id").alias("id_a"), F.col("v").alias("v_a")
        )
        b = vecs.select(
            F.col("cluster"), F.col("id").alias("id_b"), F.col("v").alias("v_b")
        )
        dominated = (
            a.join(b, ["cluster"])
            .filter(F.col("id_b") < F.col("id_a"))
            .filter(F.round(cosine("v_a", "v_b"), 6) >= threshold)
            .select(F.col("id_a").alias("id"))
            .distinct()
        )
    return (
        vecs.join(dominated, ["id"], "left_anti")
        .select(F.col("id").alias(id_col), F.col("cluster").alias(cluster_col))
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str,
    id_col: str,
) -> DataFrame:
    """Per-domain document cap: keep at most `cap` rows per domain,
    chosen by a deterministic multiplicative hash of the id (stable
    pseudo-random sample — re-runs and engines agree; same hash family
    as `ext_train_test_split`). The standard web-corpus guard against a
    single domain dominating the training mix.

    One window shuffle keyed on the domain; at 100 TB a hot domain is
    still one partition's sort — cap-then-count semantics need the
    global per-domain ordering, but the window never carries document
    bodies (id + domain + hash only); text re-attaches by semi-join."""
    from pyspark.sql import Window

    from etl_acordos_spark.functions.hashing import hash32

    h = hash32(F.col(id_col))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col), F.col(domain_col), F.row_number().over(w).alias("rn")
    )
    return ranked.filter(F.col("rn") <= cap).select(id_col, domain_col)
