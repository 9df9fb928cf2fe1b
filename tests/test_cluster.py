"""Unit tests for clustering / semantic-dedup / domain-cap operators
(`operators/cluster.py`) — the invariants the rows-only driver check
cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_acordos_spark.operators.cluster import (
    domain_cap,
    kmeans_assign,
    semantic_dedup_keep,
)


def _blob_df(spark):
    """Three well-separated 4-d blobs, 5 points each (ids encode the
    blob: 0-4, 10-14, 20-24)."""
    rows = []
    centers = {0: [10.0, 0.0, 0.0, 0.0], 10: [0.0, 10.0, 0.0, 0.0], 20: [0.0, 0.0, 10.0, 0.0]}
    for base, c in centers.items():
        for i in range(5):
            jitter = [((base + i * 7) % 5) * 0.01, ((i * 3) % 5) * 0.01, i * 0.01, 0.0]
            rows.append((base + i, [c[d] + jitter[d] for d in range(4)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKmeans:
    def test_separated_blobs_recovered(self, spark):
        out = kmeans_assign(_blob_df(spark), k=3, n_iter=3).collect()
        by_blob: dict[int, set[int]] = {}
        for r in out:
            by_blob.setdefault(r["vec_id"] // 10, set()).add(r["cluster"])
        # each blob maps to exactly one cluster, and blobs don't collide
        assert all(len(cs) == 1 for cs in by_blob.values())
        assert len({cs.pop() for cs in by_blob.values()}) == 3

    def test_deterministic_and_total(self, spark, sf_oracle):
        emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        a = sorted(map(tuple, kmeans_assign(emb, k=10, n_iter=2).collect()))
        b = sorted(map(tuple, kmeans_assign(emb, k=10, n_iter=2).collect()))
        assert a == b
        assert len(a) == emb.count()  # every vector assigned exactly once
        assert {c for _, c in a} <= set(range(10))

    def test_early_exit_on_convergence(self, spark, monkeypatch):
        """Well-separated blobs converge after one centroid update; with
        tol set, a 50-iteration budget must NOT run 50 assignment scans."""
        import etl_acordos_spark.operators.cluster as cl

        calls: list[int] = []
        orig = cl._assign_udf

        def counting(C):
            calls.append(1)
            return orig(C)

        monkeypatch.setattr(cl, "_assign_udf", counting)
        out = kmeans_assign(
            _blob_df(spark), k=3, n_iter=50, tol=1e-7
        ).collect()
        # loop iterations + the final assignment projection
        assert len(calls) <= 4, f"no early exit: {len(calls)} assignment scans"
        by_blob: dict[int, set[int]] = {}
        for r in out:
            by_blob.setdefault(r["vec_id"] // 10, set()).add(r["cluster"])
        assert all(len(cs) == 1 for cs in by_blob.values())
        assert len({cs.pop() for cs in by_blob.values()}) == 3


class TestSemanticDedup:
    def test_same_cluster_duplicate_dropped_cross_cluster_kept(self, spark):
        df = spark.createDataFrame(
            [
                (1, 0, [1.0, 0.0]),   # kept: lowest id in cluster 0
                (2, 0, [1.0, 0.0]),   # dropped: duplicate of 1, same cluster
                (3, 0, [0.0, 1.0]),   # kept: orthogonal to 1
                (4, 1, [1.0, 0.0]),   # kept: duplicate of 1 but other cluster
            ],
            "vec_id long, label int, embedding array<float>",
        )
        kept = {
            r["vec_id"]
            for r in semantic_dedup_keep(
                df, threshold=0.9, cluster_col="label"
            ).collect()
        }
        assert kept == {1, 3, 4}

    def test_threshold_one_keeps_non_identical(self, spark, sf_oracle):
        emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        kept = semantic_dedup_keep(emb, threshold=1.01, cluster_col="label")
        assert kept.count() == emb.count()  # nothing exceeds cosine 1

    def test_gram_path_matches_fold_path(self, spark, sf_oracle):
        emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        fold = semantic_dedup_keep(emb, threshold=0.25, cluster_col="label")
        fast = semantic_dedup_keep(
            emb, threshold=0.25, cluster_col="label", gram=True
        )
        assert sorted(map(tuple, fold.collect())) == sorted(
            map(tuple, fast.collect())
        )

    def test_kmeans_feeds_semdedup(self, spark, sf_oracle):
        """The production composition: k-means cells bound the SemDeDup
        pair space; the keep-set is a subset of ids and total."""
        emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        cells = kmeans_assign(emb, k=16, n_iter=2)
        clustered = emb.join(cells, "vec_id").select(
            "vec_id", "cluster", "embedding"
        )
        kept = semantic_dedup_keep(
            clustered, threshold=0.25, cluster_col="cluster", gram=True
        )
        n_kept, n_all = kept.count(), emb.count()
        assert 0 < n_kept <= n_all
        assert kept.select("vec_id").distinct().count() == n_kept


class TestDomainCap:
    def test_cap_respected_and_subset(self, spark, sf_oracle):
        docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
        capped = domain_cap(docs, cap=15, domain_col="source", id_col="doc_id")
        per_src = {
            r["source"]: r["n"]
            for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per_src and all(n <= 15 for n in per_src.values())
        # a source with >= 15 docs is capped exactly at 15
        full = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for src, n in full.items():
            assert per_src.get(src, 0) == min(n, 15)
        # kept ids are a subset of input ids
        assert capped.join(docs, ["doc_id", "source"], "left_anti").count() == 0

    def test_deterministic(self, spark, sf_oracle):
        docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
        a = sorted(map(tuple, domain_cap(docs, 10, "source", "doc_id").collect()))
        b = sorted(map(tuple, domain_cap(docs, 10, "source", "doc_id").collect()))
        assert a == b


def test_kmeans_sf001_matches_numpy_lloyd_reference(spark, sf_oracle):
    """End-to-end pin for the float production path (k=10, 4 iters,
    first-k-by-id init): replay Lloyd's in pure numpy with the SAME
    init, per-iteration 9-dp centroid rounding, and tol early-exit, and
    require the final ASSIGNMENTS to agree exactly for every vector
    (VERDICT r5 item 8 — the distributed partial-sum reduction must not
    drift the centroids through the 9-dp grid). The REGISTERED
    ext_kmeans run is the quantized exact-integer variant, hash-checked
    against the unrolled-CTE DuckDB oracle (test_oracle_parity); the
    quantized/float label agreement is pinned below."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=10, n_iter=4).collect()
    }

    rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    C = X[:10].copy()

    def assign(C):
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
        return np.argmin(d, axis=1)

    for _ in range(4):
        a = assign(C)
        new_C = C.copy()
        for c in range(10):
            m = a == c
            if m.any():
                new_C[c] = X[m].sum(axis=0) / m.sum()
        new_C = np.round(new_C, 9)
        moved = float(np.max(np.abs(new_C - C)))
        C = new_C
        if moved < 1e-7:
            break
    expect = dict(zip(ids, assign(C).tolist()))
    assert got == expect


def test_kmeans_quantized_agrees_with_float_path(spark, sf_oracle):
    """The quantized exact-integer variant (the registered ext_kmeans
    run, quantize=2^20) must label this fixture identically to the
    float production path — the 2^-20 grid is far below the cluster
    separation, so quantization must not move any vector across a
    Voronoi boundary here. Both runs are deterministic, so this is a
    stable pin, not a flaky tolerance check."""
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    quant = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=10, n_iter=4, quantize=1 << 20).collect()
    }
    flt = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=10, n_iter=4).collect()
    }
    assert quant == flt


def test_kmeans_quantized_rerun_stable(spark, sf_oracle):
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    a = sorted(
        map(tuple, kmeans_assign(emb, k=5, n_iter=2, quantize=1 << 20).collect())
    )
    b = sorted(
        map(tuple, kmeans_assign(emb, k=5, n_iter=2, quantize=1 << 20).collect())
    )
    assert a == b
