"""Skewed-duplicate-density stress for the dedup capstones (VERDICT r7
item 5): one 10k-member near-duplicate mega-cluster plus a long tail.

Organic corpora (the sf tiles) never stress the banding cap or the
component loop; this fixture does, and pins three properties:

(a) candidate volume — ALL-PAIRS bucket linking goes O(cluster²)
    through sub-cap buckets (the cap bounds each bucket, not the
    cluster: measured ~8.8M candidates for an 11.5k-doc corpus), while
    STAR linking (`link="min"`, the `ext_dedup_star` path) stays
    O(docs · bands) at any duplicate density;
(b) `component_labels` converges in O(log diameter) rounds on the
    mega-cluster star + a long chain;
(c) `incremental_minhash_dedup`'s probe volume is independent of the
    CORPUS duplicate density (the mega-cluster's over-cap buckets are
    excluded from the probe, so a daily batch costs the same against a
    dup-riddled corpus as against a clean one).

Measured candidate volumes are recorded in BASELINE.md ("skewed
duplicate density" note).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_acordos_spark.operators.dedup import (
    incremental_minhash_dedup,
    keep_representatives,
    minhash_bands,
    minhash_lsh_pairs,
)

# r13: this file is the dedup stress tier — excluded from the default run
# (pytest.ini addopts); run with -m "" or -m slow.
pytestmark = pytest.mark.slow

MEGA = 10_000  # ids 0..9999: near-dup cluster (one word mutated each)
TAIL = 1_460  # ids 20000..: distinct docs
PAIRS = 20  # ids 30000..: engineered near-dup pairs (even, even+1)
BANDS = 16
CAP = 1000


def _skewed_rows():
    base = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(MEGA):
        w = list(base)
        w[i % 30] = f"m{i}"
        rows.append((i, " ".join(w)))
    for d in range(TAIL):
        rows.append((20_000 + d, " ".join(f"t{d}x{j}" for j in range(30))))
    for p in range(PAIRS):
        w = [f"p{p}y{j}" for j in range(30)]
        rows.append((30_000 + 2 * p, " ".join(w)))
        w2 = list(w)
        w2[5] = f"p{p}z"
        rows.append((30_000 + 2 * p + 1, " ".join(w2)))
    return rows


@pytest.fixture(scope="module")
def skewed_docs(spark):
    df = spark.createDataFrame(
        _skewed_rows(), "doc_id bigint, text string"
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_candidate_volume_allpairs_quadratic_star_bounded(spark, skewed_docs):
    """(a): the cap alone does NOT bound all-pairs candidate volume on a
    dup-dense corpus; star linking does — by construction O(entries)."""
    bt = minhash_bands(skewed_docs, "text", "doc_id", 64, BANDS, 3).cache()
    try:
        n_docs = skewed_docs.count()
        sizes = bt.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("n")
        )
        stats = sizes.agg(
            F.max("n").alias("max_bucket"),
            F.sum(F.when(F.col("n") > CAP, 1).otherwise(0)).alias("over"),
            F.sum(
                F.when(
                    F.col("n") <= CAP, F.col("n") * (F.col("n") - 1) / 2
                ).otherwise(0)
            ).alias("allpairs_vol"),
            F.sum(F.col("n") - 1).alias("star_vol"),
        ).head()
        # the stress is real: the mega cluster creates over-cap buckets
        assert stats["over"] >= 1 and stats["max_bucket"] > CAP
        allpairs_vol, star_vol = (
            int(stats["allpairs_vol"]),
            int(stats["star_vol"]),
        )
        # all-pairs linking leaks O(cluster²) through sub-cap buckets
        # (measured 8_773_109 on this fixture)
        assert allpairs_vol > 50 * n_docs
        # star linking is structurally bounded by the band-entry count
        assert star_vol <= BANDS * n_docs
        assert star_vol * 20 < allpairs_vol
    finally:
        bt.unpersist()


def test_star_linking_finds_tail_pairs_and_collapses_mega(spark, skewed_docs):
    """End-to-end star path: the engineered tail pairs all survive the
    Jaccard verify, and keep_representatives collapses the 10k-member
    cluster to a handful of representatives (one per verified
    component) without ever materializing cluster² pairs."""
    pairs = minhash_lsh_pairs(
        skewed_docs, "text", "doc_id", threshold=0.5, link="min"
    ).cache()
    try:
        tail_pairs = {
            (r["doc_a"], r["doc_b"])
            for r in pairs.filter(F.col("doc_a") >= 30_000).collect()
        }
        want = {(30_000 + 2 * p, 30_000 + 2 * p + 1) for p in range(PAIRS)}
        assert want <= tail_pairs
        # one-word mutations keep J ≈ 0.65 >= 0.5, so star edges verify
        # and the mega cluster is a few components, not 10k singletons
        kept = keep_representatives(skewed_docs, pairs, "doc_id")
        mega_kept = kept.filter(F.col("doc_id") < MEGA).count()
        assert 1 <= mega_kept <= 50, mega_kept
        # distinct tail docs are all their own representative
        assert (
            kept.filter(
                (F.col("doc_id") >= 20_000) & (F.col("doc_id") < 30_000)
            ).count()
            == TAIL
        )
    finally:
        pairs.unpersist()


def test_component_labels_log_diameter_convergence(spark):
    """(b): min-label propagation + pointer jumping labels a
    10k-member star AND a diameter-255 chain correctly within 10
    rounds (~log2(diameter) + slack; plain propagation would need 255).
    component_labels' internal convergence check stops the loop, so a
    correct result inside max_iter=10 IS the round-count pin."""
    from etl_acordos_spark.operators.dedup import component_labels

    star = [(0, i) for i in range(1, MEGA)]
    chain = [(20_000 + i, 20_000 + i + 1) for i in range(255)]
    docs = spark.createDataFrame(
        [(i,) for i in range(MEGA)]
        + [(20_000 + i,) for i in range(256)],
        "doc_id bigint",
    )
    pairs = spark.createDataFrame(star + chain, "doc_a bigint, doc_b bigint")
    labels = {
        r["a"]: r["label"]
        for r in component_labels(docs, pairs, "doc_id", max_iter=10).collect()
    }
    assert all(labels[i] == 0 for i in range(MEGA))
    assert all(labels[20_000 + i] == 20_000 for i in range(256))


def test_incremental_probe_independent_of_corpus_dup_density(
    spark, skewed_docs
):
    """(c): the same batch probed against a dup-riddled corpus and a
    clean corpus of the SAME size must (i) produce the same keep
    decisions for docs unrelated to the mega cluster and (ii) generate
    probe-candidate volumes of the same order — the mega cluster's
    over-cap buckets fall out of the probe, so corpus dup density
    cannot inflate daily ingest cost."""
    n_docs = skewed_docs.count()
    clean = spark.createDataFrame(
        [
            (i, " ".join(f"c{i}q{j}" for j in range(30)))
            for i in range(n_docs - 2 * PAIRS)
        ]
        + [
            row
            for p in range(PAIRS)
            for row in [
                (30_000 + 2 * p, " ".join(f"p{p}y{j}" for j in range(30))),
                (
                    30_000 + 2 * p + 1,
                    " ".join(
                        (f"p{p}z" if j == 5 else f"p{p}y{j}")
                        for j in range(30)
                    ),
                ),
            ]
        ],
        "doc_id bigint, text string",
    ).cache()
    # batch: 20 near-dups of the engineered pairs (present in BOTH
    # corpora) + 20 fresh docs
    batch = spark.createDataFrame(
        [
            (
                50_000 + p,
                " ".join(
                    (f"p{p}q" if j == 7 else f"p{p}y{j}") for j in range(30)
                ),
            )
            for p in range(PAIRS)
        ]
        + [
            (60_000 + i, " ".join(f"f{i}r{j}" for j in range(30)))
            for i in range(20)
        ],
        "doc_id bigint, text string",
    ).cache()
    try:
        for corpus in (skewed_docs, clean):
            kept = {
                r["doc_id"]
                for r in incremental_minhash_dedup(
                    corpus, batch, "text", "doc_id", threshold=0.5
                ).collect()
            }
            assert kept == {60_000 + i for i in range(20)}, (
                "dup-of-corpus batch docs must drop, fresh docs must "
                f"survive (corpus dup density must not matter): {kept}"
            )
        # probe volume: batch band entries joined to sub-cap corpus
        # buckets — the structural cost of the daily ingest
        vols = {}
        b_bands = minhash_bands(batch, "text", "doc_id", 64, BANDS, 3).cache()
        for name, corpus in (("skewed", skewed_docs), ("clean", clean)):
            c_bands = minhash_bands(
                corpus, "text", "doc_id", 64, BANDS, 3
            )
            combined_ok = (
                c_bands.select("band_idx", "band_val")
                .unionByName(b_bands.select("band_idx", "band_val"))
                .groupBy("band_idx", "band_val")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") <= CAP)
                .select("band_idx", "band_val")
            )
            vols[name] = (
                b_bands.join(combined_ok, ["band_idx", "band_val"])
                .join(
                    c_bands.withColumnRenamed("doc", "doc_old"),
                    ["band_idx", "band_val"],
                )
                .count()
            )
        b_bands.unpersist()
        # measured: skewed 235, clean 235 — identical; allow 2x slack
        assert vols["skewed"] <= 2 * max(vols["clean"], BANDS * 40), vols
    finally:
        clean.unpersist()
        batch.unpersist()


def test_star_and_clique_linking_agree_on_preverify_components(spark):
    """The docstring claim behind ext_dedup_star: per-bucket star
    candidates (member, bucket-min) induce exactly the same connected
    components as the per-bucket clique — BEFORE Jaccard verification.
    Checked on a mixed corpus (dup cluster + chained near-dups + tail)
    by union-find over both candidate sets derived from the SAME band
    table."""
    base = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):  # small dup cluster
        w = list(base)
        w[i % 30] = f"m{i}"
        rows.append((i, " ".join(w)))
    for d in range(40):  # distinct tail
        rows.append((100 + d, " ".join(f"t{d}x{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bt = minhash_bands(docs, "text", "doc_id", 64, BANDS, 3)
    buckets: dict[tuple, list[int]] = {}
    for r in bt.collect():
        buckets.setdefault((r["band_idx"], r["band_val"]), []).append(
            r["doc"]
        )

    def components(edge_iter):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_iter:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {d: find(d) for d, _ in rows_ids}

    rows_ids = [(r[0], None) for r in rows]
    star_edges = [
        (min(ms), d)
        for ms in buckets.values()
        for d in ms
        if d != min(ms)
    ]
    clique_edges = [
        (a, b)
        for ms in buckets.values()
        for i, a in enumerate(ms)
        for b in ms[i + 1 :]
    ]
    assert components(star_edges) == components(clique_edges)


def test_stream_dedup_index_fold_equivalence_on_skewed_corpus(spark):
    """The streaming dedup index's correctness contract (settled kept
    set == per-batch incremental fold) must survive a duplicate-DENSE
    ingest: a 2k-member near-dup cluster (over-cap buckets) + tail,
    delivered across 3 micro-batches. Pins that the stored band index
    and the combined bucket-size cap behave identically to recomputing
    the kept corpus's bands per batch when a mega-cluster floods the
    buckets."""
    import os
    import tempfile

    from etl_acordos_spark.streaming.dedup_index import (
        streaming_dedup_index_run,
    )

    base_words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(2000):
        w = list(base_words)
        w[i % 30] = f"m{i}"
        rows.append((i, " ".join(w)))
    for d in range(300):
        rows.append((20_000 + d, " ".join(f"t{d}x{j}" for j in range(30))))
    for p in range(10):
        w = [f"p{p}y{j}" for j in range(30)]
        rows.append((30_000 + 2 * p, " ".join(w)))
        w2 = list(w)
        w2[5] = f"p{p}z"
        rows.append((30_000 + 2 * p + 1, " ".join(w2)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    base = tempfile.mkdtemp(prefix="sdi_skew_")
    got = sorted(
        r[0]
        for r in streaming_dedup_index_run(
            spark, docs, "text", "doc_id", base, n_batches=3
        ).collect()
    )

    src = os.path.join(base, f"stream_dedup_index_{os.getpid()}", "src")
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(files) == 3
    corpus = None
    want: list[int] = []
    for f in files:
        batch = spark.read.parquet(os.path.join(src, f)).select(
            "doc_id", "text"
        )
        surv = incremental_minhash_dedup(
            corpus if corpus is not None else batch.limit(0),
            batch,
            "text",
            "doc_id",
        )
        want.extend(r[0] for r in surv.collect())
        kept_batch = batch.join(surv, ["doc_id"], "left_semi")
        corpus = (
            kept_batch
            if corpus is None
            else corpus.unionByName(kept_batch)
        ).localCheckpoint(eager=True)
    assert got == sorted(want)


def test_prefix_filter_candidates_sparse_on_distinct_corpus(spark):
    """The exact prefix-filter join's selectivity claim: on a
    distinct-heavy corpus its candidate volume is output-sized, not
    all-pairs-sized. 1,460 fully-distinct docs + 20 engineered
    near-dup pairs (the tail+pairs shape WITHOUT the mega-cluster —
    an exact join's output on a 10k near-dup cluster is inherently
    quadratic, which is the LSH+keep-set regime, not this operator's)
    would be ~1.1M all-pairs; the prefix candidates must stay within a
    small multiple of the 20 true pairs."""
    from etl_acordos_spark.operators.dedup import prefix_filter_pairs

    rows = []
    for d in range(TAIL):
        rows.append((20_000 + d, " ".join(f"t{d}x{j}" for j in range(30))))
    for p in range(PAIRS):
        w = [f"p{p}y{j}" for j in range(30)]
        rows.append((30_000 + 2 * p, " ".join(w)))
        w2 = list(w)
        w2[5] = f"p{p}z"
        rows.append((30_000 + 2 * p + 1, " ".join(w2)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    n = len(rows)
    all_pairs = n * (n - 1) // 2
    cand = prefix_filter_pairs(
        df, "text", "doc_id", threshold=0.8,
        use_shingles=True, shingle_n=3, candidates_only=True,
    ).count()
    assert cand <= 10 * PAIRS, (cand, all_pairs)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_pairs(
            df, "text", "doc_id", threshold=0.8,
            use_shingles=True, shingle_n=3,
        ).collect()
    }
    assert got == {
        (30_000 + 2 * p, 30_000 + 2 * p + 1) for p in range(PAIRS)
    }


def test_prefix_filter_rejects_out_of_range_threshold(spark):
    """threshold > 1 would drive the prefix length negative (ANSI
    slice() error deep in the plan); threshold <= 0 silently degrades
    the join to all-pairs — both must fail eagerly (r10 ADVICE)."""
    import pytest

    from etl_acordos_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id bigint, text string"
    )
    for bad in (1.0001, 0.0, -0.5, 2.0):
        with pytest.raises(ValueError, match="threshold"):
            prefix_filter_pairs(df, "text", "doc_id", threshold=bad)
    # the boundary value 1.0 (exact-set equality) stays legal
    assert prefix_filter_pairs(
        df, "text", "doc_id", threshold=1.0
    ).count() == 0
