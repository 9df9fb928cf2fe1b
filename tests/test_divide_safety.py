"""ANSI divide-by-zero safety sweep — VERDICT r9 item #1.

Spark 4 runs with ANSI mode on, so ``x / 0`` raises DIVIDE_BY_ZERO at
runtime. Round 9's property suite caught a real crash in funnel_steps;
this module drives every other ratio-bearing operator with the
degenerate inputs that could zero (or NULL) its denominators and pins
the intended behavior: either the denominator is structurally positive
(proved in a source comment next to the division) or the result is
NULL via try_divide / an explicit guard — never a crash.

Hypothesis is used where the degenerate region is a *family* of inputs
(random event streams with NULL-user weeks, random variant layouts);
direct fixtures where the degenerate case is a single shape (zero
vector, empty array).

The same r10 sweep audited the OTHER ANSI runtime-error classes:

- ``element_at`` / ``arr[i]`` out-of-bounds: every index is generated
  from a size-bounded ``sequence`` (shingles, positional bigrams, BPE
  pair extraction) or guarded in the same short-circuiting AND (the
  BPE fold's ``size(acc) > 0 & element_at(acc, -1)``), and the bloom
  probe index is ``p div 64 + 1`` with ``p < m`` by construction.
- cast failures: the only string→temporal parse is
  ``try_to_date`` (functions/cleaning.py); every numeric cast sits on
  a numeric expression (counts, floors), never raw strings.
- integer overflow: the multiplicative sampling hashes compute in
  DECIMAL(38,0) precisely to stay wrap-free over the int64 id range
  (functions/hashing.py); other long arithmetic is bitwise (z-order
  interleave) or count-bounded.
"""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from etl_acordos_spark.operators.dedup import (
    containment_pairs,
    jaccard_pairs,
)
from etl_acordos_spark.operators.relational import (
    active_user_stickiness,
    association_rules,
    conversion_ztest,
    period_growth,
    zscore_outliers,
)
from etl_acordos_spark.operators.simsearch import (
    cosine_pairs,
    exact_topk,
    quantize_int8,
)

_settings = settings(max_examples=10, deadline=None)


# ------------------------------------------------------------ ztest

@given(
    layout=st.lists(
        st.tuples(st.sampled_from([0, 1]), st.sampled_from([0, 1])),
        min_size=0,
        max_size=12,
    )
)
@_settings
def test_ztest_never_crashes_on_any_variant_layout(spark, layout):
    """Empty input, one-variant experiments, all-converted / none-
    converted pools: z must come back NULL (or a float), never raise.
    n_a/n_b are conditional sums of group counts — NULL when the
    variant is absent, >= 1 otherwise, so ANSI division can't hit a
    zero denominator (operators/relational.py:conversion_ztest)."""
    df = spark.createDataFrame(
        [(v, c) for v, c in layout] or [(9, 0)],
        "variant int, converted int",
    ).filter(F.col("variant") < 9 if not layout else F.lit(True))
    [row] = conversion_ztest(df, "variant", "converted").collect()
    n_a = sum(1 for v, _ in layout if v == 0) or None
    n_b = sum(1 for v, _ in layout if v == 1) or None
    assert row["n_a"] == n_a and row["n_b"] == n_b
    if n_a is None or n_b is None:
        assert row["z"] is None  # one-variant experiment: no defined z
    if row["z"] is not None:
        assert math.isfinite(row["z"])


def test_ztest_degenerate_pools_give_null_z(spark):
    """0% and 100% pooled conversion → se = 0 → NULL z (the documented
    when-guard), not a crash and not inf."""
    for conv in (0, 1):
        df = spark.createDataFrame(
            [(0, conv), (1, conv)], "variant int, converted int"
        )
        [row] = conversion_ztest(df, "variant", "converted").collect()
        assert row["z"] is None


# ------------------------------------------------- association rules

@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
        min_size=0,
        max_size=15,
    )
)
@_settings
def test_association_rules_never_crashes_even_at_min_pair_zero(
    spark, baskets
):
    """min_pair=0 removes the support prune, so every denominator must
    be structurally positive (they are: a rule row implies the pair,
    both items, and >= 1 basket all exist — relational.py comment)."""
    df = spark.createDataFrame(
        baskets or [(0, "x")], "g int, item string"
    )
    if not baskets:
        df = df.filter(F.col("g") < 0)
    rows = association_rules(df, "g", "item", min_pair=0, k=50).collect()
    for r in rows:
        assert r["support"] > 0 and r["confidence"] > 0 and r["lift"] > 0


# ------------------------------------------------ active users / growth

@given(
    events=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["u1", "u2"])),
            st.integers(0, 20),  # day offset
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_stickiness_null_user_weeks_yield_null_not_crash(spark, events):
    """A week whose events all carry NULL user ids has wau = 0
    (count_distinct skips NULLs); stickiness must be NULL via
    try_divide, never DIVIDE_BY_ZERO."""
    base = datetime.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [(u, base + datetime.timedelta(days=d)) for u, d in events],
        "user string, ts timestamp",
    )
    rows = active_user_stickiness(df, "user", "ts").collect()
    for r in rows:
        if r["wau"] == 0:
            assert r["stickiness"] is None
        else:
            assert r["stickiness"] is not None


def test_growth_zero_base_week_yields_null(spark):
    """pct_change on a zero previous total is NULL (the when-guard),
    not a crash — and the first week is NULL too (no base)."""
    base = datetime.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [
            ("s", base, 0.0),
            ("s", base + datetime.timedelta(weeks=1), 5.0),
            ("s", base + datetime.timedelta(weeks=2), 10.0),
        ],
        "series string, ts timestamp, value double",
    )
    rows = {
        r["week"].isoformat(): r["pct_change"]
        for r in period_growth(df, "series", "ts", "value").collect()
    }
    vals = [rows[k] for k in sorted(rows)]
    assert vals[0] is None  # first week: no base
    assert vals[1] is None  # zero base: no defined growth
    assert vals[2] == 1.0


def test_zscore_constant_group_is_dropped_not_crashed(spark):
    """sigma = 0 groups are filtered before the division (the
    documented guard) — scoring against a constant-valued training
    group returns no rows for it rather than dividing by zero."""
    train = spark.createDataFrame(
        [("t", 5.0)] * 4 + [("u", 1.0), ("u", 9.0)],
        "type string, value double",
    )
    score = spark.createDataFrame(
        [(1, "t", 100.0), (2, "u", 100.0)],
        "id bigint, type string, value double",
    )
    rows = zscore_outliers(
        train, score, type_col="type", value_col="value", id_cols=("id",),
        threshold=0.0,
    ).collect()
    assert {r["type"] for r in rows} == {"u"}


# ------------------------------------------------------ dedup ratios

@given(
    texts=st.lists(
        st.sampled_from(["", "a", "a b", "x y z w v u t s"]),
        min_size=2,
        max_size=6,
    )
)
@_settings
@pytest.mark.slow  # r13: >=15 s — slow tier
def test_jaccard_and_containment_survive_short_docs(spark, texts):
    """Shingle builders emit the whole text as one shingle for short
    docs, so set sizes are >= 1 and the ratio denominators are
    structurally positive — exercised at shingle_n far above the token
    counts and min_tokens=0."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    jaccard_pairs(
        df, "text", "doc_id", threshold=0.0, use_shingles=True, shingle_n=7
    ).collect()
    rows = containment_pairs(
        df, "text", "doc_id", threshold=0.0, min_tokens=0,
        use_shingles=True, shingle_n=7,
    ).collect()
    for r in rows:
        assert r["containment"] is None or r["containment"] >= 0.0


@pytest.mark.slow  # r13: >=15 s — slow tier
def test_jaccard_null_text_propagates_null_and_drops(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id bigint, text string"
    )
    rows = jaccard_pairs(df, "text", "doc_id", threshold=0.0).collect()
    # NULL text → NULL shingles → NULL jaccard → dropped by >= filter
    assert rows == []


# --------------------------------------------------- vector ratios

@pytest.mark.slow  # r13: >=15 s — slow tier
def test_cosine_zero_vector_scores_null_and_sorts_last(spark):
    """A zero embedding has no direction: cosine is NULL (try_divide),
    the row sorts after every real score, and threshold filters drop
    it — no DIVIDE_BY_ZERO anywhere in the exact paths."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = exact_topk(df, [1.0, 0.0], k=3)
    got = rows.collect()
    assert got[0]["vec_id"] == 2 and got[0]["cosine"] == 1.0
    assert got[-1]["cosine"] is None  # zero vector: undefined, last
    pairs = cosine_pairs(df, threshold=0.0).collect()
    assert all(
        {p["id_a"], p["id_b"]} != {1} and 1 not in (p["id_a"], p["id_b"])
        for p in pairs
    )


def test_quantize_int8_zero_and_empty_vectors(spark):
    """Zero vector: scale 0, all-zero codes, rmse 0 (guarded divisor).
    Empty vector: NULL rmse via try_divide, never 0/0."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["scale"] == 0.0 and rows[1]["q_l1"] == 0
    assert rows[1]["rmse"] == 0.0
    assert rows[2]["q_l1"] > 0
    empty = spark.createDataFrame(
        [(9, [1.0])], "vec_id bigint, embedding array<double>"
    ).select("vec_id", F.expr("slice(embedding, 1, 0)").alias("embedding"))
    [r] = quantize_int8(empty).collect()
    assert r["rmse"] is None and r["scale"] == 0.0


def test_rfm_fewer_customers_than_buckets_never_crashes(spark):
    """_ntile_from_rank's otherwise-branch divides by q = n div
    buckets, which is 0 when n < buckets — safe only because cutoff
    then equals n so the when-branch covers every rank (lazy CASE).
    Drive that exact region: 3 customers, 5 buckets."""
    from etl_acordos_spark.operators.relational import rfm_segments

    orders = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1), 10.0),
            (2, datetime.date(2024, 2, 1), 20.0),
            (3, datetime.date(2024, 3, 1), 30.0),
        ],
        "cust int, d date, amt double",
    )
    rows = rfm_segments(orders, "cust", "d", "amt", buckets=5).collect()
    assert len(rows) == 3
    # 3 rows over 5 buckets: ntile assigns buckets 1, 2, 3
    assert sorted(r["m"] for r in rows) == [1, 2, 3]


# ----------------------------------------------- sweep completeness

def test_no_unguarded_division_regression() -> None:
    """Tripwire for NEW raw `/ F.col(...)` divisions anywhere in the
    package whose denominator name isn't in the audited allowlist
    below. Every allowlisted denominator was audited this round (r10
    divide-by-zero sweep) as structurally positive or NULL-propagating,
    with the proof at (or near) the division site; anything new must
    join the allowlist with a proof, or use try_divide. (Divisions
    inside F.expr SQL strings were swept by hand this round — both are
    when-guarded: unit-clamp's `x / _n` and quantize's `x / sc`.)"""
    import re
    from pathlib import Path

    ops = Path(__file__).resolve().parent.parent / "etl_acordos_spark"
    pat = re.compile(r"/\s*\(*F\.col\(\s*[\"']?(\w+)[\"']?\s*\)")
    audited = {
        # association_rules: rule row implies pair/items/basket exist
        "relational.py": {
            "_n", "_ca", "_cb",
            # conversion_ztest: conditional count sums — NULL or >= 1
            "n_a", "n_b",
            # zscore_outliers: stats filtered to _sigma > 0
            "_sigma",
            # histogram quantile: per-bin count from a group agg >= 1
            "_cnt",
            # benford: amount >= 1 filter pins leading digit to 1..9
            "digit",
            # weighted sample: filter weight > 0 precedes the project
            "weight_col",
            # fixed_width_bin: division sits under when(_v1 > _v0)
            "_v1",
            # psi_drift: +0.5 Laplace smoothing keeps totals positive
            "_n_old", "_n_new",
            # gini: group count >= 1 and the _sx > 0 filter precedes
            "n_keys",
        },
        # lm/bigram/tfidf totals: sums of counts >= 1 when a row exists
        "text.py": {
            "n", "cc", "n_total",
            # mixture sampler: t_lang = sum of n_tok (split >= 1 elem)
            "t_lang",
            # bm25: avgdl = avg of doc lengths >= 1
            "avgdl",
            # span dedup: shingle builders emit >= 1 span per doc
            "n_spans",
            # pmi: c_a/c_b/_nb/_nt all count aggregates >= 1 (the
            # denominator is a product of positive ratios)
            "_nb", "_nt", "c_a",
            # tfidf: denominator is doc_freq + 1 >= 1
            "doc_freq",
        },
        # pagerank: _deg = out-degree group count >= 1
        "graph.py": {"_deg"},
        # bitext margin: top-k group counts over cosine>0 pairs >= 1
        "simsearch.py": {"_ca", "_cb"},
        "dedup.py": set(),
        "multimodal.py": set(),
        "cluster.py": set(),
        # salted_agg mean: n = sum of per-salt counts >= 1 per group
        "extensibility.py": {"n"},
    }
    offenders = []
    for f in sorted(ops.rglob("*.py")):
        allow = audited.get(f.name, set())
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if "try_divide" in line:
                continue
            for m in pat.finditer(line):
                if m.group(1) not in allow:
                    offenders.append(f"{f.name}:{i}: /{m.group(0)}")
    assert not offenders, (
        "unaudited data-dependent divisions (add a structural-"
        "positivity proof + allowlist entry, or use try_divide): "
        f"{offenders}"
    )
