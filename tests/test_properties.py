"""Property-based tests (hypothesis) for the scalar cleaning functions —
the semantic edges SURVEY.md §2.3 calls out, checked against the pandas
behaviors they re-express, over generated inputs rather than the few
hand-picked fixtures.

One Spark job per property (a single DataFrame carrying all generated
rows), not one per example — hypothesis drives the data generation,
Spark evaluates in one pass.
"""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import given, settings, strategies as st

from etl_acordos_spark.functions.cleaning import (
    concat_sep,
    fill_default,
    left_n,
    parse_date_ddmmyyyy,
    sentinel_to_default,
    trim_ws,
)

# r13: this file is the property/hypothesis tier — excluded from the default run
# (pytest.ini addopts); run with -m "" or -m slow.
pytestmark = pytest.mark.slow

# evaluate many examples in ONE spark pass: collect strategies' examples
# into lists via hypothesis, then run a single job per test invocation
_text = st.one_of(st.none(), st.text(max_size=40))
_settings = settings(max_examples=20, deadline=None)


def _eval(spark, values, colfn, out_type="string"):
    df = spark.createDataFrame(
        [(v,) for v in values], schema="v string"
    ).select(colfn("v").cast(out_type).alias("r"))
    return [r["r"] for r in df.collect()]


@given(vals=st.lists(_text, min_size=1, max_size=30))
@_settings
def test_fill_default_never_null(spark, vals):
    got = _eval(spark, vals, fill_default)
    assert all(g is not None for g in got)
    for v, g in zip(vals, got):
        assert g == ("não informado" if v is None else v)


@given(vals=st.lists(_text, min_size=1, max_size=30))
@_settings
def test_sentinel_replace_exact_only(spark, vals):
    got = _eval(spark, vals, sentinel_to_default)
    for v, g in zip(vals, got):
        if v == "-":
            assert g == "não informado"
        else:
            assert g == v  # NULL passes through — sentinel ≠ NULL


@given(vals=st.lists(st.text(max_size=300), min_size=1, max_size=30))
@_settings
def test_left_n_truncates_like_pandas_slice(spark, vals):
    got = _eval(spark, vals, lambda c: left_n(c, 255))
    want = [v[:255] for v in vals]
    assert got == want


@given(vals=st.lists(st.text(alphabet=" \t\r\naZ9é-", max_size=20), min_size=1, max_size=30))
@_settings
def test_trim_matches_pandas_strip(spark, vals):
    got = _eval(spark, vals, trim_ws)
    # Spark trim removes ASCII space only; pandas str.strip removes all
    # whitespace — restrict comparison to the space/tab/newline alphabet
    # where both agree on spaces, and assert Spark's contract directly
    for v, g in zip(vals, got):
        assert g == v.strip(" ")


@given(
    days=st.integers(1, 31),
    months=st.integers(1, 13),
    years=st.integers(1990, 2030),
)
@_settings
def test_date_parse_coerces_like_pandas(spark, days, months, years):
    s = f"{days:02d}/{months:02d}/{years:04d}"
    got = _eval(spark, [s], parse_date_ddmmyyyy, out_type="date")[0]
    want = pd.to_datetime(s, format="%d/%m/%Y", errors="coerce")
    if pd.isna(want):
        assert got is None
    else:
        assert got == want.date()


@given(a=_text, b=_text)
@_settings
def test_concat_null_propagates_like_pandas_plus(spark, a, b):
    df = spark.createDataFrame([(a, b)], schema="a string, b string")
    got = df.select(concat_sep(["a", "b"], " > ").alias("r")).collect()[0]["r"]
    # pandas `+` yields NaN if either operand is NaN
    want = None if a is None or b is None else f"{a} > {b}"
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_value_is_invertible(spark, pairs):
    """The Morton code must be a bijection on 16-bit pairs: de-
    interleaving the Spark-computed z-value recovers both inputs
    exactly (so z-range file pruning can never conflate distinct
    (a, b) rectangles)."""
    from etl_acordos_spark.operators.layout import zorder_value

    df = spark.createDataFrame(pairs, "a long, b long").withColumn(
        "z", zorder_value("a", "b", bits=16)
    )

    def deinterleave(z: int) -> tuple[int, int]:
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in df.collect():
        assert deinterleave(r.z) == (r.a, r.b), r


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)),
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)),
        max_size=40,
    ),
)
@settings(max_examples=20, deadline=None)
def test_snapshot_diff_reconstructs_new_snapshot(spark, old_rows, new_rows):
    """Applying the CDC delta to the old snapshot must reproduce the new
    snapshot exactly: drop deleted/updated keys, add updated/inserted
    rows — for ANY pair of snapshots (keys deduped to latest value)."""
    from etl_acordos_spark.operators.relational import snapshot_diff

    old_map = dict(old_rows)  # dedupe keys like a real snapshot
    new_map = dict(new_rows)
    schema = "k long, v long"
    old = spark.createDataFrame(list(old_map.items()) or [], schema)
    new = spark.createDataFrame(list(new_map.items()) or [], schema)

    delta = snapshot_diff(old, new, "k", ["v"]).collect()

    rebuilt = dict(old_map)
    for r in delta:
        if r.change == "delete":
            assert rebuilt.pop(r.k) == r.old_v
        else:  # insert or update both carry the new value
            if r.change == "update":
                assert rebuilt[r.k] == r.old_v
            else:
                assert r.k not in rebuilt
            rebuilt[r.k] = r.new_v
    assert rebuilt == new_map


# ------------------------- sampling-hash cross-engine parity


@given(
    ids=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=(1 << 63) - 1),
            # the wrap-hazard band the DECIMAL(38,0) widening exists for
            st.integers(min_value=3_000_000_000, max_value=4_000_000_000),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=15, deadline=None)
def test_unit_hash_matches_duckdb_for_full_int64_range(spark, ids):
    """The sampling acceptance hash must be bit-identical between the
    Spark engine and the DuckDB oracle across the WHOLE non-negative
    int64 id range — including ids past ~3.47e9 where a naive int64
    multiply silently wraps in Spark but not in the oracle."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_acordos_spark.functions.hashing import sql_unit_hash, unit_hash

    got = [
        r["h"]
        for r in spark.createDataFrame([(i,) for i in ids], "id long")
        .select(unit_hash(F.col("id")).alias("h"))
        .collect()
    ]
    want = [
        r[0]
        for i in ids
        for r in [
            duckdb.sql(f"SELECT {sql_unit_hash(str(i))}").fetchone()
        ]
    ]
    assert got == want


# ------------------------- passage-dedup invariants


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta".split()),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_passage_dedup_exactly_once_and_order_preserving(spark, docs):
    """Over random tiny-vocabulary corpora (engineered for passage
    collisions): every distinct input passage appears exactly once
    across the output, and each surviving doc's text is the in-order
    concatenation of a subset of its own passages."""
    from collections import Counter

    from etl_acordos_spark.operators.text import passage_dedup

    n = 5  # small passages -> plenty of collisions
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    out = {
        r["doc_id"]: r["text"]
        for r in passage_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "text",
            "doc_id",
            words_per_passage=n,
        ).collect()
    }

    def passages(text):
        w = text.split(" ")
        return [
            " ".join(w[i : i + n]) for i in range(0, len(w), n)
        ]

    distinct_input = {p for _, t in rows for p in passages(t)}
    out_counts = Counter(p for t in out.values() for p in passages(t))
    # exactly-once: no passage survives twice, none is lost
    assert set(out_counts) == distinct_input
    assert all(c == 1 for c in out_counts.values()), out_counts
    # order: surviving passages stay in original in-doc order
    for doc_id, text in out.items():
        orig = passages(rows[doc_id][1])
        kept = passages(text)
        it = iter(orig)
        assert all(p in it for p in kept), (doc_id, kept, orig)


# ------------------------- stdlib PNG codec round-trip


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.sampled_from([0, 1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_all_filters_and_channels(h, w, ch, filter_type, seed):
    """decode(encode(img)) == img for every color type and every
    scanline filter — the decoder's filter arms are exercised against
    our own encoder's output."""
    import numpy as np

    from etl_acordos_spark.functions.png import decode_png, encode_png

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, ch), dtype=np.uint8
    )
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**62),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    n_shards=st.integers(min_value=1, max_value=9),
)
@_settings
def test_shuffle_shard_is_a_partition_of_the_input(spark, ids, n_shards):
    """For arbitrary non-negative id sets: every row gets exactly one
    (shard, pos); shards are in range; pos is a dense 1..n sequence
    within each shard; and the assignment is a pure function of the id
    (rerun-identical)."""
    from etl_acordos_spark.operators.layout import shuffle_shard

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shuffle_shard(df, "doc_id", n_shards=n_shards).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(ids)
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = shuffle_shard(df, "doc_id", n_shards=n_shards).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in rows}


@given(
    vals=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", None]),
        min_size=5,
        max_size=60,
    ),
    support=st.sampled_from([0.1, 0.25, 0.4]),
)
@_settings
def test_heavy_hitters_equals_exact_group_by(spark, vals, support):
    """For arbitrary small multisets (with NULLs) and tight sketch
    capacity, heavy_hitters equals the exact non-NULL GROUP BY ...
    HAVING answer."""
    from etl_acordos_spark.operators.relational import heavy_hitters

    df = spark.createDataFrame(
        [(v,) for v in vals], "word string"
    ).repartition(3)
    got = {
        (r["word"], r["n"])
        for r in heavy_hitters(df, "word", support=support, safety=1).collect()
    }
    non_null = [v for v in vals if v is not None]
    n = len(non_null)
    exact = {
        (v, non_null.count(v))
        for v in set(non_null)
        if non_null.count(v) > n * support
    }
    assert got == exact


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=25,
    ),
    scale=st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
)
@settings(max_examples=10, deadline=None)
def test_gini_scale_invariant_and_bounded(spark, vals, scale):
    """Gini is invariant to uniform scaling of the values and bounded
    in [0, (n-1)/n] — over generated positive distributions."""
    from etl_acordos_spark.operators.relational import gini_by_group

    n = len(vals)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    rows += [("h", i, float(v) * scale) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["grp", "key", "val"])
    got = {
        r["grp"]: r["gini"]
        for r in gini_by_group(df, "grp", "key", "val").collect()
    }
    # scaling every value by c > 0 multiplies both numerator terms and
    # the denominator by c — identical up to the 1e-4 output grid
    assert abs(got["g"] - got["h"]) <= 1e-4 + 1e-9
    assert -1e-9 <= got["g"] <= (n - 1) / n + 1e-4


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ).map(lambda p: (min(p), max(p))).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None)
def test_pagerank_is_a_distribution(spark, edges):
    """PageRank over any generated undirected graph sums to ~1 (within
    the per-iteration 1e-9 grid) and every rank is positive."""
    from etl_acordos_spark.operators.graph import pagerank

    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    rows = pagerank(df, iterations=4, k=100).collect()
    ranks = [r["rank"] for r in rows]
    assert all(r > 0 for r in ranks)
    assert abs(sum(ranks) - 1.0) < 1e-5


@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_skyline_sweep_equals_brute_force(spark, points):
    """The window-sweep 2-D skyline equals the all-pairs domination
    scan over arbitrary (max, min) point sets — duplicates, full ties,
    and collinear runs included."""
    from etl_acordos_spark.operators.relational import skyline_2d

    rows = [(i, a, float(b)) for i, (a, b) in enumerate(points)]
    df = spark.createDataFrame(rows, ["pid", "up", "down"])
    got = {r.pid for r in skyline_2d(df, "up", "down").collect()}
    brute = {
        p[0]
        for p in rows
        if not any(
            q[1] >= p[1]
            and q[2] <= p[2]
            and (q[1] > p[1] or q[2] < p[2])
            for q in rows
        )
    }
    assert got == brute


@given(
    urls=st.lists(
        st.from_regex(
            r"https?://[A-Za-z]{1,6}(\.[A-Za-z]{2,4}){1,2}"
            r"(/[A-Za-z0-9]{0,5}){0,3}/?"
            r"(\?(utm_[a-z]{1,4}|ref|page|q)=[A-Za-z0-9]{0,4}"
            r"(&(utm_[a-z]{1,4}|ref|page|q)=[A-Za-z0-9]{0,4}){0,3})?"
            r"(#[A-Za-z0-9]{0,6})?",
            fullmatch=True,
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None)
def test_canonical_url_is_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): canonicalization must
    be a projection — a second pass can't find more decoration to
    strip (lowercase host stays lowered, kept params stay sorted,
    slash stays stripped)."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.operators.dedup import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    once = df.select(canonical_url(F.col("u")).alias("c1"))
    twice = once.select(
        "c1", canonical_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c1 == r.c2, r


@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=64), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=64, max_value=256),
)
@settings(max_examples=12, deadline=None)
def test_pack_best_fit_never_overfills_and_conserves(spark, toks, budget):
    """BFD invariants under arbitrary chunk lengths ≤ budget: no pack
    exceeds the budget, every chunk lands exactly once, pack ids are
    contiguous per shard."""
    from etl_acordos_spark.operators.text import pack_best_fit

    rows = [(i, 0, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_id", "n_tok"])
    packs = pack_best_fit(
        df, "doc_id", "chunk_id", "n_tok", budget=budget, shards=4
    ).collect()
    assert all(p.n_tokens <= budget for p in packs)
    assert sum(p.n_chunks for p in packs) == len(toks)
    assert sum(p.n_tokens for p in packs) == sum(toks)
    by_shard: dict[int, list] = {}
    for p in packs:
        by_shard.setdefault(p.shard, []).append(p.pack_id)
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=12), min_size=5, max_size=80
    )
)
@settings(max_examples=10, deadline=None)
def test_cms_one_sided_and_matches_python_sketch(spark, vals):
    """Count-min over arbitrary small-alphabet streams: estimates are
    NEVER below exact counts and equal a pure-Python replay of the
    same salted-md5 bucket scheme — collisions included (width 16
    forces them)."""
    import hashlib
    from collections import Counter

    from etl_acordos_spark.operators.relational import cms_accuracy

    tokens = [f"t{v}" for v in vals]
    df = spark.createDataFrame([(t,) for t in tokens], ["tok"])
    got = {
        r.v: (r.n_exact, r.n_cms)
        for r in cms_accuracy(
            df, "tok", depth=2, width_hex=1, k=20
        ).collect()
    }
    cells: Counter = Counter()
    for t in tokens:
        for s in (1, 2):
            cells[(s, hashlib.md5(f"{s}:{t}".encode()).hexdigest()[:1])] += 1
    exact = Counter(tokens)
    for v, (n_exact, n_cms) in got.items():
        assert n_exact == exact[v]
        assert n_cms >= n_exact
        assert n_cms == min(
            cells[(s, hashlib.md5(f"{s}:{v}".encode()).hexdigest()[:1])]
            for s in (1, 2)
        )


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ),
            min_size=4,
            max_size=16,
        ).map(tuple),
        min_size=1,
        max_size=8,
    ).filter(lambda vs: len({len(v) for v in vs}) == 1),
)
@_settings
def test_unit_clamped_np_bitwise_equals_hof_property(spark, vecs):
    """Property form of the quantized-ANN normalization seam: for ANY
    finite vectors (including zero vectors and magnitudes far outside
    the clamp), the strict left-to-right numpy fold must be BIT-equal
    to the Catalyst HOF form the DuckDB oracles replay — a single-ulp
    drift here can flip a quantized grid cell."""
    import numpy as np

    from etl_acordos_spark.operators.simsearch import (
        unit_clamped,
        unit_clamped_np,
    )

    df = spark.createDataFrame(
        [(i, list(v)) for i, v in enumerate(vecs)],
        "id bigint, v array<double>",
    )
    hof = {
        r["id"]: list(r["u"])
        for r in unit_clamped(df).select("id", "u").collect()
    }
    got = unit_clamped_np(np.asarray(vecs, dtype=np.float64))
    for i in range(len(vecs)):
        assert list(got[i]) == hof[i], (i, vecs[i])


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-5, 5)),
        min_size=0,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),  # dup right ts per key would
        # make "latest" ambiguous — see asof_join's tie note
    ),
)
@_settings
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join (union + carry-forward window) vs the definition: for
    each left row, the right row with the MAX right.ts <= left.ts for
    the same key, or NULL when no right row qualifies — including the
    tie case right.ts == left.ts (eligible, DuckDB/Pandas `>=`
    semantics), keys absent from one side, and empty right."""
    from etl_acordos_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid int, k int, ts long",
    )
    rdf = spark.createDataFrame(
        right, "k int, ts long, val int"
    ) if right else spark.createDataFrame([], "k int, ts long, val int")
    rows = asof_join(ldf, rdf, "k", "ts", "ts", ["val"]).collect()
    # exactly one output row per left row — a fan-out regression would
    # survive the dict comparison below
    assert len(rows) == len(left)
    got = {r["lid"]: r["asof_val"] for r in rows}
    assert set(got) == set(range(len(left)))
    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, cands, got[i])


@given(
    vals=st.lists(
        st.floats(-100, 100, width=32),
        min_size=1,
        max_size=25,
    ),
    ranges=st.lists(
        st.tuples(
            st.floats(-100, 100, width=32),
            st.floats(0.015625, 60, width=32),
        ),
        min_size=1,
        max_size=8,
    ),
    bin_width=st.sampled_from([1.0, 7.5, 50.0]),
)
@_settings
def test_range_join_binned_matches_inequality_join(spark, vals, ranges, bin_width):
    """range_join_binned (bin-explode + equi-join + exact refine) must
    produce EXACTLY the half-open inequality-join pairs lo <= v < hi —
    for overlapping ranges (multiple matches per value), boundary hits
    on lo (in) and hi (out), negative values (floor-toward--inf
    binning), and bin widths from finer than a range to coarser than
    the whole domain."""
    from etl_acordos_spark.operators.relational import range_join_binned

    tiers = [(lo, lo + w, f"t{j}") for j, (lo, w) in enumerate(ranges)]
    fact = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "fid int, v double"
    )
    rdf = spark.createDataFrame(tiers, "lo double, hi double, tier string")
    rows = (
        range_join_binned(fact, "v", rdf, "lo", "hi", bin_width)
        .select("fid", "tier")
        .collect()
    )
    got = {(r["fid"], r["tier"]) for r in rows}
    want = {
        (i, name)
        for i, v in enumerate(vals)
        for lo, hi, name in tiers
        if lo <= v < hi
    }
    assert got == want
    # each (value, tier) pair must appear exactly once — a range
    # spanning many bins duplicating its matches would survive the
    # set comparison above
    assert len(rows) == len(want)


@given(
    existing=st.dictionaries(
        st.integers(0, 8),
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 99)),
        max_size=9,
    ),
    updates=st.dictionaries(
        st.integers(0, 8),
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 99)),
        max_size=9,
    ),
)
@_settings
def test_merge_upsert_keeps_exactly_the_latest_row_per_key(
    spark, existing, updates
):
    """merge_upsert (union + version-desc window) vs the MERGE
    definition: per key the surviving row is the updates row iff its
    version is >= the existing version (ties break toward updates),
    else the existing row; keys present on one side only pass through;
    NULL versions order last (lose to any non-NULL). One row per key,
    always — snapshot semantics."""
    from etl_acordos_spark.operators.relational import merge_upsert

    edf = spark.createDataFrame(
        [(k, v, p) for k, (v, p) in existing.items()],
        "k int, version int, payload int",
    )
    udf_ = spark.createDataFrame(
        [(k, v, p) for k, (v, p) in updates.items()],
        "k int, version int, payload int",
    )
    rows = merge_upsert(edf, udf_, "k", "version").collect()
    got = {r["k"]: (r["version"], r["payload"]) for r in rows}
    assert len(rows) == len(got), "more than one survivor for a key"

    def rank(v):  # NULL version orders last under version DESC
        return -float("inf") if v is None else v

    want = {}
    for k in set(existing) | set(updates):
        if k not in updates:
            want[k] = existing[k]
        elif k not in existing:
            want[k] = updates[k]
        else:
            ev, uv = existing[k][0], updates[k][0]
            want[k] = updates[k] if rank(uv) >= rank(ev) else existing[k]
    assert got == want


@given(
    data=st.dictionaries(
        st.integers(0, 2),  # key
        st.dictionaries(  # version -> attr (unique versions per key)
            st.integers(0, 9),
            st.one_of(st.none(), st.integers(0, 2)),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
@_settings
def test_scd2_history_matches_run_length_bruteforce(spark, data):
    """scd2_history vs the SCD-2 definition: per key, sort snapshots by
    version, collapse consecutive runs of the (null-safe) same attr
    value into one interval; valid_from = the run's first version,
    valid_to = the next run's valid_from (NULL + is_current on the
    last). Covers NULL attrs, re-appearing values (a->b->a must yield
    THREE intervals, not two) and single-snapshot keys."""
    from etl_acordos_spark.operators.relational import scd2_history

    rows = [
        (k, v, a) for k, vers in data.items() for v, a in vers.items()
    ]
    df = spark.createDataFrame(rows, "k int, version int, a int")
    srt = lambda rows: sorted(rows, key=lambda t: tuple(map(repr, t)))
    got = srt(
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, "k", "version", ["a"]).collect()
    )
    want = []
    for k, vers in data.items():
        runs = []
        for v in sorted(vers):
            if runs and runs[-1][0] == vers[v]:
                runs[-1][1].append(v)
            else:
                runs.append((vers[v], [v]))
        for i, (a, vs) in enumerate(runs):
            nxt = runs[i + 1][1][0] if i + 1 < len(runs) else None
            want.append((k, a, vs[0], nxt, nxt is None))
    assert got == srt(want)


@given(
    fact=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.integers(0, 99)),
        max_size=30,
    ),
    dim=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.integers(0, 9)),
        max_size=10,
    ),
    buckets=st.sampled_from([1, 3, 8]),
)
@_settings
def test_salted_join_equals_plain_join(spark, fact, dim, buckets):
    """salted_join's contract line — 'Result equals the plain join
    exactly' — over random fact/dim multisets: duplicate keys on both
    sides (multiplicative fan-out), NULL keys (dropped by equi-join
    semantics in both forms), dim keys with no fact rows, and bucket
    counts from degenerate (1) to wider than the key space."""
    from collections import Counter

    from etl_acordos_spark.operators.relational import salted_join

    fdf = spark.createDataFrame(fact or [(None, 0)], "k int, fv int")
    ddf = spark.createDataFrame(dim or [(None, 0)], "k int, dv int")
    got = Counter(
        (r["k"], r["fv"], r["dv"])
        for r in salted_join(fdf, ddf, "k", salt_buckets=buckets).collect()
    )
    want = Counter(
        (r["k"], r["fv"], r["dv"])
        for r in fdf.join(ddf, "k").collect()
    )
    assert got == want


@given(
    users=st.dictionaries(
        st.integers(0, 2),  # user_id
        st.lists(st.integers(0, 7200), min_size=1, max_size=12),  # secs
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=10, deadline=None)
def test_sessionize_gaps_and_islands_matches_bruteforce(
    spark, users, tmp_path_factory
):
    """q_ext_sessionize_batch's gaps-and-islands logic vs a sequential
    scan: per user, sorted events split into sessions at gaps >= 30
    minutes; each session reports (start, n_events, sum_value). Random
    offsets cover duplicate timestamps (gap 0 — same session), exact
    30-minute boundaries (NEW session: the rule is >=), and single-event
    users."""
    import datetime as dt

    from etl_acordos_spark.queries.relational import q_ext_sessionize_batch

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, offs in users.items():
        for o in offs:
            rows.append(
                (eid, u, base + dt.timedelta(seconds=o), "click", float(o % 7))
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double",
    )
    out_dir = str(tmp_path_factory.mktemp("sess"))
    df.write.mode("overwrite").parquet(out_dir + "/events.parquet")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in q_ext_sessionize_batch(spark, out_dir).collect()
    )
    want = []
    for u, offs in users.items():
        sess = []
        for o in sorted(offs):
            if sess and (o - sess[-1][-1]) < 1800:
                sess[-1].append(o)
            else:
                sess.append([o])
        for s in sess:
            want.append(
                (
                    u,
                    base + dt.timedelta(seconds=s[0]),
                    len(s),
                    round(sum(float(o % 7) for o in s), 4),
                )
            )
    assert got == sorted(want)


@given(
    series=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(
            st.tuples(st.integers(0, 96), st.integers(-9, 9)),  # (hour-offset, value)
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=2,
    )
)
@settings(max_examples=10, deadline=None)
def test_gap_fill_hours_matches_sequential_forward_fill(spark, series):
    """gap_fill_hours vs the definition: one row per (series, hour)
    across the series' observed span, hourly sums where observed,
    forward-filled values in the gaps, was_gap marking synthetic rows.
    Random offsets cover multiple observations in one hour (summed),
    spans with every hour observed (no gaps), and single-hour series."""
    import datetime as dt

    from etl_acordos_spark.operators.relational import gap_fill_hours

    base = dt.datetime(2024, 3, 1)
    rows = [
        (s, base + dt.timedelta(hours=h, minutes=int(v) % 60), float(v))
        for s, obs in series.items()
        for h, v in obs
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    )
    got = sorted(
        (r["series"], r["hour"], r["v_filled"], r["was_gap"])
        for r in gap_fill_hours(df, "event_type", "ts", "value").collect()
    )
    want = []
    for s, obs in series.items():
        sums = {}
        for h, v in obs:
            sums[h] = round(sums.get(h, 0.0) + float(v), 4)
        lo, hi = min(sums), max(sums)
        last = None
        for h in range(lo, hi + 1):
            if h in sums:
                last = sums[h]
                want.append((s, base + dt.timedelta(hours=h), last, 0))
            else:
                want.append((s, base + dt.timedelta(hours=h), last, 1))
    assert got == sorted(want)


@given(
    users=st.dictionaries(
        st.integers(0, 3),
        st.lists(
            st.tuples(
                st.integers(0, 40),  # ts offset
                st.sampled_from(["view", "click", "purchase", "other"]),
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=10, deadline=None)
def test_funnel_steps_matches_greedy_min_chain(spark, users):
    """funnel_steps vs the funnel definition computed sequentially per
    user: t_i = min ts of step-i events STRICTLY after t_{i-1} (greedy
    earliest — optimal for strictly-ordered funnels). Random streams
    cover same-timestamp step events (strictness: ts > t_prev, so a
    click AT the view time does not convert), step events with no
    prior step, non-step noise, and users dropping at every depth."""
    import datetime as dt

    from etl_acordos_spark.operators.relational import funnel_steps

    base = dt.datetime(2024, 6, 1)
    rows = [
        (u, base + dt.timedelta(minutes=o), t)
        for u, evs in users.items()
        for o, t in evs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    steps = ["view", "click", "purchase"]
    got = {
        r["step_idx"]: (r["step"], r["n_users"], r["pct_of_prev"])
        for r in funnel_steps(df, "user_id", "ts", "event_type", steps).collect()
    }
    counts = []
    for i, step in enumerate(steps):
        n = 0
        for evs in users.values():
            t_prev = None
            ok = True
            for j in range(i + 1):
                cands = [
                    o
                    for o, t in evs
                    if t == steps[j] and (t_prev is None or o > t_prev)
                ]
                if not cands:
                    ok = False
                    break
                t_prev = min(cands)
            n += ok
        counts.append(n)
    for i, step in enumerate(steps):
        want_pct = (
            None if i == 0 else round(counts[i] / counts[i - 1], 4)
            if counts[i - 1]
            else None
        )
        assert got[i + 1] == (step, counts[i], want_pct), (i, got, counts)


@given(
    edge_bits=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_triangle_counts_match_bruteforce(spark, edge_bits):
    """triangle_counts (degree-orientation wedge join) vs brute-force
    triangle enumeration over random small graphs — per-vertex
    participation must match exactly, including multi-edges collapsing
    (input is distinct src<dst) and vertices in no triangle being
    absent. Randomization covers what the planted-graph fixture can't:
    degree ties (the orientation tie-break), isolated edges, and
    near-cliques."""
    from itertools import combinations

    from etl_acordos_spark.operators.graph import triangle_counts

    edges = {(min(a, b), max(a, b)) for a, b in edge_bits if a != b}
    if not edges:
        return
    df = spark.createDataFrame(
        sorted(edges), "src long, dst long"
    )
    got = {
        r["vertex"]: r["n_triangles"]
        for r in triangle_counts(df, k=100).collect()
    }
    verts = sorted({v for e in edges for v in e})
    want: dict[int, int] = {}
    for a, b, c in combinations(verts, 3):
        if (
            (a, b) in edges and (a, c) in edges and (b, c) in edges
        ):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


@given(
    parents=st.lists(st.integers(0, 40), min_size=1, max_size=40),
)
@settings(max_examples=15, deadline=None)
def test_hierarchy_flatten_matches_sequential_resolver(spark, parents):
    """hierarchy_flatten (pointer doubling to fixpoint) vs a sequential
    per-node walk over random forests: node i's parent is
    parents[i] % i (a root when the draw lands on itself via i=0's
    forced None) — always acyclic, arbitrary depth/branching. Root and
    exact depth must match for every node."""
    from etl_acordos_spark.operators.graph import hierarchy_flatten

    rows = [(0, None)] + [
        (i, parents[i] % i if parents[i] % (i + 1) != i else None)
        for i in range(1, len(parents))
    ]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(df).collect()
    }
    parent_of = {n: p for n, p in rows}
    want = {}
    for n in parent_of:
        depth, cur = 0, n
        while parent_of[cur] is not None:
            cur = parent_of[cur]
            depth += 1
        want[n] = (cur, depth)
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=8
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 0.95, 1.0]),
)
@settings(max_examples=12, deadline=None)
def test_prefix_filter_pairs_equals_bruteforce_jaccard(
    spark, docs, threshold
):
    """prefix_filter_pairs (AllPairs/PPJoin prefix filtering) must be
    EXACT: identical pair set and jaccard values to the all-pairs
    baseline at every threshold, over random tiny-vocab docs (heavy
    ties in the frequency order — the tie-break region the fixture
    corpus can't stress), empty docs, duplicate docs, and threshold 1.0
    (prefix length collapses to 1)."""
    from etl_acordos_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    brute = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs(
            df, "text", "doc_id", threshold=threshold
        ).collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in prefix_filter_pairs(
            df, "text", "doc_id", threshold=threshold
        ).collect()
    }
    assert fast == brute
