"""Oracle-differential tests: every declared query with an oracle must
hash-match DuckDB at sf=0.01 — the same check the driver runs (t2)."""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.oracle_utils import assert_matches_oracle


def _keys():
    return sorted(contract.queries().keys())


@pytest.mark.parametrize("key", _keys())
def test_query_matches_oracle(spark, sf_oracle, key):
    qfn = contract.queries()[key]
    oracle = contract.oracle_sql().get(key)
    df = qfn(spark, sf_oracle)
    if oracle is None:
        # rows-only check: must build and run with a stable schema AND
        # produce rows — the driver treats an empty rows-only result as
        # a failure, and driver_green_keys now requires spark_rows > 0
        assert df.columns, f"{key}: no columns"
        assert df.count() > 0, f"{key}: rows-only query returned 0 rows"
        return
    assert_matches_oracle(df, oracle, sf_oracle)


def test_dtype_guard_catches_uncast_hugeint_sum(spark, sf_oracle):
    """The r3 failure class: DuckDB sum(INTEGER) → HUGEINT → pandas
    float64 vs Spark bigint hashes differently despite equal values.
    The parity harness must reject a bare sum(int) final projection."""
    df = spark.range(3).selectExpr("CAST(sum(id) AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_matches_oracle(
            df, "SELECT sum(x) AS s FROM (VALUES (0), (1), (2)) v(x)", sf_oracle
        )
    # and the cast form passes
    assert_matches_oracle(
        df,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (0), (1), (2)) v(x)",
        sf_oracle,
    )


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


def test_ext_approx_estimates_within_documented_error(spark, sf_oracle):
    """`ext_approx` stays rows-only (Datasketches/percentile_approx
    internals aren't SQL-replayable), so harden it the r8-verdict way:
    cross-check every estimate against the exact value on the same
    data. HLL++ with the default rsd=0.05 must land within 3 sigma
    (15%) of exact distinct counts; percentile_approx with the default
    accuracy=10000 guarantees rank error <= n/accuracy, checked with a
    10x slack (1e-3 rank fraction). The same capabilities are
    hash-verified end-to-end by the closed-form twins (ext_hll_md5,
    ext_quantile_sketch); this pins THIS key's sketches to ground
    truth."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.queries.base import t

    got = contract.queries()["ext_approx"](spark, sf_oracle).head()
    li = t(spark, sf_oracle, "lineitem")
    n, exact_orders, exact_parts = li.agg(
        F.count("*"),
        F.countDistinct("l_orderkey"),
        F.countDistinct("l_partkey"),
    ).head()
    assert abs(got["approx_orders"] - exact_orders) <= 0.15 * exact_orders, (
        got["approx_orders"],
        exact_orders,
    )
    assert abs(got["approx_parts"] - exact_parts) <= 0.15 * exact_parts, (
        got["approx_parts"],
        exact_parts,
    )
    for col, quantile in (
        ("p50_price", 0.5),
        ("p95_price", 0.95),
        ("p99_price", 0.99),
    ):
        rank = li.filter(F.col("l_extendedprice") <= got[col]).count()
        assert abs(rank / n - quantile) <= 1e-3, (col, rank / n, quantile)
