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
        # rows-only check: must build and run with a stable schema
        assert df.columns, f"{key}: no columns"
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracle, sf_oracle)


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns
