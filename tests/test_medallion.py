"""End-to-end medallion test on the acordos-shaped fixture (FIXTURES.md
§A), asserting layer contents including the documented divergences from
the reference: continente fillna applied (silver.py:37 discard bug),
título truncation live (bronze.py:59 dead guard), null-propagating gold
concats."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_acordos_spark.plans.medallion import (
    ACORDOS_CONFIG,
    acordos_gold_outputs,
    bronze_transform,
    silver_transform,
)
from etl_acordos_spark.sources.records import EmptySourceError, records_to_df

RAW_HEADERS = [
    "Data de Celebração", "Parceiro", "Tipo de Parceiro", "Continente",
    "Região", "Local de Assinatura", "Tipo de Acordo", "Título",
    "Objetivo", "Recursos", "Tipo de Documento", "Vigência", "Link",
]


def _fixture_records():
    base = {
        "Data de Celebração": "15/03/2019", "Parceiro": "  frança ",
        "Tipo de Parceiro": "País", "Continente": "europa",
        "Região": "europa ocidental", "Local de Assinatura": "paris",
        "Tipo de Acordo": "memorando", "Título": "t" * 300,
        "Objetivo": "cooperação", "Recursos": "petróleo",
        "Tipo de Documento": "acordo", "Vigência": "15/03/2029",
        "Link": "http://x",
    }
    dirty = dict(base, **{
        "Data de Celebração": "31/02/2020",   # invalid → null date → null ano
        "Continente": None,                    # exercises the fixed fillna bug
        "Região": "-",                         # sentinel
        "Local de Assinatura": None,           # null-propagating concat
        "Tipo de Parceiro": "Organização",
        "Parceiro": "onu",
    })
    dup = dict(base)  # exact duplicate of base → dropped at silver
    return [base, dirty, dup]


def _run_layers(spark):
    raw = records_to_df(spark, _fixture_records(), expected_headers=RAW_HEADERS)
    bronze = bronze_transform(raw, ACORDOS_CONFIG)
    silver = silver_transform(bronze, ACORDOS_CONFIG)
    return bronze, silver


def test_bronze_types_and_truncation(spark):
    bronze, _ = _run_layers(spark)
    assert dict(bronze.dtypes)["data_de_celebração"] == "date"
    rows = bronze.collect()
    assert all(len(r["título"]) <= 255 for r in rows)  # left255 LIVE
    bad = [r for r in rows if r["parceiro"] == "onu"][0]
    assert bad["data_de_celebração"] is None  # coerce, not error


def test_silver_clean_dedup_and_bugfix(spark):
    _, silver = _run_layers(spark)
    rows = silver.collect()
    assert len(rows) == 2  # exact duplicate dropped
    org = [r for r in rows if r["tipo_de_parceiro"] == "Organização"][0]
    assert org["continente"] == "Não Informado"   # fixed discard bug + titlecase
    assert org["região"] == "Não Informado"       # sentinel path
    assert org["ano"] is None                      # from coerced date
    pais = [r for r in rows if r["tipo_de_parceiro"] == "País"][0]
    assert pais["parceiro"] == "França"            # trim + titlecase
    assert pais["ano"] == 2019


def test_gold_fanout_branches_and_null_concat(spark):
    _, silver = _run_layers(spark)
    outs = acordos_gold_outputs(silver)
    assert set(outs) == {"acordos", "hier", "pais", "org"}
    assert outs["pais"].count() == 1
    assert outs["org"].count() == 1
    org = outs["org"].collect()[0]
    # local_de_assinatura was NULL→'Não Informado' so concat survives;
    # hierarchy shape is 'continente > região > local'
    assert org["local_completo"] == "Não Informado > Não Informado > Não Informado"
    assert org["acordo_recurso"] == "Memorando - Petróleo"
    assert set(outs["hier"].columns) == {"local_completo", "acordo_recurso"}


def test_empty_source_raises(spark):
    try:
        records_to_df(spark, [], expected_headers=RAW_HEADERS)
        raise AssertionError("expected EmptySourceError")
    except EmptySourceError:
        pass


def test_run_with_retry_policy_contract():
    """The policy behind flow_retry's contract oracle (attempts == 2):
    success passes through untouched, a transient failure consumes
    exactly one retry with the configured delay, and exhausting the
    budget re-raises the LAST exception — never a swallow (the
    documented divergence from the reference's bronze sink)."""
    from unittest import mock

    import pytest

    from etl_acordos_spark.plans.retry import RetryPolicy, run_with_retry

    calls = {"n": 0}

    def ok():
        calls["n"] += 1
        return 42

    assert run_with_retry(ok, RetryPolicy(retries=3, delay_seconds=0)) == 42
    assert calls["n"] == 1

    flaky_state = {"n": 0}

    def flaky():
        flaky_state["n"] += 1
        if flaky_state["n"] < 2:
            raise RuntimeError("transient")
        return "done"

    with mock.patch("etl_acordos_spark.plans.retry.time.sleep") as slept:
        got = run_with_retry(flaky, RetryPolicy(retries=1, delay_seconds=7))
    assert got == "done" and flaky_state["n"] == 2
    slept.assert_called_once_with(7)

    def always(_state={"n": 0}):
        _state["n"] += 1
        raise ValueError(f"boom {_state['n']}")

    with mock.patch("etl_acordos_spark.plans.retry.time.sleep"):
        with pytest.raises(ValueError, match="boom 3"):
            run_with_retry(always, RetryPolicy(retries=2, delay_seconds=1))
