"""Contract tests for bench.py's driver-facing stdout line — pure
Python (no Spark): the driver keeps only the last ~2000 bytes of
stdout, so the printed payload must stay under budget and the rotation
must schedule never-benched keys first (BENCH_r03-r05 recorded
``parsed: null`` when the full 112-key line overflowed the capture)."""

from __future__ import annotations

import json

import bench


def test_headline_keys_are_registered_and_unique():
    import __spark_entry__ as contract

    qs = contract.queries()
    missing = [k for k in bench.HEADLINE if k not in qs]
    assert missing == [], f"HEADLINE keys not in the registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_rotation_fronts_never_benched_keys():
    """Keys absent from every driver-parsed BENCH_r*.json must come
    before every previously-recorded key, preserving HEADLINE order
    within each class. Tolerates malformed BENCH files exactly like
    the production scan (which try/excepts them)."""
    order = bench.rotate_never_benched_first(list(bench.HEADLINE))
    assert sorted(order) == sorted(bench.HEADLINE)
    import os
    import re

    benched: set[str] = set()
    for path in os.listdir(bench._REPO_ROOT):
        if not re.fullmatch(r"BENCH_r(\d+)\.json", path):
            continue
        try:
            with open(os.path.join(bench._REPO_ROOT, path)) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        benched |= set(parsed.get("queries") or {})
    seen_benched = False
    for k in order:
        if k in benched:
            seen_benched = True
        else:
            assert not seen_benched, (
                f"never-benched key {k} ordered after a benched one"
            )


def test_contract_line_fits_capture_budget():
    """The REAL emission code (bench.build_contract_line) with
    worst-case float widths: the serialized line must stay under
    LINE_BYTE_BUDGET and still carry a meaningful number of keys."""
    timings = {k: 123.4567 for k in bench.HEADLINE}
    payload = bench.build_contract_line(timings, 0.1)
    assert len(payload) <= bench.LINE_BYTE_BUDGET
    parsed = json.loads(payload)
    assert parsed["ran"] == len(bench.HEADLINE)
    assert parsed["shown"] == len(parsed["queries"]) >= 40
    assert parsed["value"] == round(sum(timings.values()), 4)


def test_pinned_core_always_shown():
    """VERDICT r12 item 2: the full rotation printed disjoint subsets in
    consecutive rounds (n_common=0) and in the 32c/8c pair (empty
    scaling.per_query). The PINNED heavy-key core must survive the byte
    cap even at worst-case float widths, must lead the printed subset,
    and must consist of keys every bench run times (HEADLINE members),
    so that any two runs share at least the core."""
    assert len(bench.PINNED) == len(set(bench.PINNED))
    assert set(bench.PINNED) <= set(bench.HEADLINE), (
        sorted(set(bench.PINNED) - set(bench.HEADLINE))
    )
    timings = {k: 123.4567 for k in bench.HEADLINE}
    # worst case also includes the env/anchor extras the real run adds
    extra = {
        "env": {
            "load": [88.88, 88.88, 88.88],
            "up_h": 8888.88,
            "load0": [88.88, 88.88, 88.88],
        },
        "anc": {
            "geo": 8.888,
            "n": 888,
            "hot_n": 88,
            "hot": {k: 88.88 for k in bench.PINNED[:8]},
        },
    }
    payload = bench.build_contract_line(timings, 0.1, extra=extra)
    assert len(payload) <= bench.LINE_BYTE_BUDGET
    parsed = json.loads(payload)
    shown = list(parsed["queries"])
    assert shown[: len(bench.PINNED)] == bench.PINNED
    missing = [k for k in bench.PINNED if k not in parsed["queries"]]
    assert missing == [], f"pinned keys dropped by the byte cap: {missing}"


def test_every_registry_key_timed_or_named_excluded():
    """VERDICT r6 item 3: no silent bench gaps. HEADLINE, the
    auto-computed auxiliary tier, and the named EXCLUDED reasons must
    tile the registry exactly — a new key is benched by default unless
    someone writes down why not."""
    import __spark_entry__ as contract

    qs = set(contract.queries())
    headline = set(bench.HEADLINE)
    excluded = set(bench.EXCLUDED)
    assert not headline & excluded, sorted(headline & excluded)
    assert excluded <= qs, f"EXCLUDED keys not registered: {sorted(excluded - qs)}"
    auxiliary = qs - headline - excluded
    assert qs == headline | auxiliary | excluded
    for key, reason in bench.EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) >= 10, key


def test_contract_value_is_headline_total_only():
    """With an auxiliary tier running after HEADLINE, the stdout
    `value` must stay the HEADLINE-only sum (round-over-round
    comparable); `ran` counts everything timed."""
    timings = {"a": 1.0, "b": 2.0, "aux": 10.0}
    line = bench.build_contract_line(timings, 0.1, headline_total=3.0)
    parsed = json.loads(line)
    assert parsed["value"] == 3.0
    assert parsed["ran"] == 3
