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
    within each class."""
    order = bench.rotate_never_benched_first(list(bench.HEADLINE))
    assert sorted(order) == sorted(bench.HEADLINE)
    import os
    import re

    benched: dict[str, int] = {}
    for path in os.listdir(bench._REPO_ROOT):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", path)
        if not m:
            continue
        with open(os.path.join(bench._REPO_ROOT, path)) as f:
            parsed = json.load(f).get("parsed") or {}
        for k in parsed.get("queries") or {}:
            benched[k] = max(benched.get(k, 0), int(m.group(1)))
    seen_benched = False
    for k in order:
        if k in benched:
            seen_benched = True
        else:
            assert not seen_benched, (
                f"never-benched key {k} ordered after a benched one"
            )


def test_contract_line_fits_capture_budget():
    """Simulate the emission loop with worst-case float widths: the
    serialized line must stay under LINE_BYTE_BUDGET and still carry a
    meaningful number of keys."""
    timings = {k: 123.4567 for k in bench.HEADLINE}
    order = bench.rotate_never_benched_first(list(bench.HEADLINE))
    shown: dict[str, float] = {}

    def line(qmap: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": qmap,
                "sf": 0.1,
                "shown": len(qmap),
                "ran": len(timings),
            },
            separators=(",", ":"),
        )

    for k in order:
        candidate = dict(shown)
        candidate[k] = timings[k]
        if len(line(candidate)) > bench.LINE_BYTE_BUDGET:
            break
        shown = candidate
    payload = line(shown)
    assert len(payload) <= bench.LINE_BYTE_BUDGET
    assert len(shown) >= 40, f"only {len(shown)} keys fit the budget"
    parsed = json.loads(payload)
    assert parsed["shown"] == len(shown)
    assert parsed["ran"] == len(bench.HEADLINE)
