"""Round-close bench analysis: compare a `bench.py` JSON line against
the anchors recorded in BASELINE.md.

Anchor extraction is deliberately conservative — only tables inside
sections whose heading contains "anchor" (the r1 2x budget table plus
every "Round-N anchors" / "re-anchors" section) feed the anchor map;
scale/skew measurement tables never do. Within an anchor row the value
is the FIRST numeric cell after the backticked key, except in
re-anchor tables (header carries "old anchor"), where the SECOND cell
is the fresh anchor. Later sections supersede earlier ones in file
order, mirroring how BASELINE.md is written.

Usage::

    python bench.py > /tmp/bench1.json
    python tools/bench_close.py /tmp/bench1.json [/tmp/bench2.json ...]

Prints, per run: headline total, per-key ratio geomean vs anchors,
and every key at ratio >= 1.5 (the 2x budget's early-warning line).
"""

from __future__ import annotations

import json
import math
import re
import sys
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(_REPO_ROOT, "BASELINE.md")

_KEY_CELL = re.compile(r"`([a-z0-9_]+)`[^|]*((?:\|[^|`]*)+)")
_NUM = re.compile(r"\b\d+(?:\.\d+)?\b")


def load_anchors(path: str = BASELINE) -> dict[str, float]:
    anchors: dict[str, float] = {}
    in_anchor_section = False
    second_cell = False
    for line in open(path):
        if line.startswith("#"):
            title = line.lower()
            in_anchor_section = ("anchor" in title) or (
                "2x budget" in title
            )
            second_cell = False
            continue
        if not in_anchor_section or not line.startswith("|"):
            continue
        if "old anchor" in line.lower():
            second_cell = True
            continue
        for m in _KEY_CELL.finditer(line):
            key, cells = m.group(1), m.group(2)
            nums = _NUM.findall(cells)
            if not nums:
                continue
            idx = 1 if (second_cell and len(nums) > 1) else 0
            anchors[key] = float(nums[idx])
    return anchors


def parse_bench_file(path: str) -> dict:
    """Return {"value", "queries"} from any of the three bench artifact
    shapes: a driver BENCH_r*.json wrapper (whole-file JSON, contract
    line under "parsed"), the BENCH_ratios_local.json sidecar
    (timings under "timings_all"), or a raw `bench.py` stdout capture
    (last JSON line, tolerating spark progress noise). ADVICE r11: the
    old last-{-line heuristic crashed on pretty-printed driver files."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except ValueError:
        lines = [
            ln for ln in text.splitlines() if ln.lstrip().startswith("{")
        ]
        if not lines:
            raise SystemExit(f"{path}: no JSON found")
        d = json.loads(lines[-1])
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
        d = d["parsed"]  # driver wrapper
    if isinstance(d, dict) and "timings_all" in d:  # bench.py sidecar
        d = {"value": d.get("headline_total"), "queries": d["timings_all"]}
    if not isinstance(d, dict) or not isinstance(d.get("queries"), dict):
        raise SystemExit(
            f"{path}: no per-key timings (driver line overflowed? "
            "'parsed' null?) — point at the sidecar instead"
        )
    return d


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        raise SystemExit(
            "usage: python tools/bench_close.py BENCH_FILE [BENCH_FILE ...]\n"
            "  accepts raw bench.py stdout captures, driver BENCH_r*.json "
            "wrappers, and BENCH_ratios_local.json sidecars"
        )
    anchors = load_anchors()
    print(f"anchors: {len(anchors)} keys")
    for path in sys.argv[1:]:
        d = parse_bench_file(path)
        q = d["queries"]
        ratios = {
            k: q[k] / anchors[k] for k in q if k in anchors and anchors[k]
        }
        geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
        hot = {k: round(r, 2) for k, r in ratios.items() if r >= 1.5}
        out = {
            "file": path,
            "headline_total": d.get("value"),
            "keys_compared": len(ratios),
            "ratio_geomean": round(geo, 3),
            "ge_1_5x": hot,
        }
        # a contract line's own full-registry self-report (bench.py
        # anchor_report) covers ALL timed keys, not just the byte-
        # capped stdout subset parsed above — surface it when present
        if isinstance(d.get("anc"), dict):
            out["self_report"] = d["anc"]
        if isinstance(d.get("env"), dict):
            out["env"] = d["env"]
        print(json.dumps(out))


if __name__ == "__main__":
    main()
