"""Pin the driver CORRECTNESS window (first 50 registry keys).

The driver checks only ``list(queries())[:50]`` per round. Rounds 1-2
covered the core→relational head; round 3 rotates the never-checked
surfaces (LLM pipeline, streaming, extensibility) plus the repaired
``ext_approx`` and the flagship into that window. These tests fail loudly
if a registry edit silently displaces the window (e.g. a new key added to
an early-merged module) — new operators belong in a module merged AFTER
the window surfaces.
"""

from __future__ import annotations

import __spark_entry__ as contract
from etl_acordos_spark.queries import extensibility, llm, streaming

DRIVER_CAP = 50


def test_driver_window_composition() -> None:
    keys = list(contract.queries())
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    window = keys[:DRIVER_CAP]
    assert window[0] == "ext_approx"
    assert window[1] == "flagship"
    expected = (
        {"ext_approx", "flagship"}
        | set(llm.QUERIES)
        | set(streaming.QUERIES)
        | set(extensibility.QUERIES)
    )
    assert set(window) == expected


def test_every_query_key_has_callable_and_oracle_slot() -> None:
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
