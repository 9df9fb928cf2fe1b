"""App-level retry policy for sink actions.

The reference relies on Airflow task retries (dag_main.py:18-19: 1 retry,
60 s delay) and silently swallows bronze DB-sink errors
(tasks/bronze.py:123-124). Spark already retries *tasks*
(``spark.task.maxFailures``); this wraps whole sink *actions* with the
Airflow-equivalent policy — and always fails loudly after exhausting
retries (documented divergence: no swallowed sink errors).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

R = TypeVar("R")


@dataclass(frozen=True)
class RetryPolicy:
    retries: int = 1          # reference dag_main.py:18
    delay_seconds: float = 60  # reference dag_main.py:19


def run_with_retry(action: Callable[[], R], policy: RetryPolicy = RetryPolicy()) -> R:
    """Run *action*; on failure retry per policy, then re-raise."""
    attempts = policy.retries + 1
    last: BaseException | None = None
    for attempt in range(attempts):
        try:
            return action()
        except Exception as exc:  # noqa: BLE001 — policy applies to any sink failure
            last = exc
            if attempt < attempts - 1:
                time.sleep(policy.delay_seconds)
    assert last is not None
    raise last
