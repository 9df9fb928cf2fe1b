"""Medallion pipeline plan builders."""

from etl_acordos_spark.plans.medallion import (
    MedallionConfig,
    bronze_transform,
    gold_fanout,
    silver_transform,
)
from etl_acordos_spark.plans.retry import RetryPolicy, run_with_retry

__all__ = [
    "MedallionConfig",
    "bronze_transform",
    "gold_fanout",
    "silver_transform",
    "RetryPolicy",
    "run_with_retry",
]
