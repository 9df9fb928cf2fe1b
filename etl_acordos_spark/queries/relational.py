"""Relational extension queries (SURVEY.md §2.6) — joins, aggregations,
top-k, windows, JSON, set ops. Filled in build-plan step 6."""

from __future__ import annotations

from etl_acordos_spark.queries.base import QueryDef

QUERIES: dict[str, QueryDef] = {}
