"""LLM-data-pipeline extension queries (SURVEY.md §2.6) — dedup family,
similarity search, text analysis, multimodal. Filled in build-plan step 7."""

from __future__ import annotations

from etl_acordos_spark.queries.base import QueryDef

QUERIES: dict[str, QueryDef] = {}
