"""Declared query registry.

Each SURVEY.md §2 operator key maps to a `QueryDef`: a demonstration
query over the driver testdata plus (where ANSI-SQL-expressible) the
equivalent DuckDB oracle SQL. `__spark_entry__.py` exposes these through
`queries()` / `oracle_sql()`.
"""

from etl_acordos_spark.queries.base import QueryDef, all_queries

__all__ = ["QueryDef", "all_queries"]
