"""Scalar cleaning/derivation functions (pure Column expressions).

Every function here returns a `pyspark.sql.Column` (or a DataFrame-level
helper for whole-table renames), so each stays inside Catalyst whole-stage
codegen — no Python executes per row anywhere in this module.
"""

from etl_acordos_spark.functions.cleaning import (
    cast_str,
    concat_sep,
    fill_default,
    left_n,
    normalize_column_names,
    parse_date_ddmmyyyy,
    sentinel_to_default,
    titlecase,
    trim_ws,
    year_of,
)

__all__ = [
    "cast_str",
    "concat_sep",
    "fill_default",
    "left_n",
    "normalize_column_names",
    "parse_date_ddmmyyyy",
    "sentinel_to_default",
    "titlecase",
    "trim_ws",
    "year_of",
]
