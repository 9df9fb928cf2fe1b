"""Scalar cleaning & derivation functions.

Re-expresses the reference's per-column pandas transforms (reference
tasks/bronze.py:49-68, tasks/silver.py:37-69, tasks/gold.py:37-39) as
Catalyst column expressions. Each maps a documented reference behavior;
intentional divergences from reference bugs are called out inline.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filler the reference uses for missing text values
#: (reference tasks/silver.py:37-52).
NOT_INFORMED = "não informado"

#: Sentinel string the reference treats as missing (tasks/silver.py:38).
MISSING_SENTINEL = "-"


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Lowercase + spaces→underscores on every column name.

    Reference: ``normalize_column_names`` (tasks/bronze.py:49-51).
    Whole-table rename — metadata only, no data movement.
    """
    return df.toDF(*[c.lower().replace(" ", "_") for c in df.columns])


def parse_date_ddmmyyyy(col: Column | str) -> Column:
    """Parse ``dd/MM/yyyy`` strings to dates; unparseable → NULL.

    Reference: ``pd.to_datetime(..., format='%d/%m/%Y', errors='coerce')``
    (tasks/bronze.py:55-58). `try_to_date` nulls out malformed values in
    both ANSI and non-ANSI mode, matching ``errors='coerce'``.
    """
    return F.try_to_date(F.col(col) if isinstance(col, str) else col, "dd/MM/yyyy")


def cast_str(col: Column | str) -> Column:
    """Cast to string (reference tasks/bronze.py:60)."""
    return (F.col(col) if isinstance(col, str) else col).cast("string")


def trim_ws(col: Column | str) -> Column:
    """Strip leading/trailing whitespace (reference tasks/bronze.py:61,
    tasks/silver.py:56-65)."""
    return F.trim(F.col(col) if isinstance(col, str) else col)


def left_n(col: Column | str, n: int = 255) -> Column:
    """Truncate a string to its first *n* characters.

    Reference: tasks/bronze.py:59-62 — dead code there (the guard checks
    ``'titulo'`` but the normalized column is ``'título'``); implemented
    live here as a documented divergence (SURVEY.md §2.3 fn_left255).
    """
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, n)


def fill_default(col: Column | str, default: str = NOT_INFORMED) -> Column:
    """NULL → *default*.

    Reference: ``fillna('não informado')`` on 8 columns
    (tasks/silver.py:37-52). Divergence (bug fix): the reference discards
    the ``continente`` fillna result (tasks/silver.py:37 has no
    assignment); here the fill applies uniformly.
    """
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(default))


def sentinel_to_default(
    col: Column | str,
    sentinel: str = MISSING_SENTINEL,
    default: str = NOT_INFORMED,
) -> Column:
    """Literal sentinel (``'-'``) → *default* (reference tasks/silver.py:38-52)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == sentinel, F.lit(default)).otherwise(c)


def titlecase(col: Column | str) -> Column:
    """Title-case a string column.

    Reference: pandas ``str.title`` (tasks/silver.py:56-65). Semantic
    edge (documented in SURVEY.md §2.3): pandas capitalizes after any
    non-alpha character, Spark ``initcap`` only after whitespace; declared
    oracle queries avoid the divergent inputs.
    """
    return F.initcap(F.col(col) if isinstance(col, str) else col)


def year_of(col: Column | str) -> Column:
    """Extract the year as an int (reference tasks/silver.py:69 → ``ano``)."""
    return F.year(F.col(col) if isinstance(col, str) else col)


def concat_sep(cols: Iterable[Column | str], sep: str) -> Column:
    """Concatenate columns with a literal separator, NULL-propagating.

    Reference: ``df[a] + ' > ' + df[b]`` (tasks/gold.py:37-39) — pandas
    ``+`` yields NaN if any operand is NaN, so this uses ``concat`` (NULL
    if any input is NULL), NOT ``concat_ws`` (which skips NULLs).
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.col(c) if isinstance(c, str) else c)
    return F.concat(*parts)
