"""Deterministic cross-engine sampling hashes.

The corpus-sampling operators (train/test split, per-domain caps,
mixture sampling) need an acceptance hash that is (1) deterministic
across runs, engines, and cluster layouts, and (2) exactly reproducible
in the DuckDB oracle SQL. The classic multiplicative hash
``(id * 2654435761) mod 2^32`` (Knuth's 2^32 golden-ratio multiplier)
satisfies (2) only if the multiply never overflows: in int64 it wraps
silently for ids above ~3.47e9 (2^63 / 2654435761) in Spark while DuckDB
raises or widens — a silent cross-engine divergence exactly at the
100 TB id ranges these operators advertise.

Fix: compute the product in DECIMAL(38,0). Both Spark and DuckDB evaluate
decimal arithmetic exactly (max int64 id × multiplier ≈ 2.4e28 ≪ 1e38),
so the hash is wrap-free and bit-identical across engines for the entire
non-negative int64 id range. Precondition: ids are non-negative (the
``%`` remainder sign convention differs between engines for negatives).

A production pipeline on one engine would use xxhash64 instead; this
portable hash exists because every sampling decision here is replayed
verbatim by an independent SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_C = 2654435761  # Knuth multiplicative constant, ⌊2^32/φ⌋
XX_PRIME = 2246822519  # xxhash32 prime2 — an uncorrelated second family
M32 = 4_294_967_296  # 2^32

_DEC = "decimal(38,0)"


def hash32(col: Column, mult: int = KNUTH_C) -> Column:
    """``(col * mult) mod 2^32`` computed wrap-free in DECIMAL(38,0).

    Returns a decimal column in [0, 2^32); safe for the whole
    non-negative int64 id range. Pass a different *mult* (e.g.
    ``XX_PRIME``) where two bucketings must be uncorrelated.
    """
    return (col.cast(_DEC) * F.lit(mult)) % F.lit(M32)


def unit_hash(col: Column, mult: int = KNUTH_C) -> Column:
    """``hash32`` scaled to an exact double in [0, 1) — the acceptance
    variate for rate-based sampling filters."""
    return hash32(col, mult).cast("double") / F.lit(float(M32))


def sql_hash32(expr: str, mult: int = KNUTH_C) -> str:
    """DuckDB-SQL twin of :func:`hash32` for oracle strings."""
    return f"(CAST({expr} AS DECIMAL(38,0)) * {mult}) % 4294967296"


def sql_unit_hash(expr: str, mult: int = KNUTH_C) -> str:
    """DuckDB-SQL twin of :func:`unit_hash`."""
    return f"(CAST({sql_hash32(expr, mult)} AS DOUBLE) / 4294967296.0)"


def unit_hash_open(col: Column, mult: int = KNUTH_C) -> Column:
    """``(hash32 + 0.5) / 2^32`` — a variate in the OPEN interval
    (0, 1). Use for weight-keyed sampling (``u ** (1/w)``): a variate
    of exactly 0 would freeze the key at 0 for every weight, silently
    excluding that id no matter how heavy it is."""
    return (hash32(col, mult).cast("double") + F.lit(0.5)) / F.lit(
        float(M32)
    )


def sql_unit_hash_open(expr: str, mult: int = KNUTH_C) -> str:
    """DuckDB-SQL twin of :func:`unit_hash_open`."""
    return (
        f"((CAST({sql_hash32(expr, mult)} AS DOUBLE) + 0.5)"
        " / 4294967296.0)"
    )
