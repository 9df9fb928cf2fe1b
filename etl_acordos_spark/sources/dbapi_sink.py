"""Warehouse sink: typed DDL generation + batched DBAPI upsert/append.

The reference dual-writes every layer to MariaDB with name-based DDL
typing and a two-statements-per-row upsert loop (reference
tasks/bronze.py:94-121, tasks/silver.py:95-139, tasks/gold.py:74-193).

Spark-first re-expression:
  - DDL comes from the DataFrame's *typed* schema (StructType → SQL
    types), replacing the reference's name-based map (bronze.py:96).
  - The upsert is a `foreachPartition` sink: each executor partition
    opens ONE connection and issues batched ``executemany`` statements —
    O(partitions) round-trips instead of O(rows). On a 1000-executor
    cluster, `coalesce` the frame to the number of writer connections the
    database can take.
  - Divergence (bug fix): sink errors propagate — the reference swallows
    bronze DB errors (tasks/bronze.py:123-124).

The connection factory is any zero-arg callable returning a DBAPI
connection (sqlite3, mysql/mariadb driver, psycopg...), so the sink is
testable without a database server. For plain replace/append semantics on
a real JDBC database, prefer Spark's built-in ``df.write.jdbc`` — this
custom sink exists because Spark has no native MERGE for JDBC.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SQL_TYPES: dict[type, str] = {
    T.StringType: "TEXT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
}


def ddl_from_schema(table: str, schema: T.StructType, primary_key: str | None = None) -> str:
    """``CREATE TABLE IF NOT EXISTS`` DDL from a typed Spark schema.

    Replaces the reference's column-NAME-based type map
    (tasks/bronze.py:94-99) with type-based mapping — Spark schemas are
    typed, so no inference leak.
    """
    cols = []
    for f in schema.fields:
        sql_t = _SQL_TYPES.get(type(f.dataType), "TEXT")
        pk = " PRIMARY KEY" if primary_key == f.name else ""
        cols.append(f'"{f.name}" {sql_t}{pk}')
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)})'


def _insert_sql(table: str, columns: list[str], upsert_key: str | None) -> str:
    collist = ", ".join(f'"{c}"' for c in columns)
    qs = ", ".join("?" for _ in columns)
    sql = f'INSERT INTO "{table}" ({collist}) VALUES ({qs})'
    if upsert_key:
        sets = ", ".join(f'"{c}" = excluded."{c}"' for c in columns if c != upsert_key)
        sql += f' ON CONFLICT ("{upsert_key}") DO UPDATE SET {sets}'
    return sql


def write_dbapi_upsert(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], Any],
    upsert_key: str,
    batch_size: int = 1000,
    writer_partitions: int | None = None,
) -> None:
    """Batched upsert keyed on *upsert_key* (reference tasks/bronze.py:102-121,
    which does per-row UPDATE+INSERT; here ``executemany`` over batches).
    """
    _write_dbapi(df, table, connection_factory, upsert_key, batch_size, writer_partitions)


def write_dbapi_append(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], Any],
    batch_size: int = 1000,
    writer_partitions: int | None = None,
) -> None:
    """Batched append (reference tasks/silver.py:95-139 insert loops)."""
    _write_dbapi(df, table, connection_factory, None, batch_size, writer_partitions)


def _write_dbapi(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], Any],
    upsert_key: str | None,
    batch_size: int,
    writer_partitions: int | None,
) -> None:
    columns = df.columns
    sql = _insert_sql(table, columns, upsert_key)

    # DDL once, driver-side, inside the same transaction discipline.
    ddl = ddl_from_schema(table, df.schema, primary_key=upsert_key)
    conn = connection_factory()
    try:
        conn.execute(ddl)
        conn.commit()
    finally:
        conn.close()

    def sink_partition(rows) -> None:
        conn = connection_factory()
        try:
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    conn.executemany(sql, batch)
                    batch.clear()
            if batch:
                conn.executemany(sql, batch)
            conn.commit()
        finally:
            # Fail loudly: exceptions propagate and fail the Spark task
            # (divergence from reference tasks/bronze.py:123-124 swallow).
            conn.close()

    out = df
    if writer_partitions:
        out = out.coalesce(writer_partitions)
    out.foreachPartition(sink_partition)
