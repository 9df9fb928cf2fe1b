"""Live-connector wiring tests — fakes stand in for the network clients
(the sandbox has no gspread/mariadb), the argument plumbing and dialect
SQL are what's under test."""

from __future__ import annotations

import sqlite3

import pytest

from etl_acordos_spark.sources.dbapi_sink import (
    _insert_sql,
    ddl_from_schema,
    write_dbapi_upsert,
)
from etl_acordos_spark.sources.live_clients import (
    mariadb_connection_factory,
    read_gsheet,
)
from etl_acordos_spark.sources.records import EmptySourceError


def test_read_gsheet_routes_fetch_into_records_df(spark):
    seen = {}

    def fake_fetch(sheet_id, worksheet_title, service_account_path=None,
                   expected_headers=None):
        seen.update(
            sheet_id=sheet_id,
            worksheet=worksheet_title,
            creds=service_account_path,
            headers=expected_headers,
        )
        return [
            {"acordo": "A1", "valor": "10"},
            {"acordo": "A2", "valor": "20"},
        ]

    df = read_gsheet(
        spark,
        "sheet-key-123",
        "Página1",
        service_account_path="/secrets/sa.json",
        expected_headers=["acordo", "valor"],
        fetch=fake_fetch,
    )
    assert seen == {
        "sheet_id": "sheet-key-123",
        "worksheet": "Página1",
        "creds": "/secrets/sa.json",
        "headers": ["acordo", "valor"],
    }
    assert df.columns == ["acordo", "valor"]
    assert df.count() == 2


def test_read_gsheet_empty_payload_is_hard_error(spark):
    with pytest.raises(EmptySourceError):
        read_gsheet(spark, "k", "w", fetch=lambda *a, **kw: [])


def test_mariadb_factory_passes_connection_args():
    captured = {}

    def fake_connect(**kw):
        captured.update(kw)
        return "CONN"

    factory = mariadb_connection_factory(
        "db.internal", 3306, "etl", "pw", "acordos", connect=fake_connect
    )
    assert factory() == "CONN"
    assert captured == {
        "host": "db.internal",
        "port": 3306,
        "user": "etl",
        "password": "pw",
        "database": "acordos",
    }


def test_mariadb_upsert_sql_dialect():
    sql = _insert_sql("acordos", ["id", "valor"], "id", dialect="mariadb")
    assert sql == (
        "INSERT INTO `acordos` (`id`, `valor`) VALUES (?, ?)"
        " ON DUPLICATE KEY UPDATE `valor` = VALUES(`valor`)"
    )
    # pymysql flavor: %s placeholders
    sql = _insert_sql("acordos", ["id", "valor"], "id", dialect="mysql")
    assert "VALUES (%s, %s)" in sql


def test_mariadb_ddl_backtick_quoting():
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("valor", T.DoubleType())])
    ddl = ddl_from_schema(
        "acordos", schema, auto_increment_pk="id", dialect="mariadb"
    )
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS `acordos` ("
        "`id` INTEGER AUTO_INCREMENT PRIMARY KEY, `valor` DOUBLE PRECISION)"
    )


def test_ansi_sink_still_round_trips_sqlite(spark, tmp_path):
    """The dialect refactor must not disturb the default (ansi) sink."""
    db = str(tmp_path / "sink.db")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    )
    write_dbapi_upsert(
        df, "t", lambda: sqlite3.connect(db), upsert_key="k",
        writer_partitions=1,
    )
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    write_dbapi_upsert(
        df2, "t", lambda: sqlite3.connect(db), upsert_key="k",
        writer_partitions=1,
    )
    got = sorted(
        sqlite3.connect(db).execute("SELECT k, v FROM t").fetchall()
    )
    assert got == [(1, "a"), (2, "B"), (3, "c")]
