"""Structured-Streaming tests: watermarked windows, session windows,
custom stateful operator — each a real availableNow streaming run,
checked against the equivalent batch aggregate and for rerun stability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_acordos_spark.queries.base import read_events
from etl_acordos_spark.streaming.events import (
    run_stream_to_table,
    session_stream_agg,
    stateful_user_totals,
    stream_events,
    windowed_stream_agg,
)


def _canon(rows):
    return sorted(tuple(map(repr, r)) for r in rows)


def test_stream_windows_equal_batch(spark, sf_smoke):
    got = run_stream_to_table(
        windowed_stream_agg(stream_events(spark, sf_smoke)), "t_sw"
    ).collect()
    want = (
        read_events(spark, sf_smoke)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    )
    assert len(got) > 0
    assert _canon(got) == _canon(want)


def test_stream_sessions_gap_semantics(spark, sf_smoke):
    got = run_stream_to_table(
        session_stream_agg(stream_events(spark, sf_smoke)), "t_ss"
    )
    # every user's event count is conserved across their sessions
    per_user = (
        got.groupBy("user_id")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    want = {
        r["user_id"]: r["n"]
        for r in read_events(spark, sf_smoke)
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {r["user_id"]: r["n"] for r in per_user} == want


def test_stream_stateful_totals(spark, sf_smoke):
    got = run_stream_to_table(
        stateful_user_totals(stream_events(spark, sf_smoke)),
        "t_st",
        output_mode="update",
    ).collect()
    want = (
        read_events(spark, sf_smoke)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    )
    assert _canon(got) == _canon(want)


def test_stream_rerun_stable(spark, sf_smoke):
    a = run_stream_to_table(
        windowed_stream_agg(stream_events(spark, sf_smoke)), "t_rr"
    ).collect()
    b = run_stream_to_table(
        windowed_stream_agg(stream_events(spark, sf_smoke)), "t_rr"
    ).collect()
    assert _canon(a) == _canon(b)


def test_watermark_in_plan(spark, sf_smoke):
    plan = windowed_stream_agg(
        stream_events(spark, sf_smoke)
    )._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
