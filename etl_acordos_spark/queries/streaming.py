"""Structured-Streaming demonstration queries (SURVEY.md §2.6 gap map —
the reference has no streaming; `events` is the driver table for it).

Each query executes a REAL streaming plan (microbatches + state store +
watermarks) bounded to the available input with availableNow, lands in a
memory sink, and returns the settled table — so a finite input yields a
deterministic result and plain batch SQL is a valid oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_acordos_spark.queries.base import QueryDef, read_events, scratch_dir
from etl_acordos_spark.streaming.events import (
    dedup_stream,
    incremental_upsert_run,
    interval_join_streams,
    run_stream_to_table,
    session_stream_agg,
    stateful_user_totals,
    stream_events,
    streaming_cms_run,
    streaming_hll_run,
    windowed_stream_agg,
)


def q_ext_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event_type, streamed with a 2h
    watermark; complete-mode memory sink holds the closed result."""
    return run_stream_to_table(
        windowed_stream_agg(stream_events(spark, sf_dir)),
        "stream_windows_result",
    )


def q_ext_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap session windows via native
    session_window."""
    return run_stream_to_table(
        session_stream_agg(stream_events(spark, sf_dir)),
        "stream_sessions_result",
    )


def q_ext_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals, update-mode."""
    return run_stream_to_table(
        stateful_user_totals(stream_events(spark, sf_dir)),
        "stream_stateful_result",
        output_mode="update",
    )


def q_ext_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch: corpus words delivered as 4
    microbatches, each batch's cell deltas foreachBatch-summed into a
    parquet cells store (streaming/events.py:streaming_cms_run);
    the settled store feeds the same top-30 accuracy report as
    ext_cms_sketch. CMS additivity makes the streamed sketch
    bit-identical to the batch build, so this streaming key carries a
    FULL hash oracle (the ext_cms_sketch SQL verbatim)."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.operators.relational import cms_report
    from etl_acordos_spark.queries.base import t

    vals = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("v"))
    )
    cells = streaming_cms_run(
        spark, vals, scratch_dir(), depth=4, width_hex=3, n_batches=4
    )
    return cms_report(
        vals, cells, depth=4, width_hex=3, k=30
    ).withColumnRenamed("v", "word")


def q_ext_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog register store: (year, month, custkey)
    order rows delivered as 4 microbatches, each batch's md5-HLL
    registers landed in per-batch delta dirs and max-merged into the
    settled store (streaming/events.py:streaming_hll_run); the settled
    registers feed the same per-year + grand-total estimate rollup as
    ext_hll_md5. Max-mergeability makes the streamed registers equal
    the batch build bit-for-bit, so this streaming key carries the
    batch key's FULL hash oracle — streaming STATE hash-checked, the
    ext_stream_cms pattern with idempotent (not just additive) merge."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.operators.relational import hll_md5_year_rollup
    from etl_acordos_spark.queries.base import t

    orders = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
        "o_custkey",
    )
    regs = streaming_hll_run(
        spark, orders, ["ano", "mes"], "o_custkey", scratch_dir()
    )
    return hll_md5_year_rollup(regs)


def q_ext_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under simulated at-least-once delivery: the event
    stream unioned with itself (every event delivered twice), then
    `dropDuplicatesWithinWatermark` on event_id — the result must equal
    the single-delivery batch, which is exactly the oracle."""
    doubled = stream_events(spark, sf_dir).union(stream_events(spark, sf_dir))
    return run_stream_to_table(
        dedup_stream(doubled), "stream_dedup_result", output_mode="append"
    )


def q_ext_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    `nation` dimension (keyed user_id % 25). The static side is
    broadcast per microbatch — a streaming dim lookup never shuffles
    the stream."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.queries.base import t

    ev = stream_events(spark, sf_dir).withColumn(
        "nk", F.col("user_id") % 25
    )
    dim = F.broadcast(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    joined = ev.join(dim, ev.nk == dim.n_nationkey).select(
        "event_id", "n_name", F.round("value", 4).alias("value")
    )
    return run_stream_to_table(
        joined, "stream_join_result", output_mode="append"
    )


def q_ext_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to same-user purchases
    within 30 minutes (attribution). Two watermarked streams, state
    evicted past the time-range horizon; on finite availableNow input
    the result equals the batch inequality join — the oracle."""
    from pyspark.sql import functions as F

    ev = stream_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return run_stream_to_table(
        interval_join_streams(clicks, purchases),
        "stream_stream_join_result",
        output_mode="append",
    )


def q_ext_stream_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ingest against a STORED MinHash band index:
    `documents` delivered as 4 ascending-id microbatches; each batch
    probes the on-disk index, verifies collisions by exact Jaccard
    against the kept-docs store, and appends its survivors' bands (and
    bucket-count deltas) back to the index. Runs the md5 hash family:
    every stage — batch split (the percentile_approx boundary is exact
    at verification scale, pinned in tests/test_streaming.py), banding,
    bucket cap, probe, Jaccard verify — is then SQL-replayable, and the
    settled kept-set hash-verifies against `_stream_dedup_fold_oracle`
    (the fold unrolled one stage per microbatch). The xxhash64 family
    stays the production default; its fold-equality with
    `incremental_minhash_dedup` remains unit-tested."""
    from etl_acordos_spark.queries.base import t
    from etl_acordos_spark.streaming.dedup_index import (
        streaming_dedup_index_run,
    )

    docs = t(spark, sf_dir, "documents")
    return streaming_dedup_index_run(
        spark, docs, "text", "doc_id", scratch_dir(), n_batches=4,
        hash_fn="md5",
    )


def q_ext_stream_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance: `embeddings` ingested as 4
    ascending-id microbatches into a (ingest_batch, cell)-partitioned
    vector store (first batch freezes the coarse quantizer), then a
    partition-pruned probe answers top-10 around vec_id 0's embedding.
    Runs the exact shifted-integer quantizer (quantize=2^20): delivery
    is ascending-id microbatches, so the first batch IS the id-prefix
    training sample and the frozen quantizer, every stored cell, the
    probe and the re-rank are bit-identical to batch `ivf_topk`
    (quantized) — the store's probe result therefore hash-verifies
    against the SAME `_ivf_oracle` as `ext_simsearch_ivf`. Stream==
    batch equality stays unit-tested for both families; the float
    spherical store remains the production default."""
    from pyspark.sql import functions as F

    from etl_acordos_spark.queries.base import t
    from etl_acordos_spark.streaming.ann_index import (
        ann_index_topk,
        streaming_ann_index_run,
    )

    from etl_acordos_spark.operators.simsearch import query_vector

    emb = t(spark, sf_dir, "embeddings")
    # probe vector FIRST: a missing query id raises the documented
    # ValueError before the (much more expensive) streaming ingest runs
    qvec = query_vector(emb, 0)
    run_ns = streaming_ann_index_run(
        spark, emb, "vec_id", "embedding", scratch_dir(), n_batches=4,
        quantize=1 << 20,
    )
    return ann_index_topk(
        spark,
        run_ns,
        qvec,
        "vec_id",
        k=10,
        exclude_id=0,
    )


def q_ext_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental lake merge: 4 microbatches foreachBatch-
    upsert each user's latest event into a parquet snapshot; the settled
    snapshot must equal the batch latest-per-user (the oracle), no
    matter how events were split across batches."""
    from pyspark.sql import functions as F

    ev = read_events(spark, sf_dir)
    snap = incremental_upsert_run(spark, ev, scratch_dir(), n_batches=4)
    return snap.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
    )


_STREAM_UPSERT_ORACLE = """
SELECT user_id, event_id AS last_event_id, round(value, 4) AS last_value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


_WINDOWS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""

# Gaps-and-islands reformulation of session_window's merge semantics:
# a new session starts when the gap since the previous event is >= the
# 30-minute timeout (Spark merges an event iff it lands strictly inside
# the session's current end = last_ts + gap).
_SESSIONS_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, sess_no
"""

_STATEFUL_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY user_id
"""

_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, round(value, 4) AS value
FROM events
"""

_STREAM_JOIN_ORACLE = """
SELECT event_id, n_name, round(value, 4) AS value
FROM events JOIN nation ON user_id % 25 = n_nationkey
"""

_STREAM_STREAM_JOIN_ORACLE = """
SELECT a.event_id AS left_id, b.event_id AS right_id, a.user_id,
       round(b.value, 4) AS value
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
"""

def q_ext_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming metric anomaly scoring: each microbatch of the event
    stream scored against batch-trained per-type stats (stream-static
    broadcast join — the stats never reshuffle the stream) and filtered
    to |z| > 2.5 — real-time DQ alerting on top of the batch monitor.
    On availableNow input the result equals the batch z-score query, so
    `ext_anomaly_zscore`'s oracle is reused verbatim."""
    from etl_acordos_spark.operators.relational import zscore_outliers

    scored = zscore_outliers(
        read_events(spark, sf_dir),
        stream_events(spark, sf_dir),
        "event_type",
        "value",
    )
    return run_stream_to_table(
        scored, "stream_anomaly_result", output_mode="append"
    )


def _anomaly_oracle() -> str:
    from etl_acordos_spark.queries.relational import _ANOMALY_ORACLE

    return _ANOMALY_ORACLE


def _stream_hll_oracle() -> str:
    """The ext_hll_md5 oracle verbatim: register max-mergeability makes
    the streamed store equal the batch build bit-for-bit (pinned by the
    fold-equality test in tests/test_streaming.py)."""
    from etl_acordos_spark.queries.relational import _hll_md5_oracle

    return _hll_md5_oracle()


def _stream_cms_oracle() -> str:
    """The ext_cms_sketch oracle verbatim: CMS cell additivity makes
    the streamed store equal the batch build bit-for-bit (pinned by
    tests/test_streaming.py's fold-equality test), so the same SQL
    checks the streaming key."""
    from etl_acordos_spark.queries.llm import _cms_sketch_oracle

    return _cms_sketch_oracle()


def _stream_dedup_index_oracle() -> str:
    """The unrolled md5-family fold replay — see
    queries/llm.py:_stream_dedup_fold_oracle."""
    from etl_acordos_spark.queries.llm import _stream_dedup_fold_oracle

    return _stream_dedup_fold_oracle()


def _stream_ann_oracle() -> str:
    """The ext_simsearch_ivf oracle verbatim: ascending-id microbatch
    delivery makes the first batch the id-prefix training sample, so
    the streamed store's frozen quantized quantizer, cell assignments,
    probe and re-rank are bit-identical to batch `ivf_topk(quantize)` —
    stream==batch equality is pinned by tests/test_streaming.py."""
    from etl_acordos_spark.queries.llm import _ivf_oracle

    return _ivf_oracle()


QUERIES: dict[str, QueryDef] = {
    "ext_stream_windows": QueryDef(q_ext_stream_windows, _WINDOWS_ORACLE),
    "ext_stream_dedup": QueryDef(q_ext_stream_dedup, _DEDUP_ORACLE),
    "ext_stream_join": QueryDef(q_ext_stream_join, _STREAM_JOIN_ORACLE),
    "ext_stream_stream_join": QueryDef(
        q_ext_stream_stream_join, _STREAM_STREAM_JOIN_ORACLE
    ),
    "ext_stream_sessions": QueryDef(q_ext_stream_sessions, _SESSIONS_ORACLE),
    "ext_stream_stateful": QueryDef(q_ext_stream_stateful, _STATEFUL_ORACLE),
    "ext_stream_upsert": QueryDef(q_ext_stream_upsert, _STREAM_UPSERT_ORACLE),
    "ext_stream_dedup_index": QueryDef(q_ext_stream_dedup_index, _stream_dedup_index_oracle()),
    "ext_stream_ann_index": QueryDef(q_ext_stream_ann_index, _stream_ann_oracle()),
    "ext_stream_anomaly": QueryDef(q_ext_stream_anomaly, _anomaly_oracle()),
    # additive cells make the streamed sketch equal the batch build, so
    # the batch key's SQL oracle applies verbatim — a full hash oracle
    # on a streaming key (the others above are batch-SQL-of-the-input;
    # this one hash-checks maintained streaming STATE)
    "ext_stream_cms": QueryDef(q_ext_stream_cms, _stream_cms_oracle()),
    "ext_stream_hll": QueryDef(q_ext_stream_hll, _stream_hll_oracle()),
}
