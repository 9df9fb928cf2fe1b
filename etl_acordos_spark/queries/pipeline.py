"""Pipeline/warehouse extension queries (round 2): change-data-capture
diff, data-quality audit, bucketed co-located join, unpivot/melt, and
width-bucket histograms.

These extend the engine's ETL surface beyond SURVEY.md §2's original
inventory — the operations a production lakehouse pipeline runs daily
around the medallion layers the reference hard-codes (ingest-diff before
a merge, DQ gates between layers, bucketed layouts for recurring joins).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_acordos_spark.operators.layout import (
    compact_parquet,
    dataset_file_count,
    read_merged_schema,
    zorder_value,
    zorder_write,
)
from etl_acordos_spark.operators.relational import snapshot_diff
from etl_acordos_spark.queries.base import QueryDef, scratch_dir, t
from etl_acordos_spark.sources.parquet_io import write_bucketed_table

# --------------------------------------------------------------- CDC diff


def q_ext_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff of two order snapshots: yesterday's
    snapshot (keys % 89 == 0 not yet present) vs today's (every 10th
    order re-priced, keys % 97 == 0 purged). The diff must emit exactly
    the insert/delete/update delta — one full-outer join on the key, no
    row-at-a-time compare (reference's only merge is per-row ON
    DUPLICATE KEY UPDATE, tasks/bronze.py:102-121)."""
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    new = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.round(
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
            2,
        ).alias("price"),
    )
    return snapshot_diff(old, new, "o_orderkey", ["price"])


# --------------------------------------------------------------- DQ audit


def q_ext_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of a (deterministically corrupted) staging
    snapshot before it may enter the silver layer: null keys, sign
    violations, duplicate primary keys, and referential orphans — all in
    ONE pass: a single broadcast lookup join plus one hash aggregate.
    The corruption is injected keyed on o_orderkey (identically in the
    oracle) so every check has a non-zero hit count to prove it fires.
    """
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    staged = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 101 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(F.col("o_orderkey") % 113 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    # at-least-once upstream: every 127th order delivered twice
    staged = staged.unionAll(staged.filter(F.col("o_orderkey") % 127 == 0))
    # simulate an incomplete dimension so the orphan check has hits
    valid_cust = customer.filter(F.col("c_custkey") % 7 != 0).select("c_custkey")
    flagged = staged.join(
        F.broadcast(valid_cust),
        staged.o_custkey == valid_cust.c_custkey,
        "left",
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_bad_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "n_dup_orderkey"
        ),
        F.count_if(
            F.col("o_custkey").isNotNull() & F.col("c_custkey").isNull()
        ).alias("n_orphan_custkey"),
    )


# -------------------------------------------------------- bucketed layout


def q_ext_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed table layout: lineitem and orders
    written hash-bucketed by the join key (same bucket count), then
    joined WITHOUT any shuffle exchange — the bucketed scans already
    satisfy the join's distribution requirement.

    This is the 100 TB answer to a recurring fact-fact join: pay the
    bucketing shuffle once at write time, then every downstream join on
    that key is exchange-free forever (tests/test_plan_health.py asserts
    the plan has no Exchange under the join). The merge hint pins
    sort-merge so the demo exercises the bucket alignment rather than
    broadcasting the smaller side at this test scale. Re-running against
    unchanged sources reuses the bucketed layout (source mtime/size
    fingerprint) — the write really is paid once.
    """

    def fp(name: str, key: str) -> str:
        st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
        return f"{sf_dir}:{name}:{key}:8:{st.st_mtime_ns}:{st.st_size}"

    base = scratch_dir()
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    bl = write_bucketed_table(
        li, "bkt_lineitem", "l_orderkey", 8,
        os.path.join(base, "bkt_lineitem"),
        fingerprint=fp("lineitem", "l_orderkey"),
    )
    bo = write_bucketed_table(
        od, "bkt_orders", "o_orderkey", 8,
        os.path.join(base, "bkt_orders"),
        fingerprint=fp("orders", "o_orderkey"),
    )
    return (
        bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_itens"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("receita"),
        )
    )


# ------------------------------------------------------------ reshaping


def q_ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-segment balance metrics → long
    (segment, metric, value) triples. The inverse of ext_pivot; map-only
    after the aggregate — each wide row explodes to one row per value
    column, no shuffle beyond the agg itself."""
    customer = t(spark, sf_dir, "customer")
    wide = customer.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )
    return wide.unpivot(
        ["c_mktsegment"], ["min_bal", "avg_bal", "max_bal"], "metric", "value"
    )


def q_ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of order totals (12.5k-wide buckets,
    top-clamped): one map-side bucket expression + one hash aggregate —
    the profiling primitive behind DQ range checks and skew detection.
    Bucket boundaries are explicit so a 100 TB scan never needs a
    pre-pass for min/max."""
    orders = t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 12500), F.lit(39)).cast(
        "int"
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def q_ext_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling: null count, exact distinct count, and
    min/max (string-normalized) per profiled column — the table audit a
    pipeline runs before trusting a new feed. All columns profile in ONE
    scan (a single multi-aggregate; the distinct counts expand the agg
    map-side, there is no per-column pass). At 100 TB swap the exact
    distincts for approx_count_distinct — same plan shape, sketch-sized
    state."""
    orders = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    aggs = []
    for c in cols:
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------------ data layout


def q_ext_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering: orders written range-partitioned + sorted by
    the bit-interleaved (o_custkey, order-day) Morton value, then a 2-D
    box predicate read back from that layout. Every file owns a
    contiguous z-range — a small rectangle in (custkey, day) space — so
    BOTH min-max stats are tight and the box predicate skips most
    files/row-groups at 100 TB (a linear sort is tight in one dimension
    only; tests/test_scale_paths.py measures the tightening). The oracle
    recomputes the z-value arithmetically — the layout must never change
    the data."""
    orders = t(spark, sf_dir, "orders")
    dia = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    path = zorder_write(
        orders.select(
            "o_orderkey", "o_custkey", dia.alias("dia"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        ),
        "o_custkey",
        "dia",
        os.path.join(scratch_dir(), "orders_zorder"),
        max_records_per_file=2000,
    )
    return (
        spark.read.parquet(path)
        .filter(
            F.col("o_custkey").between(100, 200)
            & F.col("dia").between(9000, 9500)
        )
        .withColumn("zval", zorder_value("o_custkey", "dia"))
    )


def q_ext_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: lineitem deliberately fragmented into 64
    files (the streaming-writer pathology), then rewritten to
    target-size files. Output is the before/after audit (file counts +
    row counts — the rewrite must be lossless). The oracle encodes the
    CONTRACT rather than recomputing the layout: 64 fragmented files in
    (the key's own parameter), exactly one target-size file out at
    verification volume (sf0.01's 4-column lineitem is far below the
    64 MiB target), and SQL-derived row counts on both phases — so a
    lossy rewrite OR a compaction that stops compacting now
    hash-mismatches, strictly stronger than the old rows-only check."""
    base = scratch_dir()
    frag = os.path.join(base, "lineitem_fragmented")
    compacted = os.path.join(base, "lineitem_compacted")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, target_file_bytes=64 * 1024 * 1024)
    rows = [
        (
            phase,
            dataset_file_count(spark, p),
            spark.read.parquet(p).count(),
        )
        for phase, p in (("fragmented", frag), ("compacted", compacted))
    ]
    return spark.createDataFrame(
        rows, "phase string, n_files int, n_rows long"
    )


def q_ext_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: batch 1 written before the
    `o_orderpriority` column existed, batch 2 after; the merged-schema
    read surfaces the old batch's missing column as nulls and the
    aggregate treats them as a first-class group. Append-only ingestion
    must survive schema growth without rewriting history — at 100 TB a
    backfill rewrite is not an option."""
    orders = t(spark, sf_dir, "orders")
    base = os.path.join(scratch_dir(), "orders_evolving")
    old_batch = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    new_batch = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "o_orderpriority",
    )
    old_batch.write.mode("overwrite").parquet(os.path.join(base, "batch=1"))
    new_batch.write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    return (
        read_merged_schema(spark, base)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pedidos"),
            F.round(F.sum("price"), 2).alias("receita"),
        )
    )


def q_ext_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global passage dedup over documents.text: every
    10-word passage is kept only at its first (doc_id, position)
    occurrence corpus-wide; documents are rebuilt from surviving
    passages. See operators/text.py:passage_dedup for the 100 TB
    shuffle shape (digests-only dedup window, text moves once)."""
    from etl_acordos_spark.operators.text import passage_dedup

    return passage_dedup(t(spark, sf_dir, "documents"), "text", "doc_id")


def q_ext_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (constant-memory variant of
    ext_decontaminate, same eval split): eval 4-grams folded into a
    fixed 512 KiB bitset, training docs flagged via vectorized bit
    probes. Runs the md5 hash family so the DuckDB oracle replays the
    ENTIRE filter — gram hashes, the k double-hashed probe positions
    (Kirsch-Mitzenmacher, carved from the gram hash with integer math),
    the inserted-position set, and the all-k-positions-hit membership test
    (a Bloom filter's verdict is a pure function of its hash family,
    so false positives reproduce identically) — round-7 promotion from
    rows-only; the superset + FP-bound pins vs the exact operator stay
    in tests/test_operators.py."""
    from etl_acordos_spark.operators.text import bloom_decontaminate

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bloom_decontaminate(
        train=docs.filter(F.col("doc_id") % 50 != 0),
        eval_docs=docs.filter(F.col("doc_id") % 50 == 0),
        text_col="text",
        id_col="doc_id",
        ngram=4,
        hash_fn="md5",
    )


def _bloom_decontam_oracle(
    ngram: int = 4, m_bits: int = 1 << 22, k_hashes: int = 3
) -> str:
    """Exact DuckDB twin of q_ext_bloom_decontam's md5-family Bloom
    filter: the inserted-position SET stands in for the bitset (bit
    membership ≡ set membership), gram hashes and probe positions use
    the identical md5 hex math, and a train gram "hits" iff ALL k of
    its positions were inserted — reproducing the engine's false
    positives exactly, not just its true hits."""
    gram_hash = "('0x' || substr(md5(gtxt), 1, 15))::BIGINT"
    # Kirsch-Mitzenmacher positions from the gram hash itself (engine
    # twin: operators/text.py:bloom_decontaminate pos_expr) — g is the
    # non-negative 60-bit md5 bigint, so DuckDB's % / // match Spark's
    # pmod / div exactly
    pos = (
        f"(g % {m_bits} + s * (2 * (g // {m_bits}) + 1)) % {m_bits}"
    )
    grams = (
        "SELECT doc_id, list_distinct(CASE WHEN len(tok) >= {n}"
        "   THEN list_transform(range(1, len(tok) - {nm2}),"
        "     i -> array_to_string(tok[i:i+{nm1}], ' '))"
        "   ELSE [array_to_string(tok, ' ')] END) AS gs"
        " FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM {src})"
    ).format(n=ngram, nm2=ngram - 2, nm1=ngram - 1, src="{src}")
    return (
        "WITH ev AS (SELECT * FROM documents"
        "  WHERE doc_id % 50 = 0 AND text IS NOT NULL),"
        " tr AS (SELECT * FROM documents"
        "  WHERE doc_id % 50 <> 0 AND text IS NOT NULL),"
        f" eg AS ({grams.format(src='ev')}),"
        f" tg AS ({grams.format(src='tr')}),"
        f" eh AS (SELECT DISTINCT {gram_hash} AS g"
        "  FROM eg, unnest(gs) AS u(gtxt)),"
        " inserted AS (SELECT DISTINCT"
        f"   {pos} AS p"
        f"  FROM eh, unnest(range({k_hashes})) AS t(s)),"
        f" th AS (SELECT doc_id, {gram_hash} AS g"
        "  FROM tg, unnest(gs) AS u(gtxt)),"
        " probes AS (SELECT doc_id, g, s,"
        f"   {pos} AS p"
        f"  FROM th, unnest(range({k_hashes})) AS t(s)),"
        " gram_hits AS (SELECT doc_id, g,"
        "   bool_and(p IN (SELECT p FROM inserted)) AS hit"
        "  FROM probes GROUP BY doc_id, g)"
        " SELECT doc_id, CAST(count(*) FILTER (hit) AS INT)"
        "   AS n_bloom_hits"
        " FROM gram_hits GROUP BY doc_id HAVING count(*) FILTER (hit) > 0"
    )


def q_ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: docs with doc_id % 5 == 0 play today's
    incoming batch, the rest the already-deduplicated corpus; returns
    the batch docs that are near-duplicates of neither a corpus doc nor
    a lower-id batch doc (MinHash-LSH probe — corpus never self-joins).
    Runs the md5 hash family so the whole probe — both sides' seeded
    band tables, the COMBINED bucket cap, the side-marked candidate
    union, the exact-Jaccard dominance verify — is replayed verbatim by
    the DuckDB oracle (round-7 promotion from rows-only; fold
    equivalence vs the streaming index remains unit-pinned)."""
    from etl_acordos_spark.operators.dedup import incremental_minhash_dedup

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return incremental_minhash_dedup(
        corpus=docs.filter(F.col("doc_id") % 5 != 0),
        batch=docs.filter(F.col("doc_id") % 5 == 0),
        text_col="text",
        id_col="doc_id",
        threshold=0.5,
        hash_fn="md5",
    )


def _dedup_incremental_oracle() -> str:
    """Exact DuckDB twin of q_ext_dedup_incremental
    (operators/dedup.py:dedup_batch_against, md5 family): two unit
    tables (corpus uc / batch ub) through the shared md5 MinHash side
    CTEs, bucket cap on the COMBINED population, batch×corpus plus
    lower-id batch×batch candidates with side markers, unrounded
    Jaccard ≥ 0.5 dominance, anti-joined survivors."""
    from etl_acordos_spark.queries.llm import (
        _minhash_md5_units,
        _minhash_perms_cte,
    )

    return (
        "WITH uc AS (SELECT doc_id AS doc, text AS utext FROM documents"
        "  WHERE doc_id % 5 <> 0 AND text IS NOT NULL),"
        " ub AS (SELECT doc_id AS doc, text AS utext FROM documents"
        "  WHERE doc_id % 5 = 0 AND text IS NOT NULL),"
        + _minhash_perms_cte()
        + ","
        + _minhash_md5_units("c")
        + ","
        + _minhash_md5_units("b")
        + ","
        " ok AS (SELECT band_idx, band_val FROM ("
        "   SELECT band_idx, band_val FROM bandvc"
        "   UNION ALL SELECT band_idx, band_val FROM bandvb)"
        "  GROUP BY 1, 2 HAVING count(*) <= 1000),"
        " ec AS (SELECT b.* FROM bandvc b JOIN ok USING (band_idx, band_val)),"
        " eb AS (SELECT b.* FROM bandvb b JOIN ok USING (band_idx, band_val)),"
        " cand AS ("
        "  SELECT DISTINCT n.doc AS doc_new, o.doc AS doc_old, 'c' AS side"
        "   FROM eb n JOIN ec o ON n.band_idx = o.band_idx"
        "    AND n.band_val = o.band_val"
        "  UNION"
        "  SELECT DISTINCT n.doc AS doc_new, o.doc AS doc_old, 'b' AS side"
        "   FROM eb n JOIN eb o ON n.band_idx = o.band_idx"
        "    AND n.band_val = o.band_val AND o.doc < n.doc),"
        " older AS (SELECT doc, hs, 'c' AS side FROM hsetc"
        "  UNION ALL SELECT doc, hs, 'b' AS side FROM hsetb),"
        " dominated AS (SELECT DISTINCT c.doc_new AS doc"
        "  FROM cand c JOIN hsetb n ON c.doc_new = n.doc"
        "   JOIN older o ON c.doc_old = o.doc AND c.side = o.side"
        "  WHERE CAST(len(list_intersect(n.hs, o.hs)) AS DOUBLE)"
        "    / len(list_distinct(n.hs || o.hs)) >= 0.5)"
        " SELECT b.doc AS doc_id FROM ub b"
        " WHERE NOT EXISTS (SELECT 1 FROM dominated d WHERE d.doc = b.doc)"
    )


def q_ext_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-band quality filter over documents: drop the worst 20%
    and the top 0.5% by heuristic quality score (grid-floored exact
    percentiles broadcast back over the scored scan)."""
    from etl_acordos_spark.operators.text import quality_band_filter

    return quality_band_filter(
        t(spark, sf_dir, "documents"), "text", "doc_id", lo=0.2, hi=0.995
    )


def _quality_filter_oracle() -> str:
    from etl_acordos_spark.queries import llm

    quality_sql = llm._ORACLES["ext_quality_score"]
    grid = "floor(quantile_cont(quality, {p}) * 10000.0 + 1e-6) / 10000.0"
    return (
        f"WITH s AS ({quality_sql}),"
        f" th AS (SELECT {grid.format(p=0.2)} AS qlo,"
        f"  {grid.format(p=0.995)} AS qhi FROM s)"
        " SELECT doc_id, quality FROM s, th"
        " WHERE quality >= qlo AND quality <= qhi"
    )


def q_ext_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: per-doc deterministic gradient PNGs
    (stdlib codec) attached as binary payloads, then decoded back inside
    Arrow-batched mapInPandas into integer-exact features — the first
    multimodal key with a full value-hash oracle (the gradient's pixel
    sum has a closed form the SQL oracle replays)."""
    from etl_acordos_spark.operators.multimodal import (
        attach_image_payload,
        extract_image_features,
    )

    docs = t(spark, sf_dir, "documents")
    return extract_image_features(attach_image_payload(docs, "doc_id"))


def q_ext_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: per-doc RIFF/WAVE payloads (16-bit
    PCM sawtooth, pure struct-packing) container-parsed and decoded to
    integer-exact features inside mapInPandas; the waveform's closed
    form lets the SQL oracle replay Σ|s| and peak bit-for-bit."""
    from etl_acordos_spark.operators.multimodal import (
        attach_audio_payload,
        extract_audio_features,
    )

    docs = t(spark, sf_dir, "documents")
    return extract_audio_features(attach_audio_payload(docs, "doc_id"))


def q_ext_mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup end-to-end
    (operators/multimodal.py:image_ahash_dedup): REAL PNG decode →
    8×8 NN-downsample → average-hash → first-claim per hash. The
    gradient fixtures' pixel closed form lets the SQL oracle replay
    the entire hash (sampled coords, floor mean, bit pack) without
    touching a byte of PNG."""
    from etl_acordos_spark.operators.multimodal import (
        attach_image_payload,
        image_ahash_dedup,
    )

    docs = t(spark, sf_dir, "documents")
    return image_ahash_dedup(attach_image_payload(docs, "doc_id"))


def q_ext_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per-language head/middle/tail
    terciles of unigram-LM surprisal (grid-floored exact percentiles,
    broadcast back over the scored scan)."""
    from etl_acordos_spark.operators.text import ppl_buckets

    return ppl_buckets(
        t(spark, sf_dir, "documents"), "text", "lang", "doc_id"
    )


def _ppl_buckets_oracle() -> str:
    from etl_acordos_spark.queries import llm

    lm_sql = llm._ORACLES["ext_lm_score"]
    grid = (
        "floor(quantile_cont(bits_per_token, {p}) * 10000.0 + 1e-6)"
        " / 10000.0"
    )
    return (
        f"WITH s AS ({lm_sql}),"
        " j AS (SELECT s.doc_id, d.lang, s.bits_per_token"
        "  FROM s JOIN documents d USING (doc_id)),"
        f" th AS (SELECT lang, {grid.format(p='CAST(1 AS DOUBLE)/3')} AS p33,"
        f"  {grid.format(p='CAST(2 AS DOUBLE)/3')} AS p67"
        "  FROM j GROUP BY lang)"
        " SELECT j.doc_id, j.lang, j.bits_per_token,"
        "  CASE WHEN bits_per_token <= p33 THEN 'head'"
        "       WHEN bits_per_token <= p67 THEN 'middle'"
        "       ELSE 'tail' END AS bucket"
        " FROM j JOIN th USING (lang)"
    )


def q_ext_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet in one pass: corpus size, source/language
    breadth, token volume, exact-dup ratio, and mean heuristic quality,
    melted to (metric, value) long form — the summary card a training
    run records next to every corpus snapshot.

    Two aggregates (raw corpus scan + quality-scored scan) joined as
    1×1 rows, then unpivoted; averages are derived from EXACT integer
    sums (token counts, 4-dp-quality grid ticks) with the grid-floor
    rounding trick, so the oracle replays them bit-for-bit."""
    from etl_acordos_spark.operators.text import quality_scores

    docs = t(spark, sf_dir, "documents")
    tok = F.size(F.split(F.col("text"), " "))
    base = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.sum(tok).cast("double").alias("total_tokens"),
        (
            F.floor(
                F.try_divide(F.sum(tok), F.count("*").cast("double"))
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("avg_doc_tokens"),
        (
            F.floor(
                F.try_divide(
                    F.countDistinct("text"), F.count("*").cast("double")
                )
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("uniq_text_ratio"),
    )
    # try_divide: an EMPTY corpus card reports NULL averages (count 0)
    # instead of an ANSI DIVIDE_BY_ZERO — matches the DuckDB oracle's
    # NULL/0 result on the same input (r10 degenerate-input sweep)
    q = quality_scores(docs, "text", "doc_id").agg(
        (
            F.floor(
                F.try_divide(
                    F.sum(
                        F.round(F.col("quality") * 10000.0, 0).cast("long")
                    ),
                    F.count("*") * 10000.0,
                )
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("avg_quality")
    )
    card = base.crossJoin(F.broadcast(q))
    return card.unpivot(
        ids=[],
        values=[
            "n_docs", "n_sources", "n_langs", "total_tokens",
            "avg_doc_tokens", "uniq_text_ratio", "avg_quality",
        ],
        variableColumnName="metric",
        valueColumnName="value",
    )


def _dataset_card_oracle() -> str:
    from etl_acordos_spark.queries import llm

    quality_sql = llm._ORACLES["ext_quality_score"]
    return (
        f"WITH s AS ({quality_sql}),"
        " base AS (SELECT"
        "  CAST(count(*) AS DOUBLE) AS n_docs,"
        "  CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,"
        "  CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,"
        "  CAST(sum(len(string_split(text, ' '))) AS DOUBLE)"
        "   AS total_tokens,"
        "  floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)"
        "   / nullif(count(*), 0) * 10000.0 + 0.5) / 10000.0"
        "   AS avg_doc_tokens,"
        "  floor(CAST(count(DISTINCT text) AS DOUBLE)"
        "   / nullif(count(*), 0)"
        "   * 10000.0 + 0.5) / 10000.0 AS uniq_text_ratio"
        " FROM documents),"
        " q AS (SELECT floor("
        "   CAST(sum(CAST(round(quality * 10000.0, 0) AS BIGINT))"
        "    AS DOUBLE) / nullif(count(*) * 10000.0, 0)"
        "   * 10000.0 + 0.5)"
        "  / 10000.0 AS avg_quality FROM s)"
        " SELECT metric, value FROM ("
        "  SELECT 'n_docs' AS metric, n_docs AS value FROM base"
        "  UNION ALL SELECT 'n_sources', n_sources FROM base"
        "  UNION ALL SELECT 'n_langs', n_langs FROM base"
        "  UNION ALL SELECT 'total_tokens', total_tokens FROM base"
        "  UNION ALL SELECT 'avg_doc_tokens', avg_doc_tokens FROM base"
        "  UNION ALL SELECT 'uniq_text_ratio', uniq_text_ratio FROM base"
        "  UNION ALL SELECT 'avg_quality', avg_quality FROM q)"
    )


def q_ext_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training export
    (operators/layout.py:shuffle_shard): shard = Knuth-hash bucket of
    doc_id mod 8, pos = rank of the uncorrelated xxprime-hash within
    the shard. One exchange on shard + in-partition sort; the oracle
    replays both hash families with the shared DECIMAL(38,0) twins."""
    from etl_acordos_spark.operators.layout import shuffle_shard

    docs = t(spark, sf_dir, "documents")
    return shuffle_shard(docs, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos"
    )


def _shuffle_shard_oracle() -> str:
    from etl_acordos_spark.functions.hashing import XX_PRIME, sql_hash32

    # top-bits (Fibonacci) range map, exact in DOUBLE — mirrors
    # operators/layout.py:shuffle_shard, see its low-bits caveat
    shard = (
        "CAST(floor(CAST("
        + sql_hash32("doc_id")
        + " AS DOUBLE) * 8 / 4294967296) AS INTEGER)"
    )
    order = sql_hash32("doc_id", XX_PRIME)
    return (
        f"SELECT doc_id, {shard} AS shard,"
        " CAST(row_number() OVER ("
        f"  PARTITION BY {shard} ORDER BY {order} ASC, doc_id ASC"
        " ) AS BIGINT) AS pos"
        " FROM documents"
    )


# ---------------------------------------------------------------- oracles

_ORACLES: dict[str, str | None] = {
    "ext_shuffle_shard": _shuffle_shard_oracle(),
    "ext_dataset_card": _dataset_card_oracle(),
    "ext_quality_filter": _quality_filter_oracle(),
    "ext_ppl_buckets": _ppl_buckets_oracle(),
    "ext_mm_audio": (
        "WITH s AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),"
        " v AS (SELECT doc_id, n,"
        "   ((doc_id + i.v) * 523) % 65536 - 32768 AS samp"
        "  FROM s, LATERAL (SELECT unnest(generate_series(0,"
        "   CAST(n AS BIGINT) - 1)) AS v) i)"
        " SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,"
        "  CAST(n AS INTEGER) AS n_samples,"
        "  CAST(sum(abs(samp)) AS BIGINT) AS sum_abs,"
        "  CAST(max(abs(samp)) AS INTEGER) AS peak"
        " FROM v GROUP BY doc_id, n"
    ),
    "ext_mm_decode": (
        "WITH dims AS (SELECT doc_id,"
        "  CAST(8 + doc_id % 9 AS INTEGER) AS width,"
        "  CAST(8 + doc_id % 7 AS INTEGER) AS height FROM documents),"
        " px AS (SELECT doc_id, width, height,"
        "   (x.v + y.v + doc_id) % 256 AS p"
        "  FROM dims,"
        "  LATERAL (SELECT unnest(generate_series(0,"
        "   CAST(width AS BIGINT) - 1)) AS v) x,"
        "  LATERAL (SELECT unnest(generate_series(0,"
        "   CAST(height AS BIGINT) - 1)) AS v) y)"
        " SELECT doc_id, width, height, 1 AS channels,"
        "  CAST(sum(p) AS BIGINT) AS sum_px"
        " FROM px GROUP BY doc_id, width, height"
    ),
    # replay of image_ahash_dedup's whole pipeline in closed form:
    # the fixture pixel at (x, y) of doc d is (x + y + d) % 256 with
    # w = 8 + d%9, h = 8 + d%7; NN-sample index = (k*dim)//8; mean is
    # floor-divided; bit i (row-major, i = y*8 + x) packs into two
    # 32-bit halves (list_sum CAST to BIGINT — HUGEINT would not
    # pandas-materialize equal)
    "ext_mm_phash": (
        "WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,"
        "   8 + doc_id % 7 AS h FROM documents),"
        " px AS (SELECT doc_id, list_transform(generate_series(0, 63),"
        "   i -> (((i % 8) * w) // 8 + ((i // 8) * h) // 8 + doc_id)"
        "        % 256) AS p"
        "  FROM dims),"
        " m AS (SELECT doc_id, p, list_sum(p) // 64 AS mean FROM px),"
        " b AS (SELECT doc_id, list_transform(generate_series(0, 63),"
        "   i -> CASE WHEN p[i + 1] > mean THEN 1::BIGINT"
        "        ELSE 0::BIGINT END) AS bits FROM m),"
        " packed AS (SELECT doc_id,"
        "   CAST(list_sum(list_transform(generate_series(0, 31),"
        "    i -> bits[i + 33] * (1::BIGINT << i))) AS BIGINT)"
        "     AS phash_hi,"
        "   CAST(list_sum(list_transform(generate_series(0, 31),"
        "    i -> bits[i + 1] * (1::BIGINT << i))) AS BIGINT)"
        "     AS phash_lo"
        "  FROM b),"
        " v AS (SELECT doc_id, phash_hi, phash_lo,"
        "   min(doc_id) OVER (PARTITION BY phash_hi, phash_lo)"
        "    AS first_id FROM packed)"
        " SELECT doc_id, phash_hi, phash_lo,"
        "  doc_id <> first_id AS dup FROM v"
    ),
    "ext_passage_dedup": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words"
        "  FROM documents),"
        " c AS (SELECT doc_id, i.pidx AS pidx,"
        "   array_to_string(list_slice(words, i.pidx*10 + 1,"
        "    i.pidx*10 + 10), ' ') AS passage"
        "  FROM w, LATERAL (SELECT unnest(generate_series(0,"
        "   CAST((len(words)+9)//10 AS BIGINT) - 1)) AS pidx) i),"
        " r AS (SELECT doc_id, pidx, passage,"
        "   row_number() OVER (PARTITION BY passage"
        "    ORDER BY doc_id, pidx) AS rn FROM c)"
        " SELECT doc_id, string_agg(passage, ' ' ORDER BY pidx) AS text,"
        "  count(*) AS n_passages"
        " FROM r WHERE rn = 1 GROUP BY doc_id"
    ),
    "ext_cdc_diff": (
        "WITH old AS (SELECT o_orderkey, round(o_totalprice, 2) AS price"
        "  FROM orders WHERE o_orderkey % 89 <> 0),"
        " new AS (SELECT o_orderkey,"
        "  round(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2"
        "        ELSE o_totalprice END, 2) AS price"
        "  FROM orders WHERE o_orderkey % 97 <> 0)"
        " SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,"
        "  o.price AS old_price, n.price AS new_price,"
        "  CASE WHEN o.o_orderkey IS NULL THEN 'insert'"
        "       WHEN n.o_orderkey IS NULL THEN 'delete'"
        "       ELSE 'update' END AS change"
        " FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey"
        " WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL"
        "    OR o.price <> n.price"
    ),
    "ext_dq_checks": (
        "WITH staged0 AS (SELECT o_orderkey,"
        "  CASE WHEN o_orderkey % 101 = 0 THEN NULL ELSE o_custkey END"
        "    AS o_custkey,"
        "  CASE WHEN o_orderkey % 113 = 0 THEN -o_totalprice"
        "       ELSE o_totalprice END AS o_totalprice"
        "  FROM orders),"
        " staged AS (SELECT * FROM staged0 UNION ALL"
        "  SELECT * FROM staged0 WHERE o_orderkey % 127 = 0),"
        " valid AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0)"
        " SELECT count(*) AS n_rows,"
        "  count(*) FILTER (WHERE o_custkey IS NULL) AS n_null_custkey,"
        "  count(*) FILTER (WHERE o_totalprice <= 0) AS n_bad_price,"
        "  count(*) - count(DISTINCT o_orderkey) AS n_dup_orderkey,"
        "  count(*) FILTER (WHERE o_custkey IS NOT NULL"
        "    AND c_custkey IS NULL) AS n_orphan_custkey"
        " FROM staged LEFT JOIN valid ON o_custkey = c_custkey"
    ),
    "ext_bucketed_join": (
        "SELECT o_orderpriority, count(*) AS n_itens,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS receita"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " GROUP BY o_orderpriority"
    ),
    "ext_unpivot": (
        "WITH w AS (SELECT c_mktsegment,"
        "  round(min(c_acctbal), 2) AS min_bal,"
        "  round(avg(c_acctbal), 2) AS avg_bal,"
        "  round(max(c_acctbal), 2) AS max_bal"
        "  FROM customer GROUP BY c_mktsegment)"
        " SELECT c_mktsegment, 'min_bal' AS metric, min_bal AS value FROM w"
        " UNION ALL"
        " SELECT c_mktsegment, 'avg_bal', avg_bal FROM w"
        " UNION ALL"
        " SELECT c_mktsegment, 'max_bal', max_bal FROM w"
    ),
    "ext_histogram": (
        "SELECT CAST(least(floor(o_totalprice / 12500), 39) AS INTEGER)"
        "   AS bucket,"
        " count(*) AS n,"
        " round(min(o_totalprice), 2) AS lo,"
        " round(max(o_totalprice), 2) AS hi"
        " FROM orders GROUP BY 1"
    ),
    "ext_profile": (
        " UNION ALL ".join(
            f"SELECT '{c}' AS col_name,"
            f" count(*) FILTER (WHERE {c} IS NULL) AS n_nulls,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" CAST(min({c}) AS VARCHAR) AS min_s,"
            f" CAST(max({c}) AS VARCHAR) AS max_s"
            " FROM orders"
            for c in (
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                "o_orderstatus",
            )
        )
    ),
    "ext_zorder": (
        "WITH o AS (SELECT o_orderkey, o_custkey,"
        "  CAST(date_diff('day', DATE '1970-01-01',"
        "    CAST(o_orderdate AS DATE)) AS INTEGER) AS dia,"
        "  round(o_totalprice, 2) AS o_totalprice"
        "  FROM orders),"
        " z AS (SELECT *,"
        "  least(greatest(o_custkey, 0), 65535) AS a,"
        "  least(greatest(dia, 0), 65535) AS b FROM o)"
        " SELECT o_orderkey, o_custkey, dia, o_totalprice,"
        "  CAST(list_sum(list_transform(range(0, 16), i ->"
        "   (((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))))"
        "   AS BIGINT) AS zval"
        " FROM z"
        " WHERE o_custkey BETWEEN 100 AND 200 AND dia BETWEEN 9000 AND 9500"
    ),
    "ext_compaction": (
        "SELECT * FROM ("
        " SELECT 'fragmented' AS phase, 64 AS n_files,"
        "  CAST(count(*) AS BIGINT) AS n_rows FROM lineitem"
        " UNION ALL"
        " SELECT 'compacted', 1, CAST(count(*) AS BIGINT) FROM lineitem)"
    ),
    "ext_schema_evolution": (
        "WITH m AS ("
        " SELECT o_orderkey, round(o_totalprice, 2) AS price,"
        "  CAST(NULL AS VARCHAR) AS o_orderpriority"
        " FROM orders WHERE o_orderkey % 2 = 0"
        " UNION ALL"
        " SELECT o_orderkey, round(o_totalprice, 2), o_orderpriority"
        " FROM orders WHERE o_orderkey % 2 = 1)"
        " SELECT o_orderpriority, count(*) AS n_pedidos,"
        "  round(sum(price), 2) AS receita"
        " FROM m GROUP BY o_orderpriority"
    ),
}

QUERIES: dict[str, QueryDef] = {
    "ext_cdc_diff": QueryDef(q_ext_cdc_diff, _ORACLES["ext_cdc_diff"]),
    "ext_dq_checks": QueryDef(q_ext_dq_checks, _ORACLES["ext_dq_checks"]),
    "ext_bucketed_join": QueryDef(
        q_ext_bucketed_join, _ORACLES["ext_bucketed_join"]
    ),
    "ext_unpivot": QueryDef(q_ext_unpivot, _ORACLES["ext_unpivot"]),
    "ext_histogram": QueryDef(q_ext_histogram, _ORACLES["ext_histogram"]),
    "ext_profile": QueryDef(q_ext_profile, _ORACLES["ext_profile"]),
    "ext_zorder": QueryDef(q_ext_zorder, _ORACLES["ext_zorder"]),
    "ext_compaction": QueryDef(q_ext_compaction, _ORACLES["ext_compaction"]),
    "ext_schema_evolution": QueryDef(
        q_ext_schema_evolution, _ORACLES["ext_schema_evolution"]
    ),
    "ext_passage_dedup": QueryDef(
        q_ext_passage_dedup, _ORACLES["ext_passage_dedup"]
    ),
    "ext_bloom_decontam": QueryDef(
        q_ext_bloom_decontam, _bloom_decontam_oracle()
    ),
    "ext_dedup_incremental": QueryDef(
        q_ext_dedup_incremental, _dedup_incremental_oracle()
    ),
    "ext_quality_filter": QueryDef(
        q_ext_quality_filter, _ORACLES["ext_quality_filter"]
    ),
    "ext_mm_decode": QueryDef(q_ext_mm_decode, _ORACLES["ext_mm_decode"]),
    "ext_mm_phash": QueryDef(q_ext_mm_phash, _ORACLES["ext_mm_phash"]),
    "ext_mm_audio": QueryDef(q_ext_mm_audio, _ORACLES["ext_mm_audio"]),
    "ext_ppl_buckets": QueryDef(
        q_ext_ppl_buckets, _ORACLES["ext_ppl_buckets"]
    ),
    "ext_shuffle_shard": QueryDef(
        q_ext_shuffle_shard, _ORACLES["ext_shuffle_shard"]
    ),
    "ext_dataset_card": QueryDef(
        q_ext_dataset_card, _ORACLES["ext_dataset_card"]
    ),
}
