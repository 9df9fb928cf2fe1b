"""Relational extension queries (SURVEY.md §2.6 gap map).

The reference has no joins, aggregations, windows, sorts, set ops, or
JSON functions — these extend the engine to the full star-schema query
surface, built Spark-first:

  - dimension joins broadcast (a 25-row `nation` never shuffles a 100 TB
    `lineitem`); the one fact-fact join (lineitem⋈orders) shuffles on the
    join key and AQE picks/splits the physical strategy;
  - aggregates are partial+final hash aggregates (map-side combine free);
  - top-k per group is a windowed row_number inside hash-partitioned
    groups — no global sort at any scale;
  - monetary aggregates are rounded in BOTH engines so the oracle hash
    compares stable digits, not reassociation noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_acordos_spark.functions.hashing import sql_hash32
from etl_acordos_spark.operators.relational import (
    asof_join,
    merge_upsert,
    range_join_binned,
    salted_join,
    scd2_history,
    star_join,
    top_k_per_group,
)
from etl_acordos_spark.queries.base import QueryDef, read_events, t

# ------------------------------------------------------------------ joins


def q_ext_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join: lineitem⋈orders⋈customer⋈nation⋈region →
    revenue by region and year. Dims broadcast; the lineitem⋈orders join
    is the only shuffle besides the final aggregate."""
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    joined = star_join(
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey),
        [
            (customer, F.col("o_custkey") == F.col("c_custkey")),
            (nation, F.col("c_nationkey") == F.col("n_nationkey")),
            (region, F.col("n_regionkey") == F.col("r_regionkey")),
        ],
    )
    return (
        joined.groupBy(F.col("r_name").alias("regiao"), F.year("o_orderdate").alias("ano"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("receita"),
            F.count(F.lit(1)).alias("n_itens"),
        )
    )


# -------------------------------------------------------------- aggregates


def q_ext_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure hash aggregation (TPC-H Q1 shape) over lineitem."""
    lineitem = t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_ext_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (region → order priority)."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = star_join(
        orders,
        [
            (customer, F.col("o_custkey") == F.col("c_custkey")),
            (nation, F.col("c_nationkey") == F.col("n_nationkey")),
            (region, F.col("n_regionkey") == F.col("r_regionkey")),
        ],
    )
    return joined.rollup(
        F.col("r_name").alias("regiao"), F.col("o_orderpriority").alias("prioridade")
    ).agg(
        F.count(F.lit(1)).alias("n_pedidos"),
        F.round(F.sum("o_totalprice"), 2).alias("receita"),
    )


def q_ext_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins: per-nation counts of customers
    with and without orders. Semi/anti never materialize right-side
    columns — the probe side streams through a broadcast/hash lookup of
    DISTINCT keys, so the orders table contributes only its key set."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    on = customer.c_custkey == orders.o_custkey
    active = (
        customer.join(orders, on, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    inactive = (
        customer.join(orders, on, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )
    return (
        active.join(inactive, "c_nationkey", "full")
        .select(
            "c_nationkey",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
        )
    )


def q_ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-side MERGE (reference tasks/bronze.py:102-121 row-at-a-time
    ON DUPLICATE KEY UPDATE → distributed latest-per-key snapshot):
    every 10th order arrives re-priced as version 2; the merge must keep
    exactly the updated rows for those keys and originals elsewhere."""
    orders = t(spark, sf_dir, "orders")
    existing = orders.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    return merge_upsert(existing, updates, "o_orderkey", "version")


def q_ext_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history: per-customer yearly order-status snapshots
    collapsed into validity intervals (valid_from/valid_to/is_current)."""
    orders = t(spark, sf_dir, "orders")
    snapshots = (
        orders.groupBy(
            F.col("o_custkey").alias("k"),
            F.year("o_orderdate").alias("v"),
        )
        .agg(F.max("o_orderstatus").alias("status"))
    )
    return scd2_history(snapshots, "k", "v", ["status"])


def q_ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join (lineitem⋈supplier): fact rows salted
    into 8 sub-keys, dim exploded ×8 — result identical to the plain
    join (the oracle), no task ever owns a whole hot key."""
    lineitem = t(spark, sf_dir, "lineitem")
    supplier = t(spark, sf_dir, "supplier")
    dim = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(lineitem, dim, "l_suppkey", salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("receita"),
            F.count(F.lit(1)).alias("n_itens"),
        )
    )


def q_ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS via the SQL surface (rollup/cube cover
    the hierarchical/full lattices; this is the general form — two
    independent one-column sets plus the grand total, one pass)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority,"
        " count(*) AS n_pedidos, round(sum(o_totalprice), 2) AS receita"
        " FROM orders_v"
        " GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"
    )


def q_ext_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    the gap since the user's previous event is ≥ 30 min. Two windows +
    one aggregate, all hash-partitioned by user — the batch mirror of
    ext_stream_sessions (same oracle shape)."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_min = F.lag("ts").over(w).isNull() | (
        F.col("ts") - F.lag("ts").over(w) >= F.expr("INTERVAL 30 MINUTES")
    )
    return (
        ev.withColumn("new_sess", gap_min.cast("int"))
        .withColumn(
            "sess_no",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("sess_no")
    )


def q_ext_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split of the document corpus by
    multiplicative key hash — reproducible across runs, engines, and
    cluster layouts (no rand()); a production pipeline swaps the
    portable demo hash for xxhash64. Map-only: splits at 100 TB cost
    one scan, no shuffle."""
    from etl_acordos_spark.functions.hashing import hash32

    docs = t(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id")) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < 90, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def q_ext_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SQL surface): orders 1.5× above their
    customer's average order value. Catalyst decorrelates this into an
    aggregate + join — no per-row subquery execution ever happens."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS preco"
        " FROM orders_v o"
        " WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)"
        "   FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)"
    )


def q_ext_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function medley per market segment: rank, dense_rank,
    ntile quartiles, and lag — one window spec, one shuffle, local sort
    within each hash-partitioned segment."""
    customer = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("saldo"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartil"),
        F.round(F.lag("c_acctbal").over(w), 2).alias("saldo_anterior"),
    )


def q_ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (the exact
    counterpart of ext_approx's sketches; both engines use the same
    continuous-quantile definition)."""
    lineitem = t(spark, sf_dir, "lineitem")
    # one percentile(..., array(...)) call: the per-group value buffer is
    # built and sorted ONCE for all four quantiles, not four times
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))"
            ).alias("ps"),
            F.round(F.avg("l_extendedprice"), 4).alias("media"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p25"),
            F.round(F.col("ps")[1], 4).alias("p50"),
            F.round(F.col("ps")[2], 4).alias("p75"),
            F.round(F.col("ps")[3], 4).alias("p95"),
            "media",
        )
    )


def q_ext_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per market segment: exact distinct count,
    min/max/stddev. (Sketch-based approx_count_distinct is demonstrated
    in ext_approx under an in-plan error-contract oracle.)"""
    customer = t(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
    )


def q_ext_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct + percentile_approx) with
    the error CONTRACT in the output — the chk_exists/flow_retry
    contract-oracle recipe applied to the engine-internal sketches.
    Each estimate is checked in-plan against the exact value on the
    same data: approx_count_distinct at the default rsd=0.05 must land
    within 3·rsd (15%) of exact; percentile_approx at the default
    accuracy=10000 must place its estimate within ±1e-3 rank fraction
    of the target (10× the ε=1/accuracy guarantee — the bound the old
    unit test enforced; measured deviation ≤ 2e-4 at sf0.001–0.1). The
    DuckDB oracle states the exact counts
    + TRUE flags, so a sketch that breaks its documented bound
    hash-mismatches instead of passing a rows-only check. Estimate
    VALUES stay engine-internal by design — the closed-form twins
    (ext_hll_md5, ext_quantile_sketch) carry bit-exact verification.

    The quantile sketch is computed ONCE (single percentile_approx
    buffer); the rank probe is one extra scan joined to the 1-row
    estimate frame (broadcast nested loop of 1 row — the repo's
    standard stats-join shape). The sketch aggregates and the exact
    distinct counts run as SEPARATE 1-row jobs cross-joined together:
    mixing two DISTINCT columns with imperative sketch buffers in one
    aggregate forces the multi-distinct Expand (3× the rows) through
    the object-buffer aggregation path — measured 4.4 s vs 1.0 s split
    at sf0.1."""
    lineitem = t(spark, sf_dir, "lineitem")
    sketches = lineitem.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99]).alias("pq"),
    )
    exacts = lineitem.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    est = sketches.crossJoin(F.broadcast(exacts))
    # every estimate/exact column rides the probe scan once via
    # first() — threading the 1-row est through the aggregate keeps
    # each sub-aggregate computed exactly once (a second broadcast of
    # `sketches` would recompute the whole sketch job). coalesce: on an
    # EMPTY table first()/avg() return NULL while the contract answers
    # are fully determined (counts 0, rank checks vacuously true —
    # exactly what the oracle states)
    probe = lineitem.select("l_extendedprice").crossJoin(F.broadcast(est))
    fracs = probe.agg(
        F.first("exact_orders").alias("exact_orders"),
        F.first("exact_parts").alias("exact_parts"),
        F.first("approx_orders").alias("approx_orders"),
        F.first("approx_parts").alias("approx_parts"),
        F.avg((F.col("l_extendedprice") <= F.col("pq")[0]).cast("double")).alias("f50"),
        F.avg((F.col("l_extendedprice") <= F.col("pq")[1]).cast("double")).alias("f95"),
        F.avg((F.col("l_extendedprice") <= F.col("pq")[2]).cast("double")).alias("f99"),
    )
    return fracs.select(
        F.coalesce(F.col("exact_orders"), F.lit(0)).alias("exact_orders"),
        F.coalesce(F.col("exact_parts"), F.lit(0)).alias("exact_parts"),
        F.coalesce(
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.15 * F.col("exact_orders"),
            F.lit(True),
        ).alias("orders_ok"),
        F.coalesce(
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts"),
            F.lit(True),
        ).alias("parts_ok"),
        # NEAR-CONTINUITY ASSUMPTION (ADVICE r9 #2): percentile_approx
        # bounds RANK error, not the tie mass at the returned value —
        # the `<=`-fraction check below is only guaranteed within the
        # 1e-3 bound when values are near-continuous (ties at the
        # estimate carry negligible probability mass). l_extendedprice
        # is a ~900k-distinct-value price column at sf0.01+, so the
        # assumption holds for the verified fixture; a heavy-tie column
        # would need the half-open bracket (count of strictly-less vs
        # <= rows brackets the target) instead.
        F.coalesce(F.abs(F.col("f50") - F.lit(0.50)) <= 0.001, F.lit(True)).alias("p50_ok"),
        F.coalesce(F.abs(F.col("f95") - F.lit(0.95)) <= 0.001, F.lit(True)).alias("p95_ok"),
        F.coalesce(F.abs(F.col("f99") - F.lit(0.99)) <= 0.001, F.lit(True)).alias("p99_ok"),
    )


def q_ext_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Datasketches HLL): build ONE
    sketch per (year, month) slice of orders — the pre-aggregated
    sketch table a 100 TB warehouse stores next to its rollups — then
    answer per-year and grand-total distinct-customer counts purely by
    MERGING sketches (`hll_union_agg` under a rollup), never
    re-scanning the fact table. That merge property is what
    `approx_count_distinct` (a per-query sketch, ext_approx) cannot
    give you: stored sketches make every future distinct query over any
    slice combination O(sketches), not O(facts). Sketch estimate VALUES
    are engine-specific by design, so the output carries the error
    CONTRACT instead (the chk_exists/flow_retry recipe): every merged
    estimate is compared in-plan against the exact distinct count for
    its slice and must land within 3·rsd (5% at the default
    lgConfigK=12, rsd≈1.63%; measured max 1.8% at sf0.1). The DuckDB
    oracle states the exact rollup + TRUE flags, so a sketch or a
    broken union hash-mismatches. Merge-consistency vs the direct
    whole-table sketch stays unit-tested (union promotes sparse-mode
    sketches, so exact equality does not hold).

    PRECONDITION: non-empty orders. Spark's Expand-based rollup emits
    ZERO rows on empty input while SQL ROLLUP emits the grand-total
    row (verified empirically on both engines) — an engine-semantics
    divergence this contract inherits rather than papering over with
    a synthetic total row; every shipped fixture is non-empty."""
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    # grouping() rides along on both sides: with NULL order dates a
    # NULL-year DATA group and the rollup grand-total row would both
    # carry ano=NULL, and a bare null-safe join would cross-match them
    # (fan-out + sketches checked against the wrong exact counts)
    merged = monthly.rollup("ano").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_clientes"),
        F.grouping("ano").alias("gid"),
    )
    exact = (
        orders.select(F.year("o_orderdate").alias("ano"), "o_custkey")
        .rollup("ano")  # grouping() can't see through an inline alias
        .agg(
            F.countDistinct("o_custkey").alias("exact_clientes"),
            F.grouping("ano").alias("gid_ex"),
        )
        .withColumnRenamed("ano", "ano_ex")
    )
    return (
        merged.join(
            F.broadcast(exact),
            merged["ano"].eqNullSafe(F.col("ano_ex"))
            & (F.col("gid") == F.col("gid_ex")),
        )
        .select(
            "ano",
            "exact_clientes",
            (
                F.abs(F.col("approx_clientes") - F.col("exact_clientes"))
                <= 0.05 * F.col("exact_clientes")
            ).alias("hll_ok"),
        )
        .orderBy(F.col("ano").asc_nulls_last())
    )


def q_ext_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch with a CLOSED FORM both engines
    share (operators/relational.py:hll_md5_registers/_estimate) — the
    hash-oracle-able companion to ext_hll_sketch's native Datasketches
    demo: per-(year, month) HLL registers over md5(o_custkey), then
    per-year and grand-total distinct-customer estimates computed
    purely by MERGING registers (max per bucket) — never re-scanning
    orders. Register sums are exact DECIMAL integers; the single float
    division (and the small-range ln correction) is grid-floored, so
    the DuckDB oracle replays the whole sketch bit-for-bit. Accuracy
    vs exact is ~0.1–1.7% at m=4096 (unit-tested bound)."""
    from etl_acordos_spark.operators.relational import (
        hll_md5_registers,
        hll_md5_year_rollup,
    )

    orders = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
        "o_custkey",
    )
    regs = hll_md5_registers(orders, ["ano", "mes"], "o_custkey")
    return hll_md5_year_rollup(regs)


def _hll_md5_oracle() -> str:
    """Exact DuckDB twin of q_ext_hll_md5 — identical bucket/rank hex
    math, exact DECIMAL register sums, same grid-floored estimator."""
    from etl_acordos_spark.operators.relational import (
        HLL_B_HEX,
        HLL_C,
        HLL_M,
        HLL_P53,
        HLL_RANK_HEX,
    )

    rank = (
        f"CASE WHEN rh = repeat('0', {HLL_RANK_HEX}) THEN 53"
        f" ELSE 4 * ({HLL_RANK_HEX} - length(fd0))"
        "  + CASE WHEN substr(fd0, 1, 1) = '1' THEN 3"
        "         WHEN substr(fd0, 1, 1) IN ('2','3') THEN 2"
        "         WHEN substr(fd0, 1, 1) IN ('4','5','6','7') THEN 1"
        "         ELSE 0 END + 1 END"
    )
    raw = f"{HLL_C} / (CAST(s AS DOUBLE) + ({HLL_M} - nb) * {HLL_P53})"
    est = (
        f"floor(CASE WHEN {raw} <= 2.5 * {HLL_M} AND nb < {HLL_M}"
        f" THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - nb AS DOUBLE))"
        f" ELSE {raw} END * 10000 + 0.5) / 10000"
    )
    return (
        # NULL custkeys dropped in lockstep with hll_md5_registers
        # (COUNT DISTINCT semantics: NULL is not an element)
        "WITH h AS (SELECT CAST(year(o_orderdate) AS INT) AS ano,"
        "   month(o_orderdate) AS mes,"
        "   md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders"
        "  WHERE o_custkey IS NOT NULL),"
        " f AS (SELECT ano, mes,"
        f"   ('0x' || substr(h, 1, {HLL_B_HEX}))::INT AS bucket,"
        f"   substr(h, {HLL_B_HEX + 1}, {HLL_RANK_HEX}) AS rh FROM h),"
        " g AS (SELECT ano, mes, bucket, rh,"
        "   regexp_replace(rh, '^0+', '') AS fd0 FROM f),"
        f" r AS (SELECT ano, mes, bucket, {rank} AS r FROM g),"
        " regs AS (SELECT ano, mes, bucket, max(r) AS mr FROM r"
        "  GROUP BY 1, 2, 3),"
        " pa AS (SELECT ano, bucket, max(mr) AS mr FROM regs GROUP BY 1, 2),"
        " ta AS (SELECT CAST(NULL AS INT) AS ano, bucket, max(mr) AS mr"
        "  FROM regs GROUP BY 2),"
        " ea AS (SELECT ano,"
        "   sum(CAST((1::BIGINT << (53 - mr)) AS DECIMAL(38,0))) AS s,"
        "   count(*) AS nb FROM pa GROUP BY ano),"
        " et AS (SELECT ano,"
        "   sum(CAST((1::BIGINT << (53 - mr)) AS DECIMAL(38,0))) AS s,"
        "   count(*) AS nb FROM ta GROUP BY ano)"
        f" SELECT ano, {est} AS approx_clientes FROM ea"
        f" UNION ALL SELECT ano, {est} AS approx_clientes FROM et"
    )


# ---------------------------------------------------------------- windows


def q_ext_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue per region — windowed row_number
    with a unique tiebreaker (determinism survives any partitioning)."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    revenue = (
        star_join(
            orders,
            [
                (customer, F.col("o_custkey") == F.col("c_custkey")),
                (nation, F.col("c_nationkey") == F.col("n_nationkey")),
                (region, F.col("n_regionkey") == F.col("r_regionkey")),
            ],
        )
        .groupBy(F.col("r_name").alias("regiao"), F.col("c_custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("receita"))
    )
    return top_k_per_group(
        revenue,
        group_cols=["regiao"],
        order_cols=[F.col("receita").desc(), F.col("c_custkey").asc()],
        k=3,
        rank_col="posicao",
    ).select("regiao", "c_custkey", "receita", "posicao")


def q_ext_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates + lag per supplier over ship time: cumulative
    quantity and previous ship date. Total order via (shipdate, orderkey,
    linenumber) so results are deterministic under any partitioning."""
    lineitem = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.round(
            F.sum("l_quantity").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("qty_acumulada"),
        F.lag(F.col("l_shipdate").cast("date"), 1).over(w).alias("envio_anterior"),
    )


def q_ext_topn_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N (ORDER BY + LIMIT) — Spark executes as TakeOrdered:
    per-partition heaps + driver merge, never a global sort. Unique
    tiebreaker makes the result set deterministic."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


# ----------------------------------------------------------------- set ops


def q_ext_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers in BUILDING ∩ positive balance,
    ∪ MACHINERY, − FURNITURE (distinct semantics, like the SQL operators)."""
    customer = t(spark, sf_dir, "customer")
    keys = lambda pred: customer.filter(pred).select("c_custkey")  # noqa: E731
    building = keys(F.col("c_mktsegment") == "BUILDING")
    positive = keys(F.col("c_acctbal") > 0)
    machinery = keys(F.col("c_mktsegment") == "MACHINERY")
    furniture = keys(F.col("c_mktsegment") == "FURNITURE")
    return (
        building.intersect(positive).union(machinery).distinct().subtract(furniture)
    )


# -------------------------------------------------------------------- JSON


def q_ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from JSON strings (events.props)."""
    events = read_events(spark, sf_dir)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# ------------------------------------------------- as-of and range joins


def q_ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest preceding (or
    simultaneous) 'click' of the same user. Union + carry-forward window
    - one shuffle, no range self-join."""
    events = read_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    clicks = events.filter(F.col("event_type") == "click")
    out = asof_join(
        events, clicks, "user_id", "ts", "ts", ["ts", "value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_click_ts"
        ),
        F.col("asof_value").alias("last_click_value"),
    )


def q_ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via binning: classify event values into half-open
    tiers with an equi-join on fixed-width bins + exact refine."""
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 300.0, "high"),
         (300.0, 1000.0, "extreme")],
        schema="lo double, hi double, tier string",
    )
    events = read_events(spark, sf_dir).select("event_id", "value")
    return range_join_binned(
        events, "value", tiers, "lo", "hi", bin_width=50.0
    ).select("event_id", "value", "tier")


# ----------------------------------------------------------- time windows


def q_ext_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over events.ts (batch; the
    streaming variant with watermark is ext_event_windows_stream).
    Window start emitted as a string so the oracle hash is
    timezone-representation-proof."""
    events = read_events(spark, sf_dir)
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("janela"),
            "event_type",
            "n_eventos",
            "valor_total",
        )
    )


def q_ext_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 1-hour windows every 30 minutes over events.ts —
    each event lands in exactly 2 overlapping windows. Spark expands the
    row per overlapping window then hash-aggregates; same shuffle shape
    as tumbling, ×(window/slide) input rows."""
    events = read_events(spark, sf_dir)
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("janela"),
            "event_type",
            "n_eventos",
            "valor_total",
        )
    )


def q_ext_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 30-day trailing revenue per customer (value-
    based frame over the order-date day number, vs ext_window_running's
    ROWS frame). One shuffle on the partition key; peers with the same
    day aggregate together by RANGE semantics in both engines."""
    orders = t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-29, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        day.alias("dia"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("receita_30d"),
    )


def q_ext_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: raw events → hourly
    partial aggregates → daily aggregates COMPUTED FROM THE HOURLY ones
    (counts and sums re-aggregate losslessly). The continuous-aggregate
    pattern at 100 TB: the daily tier reads ~24 rows per key instead of
    rescanning raw data, and the hourly tier is the materialization a
    production pipeline would persist incrementally."""
    events = read_events(spark, sf_dir)
    hourly = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hora"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
        )
    )
    return (
        hourly.groupBy(
            F.to_date("hora").alias("dia"), F.col("event_type")
        )
        .agg(
            F.sum("n").alias("n_eventos"),
            F.round(F.sum("v"), 2).alias("valor_total"),
        )
    )


def q_ext_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type (explicit
    pivot values — never let a 100 TB scan discover the column set)."""
    events = read_events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.groupBy(F.to_date("ts").alias("dia"))
        .pivot("event_type", types)
        .count()
    )
    return pivoted.select(
        "dia", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in types]
    )


def q_ext_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join (operators/relational.py:
    bloom_semi_join): lineitem rows whose order is in the top price
    tier (o_totalprice > 400000), revenue by return flag. The 8 KiB
    bitset kills non-matching fact rows map-side before any exchange;
    the closing exact semi join removes Bloom false positives, so the
    oracle is the plain semi-join SQL."""
    from etl_acordos_spark.operators.relational import bloom_semi_join

    line = t(spark, sf_dir, "lineitem")
    hot = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    return (
        bloom_semi_join(line, hot, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )


def q_ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion view → click → purchase: users who
    clicked strictly after their first view and purchased strictly
    after that click (operators/relational.py:funnel_steps — O(1)
    per-user state min-chain, never a per-user event list). The oracle
    replays the same min-chain as three chained CTEs."""
    from etl_acordos_spark.operators.relational import funnel_steps

    return funnel_steps(
        read_events(spark, sf_dir),
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
    )


def q_ext_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over events
    (operators/relational.py:cohort_retention): cohort = ISO week of a
    user's first event, one row per (cohort, week offset) with the
    active-user count."""
    from etl_acordos_spark.operators.relational import cohort_retention

    return cohort_retention(read_events(spark, sf_dir), "user_id", "ts")


def q_ext_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers over `value`: events more than
    2.5 population standard deviations from their type's mean — the
    metric-monitoring primitive of a DQ pipeline
    (operators/relational.py:zscore_outliers — the SAME expression tree
    `ext_stream_anomaly` scores its stream with, which is what lets
    both keys share one oracle)."""
    from etl_acordos_spark.operators.relational import zscore_outliers

    ev = read_events(spark, sf_dir)
    return zscore_outliers(ev, ev, "event_type", "value")


def q_ext_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: counts of consecutive event-type
    pairs within each user's timeline (lead over a per-user window +
    one hash aggregate) — the Markov-chain input behind journey/funnel
    analytics. Ties in ts are ordered by event_id so both engines walk
    identical sequences."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def q_ext_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the older and
    newer half of the events timeline
    (operators/relational.py:psi_drift) — the distribution-drift
    monitor that pairs with `ext_anomaly_zscore`'s point outliers. One
    broadcast 1-row bounds join, one (type, bin) hash aggregate, then
    per-type math over ≤ 10 rows."""
    from etl_acordos_spark.operators.relational import psi_drift

    return psi_drift(
        read_events(spark, sf_dir), "event_type", "ts", "value"
    ).withColumnRenamed("type", "event_type")


def q_ext_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per nation over
    per-customer order revenue (operators/relational.py:gini_by_group).
    Revenue is pre-rounded to 2 dp (repo money convention) so rank
    order — and therefore the rank-formula Gini — replays identically
    in both engines."""
    from etl_acordos_spark.operators.relational import gini_by_group

    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    base = (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .select(F.col("n_name").alias("nation"), "o_custkey", "rev")
    )
    return gini_by_group(base, "nation", "o_custkey", "rev")


def q_ext_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked approximate string join
    (operators/relational.py:fuzzy_label_match): reconcile dirty
    category labels back to the canonical part-name dimension. The
    dirty probe set is derived deterministically from the data itself
    (vowel-stripped distinct names — same convention as
    ext_decontaminate's derived probes), so both engines link the same
    inputs. Blocked on the 2-char consonant skeleton, never all-pairs;
    best match per label via (distance, name) row_number."""
    from etl_acordos_spark.operators.relational import fuzzy_label_match

    canon = t(spark, sf_dir, "part").select("p_name").distinct()
    dirty = canon.select(
        F.regexp_replace("p_name", "[aeiou]", "").alias("dirty_label")
    )
    return fuzzy_label_match(dirty, canon, "dirty_label", "p_name", max_dist=6)


def q_ext_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over part (operators/relational.py:skyline_2d):
    parts on the (maximize p_size, minimize p_retailprice) Pareto
    frontier — "largest part for the money". Spark runs the sweep
    formulation (per-price max + window over distinct prices + one
    keyed join, O(n log n)); the oracle replays the textbook
    correlated NOT EXISTS — same rows, quadratic strategy."""
    from etl_acordos_spark.operators.relational import skyline_2d

    return skyline_2d(
        t(spark, sf_dir, "part").select(
            "p_partkey", "p_size", "p_retailprice"
        ),
        max_col="p_size",
        min_col="p_retailprice",
    ).select("p_partkey", "p_size", "p_retailprice")


_SKYLINE_ORACLE = (
    "SELECT p.p_partkey, p.p_size, p.p_retailprice FROM part p"
    " WHERE NOT EXISTS (SELECT 1 FROM part q"
    "  WHERE q.p_retailprice <= p.p_retailprice"
    "   AND q.p_size >= p.p_size"
    "   AND (q.p_retailprice < p.p_retailprice"
    "        OR q.p_size > p.p_size))"
)


def q_ext_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-purchase graph
    (operators/graph.py): parts are connected iff they share an order;
    triangles measure community density. Spark runs the degree-
    orientation algorithm (out-degree ≤ O(√m), wedge join O(m^1.5));
    the oracle replays the orientation-invariant a<b<c three-way self-
    join — same counts, different physical strategy."""
    from etl_acordos_spark.operators.graph import (
        co_occurrence_edges,
        triangle_counts,
    )

    edges = co_occurrence_edges(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        max_group_size=1000,
    )
    return triangle_counts(edges, k=20).withColumnRenamed(
        "vertex", "p_partkey"
    )


def q_ext_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test
    (operators/relational.py:conversion_ztest): variant = user_id
    parity (deterministic derivation — props carries no variant field),
    conversion = "power buyer" (≥ 14 purchase events, straddling the
    corpus median of 13 so both outcomes occur). One per-user
    aggregate, one 2-row variant aggregate, one output row."""
    from etl_acordos_spark.operators.relational import conversion_ztest

    ev = read_events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.max(F.col("user_id") % 2).alias("variant"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return conversion_ztest(users, "variant", "converted")


def q_ext_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test (operators/relational.py:ks_test_2samp):
    does the event `value` distribution differ between the user_id
    parity cohorts? The continuous-metric companion to ext_ab_test —
    one per-value aggregate + one windowed CDF sweep, counts only on
    the wire."""
    from etl_acordos_spark.operators.relational import ks_test_2samp

    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "value"
    )
    return ks_test_2samp(ev, "variant", "value")


_KS_TEST_ORACLE = (
    "WITH pts AS (SELECT CAST(user_id % 2 AS INT) AS g, value AS x"
    "  FROM events WHERE value IS NOT NULL),"
    " pv AS (SELECT x,"
    "   count(*) FILTER (WHERE g = 0) AS ca,"
    "   count(*) FILTER (WHERE g = 1) AS cb"
    "  FROM pts GROUP BY x),"
    " cum AS (SELECT"
    "   sum(ca) OVER (ORDER BY x) AS ka,"
    "   sum(cb) OVER (ORDER BY x) AS kb,"
    "   sum(ca) OVER () AS na,"
    "   sum(cb) OVER () AS nb FROM pv),"
    # NULLIF keeps a degenerate one-empty-cohort input NULL like the
    # Spark side (Spark's `/` null-propagates on x/0; DuckDB's IEEE
    # doubles would yield inf/NaN and fabricate a divergence)
    " agg AS (SELECT CAST(max(na) AS BIGINT) AS n_a,"
    "   CAST(max(nb) AS BIGINT) AS n_b,"
    "   floor(max(abs(ka / CAST(NULLIF(na, 0) AS DOUBLE)"
    "     - kb / CAST(NULLIF(nb, 0) AS DOUBLE))) * 1000000000.0 + 0.5)"
    "    / 1000000000.0 AS d_stat FROM cum)"
    " SELECT n_a, n_b, d_stat,"
    "  d_stat > 1.358 * sqrt((n_a + n_b)"
    "    / (CAST(NULLIF(n_a, 0) AS DOUBLE) * NULLIF(n_b, 0)))"
    "   AS reject_05"
    " FROM agg"
)


def q_ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph
    (operators/graph.py:pagerank): 10 power iterations, each one
    join + one hash aggregate on vertex ids, lineage cut per round.
    The oracle replays the identical recurrence as 10 unrolled chained
    CTEs — per-iteration 1e-9 grid-floors keep both engines
    bit-identical round over round."""
    from etl_acordos_spark.operators.graph import (
        co_occurrence_edges,
        pagerank,
    )

    edges = co_occurrence_edges(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        max_group_size=1000,
    )
    return pagerank(edges, iterations=10, damping=0.85, k=20).withColumnRenamed(
        "vertex", "p_partkey"
    )


def _pagerank_oracle(
    iterations: int = 10, damping: float = 0.85, k: int = 20
) -> str:
    """Unrolled chained-CTE twin of operators/graph.py:pagerank —
    identical recurrence, identical per-iteration grid-floor. All
    three knobs are threaded through so the oracle can't silently
    diverge from a retuned q_ext_pagerank."""
    head = (
        "WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
        # max_group_size=1000 twin (see _TRIANGLE_ORACLE)
        " gok AS (SELECT l_orderkey FROM li0"
        "  GROUP BY l_orderkey HAVING count(*) <= 1000),"
        " li AS (SELECT li0.* FROM li0 JOIN gok USING (l_orderkey)),"
        " edges AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d"
        "  FROM li a JOIN li b"
        "   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
        " sym AS (SELECT s AS src, d AS dst FROM edges"
        "  UNION ALL SELECT d AS src, s AS dst FROM edges),"
        " deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),"
        " oute AS (SELECT sym.src, sym.dst, deg.deg"
        "  FROM sym JOIN deg USING (src)),"
        " nn AS (SELECT count(DISTINCT src) AS n FROM sym),"
        " r0 AS (SELECT DISTINCT src AS v,"
        "  1.0 / (SELECT n FROM nn) AS rank FROM sym)"
    )
    its = "".join(
        f", r{i} AS (SELECT o.dst AS v,"
        f" floor(((1.0 - {damping!r}) / (SELECT n FROM nn)"
        f"  + {damping!r} * sum(r.rank / o.deg)) * 1000000000.0 + 0.5)"
        f"  / 1000000000.0 AS rank"
        f" FROM oute o JOIN r{i - 1} r ON o.src = r.v GROUP BY o.dst)"
        for i in range(1, iterations + 1)
    )
    return (
        head
        + its
        + f" SELECT v AS p_partkey, rank FROM r{iterations}"
        f" ORDER BY rank DESC, p_partkey LIMIT {k}"
    )


def q_ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap filling + forward fill per event type
    (operators/relational.py:gap_fill_hours): the series-regularization
    step before rolling windows or forecasting. Spine from `sequence`
    explode, per-series ordered fill window."""
    from etl_acordos_spark.operators.relational import gap_fill_hours

    return gap_fill_hours(
        read_events(spark, sf_dir), "event_type", "ts", "value"
    ).withColumnRenamed("series", "event_type")


def q_ext_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile rollup per event type
    (operators/relational.py:histogram_quantile_rollup): daily
    64-bin sketches merged to per-type p50/p90/p99 — the percentile
    analog of ext_hll_sketch, with the merge losslessness checked by
    the oracle's single-level histogram."""
    from etl_acordos_spark.operators.relational import (
        histogram_quantile_rollup,
    )

    ev = read_events(spark, sf_dir)
    return histogram_quantile_rollup(
        ev,
        "event_type",
        F.col("ts").cast("date"),
        "value",
        bins=64,
        quantiles=(0.5, 0.9, 0.99),
    ).withColumnRenamed("series", "event_type")


def q_ext_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution view → purchase per ISO-week
    cohort (operators/relational.py:funnel_latency): integer
    calendar-day latencies, exact-int average and interpolated median
    — the follow-up statistic to `ext_funnel`'s conversion counts."""
    from etl_acordos_spark.operators.relational import funnel_latency

    return funnel_latency(
        read_events(spark, sf_dir),
        "user_id",
        "ts",
        "event_type",
        "view",
        "purchase",
    )


def q_ext_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening (operators/graph.py:hierarchy_flatten):
    every part resolved to its (root, depth) in the derived decimal
    part tree (parent = partkey div 10 — deterministic, closed under
    the contiguous key range). Spark runs log(depth) pointer-doubling
    self-joins; the oracle is the plain recursive CTE — the
    hierarchical-query surface re-expressed for a 1000-executor
    cluster."""
    from etl_acordos_spark.operators.graph import hierarchy_flatten

    edges = (
        t(spark, sf_dir, "part")
        .select("p_partkey")
        .distinct()
        .select(
            F.col("p_partkey").alias("node"),
            F.when(
                F.col("p_partkey") > 0, F.expr("p_partkey div 10")
            ).alias("parent"),
        )
    )
    return hierarchy_flatten(edges).withColumnRenamed("node", "p_partkey")


def q_ext_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders
    (operators/relational.py:rfm_segments): recency/frequency/monetary
    quintiles, ntile ties pinned by customer key. The per-customer
    frame is dimension-sized, so the global ntile sort is fine; a
    fact-sized input would use quantile-threshold bucketing
    (`ext_quantile_sketch`) instead."""
    from etl_acordos_spark.operators.relational import rfm_segments

    return rfm_segments(
        t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


def q_ext_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets
    (operators/relational.py:association_rules): top-20 directed rules
    by lift with support/confidence, min 3 shared baskets (the
    synthetic baskets are near-uniform, so pair counts are small at
    every SF)."""
    from etl_acordos_spark.operators.relational import association_rules

    return association_rules(
        t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_pair=3,
        k=20,
    )


def q_ext_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outliers per event type
    (operators/relational.py:iqr_outliers) — the robust complement to
    `ext_anomaly_zscore`; fences grid-pinned before the boundary
    compare."""
    from etl_acordos_spark.operators.relational import iqr_outliers

    return iqr_outliers(read_events(spark, sf_dir), "event_type", "value")


def q_ext_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension spanning the orders date range
    (operators/relational.py:calendar_dim): the conformed date spine,
    generated distributed (sequence explode), ISO conventions pinned
    cross-engine."""
    from etl_acordos_spark.operators.relational import calendar_dim

    return calendar_dim(t(spark, sf_dir, "orders"), "o_orderdate")


def q_ext_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit DQ profile of order totals
    (operators/relational.py:benford_profile) — expected counts and
    chi-square contributions per leading digit."""
    from etl_acordos_spark.operators.relational import benford_profile

    return benford_profile(t(spark, sf_dir, "orders"), "o_totalprice")


def q_ext_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week value growth per event type
    (operators/relational.py:period_growth) — the period-over-period
    trend behind BI tiles; NULL growth on first weeks and zero bases
    in both engines."""
    from etl_acordos_spark.operators.relational import period_growth

    return period_growth(
        read_events(spark, sf_dir), "event_type", "ts", "value"
    ).withColumnRenamed("series", "event_type")


def q_ext_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly actives + DAU/WAU stickiness
    (operators/relational.py:active_user_stickiness) — the engagement
    headline metric; ids-only shuffles, exact integer distinct
    counts."""
    from etl_acordos_spark.operators.relational import (
        active_user_stickiness,
    )

    return active_user_stickiness(read_events(spark, sf_dir), "user_id", "ts")


def q_ext_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity self-join
    (operators/relational.py:grid_neighbor_join): customer points on a
    10×10 planar patch (coordinates derived from the deterministic
    cross-engine hash — the dataset carries no geo columns, same
    derivation convention as ext_record_linkage's probes), all pairs
    within radius 0.3 via 3×3 grid binning. The oracle is the
    brute-force all-pairs filter — the binned plan must reproduce it
    exactly."""
    from etl_acordos_spark.functions.hashing import XX_PRIME, unit_hash
    from etl_acordos_spark.operators.relational import grid_neighbor_join

    pts = t(spark, sf_dir, "customer").select(
        "c_custkey",
        (unit_hash(F.col("c_custkey")) * 10.0).alias("x"),
        (unit_hash(F.col("c_custkey"), XX_PRIME) * 10.0).alias("y"),
    )
    # cell defaults to radius — the tightest covering grid (9·cell²
    # candidate area per point); a coarser cell only inflates candidates
    return grid_neighbor_join(pts, "c_custkey", "x", "y", radius=0.3)


def q_ext_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type
    (operators/relational.py:cusum_changepoint): the event where each
    type's cumulative deviation from its mean peaks — turns
    `ext_psi_drift`'s *whether the metric shifted* into *when*."""
    from etl_acordos_spark.operators.relational import cusum_changepoint

    return cusum_changepoint(
        read_events(spark, sf_dir), "event_type", "ts", "event_id", "value"
    ).withColumnRenamed("series", "event_type")


# ---------------------------------------------------------------- oracles

_FUNNEL_LATENCY_ORACLE = (
    "WITH fa AS (SELECT user_id, min(ts) AS t_a FROM events"
    "  WHERE event_type = 'view' GROUP BY user_id),"
    " fb AS (SELECT e.user_id, min(e.ts) AS t_b, min(t_a) AS t_a"
    "  FROM events e JOIN fa USING (user_id)"
    "  WHERE e.event_type = 'purchase' AND e.ts > t_a"
    "  GROUP BY e.user_id),"
    " lat AS (SELECT CAST(date_trunc('week', t_a) AS DATE)"
    "   AS cohort_week,"
    "  date_diff('day', CAST(t_a AS DATE), CAST(t_b AS DATE)) AS days"
    "  FROM fb)"
    " SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users,"
    "  floor(avg(days) * 10000.0 + 0.5) / 10000.0 AS avg_days,"
    "  quantile_cont(days, 0.5) AS p50_days,"
    "  CAST(max(days) AS INT) AS max_days"
    " FROM lat GROUP BY cohort_week"
)

_HIERARCHY_ORACLE = (
    "WITH RECURSIVE nodes AS (SELECT DISTINCT p_partkey AS node,"
    "   CASE WHEN p_partkey > 0 THEN p_partkey // 10 END AS parent"
    "  FROM part),"
    " walk AS ("
    "  SELECT node, node AS root, 0 AS depth FROM nodes"
    "   WHERE parent IS NULL"
    "  UNION ALL"
    "  SELECT n.node, w.root, w.depth + 1"
    "   FROM nodes n JOIN walk w ON n.parent = w.node)"
    " SELECT node AS p_partkey, root, CAST(depth AS INT) AS depth"
    " FROM walk"
)

_RFM_ORACLE = (
    "WITH anchor AS (SELECT max(o_orderdate) AS d_max FROM orders),"
    " pc AS (SELECT o_custkey,"
    "  min(date_diff('day', CAST(o_orderdate AS DATE),"
    "   CAST(d_max AS DATE))) AS recency_days,"
    "  CAST(count(*) AS BIGINT) AS frequency,"
    "  round(sum(o_totalprice), 2) AS monetary"
    " FROM orders, anchor GROUP BY o_custkey)"
    " SELECT o_custkey, recency_days, frequency, monetary,"
    "  ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r,"
    "  ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f,"
    "  ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m,"
    "  CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) * 100"
    "   + ntile(5) OVER (ORDER BY frequency ASC, o_custkey) * 10"
    "   + ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS INT)"
    "   AS rfm_score"
    " FROM pc"
)


def _assoc_rules_oracle(min_pair: int = 3, k: int = 20) -> str:
    """Oracle twin of q_ext_assoc_rules with the knobs threaded
    through (the _pagerank_oracle convention)."""
    return (
        "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey"
        "  FROM lineitem),"
        " pc AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,"
        "   CAST(count(*) AS BIGINT) AS n_ab"
        "  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey"
        "   AND a.l_partkey <> b.l_partkey"
        f"  GROUP BY 1, 2 HAVING count(*) >= {min_pair}),"
        " ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c"
        "  FROM li GROUP BY 1),"
        " nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n"
        "  FROM li)"
        " SELECT item_a, item_b, n_ab,"
        "  floor(CAST(n_ab AS DOUBLE) / n * 1000000.0 + 0.5)"
        "   / 1000000.0 AS support,"
        "  floor(CAST(n_ab AS DOUBLE) / a.c * 1000000.0 + 0.5)"
        "   / 1000000.0 AS confidence,"
        "  floor((CAST(n_ab AS DOUBLE) / a.c) / (CAST(b.c AS DOUBLE) / n)"
        "   * 1000000.0 + 0.5) / 1000000.0 AS lift"
        " FROM pc JOIN ic a ON a.l_partkey = item_a"
        "  JOIN ic b ON b.l_partkey = item_b, nb"
        f" ORDER BY lift DESC, item_a, item_b LIMIT {k}"
    )


_OUTLIER_IQR_ORACLE = (
    "WITH f AS (SELECT event_type,"
    "  floor((quantile_cont(value, 0.25)"
    "    - 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)))"
    "   * 1000000000.0 + 0.5) / 1000000000.0 AS lo,"
    "  floor((quantile_cont(value, 0.75)"
    "    + 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)))"
    "   * 1000000000.0 + 0.5) / 1000000000.0 AS hi"
    " FROM events GROUP BY event_type)"
    " SELECT event_id, e.event_type, value, lo, hi"
    " FROM events e JOIN f USING (event_type)"
    " WHERE value < lo OR value > hi"
)

_CALENDAR_ORACLE = (
    "WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,"
    "   max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),"
    " spine AS (SELECT unnest(generate_series(d0, d1,"
    "   INTERVAL 1 DAY)) AS cal_date FROM b)"
    " SELECT CAST(cal_date AS DATE) AS cal_date,"
    "  CAST(year(cal_date) AS INT) AS year,"
    "  CAST(quarter(cal_date) AS INT) AS quarter,"
    "  CAST(month(cal_date) AS INT) AS month,"
    "  CAST(isoyear(cal_date) AS INT) AS iso_year,"
    "  CAST(weekofyear(cal_date) AS INT) AS iso_week,"
    "  CAST(isodow(cal_date) AS INT) AS iso_dow,"
    "  CAST(isodow(cal_date) >= 6 AS INT) AS is_weekend"
    " FROM spine"
)

_BENFORD_ORACLE = (
    "WITH counts AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)"
    "    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,"
    "   CAST(count(*) AS BIGINT) AS n"
    "  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),"
    " tot AS (SELECT sum(n) AS nn FROM counts)"
    " SELECT digit, n,"
    "  floor(log10(1.0 + 1.0 / digit) * nn * 10000.0 + 0.5) / 10000.0"
    "   AS expected_n,"
    "  floor((n - log10(1.0 + 1.0 / digit) * nn)"
    "   * (n - log10(1.0 + 1.0 / digit) * nn)"
    "   / (log10(1.0 + 1.0 / digit) * nn) * 10000.0 + 0.5) / 10000.0"
    "   AS chi2_term"
    " FROM counts, tot"
)

_GROWTH_ORACLE = (
    "WITH weekly AS (SELECT event_type,"
    "   CAST(date_trunc('week', ts) AS DATE) AS week,"
    "   round(sum(value), 2) AS total"
    "  FROM events GROUP BY 1, 2),"
    " lagged AS (SELECT *, lag(total) OVER ("
    "   PARTITION BY event_type ORDER BY week) AS prev FROM weekly)"
    " SELECT event_type, week, total,"
    "  CASE WHEN prev > 0 THEN"
    "   floor((total - prev) / prev * 1000000.0 + 0.5) / 1000000.0"
    "  END AS pct_change"
    " FROM lagged"
)

_ACTIVE_USERS_ORACLE = (
    "WITH d AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week,"
    "   CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau"
    "  FROM events GROUP BY 1, 2),"
    " avg_d AS (SELECT week,"
    "   floor(sum(dau) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_dau"
    "  FROM d GROUP BY week),"
    " w AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week,"
    "   CAST(count(DISTINCT user_id) AS BIGINT) AS wau"
    "  FROM events GROUP BY 1)"
    " SELECT w.week, wau, avg_dau,"
    "  floor(avg_dau / nullif(wau, 0) * 10000.0 + 0.5) / 10000.0"
    "   AS stickiness"
    " FROM w JOIN avg_d ON w.week = avg_d.week"
)


def _geo_join_oracle() -> str:
    """Brute-force all-pairs twin of the binned spatial join — the
    binning is a pure candidate-pruning strategy, so the full filter
    over the same derived coordinates must agree row-for-row."""
    from etl_acordos_spark.functions.hashing import XX_PRIME, sql_unit_hash

    x = f"({sql_unit_hash('c_custkey')} * 10.0)"
    y = f"({sql_unit_hash('c_custkey', XX_PRIME)} * 10.0)"
    return (
        f"WITH pts AS (SELECT c_custkey, {x} AS x, {y} AS y"
        "  FROM customer),"
        " pairs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,"
        "   (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)"
        "    AS dist2"
        "  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey)"
        " SELECT id_a, id_b,"
        "  floor(dist2 * 1000000000.0 + 0.5) / 1000000000.0 AS dist2"
        " FROM pairs WHERE dist2 <= 0.3 * 0.3"
    )


_CHANGEPOINT_ORACLE = (
    "WITH stats AS (SELECT event_type,"
    "   floor(avg(value) * 1000000000.0 + 0.5) / 1000000000.0 AS mu"
    "  FROM events GROUP BY event_type),"
    " scored AS (SELECT e.event_type, ts, event_id,"
    "  floor(abs(sum(value - mu) OVER (PARTITION BY e.event_type"
    "    ORDER BY ts, event_id"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
    "   * 1000000.0 + 0.5) / 1000000.0 AS abs_s"
    "  FROM events e JOIN stats USING (event_type)),"
    " picked AS (SELECT *, row_number() OVER (PARTITION BY event_type"
    "   ORDER BY abs_s DESC, ts, event_id) AS rn FROM scored)"
    " SELECT event_type, ts AS cp_ts, event_id AS cp_event,"
    "  abs_s AS cusum"
    " FROM picked WHERE rn = 1"
)

_GAP_FILL_ORACLE = (
    "WITH hourly AS (SELECT event_type AS series,"
    "   date_trunc('hour', ts) AS hour, round(sum(value), 4) AS v"
    "  FROM events GROUP BY 1, 2),"
    " b AS (SELECT series, min(hour) AS h0, max(hour) AS h1"
    "  FROM hourly GROUP BY 1),"
    " spine AS (SELECT series,"
    "   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),"
    " j AS (SELECT s.series, s.hour, h.v"
    "  FROM spine s LEFT JOIN hourly h USING (series, hour))"
    " SELECT series AS event_type, hour,"
    "  last_value(v IGNORE NULLS) OVER (PARTITION BY series ORDER BY hour"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,"
    "  CAST(v IS NULL AS INT) AS was_gap"
    " FROM j"
)

_QUANTILE_SKETCH_ORACLE = (
    # single-level histogram: equals the engine's two-tier rollup
    # because bin-count merges are associative (the checked contract)
    "WITH bounds AS (SELECT min(value) AS v0, max(value) AS v1"
    "  FROM events),"
    " binned AS (SELECT event_type AS series,"
    "  CAST(CASE WHEN v1 > v0 THEN"
    "   least(floor((value - v0) / ((v1 - v0) / 64.0)), 63)"
    "   ELSE 0 END AS INT) AS bin, v0, v1"
    "  FROM events, bounds),"
    " merged AS (SELECT series, bin, v0, v1, count(*) AS cnt"
    "  FROM binned GROUP BY series, bin, v0, v1),"
    " cum AS (SELECT *,"
    "  sum(cnt) OVER (PARTITION BY series ORDER BY bin"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,"
    "  sum(cnt) OVER (PARTITION BY series) AS n FROM merged),"
    # CAST: a bare [0.5, …] list is DECIMAL in DuckDB — decimal q*n
    # would hit bin boundaries differently than Spark's double
    " q AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),"
    "   CAST(0.99 AS DOUBLE)]) AS q)"
    " SELECT series AS event_type, q,"
    "  floor((v0 + ((v1 - v0) / 64.0)"
    "    * (bin + (q * n - (c - cnt)) / cnt)) * 1000000.0 + 0.5)"
    "   / 1000000.0 AS est"
    " FROM cum, q"
    " WHERE c >= q * n AND (c - cnt) < q * n"
)

_AB_TEST_ORACLE = (
    "WITH users AS (SELECT user_id, user_id % 2 AS variant,"
    "   CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
    "     >= 14 THEN 1 ELSE 0 END AS converted"
    "  FROM events GROUP BY user_id),"
    " pv AS (SELECT variant, count(*) AS n, sum(converted) AS x"
    "  FROM users GROUP BY variant),"
    " row1 AS (SELECT"
    "  CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,"
    "  CAST(sum(CASE WHEN variant = 0 THEN x END) AS BIGINT) AS x_a,"
    "  CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,"
    "  CAST(sum(CASE WHEN variant = 1 THEN x END) AS BIGINT) AS x_b"
    "  FROM pv),"
    " calc AS (SELECT *,"
    "  (CAST(x_a AS DOUBLE) + x_b) / (CAST(n_a AS DOUBLE) + n_b) AS p,"
    "  CAST(x_b AS DOUBLE) / n_b - CAST(x_a AS DOUBLE) / n_a AS d"
    "  FROM row1)"
    " SELECT n_a, x_a, n_b, x_b,"
    "  CASE WHEN sqrt(p * (1 - p) * (1.0/n_a + 1.0/n_b)) > 0"
    "   THEN floor(d / sqrt(p * (1 - p) * (1.0/n_a + 1.0/n_b))"
    "    * 1000000.0 + 0.5) / 1000000.0"
    "  END AS z"
    " FROM calc"
)

_LINKAGE_ORACLE = (
    "WITH canon AS (SELECT DISTINCT p_name FROM part),"
    " dirty AS (SELECT regexp_replace(p_name, '[aeiou]', '', 'g')"
    "   AS dirty_label FROM canon),"
    " cand AS (SELECT dirty_label, p_name,"
    "   CAST(levenshtein(dirty_label, p_name) AS INT) AS dist"
    "  FROM dirty JOIN canon"
    "   ON substr(regexp_replace(lower(dirty_label), '[aeiou ]', '', 'g'),"
    "     1, 2)"
    "    = substr(regexp_replace(lower(p_name), '[aeiou ]', '', 'g'), 1, 2)"
    "  WHERE levenshtein(dirty_label, p_name) <= 6),"
    " best AS (SELECT *, row_number() OVER ("
    "   PARTITION BY dirty_label ORDER BY dist, p_name) AS rn FROM cand)"
    " SELECT dirty_label AS dirty, p_name AS matched, dist"
    " FROM best WHERE rn = 1"
)

_TRIANGLE_ORACLE = (
    "WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    # max_group_size=1000 twin: drop degenerate baskets before the
    # per-group self-join, exactly like the Spark side's count-filter
    " gok AS (SELECT l_orderkey FROM li0"
    "  GROUP BY l_orderkey HAVING count(*) <= 1000),"
    " li AS (SELECT li0.* FROM li0 JOIN gok USING (l_orderkey)),"
    " edges AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d"
    "  FROM li a JOIN li b"
    "   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
    " tri AS (SELECT e1.s AS a, e1.d AS b, e2.d AS c"
    "  FROM edges e1 JOIN edges e2 ON e1.d = e2.s"
    "   JOIN edges e3 ON e1.s = e3.s AND e2.d = e3.d),"
    " pv AS (SELECT unnest([a, b, c]) AS p_partkey FROM tri)"
    " SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_triangles"
    " FROM pv GROUP BY p_partkey"
    " ORDER BY n_triangles DESC, p_partkey LIMIT 20"
)

_PSI_ORACLE = (
    "WITH bounds AS ("
    " SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1,"
    "  min(value) AS v0, max(value) AS v1 FROM events),"
    " binned AS ("
    " SELECT event_type,"
    "  CAST(CASE WHEN v1 > v0 THEN"
    "   least(floor((value - v0) / ((v1 - v0) / 10.0)), 9)"
    "   ELSE 0 END AS INT) AS bin,"
    "  CASE WHEN CAST(ts AS DATE) <="
    "   d0 + CAST(floor(datediff('day', d0, d1) / 2.0) AS INT)"
    "   THEN 1 ELSE 0 END AS is_old"
    " FROM events, bounds),"
    " counts AS ("
    " SELECT event_type, bin, sum(is_old) AS c_old,"
    "  sum(1 - is_old) AS c_new"
    " FROM binned GROUP BY event_type, bin),"
    " tot AS ("
    " SELECT *, sum(c_old) OVER (PARTITION BY event_type) AS n_old,"
    "  sum(c_new) OVER (PARTITION BY event_type) AS n_new,"
    "  count(*) OVER (PARTITION BY event_type) AS nb"
    " FROM counts)"
    " SELECT event_type, CAST(max(n_old) AS BIGINT) AS n_old,"
    "  CAST(max(n_new) AS BIGINT) AS n_new,"
    "  floor(sum(((c_old + 0.5)/(n_old + 0.5*nb)"
    "    - (c_new + 0.5)/(n_new + 0.5*nb))"
    "   * ln(((c_old + 0.5)/(n_old + 0.5*nb))"
    "    / ((c_new + 0.5)/(n_new + 0.5*nb))))"
    "   * 1000000.0 + 0.5) / 1000000.0 AS psi"
    " FROM tot GROUP BY event_type"
)

_GINI_ORACLE = (
    "WITH rev AS ("
    " SELECT o_custkey, round(sum(o_totalprice), 2) AS rev"
    " FROM orders GROUP BY o_custkey),"
    " ranked AS ("
    " SELECT n_name AS nation, rev, row_number() OVER ("
    "  PARTITION BY n_name ORDER BY rev, o_custkey) AS i"
    " FROM rev JOIN customer ON c_custkey = o_custkey"
    "  JOIN nation ON n_nationkey = c_nationkey)"
    " SELECT nation, CAST(count(*) AS BIGINT) AS n_keys,"
    "  floor((2.0 * sum(i * rev) - (count(*) + 1) * sum(rev))"
    "   / (count(*) * sum(rev)) * 10000.0 + 0.5) / 10000.0 AS gini"
    " FROM ranked GROUP BY nation"
    # mirrors gini_by_group's sum > 0 guard (a zero-total group has no
    # defined concentration); latent here — revenue is always positive
    " HAVING sum(rev) > 0"
)

_ANOMALY_ORACLE = (
    "WITH stats AS (SELECT event_type, avg(value) AS mu,"
    "   stddev_pop(value) AS sigma FROM events GROUP BY event_type"
    "   HAVING stddev_pop(value) > 0)"
    " SELECT event_id, e.event_type, value,"
    "  floor(abs((value - mu) / sigma) * 10000.0 + 0.5) / 10000.0 AS abs_z"
    " FROM events e JOIN stats USING (event_type)"
    " WHERE floor(abs((value - mu) / sigma) * 10000.0 + 0.5) / 10000.0"
    "  > 2.5"
)

_TRANSITION_ORACLE = (
    "WITH seq AS (SELECT user_id, event_type,"
    "   lead(event_type) OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS next_type"
    "  FROM events)"
    " SELECT event_type AS from_type, next_type AS to_type,"
    "  CAST(count(*) AS BIGINT) AS n"
    " FROM seq WHERE next_type IS NOT NULL"
    " GROUP BY event_type, next_type"
)

_BLOOM_JOIN_ORACLE = (
    "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,"
    " round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
    " FROM lineitem WHERE l_orderkey IN ("
    "  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)"
    " GROUP BY l_returnflag"
)

_FUNNEL_ORACLE = (
    "WITH t1 AS (SELECT user_id, min(ts) AS t FROM events"
    "   WHERE event_type = 'view' GROUP BY user_id),"
    " t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
    "   JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t"
    "   WHERE e.event_type = 'click' GROUP BY e.user_id),"
    " t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
    "   JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t"
    "   WHERE e.event_type = 'purchase' GROUP BY e.user_id),"
    " counts AS ("
    "  SELECT 1 AS step_idx, 'view' AS step,"
    "   (SELECT count(*) FROM t1) AS n_users"
    "  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)"
    "  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3))"
    # nullif on the lag keeps the oracle DuckDB-version-independent:
    # 1.0.x returns NULL for x/0 but >= 1.1 ieee_floating_point_ops
    # yields inf/NaN for DOUBLE division — nullif makes an empty step
    # NULL in both, matching Spark's try_divide
    " SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,"
    "  round(CAST(n_users AS DOUBLE)"
    "   / nullif(lag(n_users) OVER (ORDER BY step_idx), 0), 4)"
    "   AS pct_of_prev"
    " FROM counts"
)

_RETENTION_ORACLE = (
    "WITH first AS (SELECT user_id,"
    "   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week"
    "  FROM events GROUP BY user_id),"
    " active AS (SELECT DISTINCT e.user_id, f.cohort_week,"
    "   CAST(date_diff('day', f.cohort_week,"
    "     CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INTEGER)"
    "    AS week_offset"
    "  FROM events e JOIN first f ON e.user_id = f.user_id)"
    " SELECT cohort_week, week_offset,"
    "  CAST(count(*) AS BIGINT) AS n_users"
    " FROM active GROUP BY cohort_week, week_offset"
)

_ORACLES: dict[str, str | None] = {
    "ext_join_star": (
        "SELECT r_name AS regiao, CAST(year(o_orderdate) AS INTEGER) AS ano,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS receita,"
        " count(*) AS n_itens"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_name, year(o_orderdate)"
    ),
    "ext_groupby_agg": (
        "SELECT l_returnflag, l_linestatus,"
        " round(sum(l_quantity), 2) AS sum_qty,"
        " round(sum(l_extendedprice), 2) AS sum_base_price,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,"
        " round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)"
        "   AS sum_charge,"
        " round(avg(l_quantity), 6) AS avg_qty,"
        " round(avg(l_discount), 6) AS avg_disc,"
        " count(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
        " GROUP BY l_returnflag, l_linestatus"
    ),
    "ext_rollup": (
        "SELECT r_name AS regiao, o_orderpriority AS prioridade,"
        " count(*) AS n_pedidos, round(sum(o_totalprice), 2) AS receita"
        " FROM orders"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY ROLLUP (r_name, o_orderpriority)"
    ),
    "ext_join_semi_anti": (
        "SELECT c_nationkey,"
        " CAST(sum(CASE WHEN has_orders THEN 1 ELSE 0 END) AS BIGINT) AS n_active,"
        " CAST(sum(CASE WHEN has_orders THEN 0 ELSE 1 END) AS BIGINT) AS n_inactive"
        " FROM (SELECT c_nationkey,"
        "   c_custkey IN (SELECT o_custkey FROM orders) AS has_orders"
        "   FROM customer)"
        " GROUP BY c_nationkey"
    ),
    "ext_merge_upsert": (
        "SELECT o_orderkey,"
        " CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice * 2, 2)"
        "      ELSE round(o_totalprice, 2) END AS o_totalprice,"
        " CAST(CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS INTEGER)"
        "   AS version"
        " FROM orders"
    ),
    "ext_scd2": (
        "WITH snap AS ("
        "  SELECT o_custkey AS k, CAST(year(o_orderdate) AS INTEGER) AS v,"
        "         max(o_orderstatus) AS status"
        "  FROM orders GROUP BY 1, 2"
        "), marked AS ("
        "  SELECT k, v, status,"
        "    CASE WHEN status IS DISTINCT FROM"
        "      lag(status) OVER (PARTITION BY k ORDER BY v)"
        "    THEN 1 ELSE 0 END AS chg"
        "  FROM snap"
        "), grp AS ("
        "  SELECT k, v, status,"
        "    sum(chg) OVER (PARTITION BY k ORDER BY v"
        "                   ROWS UNBOUNDED PRECEDING) AS g"
        "  FROM marked"
        "), iv AS ("
        "  SELECT k, g, status, min(v) AS valid_from"
        "  FROM grp GROUP BY k, g, status"
        ")"
        " SELECT k, status, valid_from,"
        "  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from)"
        "    AS valid_to,"
        "  (lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from)"
        "    IS NULL) AS is_current"
        " FROM iv"
    ),
    "ext_salted_join": (
        "SELECT s_nationkey,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS receita,"
        " count(*) AS n_itens"
        " FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"
        " GROUP BY s_nationkey"
    ),
    "ext_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority,"
        " count(*) AS n_pedidos, round(sum(o_totalprice), 2) AS receita"
        " FROM orders"
        " GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"
    ),
    "ext_sessionize_batch": (
        "WITH marked AS ("
        "  SELECT user_id, ts, value,"
        "    CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE"
        "              OR lag(ts) OVER w IS NULL"
        "         THEN 1 ELSE 0 END AS new_sess"
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
        "), numbered AS ("
        "  SELECT user_id, ts, value,"
        "    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts"
        "                        ROWS UNBOUNDED PRECEDING) AS sess_no"
        "  FROM marked)"
        " SELECT user_id, min(ts) AS session_start,"
        "  count(*) AS n_events, round(sum(value), 4) AS sum_value"
        " FROM numbered GROUP BY user_id, sess_no"
    ),
    "ext_train_test_split": (
        "SELECT doc_id,"
        f" CASE WHEN {sql_hash32('doc_id')} % 100 < 90"
        " THEN 'train' ELSE 'test' END AS split"
        " FROM documents"
    ),
    "ext_correlated_subquery": (
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS preco"
        " FROM orders o"
        " WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)"
        "   FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"
    ),
    "ext_window_ranking": (
        "SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS saldo,"
        " CAST(rank() OVER w AS INTEGER) AS rnk,"
        " CAST(dense_rank() OVER w AS INTEGER) AS drnk,"
        " CAST(ntile(4) OVER w AS INTEGER) AS quartil,"
        " round(lag(c_acctbal) OVER w, 2) AS saldo_anterior"
        " FROM customer"
        " WINDOW w AS (PARTITION BY c_mktsegment"
        "              ORDER BY c_acctbal DESC, c_custkey)"
    ),
    "ext_percentiles": (
        "SELECT l_returnflag,"
        " round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,"
        " round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,"
        " round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,"
        " round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,"
        " round(avg(l_extendedprice), 4) AS media"
        " FROM lineitem GROUP BY l_returnflag"
    ),
    "ext_agg_stats": (
        "SELECT c_mktsegment,"
        " CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,"
        " round(min(c_acctbal), 2) AS min_bal,"
        " round(max(c_acctbal), 2) AS max_bal,"
        " round(avg(c_acctbal), 4) AS avg_bal,"
        " round(stddev_samp(c_acctbal), 4) AS sd_bal"
        " FROM customer GROUP BY c_mktsegment"
    ),
    # contract oracle: sketch VALUES differ across engines by design,
    # so the output is (exact values, in-plan error flags) — the oracle
    # states the exact counts + TRUE, and a sketch outside its
    # documented bound hash-mismatches (see q_ext_approx docstring)
    "ext_approx": (
        "SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,"
        " CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,"
        " TRUE AS orders_ok, TRUE AS parts_ok,"
        " TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok"
        " FROM lineitem"
    ),
    # contract oracle: exact rollup + TRUE flags (see q_ext_hll_sketch)
    "ext_hll_sketch": (
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS ano,"
        " CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_clientes,"
        " TRUE AS hll_ok"
        " FROM orders GROUP BY ROLLUP (year(o_orderdate))"
    ),
    "ext_topk": (
        "SELECT regiao, c_custkey, receita, posicao FROM ("
        "  SELECT regiao, c_custkey, receita,"
        "   CAST(row_number() OVER ("
        "     PARTITION BY regiao ORDER BY receita DESC, c_custkey ASC"
        "   ) AS INTEGER) AS posicao"
        "  FROM ("
        "    SELECT r_name AS regiao, c_custkey,"
        "     round(sum(o_totalprice), 2) AS receita"
        "    FROM orders"
        "    JOIN customer ON o_custkey = c_custkey"
        "    JOIN nation ON c_nationkey = n_nationkey"
        "    JOIN region ON n_regionkey = r_regionkey"
        "    GROUP BY r_name, c_custkey))"
        " WHERE posicao <= 3"
    ),
    "ext_window_running": (
        "SELECT l_suppkey, l_orderkey, l_linenumber,"
        " CAST(l_shipdate AS DATE) AS ship_date,"
        " round(sum(l_quantity) OVER w, 2) AS qty_acumulada,"
        " CAST(lag(l_shipdate, 1) OVER w AS DATE) AS envio_anterior"
        " FROM lineitem"
        " WINDOW w AS (PARTITION BY l_suppkey"
        "   ORDER BY l_shipdate, l_orderkey, l_linenumber"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    ),
    "ext_topn_global": (
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
    "ext_setops": (
        "SELECT DISTINCT c_custkey FROM ("
        " (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        "  INTERSECT"
        "  SELECT c_custkey FROM customer WHERE c_acctbal > 0)"
        " UNION"
        " SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'"
        " EXCEPT"
        " SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE')"
    ),
    "ext_json_extract": (
        "SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events"
    ),
    "ext_event_windows": (
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS janela,"
        " event_type, count(*) AS n_eventos,"
        " round(sum(value), 2) AS valor_total"
        " FROM events GROUP BY 1, 2"
    ),
    "ext_time_rollup": (
        "SELECT CAST(ts AS DATE) AS dia, event_type,"
        " count(*) AS n_eventos, round(sum(value), 2) AS valor_total"
        " FROM events GROUP BY 1, 2"
    ),
    "ext_sliding_windows": (
        "WITH b AS (SELECT *,"
        "  to_timestamp(floor(epoch(ts) / 1800) * 1800) AS b30 FROM events)"
        " SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS janela, event_type,"
        "  count(*) AS n_eventos, round(sum(value), 2) AS valor_total"
        " FROM b, unnest([b30, b30 - INTERVAL 30 MINUTE]) AS u(ws)"
        " GROUP BY 1, 2"
    ),
    "ext_window_range_frame": (
        "SELECT o_orderkey, o_custkey,"
        " CAST(date_diff('day', DATE '1970-01-01',"
        "   CAST(o_orderdate AS DATE)) AS INTEGER) AS dia,"
        " round(sum(o_totalprice) OVER ("
        "   PARTITION BY o_custkey"
        "   ORDER BY date_diff('day', DATE '1970-01-01',"
        "     CAST(o_orderdate AS DATE))"
        "   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS receita_30d"
        " FROM orders"
    ),
    "ext_pivot": (
        "SELECT CAST(ts AS DATE) AS dia,"
        " count(*) FILTER (WHERE event_type = 'click') AS click,"
        " count(*) FILTER (WHERE event_type = 'error') AS error,"
        " count(*) FILTER (WHERE event_type = 'purchase') AS purchase,"
        " count(*) FILTER (WHERE event_type = 'signup') AS signup,"
        " count(*) FILTER (WHERE event_type = 'view') AS view"
        " FROM events GROUP BY 1"
    ),
}

_ASOF_ORACLE = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
       c.value AS last_click_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
) c ON e.user_id = c.user_id AND e.ts >= c.ts
"""

_RANGE_ORACLE = """
WITH tiers(lo, hi, tier) AS (
  VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
         (150.0, 300.0, 'high'), (300.0, 1000.0, 'extreme')
)
SELECT e.event_id, e.value, t.tier
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
"""

QUERIES: dict[str, QueryDef] = {
    "ext_asof_join": QueryDef(q_ext_asof_join, _ASOF_ORACLE),
    "ext_range_join": QueryDef(q_ext_range_join, _RANGE_ORACLE),
    "ext_join_star": QueryDef(q_ext_join_star, _ORACLES["ext_join_star"]),
    "ext_groupby_agg": QueryDef(q_ext_groupby_agg, _ORACLES["ext_groupby_agg"]),
    "ext_rollup": QueryDef(q_ext_rollup, _ORACLES["ext_rollup"]),
    "ext_join_semi_anti": QueryDef(
        q_ext_join_semi_anti, _ORACLES["ext_join_semi_anti"]
    ),
    "ext_merge_upsert": QueryDef(
        q_ext_merge_upsert, _ORACLES["ext_merge_upsert"]
    ),
    "ext_scd2": QueryDef(q_ext_scd2, _ORACLES["ext_scd2"]),
    "ext_salted_join": QueryDef(
        q_ext_salted_join, _ORACLES["ext_salted_join"]
    ),
    "ext_grouping_sets": QueryDef(
        q_ext_grouping_sets, _ORACLES["ext_grouping_sets"]
    ),
    "ext_sessionize_batch": QueryDef(
        q_ext_sessionize_batch, _ORACLES["ext_sessionize_batch"]
    ),
    "ext_train_test_split": QueryDef(
        q_ext_train_test_split, _ORACLES["ext_train_test_split"]
    ),
    "ext_correlated_subquery": QueryDef(
        q_ext_correlated_subquery, _ORACLES["ext_correlated_subquery"]
    ),
    "ext_window_ranking": QueryDef(
        q_ext_window_ranking, _ORACLES["ext_window_ranking"]
    ),
    "ext_percentiles": QueryDef(
        q_ext_percentiles, _ORACLES["ext_percentiles"]
    ),
    "ext_agg_stats": QueryDef(q_ext_agg_stats, _ORACLES["ext_agg_stats"]),
    "ext_approx": QueryDef(q_ext_approx, _ORACLES["ext_approx"]),
    "ext_hll_sketch": QueryDef(q_ext_hll_sketch, _ORACLES["ext_hll_sketch"]),
    "ext_hll_md5": QueryDef(q_ext_hll_md5, _hll_md5_oracle()),
    "ext_topk": QueryDef(q_ext_topk, _ORACLES["ext_topk"]),
    "ext_window_running": QueryDef(
        q_ext_window_running, _ORACLES["ext_window_running"]
    ),
    "ext_topn_global": QueryDef(q_ext_topn_global, _ORACLES["ext_topn_global"]),
    "ext_setops": QueryDef(q_ext_setops, _ORACLES["ext_setops"]),
    "ext_json_extract": QueryDef(q_ext_json_extract, _ORACLES["ext_json_extract"]),
    "ext_event_windows": QueryDef(
        q_ext_event_windows, _ORACLES["ext_event_windows"]
    ),
    "ext_pivot": QueryDef(q_ext_pivot, _ORACLES["ext_pivot"]),
    "ext_sliding_windows": QueryDef(
        q_ext_sliding_windows, _ORACLES["ext_sliding_windows"]
    ),
    "ext_time_rollup": QueryDef(
        q_ext_time_rollup, _ORACLES["ext_time_rollup"]
    ),
    "ext_window_range_frame": QueryDef(
        q_ext_window_range_frame, _ORACLES["ext_window_range_frame"]
    ),
    "ext_bloom_join": QueryDef(q_ext_bloom_join, _BLOOM_JOIN_ORACLE),
    "ext_anomaly_zscore": QueryDef(q_ext_anomaly_zscore, _ANOMALY_ORACLE),
    "ext_psi_drift": QueryDef(q_ext_psi_drift, _PSI_ORACLE),
    "ext_gini": QueryDef(q_ext_gini, _GINI_ORACLE),
    "ext_record_linkage": QueryDef(q_ext_record_linkage, _LINKAGE_ORACLE),
    "ext_triangle_count": QueryDef(q_ext_triangle_count, _TRIANGLE_ORACLE),
    "ext_skyline": QueryDef(q_ext_skyline, _SKYLINE_ORACLE),
    "ext_ks_test": QueryDef(q_ext_ks_test, _KS_TEST_ORACLE),
    "ext_ab_test": QueryDef(q_ext_ab_test, _AB_TEST_ORACLE),
    "ext_pagerank": QueryDef(q_ext_pagerank, _pagerank_oracle()),
    "ext_gap_fill": QueryDef(q_ext_gap_fill, _GAP_FILL_ORACLE),
    "ext_quantile_sketch": QueryDef(
        q_ext_quantile_sketch, _QUANTILE_SKETCH_ORACLE
    ),
    "ext_changepoint": QueryDef(q_ext_changepoint, _CHANGEPOINT_ORACLE),
    "ext_funnel_latency": QueryDef(
        q_ext_funnel_latency, _FUNNEL_LATENCY_ORACLE
    ),
    "ext_hierarchy": QueryDef(q_ext_hierarchy, _HIERARCHY_ORACLE),
    "ext_rfm": QueryDef(q_ext_rfm, _RFM_ORACLE),
    "ext_assoc_rules": QueryDef(q_ext_assoc_rules, _assoc_rules_oracle()),
    "ext_geo_join": QueryDef(q_ext_geo_join, _geo_join_oracle()),
    "ext_growth": QueryDef(q_ext_growth, _GROWTH_ORACLE),
    "ext_active_users": QueryDef(q_ext_active_users, _ACTIVE_USERS_ORACLE),
    "ext_calendar_dim": QueryDef(q_ext_calendar_dim, _CALENDAR_ORACLE),
    "ext_outlier_iqr": QueryDef(q_ext_outlier_iqr, _OUTLIER_IQR_ORACLE),
    "ext_benford": QueryDef(q_ext_benford, _BENFORD_ORACLE),
    "ext_transition_matrix": QueryDef(
        q_ext_transition_matrix, _TRANSITION_ORACLE
    ),
    "ext_funnel": QueryDef(q_ext_funnel, _FUNNEL_ORACLE),
    "ext_retention": QueryDef(q_ext_retention, _RETENTION_ORACLE),
}
