"""Engine-extensibility surface: UDF / UDAF / UDTF registration, cube
grouping sets, array-map-math function medley, and a salted two-stage
aggregation for skewed keys (SURVEY.md §2.6 gap map — none of these
exist in the 558-line reference).

UDF guidance encoded here: scalar and grouped-agg UDFs are Arrow-batched
pandas UDFs (vectorized over columns — the 10-100× path); the UDTF is a
Spark 4 Python UDTF registered with `spark.udtf.register`. All three are
demonstrations of the *registration machinery* — the actual logic is
deliberately SQL-expressible so DuckDB can oracle-check the plumbing
end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from etl_acordos_spark.queries.base import QueryDef, t
from etl_acordos_spark.sources.pyds import read_records_feed

# ------------------------------------------------------------- scalar UDF
# UDFs are built inside the query functions: pandas_udf parses its
# returnType against the active session, so module import must stay
# session-free.


def make_discounted_price():
    """Vectorized scalar UDF: net price after discount (whole Arrow
    batches — numpy arithmetic, no per-row Python)."""

    @pandas_udf("double")
    def discounted_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1.0 - discount)).round(4)

    return discounted_price


def q_ext_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    discounted_price = make_discounted_price()
    spark.udf.register("discounted_price", discounted_price)
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias(
                "net_price"
            ),
        )
    )


# ------------------------------------------------------------ grouped UDAF


def make_weighted_avg_price():
    """Grouped-aggregate pandas UDF (UDAF): quantity-weighted mean
    price. One numpy reduction per group partition."""

    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return round(float((price * qty).sum() / qty.sum()), 4)

    return weighted_avg_price


def q_ext_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    weighted_avg_price = make_weighted_avg_price()
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")).alias(
                "w_avg_price"
            )
        )
    )


# ------------------------------------------------------------------ UDTF


@udtf(returnType="p_partkey: bigint, word: string")
class SplitWords:
    """Python UDTF (Spark 4): one output row per whitespace token.
    Table functions are the hook for fan-out transforms that don't fit
    a scalar signature (parsers, tokenizers, span extractors)."""

    def eval(self, p_partkey: int, name: str):  # noqa: D102
        if name is None:
            return
        for w in name.split(" "):
            yield (p_partkey, w)


def q_ext_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_words", SplitWords)
    t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        "SELECT s.p_partkey, s.word"
        " FROM part_v, LATERAL split_words(p_partkey, p_name) s"
    )


# ------------------------------------------------------------------- cube


def q_ext_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping indicators —
    one shuffle computes all four grouping sets."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "revenue"
        )
    )


# -------------------------------------------------- array / map / math fns


def q_ext_array_map_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map/math medley per order: collect quantities, reduce with
    higher-order functions, look up through a map — emitted as scalars
    so the oracle hash is type-stable."""
    per_order = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list("l_quantity")).alias("qtys"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )
    return per_order.select(
        "l_orderkey",
        F.size("qtys").alias("n_lines"),
        F.element_at("qtys", 1).alias("min_qty"),
        F.element_at("qtys", -1).alias("max_qty"),
        F.round(
            F.aggregate("qtys", F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sum_qty"),
        F.round(F.sqrt("total_price"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("total_price") + 1.0), 4).alias("log_price"),
        F.element_at(
            F.create_map(F.lit("n"), F.size("qtys").cast("double")), "n"
        ).alias("map_n"),
    )


# --------------------------------------------- salted two-stage aggregation


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: salt the key into
    *salt_buckets* sub-keys (stage 1 spreads a hot key across that many
    reducers), then combine partials (stage 2 shuffles only
    #keys × buckets pre-aggregated rows).

    This is the manual fallback when AQE skew handling can't apply
    (e.g. agg state too large per hot key). Partial sums/counts compose;
    the final mean is derived, never averaged-of-averages.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(value).alias("_s")
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_n").alias("n"),
            F.round(F.sum("_s"), 4).alias("total"),
        )
        # n = sum of per-salt group counts >= 1 whenever the group
        # exists — structurally positive (ANSI-safe)
        .withColumn("mean", F.round(F.col("total") / F.col("n"), 4))
    )


def q_ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_agg(
        t(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


# --------------------------------------------- Python DataSource connector


def q_ext_pyds_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom batch connector (Spark 4 Python DataSource API):
    driver-side split planning, executor-side per-split reads — the
    cluster-scale generalization of the reference's single-process
    gspread ingest. Deterministic feed, so SQL `range()` is the oracle."""
    return read_records_feed(spark, rows=5000, partitions=8)


# ----------------------------------------------------------------- oracles

_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1.0 - l_discount), 4) AS net_price
FROM lineitem
"""

_UDAF_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS w_avg_price
FROM lineitem
GROUP BY l_returnflag
"""

_UDTF_ORACLE = """
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
FROM part
"""

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       count(*) AS n,
       round(sum(l_extendedprice), 4) AS revenue
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""

_ARRAY_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list(l_quantity)) AS qtys,
         round(sum(l_extendedprice), 4) AS total_price
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_lines,
       qtys[1] AS min_qty,
       qtys[-1] AS max_qty,
       round(list_sum(qtys), 4) AS sum_qty,
       round(sqrt(total_price), 4) AS sqrt_price,
       round(ln(total_price + 1.0), 4) AS log_price,
       CAST(len(qtys) AS DOUBLE) AS map_n
FROM per_order
"""

_SALTED_ORACLE = """
SELECT l_returnflag,
       count(*) AS n,
       round(sum(l_extendedprice), 4) AS total,
       round(round(sum(l_extendedprice), 4) / count(*), 4) AS mean
FROM lineitem
GROUP BY l_returnflag
"""

_PYDS_ORACLE = """
SELECT i AS id,
       'rec_' || i AS name,
       CAST(i AS DOUBLE) * 0.5 AS score,
       i % 7 = 0 AS flagged
FROM range(5000) t(i)
"""

QUERIES: dict[str, QueryDef] = {
    "ext_pyds_source": QueryDef(q_ext_pyds_source, _PYDS_ORACLE),
    "ext_udf_scalar": QueryDef(q_ext_udf_scalar, _UDF_ORACLE),
    "ext_udaf_grouped": QueryDef(q_ext_udaf_grouped, _UDAF_ORACLE),
    "ext_udtf": QueryDef(q_ext_udtf, _UDTF_ORACLE),
    "ext_cube": QueryDef(q_ext_cube, _CUBE_ORACLE),
    "ext_array_map_math": QueryDef(q_ext_array_map_math, _ARRAY_ORACLE),
    "ext_salted_agg": QueryDef(q_ext_salted_agg, _SALTED_ORACLE),
}
