"""Flagship query — the medallion capability surface in one lazy plan.

Runs the reference's silver-style cleaning (trim, titlecase, sentinel and
NULL defaulting — reference tasks/silver.py:37-65) over the conformed
customer dimension, joins the star schema with broadcast dimensions,
derives the gold-style hierarchy concat (reference tasks/gold.py:37-39)
and year (tasks/silver.py:69), and aggregates order revenue per
region-hierarchy per year. Scan → broadcast joins → single shuffle at the
final hash aggregate; both dimension tables never move the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_acordos_spark.functions.cleaning import (
    concat_sep,
    fill_default,
    sentinel_to_default,
    titlecase,
    trim_ws,
    year_of,
)
from etl_acordos_spark.queries.base import t


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    orders = t(spark, sf_dir, "orders")

    # silver-style conform of the customer dimension
    clean_customer = customer.select(
        "c_custkey",
        "c_nationkey",
        titlecase(trim_ws(F.lower("c_mktsegment"))).alias("segmento"),
    )

    # dims conformed once; broadcast — the fact side never shuffles for these
    dim = (
        clean_customer.join(
            F.broadcast(nation),
            clean_customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "segmento",
            concat_sep(
                [
                    sentinel_to_default(fill_default("r_name")),
                    F.col("n_name"),
                ],
                " > ",
            ).alias("hierarquia"),
        )
    )

    # The fact⋈dim strategy is left to the optimizer: nation/region are
    # forced broadcast above (always tiny), but dim derives from the
    # FULL customer table — at 100× scale a FORCED broadcast of a
    # multi-GB dim is a driver/executor memory risk, so size-based
    # selection (autoBroadcastJoinThreshold + AQE runtime stats) picks
    # broadcast when dim fits and shuffle join when it doesn't.
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .withColumn("ano", year_of("o_orderdate"))
        .groupBy("hierarquia", "segmento", "ano")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("receita"),
            F.count(F.lit(1)).alias("n_pedidos"),
            F.countDistinct("o_custkey").alias("n_clientes"),
        )
    )


FLAGSHIP_ORACLE = """
WITH dim AS (
  SELECT c_custkey,
         array_to_string(list_transform(
           string_split(lower(trim(c_mktsegment)), ' '),
           x -> upper(x[1]) || x[2:]), ' ') AS segmento,
         r_name || ' > ' || n_name AS hierarquia
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT hierarquia, segmento,
       CAST(year(o_orderdate) AS INTEGER) AS ano,
       round(sum(o_totalprice), 2) AS receita,
       count(*) AS n_pedidos,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_clientes
FROM orders JOIN dim ON o_custkey = c_custkey
GROUP BY hierarquia, segmento, ano
"""
