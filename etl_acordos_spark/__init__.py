"""etl_acordos_spark — a PySpark-native medallion analytics engine.

Built from scratch with the query and data-processing capabilities of
KenjiSato97/ETL-Acordos (a pandas/Airflow medallion ETL), re-expressed as
lazy Spark DataFrame plans over Catalyst, and extended with relational and
LLM-data-pipeline operators designed for 100 TB scale.

Layout:
    session    — SparkSession factory tuned for the target cluster shape
    sources    — batch sources/sinks (parquet layers, external records,
                 DBAPI upsert sink, existence checks, DDL generation)
    functions  — scalar cleaning/derivation functions (column expressions)
    operators  — relational + LLM-pipeline operators (joins, aggs, top-k,
                 dedup family, similarity search, text analysis, JSON,
                 time windows, multimodal plumbing)
    plans      — medallion pipeline builders (bronze/silver/gold, fan-out)
    streaming  — Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
