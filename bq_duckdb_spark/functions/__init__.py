"""BigQuery function surface for Spark SQL."""

from bq_duckdb_spark.functions.bigquery import register_bigquery_functions

__all__ = ["register_bigquery_functions"]
