"""Shared loader for the driver's testdata tables.

Centralizes the one data quirk: ``events.parquet`` carries parquet
TIMESTAMP(NANOS), which Spark only reads with
``spark.sql.legacy.parquet.nanosAsLong`` — a runtime-settable SQL conf,
set here defensively so the contract works with ANY SparkSession the
driver passes in (not just ones built by :func:`get_spark`). The
nanos-long column is then truncated to microseconds, matching DuckDB's
``epoch_us`` semantics for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # date/timestamp extraction parity with the DuckDB oracle requires a
    # UTC session — runtime-settable, so pin it here in case the driver's
    # SparkSession (or the host machine) defaults to another zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
