"""Format readers with BigQuery declared-schema coercion.

Scale notes: every reader keeps Spark's native parallel scan (one task
per file split); the coercion is a column-wise cast projection that
fuses into the scan stage. For parquet, passing the declared schema also
prunes unread columns at the footer level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bq_duckdb_spark import types as bqtypes


def _coerce(df: DataFrame, columns: list[dict] | None) -> DataFrame:
    if not columns:
        return df
    schema = bqtypes.schema_from_columns(columns)
    return df.select(
        [df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def read_parquet(
    spark: SparkSession, path: str, columns: list[dict] | None = None
) -> DataFrame:
    """Parquet → DataFrame, coerced to the declared BigQuery schema
    (the reference's bq.loadParquet semantics, yachtsql.rs:43-117,
    without the row pivot)."""
    return _coerce(spark.read.parquet(path), columns)


def read_csv(
    spark: SparkSession,
    path: str,
    columns: list[dict] | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV → DataFrame. With a declared schema the text scan parses
    directly into the target types (no inference pass over the data —
    at 100 TB an inference pass is a full extra read)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if columns:
        reader = reader.schema(bqtypes.schema_from_columns(columns))
        return reader.csv(path)
    return reader.option("inferSchema", "true").csv(path)


def read_json(
    spark: SparkSession, path: str, columns: list[dict] | None = None
) -> DataFrame:
    """JSON-lines → DataFrame; declared schema avoids the inference
    scan and keeps unknown keys out of the projection."""
    reader = spark.read
    if columns:
        reader = reader.schema(bqtypes.schema_from_columns(columns))
        return reader.json(path)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, columns: list[dict] | None = None
) -> DataFrame:
    """ORC → DataFrame with declared-schema coercion (columnar scan,
    predicate pushdown and column pruning work as with parquet)."""
    return _coerce(spark.read.orc(path), columns)


def read_avro(
    spark: SparkSession, path: str, columns: list[dict] | None = None
) -> DataFrame:
    """Avro → DataFrame. Requires the external spark-avro module, which
    is not bundled in this environment — gated with a clear error."""
    try:
        df = spark.read.format("avro").load(path)
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            raise RuntimeError(
                "Avro support requires the spark-avro package "
                "(--packages org.apache.spark:spark-avro); not bundled here"
            ) from e
        raise
    return _coerce(df, columns)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Materialize a table snapshot. ``partition_by`` produces the
    hive-layout directories that enable partition pruning on re-read —
    the at-rest layout choice that matters most at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
