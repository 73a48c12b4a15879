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


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into right-sized files — the
    small-files compaction every long-lived table needs (a 100 TB table
    accumulated from streaming micro-batches or per-task writes can hold
    millions of KB-sized files; metadata handling alone then dominates
    query planning).

    File count is computed driver-side from the source's on-disk bytes
    (stat only, no Spark job), then one round-robin repartition writes
    ``ceil(bytes / target_file_bytes)`` files. ``sort_within_by``
    optionally sorts WITHIN each output file (sortWithinPartitions — no
    extra shuffle) so min/max row-group stats stay selective for the
    given columns after compaction. Returns the output file count.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
