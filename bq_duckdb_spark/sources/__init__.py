"""Source connectors: columnar readers with BigQuery-schema coercion.

The reference loads Parquet (+ row inserts over RPC); these readers
extend the same declared-schema contract to CSV and JSON-lines, and add
a writer for materializing tables back to parquet. All readers return
DataFrames coerced to the declared BigQuery column types so downstream
queries see identical schemas regardless of the wire format.
"""

from bq_duckdb_spark.sources.readers import (
    read_avro,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_parquet,
)

__all__ = [
    "read_parquet",
    "read_orc",
    "read_avro",
    "read_csv",
    "read_json",
    "write_parquet",
]
