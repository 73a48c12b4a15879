"""BigQuery-dialect functions registered as Spark SQL *SQL UDFs*
(``CREATE FUNCTION … RETURN <expr>``) — pure Catalyst expressions that
inline into the plan and stay inside whole-stage codegen; no Python in
the hot path.

This complements the dialect shim: the shim rewrites BigQuery syntax
Spark can't parse (SURVEY §4.2); this module supplies BigQuery function
NAMES Spark lacks, so transpiled queries and users typing GoogleSQL both
resolve them natively. Functions with an exact Spark builtin
(``TIMESTAMP_MICROS``, ``DATE_FROM_UNIX_DATE`` — yachtsql.rs:365-366 —
``UPPER``, ``CONCAT``, …) need no entry.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (typed arg list, return type, body expression)
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # SAFE_DIVIDE returns NULL on division by zero (BigQuery semantics)
    "SAFE_DIVIDE": (
        "x DOUBLE, y DOUBLE",
        "DOUBLE",
        "CASE WHEN y = 0 THEN NULL ELSE x / y END",
    ),
    # IEEE_DIVIDE never errors: x/0 -> +/-Inf, 0/0 -> NaN
    "IEEE_DIVIDE": (
        "x DOUBLE, y DOUBLE",
        "DOUBLE",
        "CASE WHEN y = 0 AND x = 0 THEN CAST('NaN' AS DOUBLE) "
        "WHEN y = 0 AND x > 0 THEN CAST('Infinity' AS DOUBLE) "
        "WHEN y = 0 THEN CAST('-Infinity' AS DOUBLE) ELSE x / y END",
    ),
    "REGEXP_CONTAINS": ("s STRING, pattern STRING", "BOOLEAN", "s RLIKE pattern"),
    "FARM_FINGERPRINT": ("s STRING", "BIGINT", "xxhash64(s)"),
    "TO_HEX": ("b BINARY", "STRING", "lower(hex(b))"),
    "FROM_HEX": ("s STRING", "BINARY", "unhex(s)"),
    "TO_BASE64": ("b BINARY", "STRING", "base64(b)"),
    "FROM_BASE64": ("s STRING", "BINARY", "unbase64(s)"),
    # DIV, UNIX_MICROS/MILLIS/SECONDS, TIMESTAMP_MICROS/MILLIS,
    # DATE_FROM_UNIX_DATE are Spark builtins with matching BigQuery
    # semantics — registering over them is rejected and unnecessary.
    "PARSE_DATE": ("fmt STRING, s STRING", "DATE", "to_date(s, fmt)"),
    "FORMAT_DATE": ("fmt STRING, d DATE", "STRING", "date_format(d, fmt)"),
    "DATE_TRUNC_MONTH": ("d DATE", "DATE", "CAST(date_trunc('MONTH', d) AS DATE)"),
    "LAST_DAY_OF_MONTH": ("d DATE", "DATE", "last_day(d)"),
    # BigQuery INSTR / STRPOS
    "STRPOS": ("s STRING, sub STRING", "BIGINT", "CAST(instr(s, sub) AS BIGINT)"),
    "SAFE_OFFSET": (
        "a ARRAY<STRING>, i BIGINT",
        "STRING",
        "CASE WHEN i >= 0 AND i < size(a) THEN a[CAST(i AS INT)] ELSE NULL END",
    ),
}


def register_bigquery_functions(spark: SparkSession) -> list[str]:
    """Register the BigQuery function set as temporary SQL UDFs on this
    SparkSession. Returns the registered names. Idempotent."""
    names = []
    for name, (args, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
