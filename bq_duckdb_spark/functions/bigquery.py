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

import pandas as pd
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
    # FARM_FINGERPRINT is a real FarmHash Fingerprint64 pandas UDF —
    # registered separately below (functions/farmhash.py).
    "TO_HEX": ("b BINARY", "STRING", "lower(hex(b))"),
    "FROM_HEX": ("s STRING", "BINARY", "unhex(s)"),
    "TO_BASE64": ("b BINARY", "STRING", "base64(b)"),
    "FROM_BASE64": ("s STRING", "BINARY", "unbase64(s)"),
    # DIV, UNIX_MICROS/MILLIS/SECONDS, TIMESTAMP_MICROS/MILLIS,
    # DATE_FROM_UNIX_DATE are Spark builtins with matching BigQuery
    # semantics — registering over them is rejected and unnecessary.
    # PARSE_/FORMAT_ bodies are filled in below: BigQuery takes %-style
    # format elements, Spark takes Java patterns, so the body translates.
    # NET.HOST: hostname of a URL (scheme optional), lowercased (the
    # authority is case-insensitive per RFC 3986), userinfo/port/path
    # stripped
    "NET_HOST": (
        "url STRING",
        "STRING",
        "lower(nullif(regexp_extract(url, "
        "'^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@ ]*@)?([^/?#: ]+)', 1), ''))",
    ),
    # NET.REG_DOMAIN approximation: last two host labels, or three when
    # the two-label tail is a common multi-part suffix. BigQuery
    # resolves against the full Public Suffix List; this covers the
    # frequent cases and documents the divergence.
    "NET_REG_DOMAIN": (
        "url STRING",
        "STRING",
        "CASE WHEN regexp_extract(NET_HOST(url), '([^.]+[.][^.]+)$', 1) IN "
        "('co.uk', 'org.uk', 'gov.uk', 'ac.uk', 'co.jp', 'co.in', 'co.kr', "
        "'com.au', 'com.br', 'com.cn', 'com.mx', 'com.tr') "
        "THEN nullif(regexp_extract(NET_HOST(url), '([^.]+[.][^.]+[.][^.]+)$', 1), '') "
        "ELSE nullif(regexp_extract(NET_HOST(url), '([^.]+[.][^.]+)$', 1), '') END",
    ),
    "DATE_TRUNC_MONTH": ("d DATE", "DATE", "CAST(date_trunc('MONTH', d) AS DATE)"),
    "LAST_DAY_OF_MONTH": ("d DATE", "DATE", "last_day(d)"),
    # BigQuery INSTR / STRPOS
    "STRPOS": ("s STRING, sub STRING", "BIGINT", "CAST(instr(s, sub) AS BIGINT)"),
    # BigQuery SPLIT: literal delimiter (dialect renames SPLIT → BQ_SPLIT
    # because Spark's builtin split takes a regex and can't be overridden).
    # \Q…\E regex-quotes arbitrary delimiters.
    "BQ_SPLIT": (
        "s STRING, d STRING",
        "ARRAY<STRING>",
        r"split(s, concat('\\Q', d, '\\E'))",
    ),
    "SAFE_OFFSET": (
        "a ARRAY<STRING>, i BIGINT",
        "STRING",
        "CASE WHEN i >= 0 AND i < size(a) THEN a[CAST(i AS INT)] ELSE NULL END",
    ),
}

# BigQuery %-style format elements → Java SimpleDateFormat-ish patterns
# (multi-char elements first so %F doesn't decompose into %-F). Covers
# the common elements; literal text that happens to contain Java pattern
# letters is passed through unquoted — a documented shim limitation.
_BQ_FMT_ELEMENTS = [
    ("%F", "yyyy-MM-dd"),
    ("%T", "HH:mm:ss"),
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%e", "d"),
    ("%j", "DDD"),
    ("%A", "EEEE"),
    ("%a", "EEE"),
    ("%B", "MMMM"),
    ("%b", "MMM"),
    ("%%", "%"),
]


def _fmt_translate_sql(var: str) -> str:
    """SQL expression translating a %-format string at runtime (no-op for
    format strings without % — Java patterns keep working)."""
    expr = var
    for bq, java in _BQ_FMT_ELEMENTS:
        expr = f"replace({expr}, '{bq}', '{java}')"
    return expr


_SQL_FUNCTIONS.update(
    {
        "PARSE_DATE": (
            "fmt STRING, s STRING",
            "DATE",
            f"to_date(s, {_fmt_translate_sql('fmt')})",
        ),
        "FORMAT_DATE": (
            "fmt STRING, d DATE",
            "STRING",
            f"date_format(d, {_fmt_translate_sql('fmt')})",
        ),
        "PARSE_TIMESTAMP": (
            "fmt STRING, s STRING",
            "TIMESTAMP",
            f"to_timestamp(s, {_fmt_translate_sql('fmt')})",
        ),
        "FORMAT_TIMESTAMP": (
            "fmt STRING, ts TIMESTAMP",
            "STRING",
            f"date_format(ts, {_fmt_translate_sql('fmt')})",
        ),
    }
)


def _farm_fingerprint_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from bq_duckdb_spark.functions.farmhash import farm_fingerprint

    @pandas_udf(LongType())
    def ff(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else farm_fingerprint(v))

    return ff


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
    # true FarmHash Fingerprint64 (BigQuery-compatible values), not a
    # lookalike hash — see functions/farmhash.py
    spark.udf.register("FARM_FINGERPRINT", _farm_fingerprint_udf())
    names.append("FARM_FINGERPRINT")
    return names
