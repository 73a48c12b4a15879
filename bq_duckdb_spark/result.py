"""DataFrame → BigQuery ``queryResponse`` JSON (the reference's wire
format, src/executor/yachtsql.rs:207-231: ``schema.fields[]``,
``rows[].f[].v``, ``totalRows`` as string, ``jobComplete``)."""

from __future__ import annotations

import base64
import datetime
import decimal
import math

from pyspark.sql import DataFrame

from bq_duckdb_spark import types as bqtypes


def _encode_value(v):
    """JSON encoding per SURVEY §1.3: bool/number native, bytes→base64,
    date/timestamp→ISO strings, decimal→string, arrays/structs recurse,
    NULL⇄null."""
    if v is None:
        return None
    if isinstance(v, bool) or isinstance(v, int):
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return str(v)
        return v
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        # symmetric with the bq.insert INTERVAL input format:
        # "[-][D ]H:MM:SS[.ffffff]"
        total_us = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
        sign = "-" if total_us < 0 else ""
        total_us = abs(total_us)
        us = total_us % 1_000_000
        secs = total_us // 1_000_000
        d, rem = divmod(secs, 86400)
        h, rem = divmod(rem, 3600)
        m, s = divmod(rem, 60)
        frac = f".{us:06d}" if us else ""
        day = f"{d} " if d else ""
        return f"{sign}{day}{h}:{m:02d}:{s:02d}{frac}"
    if hasattr(v, "asDict"):  # Row (struct value) — a tuple subclass, so
        # this check must precede the list/tuple branch
        return {k: _encode_value(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_encode_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode_value(x) for k, x in v.items()}
    return str(v) if not isinstance(v, str) else v


def to_query_result(df: DataFrame) -> dict:
    """Intermediate shape: {"columns": [{"name","type"}], "rows": [[…]]}
    (reference QueryResult, yachtsql.rs:201-205)."""
    columns = bqtypes.columns_from_schema(df.schema)
    rows = [[_encode_value(v) for v in row] for row in df.collect()]
    return {"columns": columns, "rows": rows}


def _wire_type(bq_type: str) -> str:
    """Collapse internal type names to the reference's wire vocabulary
    (yachtsql.rs:256-276): BOOL→BOOLEAN, NUMERIC(p,s)/BIGNUMERIC→NUMERIC,
    STRUCT<...>→STRUCT, ARRAY recurses on its element. TIME has no Spark
    native type so a TIME column reports STRING here (documented
    divergence; the reference keeps a Time value type)."""
    t = bq_type.strip()
    if t.upper().startswith("ARRAY<") and t.endswith(">"):
        return f"ARRAY<{_wire_type(t[6:-1])}>"
    base = t.upper().split("<")[0].split("(")[0].strip()
    return {"BOOL": "BOOLEAN", "BIGNUMERIC": "NUMERIC", "DECIMAL": "NUMERIC"}.get(
        base, base
    )


def to_bq_response(df: DataFrame) -> dict:
    """Full BigQuery ``queryResponse`` shape (yachtsql.rs:208-231): field
    entries carry exactly {name, type} — the reference adds no mode."""
    qr = to_query_result(df)
    return {
        "kind": "bigquery#queryResponse",
        "schema": {
            "fields": [
                {"name": c["name"], "type": _wire_type(c["type"])}
                for c in qr["columns"]
            ]
        },
        "rows": [{"f": [{"v": v} for v in row]} for row in qr["rows"]],
        "totalRows": str(len(qr["rows"])),
        "jobComplete": True,
    }
