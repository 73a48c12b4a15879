"""Exotic-type RPC round-trip goldens: insert → query → JSON through the
full server path for every SURVEY §1.3 type row beyond the common eight.

The reference round-trips TIME / GEOGRAPHY / JSON / RANGE / INTERVAL /
BIGNUMERIC values through its executor (src/executor/yachtsql.rs:256-309
maps each to a wire type + JSON value); types.py maps them all, and
these tests pin the full bq.createTable → bq.insert → bq.query JSON for
each, including the documented degradations (TIME reports STRING,
RANGE<T> keeps typed endpoints as a STRUCT where the reference degrades
to a debug string, BIGNUMERIC caps at DECIMAL(38,18))."""

import json

import pytest

from bq_duckdb_spark.server import RpcServer


@pytest.fixture(scope="module")
def server(spark):
    from bq_duckdb_spark.engine import SessionManager

    return RpcServer(SessionManager(spark))


@pytest.fixture()
def sid(server):
    s = _call(server, "bq.createSession")["result"]["sessionId"]
    yield s
    _call(server, "bq.destroySession", {"sessionId": s})


_id = [1000]


def _call(server, method, params=None):
    _id[0] += 1
    return server.handle_message(
        json.dumps(
            {"jsonrpc": "2.0", "id": _id[0], "method": method, "params": params or {}}
        )
    )


def _roundtrip(server, sid, table, bq_type, wire_value, col="v"):
    """createTable(col bq_type) → insert one wire row → SELECT *; returns
    the full queryResponse result dict."""
    r = _call(
        server,
        "bq.createTable",
        {"sessionId": sid, "tableName": table, "schema": [{"name": col, "type": bq_type}]},
    )
    assert r["result"] == {"success": True}, r
    r = _call(
        server,
        "bq.insert",
        {"sessionId": sid, "tableName": table, "rows": [[wire_value]]},
    )
    assert r["result"] == {"insertedRows": 1}, r
    r = _call(server, "bq.query", {"sessionId": sid, "sql": f"SELECT * FROM {table}"})
    assert "error" not in r, r
    return r["result"]


def _golden(col, wire_type, value):
    return {
        "kind": "bigquery#queryResponse",
        "schema": {"fields": [{"name": col, "type": wire_type}]},
        "rows": [{"f": [{"v": value}]}],
        "totalRows": "1",
        "jobComplete": True,
    }


def test_time_roundtrip_golden(server, sid):
    """TIME → STRING on the wire (no Spark native TIME; documented)."""
    got = _roundtrip(server, sid, "g_time", "TIME", "12:34:56")
    assert got == _golden("v", "STRING", "12:34:56")


def test_geography_wkt_roundtrip_golden(server, sid):
    """GEOGRAPHY round-trips as WKT text (yachtsql.rs:303)."""
    got = _roundtrip(server, sid, "g_geo", "GEOGRAPHY", "POINT(-122.35 47.62)")
    assert got == _golden("v", "STRING", "POINT(-122.35 47.62)")


def test_json_roundtrip_golden(server, sid):
    """JSON kept verbatim as its source text (queryable via JSON
    accessors at the SQL level)."""
    doc = '{"a": [1, 2], "b": {"c": null}}'
    got = _roundtrip(server, sid, "g_json", "JSON", doc)
    assert got == _golden("v", "STRING", doc)


def test_range_date_roundtrip_golden(server, sid):
    """RANGE<DATE> keeps typed endpoints as STRUCT<start,end> (the
    reference degrades RANGE to a debug STRING, yachtsql.rs:273 — ours
    is the stronger shape, documented in types.py)."""
    got = _roundtrip(
        server,
        sid,
        "g_range",
        "RANGE<DATE>",
        {"start": "2024-01-01", "end": "2024-02-01"},
    )
    assert got == _golden(
        "v", "STRUCT", {"start": "2024-01-01", "end": "2024-02-01"}
    )


def test_interval_roundtrip_golden(server, sid):
    """INTERVAL accepts '[D ]H:MM:SS[.ffffff]' text and serializes back
    in the SAME format (symmetric wire round-trip)."""
    got = _roundtrip(server, sid, "g_iv", "INTERVAL", "1 02:03:04.500000")
    assert got == _golden("v", "INTERVAL", "1 2:03:04.500000")
    got2 = _roundtrip(server, sid, "g_iv2", "INTERVAL", "0:00:07")
    assert got2 == _golden("v", "INTERVAL", "0:00:07")


def test_interval_negative_roundtrip(server, sid):
    got = _roundtrip(server, sid, "g_ivn", "INTERVAL", "-0:30:00")
    assert got == _golden("v", "INTERVAL", "-0:30:00")


def test_bignumeric_roundtrip_golden(server, sid):
    """BIGNUMERIC capped at DECIMAL(38,18) (documented gap): an
    18-fractional-digit value round-trips exactly, as a STRING on the
    wire (NUMERIC wire type, yachtsql.rs:260)."""
    got = _roundtrip(
        server, sid, "g_bn", "BIGNUMERIC", "12345.678901234567891234"
    )
    assert got == _golden("v", "NUMERIC", "12345.678901234567891234")


def test_bytes_base64_roundtrip_golden(server, sid):
    """BYTES arrive AND leave base64 (BigQuery wire convention)."""
    got = _roundtrip(server, sid, "g_by", "BYTES", "aGVsbG8=")
    assert got == _golden("v", "BYTES", "aGVsbG8=")


def test_timestamp_and_datetime_string_inserts(server, sid):
    """TIMESTAMP accepts ISO-8601 with 'T'/Z; DATETIME (zoneless) the
    space form — both land as real temporal types, not strings."""
    got = _roundtrip(server, sid, "g_ts", "TIMESTAMP", "2024-06-01T12:00:00Z")
    assert got == _golden("v", "TIMESTAMP", "2024-06-01 12:00:00")
    got2 = _roundtrip(server, sid, "g_dt", "DATETIME", "2024-06-01 12:00:00")
    assert got2 == _golden("v", "DATETIME", "2024-06-01 12:00:00")


def test_interval_arithmetic_via_sql(server, sid):
    """The inserted INTERVAL is a REAL DayTimeIntervalType: adding it to
    a timestamp works in SQL (a string column would fail here)."""
    _roundtrip(server, sid, "g_iv_sql", "INTERVAL", "1 00:00:00")
    r = _call(
        server,
        "bq.query",
        {
            "sessionId": sid,
            "sql": "SELECT TIMESTAMP '2024-01-01 00:00:00' + v AS t FROM g_iv_sql",
        },
    )
    assert "error" not in r, r
    assert r["result"]["rows"][0]["f"][0]["v"] == "2024-01-02 00:00:00"


def test_malformed_interval_is_loud(server, sid):
    _call(
        server,
        "bq.createTable",
        {"sessionId": sid, "tableName": "g_bad", "schema": [{"name": "v", "type": "INTERVAL"}]},
    )
    r = _call(
        server,
        "bq.insert",
        {"sessionId": sid, "tableName": "g_bad", "rows": [["tomorrow-ish"]]},
    )
    assert r["error"]["code"] == -32000
    assert "Malformed INTERVAL" in r["error"]["message"]
