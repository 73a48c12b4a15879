"""dbt-style data tests on DAG tables: violations fail the table AFTER
materialization and skip transitive dependents; passing tests are
invisible; all four rule kinds work; parallel runs behave identically."""

import pytest

from tests.conftest import rows


def _defs(bad_rows, tests):
    return [
        {"name": "raw", "schema": [{"name": "k", "type": "INT64"},
                                   {"name": "s", "type": "STRING"}],
         "rows": bad_rows},
        {"name": "staged", "sql": "SELECT k, s FROM raw", "tests": tests},
        {"name": "final", "sql": "SELECT count(*) AS n FROM staged"},
    ]


def test_passing_tests_are_invisible(session):
    session.pipeline.register(
        _defs(
            [[1, "a"], [2, "b"]],
            [
                {"type": "unique", "columns": ["k"]},
                {"type": "not_null", "columns": ["k", "s"]},
                {"type": "accepted_values", "column": "s", "values": ["a", "b"]},
                {"type": "expression", "predicate": "k > 0", "name": "positive_k"},
            ],
        )
    )
    res = session.pipeline.run()
    assert res.success
    assert rows(session.query("SELECT n FROM final")) == [(2,)]


def test_failing_test_fails_table_and_skips_dependents(session):
    session.pipeline.register(
        _defs([[1, "a"], [1, "b"]], [{"type": "unique", "columns": ["k"]}])
    )
    res = session.pipeline.run()
    assert not res.success
    assert [f["table"] for f in res.failed] == ["staged"]
    assert "unique:k" in res.failed[0]["error"]
    assert "1 violation" in res.failed[0]["error"]
    assert res.skipped == ["final"]
    # dbt semantics: the table IS materialized, just marked failed
    assert rows(session.query("SELECT count(*) FROM staged")) == [(2,)]


def test_expression_and_accepted_values_fail(session):
    session.pipeline.register(
        _defs(
            [[-1, "zzz"]],
            [
                {"type": "expression", "predicate": "k > 0", "name": "positive_k"},
                {"type": "accepted_values", "column": "s", "values": ["a", "b"]},
            ],
        )
    )
    res = session.pipeline.run()
    assert not res.success
    assert "positive_k" in res.failed[0]["error"]


def test_null_is_not_an_accepted_values_violation(session):
    session.pipeline.register(
        _defs(
            [[1, None]],
            [{"type": "accepted_values", "column": "s", "values": ["a"]}],
        )
    )
    assert session.pipeline.run().success


def test_parallel_run_same_semantics(session):
    session.pipeline.register(
        _defs([[1, "a"], [1, "b"]], [{"type": "unique", "columns": ["k"]}])
    )
    res = session.pipeline.run(parallel=True)
    assert not res.success
    assert [f["table"] for f in res.failed] == ["staged"]
    assert res.skipped == ["final"]


def test_unknown_rule_type_rejected(session):
    session.pipeline.register(
        _defs([[1, "a"]], [{"type": "nope"}])
    )
    res = session.pipeline.run()
    assert not res.success
    assert "unknown data-test type" in res.failed[0]["error"]


def test_unknown_column_fails_loud(session):
    session.pipeline.register(
        _defs([[1, "a"]], [{"type": "not_null", "columns": ["nope"]}])
    )
    res = session.pipeline.run()
    assert not res.success
    assert any("unknown column 'nope'" in f["error"] for f in res.failed)


def test_quoted_identifiers_in_rules(session):
    # a column name with a space passes through backtick quoting
    session.pipeline.register([
        {"name": "raw2", "schema": [{"name": "k", "type": "INT64"}],
         "rows": [[1], [2]]},
        {"name": "staged2", "sql": "SELECT k AS `od d` FROM raw2",
         "tests": [{"type": "unique", "columns": ["od d"]},
                   {"type": "not_null", "columns": ["od d"]}]},
    ])
    assert session.pipeline.run().success


def test_rule_columns_case_insensitive(session):
    # Spark (and BigQuery) resolve columns case-insensitively; the
    # schema validation must not be stricter than the engine
    session.pipeline.register(
        _defs([[1, "a"]], [{"type": "not_null", "columns": ["K", "S"]}])
    )
    assert session.pipeline.run().success
