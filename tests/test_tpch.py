"""TPC-H suite (contract_tpch) — every entry oracle-checked against DuckDB
at sf0.001 inside the test run, plus plan-shape pins for the patterns that
matter at scale (broadcast dims, TakeOrderedAndProject top-k, pushed
filters, no cartesian products)."""

import hashlib

import duckdb
import pytest

from bq_duckdb_spark import contract_tpch

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


def _normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _value_hash(cols, rows_):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_normalize(r[i]) for i in order) for r in rows_)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(contract_tpch.queries()))
def test_tpch_oracle_parity(spark, ddb, name):
    fn = contract_tpch.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(contract_tpch.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    assert _value_hash(scols, srows) == _value_hash(ocols, orows), (
        f"{name}: value hash mismatch"
    )


def test_every_query_has_an_oracle():
    assert sorted(contract_tpch.queries()) == sorted(contract_tpch.oracle_sql())
    assert len(contract_tpch.queries()) == 19  # q02,q04,q06..q22


def test_q10_topk_plan_is_take_ordered(spark):
    plan = contract_tpch.q10_returned_items(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q06_filters_pushed_to_scan(spark):
    df = contract_tpch.q06_forecast_revenue(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # at least the shipdate bound reaches the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q05_and_q07_broadcast_the_dims(spark):
    for fn in (contract_tpch.q07_volume_shipping, contract_tpch.q09_product_profit):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


def test_no_cartesian_products_anywhere(spark):
    for name, fn in contract_tpch.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
