"""Multi-session concurrency under load: many threads driving DDL,
inserts, queries, and DAG runs through ONE RpcServer on ONE
SparkSession — the deployment shape of the reference's session manager
(manager.rs:1015-1067 registers 20 tables from parallel tasks;
manager.rs:659-777 runs DAGs across sessions in parallel). Pins
isolation (no session ever observes another's rows), correctness under
interleaving, and that no request errors out.

Threading model note: RpcServer is a plain object — Spark's session is
thread-safe for concurrent actions, catalog mutations go through the
engine's per-session registries, and the GIL serializes the Python
bookkeeping; these tests are the proof that holds at 20+ threads."""

from __future__ import annotations

import itertools
import json
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from bq_duckdb_spark.server import RpcServer

N_THREADS = 22

_ids = itertools.count(1)


@pytest.fixture(scope="module")
def server(spark):
    from bq_duckdb_spark.engine import SessionManager

    return RpcServer(SessionManager(spark))


def call(server, method, params=None):
    """Thread-safe RPC helper (unique ids from an atomic counter)."""
    rid = next(_ids)
    resp = server.handle_message(
        json.dumps(
            {"jsonrpc": "2.0", "id": rid, "method": method,
             "params": params or {}}
        )
    )
    assert resp["id"] == rid
    assert "error" not in resp, f"{method}: {resp.get('error')}"
    return resp["result"]


def _scalar(result):
    return result["rows"][0]["f"][0]["v"]


def test_parallel_sessions_queries_and_dags_isolated(server):
    """22 threads, one session each: DDL + inserts + repeated queries +
    a DAG register/run per thread, all interleaved on one Spark
    session. Every session must see exactly its own row count and its
    own DAG output — any cross-session leakage or lost update fails a
    per-thread value assertion."""
    barrier = threading.Barrier(N_THREADS)

    def worker(i: int) -> None:
        sid = call(server, "bq.createSession")["sessionId"]
        try:
            barrier.wait(timeout=120)  # maximize interleaving
            call(server, "bq.createTable", {
                "sessionId": sid, "tableName": "users",
                "schema": [{"name": "id", "type": "INT64"}],
            })
            call(server, "bq.insert", {
                "sessionId": sid, "tableName": "users",
                "rows": [[k] for k in range(i + 1)],
            })
            # repeated queries while every other thread churns
            for _ in range(2):
                got = call(server, "bq.query", {
                    "sessionId": sid,
                    "sql": "SELECT count(*) AS c FROM users",
                })
                assert _scalar(got) == i + 1, f"thread {i}"
            # per-session DAG: derived table over this session's rows
            call(server, "bq.registerDag", {
                "sessionId": sid,
                "tables": [{
                    "name": "user_stats",
                    "sql": "SELECT count(*) AS n, max(id) AS mx FROM users",
                }],
            })
            call(server, "bq.runDag", {"sessionId": sid})
            got = call(server, "bq.query", {
                "sessionId": sid, "sql": "SELECT n, mx FROM user_stats",
            })
            fields = got["rows"][0]["f"]
            assert [f["v"] for f in fields] == [i + 1, i], i
        finally:
            call(server, "bq.destroySession", {"sessionId": sid})

    with ThreadPoolExecutor(max_workers=N_THREADS) as pool:
        futures = [pool.submit(worker, i) for i in range(N_THREADS)]
        for f in futures:
            f.result(timeout=600)  # re-raises any worker assertion


def test_parallel_table_registrations_one_session(server):
    """manager.rs:1015-1067 parity: 20 tables registered into ONE
    session from parallel tasks — all must land, each with its own
    rows, and the catalog listing must show every one."""
    sid = call(server, "bq.createSession")["sessionId"]
    n_tables = 20
    barrier = threading.Barrier(n_tables)

    def register(i: int) -> None:
        barrier.wait(timeout=120)
        call(server, "bq.createTable", {
            "sessionId": sid, "tableName": f"t{i:02d}",
            "schema": [{"name": "v", "type": "INT64"}],
        })
        call(server, "bq.insert", {
            "sessionId": sid, "tableName": f"t{i:02d}",
            "rows": [[k] for k in range(i + 1)],
        })

    try:
        with ThreadPoolExecutor(max_workers=n_tables) as pool:
            for f in [pool.submit(register, i) for i in range(n_tables)]:
                f.result(timeout=600)
        listed = call(server, "bq.listTables", {"sessionId": sid})
        names = {t["name"] for t in listed["tables"]}
        assert {f"t{i:02d}" for i in range(n_tables)} <= names
        for i in range(n_tables):
            got = call(server, "bq.query", {
                "sessionId": sid,
                "sql": f"SELECT count(*) AS c FROM t{i:02d}",
            })
            assert _scalar(got) == i + 1, i
    finally:
        call(server, "bq.destroySession", {"sessionId": sid})


def test_parallel_dag_runs_across_sessions(server):
    """manager.rs:659-777 parity: DAG runs across many sessions execute
    in parallel without cross-talk — each session's 3-table chain
    (src -> mid -> out) must compute from ITS OWN source rows."""
    n = 12
    sids = [call(server, "bq.createSession")["sessionId"] for _ in range(n)]
    barrier = threading.Barrier(n)

    def run(i: int) -> None:
        sid = sids[i]
        call(server, "bq.createTable", {
            "sessionId": sid, "tableName": "src",
            "schema": [{"name": "v", "type": "INT64"}],
        })
        call(server, "bq.insert", {
            "sessionId": sid, "tableName": "src",
            "rows": [[k * (i + 1)] for k in range(5)],
        })
        call(server, "bq.registerDag", {
            "sessionId": sid,
            "tables": [
                {"name": "mid", "sql": "SELECT v * 2 AS w FROM src"},
                {"name": "out", "sql": "SELECT sum(w) AS s FROM mid"},
            ],
        })
        barrier.wait(timeout=120)
        res = call(server, "bq.runDag", {"sessionId": sid})
        assert res["success"] is True, res
        got = call(server, "bq.query", {
            "sessionId": sid, "sql": "SELECT s FROM out",
        })
        # sum(2 * k * (i+1), k=0..4) = 20 * (i+1)
        assert _scalar(got) == 20 * (i + 1), i

    try:
        with ThreadPoolExecutor(max_workers=n) as pool:
            for f in [pool.submit(run, i) for i in range(n)]:
                f.result(timeout=600)
    finally:
        for sid in sids:
            call(server, "bq.destroySession", {"sessionId": sid})


def test_parallel_partitioned_ctas_and_export(server, tmp_path):
    """N sessions concurrently run partitioned+clustered CTAS, a pruned
    read-back, and an EXPORT DATA — the round-6 storage surface under
    the same interleaving the query/DAG tests pin."""

    def work(i: int):
        sid = call(server, "bq.createSession")["sessionId"]
        call(server, "bq.query", {
            "sessionId": sid,
            "sql": "CREATE TABLE src (d INT64, k INT64, v STRING)",
        })
        call(server, "bq.insert", {
            "sessionId": sid, "tableName": "src",
            "rows": [[d, k, f"v{i}_{d}_{k}"] for d in range(3) for k in range(4)],
        })
        call(server, "bq.query", {
            "sessionId": sid,
            "sql": "CREATE TABLE laid PARTITION BY d CLUSTER BY k AS SELECT * FROM src",
        })
        one = call(server, "bq.query", {
            "sessionId": sid, "sql": "SELECT count(*) AS c FROM laid WHERE d = 1",
        })
        assert str(_scalar(one)) == "4"
        # session-unique marker must be the one this session wrote
        probe = call(server, "bq.query", {
            "sessionId": sid,
            "sql": "SELECT v FROM laid WHERE d = 0 AND k = 0",
        })
        assert probe["rows"][0]["f"][0]["v"] == f"v{i}_0_0"
        out = tmp_path / f"exp_{i}"
        call(server, "bq.query", {
            "sessionId": sid,
            "sql": f"EXPORT DATA OPTIONS(uri='{out}/*.json', format='JSON') "
                   "AS SELECT d, k FROM laid WHERE d = 2",
        })
        desc = call(server, "bq.describeTable", {"sessionId": sid, "tableName": "laid"})
        assert desc.get("partitionBy") == "d" and desc.get("clusterBy") == ["k"]
        call(server, "bq.destroySession", {"sessionId": sid})
        return i

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        assert sorted(ex.map(work, range(N_THREADS))) == list(range(N_THREADS))
