"""Drive the engine exactly as the reference's client adaptors do:
JSON-RPC 2.0 over a real WebSocket — session lifecycle, row insert,
interactive SQL, DAG registration WITH data tests, pipeline run, plan
introspection.

    python examples/rpc_client.py

Starts an in-process server on an ephemeral port and runs the whole
client workflow against it; swap the connect address to point at a
long-running `serve` deployment unchanged.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def scenario() -> None:
    from bq_duckdb_spark import get_spark, wsproto
    from bq_duckdb_spark.engine import SessionManager
    from bq_duckdb_spark.server import start_websocket

    manager = SessionManager(get_spark(app_name="rpc-client-example"))
    ws = await start_websocket(manager, host="127.0.0.1", port=0)
    port = ws.sockets[0].getsockname()[1]
    reader, writer = await wsproto.client_connect("127.0.0.1", port)
    rid = [0]

    async def rpc(method, params=None):
        rid[0] += 1
        await wsproto.client_send_text(
            writer,
            json.dumps({"jsonrpc": "2.0", "id": rid[0], "method": method,
                        "params": params or {}}),
        )
        resp = json.loads(await wsproto.client_recv_text(reader))
        if "error" in resp:
            raise RuntimeError(f"{method}: {resp['error']}")
        return resp["result"]

    print("ping:", await rpc("bq.ping"))
    sid = (await rpc("bq.createSession"))["sessionId"]

    # source table + rows, the insert path
    await rpc("bq.createTable", {
        "sessionId": sid, "tableName": "events",
        "schema": [{"name": "user_id", "type": "INT64"},
                   {"name": "kind", "type": "STRING"},
                   {"name": "amount", "type": "FLOAT64"}],
    })
    ins = await rpc("bq.insert", {
        "sessionId": sid, "tableName": "events",
        "rows": [[1, "view", 0.0], [1, "purchase", 30.0],
                 [2, "view", 0.0], [2, "purchase", 250.0], [3, "view", 0.0]],
    })
    print("inserted:", ins)

    # interactive SQL in the BigQuery response wire shape
    res = await rpc("bq.query", {
        "sessionId": sid,
        "sql": "SELECT kind, COUNT(*) AS n, SUM(amount) AS total "
               "FROM events GROUP BY kind ORDER BY kind",
    })
    print("query rows:", res["totalRows"],
          [[f["v"] for f in r["f"]] for r in res["rows"]])

    # a DAG with a data test on the derived table (tier-6 extension):
    # conversion requires amount > 0 — the planted rows satisfy it
    await rpc("bq.registerDag", {
        "sessionId": sid,
        "tables": [
            {"name": "conversions",
             "sql": "SELECT user_id, amount FROM events WHERE kind = 'purchase'",
             "tests": [{"type": "unique", "columns": ["user_id"]},
                       {"type": "expression", "predicate": "amount > 0",
                        "name": "positive_amount"}]},
            {"name": "report",
             "sql": "SELECT COUNT(*) AS converted, SUM(amount) AS revenue "
                    "FROM conversions"},
        ],
    })
    run = await rpc("bq.runDag", {"sessionId": sid})
    print("dag run:", run)
    rep = await rpc("bq.query", {"sessionId": sid, "sql": "SELECT * FROM report"})
    print("report:", [[f["v"] for f in r["f"]] for r in rep["rows"]])

    # physical-plan introspection (bq.explain extension)
    plan = await rpc("bq.explain", {
        "sessionId": sid,
        "sql": "SELECT kind, COUNT(*) FROM events GROUP BY kind",
    })
    print("plan head:", plan["plan"].splitlines()[0])

    await rpc("bq.destroySession", {"sessionId": sid})
    writer.close()
    ws.close()
    await ws.wait_closed()


if __name__ == "__main__":
    asyncio.run(scenario())
