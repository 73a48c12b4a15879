"""Warehouse storage-layout walkthrough — runnable documentation for
the BigQuery storage DDL surface (PARTITION BY / CLUSTER BY), the
multi-format loaders, and EXPORT DATA.

    python examples/warehouse_layout.py [sf_dir]

Stages:
  1. load the orders table through the session loader
  2. CTAS a date-partitioned, key-clustered snapshot
  3. show that a partition filter PRUNES at the scan (the plan carries
     PartitionFilters — at 100 TB this is the difference between
     touching one day and touching the whole table)
  4. EXPORT DATA a filtered slice as sharded CSV
  5. reload the export through bq.loadCsv-equivalent and re-aggregate
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bq_duckdb_spark import get_spark
from bq_duckdb_spark.engine import Session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="warehouse-layout-example")
    s = Session(spark)
    out_root = tempfile.mkdtemp(prefix="warehouse_layout_")

    # 1. load through the session loader (parquet here; bq.loadCsv /
    #    bq.loadJson / bq.loadOrc take the same declared-schema path)
    n = s.load_parquet("orders", f"{sf_dir}/orders.parquet")
    print(f"loaded orders: {n} rows")

    # 2. partitioned + clustered snapshot: directories on the order
    #    date, files range-sorted on the customer key
    s.query(
        "CREATE TABLE orders_by_day PARTITION BY o_orderdate CLUSTER BY o_custkey "
        "AS SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders"
    )
    desc = s.describe_table("orders_by_day")
    print(f"storage spec: partitionBy={desc['partitionBy']} clusterBy={desc['clusterBy']}")

    # 3. a one-day filter prunes at the directory level
    day = s.query("SELECT min(o_orderdate) AS d FROM orders").collect()[0]["d"]
    one_day = s.query(
        f"SELECT count(*) AS c, sum(o_totalprice) AS rev FROM orders_by_day "
        f"WHERE o_orderdate = DATE '{day}'"
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    pruned = "PartitionFilters: [" in plan and str(day) in plan
    print(f"one-day scan pruned at source: {pruned}")
    print(one_day.collect()[0].asDict())

    # 4. sharded CSV export of a slice (the '*' is the shard wildcard)
    export_dir = f"{out_root}/day_csv"
    s.query(
        f"EXPORT DATA OPTIONS(uri='{export_dir}/*.csv', format='CSV', "
        f"header=true) AS SELECT o_orderkey, o_totalprice FROM orders_by_day "
        f"WHERE o_orderdate = DATE '{day}'"
    )
    shards = [f for f in os.listdir(export_dir) if f.endswith(".csv")]
    print(f"exported {len(shards)} CSV shard(s) to {export_dir}")

    # 5. round-trip: reload the export and re-aggregate
    s.load_csv(
        "day_reloaded",
        export_dir,
        columns=[
            {"name": "o_orderkey", "type": "INT64"},
            {"name": "o_totalprice", "type": "FLOAT64"},
        ],
    )
    back = s.query(
        "SELECT count(*) AS c, sum(o_totalprice) AS rev FROM day_reloaded"
    ).collect()[0]
    print(f"reloaded: {back.asDict()}")
    s.destroy()


if __name__ == "__main__":
    main()
