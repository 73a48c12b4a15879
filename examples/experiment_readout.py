"""Product-analytics readout over the events stream — runnable
documentation for the tier-3/tier-6 analytics operators.

    python examples/experiment_readout.py [sf_dir]

Stages:
  1. data quality screen      (q_outliers_mad: robust per-type outliers)
  2. engagement rollup        (HLL partials: daily distinct users,
                               re-rolled to weeks without raw re-scan)
  3. conversion funnel        (view -> click -> purchase, ordered)
  4. experiment readout       (hash-split A/B + two-proportion z-test)
  5. attribution              (interval-join clicks to preceding views)

Each stage prints a small summary; at 100 TB the same code runs with
the events path swapped — the HLL partial table is the piece you
persist (bounded size, merge-by-union), everything else is one or two
shuffles per stage as documented in the operator docstrings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import bq_duckdb_spark.contract_tier3 as t3
    import bq_duckdb_spark.contract_tier6 as t6
    from bq_duckdb_spark import get_spark
    from bq_duckdb_spark.operators.sketches import hll_partials, hll_rollup
    from bq_duckdb_spark.testdata import load_table

    spark = get_spark(app_name="experiment-readout-example")
    events = load_table(spark, sf_dir, "events")

    # 1. robust data-quality screen: MAD outliers per event type
    print("== value outliers per event type (median/MAD screen) ==")
    t6.q_outliers_mad(spark, sf_dir).orderBy("event_type").show()

    # 2. daily distinct-user partials, re-rolled weekly from the stored
    #    sketches alone (the 100 TB pattern: raw data read ONCE)
    daily = hll_partials(
        events.withColumn("day", F.to_date("ts")),
        ["day"],
        "user_id",
    )
    weekly = hll_rollup(
        daily.withColumn("week", F.weekofyear("day")), ["week"]
    )
    print("== weekly distinct users (union of stored daily sketches) ==")
    weekly.orderBy("week").show()

    # 3. conversion funnel
    print("== view -> click -> purchase funnel ==")
    t3.q_funnel(spark, sf_dir).show()

    # 4. A/B readout: deterministic hash split + pooled z
    print("== A/B readout (hash-split, two-proportion z) ==")
    t6.q_ab_test(spark, sf_dir).show()

    # 5. click-to-view attribution within 10 minutes
    print("== attribution: clicks joined to preceding views ==")
    from bq_duckdb_spark.streaming import click_attribution

    click_attribution(events).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed")
    ).orderBy(F.col("n_attributed").desc()).show(5)


if __name__ == "__main__":
    main(*sys.argv[1:2])
