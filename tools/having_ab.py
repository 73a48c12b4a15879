"""Controlled A/B attribution for the q_having slowdown flagged by the
round-10 gates bench (r8 0.237 s -> r10 0.41 s trimmed at sf0.1,
outside the CI band; SIMHASH_r9.md protocol).

Suspect: round 9's cross-engine determinism fix (commit 9ba61c4)
switched the money sum from a plain DOUBLE sum to exact DECIMAL(30,6)
accumulation (gen_fuzz caught a double-sum landing ON the 2dp rounding
boundary, where engine accumulation order flips the rounded cent).
Precision 30 is beyond Spark's DecimalAggregates unscaled-long rewrite
(needs precision + 10 <= 18), so the sum runs on the slow Decimal128
path — a real, known price, but it must be MEASURED as the cause
rather than assumed.

Arms, each the full q_having pipeline on orders at $SPARK_GRAFT_SF_DIR
(default sf0.1), finishing with the same repartition(1) display sort
and a noop write:

  double   — the round-8 form: round(sum(o_totalprice), 2).
  decimal  — the current form: round(sum(cast(o_totalprice as
             decimal(30,6))), 2) cast back to double.

Protocol: alternating FRESH SUBPROCESS per sample so session JIT/GC
state cannot bias an arm; n per arm; trimmed mean + 95% CI.

Usage:  python tools/having_ab.py [n_per_arm]
        python tools/having_ab.py --child <arm>   (internal)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _build(spark, arm: str):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    if arm == "double":
        total = F.round(F.sum("o_totalprice"), 2).alias("total_spent")
    elif arm == "decimal":
        total = (
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_spent")
        )
    else:
        raise SystemExit(f"unknown arm {arm}")
    out = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"), total)
        .filter(F.col("order_count") >= 5)
    )
    return out.repartition(1).sortWithinPartitions("o_custkey")


def _child(arm: str) -> None:
    from bq_duckdb_spark import get_spark

    spark = get_spark(app_name=f"having-ab-{arm}", cpus=CPUS)
    _build(spark, arm).write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(5):
        t0 = time.time()
        _build(spark, arm).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    print(json.dumps({"arm": arm, "sec": round(statistics.median(runs), 3)}))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    arms = ["double", "decimal"]
    samples: dict[str, list[float]] = {a: [] for a in arms}
    for i in range(n):
        for arm in arms:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", arm],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            samples[arm].append(rec["sec"])
            print(f"sample {i+1}/{n} {arm:8s} {rec['sec']:.3f}s", flush=True)
    for arm in arms:
        s = sorted(samples[arm])
        trimmed = statistics.mean(s[1:-1]) if len(s) >= 3 else statistics.mean(s)
        ci = (2.776 * statistics.stdev(s) / math.sqrt(len(s))
              if len(s) >= 2 else 0.0)
        print(f"{arm:8s} trimmed={trimmed:.3f}s ci95=±{ci:.3f} "
              f"samples={[f'{x:.2f}' for x in s]}")


if __name__ == "__main__":
    main()
