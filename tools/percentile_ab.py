"""Controlled A/B/C attribution for the q_percentiles round-9 slowdown
(VERDICT r9 item 2, SIMHASH_r9.md protocol).

Arms, each a full q_percentiles-shaped pipeline at $SPARK_GRAFT_SF_DIR
(default sf0.1) finishing with the same repartition(1) display sort and
a noop write:

  r8      — the round-8 SQL text (2 lineitem scans: counts broadcast
            into picked, aggregate directly; no all-NULL-group join).
  r9      — the round-9 generated percentile_interp_sql text
            (3 lineitem scans: counts is ALSO the stream side of the
            final NULL-group-preserving LEFT JOIN).
  local   — round-10 candidate: counts collected once (bounded by the
            same #groups <= broadcast-threshold assumption the SQL
            form already makes) into a LocalRelation temp view; the
            generated SQL is reused verbatim with counts pointing at
            the view (2 lineitem scans, scan-free joins).

Protocol: alternating FRESH SUBPROCESS per sample (r8, r9, local,
r8, ...) so session-level JIT/GC state cannot bias an arm; n samples
per arm; trimmed mean + 95% CI reported. Each subprocess pays its own
Spark startup; only the query wall time is recorded (warm-up run +
timed run inside the subprocess, reporting the timed run).

Usage:  python tools/percentile_ab.py [n_per_arm]
        python tools/percentile_ab.py --child <arm>   (internal)
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

R8_SQL = """
WITH counts AS (
    SELECT l_returnflag, count(*) AS n
    FROM lineitem GROUP BY l_returnflag
),
ranked AS (
    SELECT l_returnflag, l_extendedprice AS v,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) - 1 AS rn
    FROM lineitem
),
picked AS (
    SELECT /*+ BROADCAST(c) */ r.l_returnflag, r.v, r.rn,
           (c.n - 1) * 0.5 AS k50,
           (c.n - 1) * 0.95 AS k95
    FROM ranked r JOIN counts c ON r.l_returnflag = c.l_returnflag
    WHERE CAST(r.rn AS BIGINT) IN (
        CAST(floor((c.n - 1) * 0.5) AS BIGINT),
        CAST(ceil((c.n - 1) * 0.5) AS BIGINT),
        CAST(floor((c.n - 1) * 0.95) AS BIGINT),
        CAST(ceil((c.n - 1) * 0.95) AS BIGINT))
)
SELECT l_returnflag,
       round(sum(
           CASE WHEN rn = CAST(floor(k50) AS BIGINT)
                THEN v * (1.0 - (k50 - floor(k50))) ELSE 0.0 END
         + CASE WHEN rn = CAST(ceil(k50) AS BIGINT)
                    AND ceil(k50) <> floor(k50)
                THEN v * (k50 - floor(k50)) ELSE 0.0 END), 4) AS p50,
       round(sum(
           CASE WHEN rn = CAST(floor(k95) AS BIGINT)
                THEN v * (1.0 - (k95 - floor(k95))) ELSE 0.0 END
         + CASE WHEN rn = CAST(ceil(k95) AS BIGINT)
                    AND ceil(k95) <> floor(k95)
                THEN v * (k95 - floor(k95)) ELSE 0.0 END), 4) AS p95
FROM picked
GROUP BY l_returnflag
"""


def _build(spark, arm: str):
    from bq_duckdb_spark.operators.percentile import (
        percentile_interp_sql,
        percentile_interp_spark,
    )

    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")) \
        .createOrReplaceTempView("lineitem")
    if arm == "r8":
        out = spark.sql(R8_SQL)
    elif arm == "r9":
        out = spark.sql(percentile_interp_sql(
            "lineitem", "l_returnflag", "l_extendedprice",
            {"p50": 0.5, "p95": 0.95}, dialect="spark"))
    elif arm == "local":
        out = percentile_interp_spark(
            spark, "lineitem", "l_returnflag", "l_extendedprice",
            {"p50": 0.5, "p95": 0.95})
    else:
        raise SystemExit(f"unknown arm {arm}")
    return out.repartition(1).sortWithinPartitions("l_returnflag")


def _child(arm: str) -> None:
    from bq_duckdb_spark import get_spark

    spark = get_spark(app_name=f"pctl-ab-{arm}", cpus=CPUS)
    _build(spark, arm).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    _build(spark, arm).write.format("noop").mode("overwrite").save()
    print(json.dumps({"arm": arm, "sec": round(time.time() - t0, 3)}))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    arms = ["r8", "r9", "local"]
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
            print(f"sample {i+1}/{n} {arm:6s} {rec['sec']:.3f}s", flush=True)
    for arm in arms:
        s = sorted(samples[arm])
        trimmed = statistics.mean(s[1:-1]) if len(s) >= 3 else statistics.mean(s)
        ci = (2.776 * statistics.stdev(s) / math.sqrt(len(s))
              if len(s) >= 2 else 0.0)
        print(f"{arm:6s} trimmed={trimmed:.3f}s ci95=±{ci:.3f} "
              f"samples={[f'{x:.2f}' for x in s]}")


if __name__ == "__main__":
    main()
