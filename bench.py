"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full compute,
no driver collect) — except tiny-result aggregates where collect() is the
realistic path.

De-noising (round 7): identical-plan code measured 9.2-13.3 s across
rounds on this shared host while an idle-box run gives ~10.2 s, so the
recorded JSON now carries the data to separate host load from plan
regressions:

- per-query best-of-N (N=3) stays the headline ("queries"/"value",
  backward-compatible), plus "queries_median" and "queries_spread"
  (max-min across the N samples) so a reader can see run-to-run variance
  directly;
- a fixed pure-JVM calibration workload (sum/avg over range(1.6e9), no
  IO, no Python) is timed before and after the query loop; its min is
  compared against CALIBRATION_REF_SEC — the idle-box steady-state
  pinned when this file was written — giving "load_factor" and
  "value_calibrated" = value / load_factor, a host-load-normalized
  total. A load_factor near 1.0 means the raw numbers are trustworthy;
  1.3 means the host was ~30% contended and the raw total should be
  read accordingly.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from bq_duckdb_spark import get_spark

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q_filter_case",
    "q_having",
    "q_percentiles",
    "q_window_rank",
    "q_running_total",
    "q_sessionize",
    "q_rollup",
    "q_asof_join",
    # ext/ training-data operators
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_stats",
    "text_tfidf",
    "multimodal_features",
]

N_SAMPLES = 3

# Idle-box steady-state (best observed within a full bench session) of
# _calibrate() on the round-7 reference host: 32 local threads,
# 1.6e9-row JVM-only agg. Pinned at the idle MINIMUM so even mild
# contention shows up as load_factor > 1. Re-pin if the hardware
# changes (the value is printed every run, so a persistent drift is
# visible in the recorded BENCH_r*.json history).
CALIBRATION_REF_SEC = 0.45


def _calibrate(spark) -> float:
    """Fixed pure-JVM workload: whole-stage-codegen agg over range(),
    no IO, no shuffle beyond the final single-partition reduce, no
    Python workers — its runtime moves with host CPU contention and
    nothing else."""
    t0 = time.time()
    spark.range(0, 1_600_000_000, 1, 32).selectExpr(
        "sum(id * 2 + 1) as s", "avg(id % 7) as a"
    ).collect()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bq-duckdb-spark-bench", cpus=cpus)
    qs = entrymod.queries()

    # warm up the JVM/codegen path once so per-query numbers measure the
    # plan, not first-call overheads; then calibrate host load (min-of-3
    # after the warm-up run pays codegen)
    qs["q01_pricing_summary"](spark, sf_dir).count()
    # three throwaway calibration runs: C2 JIT keeps improving this loop
    # for the first few iterations (0.65 -> 0.49 -> 0.43 observed), and
    # measuring before the compiler settles would overstate host load
    for _ in range(3):
        _calibrate(spark)
    cal_before = min(_calibrate(spark) for _ in range(5))

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        # best-of-N: the first run pays one-off costs (codegen, Python
        # worker pool spin-up); later runs measure the steady state, and
        # extra samples damp local-JVM scheduling/GC noise on the
        # Python-UDF stages
        samples: list[float] = []
        for _ in range(N_SAMPLES):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)

    cal_after = min(_calibrate(spark) for _ in range(5))
    cal = min(cal_before, cal_after)
    load_factor = max(cal / CALIBRATION_REF_SEC, 1.0)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "queries_median": medians,
                "queries_spread": spreads,
                "n_samples": N_SAMPLES,
                "calibration_sec": round(cal, 3),
                "calibration_before_sec": round(cal_before, 3),
                "calibration_after_sec": round(cal_after, 3),
                "calibration_ref_sec": CALIBRATION_REF_SEC,
                "load_factor": round(load_factor, 3),
                "value_calibrated": round(total / load_factor, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
