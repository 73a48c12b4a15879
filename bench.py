"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full compute,
no driver collect) — except tiny-result aggregates where collect() is the
realistic path.

Measurement design (round 9 — regression-detecting instrument):

Round 8 showed the old 3-back-to-back-samples scheme can no longer
distinguish a real plan regression from session noise: untouched
sub-second queries drifted 1.2-1.8x round-over-round with load_factor
1.0 on both ends, because session-level JIT/GC state moves WITHIN a
bench run and back-to-back samples of one query all land in the same
session regime. Fixes, in this order of leverage:

- INTERLEAVED round-robin sampling: one full warm-up pass over every
  query (pays codegen + Python worker pool per query), then N_SAMPLES
  measured rounds that each run EVERY query once. Session drift (JIT
  warming, GC pressure, page cache) now spreads across all queries
  uniformly instead of biasing whichever query ran late.
- n=5 samples with per-query TRIMMED MEAN (drop min and max, mean of
  the middle 3) in "queries_trimmed" — the regression statistic: robust
  to one GC hiccup AND to one lucky cache hit, unlike best-of-N.
- 95% CI half-width (t_{0.975,4}=2.776, hw = t*s/sqrt(n)) per query in
  "queries_ci95" so tools/gates.py can test "regressed beyond combined
  CI" mechanically instead of eyeballing spreads.

Backward compatibility: "queries" (best-of-N) and "value" (their sum)
are COMPARABLE to BENCH_r01..r08 but not methodology-identical: the
old scheme warmed up only q01 and took best-of-3 back-to-back (sample
1 of every other query paid its own codegen), while this scheme warms
up every query and takes best-of-5 interleaved — which biases
best-of-N slightly lower, flattering baseline_ratio against BENCH_r01.
The JSON records "methodology" so cross-round ratio readers can
account for it; "value_trimmed" is the regression headline and
BASELINE.md carries a trimmed baseline rebased at round 9.

Scalable twins: q_percentiles_scalable and q_ntile_scalable are
measured with identical methodology but reported under "queries_twins"
and EXCLUDED from "value" — the baseline ratio is only meaningful over
BENCH_r01's fixed 19-query basket. The twins are the forms a real
cluster would run (see BASELINE.md "Scale recommendation"); their
per-round numbers let the judge track the 100 TB-shaped plan without
breaking the baseline comparison.

De-noising (kept from round 7): a fixed pure-JVM calibration workload
(sum/avg over range(1.6e9), no IO, no Python) is timed before and after
the query loop; its min vs CALIBRATION_REF_SEC (idle-box steady state)
gives "load_factor" and "value_calibrated" = value / load_factor.
"""

from __future__ import annotations

import json
import math
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

# Cluster-scale twins of the two by-design low-parallelism parity forms
# (q_percentiles: whole group in one task; q_ntile: global orderBy).
# Measured every round with the same methodology, reported under
# "queries_twins", NOT summed into "value" (fixed-basket baseline ratio).
TWIN_QUERIES = [
    "q_percentiles_scalable",
    "q_ntile_scalable",
]

N_SAMPLES = 5

# t_{0.975, n-1} for the CI half-width; n=5 -> df=4.
T_975 = {2: 12.706, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447}

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


def _trimmed_mean(samples: list[float]) -> float:
    """Mean after dropping one min and one max (n>=3); plain mean below."""
    if len(samples) < 3:
        return statistics.mean(samples)
    s = sorted(samples)
    return statistics.mean(s[1:-1])


def _ci95_halfwidth(samples: list[float]) -> float:
    if len(samples) < 2:
        return 0.0
    t = T_975.get(len(samples), 2.776)
    return t * statistics.stdev(samples) / math.sqrt(len(samples))


def _multifile_dir(spark, sf_dir: str, n_files: int) -> str | None:
    """Re-lay every table of sf_dir as n_files parquet files (cached by
    source fingerprint under /tmp) and return the copy's path.

    Every sf0.1 table ships as ONE parquet row group, so the baseline
    basket reads each table with 1 scan task — a serial-scan fraction a
    real multi-file 100 TB table would not have (SURVEY §6 framing is
    thousands of files). The multi-file pass measures the same queries
    at realistic scan parallelism; the single-file basket stays the
    BENCH_r01-continuity headline.
    """
    try:
        from tools.layout_invariance import _src_fingerprint, relayout
    except Exception:
        return None
    dst = (
        f"/tmp/benchmf_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{n_files}f_{_src_fingerprint(sf_dir)}"
    )
    relayout(spark, sf_dir, dst, n_files=n_files)
    return dst


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", N_SAMPLES))
    mf_files = int(os.environ.get("SPARK_GRAFT_BENCH_MULTIFILE", "12"))
    spark = get_spark(app_name="bq-duckdb-spark-bench", cpus=cpus)
    qs = entrymod.queries()

    all_names = [n for n in BENCH_QUERIES + TWIN_QUERIES if n in qs]

    def run_once(name: str, data_dir: str = sf_dir) -> float:
        t0 = time.time()
        df = qs[name](spark, data_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up pass: every query once, so each pays its one-off costs
    # (codegen, Python worker pool spin-up, shuffle-file page cache)
    # OUTSIDE the measured rounds
    for name in all_names:
        run_once(name)

    # three throwaway calibration runs: C2 JIT keeps improving this loop
    # for the first few iterations (0.65 -> 0.49 -> 0.43 observed), and
    # measuring before the compiler settles would overstate host load
    for _ in range(3):
        _calibrate(spark)
    cal_before = min(_calibrate(spark) for _ in range(5))

    # interleaved rounds: every query once per round, in fixed order
    samples: dict[str, list[float]] = {n: [] for n in all_names}
    for _ in range(n_samples):
        for name in all_names:
            samples[name].append(run_once(name))

    # multi-file pass: same basket over the 12-file re-layout, OUTSIDE
    # the single-file sampling loop (so the headline's page-cache and
    # session state are undisturbed), measured with the same
    # interleaved-round methodology
    base_names_early = [n for n in BENCH_QUERIES if n in qs]
    mf_samples: dict[str, list[float]] = {}
    mf_dir = None
    if mf_files > 0:
        mf_dir = _multifile_dir(spark, sf_dir, mf_files)
    if mf_dir:
        for name in base_names_early:
            run_once(name, mf_dir)  # warm-up
        mf_samples = {n: [] for n in base_names_early}
        for _ in range(n_samples):
            for name in base_names_early:
                mf_samples[name].append(run_once(name, mf_dir))

    cal_after = min(_calibrate(spark) for _ in range(5))
    cal = min(cal_before, cal_after)
    load_factor = max(cal / CALIBRATION_REF_SEC, 1.0)

    def stats_for(names: list[str]):
        best, med, spread, trimmed, ci = {}, {}, {}, {}, {}
        for n in names:
            s = samples[n]
            best[n] = round(min(s), 3)
            med[n] = round(statistics.median(s), 3)
            spread[n] = round(max(s) - min(s), 3)
            trimmed[n] = round(_trimmed_mean(s), 3)
            ci[n] = round(_ci95_halfwidth(s), 3)
        return best, med, spread, trimmed, ci

    base_names = [n for n in BENCH_QUERIES if n in qs]
    twin_names = [n for n in TWIN_QUERIES if n in qs]
    timings, medians, spreads, trimmeds, cis = stats_for(base_names)
    t_best, t_med, t_spread, t_trim, t_ci = stats_for(twin_names)

    total = round(sum(timings.values()), 3)
    total_trimmed = round(sum(trimmeds.values()), 3)
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
                "queries_trimmed": trimmeds,
                "queries_ci95": cis,
                "value_trimmed": total_trimmed,
                "queries_twins": {
                    n: {
                        "best": t_best[n],
                        "median": t_med[n],
                        "spread": t_spread[n],
                        "trimmed": t_trim[n],
                        "ci95": t_ci[n],
                    }
                    for n in twin_names
                },
                "queries_multifile": (
                    {
                        n: {
                            "best": round(min(s), 3),
                            "trimmed": round(_trimmed_mean(s), 3),
                            "ci95": round(_ci95_halfwidth(s), 3),
                        }
                        for n, s in mf_samples.items()
                    }
                    if mf_samples
                    else None
                ),
                "multifile_n_files": mf_files if mf_samples else None,
                "value_multifile": (
                    round(
                        sum(_trimmed_mean(s) for s in mf_samples.values()), 3
                    )
                    if mf_samples
                    else None
                ),
                "n_samples": n_samples,
                "sampling": "interleaved_round_robin",
                # methodology version: v1 = r01-r08 (warm q01 only,
                # best-of-3 back-to-back); v2 = r09+ (warm all,
                # interleaved n=5, trimmed+CI reported)
                "methodology": "v2",
                "calibration_sec": round(cal, 3),
                "calibration_before_sec": round(cal_before, 3),
                "calibration_after_sec": round(cal_after, 3),
                "calibration_ref_sec": CALIBRATION_REF_SEC,
                "load_factor": round(load_factor, 3),
                "value_calibrated": round(total / load_factor, 3),
                # round 11, additions-only: the same session-load
                # normalization applied to the TRIMMED total, so the
                # gates' basket-level drift flag can compare a
                # variance-robust statistic instead of the raw trimmed
                # sum (cross-session trimmed drift of untouched
                # sub-second queries was the dominant error term in the
                # round-10 driver comparison)
                "value_trimmed_calibrated": round(total_trimmed / load_factor, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
