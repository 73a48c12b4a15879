"""Throughput evidence for the incremental-dedup streaming twin
(round-9 brief item 6).

The foreachBatch operators are equivalence- and crash-tested
(tests/test_streaming.py) but had no perf record. The design claim to
verify: because the corpus state is kept PRE-BANDED at rest and each
arriving shard probes it with a broadcast bucket join, per-shard cost
must NOT grow with corpus size except through the embarrassingly-
parallel state SCAN — no re-shingling, no corpus-sized shuffle. If the
claim is wrong (e.g. the probe re-shuffles the state), per-shard cost
grows linearly and the plot shows it immediately.

Method: feed N fixed-size shards (FRESH synthetic docs per shard — no
cross-shard near-dups beyond chance, so pair-output cost stays flat
and the measured growth isolates the state-probe path) through the
actual foreachBatch function, timing each call. State grows by one
shard per batch, so batch k probes k-1 shards of state: a >= 10x state
span between early and late batches.

Usage: python tools/streaming_bench.py [out.txt] [n_batches] [shard_docs]
       python tools/streaming_bench.py --shardsweep [out.txt]
Defaults: STREAMING_check.txt 22 400

--shardsweep is the SECOND axis (round-10, VERDICT r9 item 6): the
default mode proves per-shard cost is flat in STATE size at fixed
shard size; the sweep holds state fixed (~4000 docs) and sweeps the
SHARD size over a 64x span, reporting docs/sec per size. Throughput
should rise with shard size while per-batch fixed overhead (micro-batch
scheduling, state scan, parquet commit) amortizes, then flatten at the
compute-bound ceiling — the knee is the minimum shard size a deployment
should use; running finer shards buys latency with wasted overhead.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bq_duckdb_spark import get_spark
from bq_duckdb_spark.streaming.streams import incremental_dedup_each_batch

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red green blue cyan"
).split()


def _shard(spark, batch_id: int, n_docs: int, doc_words: int = 60):
    """Deterministic synthetic shard: per-doc token stream seeded by
    (batch, doc) so shards share vocabulary but not near-dup content."""
    base = batch_id * n_docs
    rows = spark.range(base, base + n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(doc_words - 1)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in WORDS]),
                    (
                        (
                            F.xxhash64(F.col("id"), i, F.lit(batch_id))
                            % len(WORDS)
                            + len(WORDS)
                        )
                        % len(WORDS)
                        + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    return rows


def shard_sweep(out_path: str) -> None:
    """docs/sec vs shard size at FIXED state (~4000 docs)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="streaming-shardsweep", cpus=cpus)
    sizes = [100, 400, 1600, 6400, 25600, 102400]
    n_timed = 3
    state_docs = 4000

    lines = [
        "incremental-dedup streaming twin: throughput vs shard size",
        f"state fixed at ~{state_docs} docs (10 x 400-doc shards), "
        f"{n_timed} timed batches per size, local[{cpus}]",
        "",
        "shard_docs  mean_sec  docs_per_sec",
    ]
    results = []
    for size in sizes:
        work = tempfile.mkdtemp(prefix="stream_sweep_")
        out_dir, state_dir = f"{work}/pairs", f"{work}/state"
        write = incremental_dedup_each_batch(
            out_dir=out_dir, state_dir=state_dir)
        # fixed state: 10 x 400-doc shards (batch ids 1000+ keep their
        # doc ids disjoint from the timed shards)
        for b in range(state_docs // 400):
            write(_shard(spark, 1000 + b, 400), 1000 + b)
        write(_shard(spark, 2000, size), 2000)  # warm this size's plan
        times = []
        for i in range(n_timed):
            df = _shard(spark, 3000 + i, size)
            t0 = time.time()
            write(df, 3000 + i)
            times.append(time.time() - t0)
        mean = statistics.mean(times)
        dps = size / mean
        results.append((size, mean, dps))
        lines.append(f"{size:10d}  {mean:8.2f}  {dps:12.0f}")
        shutil.rmtree(work, ignore_errors=True)

    # knee: first size after which a 4x shard step stops improving
    # docs/sec by >= 1.5x — past it the pipeline is compute-bound and
    # larger shards only buy latency
    knee = None
    for (s0, _, d0), (s1, _, d1) in zip(results, results[1:]):
        if d1 < 1.5 * d0 and knee is None:
            knee = s0
    peak = max(d for _, _, d in results)
    declines = [
        f"{s1} ({d1:.0f} docs/sec, down from {d0:.0f} at {s0})"
        for (s0, _, d0), (s1, _, d1) in zip(results, results[1:])
        if d1 < 0.8 * d0
    ]
    lines += [
        "",
        (
            f"peak measured: {peak:.0f} docs/sec; knee at ~{knee}-doc "
            "shards (first size whose 4x step stopped improving "
            "docs/sec >= 1.5x — below it per-batch fixed overhead "
            "dominates, above it throughput is compute-bound and shard "
            "size only buys latency)"
            if knee is not None
            else f"peak measured: {peak:.0f} docs/sec at the largest "
            "tested shard; NO KNEE inside the tested span — per-batch "
            "fixed overhead still dominates, so deployments should use "
            "the largest shard their latency budget allows"
        ),
    ]
    if declines:
        lines += [
            "",
            "throughput DECLINE at: " + "; ".join(declines) + " — a "
            "shard is itself one dedup batch, so in-batch banding "
            "bucket sizes grow with shard size and the in-bucket pair "
            "expansion is quadratic in bucket occupancy; past the knee "
            "bigger shards buy NEGATIVE throughput, not just latency. "
            "Operating guidance: shard near the knee.",
        ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--shardsweep":
        shard_sweep(sys.argv[2] if len(sys.argv) > 2 else "STREAMING_check.txt")
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAMING_check.txt"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    shard_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="streaming-bench", cpus=cpus)

    work = tempfile.mkdtemp(prefix="stream_bench_")
    out_dir, state_dir = f"{work}/pairs", f"{work}/state"
    write = incremental_dedup_each_batch(out_dir=out_dir, state_dir=state_dir)

    # warm-up: one throwaway shard pays codegen + Python worker spin-up,
    # then the state is reset so batch 0 starts empty
    write(_shard(spark, 0, shard_docs), 0)
    shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)

    times: list[float] = []
    for b in range(n_batches):
        df = _shard(spark, b, shard_docs)
        t0 = time.time()
        write(df, b)
        times.append(time.time() - t0)

    import math

    early = statistics.mean(times[2:5])          # state ~2-4 shards
    late = statistics.mean(times[-3:])           # state ~n-3..n-1 shards
    span = (n_batches - 2) / 3.0                 # state-size growth factor
    ratio = late / early
    # growth exponent alpha in cost ~ state^alpha over the measured
    # span: 0 = flat, 1 = linear re-processing of the corpus per batch
    alpha = math.log(ratio) / math.log(span)
    lines = [
        f"incremental-dedup streaming twin: per-shard cost vs state size",
        f"shard = {shard_docs} docs, {n_batches} batches, local[{cpus}]",
        "",
        "batch  state_shards  sec",
    ]
    for b, t in enumerate(times):
        lines.append(f"{b:5d}  {b:12d}  {t:6.2f}")
    lines += [
        "",
        f"early (batches 2-4) mean: {early:.2f} s",
        f"late  (last 3)      mean: {late:.2f} s",
        f"state-size span: ~{span:.0f}x   per-shard cost ratio: {ratio:.2f}x"
        f"   growth exponent: {alpha:.2f}",
        "",
        "verdict: "
        + (
            f"SUB-LINEAR (alpha {alpha:.2f}): the shuffle-side work per "
            "shard is constant; the residual growth is the parallel "
            "pre-banded state SCAN (+ one parquet dir per batch), which "
            "a real deployment caps by compacting state files — no "
            "corpus-sized shuffle or re-shingling appears at any state "
            "size"
            if alpha < 0.5
            else f"GROWING (alpha {alpha:.2f}) — probe path re-examines "
            "corpus-sized data per batch; investigate before the 100 TB "
            "claim stands"
        ),
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
