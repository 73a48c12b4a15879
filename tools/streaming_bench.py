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
Defaults: STREAMING_check.txt 22 400
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


def main() -> None:
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
