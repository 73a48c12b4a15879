"""Measured MinHash-banding recall sweep (round-8 brief item 1).

The round-7 exact set-similarity join made the LSH recall gap
measurable: the (32 hashes, 8 bands, r=4) default missed ~10% of the
true Jaccard>=0.3 pairs on the hostile-corpus gate set (.advsmall —
the corpus every dedup oracle entry actually runs on; the full
.advdata's mega-blocks make true-pair counts quadratic and the oracle
intractable). This tool quantifies the recall/cost frontier so the
default is chosen from data:

- ground truth: ``exact_jaccard_join`` (prefix-filtered, provably
  complete — ext/setjoin.py) at t=0.3, shingle_k=3;
- per (num_hashes, bands) config, BOTH with the production
  ``max_bucket=1000`` cap and uncapped: banded-candidate count (cost
  proxy — every candidate pays a shuffled exact-verify), verified-pair
  count, measured recall = found/truth (found pairs are
  exact-verified, hence a subset of truth), worst-case S-curve
  collision probability at s=t, and wall time. The capped/uncapped
  split separates S-curve loss (banding misses the pair entirely)
  from skew-cap loss (the bucket held the pair but the slice dropped
  it) — on mega-cluster corpora the cap, not the curve, dominates.

The ``derive_banding``-recommended config is flagged. shingle_k stays
at the contract's k=3: changing k redefines the truth set itself, so a
k sweep would compare incomparable recalls.

Usage: python tools/recall_sweep.py [corpus_dir] [out_file]
Defaults: /root/repo/.advsmall RECALL_r8.txt
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from bq_duckdb_spark import get_spark  # noqa: E402
from bq_duckdb_spark.ext import dedup_portable as dp  # noqa: E402
from bq_duckdb_spark.ext.dedup import derive_banding  # noqa: E402
from bq_duckdb_spark.ext.setjoin import exact_jaccard_join  # noqa: E402

THRESHOLD = 0.3
K = 3
CONFIGS = [
    # (num_hashes, bands) — rows/band = num_hashes // bands
    (32, 8),    # round-7 default, r=4
    (32, 16),   # r=2, same signature budget
    (48, 16),   # r=3
    (64, 16),   # r=4, wider signature
    (64, 32),   # r=2 — derive_banding(0.3, 0.95) recommendation
    (96, 32),   # r=3
    (128, 64),  # r=2, worst-case ~99.8%
]
UNCAPPED = 1_000_000_000


def s_curve(threshold: float, rows: int, bands: int) -> float:
    return 1.0 - (1.0 - threshold**rows) ** bands


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.advsmall"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "RECALL_r8.txt"
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.cache().count()

    rec_h, rec_b = derive_banding(THRESHOLD, 0.95)
    t0 = time.time()
    n_true = exact_jaccard_join(
        docs, "text", "doc_id", THRESHOLD, shingle_k=K
    ).count()
    t_truth = time.time() - t0

    lines = [
        f"# MinHash banding recall sweep — corpus={corpus} ({n_docs} docs), "
        f"threshold={THRESHOLD}, shingle_k={K}",
        f"# ground truth: {n_true} pairs (exact prefix-filter join, "
        f"{t_truth:.1f}s)",
        f"# derive_banding(t={THRESHOLD}, target=0.95) -> "
        f"(num_hashes={rec_h}, bands={rec_b})",
        "# 'cap' columns use the production max_bucket=1000 skew cap; "
        "'uncap' lifts it —",
        "# the difference is cap loss (pair co-bucketed but sliced off), "
        "the uncap shortfall is S-curve loss.",
        "",
        f"{'hashes':>7} {'bands':>6} {'rows':>5} {'s-curve@t':>10} "
        f"{'cand(cap)':>10} {'found(cap)':>11} {'recall(cap)':>12} "
        f"{'cand(uncap)':>12} {'found(uncap)':>13} {'recall(uncap)':>14} "
        f"{'sec':>6}",
    ]
    print("\n".join(lines), flush=True)
    for num_hashes, bands in CONFIGS:
        rows = num_hashes // bands
        t0 = time.time()
        res = {}
        for label, cap in (("cap", 1000), ("uncap", UNCAPPED)):
            res[label] = (
                dp.portable_minhash_pairs(
                    docs, "text", "doc_id", num_hashes=num_hashes,
                    bands=bands, shingle_k=K, max_bucket=cap,
                ).count(),
                dp.portable_jaccard_pairs(
                    docs, "text", "doc_id", threshold=THRESHOLD,
                    num_hashes=num_hashes, bands=bands, shingle_k=K,
                    max_bucket=cap,
                ).count(),
            )
        dt = time.time() - t0
        mark = " <- derived" if (num_hashes, bands) == (rec_h, rec_b) else ""
        line = (
            f"{num_hashes:>7} {bands:>6} {rows:>5} "
            f"{s_curve(THRESHOLD, rows, bands):>10.3f} "
            f"{res['cap'][0]:>10} {res['cap'][1]:>11} "
            f"{res['cap'][1] / n_true:>12.4f} "
            f"{res['uncap'][0]:>12} {res['uncap'][1]:>13} "
            f"{res['uncap'][1] / n_true:>14.4f} "
            f"{dt:>6.1f}{mark}"
        )
        lines.append(line)
        print(line, flush=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
