"""Measured MinHash-banding recall sweep (round-8 brief item 1).

The round-7 exact set-similarity join made the LSH recall gap
measurable: the (32 hashes, 8 bands, r=4) default missed 10.6% of the
true Jaccard>=0.3 pairs on the hostile corpus. This tool quantifies the
recall/cost frontier so the default is chosen from data, not vibes:

- ground truth per shingle-k: ``exact_jaccard_join`` (prefix-filtered,
  provably complete — ext/setjoin.py) at t=0.3 on the hostile corpus;
- per (num_hashes, bands) config: banded candidate count (cost proxy —
  every candidate pays a shuffled exact-verify), verified-pair count,
  measured recall = found/truth (any found pair is exact-verified, so
  found is a subset of truth), worst-case S-curve recall at s=t, and
  wall time;
- the ``derive_banding``-recommended config is flagged.

Usage: python tools/recall_sweep.py [corpus_dir] [out_file]
Defaults: /root/repo/.advdata RECALL_r8.txt
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bq_duckdb_spark import get_spark  # noqa: E402
from bq_duckdb_spark.ext import dedup_portable as dp  # noqa: E402
from bq_duckdb_spark.ext.dedup import derive_banding  # noqa: E402
from bq_duckdb_spark.ext.setjoin import exact_jaccard_join  # noqa: E402

THRESHOLD = 0.3
CONFIGS = [
    # (num_hashes, bands) — rows/band = num_hashes // bands
    (32, 8),    # round-7 default, r=4
    (32, 16),   # r=2, same signature budget
    (48, 16),   # r=3
    (64, 16),   # r=4, wider signature
    (64, 32),   # r=2 — derive_banding(0.3, 0.95) recommendation
    (96, 32),   # r=3
    (128, 64),  # r=2, recall ~99.8% worst-case
]
SHINGLE_KS = [3, 5]


def s_curve(threshold: float, rows: int, bands: int) -> float:
    return 1.0 - (1.0 - threshold**rows) ** bands


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.advdata"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "RECALL_r8.txt"
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.cache().count()

    rec_h, rec_b = derive_banding(THRESHOLD, 0.95)
    lines = [
        f"# MinHash banding recall sweep — corpus={corpus}, "
        f"threshold={THRESHOLD}",
        f"# derive_banding(t={THRESHOLD}, target=0.95) -> "
        f"(num_hashes={rec_h}, bands={rec_b})",
        "",
    ]
    for k in SHINGLE_KS:
        t0 = time.time()
        n_true = exact_jaccard_join(
            docs, "text", "doc_id", THRESHOLD, shingle_k=k
        ).count()
        t_truth = time.time() - t0
        lines.append(
            f"shingle_k={k}: ground truth {n_true} pairs "
            f"(exact prefix-filter join, {t_truth:.1f}s)"
        )
        lines.append(
            f"{'hashes':>7} {'bands':>6} {'rows':>5} {'s-curve@t':>10} "
            f"{'candidates':>11} {'found':>8} {'recall':>7} {'sec':>6}"
        )
        for num_hashes, bands in CONFIGS:
            rows = num_hashes // bands
            t0 = time.time()
            n_cand = dp.portable_minhash_pairs(
                docs, "text", "doc_id",
                num_hashes=num_hashes, bands=bands, shingle_k=k,
            ).count()
            n_found = dp.portable_jaccard_pairs(
                docs, "text", "doc_id", threshold=THRESHOLD,
                num_hashes=num_hashes, bands=bands, shingle_k=k,
            ).count()
            dt = time.time() - t0
            mark = " <- derived" if (num_hashes, bands) == (rec_h, rec_b) else ""
            lines.append(
                f"{num_hashes:>7} {bands:>6} {rows:>5} "
                f"{s_curve(THRESHOLD, rows, bands):>10.3f} "
                f"{n_cand:>11} {n_found:>8} "
                f"{n_found / n_true if n_true else float('nan'):>7.4f} "
                f"{dt:>6.1f}{mark}"
            )
            print(lines[-1], flush=True)
        lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
