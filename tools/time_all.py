"""One-pass wall-clock timing of EVERY queries() entry — outlier finder.

The bench basket (19 + twins) is measured every round with trimmed+CI
rigor; the other ~170 contract entries are value-verified but have never
been timed at sf0.1. This runs each entry once (noop sink, guide §1.4)
after a session-wide warm query, labels jobs per entry, and prints the
entries sorted slowest-first. Single-shot timings are ±0.2-0.3 s noisy —
use this to FIND candidates, then A/B them properly (tools/ab_ref.py).

Usage: python tools/time_all.py [out.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bq_duckdb_spark import get_spark


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TIME_ALL_check.json"
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(
        app_name="time-all", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    qs = entrymod.queries()
    sc = spark.sparkContext
    # one warm entry so JVM/codegen startup is not charged to the first
    first = next(iter(qs))
    qs[first](spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        sc.setJobDescription(f"time_all:{name}")
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep sweeping; a broken entry is its own finding
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)
    spark.stop()
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"sf_dir": sf_dir, "sec": ranked}, f, indent=1)
    for name, sec in list(ranked.items())[:40]:
        print(f"{sec:8.3f}  {name}")
    print(f"... {len(ranked)} entries, total {sum(max(v, 0) for v in ranked.values()):.1f}s -> {out_path}")


if __name__ == "__main__":
    main()
