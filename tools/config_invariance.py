"""Config-matrix invariance sweep: every contract entry's RESULT must
be identical under adversarial runtime configs — AQE disabled, all
broadcasts suppressed (forces sort-merge / shuffled-hash plans),
whole-stage codegen off (interpreted expression paths), and a hostile
shuffle-partition count.  Any diff is a plan-dependent result bug of
the kind that only surfaces on a real cluster, where these knobs
genuinely vary.

The partition-invariance pytest suite pins a curated subset on every
run; this tool sweeps the WHOLE contract (slow — a full matrix is
4 × 177 entries) and is run per-session, with the log committed.

Usage: python tools/config_invariance.py [sf_dir] [prefix]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bq_duckdb_spark import get_spark
from tools.check_oracle import value_hash

# each scenario: (name, {conf: value}); conf is set before the run and
# restored after.  All are runtime-settable.
SCENARIOS = [
    ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
    ("no_broadcast", {"spark.sql.autoBroadcastJoinThreshold": "-1"}),
    ("codegen_off", {"spark.sql.codegen.wholeStage": "false"}),
    (
        "narrow_shuffle",
        {
            "spark.sql.shuffle.partitions": "3",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ),
]


def run_entry(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app_name="config-invariance", cpus=8, shuffle_partitions=8)
    qs = {k: v for k, v in entrymod.queries().items() if k.startswith(prefix)}

    failures: list[str] = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            cols, rows = run_entry(spark, fn, sf_dir)
            base = value_hash(cols, rows)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name:<28} baseline: {type(e).__name__}: {e}")
            failures.append(f"{name}:baseline")
            continue
        verdicts = []
        for scen, confs in SCENARIOS:
            saved = {k: spark.conf.get(k) for k in confs}
            try:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                cols2, rows2 = run_entry(spark, fn, sf_dir)
                h = value_hash(cols2, rows2)
                ok = h == base and sorted(cols2) == sorted(cols)
            except Exception as e:  # noqa: BLE001
                ok = False
                h = f"{type(e).__name__}"
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
            verdicts.append((scen, ok))
            if not ok:
                failures.append(f"{name}:{scen}")
        flat = " ".join(
            scen if ok else f"**{scen}-DIFF**" for scen, ok in verdicts
        )
        status = "ok  " if all(ok for _, ok in verdicts) else "FAIL"
        print(
            f"{status} {name:<28} ({time.time() - t0:4.1f}s, "
            f"{len(rows):>6} rows) {flat}"
        )

    print()
    if failures:
        print(f"{len(failures)} DIVERGENT: {', '.join(failures)}")
        sys.exit(1)
    print(f"all {len(qs)} entries invariant across {len(SCENARIOS)} scenarios")


if __name__ == "__main__":
    main()
