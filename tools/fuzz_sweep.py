"""Multi-seed data-fuzz gate: generate N randomized hostile-value
corpora (tools/gen_fuzz.py) and run the full cross-engine contract
sweep (tools/check_oracle.py) over each.

Round-9 brief item 4. The single-seed shakedown of this gate found 31
real divergences the fixed-seed corpora never hit — NULL ordering in
window oracles (Spark/BigQuery ASC=NULLS FIRST vs DuckDB NULLS LAST),
NULL group keys dropped by equi-joins, divide-by-zero on empty
documents, DuckDB's truncating decimal down-scale cast, concat()'s
NULL-absorbing vs NULL-skipping semantics, engine-defined
double->decimal conversions, and ULP tie-breaks between duplicate
k-means centroids. Each fix is pinned in the operators/oracles with a
"gen_fuzz finding" comment; this sweep keeps the whole class from
regressing.

Usage: python tools/fuzz_sweep.py [out.txt] [n_seeds] [start_seed]
       python tools/fuzz_sweep.py out.txt --seeds 0,1,105,106
Defaults: FUZZDATA_check.txt 3 0

The --seeds form powers the round-10+ rotating gate: pinned regression
seeds (the ones that found the 31 round-9 divergences) run every round,
plus fresh seeds derived from the round number so each round explores
new corners (tools/gates.py picks 100 + 10*round + i).

Writes one line per seed (pass/fail/rows-only + failures) plus a
verdict line; exit 1 if any seed has failures. Corpora are generated
under .fuzz/seed{N} and left on disk so a failing seed is immediately
reproducible:
    python tools/check_oracle.py .fuzz/seed7 <entry>
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed(seed: int, out) -> dict:
    corpus = os.path.join(REPO, ".fuzz", f"seed{seed}")
    t0 = time.time()
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_fuzz.py"), corpus, str(seed)],
        capture_output=True, text=True, cwd=REPO,
    )
    if gen.returncode != 0:
        out.write(f"seed {seed}: GENERATOR FAILED\n{gen.stderr[-2000:]}\n")
        return {"seed": seed, "ok": False, "fail": -1}
    env = {**os.environ, "CHECK_ORACLE_TIMEOUT_S": os.environ.get(
        "CHECK_ORACLE_TIMEOUT_S", "600")}
    sweep = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), corpus],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", sweep.stdout)
    secs = time.time() - t0
    if not m:
        out.write(f"seed {seed}: NO SUMMARY (rc={sweep.returncode}, {secs:.0f}s)\n")
        out.write(sweep.stdout[-2000:] + "\n")
        return {"seed": seed, "ok": False, "fail": -1}
    n_pass, n_fail, n_weak = (int(m.group(i)) for i in (1, 2, 3))
    out.write(
        f"seed {seed}: {n_pass} pass, {n_fail} fail, {n_weak} rows-only "
        f"({secs:.0f}s)\n"
    )
    for line in sweep.stdout.splitlines():
        if line.startswith(("FAIL", "TIMEOUT")):
            out.write(f"  {line}\n")
    out.flush()
    return {"seed": seed, "ok": n_fail == 0, "fail": n_fail}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FUZZDATA_check.txt"
    if len(sys.argv) > 2 and sys.argv[2] == "--seeds":
        seeds = [int(s) for s in sys.argv[3].split(",")]
    else:
        n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        seeds = list(range(start, start + n_seeds))
    results = []
    with open(os.path.join(REPO, out_path), "w") as out:
        out.write(
            f"data-fuzz sweep: {len(seeds)} randomized corpora "
            f"(seeds {seeds}), full contract each\n\n"
        )
        for seed in seeds:
            results.append(run_seed(seed, out))
        bad = [r for r in results if not r["ok"]]
        verdict = "GREEN" if not bad else f"RED ({len(bad)} seed(s) failing)"
        out.write(f"\nverdict: {verdict}\n")
    print(open(os.path.join(REPO, out_path)).read())
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
