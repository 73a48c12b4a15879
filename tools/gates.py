"""One-command closing gate (round-8 brief item 6): run every
correctness/scale gate the round relies on, from the CURRENT working
tree, and emit a single machine-readable summary the next judge can
verify mechanically — no hand-cross-checked log soup, no stale-log
submissions.

Stages (each also writes its own log artifact):

1. oracle sweep at sf0.01            → ORACLE_sf01_r{N}.log
2. oracle sweep on the hostile set   → ORACLE_adv_r{N}.log  (.advsmall;
   fenced: isolated DuckDB children, 24 GB memory limit, 1800 s/entry)
3. oracle sweep at sf1               → ORACLE_sf1_r{N}.log   (.sf1,
   same fences; skipped unless the corpus dir exists)
4. plan audit over the contract      → PLAN_AUDIT_r{N}.txt
5. full pytest                       → PYTEST_r{N}.log
6. bench at sf0.1                    → BENCH_local_r{N}.json

Summary lands in GATES_r{N}.json: per-stage pass/fail counts, artifact
paths, wall seconds, and an overall "green" boolean. Exit code 1 when
any gate is red.

Usage: python tools/gates.py [round_no] [--skip stage1,stage2]
Stages: sf01 hostile sf1 plans pytest bench
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = "/root/repo"


def _run(cmd, log_path, env_extra=None, timeout=14400):
    env = {**os.environ, **(env_extra or {})}
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
            timeout=timeout,
        )
    return proc.returncode, time.time() - t0


def _parse_oracle(log_path):
    txt = open(log_path).read()
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", txt)
    if not m:
        return {"error": "no summary line"}
    out = {
        "pass": int(m.group(1)),
        "fail": int(m.group(2)),
        "rows_only": int(m.group(3)),
        "timeouts": txt.count("TIMEOUT"),
    }
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rnd = args[0] if args else "8"
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip |= set(a.split("=", 1)[1].split(","))

    fences = {
        "CHECK_ORACLE_ISOLATE": "1",
        "CHECK_ORACLE_DUCKDB_MEM": "24GB",
        "CHECK_ORACLE_TIMEOUT_S": "1800",
        "SPARK_GRAFT_CPUS": "32",
    }
    summary: dict = {"round": rnd, "stages": {}, "started_unix": int(time.time())}

    def stage(name, fn):
        if name in skip:
            summary["stages"][name] = {"skipped": True}
            print(f"[gates] {name}: skipped", flush=True)
            return
        print(f"[gates] {name}: running...", flush=True)
        summary["stages"][name] = fn()
        print(f"[gates] {name}: {summary['stages'][name]}", flush=True)

    def oracle_stage(sf_dir, log_name, fenced):
        def run():
            log = f"{REPO}/{log_name}"
            rc, secs = _run(
                [sys.executable, "tools/check_oracle.py", sf_dir],
                log, env_extra=fences if fenced else {"SPARK_GRAFT_CPUS": "32"},
            )
            out = _parse_oracle(log)
            out.update({"rc": rc, "sec": round(secs, 1), "log": log_name})
            return out

        return run

    stage("sf01", oracle_stage(
        "/root/testdata/sf0.01", f"ORACLE_sf01_r{rnd}_gates.log", False))
    stage("hostile", oracle_stage(
        f"{REPO}/.advsmall", f"ORACLE_adv_r{rnd}.log", True))
    if os.path.isdir(f"{REPO}/.sf1"):
        stage("sf1", oracle_stage(
            f"{REPO}/.sf1", f"ORACLE_sf1_r{rnd}.log", True))
    else:
        summary["stages"]["sf1"] = {"skipped": True, "reason": "no .sf1 dir"}

    def plans():
        log = f"{REPO}/PLAN_AUDIT_r{rnd}_gates.txt"
        rc, secs = _run(
            [sys.executable, "tools/audit_plans.py", "/root/testdata/sf0.01"],
            log,
        )
        m = re.search(r"(\d+) flagged", open(log).read())
        return {
            "rc": rc,
            "flagged": int(m.group(1)) if m else -1,
            "sec": round(secs, 1),
            "log": os.path.basename(log),
        }

    stage("plans", plans)

    def pytest_stage():
        log = f"{REPO}/PYTEST_r{rnd}.log"
        rc, secs = _run(
            [sys.executable, "-m", "pytest", "tests/", "-q"], log,
        )
        m = re.search(r"(\d+) passed", open(log).read())
        f = re.search(r"(\d+) failed", open(log).read())
        return {
            "rc": rc,
            "passed": int(m.group(1)) if m else 0,
            "failed": int(f.group(1)) if f else 0,
            "sec": round(secs, 1),
            "log": os.path.basename(log),
        }

    stage("pytest", pytest_stage)

    def bench():
        log = f"{REPO}/BENCH_local_r{rnd}.json"
        rc, secs = _run(
            [sys.executable, "bench.py"], log,
            env_extra={
                "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                "SPARK_GRAFT_CPUS": "32",
            },
        )
        total = None
        for line in open(log).read().splitlines()[::-1]:
            if line.startswith("{"):
                try:
                    total = json.loads(line).get("value")
                except json.JSONDecodeError:
                    pass
                break
        return {"rc": rc, "total_sec": total, "sec": round(secs, 1),
                "log": os.path.basename(log)}

    stage("bench", bench)

    def stage_green(name, s):
        if s.get("skipped"):
            return True
        if name in ("sf01", "hostile", "sf1"):
            return s.get("fail") == 0 and s.get("rc") == 0 and not s.get("timeouts")
        if name == "plans":
            return s.get("flagged") == 0 and s.get("rc") == 0
        if name == "pytest":
            return s.get("failed") == 0 and s.get("rc") == 0
        if name == "bench":
            return s.get("rc") == 0 and s.get("total_sec") is not None
        return False

    summary["green"] = all(
        stage_green(k, v) for k, v in summary["stages"].items()
    )
    summary["finished_unix"] = int(time.time())
    out_path = f"{REPO}/GATES_r{rnd}.json"
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"wrote {out_path}")
    sys.exit(0 if summary["green"] else 1)


if __name__ == "__main__":
    main()
