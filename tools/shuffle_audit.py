"""Measured shuffle/IO volume per headline query — the numbers behind the
plan audit's shapes.

``audit_plans.py`` proves each plan has the right SHAPE (no cartesians,
broadcasts where intended); this tool measures what the plan actually
MOVES: per query, the bytes shuffled (written + read), the bytes read
from source files (pushdown/pruning effectiveness), and any memory/disk
spill (partition-sizing health). At 100 TB the dominant cost of almost
every query is its shuffle volume, so this is the number to optimize —
and to re-check when an operator changes.

Method: run every bench query once under a named Spark job group with the
event log enabled, then parse the log's per-task metrics and aggregate
them per group. Event-log parsing (vs. py4j access to internal stores)
keeps the measurement identical to what any Spark UI / history server
would report on a real cluster.

Usage: python tools/shuffle_audit.py [out.txt] [sf_dir]
Writes a table to ``out.txt`` (default SHUFFLE_check.txt) and prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES, TWIN_QUERIES
from bq_duckdb_spark import get_spark

# round-10: twins audited too — they are benched every round, and their
# multi-branch plans are exactly where un-reused exchanges would hide
AUDIT_QUERIES = BENCH_QUERIES + TWIN_QUERIES

_MB = 1024 * 1024


def _run_queries(sf_dir: str, log_dir: str) -> None:
    spark = get_spark(
        app_name="shuffle-audit",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # Spark 4 writes a rolling v2 log dir with zstd-compressed
            # event files by default — plain JSON lines keep the parse
            # dependency-free
            "spark.eventLog.compress": "false",
            # keep per-task metrics in the log (on by default; pinned so a
            # future default flip cannot silently empty this report)
            "spark.eventLog.logStageExecutorMetrics": "true",
        },
    )
    qs = entrymod.queries()
    sc = spark.sparkContext
    for name in AUDIT_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        sc.setJobGroup(name, name, interruptOnCancel=False)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
    spark.stop()


def _parse_event_logs(log_dir: str) -> dict[str, dict[str, float]]:
    stage_group: dict[int, str] = {}
    agg: dict[str, dict[str, float]] = {}
    paths = []
    # Spark 4 event-log v2 layout: one directory per app containing
    # ordered events_N_* part files (walk recursively, keep file order)
    for root, _dirs, files in sorted(os.walk(log_dir)):
        for fname in sorted(files):
            if fname.startswith((".", "appstatus_")):
                continue
            paths.append(os.path.join(root, fname))
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if group:
                        for sid in ev.get("Stage IDs", []):
                            stage_group[sid] = group
                elif kind == "SparkListenerTaskEnd":
                    group = stage_group.get(ev.get("Stage ID"))
                    if not group:
                        continue
                    m = ev.get("Task Metrics") or {}
                    w = (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    r_ = m.get("Shuffle Read Metrics") or {}
                    r = r_.get("Remote Bytes Read", 0) + r_.get("Local Bytes Read", 0)
                    inp = (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                    spill = m.get("Memory Bytes Spilled", 0) + m.get(
                        "Disk Bytes Spilled", 0
                    )
                    d = agg.setdefault(
                        group,
                        {"write": 0, "read": 0, "input": 0, "spill": 0, "tasks": 0},
                    )
                    d["write"] += w
                    d["read"] += r
                    d["input"] += inp
                    d["spill"] += spill
                    d["tasks"] += 1
    return agg


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SHUFFLE_check.txt"
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    with tempfile.TemporaryDirectory(prefix="spark-events-") as log_dir:
        _run_queries(sf_dir, log_dir)
        agg = _parse_event_logs(log_dir)

    lines = [
        f"shuffle audit @ {sf_dir} (one run per query; bytes are totals "
        f"across all tasks)",
        "",
        f"{'query':28s} {'shuf_write_mb':>13s} {'shuf_read_mb':>12s} "
        f"{'input_mb':>9s} {'spill_mb':>9s} {'tasks':>6s}",
    ]
    js: dict[str, dict[str, float]] = {}
    for name in AUDIT_QUERIES:
        d = agg.get(name)
        if d is None:
            continue
        js[name] = {
            "shuffle_write_mb": round(d["write"] / _MB, 2),
            "shuffle_read_mb": round(d["read"] / _MB, 2),
            "input_mb": round(d["input"] / _MB, 2),
            "spill_mb": round(d["spill"] / _MB, 2),
            "tasks": int(d["tasks"]),
        }
        lines.append(
            f"{name:28s} {d['write'] / _MB:13.2f} {d['read'] / _MB:12.2f} "
            f"{d['input'] / _MB:9.2f} {d['spill'] / _MB:9.2f} {d['tasks']:6d}"
        )
    total_w = sum(v["shuffle_write_mb"] for v in js.values())
    total_spill = sum(v["spill_mb"] for v in js.values())
    lines += [
        "",
        f"total shuffle write: {total_w:.2f} MB; total spill: "
        f"{total_spill:.2f} MB (spill should be 0 at this SF — nonzero "
        f"means partitions outgrew executor memory and the partition "
        f"sizing needs attention)",
    ]
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "metric": "shuffle_write_mb_total",
                "value": round(total_w, 2),
                "unit": "MB",
                "queries": js,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
