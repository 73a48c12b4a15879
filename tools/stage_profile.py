"""Per-stage time attribution for selected queries() entries — the
empirical half of guide §1.1 without a live UI.

``shuffle_audit.py`` reports what each query MOVES; this reports where
its wall-clock GOES: per stage, the summed executor run time, fetch
wait, GC, (de)serialization, and shuffle write time, plus the stage's
wall span and task count. That split says whether a slow entry is
compute-bound (optimize the per-task work, guide §1.2 step 2),
fetch-bound (optimize the shuffle, §2), or overhead-bound (scheduling /
tiny tasks — leave it alone).

Method: same event-log parse as shuffle_audit (identical to what the
UI/history server would show on a cluster), one run per query under a
named job group.

Usage: python tools/stage_profile.py <query> [query...]  [--sf dir]
Prints a per-stage table per query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bq_duckdb_spark import get_spark


def _run(names: list[str], sf_dir: str, log_dir: str) -> None:
    spark = get_spark(
        app_name="stage-profile",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = entrymod.queries()
    sc = spark.sparkContext
    for name in names:
        fn = qs[name]
        # one unlabelled warm run so codegen/broadcast-build cost does
        # not land in the first measured stage
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup(name, name, interruptOnCancel=False)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
    spark.stop()


def _parse(log_dir: str) -> dict[str, dict[int, dict[str, float]]]:
    stage_group: dict[int, str] = {}
    stages: dict[str, dict[int, dict[str, float]]] = {}
    paths = []
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
                elif kind == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info") or {}
                    sid = si.get("Stage ID")
                    group = stage_group.get(sid)
                    if not group:
                        continue
                    d = stages.setdefault(group, {}).setdefault(
                        sid, {"wall_ms": 0.0, "name": ""}
                    )
                    d["name"] = (si.get("Stage Name") or "")[:60]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    if sub and com:
                        d["wall_ms"] = com - sub
                elif kind == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    group = stage_group.get(sid)
                    if not group:
                        continue
                    m = ev.get("Task Metrics") or {}
                    d = stages.setdefault(group, {}).setdefault(
                        sid, {"wall_ms": 0.0, "name": ""}
                    )
                    d["tasks"] = d.get("tasks", 0) + 1
                    d["run_ms"] = d.get("run_ms", 0) + m.get("Executor Run Time", 0)
                    d["gc_ms"] = d.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                    d["deser_ms"] = d.get("deser_ms", 0) + m.get(
                        "Executor Deserialize Time", 0
                    )
                    r_ = m.get("Shuffle Read Metrics") or {}
                    d["fetch_ms"] = d.get("fetch_ms", 0) + r_.get(
                        "Fetch Wait Time", 0
                    )
                    w_ = m.get("Shuffle Write Metrics") or {}
                    # event log records write time in ns
                    d["swrite_ms"] = d.get("swrite_ms", 0) + (
                        w_.get("Shuffle Write Time", 0) / 1e6
                    )
    return stages


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    with tempfile.TemporaryDirectory(prefix="spark-events-") as log_dir:
        _run(names, sf_dir, log_dir)
        stages = _parse(log_dir)
    for name in names:
        per = stages.get(name, {})
        print(f"\n== {name} @ {sf_dir} (second run; times are task sums, ms)")
        print(
            f"{'stage':>6s} {'wall':>7s} {'tasks':>5s} {'run':>8s} "
            f"{'fetch':>7s} {'gc':>6s} {'deser':>6s} {'swrite':>7s}  name"
        )
        for sid in sorted(per):
            d = per[sid]
            print(
                f"{sid:6d} {d.get('wall_ms', 0):7.0f} {d.get('tasks', 0):5d} "
                f"{d.get('run_ms', 0):8.0f} {d.get('fetch_ms', 0):7.0f} "
                f"{d.get('gc_ms', 0):6.0f} {d.get('deser_ms', 0):6.0f} "
                f"{d.get('swrite_ms', 0):7.0f}  {d.get('name', '')}"
            )


if __name__ == "__main__":
    main()
