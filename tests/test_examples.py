"""Smoke test every examples/ script (round-8 brief item 5): the
examples are runnable documentation and the only source that no other
test imported — one subprocess run per script at sf0.001 pins them
against API drift.

Each example builds its own SparkSession and some mutate warehouse /
checkpoint state, so they run as real subprocesses (exactly how a user
runs them), not in-process imports."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

EXAMPLES = [
    ("corpus_pipeline.py", [SF], "after LM gate"),
    ("experiment_readout.py", [SF], ""),
    ("model_curation.py", [SF], ""),
    ("retrieval_search.py", [SF], ""),
    ("rpc_client.py", [], "ping:"),
    ("streaming_ingestion.py", [SF], ""),
    ("warehouse_layout.py", [], ""),
]


@pytest.mark.parametrize(
    "script,args,needle", EXAMPLES, ids=[e[0] for e in EXAMPLES]
)
def test_example_runs(script, args, needle, tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=tmp_path,  # scratch cwd: warehouse/checkpoint writes stay here
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, (
        f"{script} failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.strip(), f"{script} printed nothing"
    if needle:
        assert needle in proc.stdout, (
            f"{script} output missing {needle!r}:\n{proc.stdout[-2000:]}"
        )
