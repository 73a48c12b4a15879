"""Pin the oracle-side connected-components CTE chain
(ext/contract_portable.components_ctes) against a union-find ground
truth on hostile graph shapes.

gen_fuzz finding (seed 201, round 10): the pre-hook chain (min-relax +
single pointer jump) gains only ~1 hop of label reach per round — a
394-node random near-dup component whose min node had eccentricity 28
needed 19 rounds, so the unrolled 16 returned silently wrong cluster
labels while the Spark side (raise-on-non-convergence pointer jumping,
ext/dedup.py) was right. The fix adds the Shiloach-Vishkin parent-hook
step, measured <= ceil(log2(n)) + 2 rounds on this panel, plus a
``lab_unconverged`` sentinel CTE so any future under-convergence fails
the cross-engine sweep loudly instead of hash-mismatching on
ordinary-looking rows.

Pure DuckDB — no Spark session, so the module is cheap enough for the
default pytest lane.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from bq_duckdb_spark.ext.contract_portable import components_ctes


def _union_find_labels(edges, nodes):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in nodes}


def _sql_labels(edges, rounds=16):
    """Run the CTE chain on a literal edge table; returns (labels,
    unconverged_count)."""
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = (
        f"WITH raw(src, dst) AS (VALUES {vals}), "
        "edges AS MATERIALIZED (SELECT src, dst FROM raw "
        "UNION SELECT dst, src FROM raw), "
        f"{components_ctes(rounds)} "
        "SELECT node, cl, (SELECT n FROM lab_unconverged) FROM lab"
    )
    rows = con.execute(sql).fetchall()
    labels = {node: cl for node, cl, _ in rows}
    unconv = rows[0][2] if rows else 0
    return labels, unconv


def _check(edges):
    nodes = sorted({x for e in edges for x in e})
    truth = _union_find_labels(edges, nodes)
    got, unconv = _sql_labels(edges)
    assert unconv == 0, "sentinel fired on a graph 16 rounds must cover"
    assert got == truth


def test_seed201_class_random_gnp():
    # the fuzz-201 failure class: a sparse random graph whose giant
    # component is deep (eccentricity of the min node > 16)
    rng = random.Random(201)
    n = 500
    ids = list(range(n))
    rng.shuffle(ids)
    edges = []
    for i in range(n):
        for _ in range(2):
            j = rng.randrange(n)
            if i != j:
                edges.append((ids[min(i, j)], ids[max(i, j)]))
    _check(edges)


def test_long_path_random_ids():
    rng = random.Random(7)
    ids = list(range(2000))
    rng.shuffle(ids)
    _check([(ids[i], ids[i + 1]) for i in range(1999)])


def test_long_path_ordered_ids():
    # worst case for hook-less relax: min at one end of a line
    _check([(i, i + 1) for i in range(3000)])


def test_cycle():
    rng = random.Random(3)
    ids = list(range(1500))
    rng.shuffle(ids)
    _check([(ids[i], ids[(i + 1) % 1500]) for i in range(1500)])


def test_binary_tree_random_ids():
    rng = random.Random(11)
    n = 2047
    ids = list(range(n))
    rng.shuffle(ids)
    _check([(ids[i], ids[(i - 1) // 2]) for i in range(1, n)])


def test_multiple_components_and_star():
    # two components + a star; labels must not leak across components
    edges = [(10, 11), (11, 12), (12, 13)]
    edges += [(100 + i, 200) for i in range(20)]
    _check(edges)


def test_sentinel_fires_when_under_converged():
    # a 300-node ordered path at rounds=3 CANNOT converge; the
    # lab_unconverged count must be positive so callers' sentinel row
    # turns the wrong answer into a loud, diagnosable sweep failure
    edges = [(i, i + 1) for i in range(300)]
    labels, unconv = _sql_labels(edges, rounds=3)
    assert unconv > 0
    # and the labels really are wrong at 3 rounds (guards against the
    # sentinel becoming vacuously true/false if the chain changes)
    truth = _union_find_labels(edges, sorted({x for e in edges for x in e}))
    assert labels != truth


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_gnp_seeds(seed):
    rng = random.Random(seed)
    n = 300
    edges = []
    for _ in range(int(n * 1.1)):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    _check(edges)
