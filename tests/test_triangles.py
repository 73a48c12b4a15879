"""Degree-ordered triangle counting + co-occurrence edges
(ext/graph.py): exact counts vs brute force, skew safety, and the
group-cap contract."""

import itertools
import random

from bq_duckdb_spark.ext.graph import cooccurrence_edges, triangle_count


def _count(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return triangle_count(df).first()["n_triangles"]


def test_k4_plus_pendant(spark):
    assert _count(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]) == 4


def test_triangle_free(spark):
    # star + path: no triangles
    assert _count(spark, [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6)]) == 0


def test_random_graph_matches_bruteforce(spark):
    random.seed(11)
    n = 35
    edges = [
        (u, v) for u, v in itertools.combinations(range(n), 2) if random.random() < 0.25
    ]
    es = set(edges)
    expect = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    assert _count(spark, edges) == expect


def test_skewed_hub(spark):
    # hub 0 connected to everyone, plus one rim edge: exactly the rim
    # edges' triangles — the orientation keeps the hub's wedge fan-out
    # at its (few) higher-degree neighbors, but the count is exact
    n = 50
    edges = [(0, i) for i in range(1, n)] + [(1, 2), (3, 4)]
    assert _count(spark, edges) == 2


def test_cooccurrence_edges_and_cap(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (2, "b")]
    df = spark.createDataFrame(rows, "g long, i string")
    got = sorted(
        (r.u, r.v) for r in cooccurrence_edges(df, "g", "i").collect()
    )
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]
    # cap: group of 5 items capped at 3 keeps pairs among the 3 smallest
    big = spark.createDataFrame([(1, c) for c in "edcba"], "g long, i string")
    capped = sorted(
        (r.u, r.v) for r in cooccurrence_edges(big, "g", "i", max_group=3).collect()
    )
    assert capped == [("a", "b"), ("a", "c"), ("b", "c")]
