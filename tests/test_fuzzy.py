"""Deletion-neighborhood fuzzy join (ext/fuzzy.py): exact semantics on
hand data, bucket-cap determinism, and the no-cartesian scale shape."""

import pytest

from bq_duckdb_spark.ext import fuzzy


def _pairs(spark, data, **kw):
    df = spark.createDataFrame(data, "id long, s string")
    out = fuzzy.fuzzy_pairs_d1(df, str_col="s", id_col="id", **kw)
    return sorted((r.id_a, r.id_b) for r in out.collect())


def test_substitution_insertion_exact(spark):
    got = _pairs(
        spark,
        [
            (1, "kitten"),
            (2, "sitten"),  # substitution of #1
            (3, "sittin"),  # substitution of #2, distance 2 from #1
            (4, "kitten"),  # exact duplicate of #1
            (5, "kittens"),  # insertion on #1/#4
        ],
    )
    assert got == [(1, 2), (1, 4), (1, 5), (2, 3), (2, 4), (4, 5)]


def test_transposition_is_not_distance_one(spark):
    # "ab"/"ba" share deletion variants {"a","b"} but levenshtein = 2:
    # the verify stage must reject what the blocking stage admits
    assert _pairs(spark, [(1, "ab"), (2, "ba")]) == []


def test_empty_and_single_char(spark):
    # "" <-> any single char is distance 1 (one insertion); the empty
    # string must survive variant generation (array(s) guard)
    assert _pairs(spark, [(1, ""), (2, "a"), (3, "b"), (4, "ab")]) == [
        (1, 2),  # "" -> "a" insertion
        (1, 3),  # "" -> "b" insertion
        (2, 3),  # "a" -> "b" substitution
        (2, 4),  # "a" -> "ab" insertion
        (3, 4),  # "b" -> "ab" insertion; ""/"ab" (distance 2) excluded
    ]


def test_nulls_dropped(spark):
    df = spark.createDataFrame([(1, "abc"), (2, None), (3, "abd")], "id long, s string")
    out = fuzzy.fuzzy_pairs_d1(df, str_col="s", id_col="id")
    assert sorted((r.id_a, r.id_b) for r in out.collect()) == [(1, 3)]


def test_max_bucket_cap_deterministic(spark):
    # 10 identical strings: uncapped -> C(10,2)=45 pairs; cap at 3 keeps
    # the 3 smallest ids per variant bucket -> exactly C(3,2)=3 pairs
    data = [(i, "samesame") for i in range(10)]
    got = _pairs(spark, data, max_bucket=3)
    assert got == [(0, 1), (0, 2), (1, 2)]
    assert len(_pairs(spark, data)) == 45


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, s string")
    plan = fuzzy.fuzzy_pairs_d1(df, str_col="s", id_col="id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_longer_strings_verify(spark):
    # distance-2 pair that shares NO variant: never even a candidate
    got = _pairs(spark, [(1, "abcdef"), (2, "abcxyf")])
    assert got == []


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_random_corpus_matches_bruteforce(spark):
    # random short strings over a tiny alphabet: dense distance-1
    # neighborhoods, plenty of insert/delete/substitute pairs AND
    # plenty of distance-2 lookalikes the verify stage must reject
    import itertools
    import random

    random.seed(23)
    strings = [
        "".join(random.choice("abc") for _ in range(random.randint(0, 5)))
        for _ in range(120)
    ]
    expect = sorted(
        (i, j)
        for (i, sa), (j, sb) in itertools.combinations(enumerate(strings), 2)
        if _lev(sa, sb) <= 1
    )
    got = _pairs(spark, list(enumerate(strings)))
    assert got == expect
