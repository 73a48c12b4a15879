"""Tier-9 operators: overlapping-window substring dedup and two-phase
exact heavy hitters."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import heavyhitters
from bq_duckdb_spark.ext.pipeline import substring_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def _brute_substring_dedup(rows, k):
    """Reference implementation: python, sequential, obviously correct."""
    toks = {i: t.strip().split() if t.strip() else [""] for i, t in rows}
    # Python's split() on "" gives [] while split on whitespace-regex in
    # the engines gives [""]; normalize to the engine semantics above.
    seen = set()
    dup = {i: set() for i, _ in rows}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - k + 1):
            w = " ".join(tk[p : p + k])
            if w in seen:
                dup[i].add(p)
            else:
                seen.add(w)
    out = {}
    for i in sorted(toks):
        tk = toks[i]
        covered = set()
        for p in dup[i]:
            covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        out[i] = (" ".join(kept), len(tk), len(covered))
    return out


CORPUS = [
    # doc 0: canonical — everything in it is first-seen
    (0, "a b c d e f g h i j k l"),
    # doc 1: repeats doc 0's tokens 2..9 (one full window + overlaps)
    # with fresh tokens around — the straddling case span_dedup misses
    (1, "x y c d e f g h i j z w"),
    # doc 2: verbatim copy of doc 0 — should be cut to nothing
    (2, "a b c d e f g h i j k l"),
    # doc 3: internal repetition — second half repeats the first
    (3, "p q r s t u v w2 p q r s t u v w2"),
    # doc 4: shorter than k — passes through untouched
    (4, "short doc"),
    # doc 5: empty text
    (5, ""),
    # doc 6: unrelated
    (6, "totally different content with no duplicate runs here at all ok"),
]


def test_substring_dedup_matches_bruteforce(spark):
    k = 8
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["removed_tokens"])
        for r in substring_dedup(_docs(spark, CORPUS), "text", "doc_id", k=k).collect()
    }
    want = _brute_substring_dedup(CORPUS, k)
    assert got == want
    # the copy doc lost everything; the short/empty docs pass through
    assert got[2][0] == ""
    assert got[4] == ("short doc", 2, 0)
    assert got[5] == ("", 1, 0)
    # the straddling repeat was caught (span_dedup's grid would miss it)
    assert got[1][2] > 0


def test_substring_dedup_hash_windows_identical(spark):
    df = _docs(spark, CORPUS)
    val = substring_dedup(df, "text", "doc_id", k=8).collect()
    hsh = substring_dedup(df, "text", "doc_id", k=8, hash_windows=True).collect()
    assert sorted(map(tuple, val)) == sorted(map(tuple, hsh))


def test_substring_dedup_interval_merge_overlap(spark):
    # two overlapping duplicate windows must merge into ONE interval,
    # not double-count removed tokens
    rows = [
        (0, "m1 m2 m3 m4 m5 m6 m7 m8 m9"),  # canonical 9 tokens
        (1, "m1 m2 m3 m4 m5 m6 m7 m8 m9 tail"),  # windows at pos 0 AND 1 dup
    ]
    got = {
        r["doc_id"]: (r["text"], r["removed_tokens"])
        for r in substring_dedup(_docs(spark, rows), "text", "doc_id", k=8).collect()
    }
    assert got[1] == ("tail", 9)


def test_substring_dedup_plan_two_shuffles_plus_reassembly(spark):
    from bq_duckdb_spark.plans import audit_plan

    df = _docs(spark, CORPUS)
    a = audit_plan(substring_dedup(df, "text", "doc_id", k=8))
    # window-key rank, dup-position regroup, reassembly join = 3 real
    # shuffles (the audit counts tree line + detail block per exchange,
    # so one shuffle == 2, matching test_dedup_exact_single_shuffle);
    # no cartesian anywhere
    assert a.exchanges <= 6, a.formatted
    assert "CartesianProduct" not in a.formatted


def test_mg_candidates_superset_guarantee(spark):
    # Zipfian-ish stream with planted heavy keys across many partitions;
    # s smaller than the type count so the summaries actually shrink
    n_heavy, tail_types = 3, 500
    rows = [(f"heavy{i}",) for i in range(n_heavy) for _ in range(400)]
    rows += [(f"tail{i}",) for i in range(tail_types) for _ in range(2)]
    items = spark.createDataFrame(rows, "term: string").repartition(8)
    s = 20
    n = len(rows)
    cand = {
        r["term"] for r in heavyhitters.mg_candidates(items, "term", s).collect()
    }
    true_heavy = {f"heavy{i}" for i in range(n_heavy)}  # 400 * 20 > 2200
    assert all(400 * s > n for _ in true_heavy)
    assert true_heavy <= cand
    # and the summaries actually pruned: far fewer candidates than types
    assert len(cand) < tail_types / 2


def test_heavy_hitters_exact_and_layout_invariant(spark):
    rows = [("hot",)] * 300 + [("warm",)] * 120 + [
        (f"cold{i}",) for i in range(200) for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "term: string")
    s = 5  # threshold n/5 = 164: only "hot" qualifies
    n = len(rows)
    expected = {("hot", 300)}
    for layout in (df, df.repartition(16), df.repartition(1), df.coalesce(2)):
        got = {
            (r["term"], r["cnt"])
            for r in heavyhitters.heavy_hitters(layout, "term", s).collect()
        }
        assert got == expected, layout
    assert 300 * s > n and 120 * s <= n


def test_heavy_hitters_boundary_is_strict(spark):
    # cnt * s == n must NOT qualify (strict >)
    rows = [("a",)] * 25 + [("b",)] * 75
    df = spark.createDataFrame(rows, "term: string")
    got = heavyhitters.heavy_hitters(df, "term", 4).collect()  # n/s = 25
    assert {(r["term"], r["cnt"]) for r in got} == {("b", 75)}


def test_heavy_hitters_rejects_bad_s(spark):
    df = spark.createDataFrame([("x",)], "term: string")
    with pytest.raises(ValueError):
        heavyhitters.mg_candidates(df, "term", 0)


def test_heavy_hitters_ignores_nulls(spark):
    rows = [("k",)] * 10 + [(None,)] * 90
    df = spark.createDataFrame(rows, "term: string")
    got = heavyhitters.heavy_hitters(df, "term", 20).collect()
    # n counts all rows incl. NULLs; "k" at 10/100 > 1/20 qualifies;
    # NULL never appears as a key
    assert {(r["term"], r["cnt"]) for r in got} == {("k", 10)}
