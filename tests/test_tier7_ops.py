"""Tier-7 operators on hand-built fixtures: EWMA fold semantics,
incremental-state merge algebra, RRF fusion arithmetic, containment
asymmetry."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.dedup_portable import portable_containment_pairs
from bq_duckdb_spark.ext.retrieval import rrf_fuse
from bq_duckdb_spark.operators import incremental
from bq_duckdb_spark.operators.timeseries import ewma


def _ref_ewma(xs, a):
    out, y = [], None
    for x in xs:
        y = x if y is None else a * x + (1.0 - a) * y
        out.append(y)
    return out


def test_ewma_matches_sequential_reference(spark):
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate([10, 20, 5, 5, 40])]
        + [("w", 0, 7.0)],
        ["k", "t", "v"],
    )
    out = ewma(df, ["k"], ["t"], "v", alpha=0.3)
    got = {(r.k, r.t): r.ewma for r in out.collect()}
    ref = _ref_ewma([10.0, 20.0, 5.0, 5.0, 40.0], 0.3)
    for i, want in enumerate(ref):
        assert got[("u", i)] == pytest.approx(want, abs=0, rel=0), i
    assert got[("w", 0)] == 7.0  # first observation is its own EWMA


def test_ewma_out_of_order_input_sorted_by_time(spark):
    # rows arrive shuffled; the per-key array sort restores event order
    df = spark.createDataFrame(
        [("u", 2, 5.0), ("u", 0, 10.0), ("u", 1, 20.0)], ["k", "t", "v"]
    )
    out = {r.t: r.ewma for r in ewma(df, ["k"], ["t"], "v", 0.5).collect()}
    assert out[0] == 10.0
    assert out[1] == 0.5 * 20.0 + 0.5 * 10.0
    assert out[2] == 0.5 * 5.0 + 0.5 * out[1]


def test_incremental_merge_equals_direct(spark):
    full = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 10.0), ("c", 3.0)],
        ["k", "v"],
    )
    base = full.filter(F.col("v") < 3.5)
    delta = full.filter(F.col("v") >= 3.5)
    merged = incremental.merge_agg_states(
        [
            incremental.agg_state(base, ["k"], "v"),
            incremental.agg_state(delta, ["k"], "v"),
        ],
        ["k"],
    )
    direct = incremental.agg_state(full, ["k"], "v")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }
    out = {r.k: r for r in incremental.read_aggregates(merged, ["k"]).collect()}
    assert out["a"].n_rows == 3 and out["a"].total == 7.0
    assert out["a"].mean == pytest.approx(7.0 / 3)


def test_incremental_merge_is_associative_tree(spark):
    # hourly -> daily -> total tree shape == one flat merge
    parts = [
        spark.createDataFrame([("a", float(i)), ("b", 1.0)], ["k", "v"])
        for i in range(4)
    ]
    states = [incremental.agg_state(p, ["k"], "v") for p in parts]
    left = incremental.merge_agg_states(states[:2], ["k"])
    right = incremental.merge_agg_states(states[2:], ["k"])
    tree = incremental.merge_agg_states([left, right], ["k"])
    flat = incremental.merge_agg_states(states, ["k"])
    assert {tuple(r) for r in tree.collect()} == {tuple(r) for r in flat.collect()}


def test_rrf_fuse_arithmetic(spark):
    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    l2 = spark.createDataFrame([(2, 1), (4, 2)], ["doc_id", "rank"])
    got = {r.doc_id: (r.rrf, r.n_lists) for r in rrf_fuse([l1, l2], k=60).collect()}
    assert got[2] == (pytest.approx(1 / 62 + 1 / 61), 2)  # in both lists
    assert got[1] == (pytest.approx(1 / 61), 1)
    assert got[4] == (pytest.approx(1 / 62), 1)
    # doc in both lists at mediocre ranks beats a single top rank
    assert got[2][0] > got[1][0]


def test_containment_catches_subset_quote(spark):
    # doc 2 is a 36-token prefix of the 40-token doc 1 pasted verbatim:
    # Jaccard is diluted by doc 1's extra tokens (34/38) but containment
    # of doc 2 in doc 1 is exactly 1.0
    long_doc = " ".join(f"tok{i}" for i in range(40))
    short_doc = " ".join(f"tok{i}" for i in range(36))
    other = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)], ["doc_id", "text"]
    )
    out = {(r.id_a, r.id_b): r for r in portable_containment_pairs(
        df, "text", "doc_id", threshold=0.5
    ).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    # 34 shingles of the short doc, all present among the long doc's 38
    assert r.containment_b == 1.0
    assert r.containment_a == pytest.approx(34 / 38)
    assert not any(3 in k for k in out)


def test_ewma_bounded_lookback_within_machine_precision(spark):
    # 200-step history: truncating to the last 110 observations changes
    # nothing beyond double precision, and the bounded fold is itself
    # deterministic (same values regardless of input partitioning)
    import math

    vals = [math.sin(i) * 100 + 100 for i in range(200)]
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate(vals)], ["k", "t", "v"]
    )
    exact = {r.t: r.ewma for r in ewma(df, ["k"], ["t"], "v", 0.3).collect()}
    bounded = {
        r.t: r.ewma
        for r in ewma(df, ["k"], ["t"], "v", 0.3, max_lookback=110).collect()
    }
    bounded2 = {
        r.t: r.ewma
        for r in ewma(
            df.repartition(7), ["k"], ["t"], "v", 0.3, max_lookback=110
        ).collect()
    }
    assert exact.keys() == bounded.keys()
    for t in exact:
        assert bounded[t] == pytest.approx(exact[t], rel=1e-12), t
        assert bounded2[t] == bounded[t], t  # bit-identical
    ref = _ref_ewma(vals, 0.3)
    for i, want in enumerate(ref):
        assert exact[i] == want


# -- property tests: random inputs vs single-machine references -------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    series=st.lists(
        st.tuples(st.integers(0, 3), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
@settings(**_HSET)
def test_ewma_property_vs_reference(spark, series, alpha):
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(series)], ["k", "t", "v"]
    )
    got = {(r.k, r.t): r.ewma for r in ewma(df, ["k"], ["t"], "v", alpha).collect()}
    per_key = {}
    for i, (k, v) in enumerate(series):
        per_key.setdefault(k, []).append((i, v))
    for k, items in per_key.items():
        ref = _ref_ewma([v for _, v in items], alpha)
        for (i, _), want in zip(items, ref):
            assert got[(k, i)] == want, (k, i)  # exact: same fold order


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-1e9, 1e9, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
    n_splits=st.integers(1, 4),
    seed=st.integers(0, 1000),
)
@settings(**_HSET)
def test_incremental_merge_property(spark, rows, n_splits, seed):
    # arbitrary partition of the rows into delta batches: merged states
    # must equal the direct aggregate over everything (counts exact,
    # sums within float re-association tolerance)
    import random

    rng = random.Random(seed)
    buckets = [[] for _ in range(n_splits)]
    for r in rows:
        buckets[rng.randrange(n_splits)].append(r)
    schema = "k int, v double"
    states = [
        incremental.agg_state(spark.createDataFrame(b, schema), ["k"], "v")
        for b in buckets
        if b
    ]
    if not states:
        return
    merged = {
        r.k: (r.n, r.s)
        for r in incremental.merge_agg_states(states, ["k"]).collect()
    }
    direct = {
        r.k: (r.n, r.s)
        for r in incremental.agg_state(
            spark.createDataFrame(rows, schema), ["k"], "v"
        ).collect()
    }
    assert merged.keys() == direct.keys()
    for k in direct:
        assert merged[k][0] == direct[k][0]
        assert merged[k][1] == pytest.approx(direct[k][1], rel=1e-9, abs=1e-6)
