"""Skew/co-location helpers: salted join correctness + bucketed joins
eliding exchanges."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.operators.skew import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # key 0 holds 90% of the fact rows — the classic hot key
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 5, f"r{i}") for i in range(1000)], ["k", "payload"]
    )
    dim = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], ["k", "label"])
    return fact, dim


def test_salted_join_matches_plain_join(skewed_pair):
    fact, dim = skewed_pair
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(skewed_pair, spark):
    fact, dim = skewed_pair
    missing = fact.union(spark.createDataFrame([(99, "orphan")], ["k", "payload"]))
    out = salted_join(missing, dim, "k", how="left")
    orphan = [r for r in out.collect() if r.k == 99]
    assert len(orphan) == 1 and orphan[0].label is None
    assert out.count() == missing.count()


def test_salted_join_spreads_hot_key(skewed_pair):
    fact, dim = skewed_pair
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*fact.columns)), F.lit(16))
    )
    hot = salted.filter("k = 0").groupBy("__salt").count().collect()
    # the hot key's rows must land in many salt partitions, not one
    assert len(hot) >= 12


def test_bucketed_join_has_no_exchange(spark, skewed_pair):
    fact, dim = skewed_pair
    write_bucketed(fact, "b_fact", "k", num_buckets=8, sort_cols="k")
    write_bucketed(
        spark.createDataFrame([(i, i * 1.0) for i in range(5)], ["k", "w"]),
        "b_dim2", "k", num_buckets=8, sort_cols="k",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bucketed_join_ready(spark, "b_fact", "b_dim2", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == fact.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_fact")
        spark.sql("DROP TABLE IF EXISTS b_dim2")


def test_join_with_strategy_controls_physical_plan(spark, skewed_pair):
    from bq_duckdb_spark.operators import join_with_strategy

    fact, dim = skewed_pair
    expected_rows = fact.join(dim, "k").count()
    for strategy, marker in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        j = join_with_strategy(fact, dim, "k", strategy=strategy)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert marker in plan, f"{strategy} hint not honored:\n{plan[:500]}"
        assert j.count() == expected_rows
    with pytest.raises(ValueError, match="unknown join strategy"):
        join_with_strategy(fact, dim, "k", strategy="warp_drive")
