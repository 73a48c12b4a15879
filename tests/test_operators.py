"""asof_join / range_join semantics on hand-built fixtures."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.operators import asof_join, range_join
from tests.conftest import rows


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 3, 100.0), ("A", 10, 101.0), ("B", 5, 50.0), ("C", 1, 9.0)],
        ["sym", "t", "px"],
    )
    quotes = spark.createDataFrame(
        [("A", 1, 99.0), ("A", 3, 99.5), ("A", 8, 100.5), ("B", 6, 49.0)],
        ["sym", "t", "bid"],
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                    right_values=["bid"])
    got = {(r.sym, r.t): (r.bid_right, r.t_right) for r in out.collect()}
    assert got[("A", 3)] == (99.5, 3)    # equal time matches (inclusive)
    assert got[("A", 10)] == (100.5, 8)  # latest at-or-before
    assert got[("B", 5)] == (None, None) # quote at 6 is after the trade
    assert got[("C", 1)] == (None, None) # no quotes for C at all
    assert out.count() == trades.count()  # left-join semantics


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                    right_values=["bid"], direction="forward")
    got = {(r.sym, r.t): (r.bid_right, r.t_right) for r in out.collect()}
    assert got[("A", 3)] == (99.5, 3)   # inclusive at equal time
    assert got[("A", 10)] == (None, None)  # nothing after t=10
    assert got[("B", 5)] == (49.0, 6)


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                    right_values=["bid"], tolerance=1)
    got = {(r.sym, r.t): r.bid_right for r in out.collect()}
    assert got[("A", 3)] == 99.5    # gap 0 <= 1
    assert got[("A", 10)] is None   # gap 2 > 1 → masked
    assert out.count() == trades.count()


def test_asof_multi_key(spark):
    left = spark.createDataFrame([(1, "x", 10), (2, "x", 10)], ["k1", "k2", "t"])
    right = spark.createDataFrame([(1, "x", 5, "v1"), (2, "x", 7, "v2")],
                                  ["k1", "k2", "t", "v"])
    out = asof_join(left, right, on=["k1", "k2"], left_time="t", right_time="t",
                    right_values=["v"])
    got = {r.k1: r.v_right for r in out.collect()}
    assert got == {1: "v1", 2: "v2"}


@pytest.fixture(scope="module")
def points_intervals(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(20)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 5.0, 12.0), (2, 11.0, 15.0)], ["iid", "lo", "hi"]
    )
    return points, intervals


def test_range_join_broadcast(points_intervals):
    points, intervals = points_intervals
    out = range_join(points, intervals, "x", "lo", "hi")
    got = sorted((r.pid, r.iid) for r in out.collect())
    # overlapping intervals: x=11 belongs to both band 1 and band 2
    assert (11, 1) in got and (11, 2) in got
    assert (4, 0) in got and (15, 2) not in got  # hi is exclusive
    assert all(p < 15 for p, _ in got)


def test_range_join_bucketed_matches_broadcast(points_intervals):
    points, intervals = points_intervals
    a = sorted((r.pid, r.iid) for r in
               range_join(points, intervals, "x", "lo", "hi").collect())
    b = sorted((r.pid, r.iid) for r in
               range_join(points, intervals, "x", "lo", "hi",
                          strategy="bucketed", bucket_width=4.0).collect())
    assert a == b


def test_range_join_left(points_intervals, spark):
    points, intervals = points_intervals
    out = range_join(points, intervals, "x", "lo", "hi", how="left")
    unmatched = [r.pid for r in out.collect() if r.iid is None]
    assert sorted(unmatched) == [15, 16, 17, 18, 19]
