"""CDC primitives (operators/cdc.py): diff classification including the
null edge cases that defeat hash-based comparison, and SCD2 interval
semantics."""

from pyspark.sql import functions as F

from bq_duckdb_spark.operators.cdc import scd2, snapshot_diff


def test_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "update", 3: "delete", 4: "insert"}  # 1 unchanged


def test_null_swap_is_an_update(spark):
    # (null, 'a') -> ('a', null): Spark's hash chain skips nulls and
    # would see these as equal — the struct comparison must not
    old = spark.createDataFrame([(1, None, "a")], "k long, x string, y string")
    new = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    got = snapshot_diff(old, new, ["k"]).collect()
    assert [(r.k, r.change_type) for r in got] == [(1, "update")]


def test_null_to_value_update_and_noop(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, x string")
    new = spark.createDataFrame([(1, "v"), (2, None)], "k long, x string")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update"}  # null == null is NOT a change


def test_scd2_intervals(spark):
    rows = [
        (1, "gold", 10, 100),
        (1, "gold", 20, 101),   # collapses into the open gold interval
        (1, "silver", 30, 102),
        (1, "gold", 40, 103),   # re-entry opens a NEW gold interval
        (2, "bronze", 5, 104),
    ]
    df = spark.createDataFrame(rows, "k long, tier string, ts long, id long")
    got = sorted(
        (r.k, r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in scd2(df, ["k"], ["tier"], "ts", "id").collect()
    )
    assert got == [
        (1, "gold", 10, 30, False),
        (1, "gold", 40, None, True),
        (1, "silver", 30, 40, False),
        (2, "bronze", 5, None, True),
    ]


def test_scd2_tiebreak_same_ts(spark):
    rows = [(1, "a", 10, 2), (1, "b", 10, 1)]  # same ts: id orders them
    df = spark.createDataFrame(rows, "k long, tier string, ts long, id long")
    got = sorted(
        (r.tier, r.valid_to is None)
        for r in scd2(df, ["k"], ["tier"], "ts", "id").collect()
    )
    assert got == [("a", True), ("b", False)]  # b (id 1) first, then a


def test_snapshot_diff_random_property(spark):
    """Random old/new snapshots: the diff must exactly match a Python
    dict model of insert/delete/update classification."""
    import random

    random.seed(42)
    for trial in range(3):
        old = {k: (random.randint(0, 3), random.choice("abc"))
               for k in random.sample(range(40), 25)}
        new = {}
        for k in random.sample(range(40), 25):
            if k in old and random.random() < 0.5:
                new[k] = old[k]  # unchanged
            else:
                new[k] = (random.randint(0, 3), random.choice("abc"))
        expect = {}
        for k in set(old) | set(new):
            if k not in old:
                expect[k] = "insert"
            elif k not in new:
                expect[k] = "delete"
            elif old[k] != new[k]:
                expect[k] = "update"
        from bq_duckdb_spark.operators.cdc import snapshot_diff

        mk = lambda d: spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in d.items()], "k long, a long, b string"
        )
        got = {r.k: r.change_type
               for r in snapshot_diff(mk(old), mk(new), ["k"]).collect()}
        assert got == expect, f"trial {trial}"
