"""Expectations + profiler (ext/validate.py): planted violations are
counted exactly; clean data reports zeros; profile matches hand stats."""

from pyspark.sql import functions as F

from bq_duckdb_spark.ext import validate as v


def test_planted_violations(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "x"), (9, "a")],
        "k long, s string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    report = {
        r.rule: r.n_violations
        for r in v.validation_report(
            [
                v.check_unique(child, ["k"]),
                v.check_fk(child, parent, "k", "k"),
                v.check_not_null(child, ["k", "s"]),
                v.check_range(child, "k", lo=1, hi=3),
                v.check_accepted_values(child, "s", ["a", "x"]),
            ]
        ).collect()
    }
    assert report == {
        "unique:k": 1,        # two rows with k=1
        "fk:k->k": 1,         # k=9 has no parent
        "not_null:k": 0,
        "not_null:s": 1,      # the None
        "range:k": 1,         # k=9 out of [1,3]
        "accepted:s": 0,      # NULL is not a violation
    }


def test_clean_data_all_zero(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    rep = v.validation_report(
        [v.check_unique(df, ["k"]), v.check_not_null(df, ["k", "s"])]
    )
    assert all(r.n_violations == 0 for r in rep.collect())


def test_profile_matches_hand_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (2, 6.0, None)],
        "k long, val double, s string",
    )
    prof = {r.column: r for r in v.profile_table(df).collect()}
    assert prof["k"].n_nulls == 0 and prof["k"].n_distinct == 2
    assert prof["k"].min_value == "1" and prof["k"].max_value == "2"
    assert prof["k"].mean_value == (1 + 2 + 2) / 3
    assert prof["val"].n_nulls == 1 and prof["val"].mean_value == 4.0
    assert prof["s"].n_nulls == 1 and prof["s"].mean_value is None
    assert prof["s"].min_value == "x" and prof["s"].max_value == "y"


def test_single_job_shapes(spark):
    # the whole report is one plan; no per-rule driver loop artifacts
    df = spark.createDataFrame([(1,)], "k long")
    rep = v.validation_report([v.check_unique(df, ["k"]), v.check_not_null(df, ["k"])])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan


def test_weird_column_names(spark):
    # quotes / spaces / dots in column names must profile and check
    # verbatim (structs built with F.struct/F.lit, columns via df[c])
    df = spark.createDataFrame([(1, 2.0), (None, 3.0)], ["od d.col", "it's"])
    rep = {r.rule: r.n_violations for r in v.check_not_null(df, ["od d.col", "it's"]).collect()}
    assert rep == {"not_null:od d.col": 1, "not_null:it's": 0}
    prof = {r.column: r for r in v.profile_table(df).collect()}
    assert prof["od d.col"].n_nulls == 1 and prof["od d.col"].n_distinct == 1
    assert prof["it's"].mean_value == 2.5
    more = {r.rule: r.n_violations for r in v.validation_report([
        v.check_unique(df, ["od d.col"]),
        v.check_range(df, "it's", lo=2.5, hi=3.0),
        v.check_accepted_values(df, "it's", [2.0, 3.0]),
    ]).collect()}
    assert more["unique:od d.col"] == 0   # (1, NULL) distinct keys
    assert more["range:it's"] == 1        # 2.0 below lo
    assert more["accepted:it's"] == 0
