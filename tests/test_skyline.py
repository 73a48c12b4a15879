"""Skyline operator semantics: the window-based 2D path and the
two-phase nd path must both agree with brute-force dominance on
arbitrary point sets, and the 2D plan must stay join-free."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bq_duckdb_spark.operators.skyline import skyline_2d, skyline_nd

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# small coordinate domains force heavy ties/duplicates — the tricky cases
points_2d = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=25
)
points_3d = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 4), st.integers(0, 4)),
    min_size=1,
    max_size=20,
)


def _brute_skyline(pts, maximize_flags):
    pts = sorted(set(pts))

    def dominates(a, b):
        ge = all(
            (x >= y) if mx else (x <= y)
            for x, y, mx in zip(a, b, maximize_flags)
        )
        return ge and a != b

    return sorted(p for p in pts if not any(dominates(q, p) for q in pts))


@given(pts=points_2d)
@settings(**_SETTINGS)
def test_skyline_2d_equals_brute_force(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute_skyline(pts, [True, False])


@given(pts=points_3d)
@settings(**_SETTINGS)
def test_skyline_nd_equals_brute_force(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long, z long")
    got = sorted(
        (r.x, r.y, r.z)
        for r in skyline_nd(df, maximize=["x"], minimize=["y", "z"]).collect()
    )
    assert got == _brute_skyline(pts, [True, False, False])


def test_skyline_2d_grouped_and_oriented(spark):
    rows = [("a", 1, 1), ("a", 2, 2), ("a", 2, 1), ("b", 1, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = sorted(
        (r.g, r.x, r.y) for r in skyline_2d(df, "x", "y", by=["g"]).collect()
    )
    # group a: (2,1) dominates everything; (1,1) is dominated on x.
    # group b: its only point survives regardless of how bad it is.
    assert got == [("a", 2, 1), ("b", 1, 9)]
    flipped = sorted(
        (r.g, r.x, r.y)
        for r in skyline_2d(
            df, "x", "y", by=["g"], maximize_x=False, minimize_y=False
        ).collect()
    )
    # minimize x / maximize y: (1,1) beats (2,1); (2,2) survives on y
    assert flipped == [("a", 1, 1), ("a", 2, 2), ("b", 1, 9)]


def test_skyline_nd_grouped_no_cross_group_pruning(spark):
    # the (0, 0) point in group b would be dominated by every point of
    # group a — it must still survive within its own group
    rows = [("a", 5, 5), ("b", 0, 0)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = sorted(
        (r.g, r.x, r.y)
        for r in skyline_nd(df, maximize=["x", "y"], minimize=[], by=["g"]).collect()
    )
    assert got == [("a", 5, 5), ("b", 0, 0)]


def test_skyline_null_semantics_agree(spark):
    # NULL-dimension points are excluded by BOTH paths; a NULL group key
    # is a real group (not silently dropped)
    rows = [(None, 5, 1), (None, 4, None), ("a", None, 1), ("a", 2, 2)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got2d = sorted(
        ((r.g, r.x, r.y) for r in skyline_2d(df, "x", "y", by=["g"]).collect()),
        key=lambda t: (t[0] or "", t[1], t[2]),
    )
    gotnd = sorted(
        (
            (r.g, r.x, r.y)
            for r in skyline_nd(df, maximize=["x"], minimize=["y"], by=["g"]).collect()
        ),
        key=lambda t: (t[0] or "", t[1], t[2]),
    )
    assert got2d == [(None, 5, 1), ("a", 2, 2)]
    assert gotnd == got2d


def test_skyline_2d_single_shuffle(spark):
    # dedup rides the dominance window: exactly ONE exchange in the plan
    df = spark.range(100).select(
        (F.col("id") % 7).alias("x"), (F.col("id") % 5).alias("y")
    )
    plan = skyline_2d(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_skyline_2d_plan_is_join_free(spark):
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("x"), (F.col("id") % 11).alias("y")
    )
    plan = skyline_2d(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "2D skyline must not plan any dominance join"
    assert "Window" in plan