"""Semantic invariants for the tier-3 event-analytics + LM-score
operators (the oracle sweep pins exact values; these pin the shape)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bq_duckdb_spark import contract_tier3 as t3
from bq_duckdb_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_funnel_stages_monotonic(spark):
    rows = {r.stage: r.n_users for r in t3.q_funnel(spark, SF).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_retention_week_zero_covers_cohort(spark):
    """Every user is active in their own cohort week, so the week-0 row
    of each cohort equals the cohort's size."""
    ret = t3.q_retention(spark, SF)
    week0 = {
        r.cohort_week: r.n_active
        for r in ret.filter(F.col("week_offset") == 0).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohort_sizes = {
        str(r.cw): r.n
        for r in first.select(
            F.expr(
                "date_sub(d0, CAST(datediff(d0, DATE '1970-01-05') % 7 AS INT))"
            ).alias("cw")
        )
        .groupBy("cw")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert week0 == cohort_sizes


def test_gapfill_dense_and_conservative(spark):
    out = t3.q_gapfill(spark, SF)
    # dense: per user, rows == span days; conservative: sum == raw count
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.sum("n_events").alias("total"),
    )
    bad = spans.filter(
        F.expr("n_days != datediff(CAST(d1 AS DATE), CAST(d0 AS DATE)) + 1")
    ).count()
    assert bad == 0
    ev_total = load_table(spark, SF, "events").count()
    assert spans.agg(F.sum("total")).first()[0] == ev_total


def test_perplexity_scores_are_valid_logprobs(spark):
    out = t3.text_perplexity(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_bigrams >= 1
        assert r.avg_logprob < 0.0
        assert math.isfinite(r.avg_logprob)


def test_tier3_plans_have_no_cartesian(spark):
    for name, fn in t3.queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
