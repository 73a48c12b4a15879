"""Model-eval operators (ext/mleval.py): AUC against hand-computed
values including tie credit, perfect/anti/random separators,
calibration bin math, and confusion edge cases."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.mleval import auc, calibration_bins, confusion_stats


def _scored(spark, rows):
    return spark.createDataFrame(rows, "prob double, y int")


def test_auc_hand_computed_with_ties(spark):
    # probs: pos {0.9, 0.7, 0.5}, neg {0.5, 0.3}
    # pairs: (0.9 beats both) + (0.7 beats both) + (0.5 vs 0.3 -> 1,
    #        0.5 vs 0.5 -> 0.5)  => U = 5.5, P*N = 6
    df = _scored(spark, [(0.9, 1), (0.7, 1), (0.5, 1), (0.5, 0), (0.3, 0)])
    r = auc(df, "prob", "y").first()
    assert (r.n_pos, r.n_neg) == (3, 2)
    assert r.auc == pytest.approx(5.5 / 6)


def test_auc_perfect_and_inverted(spark):
    perfect = _scored(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    assert auc(perfect, "prob", "y").first().auc == 1.0
    inverted = _scored(spark, [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)])
    assert auc(inverted, "prob", "y").first().auc == 0.0


def test_auc_all_tied_is_half(spark):
    df = _scored(spark, [(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)])
    assert auc(df, "prob", "y").first().auc == pytest.approx(0.5)


def test_calibration_bins(spark):
    df = _scored(spark, [(0.05, 0), (0.08, 1), (0.95, 1), (0.99, 1), (1.0, 1)])
    got = {r.bin: (r.n, r.pos_rate) for r in calibration_bins(df, "prob", "y").collect()}
    assert got[0] == (2, 0.5)
    assert got[9] == (3, 1.0)  # 1.0 clamps into the top bin


def test_confusion_and_f1(spark):
    df = _scored(spark, [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0)])
    r = confusion_stats(df, "prob", "y").first()
    assert (r.tp, r.fp, r.tn, r.fn) == (1, 1, 1, 1)
    assert r.precision == 0.5 and r.recall == 0.5 and r.f1 == pytest.approx(0.5)


def test_confusion_degenerate_guards(spark):
    # no predicted positives -> precision NULL, recall 0
    df = _scored(spark, [(0.1, 1), (0.2, 0)])
    r = confusion_stats(df, "prob", "y").first()
    assert r.precision is None
    assert r.recall == 0.0


def test_auc_no_global_row_window(spark):
    # the ordered pass must run over the quantized histogram, not the
    # raw rows: with 1000 rows of <= GRID distinct scores, the Window
    # input is the aggregate — assert the plan aggregates BEFORE any
    # single-partition sort
    df = spark.range(1000).selectExpr(
        "CAST(id % 97 AS DOUBLE) / 97 AS prob", "CAST(id % 2 AS INT) AS y"
    )
    plan = auc(df, "prob", "y")._jdf.queryExecution().executedPlan().toString()
    # the per-score histogram aggregate (keys=[sq…]) must feed the
    # ordered window — i.e. appear BELOW it in the printed tree. A
    # raw-row global-rank plan has a Window but no sq-keyed aggregate
    # under it (the final .agg() alone would make a weaker check pass).
    win = plan.find("Window")
    hist = plan.find("keys=[sq")
    assert win != -1 and hist != -1
    assert hist > win  # histogram is a child of (printed after) the window


def test_psi_identical_populations_near_zero(spark):
    df = spark.range(500).selectExpr("CAST(id % 100 AS DOUBLE) / 100 AS prob")
    r = __import__("bq_duckdb_spark.ext.mleval", fromlist=["psi"]).psi(
        df, df, "prob"
    ).first()
    assert r.n_expected == r.n_actual == 500
    assert abs(r.psi) < 1e-12


def test_psi_shifted_population_flags(spark):
    lo = spark.range(500).selectExpr("CAST(id % 30 AS DOUBLE) / 100 AS prob")
    hi = spark.range(500).selectExpr("0.7 + CAST(id % 30 AS DOUBLE) / 100 AS prob")
    from bq_duckdb_spark.ext.mleval import psi

    r = psi(lo, hi, "prob").first()
    assert r.psi > 0.25  # "shifted" per the standard rule of thumb
