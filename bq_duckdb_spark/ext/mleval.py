"""Model-evaluation operators: AUC, calibration, confusion statistics —
the loop that decides whether a quality classifier is good enough to
gate a corpus (pairs with ext/retrieval.py's training/inference).

Scale design — AUC WITHOUT per-row ranks: the textbook rank-sum AUC
puts a global window over every scored row (a data-sized
SinglePartition funnel). Instead quantize the score and aggregate to a
per-score histogram (one shuffle, bounded by the quantization grid),
then AUC = sum over scores of np(s) * (negatives strictly below s +
half the negatives tied at s), divided by P*N — the Mann-Whitney U
with the standard 0.5 tie credit. The only ordered pass runs over the
BOUNDED histogram. Quantization makes the metric "AUC of the quantized
scorer": grid 1e-4 moves AUC by < 1e-3 on any realistic score spread,
and determinism is exact (floor of IEEE-identical doubles — never
round(), whose half-up differs across engines).

Calibration bins and confusion counts are single map-side-combined
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GRID = 10000  # score quantization: floor(prob * GRID)


def auc(scored: DataFrame, prob_col: str, label_col: str) -> DataFrame:
    """One row: (n_pos, n_neg, auc). ``label_col`` is 0/1."""
    g = (
        scored.select(
            F.floor(F.col(prob_col) * GRID).alias("sq"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("sq")
        .agg(
            F.sum("y").alias("np"),
            (F.count(F.lit(1)) - F.sum("y")).alias("nn"),
        )
    )
    w = Window.orderBy("sq").rowsBetween(Window.unboundedPreceding, -1)
    u = g.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("cum_nn"),
    ).agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (F.col("cum_nn") + 0.5 * F.col("nn"))).alias("u_stat"),
    )
    # NULL, not inf/NaN/error, when a class is absent: Spark's non-ANSI
    # x/0 gives NULL while DuckDB's IEEE default gives inf — guard both
    # sides explicitly (the oracle carries the same CASE)
    return u.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u_stat") / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


def calibration_bins(
    scored: DataFrame, prob_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability diagram data: per probability bin, count, mean
    predicted probability, and observed positive rate."""
    return (
        scored.select(
            F.least(
                F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
            ).alias("bin"),
            F.col(prob_col).alias("p"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p"), 4).alias("mean_prob"),
            F.round(F.avg("y"), 4).alias("pos_rate"),
        )
    )


def psi(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Population Stability Index between two populations of a bounded
    score: fixed equal-width bins (FIXED, not data-derived quantiles —
    a drift monitor must not let the drifting data move its own bins),
    PSI = sum over bins of (pa - pe) * ln(pa / pe), with the standard
    1e-6 floor on empty-bin proportions. One aggregate per side over
    the bin key + a broadcast-sized join of two n_bins-row tables.
    Rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted."""
    def binned(df: DataFrame, out: str) -> DataFrame:
        # multiply, don't divide by the bin width: floor(v * 10) and
        # floor(v / 0.1) DISAGREE on boundary doubles (0.3 / 0.1 is
        # 2.9999…), and calibration_bins + the DuckDB oracles multiply
        b = F.least(
            F.floor((F.col(value_col) - lo) * n_bins / (hi - lo)),
            F.lit(n_bins - 1),
        )
        return (
            df.select(F.greatest(b, F.lit(0)).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )
    e, a = binned(expected, "ne"), binned(actual, "na")
    tot = e.join(a, "bin", "full").select(
        F.coalesce("ne", F.lit(0)).alias("ne"),
        F.coalesce("na", F.lit(0)).alias("na"),
    )
    # the global window runs over the n_bins-row bin table — bounded
    w = Window.partitionBy()
    props = tot.select(
        "ne",
        "na",
        F.greatest(F.col("ne") / F.sum("ne").over(w), F.lit(1e-6)).alias("pe"),
        F.greatest(F.col("na") / F.sum("na").over(w), F.lit(1e-6)).alias("pa"),
    )
    return props.agg(
        F.sum("ne").alias("n_expected"),
        F.sum("na").alias("n_actual"),
        F.sum(
            (F.col("pa") - F.col("pe")) * (F.log("pa") - F.log("pe"))
        ).alias("psi"),
    )


def confusion_stats(
    scored: DataFrame, prob_col: str, label_col: str, threshold: float = 0.5
) -> DataFrame:
    """One row: tp/fp/tn/fn + precision/recall/f1 at ``threshold``."""
    pred = (F.col(prob_col) >= threshold).cast("long")
    y = F.col(label_col).cast("long")
    agg = scored.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
        F.sum((1 - pred) * y).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        # CAST(... AS DOUBLE) everywhere: a bare 2.0 literal is
        # DECIMAL(2,1) in Spark SQL and would type the ratio as decimal
        F.expr(
            "CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END"
        ).alias("precision"),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END"
        ).alias("recall"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn > 0 "
            "THEN CAST(2.0 AS DOUBLE) * tp / (2 * tp + fp + fn) END"
        ).alias("f1"),
    )
