"""Time-series smoothing operators.

``ewma`` computes the standard recursive exponentially weighted moving
average y_i = α·x_i + (1-α)·y_{i-1} (y_1 = x_1) per key, ordered by the
event-time columns.

Execution shape: ONE shuffle (groupBy key) collects each key's ordered
history into an array, and every prefix is then a strictly sequential
left fold over that array — the same fold order any engine performs, so
results are bit-identical to a reference implementation (no float
re-association across partitions, unlike a windowed SUM of scaled
terms, whose (1-α)^(n-i) weights also overflow/underflow for long
histories).

Scale: per-key memory is the key's own history length — the
entity-history class of operator (like SCD2 / sessionize), fine for
bounded per-entity activity at any corpus size. For unbounded streams
keep only the running (y, ts) pair per key instead:
streaming/streams.py's stateful operator is that shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """One row per input row: the EWMA of ``value_col`` over the key's
    history up to and including that row.

    Output columns: ``key_cols + order_cols + [value_col, out]``.
    ``alpha`` is embedded as a double literal; the fold
    ``acc -> α·x + (1-α)·acc`` runs left-to-right from the first
    observation, prefix by prefix.
    """
    ev = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("__v")
    )
    g = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.array_sort(F.collect_list(ev)).alias("__evs"))
        .withColumn("__vals", F.expr("transform(__evs, e -> e.__v)"))
    )
    # posexplode_outer (never plain posexplode on a computed array:
    # InferFiltersFromGenerate would inline the collect+transform into a
    # pre-Generate filter and re-evaluate it)
    rows = g.select(
        *key_cols,
        F.posexplode_outer("__evs").alias("__pos", "__ev"),
        "__vals",
    )
    fold: Column = F.expr(
        f"aggregate(slice(__vals, 2, __pos), element_at(__vals, 1), "
        f"(acc, x) -> CAST({alpha} AS DOUBLE) * x + CAST({1.0 - alpha} AS DOUBLE) * acc)"
    )
    return rows.select(
        *key_cols,
        *[F.col(f"__ev.{c}").alias(c) for c in order_cols],
        F.col("__ev.__v").alias(value_col),
        fold.alias(out),
    )
