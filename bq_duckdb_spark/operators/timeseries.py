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
    max_lookback: int | None = None,
) -> DataFrame:
    """One row per input row: the EWMA of ``value_col`` over the key's
    history up to and including that row.

    Output columns: ``key_cols + order_cols + [value_col, out]``.
    ``alpha`` is embedded as a double literal; the fold
    ``acc -> α·x + (1-α)·acc`` runs left-to-right from the first
    observation, prefix by prefix.

    ``max_lookback``: per-prefix folds cost O(n²) per key exactly
    (every prefix refolds its history). A weight (1-α)^K below ~1e-17
    is beneath double precision, so folding only the last K
    observations per prefix (K ≈ ln(1e-17)/ln(1-α); 110 for α=0.3) is
    numerically indistinguishable while making the per-key cost O(n·K)
    — the right setting when keys have long histories. Both the exact
    and bounded forms are deterministic; a reference engine running the
    same bounded fold matches bit-for-bit. For truly unbounded streams
    use streaming.stateful_ewma (O(1) running state).
    """
    if max_lookback is not None and int(max_lookback) < 1:
        raise ValueError(f"max_lookback must be >= 1, got {max_lookback}")
    ev = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("__v")
    )
    g = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.array_sort(F.collect_list(ev)).alias("__evs"))
        .withColumn("__vals", F.expr("transform(__evs, e -> e.__v)"))
    )
    # fold seed = first element of the (possibly lookback-truncated)
    # window, fold body = the rest; start index s is 1 for the exact
    # form and max(1, i - K + 1) for the bounded form (i = 1-based
    # prefix index)
    s = (
        "1" if max_lookback is None else f"greatest(1, i + 1 - {int(max_lookback)})"
    )
    # All per-prefix folds run INSIDE the grouped row, so the explode
    # emits only scalar fields. The previous formulation carried the
    # full __vals array on every exploded row; a hostile key (the
    # adversarial mega-user: ~150k events) then pushed O(n^2) BYTES
    # through the pipeline — 150k rows x 1.2 MB array each — and took
    # the whole local JVM down with it (java.lang.OutOfMemoryError,
    # ORACLE_adv_r5.log round 5).
    ewmas = (
        f"transform(sequence(1, size(__vals)), i -> "
        f"aggregate(slice(__vals, ({s}) + 1, i - ({s})), "
        f"element_at(__vals, {s}), "
        f"(acc, x) -> CAST({alpha} AS DOUBLE) * x + CAST({1.0 - alpha} AS DOUBLE) * acc))"
    )
    # posexplode_outer (never plain posexplode on a computed array:
    # InferFiltersFromGenerate would inline the collect+transform into a
    # pre-Generate filter and re-evaluate it)
    rows = g.withColumn("__ewmas", F.expr(ewmas)).select(
        *key_cols,
        F.posexplode_outer(F.arrays_zip("__evs", "__ewmas")).alias("__pos", "__z"),
    )
    return rows.select(
        *key_cols,
        *[F.col(f"__z.__evs.{c}").alias(c) for c in order_cols],
        F.col("__z.__evs.__v").alias(value_col),
        F.col("__z.__ewmas").alias(out),
    )
