"""Skew and co-location helpers for joins at scale.

- ``salted_join``: explicit salting for joins whose key distribution is
  too skewed even for AQE's skew-join splitting (a handful of hot keys
  holding most rows). The skewed side gets a deterministic salt in
  [0, n); the other side is replicated n× — hot keys spread over n
  tasks instead of one straggler.
- ``write_bucketed`` / ``bucketed_join_ready``: persist both join sides
  bucketed by the join key so repeated joins are exchange-free
  (co-located): the shuffle is paid once at write time, not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys need spreading.

    The salt on the skewed side is a deterministic hash of the whole row
    (stable across retries — no RNG); ``other`` is exploded ``num_salts``×.
    Result columns equal a plain ``skewed.join(other, on, how)``.
    Replication cost: |other| × num_salts rows shuffled — use only when
    ``other`` is the smaller side and broadcast is impossible.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(num_salts))
    )
    salted_r = other.withColumn(
        # _outer: computed (constant) array, repo convention; never empty
        "__salt", F.explode_outer(F.array([F.lit(i) for i in range(num_salts)]))
    )
    out = salted_l.join(salted_r, on=[*keys, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the join
    key. Two tables bucketed identically join with NO exchange — the
    at-rest layout that turns an every-query shuffle into a one-time
    write cost. (Bucketing requires the table catalog: ``saveAsTable``.)
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


_JOIN_HINTS = {"broadcast": "broadcast", "merge": "merge", "shuffle_hash": "shuffle_hash"}


def join_with_strategy(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    strategy: str = "auto",
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit physical strategy.

    strategy: "auto" (Catalyst/AQE decides), "broadcast" (small right
    side), "merge" (sort-merge — spill-safe for huge both-sides),
    "shuffle_hash" (hash build on the smaller side, skips the sort when
    partitions fit in memory). Hints apply to the right side; Catalyst
    honors them when legal for the join type.
    """
    if strategy == "auto":
        return left.join(right, on=on, how=how)
    hint = _JOIN_HINTS.get(strategy)
    if hint is None:
        raise ValueError(
            f"unknown join strategy {strategy!r}; one of auto|broadcast|merge|shuffle_hash"
        )
    return left.join(right.hint(hint), on=on, how=how)


def bucketed_join_ready(spark, table_a: str, table_b: str, on: str | list[str]) -> DataFrame:
    """Join two bucketed tables on their bucket key — Catalyst elides
    both exchanges when bucket specs line up."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(table_a).join(spark.table(table_b), on=keys)


def key_skew_stats(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Join-key skew diagnosis: the ``top_k`` heaviest keys with their
    share of the table and their multiple of the mean key frequency —
    the numbers that decide between a plain shuffle join, AQE skew
    handling, and explicit salting (salted_join above).

    ``(key, cnt, pct, x_over_avg)``, heaviest first, ties broken by key
    so the output is deterministic. One groupBy(key) shuffle (map-side
    partial), then a TakeOrderedAndProject for the top-k and a 1-row
    broadcast for the corpus totals — nothing driver-side, so it is
    cheap to run as a pre-flight check before a big join.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
    )
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            (F.col("cnt") / F.col("total")).alias("pct"),
            (F.col("cnt") / (F.col("total") / F.col("n_keys"))).alias("x_over_avg"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
    )
