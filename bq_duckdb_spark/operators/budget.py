"""Greedy budgeted prefix selection: take rows in a global priority
order until a weight budget is exhausted — "fill a 10B-token training
budget with the highest-quality documents first", the terminal step of
most corpus-assembly pipelines.

A naive ``sum(w) OVER (ORDER BY …)`` funnels the whole table through
one task (Exchange SinglePartition). This operator computes the
identical running total with the ntile_scalable two-pass shape
(operators/ntile.py): range-partition on the priority key, local
cumulative sums per partition, then per-partition totals (one tiny row
each) turned into broadcast offsets. The only single-partition work is
the offsets window over #partitions rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: str,
    out_col: str = "cum_weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the exact inclusive running ``weight_col`` total in
    ``order_cols`` order (which must be total — break ties with a
    unique key). Identical row-for-row to the SinglePartition window
    formulation, computed distributed (range partition + local cumsums
    + broadcast per-partition offsets)."""
    spark = df.sparkSession
    npart = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(npart, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__lcum", F.sum(weight_col).over(w_local).cast("long")
    )
    totals = ranged.groupBy("__pid").agg(
        F.sum(weight_col).cast("long").alias("__t")
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lcum"))
        .drop("__pid", "__lcum", "__off")
    )


def take_until_budget(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: str,
    budget: int,
    out_col: str = "cum_weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows whose running ``weight_col`` total stays within ``budget``;
    ``out_col`` carries the inclusive running total. See
    :func:`with_running_total` for the distributed shape."""
    return with_running_total(
        df, order_cols, weight_col, out_col, num_partitions
    ).filter(F.col(out_col) <= budget)


def assign_shards(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: str,
    shard_budget: int,
    out_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-balanced shard assignment: rows (in ``order_cols`` order)
    fill shard 0 until ``shard_budget`` weight, then shard 1, … — the
    delivery step that turns a curated corpus into ~equal-token output
    files. ``shard_id = floor(exclusive_running_total / shard_budget)``
    (each row lands in the shard where it STARTS), so shard boundaries
    are exact, deterministic, and layout-independent; write with
    ``.partitionBy(out_col)`` for one directory per shard."""
    cum = with_running_total(
        df, order_cols, weight_col, "__cum", num_partitions
    )
    return cum.withColumn(
        out_col,
        ((F.col("__cum") - F.col(weight_col)) / F.lit(shard_budget))
        .cast("long"),
    ).drop("__cum")
