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


def take_until_budget(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: str,
    budget: int,
    out_col: str = "cum_weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows whose running ``weight_col`` total (in ``order_cols`` order,
    which must be total — break ties with a unique key) stays within
    ``budget``; ``out_col`` carries the inclusive running total.

    Exact, deterministic, and distributed: identical to the
    single-partition window formulation row for row.
    """
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
        .filter(F.col(out_col) <= budget)
        .drop("__pid", "__lcum", "__off")
    )
