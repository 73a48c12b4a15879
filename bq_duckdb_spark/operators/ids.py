"""Distributed stable ID assignment: contiguous 0-based int64 ids in a
total order, without the SinglePartition row_number funnel.

Corpus assembly needs this constantly (every document gets a stable
int64 id before sharding/packing). ``monotonically_increasing_id`` is
partition-dependent and gappy; a global ``row_number() OVER (ORDER BY
…)`` funnels the table through one task. This is the ntile_scalable /
take_until_budget two-pass shape: range partition on the order key,
local row_number per partition, per-partition counts (one tiny row
each) turned into broadcast offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_stable_ids(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "stable_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col``: the 0-based rank of each row under
    ``order_cols`` (which must be a total order — break ties with a
    unique key). Deterministic, contiguous, layout-independent —
    identical to the naive global row_number minus one."""
    spark = df.sparkSession
    npart = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(npart, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "__lrn", F.row_number().over(Window.partitionBy("__pid").orderBy(*order_cols))
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn") - 1).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )
