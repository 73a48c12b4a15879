"""Range (interval/band) join: match rows where a point value falls in
``[lo, hi)`` of the other side.

Strategies:
- ``broadcast`` (default when the interval side is small): broadcast the
  intervals; the non-equi condition runs as a BroadcastNestedLoopJoin —
  each point row scans only the broadcast band list.
- ``bucketed``: for large interval tables, explode each interval into
  the fixed-width buckets it overlaps, bucket the points, and equi-join
  on the bucket id before applying the exact range predicate. Turns the
  O(|points|·|intervals|) nested loop into a shuffle on bucket ids —
  the standard trick for interval joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    strategy: str = "broadcast",
    bucket_width: float | None = None,
) -> DataFrame:
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if strategy == "broadcast":
        return points.join(F.broadcast(intervals), cond, how)
    if strategy != "bucketed":
        raise ValueError(f"unknown strategy: {strategy}")
    if not bucket_width:
        raise ValueError("bucketed strategy requires bucket_width")

    bw = float(bucket_width)
    exploded = intervals.withColumn(
        "__bucket",
        # _outer: computed array (repo convention — plain explode lets
        # InferFiltersFromGenerate evaluate the sequence twice); a
        # sequence is never empty (it counts down when hi < lo)
        F.explode_outer(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                # hi is exclusive: a bucket containing only hi itself is
                # still generated (cheap) and filtered by the exact cond
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ),
    )
    bucketed_points = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bw).cast("long")
    )
    out = bucketed_points.join(exploded, on="__bucket", how="inner").filter(cond)
    return out.drop("__bucket")
