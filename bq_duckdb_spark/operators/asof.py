"""As-of (point-in-time) join.

For each left row, attach the most recent right row with the same key
whose time is <= the left time (direction="backward"; "forward" takes
the earliest right row at-or-after instead).

Implementation — the scalable union formulation, not a pairwise join:
tag both inputs, union them, sort each key's timeline once, and carry
the latest right values forward with ``last(..., ignorenulls=True)``
over a running window. Cost is ONE shuffle on the key and a per-key
sort — O(n log n) total work, bounded memory, no row-pair explosion —
versus the naive equi-join + filter + row_number approach whose
intermediate is |left| × |matching right| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. ``right_values`` are the right columns to carry.
    The matched right timestamp is exposed as ``<right_time><suffix>``;
    unmatched left rows keep NULLs (left-join semantics).

    ``tolerance`` (a Column-compatible literal in the time column's
    units) drops matches further than the tolerance from the left time.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)

    carried = [f"{c}{suffix}" for c in right_values]
    matched_time = f"{right_time}{suffix}"

    l_tagged = left.select(
        "*",
        F.lit(1).alias("__is_left"),
        F.col(left_time).alias("__t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__r_time"),
    )
    left_null_cols = [c for c in left.columns]
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in left_null_cols
        ],
        F.lit(0).alias("__is_left"),
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
        F.col(right_time).alias("__r_time"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal time → inclusive match
        order = [F.asc("__t"), F.asc("__is_left")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        order = [F.desc("__t"), F.asc("__is_left")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)

    projected = unioned.select(
        "*",
        *[
            pick(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_values
        ],
        pick("__r_time", ignorenulls=True).over(w).alias(matched_time),
    )
    out = projected.filter(F.col("__is_left") == 1).drop(
        "__is_left", "__t", "__r_time", *[f"__r_{c}" for c in right_values]
    )
    if tolerance is not None:
        gap = (
            F.col(left_time).cast("long") - F.col(matched_time).cast("long")
            if direction == "backward"
            else F.col(matched_time).cast("long") - F.col(left_time).cast("long")
        )
        out = out.select(
            *left.columns,
            *[
                F.when(gap <= tolerance, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in carried
            ],
            F.when(gap <= tolerance, F.col(matched_time)).otherwise(F.lit(None)).alias(
                matched_time
            ),
        )
    return out
