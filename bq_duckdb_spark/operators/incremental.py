"""Incremental aggregate maintenance — the warehouse pattern of keeping
a small per-key state table (count / sum partials) and folding delta
batches into it instead of rescanning the full fact history.

The state is a decomposable-aggregate partial: COUNT and SUM are
commutative monoids, so ``merge(state(base), state(delta)) ==
state(base ∪ delta)`` exactly (AVG and similar derive from the merged
partials at read time). At 100 TB this is the difference between a
daily job that scans one day and one that scans years: the base is
never re-read, only its (keys → partials) state — itself shuffled once
per merge on the key, the minimal possible movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Per-key partial-aggregate state: (keys, n, s). One map-side
    combined shuffle on the keys."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s")
    )


def merge_agg_states(states: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Fold any number of (keys, n, s) states into one: union → one
    re-shuffle on the keys → partial sums add. Associative and
    commutative, so states can be merged in any order or tree shape
    (e.g. hourly → daily → monthly rollups). Raises ValueError on an
    empty state list."""
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )


def read_aggregates(state: DataFrame, key_cols: list[str]) -> DataFrame:
    """Materialize the user-facing aggregates from the state: count,
    sum, and the derived mean — no rescan of any fact data."""
    return state.select(
        *key_cols,
        F.col("n").alias("n_rows"),
        F.col("s").alias("total"),
        (F.col("s") / F.col("n")).alias("mean"),
    )
