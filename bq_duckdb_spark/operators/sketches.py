"""Mergeable distinct-count sketches: the pre-aggregation pattern that
makes COUNT(DISTINCT) affordable over 100 TB.

An exact distinct over a date range rescans every raw row of the range;
a sketch table stores one tiny Apache DataSketches HLL per (grain,
group) — built once, map-side combined — and ANY rollup (month from
days, all-time from months, any ad-hoc slice) is a cheap
``hll_union_agg`` over the partials, never touching raw data again.
Estimates are deterministic for a given input multiset and ``lg_k``
(relative error ~1.04/sqrt(2^lg_k): ~1.6% at the default 12).

These are Spark-native builtins (JVM, codegen-friendly aggregation
buffers); the contract keeps exact-oracle entries for distinct counts
(q_distinct_agg, q_approx_distinct's exact twin) — this module is the
at-scale materialization layer on top, value-tested in
tests/test_sketches.py (partial-union tracks direct sketching, unions
re-associate safely, error bound vs exact holds)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch of ``key_col``'s distinct values per group — the
    persistable partial. One shuffle on the grain keys; sketches are
    merged map-side first, so shuffle volume is (groups × sketch size),
    independent of row count."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, lg_k).alias(sketch_col)
    )


def hll_rollup(
    partials: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Union the stored partials up to a coarser grain and estimate.
    ``rollup_cols`` may be any subset of the partials' group columns
    (empty list = global)."""
    grouped = (
        partials.groupBy(*rollup_cols)
        if rollup_cols
        else partials.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )
