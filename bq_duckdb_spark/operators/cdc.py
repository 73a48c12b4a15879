"""Change-data-capture primitives: snapshot diffing and slowly-changing
dimension (SCD Type 2) history builds.

- ``snapshot_diff``: old vs new snapshot → (insert / delete / update)
  rows, classified by ONE full-outer join on the key with a row-hash
  comparison of the tracked columns — the shape that scales: one
  shuffle per side on the key, no row buffering, hash computed in
  codegen. This is what an ingestion layer runs when upstream can only
  hand over full snapshots (the MERGE upsert path,
  streaming/streams.py merge_each_batch, is its streaming twin for
  true CDC feeds).
- ``scd2``: a keyed, timestamped attribute stream → validity intervals
  (valid_from, valid_to, is_current): keep rows where the tracked
  attributes CHANGED vs the previous row per key (lag), then close each
  interval with the next survivor's timestamp (lead). Two window passes
  over ONE partitioning/ordering — a single shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key into insert (new only), delete (old only), or
    update (both, tracked columns differ). Unchanged rows are dropped.
    Output: key columns + change_type."""
    compare = compare_cols or [c for c in new.columns if c not in key_cols]

    # exact null-safe struct comparison, not a row hash: Spark's hash
    # functions seed-chain but SKIP null inputs, so (null, x) and
    # (x, null) can hash equal — a silently missed update
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"{tag}_{k}") for k in key_cols],
            F.struct(*[F.col(c) for c in compare]).alias(f"{tag}_s"),
        )

    cond = [F.col(f"o_{k}").eqNullSafe(F.col(f"n_{k}")) for k in key_cols]
    joined = side(old, "o").join(side(new, "n"), cond, "full_outer")
    # side-absence detected on the struct column (never null when the
    # row exists), so even all-null keys classify correctly
    change = (
        F.when(F.col("o_s").isNull(), F.lit("insert"))
        .when(F.col("n_s").isNull(), F.lit("delete"))
        .when(~F.col("o_s").eqNullSafe(F.col("n_s")), F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"n_{k}"), F.col(f"o_{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.select(*out_keys, change.alias("change_type"))
        .where(F.col("change_type").isNotNull())
    )


def scd2(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Compress a keyed attribute stream into SCD Type 2 validity
    intervals. Rows whose tracked attributes equal the previous row's
    (per key, ordered by ``(ts, tiebreak)``) are collapsed into the
    open interval; each surviving version carries ``valid_from``,
    ``valid_to`` (next version's start, NULL while current) and
    ``is_current``."""
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # struct comparison, not a hash — see snapshot_diff's null note
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = df.withColumn("__a", attrs).withColumn(
        "__prev_a", F.lag("__a").over(w)
    )
    survivors = changed.where(
        F.col("__prev_a").isNull() | ~F.col("__a").eqNullSafe(F.col("__prev_a"))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        survivors.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__a", "__prev_a")
    )
