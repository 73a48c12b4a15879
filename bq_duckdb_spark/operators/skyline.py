"""Skyline (Pareto-optimal set) operators.

A point is in the skyline when no other point dominates it — is at
least as good on every dimension and strictly better on one. The
classic OLAP use: "show me the orders that are high-value AND early",
where no single ORDER BY can rank two tension dimensions. Spark SQL has
no native skyline; the EDBT'23 line of work ("Integration of Skyline
Queries into Spark SQL") integrates it as a custom operator — here it
is re-expressed with built-in operators instead:

- ``skyline_2d``: the 2-dimensional case needs NO dominance joins at
  all. Sort by x descending; a point survives iff its y beats the
  running minimum of every higher-x point — ONE window over one
  shuffle, fully Catalyst/codegen, linearithmic per group. This is the
  sort-filter skyline (Borzsony/Kossmann/Stocker's SFS specialised to
  2D, where the sort makes a single scan exact).
- ``skyline_nd``: for d > 2 a scan needs dominance checks. Two phases:
  a per-partition local prune (numpy dominance filter inside
  mapInPandas — the skyline of any subset contains the global skyline
  members present in it, so local losers can never resurface), then an
  exact prune over the tiny survivor union. Survivors of random data
  grow ~log^(d-1)(n), so the final single-partition pass touches a
  vanishing fraction of the input at scale; the heavy lifting is the
  embarrassingly parallel first phase.

Semantics note (both operators): computed over DISTINCT points of the
chosen dimensions — exact ties on every dimension are one point (no
self-domination ambiguity), and a row carrying payload columns should
join back on the dimension values. Points with a NULL in any dimension
are EXCLUDED up front (dominance against an unknown value is
undefined; both paths agree) — group keys may be NULL (a NULL group is
a group like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    maximize_x: bool = True,
    minimize_y: bool = True,
) -> DataFrame:
    """Distinct (x, y) points not dominated within their ``by`` group.

    Default orientation: maximize x, minimize y; flip with the flags
    (flipping is just negating the sort/compare directions — the window
    shape is identical). ONE shuffle on (by) with an in-partition sort;
    no join, no UDF — duplicate elimination rides the same window
    (duplicates of a point are adjacent under the (x, y) sort, so a
    lag() comparison keeps exactly the first occurrence; an up-front
    .distinct() would cost a second full exchange of the projection).

    Why the single window is exact on distinct points, ordered by
    (x desc, y asc): every potential dominator of a point precedes it
    (higher x, or equal x with strictly smaller y — equal x AND equal y
    is impossible on distinct points), and a point is dominated exactly
    when some predecessor has y <= its y. So: survive iff y < the
    running min of all predecessors' y — a min that duplicate rows of
    earlier points cannot change, which is why deduplication and
    dominance can share one pass.
    """
    by = by or []
    xo = F.col(x_col).desc() if maximize_x else F.col(x_col).asc()
    yo = F.col(y_col).asc() if minimize_y else F.col(y_col).desc()
    order = Window.partitionBy(*by).orderBy(xo, yo)
    w = order.rowsBetween(Window.unboundedPreceding, -1)
    best_prev = (F.min if minimize_y else F.max)(F.col(y_col)).over(w)
    # the window values must be materialized into columns first — Spark
    # rejects window expressions inside a WHERE/filter
    survive = (
        F.col(y_col) < F.col("__bp") if minimize_y else F.col(y_col) > F.col("__bp")
    )
    first_of_dup_run = ~(
        F.col("__px").eqNullSafe(F.col(x_col))
        & F.col("__py").eqNullSafe(F.col(y_col))
    )
    return (
        df.select(*by, x_col, y_col)
        # NULL-dimension points excluded (see module docstring)
        .filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__bp", best_prev)
        .withColumn("__px", F.lag(x_col).over(order))
        .withColumn("__py", F.lag(y_col).over(order))
        .filter(first_of_dup_run & (F.col("__bp").isNull() | survive))
        .drop("__bp", "__px", "__py")
    )


def _dominance_prune(cols: list[str], maximize: list[str], by: list[str]):
    """mapInPandas kernel: exact skyline of each incoming batch, computed
    independently per ``by`` group present in the batch (cross-group
    dominance must never prune).

    Vectorized pairwise dominance on the batch's distinct points —
    O(k^2) on k batch rows via one (k, k, d) numpy broadcast, never a
    Python-level row loop. Orientation is normalized driver-side so the
    kernel only ever maximizes.
    """
    flip = [c not in set(maximize) for c in cols]

    def _prune_group(pdf):
        import numpy as np

        m = pdf[cols].to_numpy(dtype="float64")
        for j, f in enumerate(flip):
            if f:
                m[:, j] = -m[:, j]
        # chunked running-skyline merge: a full (k, k, d) dominance
        # broadcast on a 10k-row Arrow batch would be ~GBs; instead scan
        # in blocks sorted by the first dimension descending — most of a
        # later block is dominated by the running frontier immediately,
        # so the pairwise compare stays (frontier + block)^2 with a
        # frontier ~the skyline size, not the batch size
        order = np.argsort(-m[:, 0], kind="stable")
        ms = m[order]
        cur = np.empty((0, ms.shape[1]))
        cur_ids = np.empty((0,), dtype=np.int64)
        block = 1024
        for s0 in range(0, len(ms), block):
            cand = np.concatenate([cur, ms[s0:s0 + block]])
            cid = np.concatenate([cur_ids, order[s0:s0 + block]])
            ge = (cand[:, None, :] >= cand[None, :, :]).all(axis=2)
            gt = (cand[:, None, :] > cand[None, :, :]).any(axis=2)
            dominated = (ge & gt).any(axis=0)
            cur, cur_ids = cand[~dominated], cid[~dominated]
        return pdf.iloc[np.sort(cur_ids)]

    def prune(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).drop_duplicates([*by, *cols])
        if not by:
            yield _prune_group(pdf)
            return
        # dropna=False: a NULL group key is a group like any other (Spark
        # grouping semantics) — pandas' default would silently drop it
        yield pd.concat(
            [_prune_group(g) for _, g in pdf.groupby(by, sort=False, dropna=False)],
            ignore_index=True,
        )

    return prune


def skyline_nd(
    df: DataFrame,
    maximize: list[str],
    minimize: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """Distinct-point skyline over any number of dimensions.

    Phase 1 prunes each partition independently (correct because
    dominance within a subset already disqualifies a point globally);
    phase 2 re-runs the same kernel on the survivor union in one
    partition — exact, and cheap because surviving points are ~the
    skyline size, not the corpus size. ``by`` groups are handled by a
    repartition on the group key so both phases stay group-local.
    """
    by = by or []
    cols = [*maximize, *minimize]
    dims_ok = F.lit(True)
    for c in cols:
        # NULL-dimension points excluded (see module docstring); NaN too —
        # the numpy kernel's all-False NaN comparisons would otherwise
        # keep them unconditionally, diverging from the 2D path
        dims_ok = dims_ok & F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
    # no up-front .distinct(): the kernel drop_duplicates each batch, and
    # phase 2 sees every group's survivors co-located, so cross-partition
    # duplicates die there — an explicit distinct would add a full
    # exchange of the projection for nothing
    sel = df.select(*by, *cols).filter(dims_ok)
    schema = sel.schema
    kernel = _dominance_prune(cols, maximize, by)
    pruned = sel.mapInPandas(kernel, schema)
    # phase 2: the survivor set must be compared ACROSS phase-1
    # partitions. With `by` groups, a hash repartition on the group key
    # co-locates each group's survivors WITHOUT a single-partition
    # funnel — groups spread over the cluster; without groups, collapse
    # to one partition (survivors ~ skyline-sized, a vanishing fraction
    # of the input).
    gathered = pruned.repartition(*by) if by else pruned.repartition(1)
    return gathered.mapInPandas(kernel, schema)
