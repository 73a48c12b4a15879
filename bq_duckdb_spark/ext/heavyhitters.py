"""Two-phase EXACT heavy hitters: Misra-Gries candidates + exact verify.

The problem at 100 TB: "every item with frequency > n/s" cannot be
answered by a plain groupBy + HAVING without shuffling the FULL key
space — for n-gram domains that is a shuffle comparable to the corpus
itself, almost all of it tail keys that cannot possibly qualify. The
classical two-phase answer:

- Phase 1 (candidates): one streaming pass per partition maintaining a
  Misra-Gries summary of ``s`` counters (Misra & Gries 1982). Summaries
  shrink by subtracting the (s+1)-th largest counter from all and
  dropping non-positives — the merge rule of Agarwal et al., "Mergeable
  Summaries" (PODS 2012), which bounds every item's undercount by
  n_partition/(s+1). The UNION of the partition summaries' supports is
  therefore a SUPERSET of every global heavy hitter: an item absent
  from all summaries has local count <= n_i/(s+1) in every partition,
  so its global count <= n/(s+1) < n/s. Only candidate keys —
  at most s per partition — ever leave their partition.
- Phase 2 (verify): join the candidate set back (broadcast when small;
  Spark falls back to a shuffle join past the threshold) and keep items
  whose EXACT count clears the integer-exact threshold cnt * s > n.

The OUTPUT is exact and partitioning-invariant (the candidate set
varies with the partition layout; the exact verify makes the final
result independent of it) — which is what lets the contract entry carry
a full value-level DuckDB oracle, unlike the estimate-valued sketches
(HLL / CMS / KLL) that are rows-only by nature.

The MG fold is a pandas mapInPandas over the item column only: the
summary must stream the whole partition (inherently sequential), batch
counts come from vectorized ``value_counts``, and the shrink is one
``np.partition`` — the same measured rationale as the MinHash signature
fold (ext/dedup.py): per-partition Python state with Arrow batch
transfer, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_candidates(
    items: DataFrame, item_col: str, s: int, with_counts: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (column: ``item_col``).

    Emits the union-of-supports superset described in the module
    docstring: every item with global count > n/s appears. NULL items
    are ignored (they cannot be group keys downstream; filter upstream
    if NULL frequency matters). Output rows per partition <= s.

    ``with_counts=True`` adds the per-partition MG estimate as
    ``__mg_est`` (a lower bound on the partition-local count) — what
    the streaming summary maintainer merges across batches.
    """
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    base = items.select(item_col)
    # a fresh StructType: StructType.add mutates in place, and mutating
    # base.schema's instance would hand the CHILD plan a phantom column
    fields = list(base.schema.fields)
    if with_counts:
        fields = fields + [T.StructField("__mg_est", T.LongType())]
    out_schema = T.StructType(fields)

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            counters = _mg_shrink(counters, s)
        out = {item_col: list(counters.keys())}
        if with_counts:
            out["__mg_est"] = list(counters.values())
        yield pd.DataFrame(out)

    return base.mapInPandas(fold, out_schema)


def _mg_shrink(counters: dict, s: int) -> dict:
    """The Misra-Gries shrink rule: subtract the (s+1)-th largest value
    from every counter and drop non-positives. At least s+1 entries lose
    the full cut, so total mass removed >= (s+1) * cut and the running
    sum-of-cuts (every item's undercount) stays <= n_total / (s+1)."""
    if len(counters) <= s:
        return counters
    vals = np.fromiter(counters.values(), dtype=np.int64, count=len(counters))
    cut = int(np.partition(vals, len(vals) - s - 1)[len(vals) - s - 1])
    return {k: v - cut for k, v in counters.items() if v > cut}


def merge_summaries(prev: "dict | None", batch_counts: dict, s: int) -> dict:
    """Merge per-batch counts (exact counts or MG lower-bound partials —
    both only ever undercount) into a Misra-Gries summary of size <= s
    (Agarwal et al., Mergeable Summaries: add, then one shrink).
    Estimates undercount by at most n_total/(s+1) after any merge
    sequence."""
    counters = dict(prev or {})
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    return _mg_shrink(counters, s)


def heavy_hitters(items: DataFrame, item_col: str, s: int) -> DataFrame:
    """All items with count * s > n (strictly more than n/s of ``items``),
    with EXACT counts. Output: (item_col, cnt), deterministic and
    partitioning-invariant.

    Scale: three corpus passes (total count, MG candidates, verify),
    but the only full-key-space shuffle a naive groupBy would pay is
    replaced by (a) the candidate distinct — at most s rows per
    partition — and (b) the verify groupBy over candidate-matching
    rows only. The threshold compares integers (cnt * s > n), so the
    boundary is exact in any engine — no float division.

    The total count rides as a broadcast 1-row cross join instead of a
    driver-side ``.count()``: no eager driver action, the whole result
    stays one lazy plan.
    """
    items = items.select(item_col)
    total = items.agg(F.count(F.lit(1)).alias("__n"))
    cand = mg_candidates(items, item_col, s).distinct()
    # NO broadcast hint on the candidate join: at the scales this
    # module targets the candidate union can reach s x partitions rows
    # and a forced broadcast would collect it all to the driver. AQE
    # converts the join to broadcast at runtime when the ACTUAL
    # candidate set is small (the test-SF case), and keeps a shuffle
    # join when it isn't — exactly the fallback the two-phase design
    # wants. The 1-row total stays an explicit broadcast.
    return (
        items.join(cand, item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(s) > F.col("__n"))
        .drop("__n")
    )
