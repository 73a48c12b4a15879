"""Embedding clustering: distributed Lloyd's k-means over the
embeddings table, with a loop-generated DuckDB oracle (the pagerank
pattern — one Python loop emits both the Spark iteration and the
unrolled-CTE SQL, so the oracle pins the recurrence, not a copy).

A training-data pipeline clusters embeddings constantly: semantic
dedup pruning (SemDeDup-style — drop all-but-one member of tight
clusters), topic balancing for mixture weights, and the IVF coarse
codebook (similarity.train_ivf_centroids shares the assignment
primitive's shape but optimizes the spherical objective).

Scale design: centroids are a k×dim literal — driver-sized by
definition — inlined into a map-only assignment expression, so each
iteration costs ONE groupBy (cell, pos) shuffle whose input is the
posexploded corpus and whose map-side partial aggregation reduces
every partition to ≤ k·dim rows before the exchange. No executor ever
buffers a cluster's vectors; no lineage recursion (literals, not a
joined frame), so no checkpointing is needed no matter how many
iterations run.

Determinism (what makes a full oracle possible, unusual for k-means):
- init = the k lowest-id vectors (no RNG);
- assignment ties break to the lower cell id (strict < in the fold /
  ORDER BY dist, cell in SQL);
- per-round centroid means are quantized to ``quantize`` decimals with
  an explicit floor(x·10^q + 0.5)/10^q — identical half-up semantics
  in Python and SQL, immune to round()'s engine-specific tie rules —
  which also stops cross-engine summation-order ulps from compounding
  across rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_l2_expr(cents: list[list[float]], vec_col: str) -> str:
    """Argmin-squared-L2 cell id as ONE sequential-fold expression:
    deterministic evaluation order, ties to the lower cell (strict <)."""
    scores = []
    for ci, c in enumerate(cents):
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")"
        d2 = (
            f"aggregate(zip_with({vec_col}, {arr}, "
            "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
            "0D, (acc, x) -> acc + x)"
        )
        scores.append(f"named_struct('cell', {ci}, 'd', {d2})")
    return (
        "aggregate(array(" + ", ".join(scores) + "), "
        "named_struct('cell', -1, 'd', CAST('Infinity' AS DOUBLE)), "
        "(acc, s) -> CASE WHEN s.d < acc.d THEN s ELSE acc END).cell"
    )


def _half_up(x: float, q: int) -> float:
    return math.floor(x * 10**q + 0.5) / 10**q


def train_kmeans_centroids(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 6,
) -> list[list[float]]:
    """Run ``iters`` Lloyd's rounds and return the trained centroid
    list — the reusable model artifact (assign a stream with it, build
    an IVF layout from it, inline it into any engine).

    Each round: map-only literal-centroid assignment + one
    (cell, pos) shuffle for the means (posexplode + partial agg); the
    k·dim means cross the driver once per round — the codebook itself,
    driver-sized by definition. Empty cells keep their previous
    centroid.
    """
    init = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cents = [[_half_up(float(x), quantize) for x in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = df.withColumn("cell", F.expr(_assign_l2_expr(cents, vec_col)))
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("p", "v"))
            .groupBy("cell", "p")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new: dict[int, dict[int, float]] = {c: {} for c in range(len(cents))}
        for r in means:
            new[r.cell][r.p] = _half_up(float(r.m), quantize)
        cents = [
            [new[c][p] for p in sorted(new[c])] if new[c] else cents[c]
            for c in range(len(cents))
        ]
    return cents


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only argmin-L2 assignment under literal centroids:
    ``(id_col, cell)``. Streams unchanged (stateless; parity pinned in
    tests/test_streaming.py)."""
    return df.select(
        F.col(id_col), F.expr(_assign_l2_expr(centroids, vec_col)).alias("cell")
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 6,
) -> DataFrame:
    """Cluster vectors with ``iters`` Lloyd's rounds; returns
    ``(id_col, cell)`` — the FINAL assignment under the trained
    centroids (i.e. iters mean-updates, then one closing assignment,
    matching :func:`kmeans_oracle_sql` exactly)."""
    cents = train_kmeans_centroids(df, k, iters, vec_col, id_col, quantize)
    return assign_cells(df, cents, vec_col, id_col)


def kmeans_oracle_sql(
    k: int = 4, iters: int = 2, dim: int = 64, quantize: int = 6
) -> str:
    """The SAME init/assign/update recurrence unrolled as chained
    MATERIALIZED DuckDB CTEs (c_t feeds both the next assignment and
    the empty-cell carry-forward; DuckDB would otherwise inline and
    re-evaluate the whole prefix per reference)."""
    q = 10**quantize
    parts = [
        "WITH vecs AS MATERIALIZED (",
        f"    SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val",
        f"    FROM embeddings, range(1, {dim + 1}) t(i)",
        "),",
        "c0 AS MATERIALIZED (",
        f"    SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cell, pos,",
        f"           floor(val * {q} + 0.5) / {q} AS val",
        "    FROM vecs",
        f"    WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "),",
    ]
    for i in range(1, iters + 2):  # iters mean-updates + closing assignment
        prev = f"c{i - 1}"
        parts += [
            f"a{i} AS MATERIALIZED (",
            "    SELECT vec_id, cell FROM (",
            "        SELECT vec_id, cell,",
            "               row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn",
            "        FROM (",
            # ordered left fold, NOT sum(): an unordered GROUP BY sum's
            # addition order is scan-dependent, so two IDENTICAL
            # centroids (possible when init vectors are duplicates —
            # gen_fuzz plants an exact-duplicate block) can get
            # ULP-different distances and steal the lower-cell tie.
            # list(x ORDER BY pos) + list_reduce reproduces the Spark
            # fold's exact addition sequence.
            "            SELECT v.vec_id, c.cell,",
            "                   list_reduce(",
            "                       list((v.val - c.val) * (v.val - c.val)",
            "                            ORDER BY v.pos),",
            "                       (a, b) -> a + b) AS d",
            f"            FROM vecs v JOIN {prev} c USING (pos)",
            "            GROUP BY v.vec_id, c.cell",
            "        )",
            "    ) WHERE rn = 1",
            "),",
        ]
        if i <= iters:
            parts += [
                f"n{i} AS MATERIALIZED (",
                f"    SELECT cell, pos, floor(avg(val) * {q} + 0.5) / {q} AS val",
                f"    FROM a{i} JOIN vecs USING (vec_id) GROUP BY cell, pos",
                "),",
                f"c{i} AS MATERIALIZED (",
                "    SELECT p.cell, p.pos, COALESCE(n.val, p.val) AS val",
                f"    FROM {prev} p LEFT JOIN n{i} n ON p.cell = n.cell AND p.pos = n.pos",
                "),",
            ]
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vec_id, cell FROM a{iters + 1}")
    return "\n".join(parts)
