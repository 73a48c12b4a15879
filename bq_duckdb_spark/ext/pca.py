"""Principal component analysis over embedding columns — the classic
dimensionality-reduction step (whitening, visualization, IVF pre-
rotation) the random-projection operator (ext/similarity.py
random_project) approximates without data awareness.

Decomposition of the work, designed for 100 TB:

1. **Mean** — one (pos) shuffle over the posexploded vectors; dim
   values cross the driver (the model artifact, driver-sized by
   definition — the kmeans-codebook pattern, ext/cluster.py).
2. **Centered covariance matrix** — mapInPandas partial ``X^T X`` per Arrow
   batch (numpy float64, each batch emits dim*dim partial sums) + one
   dim²-cell aggregation. Never materializes the 64x row inflation an
   exploded self-join would; at any scale exactly dim² values cross
   the driver.
3. **Power iteration + deflation** — on the driver over the dim² covariance
   (64x64 doubles): w = G v, normalize, quantize, ``iters`` times;
   deflate G -= lambda v v^T per component. Pure arithmetic on a
   driver-sized object.
4. **Projection** — map-only JVM expression per row (literal mean /
   component arrays, sequential fold), zero shuffles.

Oracle strategy (pca_oracle_sql): the SAME mean/gram/iterate/deflate/
project recurrence unrolled as chained MATERIALIZED DuckDB CTEs (the
kmeans/logreg loop-generated-CTE pattern). Every stage quantizes to
``quantize`` decimals with floor(x*q+0.5)/q — pure arithmetic both
engines evaluate identically — so cross-engine float summation-order
differences (~1e-13) sit far below the quantization step and the two
engines converge on bit-equal models. Parity does NOT depend on the
iteration having converged: both sides run the same fixed recurrence.

The sign of each component is pinned by the deterministic e0 start
vector and the fixed iteration count.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.cluster import _half_up


def _mean_vector(
    df: DataFrame, vec_col: str, quantize: int
) -> list[float]:
    # _outer form per the InferFiltersFromGenerate house rule (vectors
    # are never null/empty, so no rows are lost)
    rows = (
        df.select(F.posexplode_outer(F.col(vec_col)).alias("pos", "val"))
        .where(F.col("pos").isNotNull())
        .groupBy("pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .collect()
    )
    m = {r.pos: _half_up(float(r.m), quantize) for r in rows}
    return [m[p] for p in sorted(m)]


def _centered_gram(
    df: DataFrame, vec_col: str, mean: list[float], quantize: int
) -> list[list[float]]:
    """dim x dim centered COVARIANCE via per-batch numpy partials.

    The cells are normalized by the row count BEFORE quantization — the
    scale guard that makes the cross-engine argument hold at any SF: a
    raw gram cell's summation-order error grows ~sqrt(n) x eps x
    magnitude (the q01-at-sf1 rounding-boundary class), but dividing by
    n shrinks the quantized cell's absolute error ~eps/sqrt(n), so the
    floor(x*q+0.5) boundary-flip risk DECREASES with data size instead
    of growing. Eigenvectors are unchanged (scaling); eigenvalues are
    per-row variances rather than totals."""
    import numpy as np

    dim = len(mean)
    m_arr = np.asarray(mean, dtype=np.float64)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(
                [list(v) for v in b["v"]], dtype=np.float64
            ) - m_arr
            acc += x.T @ x
            seen = True
        if seen:
            pa, pb = np.meshgrid(range(dim), range(dim), indexing="ij")
            yield pd.DataFrame(
                {"pa": pa.ravel(), "pb": pb.ravel(), "s": acc.ravel()}
            )

    parts = df.select(F.col(vec_col).alias("v")).mapInPandas(
        partial, "pa int, pb int, s double"
    )
    n = df.count()
    rows = parts.groupBy("pa", "pb").agg(F.sum("s").alias("s")).collect()
    g = [[0.0] * dim for _ in range(dim)]
    for r in rows:
        g[r.pa][r.pb] = _half_up(float(r.s) / n, quantize)
    return g


def _power_iterate(
    gram: list[list[float]], k: int, iters: int, quantize: int
) -> tuple[list[list[float]], list[float]]:
    """k leading components by fixed-count power iteration + deflation.

    Every intermediate (w, v, lambda, deflated G) quantizes with the
    same floor(x*q+0.5)/q the oracle uses, so the recurrence is exact
    cross-engine arithmetic, not an approximation contract."""
    dim = len(gram)
    q = quantize
    g = [row[:] for row in gram]
    comps: list[list[float]] = []
    lams: list[float] = []
    for _ in range(k):
        v = [1.0] + [0.0] * (dim - 1)
        for _t in range(iters):
            w = [
                _half_up(sum(g[a][b] * v[b] for b in range(dim)), q)
                for a in range(dim)
            ]
            norm = math.sqrt(sum(x * x for x in w))
            if norm == 0.0:
                # k exceeded the data's effective rank: the deflated
                # covariance quantized to all zeros. Fail loudly — the
                # oracle recurrence would evaluate w/sqrt(0) (NULL/NaN)
                # here, so continuing would silently desync the engines
                # (round-8 ADVICE).
                raise ValueError(
                    f"PCA power iteration collapsed to zero norm at "
                    f"component {len(comps) + 1}: k={k} exceeds the "
                    "effective rank of the quantized covariance"
                )
            v = [_half_up(x / norm, q) for x in w]
        lam = _half_up(
            sum(g[a][b] * v[a] * v[b] for a in range(dim) for b in range(dim)),
            q,
        )
        comps.append(v)
        lams.append(lam)
        g = [
            [_half_up(g[a][b] - lam * v[a] * v[b], q) for b in range(dim)]
            for a in range(dim)
        ]
    return comps, lams


def train_pca(
    df: DataFrame,
    k: int = 2,
    iters: int = 24,
    vec_col: str = "embedding",
    quantize: int = 6,
) -> dict:
    """Fit: returns {"mean": [dim], "components": [k][dim],
    "eigenvalues": [k]} — the reusable model artifact."""
    mean = _mean_vector(df, vec_col, quantize)
    gram = _centered_gram(df, vec_col, mean, quantize)
    comps, lams = _power_iterate(gram, k, iters, quantize)
    return {"mean": mean, "components": comps, "eigenvalues": lams}


def _project_expr(
    vec_col: str, mean: list[float], comp: list[float], quantize: int
) -> str:
    """Sequential-fold dot product of the centered vector with a
    literal component — JVM codegen, map-only."""
    dim = len(mean)
    q = 10**quantize
    m_lit = "array(" + ", ".join(f"{x!r}D" for x in mean) + ")"
    c_lit = "array(" + ", ".join(f"{x!r}D" for x in comp) + ")"
    return (
        f"floor(aggregate(sequence(0, {dim - 1}), 0D, "
        f"(s, i) -> s + (CAST(element_at({vec_col}, i + 1) AS DOUBLE) "
        f"- element_at({m_lit}, i + 1)) * element_at({c_lit}, i + 1)) "
        f"* {q} + 0.5) / {q}"
    )


def pca_project(
    df: DataFrame,
    k: int = 2,
    iters: int = 24,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 6,
) -> DataFrame:
    """Fit on ``df`` and project every row: ``(id_col, pc1..pck)``."""
    model = train_pca(df, k, iters, vec_col, quantize)
    cols = [F.col(id_col)]
    for j in range(k):
        cols.append(
            F.expr(
                _project_expr(
                    vec_col, model["mean"], model["components"][j], quantize
                )
            ).alias(f"pc{j + 1}")
        )
    return df.select(*cols)


def pca_oracle_sql(
    k: int = 2, iters: int = 24, dim: int = 64, quantize: int = 6
) -> str:
    """The same mean/gram/power/deflate/project recurrence as chained
    MATERIALIZED DuckDB CTEs, quantized identically at every stage."""
    q = 10**quantize
    qz = lambda x: f"floor(({x}) * {q} + 0.5) / {q}"  # noqa: E731
    # Order-pinned sequential fold: the iterated recurrence (w, norm,
    # lam) compounds any quantization-boundary flip through 24
    # iterations, so these sums mirror the driver's pos-ordered Python
    # fold exactly instead of relying on unordered SUM staying within
    # the quantization step (round-8 ADVICE).
    ofold = (
        lambda x, o: "list_reduce(list_prepend(0.0, "
        f"list({x} ORDER BY {o})), (s, x) -> s + x)"
    )  # noqa: E731
    parts = [
        "WITH vecs AS MATERIALIZED (",
        "    SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val",
        f"    FROM embeddings, range(1, {dim + 1}) t(i)",
        "),",
        "mean AS MATERIALIZED (",
        f"    SELECT pos, {qz('avg(val)')} AS m FROM vecs GROUP BY pos",
        "),",
        "cvecs AS MATERIALIZED (",
        "    SELECT vec_id, pos, val - m AS val",
        "    FROM vecs JOIN mean USING (pos)",
        "),",
        "g0 AS MATERIALIZED (",
        # covariance (sum / n) BEFORE quantization — see _centered_gram
        f"    SELECT a.pos AS pa, b.pos AS pb, "
        f"{qz('sum(a.val * b.val) / (SELECT count(*) FROM embeddings)')} AS g",
        "    FROM cvecs a JOIN cvecs b USING (vec_id)",
        "    GROUP BY a.pos, b.pos",
        "),",
    ]
    for c in range(k):
        gname = f"g{c}"
        vprev = f"v{c}_0"
        parts += [
            f"{vprev} AS MATERIALIZED (",
            "    SELECT CAST(r.range AS INT) AS pos,",
            "           CASE WHEN r.range = 0 THEN 1.0 ELSE 0.0 END AS v",
            f"    FROM range(0, {dim}) r",
            "),",
        ]
        for t in range(1, iters + 1):
            wname = f"w{c}_{t}"
            vname = f"v{c}_{t}"
            parts += [
                f"{wname} AS MATERIALIZED (",
                f"    SELECT g.pa AS pos, {qz(ofold('g.g * v.v', 'g.pb'))} AS w",
                f"    FROM {gname} g JOIN {vprev} v ON v.pos = g.pb",
                "    GROUP BY g.pa",
                "),",
                f"{vname} AS MATERIALIZED (",
                f"    SELECT pos, {qz('w / sqrt((SELECT ' + ofold('w * w', 'pos') + ' FROM ' + wname + '))')} AS v",
                f"    FROM {wname}",
                "),",
            ]
            vprev = vname
        parts += [
            f"lam{c} AS MATERIALIZED (",
            f"    SELECT {qz(ofold('g.g * va.v * vb.v', 'g.pa, g.pb'))} AS lam",
            f"    FROM {gname} g JOIN {vprev} va ON va.pos = g.pa",
            f"    JOIN {vprev} vb ON vb.pos = g.pb",
            "),",
        ]
        if c + 1 < k:
            parts += [
                f"g{c + 1} AS MATERIALIZED (",
                "    SELECT g.pa, g.pb,",
                f"           {qz('g.g - (SELECT lam FROM lam' + str(c) + ') * va.v * vb.v')} AS g",
                f"    FROM {gname} g JOIN {vprev} va ON va.pos = g.pa",
                f"    JOIN {vprev} vb ON vb.pos = g.pb",
                "),",
            ]
        parts += [
            f"comp{c} AS MATERIALIZED (SELECT pos, v FROM {vprev}),",
        ]
    # sequential-fold projection to mirror the Spark aggregate() exactly:
    # list_reduce over the pos-ordered (centered value * component) terms
    proj_cols = []
    for c in range(k):
        proj_cols.append(
            f"{qz(f'list_reduce(list_prepend(0.0, list(cv.val * c{c}.v ORDER BY cv.pos)), (s, x) -> s + x)')} AS pc{c + 1}"
        )
    joins = " ".join(
        f"JOIN comp{c} c{c} ON c{c}.pos = cv.pos" for c in range(k)
    )
    parts[-1] = parts[-1].rstrip(",")
    parts += [
        ", proj AS (",
        "    SELECT cv.vec_id, " + ", ".join(proj_cols),
        f"    FROM cvecs cv {joins}",
        "    GROUP BY cv.vec_id",
        ")",
        "SELECT vec_id, " + ", ".join(f"pc{c + 1}" for c in range(k)),
        "FROM proj",
    ]
    return "\n".join(parts)
