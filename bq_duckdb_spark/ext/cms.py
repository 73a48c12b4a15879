"""Count-Min Sketch over token streams — mergeable frequency estimates
with a FULL cross-engine oracle.

Where the HLL rollups (operators/sketches.py) rely on Spark's opaque
DataSketches binaries (rows-only checkable), this CMS is built from the
portable hash family (ext/dedup_portable.py): char-polynomial token
hashes and universal ``(a*h + b) mod P`` row functions — plain 64-bit
arithmetic any SQL engine evaluates identically, so the ENTIRE sketch
(every counter) and every estimate is value-checkable against DuckDB.

Structure: ``depth`` independent rows of ``width`` counters; a token
increments one counter per row (``((a_i*h + b_i) mod P) mod width``).
Estimate = min over rows of the token's counters — never an
underestimate (each counter only ever adds colliding tokens' counts),
within ``2N/width`` of truth with probability ``1 - 2^-depth``.

Scale design:
- build is tokenize (map-only) + ONE shuffle on (row, cell) —
  ``depth × width`` output rows regardless of corpus size, partial
  aggregation map-side;
- sketches MERGE BY ADDITION: per-shard/per-day partial sketches union
  + groupBy sum, so a 100 TB corpus builds per-partition sketches with
  no raw re-scan for coarser grains (same pattern as the HLL rollup);
- estimates join a tiny probe set against the bounded sketch —
  broadcast, no corpus access at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.dedup_portable import P, char_poly_expr, poly_hash_coeffs


def _tokens_expr(text_col: str, engine: str) -> str:
    if engine == "spark":
        return f"split(trim({text_col}), '\\\\s+')"
    return f"regexp_split_to_array(trim({text_col}), '\\s+')"


# one shared coefficient table for every row function, generated once —
# poly_hash_coeffs is prefix-stable, so any depth <= _MAX_DEPTH reads
# the same coefficients the oracles were generated with
_MAX_DEPTH = 8
_A, _B = poly_hash_coeffs(_MAX_DEPTH)


def cms_cell_expr(h: str, row: int, width: int) -> str:
    """Counter index of hash ``h`` in sketch row ``row`` — identical
    text in Spark SQL and DuckDB (plain integer arithmetic)."""
    if row >= _MAX_DEPTH:
        raise ValueError(f"CMS depth is capped at {_MAX_DEPTH} rows")
    return f"((({_A[row]} * ({h}) + {_B[row]}) % {P}) % {width})"


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """The sketch as ``(row, cell, cnt)`` — at most ``depth × width``
    rows. Tokenizes once, hashes each token once, then one explode to
    ``depth`` (row, cell) pairs per token and one groupBy."""
    h = char_poly_expr("t", "spark")
    rows_arr = ", ".join(
        f"named_struct('row', {i}, 'cell', {cms_cell_expr('__cms_h', i, width)})"
        for i in range(depth)
    )
    toks = (
        df.select(
            F.explode_outer(F.expr(_tokens_expr(text_col, "spark"))).alias("t")
        )
        .where(F.col("t").isNotNull())
        .select(F.expr(h).alias("__cms_h"))
    )
    return (
        toks.select(F.explode_outer(F.expr(f"array({rows_arr})")).alias("rc"))
        .select(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches by counter addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    spark,
    sketch: DataFrame,
    probe_tokens: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated frequency of each probe token: min over rows of its
    counters (a missing counter is 0). The probe set is tiny and
    data-independent; the sketch side is bounded — broadcast join."""
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in probe_tokens)
    h = char_poly_expr("token", "spark")
    probes = (
        spark.range(1)
        .select(F.explode_outer(F.expr(f"array({lits})")).alias("token"))
        .withColumn("__cms_h", F.expr(h))
    )
    cells = probes.select(
        "token",
        F.explode_outer(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('row', {i}, 'cell', {cms_cell_expr('__cms_h', i, width)})"
                    for i in range(depth)
                )
                + ")"
            )
        ).alias("rc"),
    ).select("token", F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        cells.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_oracle_sql(
    probe_tokens: list[str], depth: int = 4, width: int = 1024
) -> str:
    """DuckDB twin: the same counters and estimates from the same
    arithmetic (generated from the shared expression builders), plus
    the exact counts the entry reports alongside."""
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in probe_tokens)
    h_tok = char_poly_expr("t", "duckdb")
    h_probe = char_poly_expr("token", "duckdb")
    row_cells = ",\n        ".join(
        f"(({i}, {cms_cell_expr('h', i, width)}))" for i in range(depth)
    )
    probe_cells = ",\n        ".join(
        f"(({i}, {cms_cell_expr('h', i, width)}))" for i in range(depth)
    )
    return f"""
WITH toks AS (
    SELECT unnest({_tokens_expr('text', 'duckdb')}) AS t FROM documents
),
hashed AS (SELECT t, {h_tok} AS h FROM toks),
sketch AS (
    SELECT rc[1] AS row, rc[2] AS cell, count(*) AS cnt
    FROM (SELECT unnest([{row_cells}]) AS rc FROM hashed)
    GROUP BY 1, 2
),
probes AS (
    SELECT token, {h_probe} AS h
    FROM (SELECT unnest([{lits}]) AS token)
),
probe_cells AS (
    SELECT token, rc[1] AS row, rc[2] AS cell
    FROM (SELECT token, unnest([{probe_cells}]) AS rc FROM probes)
),
est AS (
    SELECT token, min(coalesce(cnt, 0)) AS cms_est
    FROM probe_cells LEFT JOIN sketch USING (row, cell)
    GROUP BY token
),
exact AS (
    SELECT t AS token, count(*) AS exact_cnt FROM toks GROUP BY t
)
SELECT token, coalesce(exact_cnt, 0) AS exact_cnt, cms_est
FROM est LEFT JOIN exact USING (token)
"""
