"""Tier-9 driver-contract entries: substring-level dedup at arbitrary
offsets and two-phase exact heavy hitters.

- ``pipe_substring_dedup``: the overlapping-window practical form of
  suffix-array substring dedup (Lee et al. 2022, arXiv:2107.06499) —
  every duplicated run of >= k tokens is cut at token granularity,
  wherever it starts; the C4-grid ``pipe_span_dedup`` cannot catch
  straddling or mid-span duplicates. Full value oracle (the window key
  is the window TEXT, so DuckDB reproduces winners exactly;
  ``hash_windows=True`` is the 8-byte-key scale path, pinned equal in
  tests at test scale — at 100 TB it carries the standard
  2^-64-per-pair hash-collision trade, see the operator docstring).
- ``sketch_heavy_hitters``: all token-2-grams covering more than n/s of
  the corpus bigram stream, found via per-partition Misra-Gries candidate
  summaries + an exact verify (ext/heavyhitters.py). The output is
  EXACT (candidates are a guaranteed superset; the verify recounts), so
  unlike the HLL/CMS/KLL estimate sketches this entry carries a full
  value-level oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import heavyhitters, pipeline
from bq_duckdb_spark.testdata import load_table as _t

_SUB_K = 8
# bigrams at s=1000: non-trivial heavy-hitter sets at every test SF
# (601 / 636 / 861 rows at sf0.001 / 0.01 / 0.1 — measured; trigrams
# flatten below any fixed 1/s threshold past sf0.01)
_HH_K = 2
_HH_S = 1000

# ---------------------------------------------------------------------------
# substring dedup (overlapping k-token windows, interval merge + cut)
# ---------------------------------------------------------------------------


def pipe_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 8-token-window substring dedup: first corpus-wide
    occurrence (by doc_id, position) is canonical, later occurrences'
    token ranges merge into maximal intervals and are cut."""
    return pipeline.substring_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=_SUB_K
    )


_PIPE_SUBSTRING_DEDUP_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents WHERE text IS NOT NULL
),
wins AS (
  -- window text by INDEXED access: list_slice copies the whole token
  -- array per row, O(tokens^2) per document on long docs (the same
  -- trap the dedup oracles hit; 121 s -> seconds on the hostile corpus)
  SELECT doc_id, CAST(gs.i AS INT) AS pos,
         {" || ' ' || ".join(f"tk[CAST(gs.i + {j + 1} AS INT)]" for j in range(_SUB_K))} AS w
  FROM t, UNNEST(range(0, CAST(greatest(len(tk) - {_SUB_K} + 1, 0) AS BIGINT)))
       AS gs(i)
),
dups AS (
  SELECT doc_id, pos FROM wins
  QUALIFY row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) > 1
),
tok AS (
  SELECT doc_id, CAST(gs.i AS INT) AS idx, tk[CAST(gs.i + 1 AS INT)] AS tok
  FROM t, UNNEST(range(0, CAST(len(tk) AS BIGINT))) AS gs(i)
),
kept AS (
  SELECT tok.doc_id, tok.idx, tok.tok FROM tok
  WHERE NOT EXISTS (SELECT 1 FROM dups d WHERE d.doc_id = tok.doc_id
                    AND d.pos <= tok.idx AND tok.idx < d.pos + {_SUB_K})
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.text, '') AS text,
       CAST(len(t.tk) AS INT) AS n_tokens,
       CAST(len(t.tk) - coalesce(a.kept_n, 0) AS INT) AS removed_tokens
FROM t LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# exact heavy hitters over the corpus 3-gram stream
# ---------------------------------------------------------------------------


def _ngram_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    grams = (
        f"CASE WHEN size(__toks) >= {_HH_K} THEN "
        f"transform(sequence(0, size(__toks) - {_HH_K}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {_HH_K}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    # explode_outer + post-filter: see ext/dedup.py banding comment
    # (plain explode inlines the generator into an inferred pre-filter)
    return (
        docs.select(F.expr("split(trim(text), '\\\\s+')").alias("__toks"))
        .select(F.explode_outer(F.expr(grams)).alias("gram"))
        .filter(F.col("gram").isNotNull())
    )


def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-2-grams covering strictly more than 1/1000 of the corpus
    bigram stream, exact counts, via MG candidates + exact verify."""
    return heavyhitters.heavy_hitters(
        _ngram_items(spark, sf_dir), "gram", s=_HH_S
    )


_SKETCH_HEAVY_HITTERS_ORACLE = rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
),
g AS (
  SELECT array_to_string(list_slice(tk, CAST(gs.i + 1 AS INT),
                                    CAST(gs.i + {_HH_K} AS INT)), ' ') AS gram
  FROM t, UNNEST(range(0, CAST(greatest(len(tk) - {_HH_K} + 1, 0) AS BIGINT)))
       AS gs(i)
),
tot AS (SELECT count(*) AS n FROM g)
SELECT gram, count(*) AS cnt
FROM g CROSS JOIN tot
GROUP BY gram, tot.n
HAVING count(*) * {_HH_S} > tot.n
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipe_substring_dedup": pipe_substring_dedup,
        "sketch_heavy_hitters": sketch_heavy_hitters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pipe_substring_dedup": _PIPE_SUBSTRING_DEDUP_ORACLE,
        "sketch_heavy_hitters": _SKETCH_HEAVY_HITTERS_ORACLE,
    }
