"""Tier-7 driver-contract entries: time-series smoothing, incremental
aggregate maintenance, retrieval rank fusion, and asymmetric
containment dedup.

- ``q_ewma``: per-user exponentially weighted moving average over the
  events stream (operators/timeseries.py). Both engines run the SAME
  strictly sequential left fold per prefix, so values are bit-identical
  — no float re-association, no rounding needed.
- ``q_incremental_agg``: warehouse incremental-maintenance pattern
  (operators/incremental.py) — state(base) merged with state(delta)
  must equal a direct aggregate over the union; the oracle IS that
  direct aggregate.
- ``q_rrf_fusion``: Reciprocal Rank Fusion of a BM25 list and a TF-IDF
  cosine list over the same corpus (ext/retrieval.py) — the standard
  lexical+second-retriever fusion. Ranks are taken over 4dp-rounded
  scores with id tiebreaks so both engines rank identically.
- ``text_containment``: |A∩B|/|A| and |A∩B|/|B| over portable-LSH
  candidates (ext/dedup_portable.py) — catches a short document pasted
  inside a long one, which Jaccard's union-normalization misses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import dedup_portable as dp
from bq_duckdb_spark.ext import retrieval
from bq_duckdb_spark.operators import incremental, timeseries
from bq_duckdb_spark.testdata import load_table as _t


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

_ALPHA = 0.3
# the (1 - α) literal is COMPUTED once and rendered with repr in both
# engines' expressions: 1.0 - 0.3 is 0.7000000000000001 as a double, and
# a hand-written 0.7 literal would be a *different* double — the fold
# results would drift apart in the last ulps
_BETA = 1.0 - _ALPHA
# bounded-lookback horizon: (1 - _ALPHA)^128 ~ 1.4e-20, ~8 orders below
# the result ulp (see q_ewma docstring)
_EWMA_K = 128


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values in time order. One shuffle on
    user_id; per-prefix sequential folds (see operators/timeseries.py
    for why the fold — not a weighted window sum — is the portable,
    overflow-free formulation).

    Bounded lookback K=128: at alpha=0.3 a weight (1-a)^128 ~ 1.4e-20
    is ~8 orders below the result's ulp, so the bounded fold is
    numerically indistinguishable from the exact one — while the
    per-key cost drops from O(n^2) to O(n*128), which is what makes the
    adversarial mega-user (~150k events on one key) computable at all.
    The oracle runs the IDENTICAL bounded fold, so values stay
    bit-identical between engines."""
    out = timeseries.ewma(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        ["ts", "event_id"],
        "value",
        _ALPHA,
        max_lookback=_EWMA_K,
    )
    return out.select("user_id", "event_id", "value", "ewma")


_Q_EWMA_ORACLE = f"""
WITH ev AS (
    SELECT user_id,
           list(event_id ORDER BY ts, event_id) AS ids,
           list(value ORDER BY ts, event_id) AS vals
    FROM events GROUP BY user_id
)
SELECT user_id,
       ids[u.i] AS event_id,
       vals[u.i] AS value,
       list_reduce(list_slice(vals, greatest(1, u.i + 1 - {_EWMA_K}), u.i),
                   (acc, x) -> {_ALPHA!r} * x + {_BETA!r} * acc) AS ewma
FROM ev, UNNEST(range(1, len(vals) + 1)) AS u(i)
"""


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------

_CUT = "1997-01-01 00:00:00"


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count / revenue maintained as a merged
    partial-aggregate state: state(orders before the cut date) folded with
    state(orders after) — never a rescan of the base — must equal the
    direct aggregate over all orders, which is exactly what the oracle
    computes. Sums rounded as cross-order aggregates (merge order
    differs from a single-pass sum's)."""
    # money accumulates in DECIMAL(30,6) (q01 pattern): partial-state
    # merge order differs from the oracle's single pass, and gen_fuzz's
    # boundary values landed a double sum ON the 2dp rounding edge
    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(30,6)")
    )
    cut = F.lit(_CUT).cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cut)
    delta = orders.filter(F.col("o_orderdate") >= cut)
    state = incremental.merge_agg_states(
        [
            incremental.agg_state(base, ["o_custkey"], "o_totalprice"),
            incremental.agg_state(delta, ["o_custkey"], "o_totalprice"),
        ],
        ["o_custkey"],
    )
    out = incremental.read_aggregates(state, ["o_custkey"])
    # the derived mean stays OUT of the hash-compared output: sum/count
    # of cent-valued money lands on exact decimal midpoints (x.xxx5)
    # whenever the count is a power of two, where Spark's HALF_UP string
    # rounding and DuckDB's binary-double rounding lawfully disagree.
    # count+sum fully pin the merge; tests/test_operators.py covers the
    # mean derivation.
    return out.select(
        "o_custkey",
        F.col("n_rows").alias("n_orders"),
        F.round("total", 2).cast("double").alias("total_price"),
    )


_Q_INCREMENTAL_AGG_ORACLE = """
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE)
           AS total_price
FROM orders GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# reciprocal rank fusion
# ---------------------------------------------------------------------------

_RRF_TERMS = ["join", "window", "customer"]
_RRF_K = 60
_RRF_TOPN = 100


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF of two retrievers over documents for one bag-of-terms query:
    Okapi BM25 (ext/retrieval.bm25_scores) and TF-IDF cosine
    (ext/retrieval.tfidf_query_scores), each truncated to its top-100,
    fused with k=60 and cut to the fused top-20."""
    docs = _t(spark, sf_dir, "documents")
    bm = retrieval.ranked_topn(
        retrieval.bm25_scores(docs, _RRF_TERMS), "bm25", top_n=_RRF_TOPN
    )
    cos = retrieval.ranked_topn(
        retrieval.tfidf_query_scores(docs, _RRF_TERMS), "score", top_n=_RRF_TOPN
    )
    fused = retrieval.rrf_fuse([bm, cos], k=_RRF_K)
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(20)
        .select("doc_id", F.round("rrf", 6).alias("rrf_r"), "n_lists")
    )


def _sql_terms(terms: list[str]) -> str:
    return ", ".join("'" + t.replace("'", "''") + "'" for t in terms)


def _cos_ctes() -> str:
    # the TF-IDF pipeline (ti CTE) is imported from ext/contract — ONE
    # definition tracks ext/text.tf_idf for the standalone per-term
    # entry, the cosine-score entry, and the fused-ranking entry alike
    from bq_duckdb_spark.ext.contract import TFIDF_ORACLE_CTES

    return f"""{TFIDF_ORACLE_CTES},
norms AS (
    SELECT doc_id, sqrt(sum(tfidf * tfidf)) AS nrm FROM ti GROUP BY doc_id
),
qnum AS (
    SELECT doc_id, sum(tfidf) AS num FROM ti
    WHERE term IN ({_sql_terms(_RRF_TERMS)}) GROUP BY doc_id
),
cos AS (
    SELECT doc_id, round(num / nrm, 4) AS r4
    FROM qnum JOIN norms USING (doc_id)
)"""


def text_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone per-doc TF-IDF cosine scores for the fusion query bag
    — hash-pins the summed/normed score (not just the per-term values
    text_tfidf pins), so any cross-engine drift in the cosine retriever
    is localized here rather than surfacing as an opaque rank mismatch
    inside q_rrf_fusion."""
    docs = _t(spark, sf_dir, "documents")
    out = retrieval.tfidf_query_scores(docs, _RRF_TERMS)
    return out.select("doc_id", F.round("score", 4).alias("score_r"))


def _tfidf_cosine_oracle() -> str:
    return f"WITH {_cos_ctes()} SELECT doc_id, r4 AS score_r FROM cos"


def _rrf_oracle() -> str:
    # BM25 CTEs/score from tier-4, TF-IDF cosine CTEs from _cos_ctes —
    # every formula in this oracle has exactly one definition
    from bq_duckdb_spark.contract_tier4 import (
        BM25_SCORE_FROM,
        BM25_SCORE_SUM,
        bm25_oracle_ctes,
    )

    return f"""
WITH {bm25_oracle_ctes(_RRF_TERMS)},
bm AS (
    SELECT doc_id, round({BM25_SCORE_SUM}, 4) AS r4
    {BM25_SCORE_FROM}
),
bm_rank AS (
    SELECT doc_id, row_number() OVER (ORDER BY r4 DESC, doc_id) AS rank
    FROM bm ORDER BY r4 DESC, doc_id LIMIT {_RRF_TOPN}
),
{_cos_ctes()},
cos_rank AS (
    SELECT doc_id, row_number() OVER (ORDER BY r4 DESC, doc_id) AS rank
    FROM cos ORDER BY r4 DESC, doc_id LIMIT {_RRF_TOPN}
),
u AS (
    SELECT * FROM bm_rank UNION ALL SELECT * FROM cos_rank
)
SELECT doc_id,
       round(sum(CAST(1.0 AS DOUBLE) / ({_RRF_K} + rank)), 6) AS rrf_r,
       count(*) AS n_lists
FROM u GROUP BY doc_id
ORDER BY sum(CAST(1.0 AS DOUBLE) / ({_RRF_K} + rank)) DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# asymmetric containment
# ---------------------------------------------------------------------------

# LSH parameters come from contract_portable — its _sh_cte/_banded_cte
# oracle builders are pinned to those same module constants, so Spark
# side and oracle cannot disagree about the banding geometry
from bq_duckdb_spark.ext.contract_portable import _BANDS, _K, _NUM_HASHES  # noqa: E402


def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment over portable-LSH candidates —
    quote/subset duplication the symmetric Jaccard entries miss. Raw
    ratios are emitted unrounded: each is an exact-int division both
    engines perform identically in IEEE doubles."""
    return dp.portable_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.5,
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=_K,
    )


def _containment_oracle() -> str:
    from bq_duckdb_spark.ext.contract_portable import _banded_cte, _sh_cte

    return (
        f"WITH {_sh_cte()}, {_banded_cte()}, "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id < b2.doc_id) "
        "SELECT id_a, id_b, containment_a, containment_b FROM ("
        "SELECT p.id_a, p.id_b, "
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh) "
        "AS containment_a, "
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh) "
        "AS containment_b "
        "FROM pairs p JOIN sh sa ON sa.doc_id = p.id_a "
        "JOIN sh sb ON sb.doc_id = p.id_b) "
        "WHERE greatest(containment_a, containment_b) >= 0.5"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_ewma": q_ewma,
        "q_incremental_agg": q_incremental_agg,
        "q_rrf_fusion": q_rrf_fusion,
        "text_tfidf_cosine": text_tfidf_cosine,
        "text_containment": text_containment,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_ewma": _Q_EWMA_ORACLE,
        "q_incremental_agg": _Q_INCREMENTAL_AGG_ORACLE,
        "q_rrf_fusion": _rrf_oracle(),
        "text_tfidf_cosine": _tfidf_cosine_oracle(),
        "text_containment": _containment_oracle(),
    }
