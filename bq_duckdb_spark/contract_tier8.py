"""Tier-8 driver-contract entries: held-out language-model scoring
(ext/lm.py) — the CCNet-shaped curation stage the in-domain bigram
entry (``text_perplexity``, contract_tier3.py) does not cover.

- ``text_lm_heldout``: unigram LM trained on the documents corpus
  scores a DRIFTED copy of the corpus (one synthetic unseen token
  appended per document) — exercises the vocabulary left-join miss
  path and the OOV accounting end-to-end.  All emitted floats are
  exact-operand IEEE divisions over integer micro-nat sums (see
  ext/lm.py module docstring), so no rounding is needed.
- ``pipe_perplexity_filter``: the curation cut — keep documents at
  ≤ ``_MAX_NLL`` nats/token under an LM trained on a 90% reference
  split.  The threshold compares bit-identical doubles in both
  engines, so the boundary is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import lm
from bq_duckdb_spark.testdata import load_table as _t

# one synthetic out-of-vocabulary token per document, keyed mod 50 so
# the drifted corpus has 50 unseen types (not one): the vocab miss path
# sees many distinct keys, as real domain drift would produce
_DRIFT = "concat(text, ' __drift_', CAST(doc_id % 50 AS STRING))"
_DRIFT_SQL = "text || ' __drift_' || CAST(doc_id % 50 AS VARCHAR)"

_MAX_NLL = 3.5
_REF_PRED = "doc_id % 10 != 0"

# ---------------------------------------------------------------------------
# shared oracle fragment: train an add-0.5-smoothed unigram LM on the
# documents matching {pred}, quantized to BIGINT micro-nats exactly as
# ext/lm.unigram_lm does
# ---------------------------------------------------------------------------


def _lm_ctes(pred: str) -> str:
    return rf"""lm_ref_toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
    FROM documents WHERE {pred}
),
lm_counts AS (SELECT term, count(*) AS c FROM lm_ref_toks GROUP BY term),
lm_tot AS (SELECT sum(c) AS total, count(*) AS v FROM lm_counts),
-- k and both division operands enter as explicit DOUBLEs exactly as
-- ext/lm.lm_from_counts now builds them: every step is IEEE-double
-- arithmetic (never exact-DECIMAL-then-round), so Spark, DuckDB, and
-- a sequential float reference share the ln() input bit-for-bit
lm_vocab AS (
    SELECT term,
           CAST(round(ln((CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(total AS DOUBLE)
                      + CAST(0.5 AS DOUBLE) * CAST(v + 1 AS DOUBLE)))
                * 1000000)
               AS BIGINT) AS lp_micro
    FROM lm_counts CROSS JOIN lm_tot
),
lm_oov AS (
    SELECT CAST(round(ln(CAST(0.5 AS DOUBLE)
                   / (CAST(total AS DOUBLE)
                      + CAST(0.5 AS DOUBLE) * CAST(v + 1 AS DOUBLE)))
                * 1000000)
               AS BIGINT) AS oov_micro
    FROM lm_tot
)"""


def _lm_score_sql(target_cte: str) -> str:
    """Per-doc (n_tokens, n_oov, oov_ratio, nll) over ``target_cte``
    rows (doc_id, text) — the DuckDB twin of ext/lm.with_lm_score."""
    return rf"""lm_tgt_toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
    FROM {target_cte}
),
lm_scored AS (
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.lp_micro IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_oov,
           sum(coalesce(v.lp_micro, o.oov_micro)) AS s_micro
    FROM lm_tgt_toks t
    LEFT JOIN lm_vocab v USING (term)
    CROSS JOIN lm_oov o
    GROUP BY t.doc_id
),
lm_out AS (
    SELECT doc_id, n_tokens, n_oov,
           CAST(n_oov AS DOUBLE) / n_tokens AS oov_ratio,
           CAST(-s_micro AS DOUBLE) / (n_tokens * 1000000.0) AS nll
    FROM lm_scored
)"""


# ---------------------------------------------------------------------------
# held-out LM scoring with OOV accounting
# ---------------------------------------------------------------------------


def text_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM trained on the corpus scores the drifted copy.  Plan:
    one groupBy(term) to train, one AQE-sized vocab join plus one
    groupBy(doc_id) to score — see ext/lm.py for the 100 TB shape."""
    docs = _t(spark, sf_dir, "documents")
    drifted = docs.select("doc_id", F.expr(_DRIFT).alias("text"))
    return lm.with_lm_score(drifted, ref=docs).select(
        "doc_id", "n_tokens", "n_oov", "oov_ratio", "nll"
    )


_TEXT_LM_HELDOUT_ORACLE = (
    f"WITH {_lm_ctes('TRUE')},\n"
    f"drifted AS (SELECT doc_id, {_DRIFT_SQL} AS text FROM documents),\n"
    f"{_lm_score_sql('drifted')}\n"
    "SELECT doc_id, n_tokens, n_oov, oov_ratio, nll FROM lm_out"
)


# ---------------------------------------------------------------------------
# perplexity curation cut
# ---------------------------------------------------------------------------


def pipe_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at ≤ 3.5 nats/token under the 90%-split reference
    LM; survivors keep their original schema via a left-semi join."""
    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(_REF_PRED)
    return lm.perplexity_filter(docs, ref, max_nll=_MAX_NLL).select(
        "doc_id", "lang", "source", "n_chars"
    )


_PIPE_PERPLEXITY_FILTER_ORACLE = (
    f"WITH {_lm_ctes(_REF_PRED)},\n"
    f"{_lm_score_sql('documents')}\n"
    "SELECT d.doc_id, d.lang, d.source, d.n_chars\n"
    "FROM documents d JOIN lm_out s USING (doc_id)\n"
    f"WHERE s.nll <= {_MAX_NLL!r} AND s.oov_ratio <= 1.0"
)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_lm_heldout": text_lm_heldout,
        "pipe_perplexity_filter": pipe_perplexity_filter,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "text_lm_heldout": _TEXT_LM_HELDOUT_ORACLE,
        "pipe_perplexity_filter": _PIPE_PERPLEXITY_FILTER_ORACLE,
    }
