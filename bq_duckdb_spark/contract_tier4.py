"""Tier-4 driver-contract entries: retrieval and model-inference
operators (BM25 keyword scoring, hashed-linear classifier inference,
random-projection sketching) plus crawl-style URL canonicalization.
Every entry carries a full DuckDB oracle.

The classifier, projection, and URL entries are generated from
engine-neutral expression builders (ext/retrieval.py, ext/scrub.py):
the Spark operator and the DuckDB oracle share one definition of the
arithmetic, so the oracle check pins the semantics, not a copy of them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import graph, retrieval, scrub, text
from bq_duckdb_spark.testdata import load_table as _t

_BM25_TERMS = ["join", "window", "customer"]
_EMB_DIM = 64
_PROJ_DIM = 8
_CLS_BUCKETS = 1024


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 of every document against a 3-term query. Rounded 4dp: the
    per-term sum order differs across engines and ln() may differ in
    final ulps between libm implementations."""
    out = retrieval.bm25_scores(_t(spark, sf_dir, "documents"), _BM25_TERMS)
    return out.select("doc_id", F.round("bm25", 4).alias("bm25_r"))


# ONE definition of the DuckDB-side BM25 pipeline, shared with the
# tier-7 RRF-fusion oracle (contract_tier7) so the arithmetic cannot
# drift between the standalone score entry and the fused-ranking entry.


def bm25_oracle_ctes(terms: list[str]) -> str:
    """lens/stats/matched/doc_tc/term_df CTE block (no WITH keyword)."""
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""lens AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS doc_len
    FROM documents
),
stats AS (
    SELECT avg(doc_len) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM lens
),
matched AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ) WHERE term IN ({tl})
),
doc_tc AS (
    SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tc
    FROM matched GROUP BY doc_id, term
),
term_df AS (
    SELECT term, CAST(count(*) AS DOUBLE) AS df_t FROM doc_tc GROUP BY term
)"""


# Okapi BM25 with the Lucene idf form; k1=1.2, b=0.75 (must track
# retrieval.bm25_scores' defaults)
BM25_SCORE_SUM = (
    "sum(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))"
    " * tc * (1.2 + 1.0)"
    " / (tc + 1.2 * (1.0 - 0.75 + 0.75 * doc_len / avgdl)))"
)

BM25_SCORE_FROM = (
    "FROM doc_tc JOIN term_df USING (term) JOIN lens USING (doc_id) "
    "CROSS JOIN stats GROUP BY doc_id"
)

_TEXT_BM25_ORACLE = (
    f"WITH {bm25_oracle_ctes(_BM25_TERMS)}\n"
    f"SELECT doc_id, round({BM25_SCORE_SUM}, 4) AS bm25_r\n{BM25_SCORE_FROM}"
)


# ---------------------------------------------------------------------------
# hashed-linear classifier
# ---------------------------------------------------------------------------


def text_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear inference over documents. prob
    rounded 4dp (exp() libm ulps)."""
    out = retrieval.classify_documents(
        _t(spark, sf_dir, "documents"), n_buckets=_CLS_BUCKETS
    )
    return out.select(
        "doc_id", F.round("prob", 4).alias("prob_r"), "label"
    )


def _text_classify_oracle() -> str:
    score = retrieval.classifier_score_expr("text", _CLS_BUCKETS, "duckdb")
    return f"""
SELECT doc_id,
       round(1.0 / (1.0 + exp(-10.0 * ({score}))), 4) AS prob_r,
       CAST(1.0 / (1.0 + exp(-10.0 * ({score}))) >= 0.5 AS INT) AS label
FROM documents
"""


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def emb_random_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 random projection of the 64-d embeddings to 8 columns.
    No rounding: both engines evaluate the identical fixed-order ± sum
    of doubles, which is bitwise-reproducible (no libm calls)."""
    return retrieval.random_projection(
        _t(spark, sf_dir, "embeddings"), in_dim=_EMB_DIM, out_dim=_PROJ_DIM
    )


def _emb_random_proj_oracle() -> str:
    exprs = retrieval.projection_exprs(
        "embedding", _EMB_DIM, _PROJ_DIM, "duckdb"
    )
    cols = ",\n       ".join(f"{e} AS p{j}" for j, e in enumerate(exprs))
    return f"SELECT vec_id,\n       {cols}\nFROM embeddings"


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# messy planted URLs exercising every rule: mixed-case authority,
# default port, trailing slash, tracking params in first/middle/last
# position, fragment
_PLANT_URL = (
    "concat('HTTPS://WWW.Example', CAST(doc_id % 5 AS {int}), '.COM',"
    " CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END,"
    " '/Path/', CAST(doc_id % 20 AS {int}),"
    " CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,"
    " '?utm_source=feed&id=', CAST(doc_id % 7 AS {int}),"
    " CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x' ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)


def url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize planted messy URLs and count the resulting exact-dup
    groups — the crawl-frontier URL-dedup shape (map-only canonicalize,
    ONE shuffle on the canonical key)."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PLANT_URL.format(int="STRING") + " AS url"
    )
    return (
        scrub.canonicalize_urls(docs)
        .groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )


def _url_canonical_oracle() -> str:
    canon = scrub.canonical_url_expr("url", "duckdb")
    plant = _PLANT_URL.format(int="VARCHAR")
    return f"""
WITH planted AS (SELECT doc_id, {plant} AS url FROM documents)
SELECT {canon} AS canon_url, count(*) AS n_dups
FROM planted GROUP BY canon_url
"""


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

_DECON_N = 5  # n-gram order: long enough to be specific, short enough
# that the planted near-duplicates in the synthetic corpus collide


def text_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th document plays the held-out
    eval set; corpus documents sharing any word 5-gram with it are
    flagged with their distinct-hit counts."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return text.decontaminate(corpus, ev, n=_DECON_N)


_TEXT_DECONTAM_ORACLE = f"""
WITH grams AS (
    SELECT doc_id,
           concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS gram
    FROM (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ), unnest(range(1, greatest(1, len(t) - {_DECON_N - 1}) + 1)) AS r(i)
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
body AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 50 <> 0)
SELECT doc_id, count(*) AS n_hits
FROM body JOIN ev USING (gram)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# per-group balanced sampling
# ---------------------------------------------------------------------------

_BALANCE_PER_GROUP = 50


def corpus_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most 50 documents per language, selected by a stable
    multiplicative hash (deterministic across runs and engines)."""
    out = text.balance_corpus(
        _t(spark, sf_dir, "documents"), per_group=_BALANCE_PER_GROUP
    )
    return out.select("doc_id", "lang")


_CORPUS_BALANCE_ORACLE = f"""
SELECT doc_id, lang
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
) <= {_BALANCE_PER_GROUP}
"""


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


def text_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: one row per term with document
    frequency and the sorted posting list."""
    return text.inverted_index(_t(spark, sf_dir, "documents"))


_TEXT_POSTINGS_ORACLE = """
WITH exploded AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
)
SELECT term, count(*) AS df_t,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM exploded GROUP BY term
"""


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-iteration PageRank over the per-user event-type transition
    graph (damping 0.85, dangling mass redistributed uniformly)."""
    edges = graph.transition_edges(_t(spark, sf_dir, "events"))
    out = graph.pagerank(edges, iters=8)
    return out.select("node", F.round("rank", 6).alias("rank_r"))



# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096


def corpus_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights for target-distribution data selection:
    every 50th document is the target sample; the rest of the corpus is
    scored by hashed-n-gram log-likelihood ratio. Rounded 4dp (per-doc
    ln-sum order differs across engines)."""
    docs = _t(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("doc_id") % 50 == 0)
    bg = docs.filter(F.col("doc_id") % 50 != 0)
    out = retrieval.dsir_weights(bg, tgt, n_buckets=_DSIR_BUCKETS)
    # + 0.0 canonicalizes IEEE negative zero: a doc whose ln-ratio sum
    # rounds to zero can land on -0.0 in one engine and +0.0 in the
    # other (observed at sf1, doc 18923), and string-normalizing
    # compares render them differently even though -0.0 == 0.0
    return out.select(
        "doc_id", (F.round("dsir", 4) + F.lit(0.0)).alias("dsir_r")
    )


def _corpus_dsir_oracle() -> str:
    feats = retrieval.feature_buckets_expr("text", _DSIR_BUCKETS, "duckdb")
    b = float(_DSIR_BUCKETS)
    return f"""
WITH tfeat AS (
    SELECT unnest({feats}) AS bucket FROM documents WHERE doc_id % 50 = 0
),
bfeat AS (
    SELECT doc_id, unnest({feats}) AS bucket
    FROM documents WHERE doc_id % 50 <> 0
),
tc AS (SELECT bucket, count(*) AS n_t FROM tfeat GROUP BY bucket),
bc AS (SELECT bucket, count(*) AS n_b FROM bfeat GROUP BY bucket),
tot AS (
    SELECT (SELECT CAST(sum(n_t) AS DOUBLE) FROM tc) AS tot_t,
           (SELECT CAST(sum(n_b) AS DOUBLE) FROM bc) AS tot_b
),
w AS (
    SELECT COALESCE(tc.bucket, bc.bucket) AS bucket,
           ln((COALESCE(n_t, 0) + 1.0) / (tot_t + 1.0 * {b!r}))
           - ln((COALESCE(n_b, 0) + 1.0) / (tot_b + 1.0 * {b!r})) AS w
    FROM tc FULL OUTER JOIN bc ON tc.bucket = bc.bucket CROSS JOIN tot
)
SELECT doc_id, round(sum(w), 4) + 0.0 AS dsir_r
FROM bfeat JOIN w USING (bucket)
GROUP BY doc_id
"""



# ---------------------------------------------------------------------------
# join-key skew diagnosis
# ---------------------------------------------------------------------------


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnosis of the events table's user_id — the
    pre-flight check before joining events against a user dimension."""
    from bq_duckdb_spark.operators.skew import key_skew_stats

    return key_skew_stats(_t(spark, sf_dir, "events"), "user_id", top_k=10)


_Q_KEY_SKEW_ORACLE = """
WITH counts AS (
    SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY user_id
),
tot AS (
    SELECT CAST(sum(cnt) AS DOUBLE) AS total,
           CAST(count(*) AS DOUBLE) AS n_keys
    FROM counts
)
SELECT key, cnt, cnt / total AS pct, cnt / (total / n_keys) AS x_over_avg
FROM counts CROSS JOIN tot
ORDER BY cnt DESC, key LIMIT 10
"""



# ---------------------------------------------------------------------------
# batch click attribution + corpus length histogram
# ---------------------------------------------------------------------------


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-view attribution as a batch interval join — the
    oracle-checked twin of the streaming operator (same function, same
    join predicate; streamed == batch is pinned in test_streaming)."""
    from bq_duckdb_spark.streaming.streams import click_attribution

    return click_attribution(_t(spark, sf_dir, "events"))


_Q_ATTRIBUTION_ORACLE = """
SELECT c.event_id AS click_id, v.event_id AS view_id, v.user_id,
       v.ts AS view_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts > v.ts
 AND c.ts <= v.ts + INTERVAL 10 MINUTE
"""


def corpus_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram over fixed bucket edges — the length
    distribution every dataset card reports. Map-side bucket expression
    + one tiny groupBy shuffle."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        "CASE WHEN __nt < 8 THEN '0-7' WHEN __nt < 16 THEN '8-15' "
        "WHEN __nt < 32 THEN '16-31' WHEN __nt < 64 THEN '32-63' "
        "ELSE '64+' END"
    )
    from bq_duckdb_spark.ext.text import _tokens

    return (
        docs.selectExpr(f"CAST(size({_tokens('text')}) AS BIGINT) AS __nt")
        .selectExpr(f"{bucket} AS len_bucket", "__nt")
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__nt").alias("total_tokens"))
        .orderBy("len_bucket")
    )


_CORPUS_LENGTH_HIST_ORACLE = r"""
WITH t AS (
    SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
    FROM documents
)
SELECT CASE WHEN nt < 8 THEN '0-7' WHEN nt < 16 THEN '8-15'
            WHEN nt < 32 THEN '16-31' WHEN nt < 64 THEN '32-63'
            ELSE '64+' END AS len_bucket,
       count(*) AS n_docs, sum(nt) AS total_tokens
FROM t GROUP BY len_bucket ORDER BY len_bucket
"""



# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------

_PLANT_MESSY = (
    "concat('<div class=\"x\">', coalesce(text, ''), '</div>',"
    " CASE WHEN doc_id % 3 = 0 THEN ' R&amp;D   Caf\u00e9' ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN '<br/>&nbsp;\u00c0 BIENT\u00d4T' ELSE '' END)"
)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup canonicalization over planted messy text: markup
    stripped, entities decoded, Latin-1 accents folded, lowercased,
    whitespace collapsed."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PLANT_MESSY + " AS text"
    )
    return scrub.normalize_text(docs).select("doc_id", "norm_text")


def _text_normalize_oracle() -> str:
    return f"""
WITH planted AS (SELECT doc_id, {_PLANT_MESSY} AS text FROM documents)
SELECT doc_id, {scrub.normalize_text_expr("text", "duckdb")} AS norm_text
FROM planted
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_bm25": text_bm25,
        "text_classify": text_classify,
        "emb_random_proj": emb_random_proj,
        "url_canonical": url_canonical,
        "text_decontam": text_decontam,
        "corpus_balance": corpus_balance,
        "text_postings": text_postings,
        "graph_pagerank": graph_pagerank,
        "corpus_dsir": corpus_dsir,
        "q_key_skew": q_key_skew,
        "q_attribution": q_attribution,
        "corpus_length_hist": corpus_length_hist,
        "text_normalize": text_normalize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "text_bm25": _TEXT_BM25_ORACLE,
        "text_classify": _text_classify_oracle(),
        "emb_random_proj": _emb_random_proj_oracle(),
        "url_canonical": _url_canonical_oracle(),
        "text_decontam": _TEXT_DECONTAM_ORACLE,
        "corpus_balance": _CORPUS_BALANCE_ORACLE,
        "text_postings": _TEXT_POSTINGS_ORACLE,
        "graph_pagerank": graph.pagerank_oracle_sql(iters=8),
        "corpus_dsir": _corpus_dsir_oracle(),
        "q_key_skew": _Q_KEY_SKEW_ORACLE,
        "q_attribution": _Q_ATTRIBUTION_ORACLE,
        "corpus_length_hist": _CORPUS_LENGTH_HIST_ORACLE,
        "text_normalize": _text_normalize_oracle(),
    }
