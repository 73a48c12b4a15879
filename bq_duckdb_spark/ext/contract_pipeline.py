"""Driver-contract entries for ext/pipeline.py (training-corpus prep:
decontamination, packing, sampling, shuffling, repetition filters).

Every entry carries a full DuckDB oracle:
- decontamination compares n-grams by VALUE in DuckDB vs xxhash64 ids in
  Spark — identical output up to 2^-64 hash collisions (same argument as
  the dedup shingle entries, but here the OUTPUT is hash-free doc ids,
  so the oracle is exact);
- sampling/shuffling use the portable mix hash (ext/pipeline.py) which
  both engines evaluate bit-identically in 64-bit integer arithmetic;
- packing and repetition stats are pure integer/double arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import pipeline
from bq_duckdb_spark.testdata import load_table as _t


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 7 == 0 play the
    held-out eval set; the rest of the corpus drops every doc sharing a
    token 5-gram with it. Held-out n-grams broadcast; the corpus never
    shuffles (see ext/pipeline.py:contaminated_ids)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    heldout = docs.filter(F.col("doc_id") % 7 == 0)
    return pipeline.decontaminate(corpus, heldout, "text", "doc_id", n=5).select(
        "doc_id", "lang", "source"
    )


_PIPE_DECONTAMINATE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(1, len(t) - 3),
                                  i -> array_to_string(list_slice(t, i, i + 4), ' ')) END) AS g
  FROM toks
),
ho AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0),
hits AS (SELECT DISTINCT grams.doc_id FROM grams JOIN ho USING (g)
         WHERE doc_id % 7 <> 0)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id % 7 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

_SEQ_LEN = 256


def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of each language's token stream into
    256-token training sequences (docs may span block boundaries)."""
    return pipeline.pack_sequences(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "lang", _SEQ_LEN
    )


_PIPE_PACK_SEQUENCES_ORACLE = rf"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
  FROM documents
),
c AS (
  SELECT lang, doc_id, nt,
         CAST(COALESCE(SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM t
)
SELECT lang, CAST(u.seq_no AS BIGINT) AS seq_no, doc_id,
       GREATEST(s, u.seq_no * {_SEQ_LEN}) - u.seq_no * {_SEQ_LEN} AS tok_start,
       LEAST(s + nt, (u.seq_no + 1) * {_SEQ_LEN})
         - GREATEST(s, u.seq_no * {_SEQ_LEN}) AS n_tok
FROM c, UNNEST(generate_series(s // {_SEQ_LEN}, (s + nt - 1) // {_SEQ_LEN}))
       AS u(seq_no)
WHERE nt > 0
"""


# ---------------------------------------------------------------------------
# stratified sampling + deterministic shuffle
# ---------------------------------------------------------------------------


def pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample ordered by the portable mix
    hash — reproducible across engines, runs, and task retries."""
    return pipeline.stratified_sample(
        _t(spark, sf_dir, "documents"), ["lang"], "doc_id", k=20, seed=7
    ).select("doc_id", "lang", "source")


_PIPE_STRATIFIED_SAMPLE_ORACLE = """
SELECT doc_id, lang, source FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY (((doc_id + 7) % 2147483647) * 2654435761) % 2147483647, doc_id) <= 20
"""


def pipe_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic training-order shuffle; the two-pass
    range-partition + offsets plan (no SinglePartition funnel) must equal
    the oracle's global ROW_NUMBER exactly."""
    return pipeline.seeded_shuffle(
        _t(spark, sf_dir, "documents"), "doc_id", seed=42
    ).select("doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))


_PIPE_SEEDED_SHUFFLE_ORACLE = """
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY (((doc_id + 42) % 2147483647) * 2654435761) % 2147483647,
                  doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM documents
"""


# ---------------------------------------------------------------------------
# repetition filters
# ---------------------------------------------------------------------------


def pipe_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals (map-only)."""
    return pipeline.with_repetition_stats(
        _t(spark, sf_dir, "documents"), "text", ngram=3
    ).select("doc_id", "dup_token_frac", "dup_ngram_frac", "top_ngram_frac")


_PIPE_REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
g AS (
  SELECT doc_id, t,
         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(1, len(t) - 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' ')) END AS g
  FROM t
),
gc AS (
  SELECT doc_id, t, g,
         list_transform(list_distinct(g),
                        d -> len(list_filter(g, x -> x = d))) AS gc
  FROM g
)
SELECT doc_id,
       1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_token_frac,
       CAST(COALESCE(list_sum(list_transform(gc,
            c -> CASE WHEN c > 1 THEN c ELSE 0 END)), 0) AS DOUBLE) / len(g)
           AS dup_ngram_frac,
       CAST(list_max(gc) AS DOUBLE) / len(g) AS top_ngram_frac
FROM gc
"""


# ---------------------------------------------------------------------------
# span-level exact dedup (C4-style)
# ---------------------------------------------------------------------------


def pipe_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document dedup: 10-token spans, first corpus-wide
    occurrence wins, docs reassembled from their surviving spans. The
    oracle keys winners on the span VALUE (the default); hash_spans=True
    is the 8-byte-shuffle-key scale path, pinned separately in tests."""
    return pipeline.span_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=10
    )


_PIPE_SPAN_DEDUP_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
spans AS (
  SELECT doc_id,
         CAST(ceil(len(t) / 10.0) AS INT) AS n_spans,
         unnest(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS span_pos,
         unnest(list_transform(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT)),
                i -> array_to_string(list_slice(t, CAST(i * 10 + 1 AS INT),
                                                CAST(i * 10 + 10 AS INT)), ' ')))
             AS span
  FROM toks
),
kept AS (
  SELECT * FROM spans
  QUALIFY row_number() OVER (PARTITION BY span ORDER BY doc_id, span_pos) = 1
)
SELECT doc_id,
       string_agg(span, ' ' ORDER BY span_pos) AS text,
       min(n_spans) AS n_spans,
       CAST(count(*) AS INT) AS kept_spans
FROM kept GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# training-mixture materialization
# ---------------------------------------------------------------------------

# Per-source epoch weights exercising every branch: upsample with a
# fractional extra epoch (src0, src1), keep-fraction downsample (src2),
# drop entirely (src3), default weight 1.0 for the long tail.
_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.5, "src2": 0.25, "src3": 0.0}
_MIX_SEED = 11


def pipe_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture materialization (The Pile / Dolma style
    per-source epoch factors): one output row per (doc, epoch), chosen
    by the portable mix hash — never rand()."""
    return pipeline.mixture_sample(
        _t(spark, sf_dir, "documents"), "source", "doc_id", _MIX_WEIGHTS,
        seed=_MIX_SEED,
    ).select("doc_id", "source", "epoch")


def _mixture_oracle() -> str:
    copies = pipeline.mixture_epochs_exprs(
        "source", "doc_id", _MIX_WEIGHTS, seed=_MIX_SEED
    )
    return f"""
WITH c AS (SELECT doc_id, source, ({copies}) AS copies FROM documents)
SELECT doc_id, source, CAST(unnest(range(0, copies)) AS INT) AS epoch
FROM c WHERE copies > 0
"""


_PIPE_MIXTURE_ORACLE = _mixture_oracle()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# end-to-end corpus assembly
# ---------------------------------------------------------------------------


def pipe_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card stats for the assembled corpus: exact dedup ->
    min-10-token gate -> deterministic 100-per-language balance ->
    per-language doc/token/chunk accounting."""
    out = pipeline.corpus_assembly_stats(_t(spark, sf_dir, "documents"))
    return out.orderBy("lang")


_PIPE_CORPUS_ASSEMBLY_ORACLE = r"""
WITH t AS (
    SELECT doc_id, lang, md5(text) AS h,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
    FROM documents
),
d1 AS (
    SELECT * FROM t
    QUALIFY doc_id = min(doc_id) OVER (PARTITION BY h)
),
d2 AS (SELECT * FROM d1 WHERE nt >= 10),
d3 AS (
    SELECT * FROM d2
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
    ) <= 100
)
SELECT lang, count(*) AS n_docs, sum(nt) AS total_tokens,
       sum(greatest(1, CAST(ceil((CAST(nt AS DOUBLE) - 32) / 24) AS BIGINT) + 1))
           AS n_chunks
FROM d3 GROUP BY lang ORDER BY lang
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipe_decontaminate": pipe_decontaminate,
        "pipe_pack_sequences": pipe_pack_sequences,
        "pipe_stratified_sample": pipe_stratified_sample,
        "pipe_seeded_shuffle": pipe_seeded_shuffle,
        "pipe_repetition": pipe_repetition,
        "pipe_quantile_curate": pipe_quantile_curate,
        "pipe_vocab_topk": pipe_vocab_topk,
        "pipe_span_dedup": pipe_span_dedup,
        "pipe_mixture": pipe_mixture,
        "pipe_corpus_assembly": pipe_corpus_assembly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pipe_decontaminate": _PIPE_DECONTAMINATE_ORACLE,
        "pipe_pack_sequences": _PIPE_PACK_SEQUENCES_ORACLE,
        "pipe_stratified_sample": _PIPE_STRATIFIED_SAMPLE_ORACLE,
        "pipe_seeded_shuffle": _PIPE_SEEDED_SHUFFLE_ORACLE,
        "pipe_repetition": _PIPE_REPETITION_ORACLE,
        "pipe_quantile_curate": _PIPE_QUANTILE_CURATE_ORACLE,
        "pipe_vocab_topk": _PIPE_VOCAB_TOPK_ORACLE,
        "pipe_span_dedup": _PIPE_SPAN_DEDUP_ORACLE,
        "pipe_mixture": _PIPE_MIXTURE_ORACLE,
        "pipe_corpus_assembly": _PIPE_CORPUS_ASSEMBLY_ORACLE,
    }


def pipe_quantile_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative curation: keep each language's top 80% by
    distinct-token ratio (rank-based cut — integer-exact)."""
    from bq_duckdb_spark.ext.text import with_quality_scores

    scored = with_quality_scores(_t(spark, sf_dir, "documents"))
    return pipeline.quantile_curate(
        scored, "distinct_ratio", "doc_id", "lang", keep_frac=0.8
    ).select("doc_id", "lang", "distinct_ratio")


_PIPE_QUANTILE_CURATE_ORACLE = r"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS distinct_ratio
  FROM documents
)
SELECT doc_id, lang, distinct_ratio FROM scored
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY distinct_ratio DESC, doc_id)
        <= CEIL(count(*) OVER (PARTITION BY lang) * 0.8)
"""


def pipe_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-50 vocabulary with deterministic tie-breaks."""
    return pipeline.vocab_topk(
        _t(spark, sf_dir, "documents"), "text", "lang", k=50
    ).select("lang", "term", "term_count", F.col("rank").cast("long").alias("rank"))


_PIPE_VOCAB_TOPK_ORACLE = r"""
WITH terms AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, count(*) AS term_count FROM terms GROUP BY lang, term
)
SELECT lang, term, term_count,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY term_count DESC, term) AS BIGINT) AS rank
FROM counts
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY term_count DESC, term) <= 50
"""
