"""Statistical language-model scoring for corpus curation — the
CCNet-style "perplexity filter" step of a training-data pipeline
(reference scope: the documents-table text operators, see
src/ext/text.rs-equivalents surveyed in SURVEY.md §2.8; the LM scorer
itself is a standard public-pipeline stage the reference leaves to
downstream tooling).

Two phases, both pure DataFrame ops (no Python UDFs):

1. **Train** — token counts over a reference corpus, add-k smoothed
   into per-token log-probabilities.  One ``groupBy(term)`` shuffle
   over the exploded reference; the corpus totals are a single-row
   aggregate broadcast into the vocab projection.
2. **Score** — explode the target corpus, left-join the vocab on
   ``term`` (no broadcast hint: a web-scale vocabulary can be tens of
   millions of rows, so AQE decides; at typical vocab sizes it picks a
   broadcast join and the only wide shuffle is the final
   ``groupBy(doc_id)``, which benefits from map-side partial
   aggregation because exploded tokens stay partition-local per doc),
   then aggregate mean negative log-likelihood per document.

Cross-engine determinism: per-token log-probs are quantized to BIGINT
**micro-nats** (``round(ln(p) * 1e6)``) inside the vocab table, so the
per-document sums are exact integer arithmetic with no float
re-association — the same trick as the incremental-agg cents columns.
The final ``nll`` divides two exactly-representable values
(``-sum_micro`` < 2^53 and ``n_tokens * 1e6``), one IEEE division both
engines perform identically, so the contract entry needs no rounding.
``ppl = exp(nll)`` is left to callers (exp() would reintroduce libm
ulp drift for no informational gain — nll orders documents
identically).

OOV handling: tokens absent from the reference vocabulary score
``ln(k / denom)`` (the unseen-event mass of add-k smoothing) and are
counted into ``n_oov`` / ``oov_ratio`` — a high OOV rate is itself a
curation signal (wrong language, binary junk, tokenizer mismatch).

Relation to ext/text.ngram_lm_score (contract ``text_perplexity``):
that operator is the IN-DOMAIN bigram scorer (model trained on the
scored corpus itself, inner-joined — no OOV possible).  This module is
the HELD-OUT shape — train on a curated reference, score a different
corpus — which is what CCNet actually does (Wikipedia LM scoring
CommonCrawl), and where OOV accounting becomes meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.text import _tokens

_MICRO = 1_000_000


def _explode_terms(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """(keep…, term) rows, one per token.  The split lands in a named
    column BEFORE the explode and the explode is the _outer + notNull
    form — see ext/text.py:tf_idf for why both matter (Catalyst
    otherwise re-runs the tokenizer per OUTPUT token / per inferred
    pre-Generate filter)."""
    return (
        df.select(*keep, F.expr(_tokens(text_col)).alias("__toks"))
        .select(*keep, F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isNotNull())
    )


def unigram_counts(ref: DataFrame, text_col: str = "text") -> DataFrame:
    """The LM's sufficient statistic: ``(term, c)`` token counts.  This
    is the frame to keep AT REST for incremental maintenance — counts
    are mergeable state (see :func:`merge_counts`), so growing the
    reference corpus is one delta aggregation + a vocab-sized merge,
    never a full-corpus retrain."""
    return _explode_terms(ref, text_col).groupBy("term").agg(
        F.count("*").alias("c")
    )


def merge_counts(*count_frames: DataFrame) -> DataFrame:
    """Merge unigram count states: union + one vocab-scale groupBy.
    ``lm_from_counts(merge_counts(counts(A), counts(B)))`` equals
    ``unigram_lm(A ∪ B)`` exactly — integer state, no drift (pinned by
    test + property test)."""
    if not count_frames:
        raise ValueError("merge_counts requires at least one count frame")
    out = count_frames[0]
    for f in count_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("term").agg(F.sum("c").alias("c"))


def unigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    k: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Train an add-k-smoothed unigram LM on ``ref``.

    Returns ``(vocab, oov)``: ``vocab`` is ``(term, lp_micro BIGINT)``
    — micro-nat log-prob per in-vocabulary token — and ``oov`` is a
    single row ``(oov_micro BIGINT)`` for unseen tokens.  ``denom`` is
    ``total + k*(V+1)``: V seen types plus one shared unseen type, so
    probabilities sum to <1 with mass k/denom reserved for OOV.

    The term-count table feeds three consumers (vocab projection, the
    totals aggregate, and the totals again under the OOV scalar), and
    Spark does not reuse the exchange across those branches (measured:
    4 corpus scans in the naive lineage).  ``counts`` is therefore
    materialized with an EAGER localCheckpoint — the repo's standard
    multi-consumer pattern (see ext/graph.py:pagerank): vocabulary-
    sized, executor-local, reclaimed by the context cleaner when
    unreferenced, no persist leak.  Training is then exactly ONE corpus
    scan + one groupBy(term) shuffle; the branches rescan the
    materialized vocab-sized table.
    """
    return lm_from_counts(unigram_counts(ref, text_col), k)


def lm_from_counts(
    counts: DataFrame, k: float = 0.5
) -> tuple[DataFrame, DataFrame]:
    """Smooth a ``(term, c)`` count state (from :func:`unigram_counts`,
    a :func:`merge_counts` of several, or a count table read back from
    rest) into the ``(vocab, oov)`` model.  See :func:`unigram_lm` for
    the arithmetic and determinism contract."""
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    )
    # k enters as an explicit DOUBLE and every subsequent step is pure
    # IEEE-double arithmetic: a bare `c + 0.1` would resolve to exact
    # DECIMAL addition then one round-to-double in SQL while a Python
    # reference computes fl(c + fl(0.1)) — a 1-ulp divergence in the
    # ln() input for non-dyadic k.  With the operands pre-cast, Spark,
    # DuckDB, and a sequential float reference all evaluate
    # fl(c + fl(k)) / fl(total + fl(fl(k) * (v+1))) identically (the
    # integer casts are exact below 2^52; `1e-07`-style reprs also
    # land on the same double either way).
    kr = f"CAST({float(k)!r} AS DOUBLE)"
    denom = f"(CAST(total AS DOUBLE) + {kr} * CAST(v + 1 AS DOUBLE))"
    vocab = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        F.expr(
            f"CAST(round(ln((CAST(c AS DOUBLE) + {kr}) / {denom}) * {_MICRO}) "
            "AS BIGINT)"
        ).alias("lp_micro"),
    )
    oov = tot.select(
        F.expr(
            f"CAST(round(ln({kr} / {denom}) * {_MICRO}) "
            "AS BIGINT)"
        ).alias("oov_micro")
    )
    return vocab, oov


def with_lm_score(
    df: DataFrame,
    ref: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM
    trained on ``ref`` (default: ``df`` itself — self-perplexity, the
    in-domain outlier detector).

    Output: ``(id_col, n_tokens, n_oov, oov_ratio, nll)`` — ``nll`` in
    nats per token; lower is more in-distribution.  ``oov_ratio`` and
    ``nll`` are exact-operand IEEE divisions (see module docstring),
    portable bit-for-bit.
    """
    vocab, oov = unigram_lm(ref if ref is not None else df, text_col, k)
    return score_with_lm(df, vocab, oov, text_col, id_col)


def score_with_lm(
    df: DataFrame,
    vocab: DataFrame,
    oov: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``df`` against a PREBUILT ``(vocab, oov)`` model (from
    :func:`unigram_lm`) — the shape for reusing one trained model
    across many corpora / micro-batches: persist (or write at rest)
    the vocab once instead of retraining per call."""
    toks = _explode_terms(df, text_col, id_col)
    return (
        toks.join(vocab, "term", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("lp_micro").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
            F.sum(F.coalesce("lp_micro", "oov_micro")).alias("__s_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_ratio"
            ),
            (
                (-F.col("__s_micro")).cast("double")
                / (F.col("n_tokens") * F.lit(float(_MICRO)))
            ).alias("nll"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    ref: DataFrame,
    max_nll: float,
    max_oov_ratio: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Keep documents scoring ≤ ``max_nll`` nats/token (and ≤
    ``max_oov_ratio``) under the reference LM — the classic
    held-out-LM curation cut.  Semi-join back on ``id_col`` so the
    surviving rows keep their full original schema."""
    vocab, oov = unigram_lm(ref, text_col, k)
    return filter_with_model(
        df, vocab, oov, max_nll, max_oov_ratio, text_col, id_col
    )


def filter_with_model(
    df: DataFrame,
    vocab: DataFrame,
    oov: DataFrame,
    max_nll: float,
    max_oov_ratio: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation cut against a PREBUILT model — single definition of
    the threshold semantics shared by the batch filter above and the
    streaming per-micro-batch filter (streams.perplexity_filter_each_
    batch), so the two paths cannot drift."""
    keep = (
        score_with_lm(df, vocab, oov, text_col, id_col)
        .filter(
            (F.col("nll") <= F.lit(max_nll))
            & (F.col("oov_ratio") <= F.lit(max_oov_ratio))
        )
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
