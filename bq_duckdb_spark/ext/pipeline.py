"""Corpus-preparation operators for LLM training pipelines:
benchmark decontamination, sequence packing, stratified sampling,
deterministic shuffling, and repetition-quality filters.

Reference parity: the reference engine (a SQL/DAG query engine) has no
training-pipeline suite; these extend it the way ext/dedup and ext/text
do — first-class distributed operators with driver-contract oracles.

Scale design notes (the 100 TB shapes):
- decontamination joins the corpus' exploded n-grams against the
  held-out set ONCE on a hashed n-gram key — the held-out side (eval
  benchmarks) is orders of magnitude smaller than the corpus and is
  explicitly broadcast, so the corpus never shuffles;
- sequence packing is one window cumsum per group partition (range-
  partitioned by group) + a map-only explode — no global funnel;
- stratified sampling / seeded shuffle order by a SPLITTABLE
  deterministic mix hash (pure 64-bit arithmetic, reproducible in any
  engine), never rand() (non-reproducible across retries — a retried
  task would resample);
- repetition stats are map-only per-document expressions (Gopher-style
  filters, Rae et al. 2021, arXiv:2112.11446) — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic mix hash (engine-portable: plain 64-bit arithmetic)
# ---------------------------------------------------------------------------

# Knuth multiplicative mix modulo the Mersenne prime 2^31-1. Products
# stay under 2^63 for any id below ~4.5e12, so the SAME expression
# evaluates identically in Spark, DuckDB, BigQuery — which is what lets
# the sampling/shuffle entries carry full value-level oracles (xxhash64
# would be faster but has no cross-engine twin).
_MIX_MOD = 2147483647


def mix_hash_expr(col: str, seed: int = 0) -> str:
    return f"((({col} + {seed}) % {_MIX_MOD}) * 2654435761) % {_MIX_MOD}"


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _ngram_hashes(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """Token n-grams as xxhash64 ids (delegates to the dedup shingler —
    same whole-doc fallback for docs shorter than n tokens)."""
    from bq_duckdb_spark.ext.dedup import _with_shingle_hashes

    return _with_shingle_hashes(df, text_col, n, out=out)


def contaminated_ids(
    corpus: DataFrame,
    heldout: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Ids of corpus docs sharing ANY token n-gram with the held-out set.

    The held-out n-gram table (distinct hashes) is explicitly broadcast:
    eval benchmarks are a few MB of n-grams against a corpus of TBs, so
    the contamination check is a map-side hash probe of the corpus scan —
    the corpus itself never crosses an exchange. The distinct on the
    output ids is a shuffle of matched ids only (bounded by corpus rows,
    typically a tiny fraction).
    """
    ho = (
        _ngram_hashes(heldout, text_col, n, out="__g")
        .select(F.explode_outer("__g").alias("__g"))  # see note below
        .distinct()
    )
    hits = (
        _ngram_hashes(corpus, text_col, n, out="__g")
        # explode_outer: plain explode makes Catalyst infer a pre-Generate
        # filter that re-evaluates the whole n-gram-hash expression twice
        # more per row (8x slower measured at sf0.1); arrays are non-empty
        # (whole-doc fallback), and a null text row explodes to a null gram
        # that no equi-join can match — value-identical output.
        .select(F.col(id_col), F.explode_outer("__g").alias("__g"))
        .join(F.broadcast(ho), "__g", "left_semi")
        .select(id_col)
        .distinct()
    )
    return hits


def decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Drop every corpus doc that shares a token n-gram with ``heldout``
    (train/test overlap removal). Anti-join on the (small) contaminated
    id set — broadcast under AQE."""
    hits = contaminated_ids(corpus, heldout, text_col, id_col, n)
    return corpus.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    seq_len: int,
) -> DataFrame:
    """GPT-style pretraining packing: per group, concatenate documents in
    deterministic (id) order and chunk the token stream into fixed
    ``seq_len`` blocks. A document spanning a block boundary appears in
    every block it overlaps, with its in-block slice recorded.

    Output: (group, seq_no, id, tok_start, n_tok) where ``tok_start`` is
    the doc slice's offset inside sequence ``seq_no`` and ``n_tok`` the
    slice length; empty docs are dropped (they contribute no tokens).

    Scale: one window cumsum per group (groups range-partition; within a
    group the running offset is a prefix sum over that partition) and a
    map-only explode over the spanned block range. No global ordering —
    packing is per-group by design: at 100 TB you pack per shard/lang,
    never through one global cumsum.
    """
    n_tok = f"CAST(size(split(trim({text_col}), '\\\\s+')) AS BIGINT)"
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(group_col), F.col(id_col), F.expr(n_tok).alias("__nt")
    ).withColumn("__start", F.coalesce(F.sum("__nt").over(w), F.lit(0)))
    return (
        toks.filter(F.col("__nt") > 0)
        .withColumn(
            "seq_no",
            F.explode(
                F.expr(
                    f"sequence(__start div {seq_len}, "
                    f"(__start + __nt - 1) div {seq_len})"
                )
            ),
        )
        .select(
            group_col,
            "seq_no",
            id_col,
            (
                F.greatest(F.col("__start"), F.col("seq_no") * seq_len)
                - F.col("seq_no") * seq_len
            ).alias("tok_start"),
            (
                F.least(F.col("__start") + F.col("__nt"), (F.col("seq_no") + 1) * seq_len)
                - F.greatest(F.col("__start"), F.col("seq_no") * seq_len)
            ).alias("n_tok"),
        )
    )


# ---------------------------------------------------------------------------
# stratified sampling + deterministic shuffle
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum
    by the portable mix hash of their id (ties broken by id) and keep the
    first ``k``. Reproducible across runs/retries/engines — rand() is
    not (a retried task would draw fresh numbers).

    Scale: one shuffle on the strata columns; per-stratum windows are
    parallel. Heavily skewed strata bound the window cost at the largest
    stratum — still streaming row_number, never a buffer.
    """
    h = mix_hash_expr(id_col, seed)
    w = Window.partitionBy(*strata_cols).orderBy(F.expr(h), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global deterministic training-order shuffle: every row gains
    ``shuffle_pos`` (0-based), the rank of its mix-hash (ties by id).

    Same two-pass shape as operators/ntile.py's scalable NTILE: a global
    ``row_number() OVER (ORDER BY hash)`` would funnel the corpus through
    one task; instead range-partition on the hash, rank locally, and add
    broadcast per-partition offsets — the only single-partition work is
    the offsets window over #partitions rows.
    """
    spark = df.sparkSession
    npart = num_partitions or spark.sparkContext.defaultParallelism
    keyed = df.withColumn("__h", F.expr(mix_hash_expr(id_col, seed)))
    ranged = keyed.repartitionByRange(npart, F.col("__h"), F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy("__h", id_col)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("shuffle_pos", F.col("__off") + F.col("__lrn") - F.lit(1))
        .drop("__h", "__pid", "__lrn", "__off")
    )


# ---------------------------------------------------------------------------
# repetition filters (Gopher-style)
# ---------------------------------------------------------------------------


def with_repetition_stats(
    df: DataFrame, text_col: str, ngram: int = 3
) -> DataFrame:
    """Per-document repetition quality signals (the Gopher repetition
    filters, Rae et al. 2021 — used to drop auto-generated / looping
    text):

    - ``dup_token_frac``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total);
    - ``dup_ngram_frac``: fraction of token ``ngram``-grams occurring
      more than once;
    - ``top_ngram_frac``: fraction of all ``ngram``-grams claimed by the
      single most frequent one.

    Map-only JVM higher-order expressions; per-doc cost is
    O(distinct-grams x grams) which is bounded by document length —
    fine for web-scale docs, and zero shuffles at any corpus size.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    grams = (
        f"CASE WHEN size({toks}) < {ngram} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(1, size({toks}) - {ngram - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {ngram}))) END"
    )
    gcounts = (
        f"transform(array_distinct(__g), d -> size(filter(__g, x -> x = d)))"
    )
    return (
        df.withColumn("__t", F.expr(toks))
        .withColumn("__g", F.expr(grams))
        .withColumn("__gc", F.expr(gcounts))
        .withColumn(
            "dup_token_frac",
            F.expr("1.0 - CAST(size(array_distinct(__t)) AS DOUBLE) / size(__t)"),
        )
        .withColumn(
            "dup_ngram_frac",
            F.expr(
                "CAST(aggregate(__gc, 0, (a, c) -> a + IF(c > 1, c, 0)) AS DOUBLE)"
                " / size(__g)"
            ),
        )
        .withColumn(
            "top_ngram_frac",
            F.expr("CAST(array_max(__gc) AS DOUBLE) / size(__g)"),
        )
        .drop("__t", "__g", "__gc")
    )


def repetition_filter(
    df: DataFrame,
    text_col: str,
    ngram: int = 3,
    max_dup_token_frac: float = 0.6,
    max_dup_ngram_frac: float = 0.5,
    max_top_ngram_frac: float = 0.3,
) -> DataFrame:
    """Keep documents below all three repetition thresholds."""
    scored = with_repetition_stats(df, text_col, ngram)
    return scored.filter(
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("dup_ngram_frac") <= max_dup_ngram_frac)
        & (F.col("top_ngram_frac") <= max_top_ngram_frac)
    )


# ---------------------------------------------------------------------------
# corpus-relative curation
# ---------------------------------------------------------------------------


def quantile_curate(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_col: str,
    keep_frac: float = 0.8,
) -> DataFrame:
    """Keep each group's top ``keep_frac`` fraction by score —
    corpus-RELATIVE quality filtering (vs the fixed thresholds of
    ext/text.py:curate). Rank-based rather than value-threshold-based,
    so the cut is integer-exact and engine-portable: no float boundary
    can flip a row between engines (a `score >= percentile(...)` filter
    can, when the interpolated threshold differs in the last ulp).

    Scale: one shuffle on the group column; per-group window is a
    streaming row_number + a count, never a value buffer. Groups are
    strata (language/source shards) — there is no global funnel, which
    is also how a 100 TB pipeline curates: per shard, not globally.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rk") <= F.ceil(F.col("__n") * keep_frac))
        .drop("__rk", "__n")
    )


def vocab_topk(
    df: DataFrame,
    text_col: str,
    group_col: str,
    k: int = 100,
) -> DataFrame:
    """Per-group vocabulary: the ``k`` most frequent tokens with counts
    (ties broken alphabetically — deterministic). One explode + one
    (group, term) count shuffle with map-side partial aggregation, then
    a per-group top-k window over the (small) distinct-term table."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    # _outer: keeps the tokenizing split out of the inferred
    # pre-Generate filter (see ext/dedup.py banding comment)
    terms = df.select(
        F.col(group_col), F.explode_outer(F.expr(toks)).alias("term")
    ).filter(F.col("term").isNotNull())
    counts = terms.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("term_count")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("term_count").desc(), F.col("term")
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(group_col, "term", "term_count", F.col("__rk").alias("rank"))
    )
