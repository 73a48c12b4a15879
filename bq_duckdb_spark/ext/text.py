"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Everything is built from JVM-side string/array functions (split, regexp,
higher-order folds) so the hot path codegens; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "in", "zu"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}


def _tokens(text_col: str) -> str:
    return f"split(trim({text_col}), '\\\\s+')"


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count (word-piece
    estimate: words plus extra pieces for every 4 chars beyond 4).
    One split per row: both counts read the ``__toks`` attribute."""
    had = "__toks" in df.columns
    out = (
        df if had else df.withColumn("__toks", F.expr(_tokens(text_col)))
    ).withColumn(
        "n_tokens", F.expr("CAST(size(__toks) AS BIGINT)")
    ).withColumn(
        "n_subwords",
        F.expr(
            "CAST(aggregate(__toks, 0, "
            "(acc, t) -> acc + 1 + CAST(floor(greatest(length(t) - 4, 0) / 4) AS INT)) "
            "AS BIGINT)"
        ),
    )
    return out if had else out.drop("__toks")


def with_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: char/word lengths, punctuation and
    whitespace ratios, stopword ratio, distinct-token ratio.

    The token array is split once into ``__toks`` and every ratio reads
    the attribute — six inlined splits per row cost 35% more (measured
    at sf0.1; codegen CSE does not always catch multi-Project
    duplicates after CollapseProject)."""
    toks = "__toks"
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    drop_toks = "__toks" not in df.columns
    df = df.withColumn("__toks", F.expr(_tokens(text_col))) if drop_toks else df
    out = (
        df.withColumn("n_chars_calc", F.expr(f"CAST(length({text_col}) AS BIGINT)"))
        .withColumn("n_words", F.expr(f"CAST(size({toks}) AS BIGINT)"))
        .withColumn(
            "mean_word_len",
            F.expr(
                f"CAST(aggregate({toks}, 0, (a, t) -> a + length(t)) AS DOUBLE) "
                f"/ nullif(size({toks}), 0)"
            ),
        )
        .withColumn(
            # nullif guards (gen_fuzz finding): an EMPTY document has
            # length 0 and under ANSI mode a bare division throws
            # DIVIDE_BY_ZERO; ratio-of-nothing is NULL, not an error
            "punct_ratio",
            F.expr(
                f"CAST(length(regexp_replace({text_col}, '[^.,;:!?]', '')) AS DOUBLE) "
                f"/ nullif(length({text_col}), 0)"
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(
                f"CAST(size(filter({toks}, t -> t IN ({stop_list}))) AS DOUBLE) "
                f"/ nullif(size({toks}), 0)"
            ),
        )
        .withColumn(
            "distinct_ratio",
            F.expr(
                f"CAST(size(array_distinct({toks})) AS DOUBLE) "
                f"/ nullif(size({toks}), 0)"
            ),
        )
    )
    return out.drop("__toks") if drop_toks else out


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (n-gram/stopword-profile heuristic; ties break alphabetically).
    A real pipeline would swap in fastText — same operator shape.
    One split per row: each language's stopword filter reads the
    ``__toks`` attribute instead of re-splitting."""
    scored = []
    for lang in sorted(_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
        scored.append(
            f"named_struct('lang', '{lang}', "
            f"'score', size(filter(__toks, t -> t IN ({words}))))"
        )
    best = (
        "aggregate(array(" + ", ".join(scored) + "), "
        "named_struct('lang', 'und', 'score', -1), "
        "(acc, s) -> CASE WHEN s.score > acc.score THEN s ELSE acc END).lang"
    )
    had = "__toks" in df.columns
    out = (
        df if had else df.withColumn("__toks", F.expr(_tokens(text_col)))
    ).withColumn("pred_lang", F.expr(best))
    return out if had else out.drop("__toks")


def tf_idf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per (document, term) TF-IDF over whitespace tokens.

    tf = term count in doc / doc token count; idf = ln(N / df_t)
    (plain quotient — no smoothing — so the formula is portable to any
    SQL oracle). Pure DataFrame ops: explode → two aggregations → join.

    Scale notes: the per-term document-frequency table scales with the
    VOCABULARY (billions of distinct terms on a web corpus), so it is
    joined on ``term`` — a natural shuffle key — with no broadcast hint;
    AQE still broadcasts it when it genuinely fits. ``n_docs`` is a
    lazy 1-row aggregate cross-joined in (single scalar broadcast), not
    an eager driver ``.first()`` job, so the whole pipeline stays one
    Spark job.
    """
    toks = _tokens(text_col)
    # _outer + null filter: avoids the inferred pre-Generate filter that
    # would run the tokenizing split twice more per row (see
    # ext/dedup.py banding comment); the whitespace split of a non-null
    # string is never empty, and null text reduces to the same drop.
    # doc_len = size(tokens), computed ROW-LOCAL before the explode and
    # carried through the (id, term) shuffle as one extra int — the
    # earlier formulation re-aggregated doc_terms by id and joined the
    # lengths back on, a whole corpus-scale shuffle just to recover a
    # number the scan already knew. The token ARRAY must be a named
    # column before size()/explode() touch it: inlining the split into
    # both consumers makes Catalyst hoist size(split(text)) ABOVE the
    # Generate, re-running the tokenizer once per OUTPUT token
    # (O(tokens²) per doc — measured 6x slower); referencing one
    # attribute keeps the split at once per document and size() at O(1).
    base = df.select(F.col(id_col), F.expr(toks).alias("__toks"))
    exploded = base.select(
        F.col(id_col),
        F.size("__toks").alias("doc_len"),
        F.explode_outer("__toks").alias("term"),
    ).filter(F.col("term").isNotNull())
    doc_terms = exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("term_count"),
        F.first("doc_len").alias("doc_len"),
    )
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("n_docs"))
    # df_t as a COUNT WINDOW over term instead of a groupBy("term") +
    # self-join: doc_terms is unique on (id, term) by construction, so
    # count(*) over (partition by term) equals countDistinct(id) per
    # term — same BIGINT, same tfidf bits. The round-9 join form could
    # not reuse the doc_terms exchange across the two sides (Spark
    # plans self-join sides independently), so the scan + tokenizer +
    # explode + (id, term) aggregation ran TWICE over the corpus; the
    # window form runs them once and adds only the term-partition
    # shuffle the join side needed anyway (plan: 4 Exchange + 2
    # Generate -> 3 Exchange + 1 Generate, guide §2.4).
    w_term = Window.partitionBy("term")
    return (
        doc_terms.withColumn("df_t", F.count(F.lit(1)).over(w_term))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (
                (F.col("term_count") / F.col("doc_len"))
                * F.log(F.col("n_docs") / F.col("df_t"))
            ).alias("tfidf"),
        )
    )


def chunk_count_expr(n_tokens: str, chunk_tokens: int = 32, stride: int = 24) -> str:
    """Number of overlapping token-window chunks for a document with
    ``n_tokens`` tokens (engine-neutral arithmetic — used by
    chunk_documents and by accounting queries that must agree with it
    without exploding)."""
    return (
        f"greatest(1, CAST(ceil((CAST({n_tokens} AS DOUBLE) - {chunk_tokens}) "
        f"/ {stride}) AS BIGINT) + 1)"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the unit-of-work splitter for
    training pipelines (context windows with ``chunk_tokens - stride``
    token overlap).

    chunk i covers tokens [i*stride, i*stride + chunk_tokens); a short
    document yields exactly one chunk. Pure JVM array ops (sequence +
    slice + posexplode): the fan-out is row-local, no shuffle at all —
    the ideal 100 TB shape (map-only, scales with input splits).
    """
    # token array materialized as a named column: the slice inside the
    # per-chunk lambda then reads an attribute — an inlined split would
    # re-tokenize once per chunk (see ngram_lm_score's pair builder,
    # measured 10x on the bigram case)
    n_chunks = chunk_count_expr("size(__toks)", chunk_tokens, stride)
    chunks = (
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> concat_ws(' ', slice(__toks, i * {stride} + 1, {chunk_tokens})))"
    )
    # posexplode_outer + null filter: keeps the chunking expression out
    # of an inferred pre-Generate filter (it would be evaluated 3x per
    # row; see ext/dedup.py banding comment). The transform always
    # yields >= 1 chunk for non-null text. NULL text is filtered at the
    # SOURCE (pushed to the scan): inside the transform, concat_ws
    # renders a NULL token slice as '' — one spurious empty chunk that
    # the chunk_text null filter cannot catch (gen_fuzz finding).
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.expr(_tokens(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.posexplode_outer(F.expr(chunks)).alias("chunk_idx", "chunk_text"),
        )
        .filter(F.col("chunk_text").isNotNull())
        .withColumn(
            "chunk_n_tokens", F.expr("CAST(size(split(chunk_text, ' ')) AS BIGINT)")
        )
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 90,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """The end-to-end training-corpus selection pipeline as one
    operator: quality gates (token-count band + distinct-token ratio)
    then exact dedup keeping the lowest id per identical text.

    Shape at scale: the gates are map-only predicates evaluated in the
    scan stage (pushdown-friendly), and the only shuffle is the dedup
    hash-groupBy — the minimum any exact dedup needs. Composes from the
    oracle-checked quality + dedup primitives, so it is itself
    oracle-checkable.
    """
    scored = with_quality_scores(with_token_count(df, text_col), text_col)
    filtered = scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    )
    from bq_duckdb_spark.ext.dedup import exact_dedup

    keep = exact_dedup(filtered, [text_col], id_col)
    return keep.select(id_col, "n_tokens", "stopword_ratio", "distinct_ratio")


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    shingle_k: int = 4,
    hash: str = "xxhash64",
) -> DataFrame:
    """Document fingerprint: min-of-rolling-window hashes (winnowing-style
    min selection over token k-gram hashes) — a stable content id robust
    to small edits at the document tail.

    ``hash`` picks the k-gram hash family; min-selection semantics are
    identical either way:
    - ``"xxhash64"`` (default): JVM codegen'd, the fast path;
    - ``"poly"``: a portable char-polynomial ``h = (h*131 + code) mod
      (2^31 - 1)`` that any engine reproduces in plain 64-bit integer
      arithmetic — this is what lets the contract entry carry a full
      DuckDB oracle. Weaker (31-bit) but collision quality is irrelevant
      for a min-of-window content id.
    """
    # named token-array column so the shingle lambda slices an attribute
    # instead of re-running the split per k-gram (O(tokens²) otherwise)
    shingles = (
        f"CASE WHEN size(__toks) < {shingle_k} THEN array(concat_ws(' ', __toks)) "
        f"ELSE transform(sequence(0, size(__toks) - {shingle_k}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {shingle_k}))) END"
    )
    if hash == "poly":
        gram_hash = (
            "aggregate(split(s, ''), CAST(0 AS BIGINT), "
            "(h, c) -> (h * 131 + ascii(c)) % 2147483647)"
        )
    else:
        gram_hash = "xxhash64(s)"
    return (
        df.withColumn("__toks", F.expr(_tokens(text_col)))
        .withColumn(
            "fingerprint",
            F.expr(f"array_min(transform({shingles}, s -> {gram_hash}))"),
        )
        .drop("__toks")
    )


def ngram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model quality score — CCNet-style perplexity
    filtering (Wenzek et al. 2020): train add-one-smoothed bigram counts
    on the corpus itself, then score every document by its mean bigram
    log-probability ``avg ln((c(w1,w2) + 1) / (c(w1) + V))``.  Low
    scores mark incoherent/boilerplate text; a real pipeline thresholds
    or quantile-curates on this column (compose with
    ``pipeline.quantile_curate``).  Documents with fewer than two
    tokens carry no bigram evidence and are dropped.

    Scale notes (100 TB): the corpus-scale bigram stream crosses an
    exchange exactly TWICE — once collapsed to per-doc bigram counts
    (id, w1, w2, k), once joined to the model on (w1, w2) — and never
    again: context counts c(w1) and the continuation vocabulary V
    re-aggregate the (w1, w2) count table (vocabulary-sized), and c1
    is pre-joined INTO the model table (a vocab⋈vocab join) instead of
    re-shuffling the corpus by w1 (an earlier formulation paid that
    whole extra corpus pass; measured 11.6 s → ~7 s at sf0.1).  The
    per-doc score is the k-weighted mean, identical arithmetic to the
    per-instance mean up to summation order.  Model joins use their
    natural keys with no broadcast hint — the vocabulary of a web
    corpus does not fit an executor, and AQE still broadcasts when it
    genuinely does.  V is a lazy 1-row aggregate cross-joined in
    (scalar broadcast), never a driver job.
    """
    # guarded pair build: sequence(0, size-2) would generate a DESCENDING
    # sequence for 1-token docs, so gate on size >= 2; explode_outer +
    # null post-filter per the InferFiltersFromGenerate pitfall. The
    # token array is materialized as a named column FIRST: `__toks[i]`
    # inside the lambda then indexes an attribute — inlining the split
    # re-runs the tokenizer once per bigram, O(tokens²) per document
    # (measured 10x slower at sf0.1).
    pairs = (
        "CASE WHEN size(__toks) < 2 THEN array() "
        "ELSE transform(sequence(0, size(__toks) - 2), "
        "i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2)) END"
    )
    bg = (
        df.select(F.col(id_col), F.expr(_tokens(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode_outer(F.expr(pairs)).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(id_col, "p.w1", "p.w2")
    )
    # per-doc bigram counts: repeated bigrams collapse BEFORE any join,
    # so everything downstream moves (doc, distinct-bigram) rows
    bgd = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    c2 = bgd.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    # context counts and vocabulary from the pair-count table: sum of a
    # context's pair counts IS its bigram-context count, and distinct
    # continuations are already unique per (w1, w2) row
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = c2.select("w2").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    model = c2.join(c1, "w1")  # vocabulary-sized on both sides
    logp = F.log(
        (F.col("c2") + F.lit(1)).cast("double")
        / (F.col("c1") + F.col("v")).cast("double")
    )
    return (
        bgd.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            (F.sum(F.col("k") * logp) / F.sum("k")).alias("avg_logprob"),
        )
    )


def _ngrams(text_col: str, n: int, tokens: str | None = None) -> str:
    """Word n-grams as strings: sliding windows joined by single spaces
    (so differing whitespace runs canonicalize to the same n-gram).
    ``tokens`` names a MATERIALIZED token-array column; without it the
    split is inlined into the lambda and re-runs per n-gram (O(tokens²)
    per doc — hot-path callers must materialize first)."""
    toks = tokens or _tokens(text_col)
    return (
        f"transform(sequence(1, greatest(1, size({toks}) - {n - 1})), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))"
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with the evaluation set — the standard guard against
    test-set leakage into training data. Returns
    ``(id_col, n_hits)`` for contaminated documents only
    (``n_hits`` = number of DISTINCT shared n-grams).

    Scale: the eval side is benchmark-sized (thousands of documents),
    so its distinct n-gram set is broadcast — the corpus-side explode
    then joins map-side with ZERO corpus shuffles; the per-doc count is
    a partial-agg groupBy on ``id_col``. A corpus-scale eval set would
    flip the broadcast hint to a plain shuffle join; nothing else
    changes.
    """
    grams = _ngrams(text_col, n, tokens="__toks")
    tok_expr = F.expr(_tokens(text_col)).alias("__toks")
    ev = (
        eval_set.select(tok_expr)
        .select(F.explode_outer(F.expr(grams)).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    body = (
        corpus.select(F.col(id_col), tok_expr)
        .select(F.col(id_col), F.explode_outer(F.expr(grams)).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()  # count each shared gram once per doc
    )
    return (
        body.join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def balance_corpus(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    per_group: int = 100,
) -> DataFrame:
    """Deterministic per-group downsampling: keep at most ``per_group``
    rows per group, chosen by a multiplicative hash of the id (a stable
    pseudo-random order — re-running on a grown corpus keeps a
    consistent sample, unlike ``ORDER BY rand()``). The language-
    balancing step of corpus assembly.

    One shuffle (the per-group window); the hash sort key is computed
    map-side. Skewed groups are exactly the case AQE's skew-join can't
    help a window with, so at 100 TB you'd pre-filter obviously-over-
    quota groups with a cheap count first; the operator itself stays
    correct either way.
    """
    h = f"({id_col} * 2654435761) % 4294967296"
    w = Window.partitionBy(group_col).orderBy(F.expr(h), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_group)
        .drop("__rn")
    )


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting lists: ``(term, df_t, postings)`` where postings is the
    comma-joined sorted list of doc ids containing the term. The
    retrieval-side inverse of tf_idf's doc-term table.

    Scale: one explode + one groupBy(term) shuffle; the posting list is
    built by array_sort(collect_list(...)) per term, bounded by document
    frequency — a web-scale index would cap/page the hottest terms
    (stopword df ~ N), which is a straight ``slice`` after the sort.
    """
    toks = _tokens(text_col)
    exploded = (
        df.select(F.col(id_col), F.explode_outer(F.expr(toks)).alias("term"))
        .filter(F.col("term").isNotNull())
        .distinct()
    )
    return exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t"),
        F.expr(
            f"concat_ws(',', transform(array_sort(collect_list({id_col})), "
            f"x -> CAST(x AS STRING)))"
        ).alias("postings"),
    )
