"""Retrieval / model-inference operators for training-data pipelines:
BM25 keyword scoring, hashed-linear (fastText-style) classifier
inference, and random-projection dimensionality reduction.

These extend the corpus surface beyond the reference's SQL operators
(reference has no retrieval layer at all — its closest surface is the
aggregate pipeline in src/executor/, which these reuse Spark-side as
plain groupBy/join plans).

Scale design:
- BM25 filters the exploded token stream to the query's terms BEFORE any
  aggregation, so every shuffle is proportional to query-term matches,
  not corpus vocabulary; document length is a row-local expression (no
  second explode); corpus statistics (avgdl, N) are 1-row aggregates
  broadcast via crossJoin, never driver-side ``.first()`` jobs.
- Classifier inference and random projection are MAP-ONLY (zero
  shuffles): the ideal 100 TB shape — throughput scales with input
  splits and nothing else.
- The classifier's feature hash and the projection's sign matrix are
  engine-neutral expression builders (one definition of the arithmetic
  serves both the Spark operator and the DuckDB oracle — drift between
  them would be a bug in exactly one place; see ext/dedup_portable.py).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_duckdb_spark.ext.dedup_portable import P, char_poly_expr
from bq_duckdb_spark.ext.text import _tokens

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms.

    idf uses the Lucene form ``ln(1 + (N - df + 0.5) / (df + 0.5))``
    (always positive, saturates for rare terms). Returns one row per
    document containing at least one query term: ``(id_col, bm25)``.

    Scale: the exploded token stream is filtered to ``query_terms``
    before the (id, term) count — the only vocabulary-sized shuffle a
    naive formulation would pay is avoided entirely, and the surviving
    frames are bounded by match counts, which AQE happily broadcasts.
    ``doc_len`` is ``size(tokens)`` computed row-local on the base scan
    (no second explode); ``avgdl``/``N`` are 1-row aggregates crossJoin-
    broadcast so the whole plan is one Spark job.
    """
    toks = _tokens(text_col)
    lens = df.select(
        F.col(id_col), F.expr(f"CAST(size({toks}) AS DOUBLE)").alias("doc_len")
    )
    avg = lens.agg(
        F.avg("doc_len").alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    qlit = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    matched = (
        df.select(F.col(id_col), F.explode_outer(F.expr(toks)).alias("term"))
        .filter(F.expr(f"term IN ({qlit})"))
    )
    doc_tc = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tc")
    )
    term_df = doc_tc.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    idf = "ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))"
    tf_part = f"tc * ({k1} + 1.0) / (tc + {k1} * (1.0 - {b} + {b} * doc_len / avgdl))"
    return (
        doc_tc.join(term_df, "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(avg))
        .withColumn("__s", F.expr(f"({idf}) * ({tf_part})"))
        .groupBy(id_col)
        .agg(F.sum("__s").alias("bm25"))
    )


# ---------------------------------------------------------------------------
# hashed-linear classifier inference
# ---------------------------------------------------------------------------


def classifier_weight_coeffs(seed: int = 7) -> tuple[int, int]:
    """Deterministic affine coefficients for the bucket→weight map."""
    rng = random.Random(seed)
    return rng.randrange(1, P), rng.randrange(P)


def classifier_score_expr(
    text_col: str, n_buckets: int, engine: str, seed: int = 7
) -> str:
    """Mean hashed-feature weight of a document's tokens — the linear
    score of a fastText-style bag-of-buckets model, as ONE expression
    valid in the target engine.

    ``h(tok) = char_poly(tok) mod n_buckets``;
    ``w(u) = ((a*u + c) mod P) / P - 0.5`` — a fixed pseudo-random
    weight table evaluated analytically instead of materialized, so
    inference needs no model broadcast at all. A trained model would
    replace ``w`` with an ``element_at`` into a broadcast weight array;
    the plan shape (map-only, zero shuffle) is identical.
    """
    a, c = classifier_weight_coeffs(seed)
    if engine == "spark":
        toks = f"split(trim({text_col}), '\\\\s+')"
        h = char_poly_expr("t", "spark")
        return (
            f"aggregate(transform({toks}, "
            f"t -> ((({h}) % {n_buckets}) * {a} + {c}) % {P} / CAST({P} AS DOUBLE) - 0.5), "
            f"CAST(0 AS DOUBLE), (s, w) -> s + w, "
            f"s -> s / size({toks}))"
        )
    toks = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    h = char_poly_expr("t", "duckdb")
    return (
        f"list_sum(list_transform({toks}, "
        f"t -> ((({h}) % {n_buckets}) * {a} + {c}) % {P} / CAST({P} AS DOUBLE) - 0.5)) "
        f"/ len({toks})"
    )


def classify_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """fastText-style inference: ``(id, prob, label)`` via a logistic
    over the mean hashed-feature weight. Map-only — no shuffle, no UDF,
    whole-stage codegen end to end; the 100 TB cost is exactly one scan.
    """
    score = classifier_score_expr(text_col, n_buckets, "spark", seed)
    return df.select(
        F.col(id_col),
        F.expr(f"1.0 / (1.0 + exp(-10.0 * ({score})))").alias("prob"),
    ).withColumn("label", (F.col("prob") >= 0.5).cast("int"))


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def projection_signs(in_dim: int, out_dim: int, seed: int = 11) -> list[list[int]]:
    """Deterministic Achlioptas ±1 sign matrix (out_dim × in_dim)."""
    rng = random.Random(seed)
    return [
        [rng.choice((1, -1)) for _ in range(in_dim)] for _ in range(out_dim)
    ]


def projection_exprs(
    vec_col: str, in_dim: int, out_dim: int, engine: str, seed: int = 11
) -> list[str]:
    """One fixed-order sum expression per output dimension:
    ``p_j = sum_i sign[j][i] * v[i] / sqrt(out_dim)``.

    The sum order is identical in both engines (left-to-right fold of
    the same literal expression), and ± sums of doubles carry no libm
    dependence — the Spark result and the DuckDB oracle agree bitwise,
    no rounding tolerance needed.
    """
    el = (
        (lambda i: f"CAST(element_at({vec_col}, {i}) AS DOUBLE)")
        if engine == "spark"
        else (lambda i: f"CAST({vec_col}[{i}] AS DOUBLE)")
    )
    scale = 1.0 / math.sqrt(out_dim)
    signs = projection_signs(in_dim, out_dim, seed)
    out = []
    for j in range(out_dim):
        terms = " + ".join(
            (el(i + 1) if signs[j][i] > 0 else f"(0.0 - {el(i + 1)})")
            for i in range(in_dim)
        )
        out.append(f"({terms}) * {scale!r}")
    return out


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> DataFrame:
    """Johnson–Lindenstrauss sketch: project ``in_dim`` embeddings to
    ``out_dim`` columns ``p0..p{out_dim-1}`` with a deterministic ±1
    matrix. Map-only (zero shuffle); the projected table is the cheap
    stand-in for the full embedding column in distance-based pipelines
    (cluster assignment, coarse filtering) at 1/8th the width.
    """
    exprs = projection_exprs(vec_col, in_dim, out_dim, "spark", seed)
    return df.select(
        F.col(id_col),
        *[F.expr(e).alias(f"p{j}") for j, e in enumerate(exprs)],
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def feature_buckets_expr(text_col: str, n_buckets: int, engine: str) -> str:
    """Hashed unigram+bigram feature buckets of a document as ONE
    array expression for the target engine (the DSIR feature map:
    Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — public). Occurrences, not distinct: the weight of a
    repeated n-gram counts every time."""
    if engine == "spark":
        toks = f"split(trim({text_col}), '\\\\s+')"
        uni = f"transform(__t, t -> ({char_poly_expr('t', 'spark')}) % {n_buckets})"
        big = (
            f"CASE WHEN size(__t) < 2 THEN CAST(array() AS ARRAY<BIGINT>) "
            f"ELSE transform(sequence(1, size(__t) - 1), i -> "
            f"({char_poly_expr('concat(element_at(__t, i), chr(32), element_at(__t, i + 1))', 'spark')})"
            f" % {n_buckets}) END"
        )
        # one-shot: bind the token array once via a lambda-let (transform
        # over a single-element array), avoiding three re-splits
        return (
            f"flatten(transform(array({toks}), "
            f"__t -> concat({uni}, {big})))"
        )
    toks = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    uni = f"list_transform(__t, t -> ({char_poly_expr('t', 'duckdb')}) % {n_buckets})"
    # the bigram loop variable must NOT be named ``i``: char_poly_expr's
    # DuckDB form internally binds a lambda ``i``, which would capture
    # the outer index inside substr() and hash the wrong characters
    # (silent wrong buckets, found by oracle mismatch)
    big = (
        f"CASE WHEN len(__t) < 2 THEN []::BIGINT[] "
        f"ELSE list_transform(range(1, len(__t)), __bi -> "
        f"({char_poly_expr('concat(__t[__bi], chr(32), __t[__bi + 1])', 'duckdb')})"
        f" % {n_buckets}) END"
    )
    return (
        f"flatten(list_transform([{toks}], "
        f"__t -> list_concat({uni}, {big})))"
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document importance weight for target-distribution selection:
    ``weight(d) = Σ_{f ∈ features(d)} ln p̂_target(f) − ln p̂_bg(f)``
    with Laplace-smoothed hashed-n-gram bucket probabilities. Returns
    ``(id_col, dsir)``; resampling keeps the top-weight (or
    Gumbel-top-k) slice.

    Scale: the weight table has at most ``n_buckets`` rows — broadcast
    — so the corpus side is explode → map-side join → one groupBy
    shuffle on ``id_col``. Bucket counts are one aggregation per corpus;
    totals are 1-row aggregates folded in via crossJoin broadcast (no
    driver jobs)."""
    feats = feature_buckets_expr(text_col, n_buckets, "spark")

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        ex = df.select(F.explode_outer(F.expr(feats)).alias("bucket")).filter(
            F.col("bucket").isNotNull()
        )
        return ex.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

    # lazy localCheckpoint: the count tables are <= n_buckets rows, but
    # WITHOUT it Spark plans every reference independently — the totals
    # re-ran the full corpus explode+aggregate a second time (5 parquet
    # scans / 4 feature explodes in plans/r11/corpus_dsir_before.txt,
    # zero ReusedExchange). Checkpointed, each corpus is featurized once
    # for counting; totals and the weight join read the materialized
    # 4096-row tables.
    # the corpus itself is featurized ONCE into a checkpointed
    # (id, bucket) table: background counts and the per-doc scoring
    # join both read it instead of re-running the explode
    bfeat = (
        corpus.select(F.col(id_col), F.explode_outer(F.expr(feats)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .localCheckpoint(eager=False)
    )
    tc = bucket_counts(target, "n_t").localCheckpoint(eager=False)
    bc = (
        bfeat.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_b"))
        .localCheckpoint(eager=False)
    )
    totals = (
        tc.agg(F.sum("n_t").cast("double").alias("tot_t"))
        .crossJoin(bc.agg(F.sum("n_b").cast("double").alias("tot_b")))
    )
    s, bb = float(smoothing), float(n_buckets)
    weights = (
        tc.join(bc, "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"ln((coalesce(n_t, 0) + {s}) / (tot_t + {s} * {bb}))"
                f" - ln((coalesce(n_b, 0) + {s}) / (tot_b + {s} * {bb}))"
            ).alias("w"),
        )
    )
    return (
        bfeat.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w").alias("dsir"))
    )


# ---------------------------------------------------------------------------
# distributed logistic-regression training (full-batch gradient descent)
# ---------------------------------------------------------------------------


def _half_up(x: float, q: int) -> float:
    import math as _m

    return _m.floor(x * 10**q + 0.5) / 10**q


def train_logreg(
    df: DataFrame,
    label_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    quantize: int = 6,
) -> list[float]:
    """Train a logistic-regression quality classifier over hashed
    bag-of-words features with full-batch gradient descent — the
    TRAINING side of classify_documents' inference shape (fastText-like
    linear model; how production quality filters are actually fit on
    the corpus they will filter).

    Model: x_{d,b} = (occurrences of bucket b in doc d) / n_tokens_d,
    score_d = Σ_b x_{d,b}·w_b, and per iteration
    ``w ← w − lr · (1/N) Σ_d (σ(score_d) − y_d) · x_d``.

    Scale shape (the pagerank/kmeans pattern): the weight vector is
    driver-sized BY DEFINITION (the model), so each iteration inlines
    it as a literal array — scoring is MAP-ONLY (a fold over the doc's
    bucket array, whole-stage codegen) — and the gradient is ONE
    groupBy(bucket) shuffle over the exploded occurrences whose
    map-side partial aggregation caps every partition's exchange
    contribution at n_buckets rows. The tokenized/bucketed corpus is
    prepared once and eagerly localCheckpoint'ed so iterations rescan a
    materialized node-local table instead of re-running the tokenizer.

    Determinism (what makes the DuckDB oracle possible — unusual for
    SGD, standard here: fixed full-batch iteration order-free math):
    w0 = 0, and every update is quantized half-up to ``quantize``
    decimals, so cross-engine summation-order ulps in the gradient
    cannot compound across iterations. Returns the trained weights as
    a plain list (bucket b's weight at index b).
    """
    poly = char_poly_expr("t", "spark")
    # NULL-text docs carry no features; the oracle's unnest silently
    # drops them from feat but Spark's count() would still include them
    # in the 1/N divisor — filter them on BOTH sides (gen_fuzz finding)
    prep = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.expr(label_expr).cast("double").alias("y"),
            F.expr(_tokens(text_col)).alias("__toks"),
        )
        .select(
            id_col,
            "y",
            F.expr(f"transform(__toks, t -> ({poly}) % {n_buckets})").alias(
                "buckets"
            ),
            F.expr("CAST(size(__toks) AS DOUBLE)").alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = float(prep.count())
    w = [0.0] * n_buckets
    for _ in range(iters):
        w_lit = "array(" + ", ".join(f"{x!r}D" for x in w) + ")"
        grads = (
            prep.withColumn(
                "score",
                F.expr(
                    f"aggregate(buckets, 0D, "
                    f"(s, b) -> s + element_at({w_lit}, CAST(b AS INT) + 1)) / n"
                ),
            )
            .withColumn("r", F.expr("1.0 / (1.0 + exp(-score)) - y"))
            .select(F.explode("buckets").alias("b"), (F.col("r") / F.col("n")).alias("g"))
            .groupBy("b")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        for row in grads:
            w[row.b] = _half_up(w[row.b] - lr * float(row.g) / n_docs, quantize)
    return w


def logreg_oracle_sql(
    label_sql: str,
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    quantize: int = 6,
) -> str:
    """The SAME init/score/gradient/update recurrence unrolled as
    chained MATERIALIZED DuckDB CTEs (generated by one loop, pagerank
    pattern): the oracle pins the recurrence, not a copy of it."""
    poly = char_poly_expr("t", "duckdb")
    q = 10**quantize
    parts = [
        # tokenize ONCE per document into its own materialized CTE:
        # putting len(regexp_split(..)) next to the unnest re-splits the
        # whole document once per TOKEN row — O(tokens x doc_len) per
        # document, the hostile-corpus oracle-timeout shape
        "WITH tokd AS MATERIALIZED (",
        "    SELECT doc_id,",
        f"           CAST({label_sql} AS DOUBLE) AS y,",
        r"           regexp_split_to_array(trim(text), '\s+') AS toks",
        "    FROM documents WHERE text IS NOT NULL",
        "),",
        "feat AS MATERIALIZED (",
        "    SELECT doc_id, y, n,",
        f"           ({poly}) % {n_buckets} AS b",
        "    FROM (",
        "        SELECT doc_id, y,",
        "               CAST(len(toks) AS DOUBLE) AS n,",
        "               unnest(toks) AS t",
        "        FROM tokd",
        "    )",
        "),",
        "nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM feat),",
        f"w0 AS MATERIALIZED (SELECT CAST(r.range AS BIGINT) AS b, 0.0 AS w FROM range(0, {n_buckets}) r),",
    ]
    d_lr = repr(float(lr))
    for i in range(1, iters + 1):
        prev = f"w{i - 1}"
        parts += [
            f"s{i} AS MATERIALIZED (",
            "    SELECT f.doc_id, any_value(f.y) AS y, any_value(f.n) AS n,",
            "           sum(w.w) / any_value(f.n) AS score",
            f"    FROM feat f JOIN {prev} w USING (b) GROUP BY f.doc_id",
            "),",
            f"g{i} AS MATERIALIZED (",
            "    SELECT f.b, sum((1.0 / (1.0 + exp(-s.score)) - s.y) / f.n) AS g",
            f"    FROM feat f JOIN s{i} s USING (doc_id) GROUP BY f.b",
            "),",
            f"w{i} AS MATERIALIZED (",
            f"    SELECT p.b, floor((p.w - {d_lr} * COALESCE(g.g, 0.0) / nn.n_docs) * {q} + 0.5) / {q} AS w",
            f"    FROM {prev} p LEFT JOIN g{i} g USING (b) CROSS JOIN nn",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT b AS bucket, w AS weight FROM w{iters}")
    return "\n".join(parts)


def apply_logreg(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents under a train_logreg model: ``(id, prob, label)``.

    Same map-only shape as classify_documents — the weight vector is a
    literal array (driver-sized by definition), the score a codegen'd
    fold over the doc's hashed buckets; at 100 TB the cost is exactly
    one scan, zero shuffles."""
    n_buckets = len(weights)
    poly = char_poly_expr("t", "spark")
    w_lit = "array(" + ", ".join(f"{x!r}D" for x in weights) + ")"
    score = (
        f"aggregate(transform(split(trim({text_col}), '\\\\s+'), "
        f"t -> element_at({w_lit}, CAST(({poly}) % {n_buckets} AS INT) + 1)), "
        f"0D, (s, w) -> s + w, "
        f"s -> s / size(split(trim({text_col}), '\\\\s+')))"
    )
    return df.select(
        F.col(id_col),
        F.expr(f"1.0 / (1.0 + exp(-({score})))").alias("prob"),
    ).withColumn("label", (F.col("prob") >= 0.5).cast("int"))


def hard_negatives(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    sim_lo: float = 0.0,
    sim_hi: float = 0.95,
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query,
    the ``k`` MOST similar index vectors inside the band
    ``[sim_lo, sim_hi)`` — above ``sim_hi`` is a near-duplicate or the
    positive itself (training on it teaches the model nothing or the
    wrong thing), below ``sim_lo`` is an easy negative the model
    already separates. Deterministic (fixed centroids, exact cosine,
    id tie-break), so mined batches are reproducible across retries —
    the property that matters when a 1000-way training job re-runs one
    failed shard.

    Scale shape is ann_join's (ext/similarity.py): map-only cell
    assignment, equi-join on cell, band filter BEFORE the per-query
    top-k window."""
    from bq_duckdb_spark.ext.similarity import ann_join

    return ann_join(
        queries,
        index,
        centroids,
        k=k,
        nprobe=nprobe,
        vec_col=vec_col,
        sim_lo=sim_lo,
        sim_hi=sim_hi,
    )


# ---------------------------------------------------------------------------
# rank fusion
# ---------------------------------------------------------------------------


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion of any number of (id, rank) lists:
    score(d) = Σ_lists 1 / (k + rank_list(d)), absent-from-list terms
    contributing nothing (Cormack et al.'s parameter-free fusion — the
    standard way to combine lexical and dense retrievers).

    Shape: union of the (already top-N-truncated) lists → ONE groupBy
    on the id. The inputs are ranked candidate lists, bounded by their
    own top-N, so every stage here is candidate-sized, never
    corpus-sized.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out = ranked[0].select(id_col, rank_col)
    for r in ranked[1:]:
        out = out.unionByName(r.select(id_col, rank_col))
    return out.groupBy(id_col).agg(
        F.sum(F.expr(f"CAST(1.0 AS DOUBLE) / ({k} + {rank_col})")).alias("rrf"),
        F.count(F.lit(1)).alias("n_lists"),
    )


def ranked_topn(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """(id, rank) for the top-N of a scored frame — the list shape
    rrf_fuse consumes. Ranks order by the 4dp-ROUNDED score with an id
    tiebreak: rounded scores are what cross-engine oracles can pin
    exactly, so two engines building this list order identically. The
    truncation compiles to TakeOrderedAndProject; the rank window then
    runs over the N survivors, never the corpus."""
    top = (
        df.withColumn("__r4", F.round(score_col, 4))
        .orderBy(F.desc("__r4"), id_col)
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("__r4"), id_col)
    return top.withColumn("rank", F.row_number().over(w)).select(id_col, "rank")


def tfidf_query_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF cosine of each document against a bag-of-terms query
    (unit query weights): Σ_{t∈q} tfidf(d,t) / ‖tfidf(d)‖. The constant
    query-norm factor scales every score equally and is dropped (ranks
    are what retrieval consumes). One tf_idf pipeline feeds both the
    numerator (term-filtered) and the norm (per-doc sum of squares) —
    vocabulary-scale shuffles stay inside tf_idf itself. The two
    branches share lineage, which Spark's runtime exchange reuse
    dedupes where subplans coincide; at warehouse scale the TF-IDF
    table is the thing you materialize at rest once (engine.materialize
    / saveAsTable) and feed to every query, rather than recomputing it
    per search."""
    from bq_duckdb_spark.ext.text import tf_idf

    ti = tf_idf(df, text_col, id_col)
    norms = ti.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("__norm")
    )
    num = (
        ti.filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col)
        .agg(F.sum("tfidf").alias("__num"))
    )
    return num.join(norms, id_col).select(
        id_col, (F.col("__num") / F.col("__norm")).alias("score")
    )
