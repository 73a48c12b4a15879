"""Tier-5 driver-contract entries: embedding clustering (k-means),
ANN quality evaluation (recall@k), weighted corpus sampling,
best-of-cluster dedup survivor selection, and four SQL-surface
wideners (COUNTIF-style conditional aggregation, CUBE + GROUPING,
correlated LATERAL top-k, windowed running distinct count).

Every entry carries a full DuckDB oracle. Scale notes live on the
underlying operators (ext/cluster.py, ext/similarity.py); the
conditional-agg / cube / lateral / window entries are pure Catalyst
plans with no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_duckdb_spark.ext import cluster, retrieval, similarity
from bq_duckdb_spark.ext.contract import (
    _SIM_COSINE_TOPK_ORACLE,
    _lsh_ann_oracle,
    _query_vec,
)
from bq_duckdb_spark.testdata import load_table as _t


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# k-means embedding clustering
# ---------------------------------------------------------------------------


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means assignment of every embedding to one of k=4
    clusters after 2 rounds (deterministic lowest-id init, quantized
    centroid updates — see ext/cluster.py for why a full oracle is
    possible at all). Output is pure integers: (vec_id, cell)."""
    return cluster.kmeans_assign(
        _t(spark, sf_dir, "embeddings"), k=4, iters=2
    )


def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection (2 leading components, quantized power iteration
    with deflation — ext/pca.py): distributed centered-Gram partials
    via mapInPandas, driver-side iteration over the dim^2 model, then a
    map-only JVM projection. The oracle re-derives the full recurrence
    as unrolled DuckDB CTEs, so the per-row (pc1, pc2) values are
    bit-equal across engines — the dimensionality-reduction fit itself
    is value-checked, not just the plumbing."""
    from bq_duckdb_spark.ext import pca

    return pca.pca_project(_t(spark, sf_dir, "embeddings"), k=2)


# ---------------------------------------------------------------------------
# ANN recall evaluation
# ---------------------------------------------------------------------------


def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH-bucketed ANN against the brute-force cosine
    top-10 for the vec_id=0 query — the evaluation loop every ANN
    deployment runs before trusting an index. Both sides are
    deterministic (fixed hyperplanes / exact scan), so the overlap
    count itself is oracle-checkable. One number out: no per-row
    floats, no ordering hazards."""
    qv = _query_vec(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    ann = similarity.lsh_ann_topk(
        emb, qv, dim=len(qv), k=10, nbits=8, max_hamming=1
    ).select("vec_id")
    bf = similarity.cosine_topk(emb, qv, k=10).select("vec_id")
    return ann.join(bf, "vec_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall"),
    )


def _sim_recall_oracle() -> str:
    return f"""
SELECT count(*) AS n_hits, count(*) / 10.0 AS recall
FROM ({_lsh_ann_oracle()}) a
JOIN ({_SIM_COSINE_TOPK_ORACLE}) b USING (vec_id)
"""


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis–Spaggiari A-Res, deterministic)
# ---------------------------------------------------------------------------

_WS_N = 100
# deterministic uniform in (0, 1] from the doc id — a Knuth-style LCG
# step kept inside BIGINT range in both engines (doc_id * 2654435761 ≪
# 2^63 at any realistic corpus size; at true 100 TB id scale swap in a
# 128-bit-safe mixer)
_WS_U = "((doc_id * 2654435761 + 12345) % 2147483647 + 1) / 2147483648.0"


def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement of 100 documents, weight =
    token count: Efraimidis–Spaggiari A-Res (key = ln(u)/w, keep the
    top-n keys) with a seeded hash-uniform u so the draw is
    reproducible across engines and retries.

    Scale: key assignment is map-only; the top-n is
    TakeOrderedAndProject (per-partition n-heaps, no global sort) —
    the same one-pass shape a 100 TB weighted draw needs. ln() is the
    only libm call; it affects selection only within ~1 ulp of the
    rank-n boundary."""
    docs = _t(spark, sf_dir, "documents")
    w = r"CAST(size(split(trim(text), '\\s+')) AS DOUBLE)"
    return (
        docs.withColumn("w", F.expr(w))
        .withColumn("es_key", F.expr(f"ln({_WS_U}) / w"))
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(_WS_N)
        .select("doc_id", F.col("w").cast("bigint").alias("n_tokens"))
    )


_PIPE_WEIGHTED_SAMPLE_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS w
    FROM documents
)
SELECT doc_id, CAST(w AS BIGINT) AS n_tokens
FROM t
ORDER BY ln({_WS_U}) / w DESC, doc_id
LIMIT {_WS_N}
"""


# ---------------------------------------------------------------------------
# best-of-group dedup survivor selection
# ---------------------------------------------------------------------------


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups (normalized text) keeping the BEST member —
    longest, then lowest id — instead of exact_dedup's arbitrary-min
    policy: the survivor-selection step of a production dedup loop,
    where you keep the highest-quality copy. One window shuffle on the
    group key; emits every survivor with its group size."""
    docs = _t(spark, sf_dir, "documents")
    grp = F.lower(F.trim(F.col("text")))
    w = Window.partitionBy(grp).orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("group_sz", F.count(F.lit(1)).over(Window.partitionBy(grp)))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_chars", "group_sz")
    )


_DEDUP_KEEP_BEST_ORACLE = """
SELECT doc_id, n_chars, group_sz FROM (
    SELECT doc_id, n_chars,
           row_number() OVER (PARTITION BY lower(trim(text))
                              ORDER BY n_chars DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY lower(trim(text))) AS group_sz
    FROM documents
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# semantic corners: NOT IN with NULL, exact DECIMAL aggregation
# ---------------------------------------------------------------------------

_Q_NOT_IN_NULL_SQL = """
SELECT
    (SELECT count(*) FROM orders
     WHERE o_custkey NOT IN (SELECT o_custkey FROM orders
                             WHERE o_orderkey < 10
                             UNION ALL SELECT NULL)) AS with_null,
    (SELECT count(*) FROM orders
     WHERE o_custkey NOT IN (SELECT o_custkey FROM orders
                             WHERE o_orderkey < 10)) AS clean
"""


def q_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN + NULL tri-state trap: a NULL in the subquery makes
    the predicate UNKNOWN for every row (with_null = 0), while the
    clean arm filters normally — one ANSI SQL text both engines run
    verbatim, pinning that neither deviates from three-valued logic."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_Q_NOT_IN_NULL_SQL)


def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(18,2) aggregation (BigQuery NUMERIC semantics):
    sums and extremes of money amounts with NO float rounding anywhere
    — the values compare as exact strings. Scale-preserving aggregates
    only (avg widens scale differently per engine, so the money-safe
    pattern is sum/count and divide in the consumer)."""
    orders = _t(spark, sf_dir, "orders")
    # two-step conversion (gen_fuzz finding): a DIRECT double->DECIMAL(18,2)
    # cast is engine-defined on values like 48183.284999999996 (DuckDB
    # renders ~15 significant digits -> .285 -> .29; Spark uses the
    # shortest round-trip string -> .28499... -> .28). At 6dp the two
    # agree for any real-world money double; the 2dp narrowing must
    # then be an EXPLICIT round() — a bare decimal->decimal down-scale
    # cast TRUNCATES in DuckDB (36043.665 -> .66) but rounds half-up in
    # Spark (-> .67). round() is half-away-from-zero in both.
    dec = orders.select(
        "o_orderpriority",
        F.expr(
            "CAST(round(CAST(o_totalprice AS DECIMAL(30,6)), 2) "
            "AS DECIMAL(18,2))"
        ).alias("d"),
    )
    return dec.groupBy("o_orderpriority").agg(
        F.expr("CAST(sum(d) AS STRING)").alias("total"),
        F.expr("CAST(min(d) AS STRING)").alias("lo"),
        F.expr("CAST(max(d) AS STRING)").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


_Q_DECIMAL_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(d) AS STRING) AS total,
       CAST(min(d) AS STRING) AS lo,
       CAST(max(d) AS STRING) AS hi,
       count(*) AS n
FROM (SELECT o_orderpriority,
             CAST(round(CAST(o_totalprice AS DECIMAL(30,6)), 2)
                  AS DECIMAL(18,2)) AS d
      FROM orders)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# STRUCT surface
# ---------------------------------------------------------------------------


def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction, nested field access, and whole-struct
    equality as a predicate (BigQuery STRUCT<> idioms): rows matching a
    struct literal, projected through a nested struct. Map-only."""
    orders = _t(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.expr(
            "named_struct('pri', o_orderpriority, "
            "'money', named_struct('total', o_totalprice, "
            "'big', o_totalprice > 150000))"
        ).alias("s"),
        F.expr(
            "named_struct('st', o_orderstatus, 'pri', o_orderpriority)"
        ).alias("key_s"),
    )
    return nested.filter(
        F.expr("key_s = named_struct('st', 'F', 'pri', '1-URGENT')")
    ).select(
        "o_orderkey",
        F.col("s.pri").alias("pri"),
        F.col("s.money.total").alias("total"),
        F.col("s.money.big").alias("big"),
    )


_Q_STRUCT_FUNCS_ORACLE = """
SELECT o_orderkey, s.pri AS pri, s.money.total AS total, s.money.big AS big
FROM (
    SELECT o_orderkey,
           {'pri': o_orderpriority,
            'money': {'total': o_totalprice, 'big': o_totalprice > 150000}} AS s,
           {'st': o_orderstatus, 'pri': o_orderpriority} AS key_s
    FROM orders
)
WHERE key_s = {'st': 'F', 'pri': '1-URGENT'}
"""


def q_array_agg_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered ARRAY_AGG of structs per group — "top-3 orders by value
    per priority" as the BigQuery ARRAY_AGG(STRUCT(..) ORDER BY ..
    LIMIT 3) idiom. Spark has no ordered collect, so the canonical
    rewrite: collect_list(struct(sort_key, payload)) → array_sort →
    slice — one hash-agg shuffle, the per-group sort bounded by group
    size (a production top-k would pre-prune with a window)."""
    orders = _t(spark, sf_dir, "orders")
    # sort key leads with an is-NULL flag: BigQuery's ORDER BY x DESC
    # puts NULLs LAST, while a bare struct sort would put the NULL 'np'
    # field first (gen_fuzz finding)
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "concat_ws(',', transform(slice(array_sort("
            "collect_list(named_struct("
            "'nn', CAST(o_totalprice IS NULL AS INT), "
            "'np', -coalesce(o_totalprice, 0.0D), 'k', o_orderkey))"
            "), 1, 3), s -> CAST(s.k AS STRING)))"
        ).alias("top3")
    )


_Q_ARRAY_AGG_STRUCT_ORACLE = """
SELECT o_orderpriority,
       array_to_string(
           list(o_orderkey ORDER BY o_totalprice DESC NULLS LAST, o_orderkey)[:3], ','
       ) AS top3
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# token-balanced shard assignment
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 5_000


def pipe_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign curated documents to ~equal-token output shards (the
    delivery step before writing training files): shard_id =
    floor(exclusive running token total / budget) in (source, doc_id)
    order. Distributed exact prefix sum (operators/budget.py), oracle =
    the naive global window."""
    from bq_duckdb_spark.ext.text import with_token_count
    from bq_duckdb_spark.operators.budget import assign_shards

    docs = with_token_count(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_tokens"
    )
    return assign_shards(
        docs,
        [F.col("source"), F.col("doc_id")],
        "n_tokens",
        _SHARD_BUDGET,
    ).select("doc_id", "n_tokens", "shard_id")


_PIPE_SHARD_ASSIGN_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY source NULLS FIRST, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor((cum - n_tokens) / {_SHARD_BUDGET}.0) AS BIGINT) AS shard_id
FROM c
"""


# ---------------------------------------------------------------------------
# stable ID assignment
# ---------------------------------------------------------------------------


def pipe_assign_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0-based int64 ids over (source, doc_id) order — the
    stable-id pass every corpus gets before sharding. Distributed
    prefix-rank (operators/ids.py): range partition + local row_number
    + broadcast offsets, never a SinglePartition window; the oracle is
    the naive global row_number."""
    from bq_duckdb_spark.operators.ids import assign_stable_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_stable_ids(
        docs, [F.col("source"), F.col("doc_id")], out_col="stable_id"
    )


_PIPE_ASSIGN_IDS_ORACLE = """
SELECT doc_id, source,
       row_number() OVER (ORDER BY source NULLS FIRST, doc_id) - 1 AS stable_id
FROM documents
"""


# ---------------------------------------------------------------------------
# BPE application with a fixed merge table
# ---------------------------------------------------------------------------

# a literal merge list exercising chained merges (t+a, l+e, then the
# two-char symbol b+le) — what lets the APPLIER carry a full oracle
# while learned-merge training (text_bpe) stays rows-only by nature
_BPE_MERGES = [("t", "a", 0), ("l", "e", 0), ("b", "le", 0)]


def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization under a FIXED merge table: the deterministic,
    map-only half of the BPE pipeline (ext/bpe.py apply_bpe — k stacked
    JVM folds, zero shuffles), oracle-checked against a DuckDB
    re-implementation generated from the same merge list. Output is the
    '|'-joined subword stream per document."""
    from bq_duckdb_spark.ext.bpe import apply_bpe

    out = apply_bpe(_t(spark, sf_dir, "documents"), _BPE_MERGES)
    return out.select(
        "doc_id", F.concat_ws("|", F.col("bpe_tokens")).alias("bpe_sig")
    )


def _bpe_apply_oracle() -> str:
    from bq_duckdb_spark.ext.bpe import apply_bpe_oracle_expr

    # coalesce: Spark's concat_ws renders a NULL token array as '',
    # the DuckDB fold as NULL (gen_fuzz finding)
    return (
        f"SELECT doc_id, coalesce({apply_bpe_oracle_expr(_BPE_MERGES)}, '') "
        "AS bpe_sig FROM documents"
    )


# ---------------------------------------------------------------------------
# time-series linear interpolation
# ---------------------------------------------------------------------------


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor values per user timeline
    (a deterministic 1-in-5 subset plays the missing values): the gap-
    repair twin of q_gapfill. Neighbors come from IGNORE NULLS window
    lookups — last non-null before, first non-null after — and the fill
    is ``prev + (next − prev)·(ts − ts_prev)/(ts_next − ts_prev)`` on
    exact epoch-microsecond integers, so the arithmetic is bitwise-
    reproducible in any engine (no rounding needed). Boundary gaps
    carry the single available neighbor. Both window specs partition by
    user_id: ONE exchange of events, two in-partition sorts.

    The look-AHEAD neighbors come from a DESCENDING-order running frame,
    not ``rowsBetween(1, unboundedFollowing)``: Spark evaluates an
    unbounded-FOLLOWING frame by re-scanning from each row to the
    partition end — O(rows²) per key, which the adversarial mega-user
    (~150k events on one key) turned into a 420 s+ stall. A growing
    unbounded-PRECEDING frame updates incrementally (O(rows)), and
    ``last(...) IGNORE NULLS`` over the reversed order is exactly
    "first non-null after"."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("IF(event_id % 5 = 0, NULL, value)").alias("v"),
    )
    before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    after_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        ev.withColumn("prev_v", F.last("v", ignorenulls=True).over(before))
        .withColumn(
            "prev_ts",
            F.last(F.when(F.col("v").isNotNull(), F.unix_micros("ts")), ignorenulls=True).over(before),
        )
        .withColumn("next_v", F.last("v", ignorenulls=True).over(after_rev))
        .withColumn(
            "next_ts",
            F.last(F.when(F.col("v").isNotNull(), F.unix_micros("ts")), ignorenulls=True).over(after_rev),
        )
    )
    fill = (
        "CASE WHEN v IS NOT NULL THEN v "
        "WHEN prev_v IS NULL THEN next_v "
        "WHEN next_v IS NULL THEN prev_v "
        # equal-timestamp neighbors (duplicate ts rows exist in real
        # streams; gen_fuzz plants them): the gap has zero duration, so
        # interpolate to the midpoint instead of dividing by zero
        "WHEN next_ts = prev_ts THEN (prev_v + next_v) / 2.0 "
        "ELSE prev_v + (next_v - prev_v) "
        "* (CAST(unix_micros(ts) - prev_ts AS DOUBLE) "
        "/ CAST(next_ts - prev_ts AS DOUBLE)) END"
    )
    return marked.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_missing"),
        F.expr(fill).alias("value_filled"),
    )


_Q_INTERPOLATE_ORACLE = """
WITH ev AS (
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
    FROM events
),
marked AS (
    SELECT event_id, user_id, ts, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
           last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
           first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
    FROM ev
)
SELECT event_id, user_id, v IS NULL AS was_missing,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            WHEN next_ts = prev_ts THEN (prev_v + next_v) / 2.0
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(epoch_us(ts) - prev_ts AS DOUBLE)
                    / CAST(next_ts - prev_ts AS DOUBLE)) END AS value_filled
FROM marked
"""


# ---------------------------------------------------------------------------
# global token-budget selection
# ---------------------------------------------------------------------------

_TB_BUDGET = 20_000


def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a global token budget with the highest-quality documents
    first (quality = distinct-token ratio, ties by doc_id): the
    terminal corpus-assembly step. The running total is the
    distributed exact prefix sum of operators/budget.py — range
    partition + local cumsums + broadcast offsets — never a
    SinglePartition window; the oracle is the equivalent naive global
    window, which DuckDB runs happily single-node."""
    from bq_duckdb_spark.ext.text import with_quality_scores, with_token_count
    from bq_duckdb_spark.operators.budget import take_until_budget

    docs = with_quality_scores(
        with_token_count(_t(spark, sf_dir, "documents"))
    ).select("doc_id", "n_tokens", "distinct_ratio")
    return take_until_budget(
        docs,
        [F.col("distinct_ratio").desc(), F.col("doc_id")],
        "n_tokens",
        _TB_BUDGET,
        out_col="cum_tokens",
    ).select("doc_id", "n_tokens", "cum_tokens")


_PIPE_TOKEN_BUDGET_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
           CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS distinct_ratio
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY distinct_ratio DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= {_TB_BUDGET}
"""


# ---------------------------------------------------------------------------
# distributed classifier training
# ---------------------------------------------------------------------------

_LR_BUCKETS, _LR_ITERS = 64, 3
_LR_LABEL_SPARK = "CAST(coalesce(lang = 'en', false) AS INT)"
_LR_LABEL_DUCK = "coalesce(lang = 'en', false)"


def text_train_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING (full-batch GD over
    hashed bag-of-words, label = is-English) — the fit side of
    text_classify's inference. Deterministic zero-init + quantized
    updates make even SGD oracle-checkable (ext/retrieval.py
    train_logreg); output is the trained weight table, exact-equal in
    both engines because every weight is quantized identically."""
    w = retrieval.train_logreg(
        _t(spark, sf_dir, "documents"),
        _LR_LABEL_SPARK,
        n_buckets=_LR_BUCKETS,
        iters=_LR_ITERS,
    )
    return spark.createDataFrame(
        [(b, x) for b, x in enumerate(w)], "bucket: bigint, weight: double"
    )


# ---------------------------------------------------------------------------
# conditional aggregation (BigQuery COUNTIF)
# ---------------------------------------------------------------------------


def q_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNTIF-style conditional aggregation (BigQuery COUNTIF ==
    Spark count_if == ANSI FILTER clause) — one hash-agg, partial
    map-side combine, no second scan per condition."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("count_if(o_totalprice > 150000)").alias("n_big"),
            F.expr("count_if(o_orderstatus = 'F')").alias("n_finished"),
            F.count(F.lit(1)).alias("n_total"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


_Q_COUNTIF_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) AS n_total,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# CUBE + GROUPING
# ---------------------------------------------------------------------------


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with GROUPING flags — the
    full 2^2 grouping-set lattice in ONE pass (Expand + single
    hash-agg), where the naive formulation scans once per grouping
    set."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n_rows",
            "g_rf",
            "g_ls",
        )
    )


_Q_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       sum(l_quantity) AS sum_qty,
       count(*) AS n_rows,
       grouping(l_returnflag) AS g_rf,
       grouping(l_linestatus) AS g_ls
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# correlated LATERAL top-k
# ---------------------------------------------------------------------------

# one SQL text, two engines: Spark 4 and DuckDB both run the ANSI
# correlated-LATERAL form, so the entry pins identical semantics by
# construction. Spark plans it as a rewritten window/limit per group —
# no driver loop, no per-nation query.
_Q_LATERAL_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 3
) c
"""


def q_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-3 customers by balance per
    nation, the per-group-top-k idiom as a lateral join."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_Q_LATERAL_SQL)


# ---------------------------------------------------------------------------
# windowed running distinct count
# ---------------------------------------------------------------------------


def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT supplier) per part, ordered by ship date
    — neither engine supports DISTINCT window aggregates natively, so
    both use the canonical rewrite: mark each (part, supplier)'s first
    occurrence with row_number, then running-sum the markers.

    ONE exchange for both window specs: an explicit repartition on
    l_partkey produces HashPartitioning(l_partkey), which satisfies
    the (l_partkey, l_suppkey) window's ClusteredDistribution too
    (subset rule), so Spark inserts no second shuffle — only an
    in-partition re-sort between the windows. Left to its own
    devices Spark exchanges twice (exact-key partitioning per spec);
    at 100 TB that is a whole extra pass over lineitem."""
    li = _t(spark, sf_dir, "lineitem").repartition(F.col("l_partkey"))
    first_w = Window.partitionBy("l_partkey", "l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    run_w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.withColumn(
            "first_seen",
            F.when(F.row_number().over(first_w) == 1, 1).otherwise(0),
        )
        .withColumn("n_supps", F.sum("first_seen").over(run_w))
        .select("l_orderkey", "l_linenumber", "l_partkey", "n_supps")
    )


_Q_WINDOW_DISTINCT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_partkey,
       sum(first_seen) OVER (PARTITION BY l_partkey
                             ORDER BY l_shipdate, l_orderkey, l_linenumber
                             ROWS UNBOUNDED PRECEDING) AS n_supps
FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate,
           CASE WHEN row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                        ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
                THEN 1 ELSE 0 END AS first_seen
    FROM lineitem
)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# skyline (Pareto-optimal set)
# ---------------------------------------------------------------------------


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(priority, year) order skyline: maximize o_totalprice,
    minimize o_orderdate — "the high-value orders no earlier order beats
    on both counts". The 2D case is ONE window over one shuffle
    (operators/skyline.py skyline_2d — no dominance join, no UDF); the
    oracle is the definitional NOT EXISTS dominance test, a genuinely
    different algorithm."""
    from bq_duckdb_spark.operators.skyline import skyline_2d

    orders = (
        _t(spark, sf_dir, "orders")
        # a point with a NULL coordinate has no dominance relation —
        # the NOT EXISTS oracle would keep every such row while the
        # window form sorts them arbitrarily (gen_fuzz finding)
        .where(F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull())
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
    )
    return skyline_2d(
        orders, "o_totalprice", "o_orderdate", by=["o_orderpriority", "o_year"]
    ).select("o_orderpriority", "o_year", "o_totalprice", "o_orderdate")


_Q_SKYLINE_ORACLE = """
WITH pts AS (
    SELECT DISTINCT o_orderpriority,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT o_orderpriority, o_year, o_totalprice, o_orderdate
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    -- IS NOT DISTINCT FROM: a NULL priority is a group like any
    -- other (window-partition semantics); plain = would exempt
    -- every NULL-group point from dominance (gen_fuzz finding)
    WHERE q.o_orderpriority IS NOT DISTINCT FROM p.o_orderpriority
      AND q.o_year = p.o_year
      AND q.o_totalprice >= p.o_totalprice AND q.o_orderdate <= p.o_orderdate
      AND (q.o_totalprice > p.o_totalprice OR q.o_orderdate < p.o_orderdate)
)
"""


def q_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-dimensional skyline (maximize l_extendedprice, minimize
    l_discount and l_tax) per returnflag over one quantity/year slice —
    the d > 2 path: per-partition numpy dominance prune, then an exact
    pass over the skyline-sized survivor union
    (operators/skyline.py skyline_nd)."""
    from bq_duckdb_spark.operators.skyline import skyline_nd

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") <= 10)
        & (F.year("l_shipdate") == 1996)
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_tax").isNotNull()
    )
    return skyline_nd(
        li,
        maximize=["l_extendedprice"],
        minimize=["l_discount", "l_tax"],
        by=["l_returnflag"],
    ).select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")


_Q_SKYLINE_3D_ORACLE = """
WITH pts AS (
    SELECT DISTINCT l_returnflag, l_extendedprice, l_discount, l_tax
    FROM lineitem
    WHERE l_quantity <= 10 AND EXTRACT(year FROM l_shipdate) = 1996
      AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
      AND l_tax IS NOT NULL
)
SELECT l_returnflag, l_extendedprice, l_discount, l_tax
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.l_returnflag IS NOT DISTINCT FROM p.l_returnflag
      AND q.l_extendedprice >= p.l_extendedprice
      AND q.l_discount <= p.l_discount AND q.l_tax <= p.l_tax
      AND (q.l_extendedprice > p.l_extendedprice
           OR q.l_discount < p.l_discount OR q.l_tax < p.l_tax)
)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "emb_kmeans": emb_kmeans,
        "emb_pca": emb_pca,
        "sim_recall_eval": sim_recall_eval,
        "pipe_weighted_sample": pipe_weighted_sample,
        "dedup_keep_best": dedup_keep_best,
        "text_train_classifier": text_train_classifier,
        "pipe_token_budget": pipe_token_budget,
        "q_interpolate": q_interpolate,
        "text_bpe_apply": text_bpe_apply,
        "pipe_assign_ids": pipe_assign_ids,
        "pipe_shard_assign": pipe_shard_assign,
        "q_struct_funcs": q_struct_funcs,
        "q_array_agg_struct": q_array_agg_struct,
        "q_not_in_null": q_not_in_null,
        "q_decimal_agg": q_decimal_agg,
        "q_countif": q_countif,
        "q_cube": q_cube,
        "q_lateral": q_lateral,
        "q_window_distinct": q_window_distinct,
        "q_skyline": q_skyline,
        "q_skyline_3d": q_skyline_3d,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "emb_kmeans": cluster.kmeans_oracle_sql(k=4, iters=2, dim=64),
        "emb_pca": __import__("bq_duckdb_spark.ext.pca", fromlist=["pca"]).pca_oracle_sql(k=2),
        "sim_recall_eval": _sim_recall_oracle(),
        "pipe_weighted_sample": _PIPE_WEIGHTED_SAMPLE_ORACLE,
        "dedup_keep_best": _DEDUP_KEEP_BEST_ORACLE,
        "text_train_classifier": retrieval.logreg_oracle_sql(
            _LR_LABEL_DUCK, n_buckets=_LR_BUCKETS, iters=_LR_ITERS
        ),
        "pipe_token_budget": _PIPE_TOKEN_BUDGET_ORACLE,
        "q_interpolate": _Q_INTERPOLATE_ORACLE,
        "text_bpe_apply": _bpe_apply_oracle(),
        "pipe_assign_ids": _PIPE_ASSIGN_IDS_ORACLE,
        "pipe_shard_assign": _PIPE_SHARD_ASSIGN_ORACLE,
        "q_struct_funcs": _Q_STRUCT_FUNCS_ORACLE,
        "q_array_agg_struct": _Q_ARRAY_AGG_STRUCT_ORACLE,
        "q_not_in_null": _Q_NOT_IN_NULL_SQL,
        "q_decimal_agg": _Q_DECIMAL_AGG_ORACLE,
        "q_countif": _Q_COUNTIF_ORACLE,
        "q_cube": _Q_CUBE_ORACLE,
        "q_lateral": _Q_LATERAL_SQL,
        "q_window_distinct": _Q_WINDOW_DISTINCT_ORACLE,
        "q_skyline": _Q_SKYLINE_ORACLE,
        "q_skyline_3d": _Q_SKYLINE_3D_ORACLE,
    }
