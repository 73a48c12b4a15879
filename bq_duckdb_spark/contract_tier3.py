"""Tier-3 driver-contract entries: event-analytics operators (funnel,
cohort retention, time-spine gap fill) and corpus quality scoring via a
bigram language model.  Every entry carries a full DuckDB oracle.

These extend the reference's event-table surface (sessionization was the
only event operator it shipped) with the queries a product-analytics or
training-data team runs daily — all expressed as plain DataFrame
aggregations/joins so Catalyst handles pushdown and AQE handles join
strategy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_duckdb_spark.ext.text import ngram_lm_score
from bq_duckdb_spark.testdata import load_table as _t


# ---------------------------------------------------------------------------
# funnel analysis
# ---------------------------------------------------------------------------


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage funnel: users who viewed, then clicked after their
    first view, then purchased after that click — reported as per-stage
    user counts.

    Scale: each stage is filter → equi-join on ``user_id`` → min-agg on
    the same key, so AQE plans at most one hash partitioning per stage
    and reuses it between the join and the aggregate; stage frames
    shrink monotonically (later joins broadcast when the surviving
    cohort is small)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        stage(v, "1_view").unionAll(stage(c, "2_click")).unionAll(
            stage(p, "3_purchase")
        )
    )


_Q_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS vt FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS ct
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > v.vt
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS pt
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.ct
    GROUP BY e.user_id
)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
"""


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

# Monday anchor for engine-agnostic week bucketing: date_trunc('week')
# semantics differ across SQL dialects (Monday vs Sunday start), so the
# cohort week is computed with day arithmetic both engines share.
_WEEK_ANCHOR = "DATE '1970-01-05'"


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event, counted as active per (cohort week, weeks-since-cohort).

    Scale: two aggregations and one join, all keyed on ``user_id`` —
    one shuffle for the first-seen table, one co-partitioned join, and a
    final (cohort, offset) aggregate whose cardinality is weeks², tiny
    at any corpus size.  The week bucket uses explicit day arithmetic
    (Monday anchor) rather than date_trunc so every engine agrees."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohort = F.expr(
        f"date_sub(d0, CAST(datediff(d0, {_WEEK_ANCHOR}) % 7 AS INT))"
    ).alias("cohort_week")
    offset = F.expr("CAST(datediff(day, d0) DIV 7 AS INT)").alias("week_offset")
    return (
        ev.join(first, "user_id")
        .select(cohort, offset, "user_id")
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
    )


_Q_RETENTION_ORACLE = f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY user_id)
SELECT CAST(d0 - CAST(date_diff('day', {_WEEK_ANCHOR}, d0) % 7 AS INT)
            AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', d0, day) // 7 AS INT) AS week_offset,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active
FROM ev JOIN first USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# time-spine gap fill
# ---------------------------------------------------------------------------


def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event counts with a dense date spine: every day in
    [first event, last event] appears, zero-filled where no events.

    Scale: the spine explodes from the per-user bounds table (one row
    per user → one row per user-day), never from the raw events, and the
    fill join is keyed on (user_id, day) — the same key the daily
    aggregate just shuffled on, so AQE co-partitions it.  Spine size is
    users × days, independent of event volume."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    # bounds guarantee d1 >= d0, so the sequence is never descending;
    # explode_outer skips the InferFiltersFromGenerate re-evaluation
    spine = bounds.select(
        "user_id",
        "d0",
        F.explode_outer(F.expr("sequence(0, datediff(d1, d0))")).alias("i"),
    ).select("user_id", F.expr("date_add(d0, i)").alias("day"))
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        )
    )


_Q_GAPFILL_ORACLE = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
b AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
spine AS (
    SELECT user_id, d0 + CAST(i AS INT) AS day
    FROM b, unnest(range(0, date_diff('day', d0, d1) + 1)) AS r(i)
)
SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
       coalesce(d.n_events, 0) AS n_events
FROM spine s LEFT JOIN daily d USING (user_id, day)
"""


# ---------------------------------------------------------------------------
# bigram-LM quality scoring
# ---------------------------------------------------------------------------


def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM score per document (ext/text.py:
    ngram_lm_score) — the CCNet-style perplexity quality filter."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_lm_score(docs, "text", "doc_id")


_TEXT_PERPLEXITY_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
    FROM documents
),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(range(1, len(t))) AS r(i)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c2)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       avg(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)))
           AS avg_logprob
FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY bg.doc_id
"""


# ---------------------------------------------------------------------------
# z-order (Morton) clustering key
# ---------------------------------------------------------------------------


def _z_interleave_sql(r1: str, r2: str, bits: int) -> str:
    """Bit-interleave expression shared verbatim by both engines —
    plain 64-bit shifts/masks, matching operators/zorder.py's column
    builder (col 0 → even bit positions, col 1 → odd)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({r1} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({r2} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (o_totalprice, o_custkey) — the clustering value
    behind operators/zorder.py's data-skipping layout (the layout
    effect itself is pinned in tests/test_zorder.py; this entry
    oracle-checks the key arithmetic: min/max rank normalization is
    IEEE double math and the interleave is integer shifts, so any
    engine reproduces it bit-for-bit)."""
    from bq_duckdb_spark.operators.zorder import with_zvalue

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return with_zvalue(orders, ["o_totalprice", "o_custkey"], bits=8).select(
        "o_orderkey", "z"
    )


_Q_ZORDER_ORACLE = f"""
WITH b AS (
    SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo1,
           CAST(max(o_totalprice) AS DOUBLE) AS hi1,
           CAST(min(o_custkey) AS DOUBLE) AS lo2,
           CAST(max(o_custkey) AS DOUBLE) AS hi2
    FROM orders
),
r AS (
    SELECT o_orderkey,
           least(greatest(CAST(floor((CAST(o_totalprice AS DOUBLE) - lo1)
               / (hi1 - lo1) * 255.0) AS BIGINT), 0), 255) AS r1,
           least(greatest(CAST(floor((CAST(o_custkey AS DOUBLE) - lo2)
               / (hi2 - lo2) * 255.0) AS BIGINT), 0), 255) AS r2
    FROM orders, b
)
SELECT o_orderkey, {_z_interleave_sql("r1", "r2", 8)} AS z FROM r
"""


# ---------------------------------------------------------------------------
# BPE subword tokenization (iterative trainer → rows-only, pinned in
# tests/test_bpe.py against a pure-Python reference implementation)
# ---------------------------------------------------------------------------


def text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an 8-merge BPE vocabulary on the corpus (ext/bpe.py —
    one word-frequency groupBy, then one pair-count shuffle + 1-row
    argmax per merge), apply it map-only, and report per-document
    subword counts.  FULL oracle: the training loop unrolls into
    DuckDB CTEs (bpe.train_bpe_oracle_sql — pair counts, argmax with
    the trainer's exact tie-break, encoded-fold re-segmentation,
    min_pair_count-guarded rounds = the early stop), so even learned
    merges are value-checked; semantics additionally pinned in
    tests/test_bpe.py."""
    from bq_duckdb_spark.ext.bpe import apply_bpe, train_bpe_merges

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe_merges(docs, n_merges=8)
    # coalesce: a NULL document tokenizes to 0 subwords, matching the
    # oracle's LEFT JOIN + coalesce(sum, 0) shape (gen_fuzz finding)
    return apply_bpe(docs, merges, "text").select(
        "doc_id",
        F.expr("CAST(coalesce(size(bpe_tokens), 0) AS BIGINT)").alias(
            "n_bpe_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# sequence pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------


def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over per-user event streams — the
    MATCH_RECOGNIZE shape (Trino/Flink) reduced to windows: for every
    purchase, the most recent prior click, the most recent view prior
    to THAT click, valid only if no 'error' event fell anywhere between
    the view and the purchase.

    The state machine collapses into three stacked window aggregates
    over ONE per-user ordering (single shuffle, zero buffering):

    - a running error count (``ecum``) turns the "no error between"
      predicate into an integer equality of two anchor counts;
    - a struct-valued running MAX over preceding rows carries the
      latest view anchor (and its ecum) forward;
    - a second struct MAX over clicks carries the latest click anchor
      *together with the view anchor as of that click* — struct
      comparison orders on the leading event_id, so "latest" and
      "carry the payload" are one aggregate.

    Output is pure integers (event ids), so the oracle compare has no
    float or timestamp hazards. The same construction extends to any
    fixed pattern by stacking one struct MAX per step."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    seq = Window.partitionBy("user_id").orderBy("event_id")
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    before = seq.rowsBetween(Window.unboundedPreceding, -1)
    ecum = F.sum(
        F.when(F.col("event_type") == "error", 1).otherwise(0)
    ).over(run)
    staged = ev.withColumn("ecum", ecum).withColumn(
        "lastview",
        F.max(
            F.when(
                F.col("event_type") == "view",
                F.struct(F.col("event_id"), F.col("ecum")),
            )
        ).over(before),
    )
    staged = staged.withColumn(
        "lastclick",
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.struct(F.col("event_id"), F.col("lastview").alias("lv")),
            )
        ).over(before),
    )
    return (
        staged.filter(
            (F.col("event_type") == "purchase")
            & F.col("lastclick.lv").isNotNull()
            & (F.col("ecum") - F.col("lastclick.lv.ecum") == 0)
        )
        .select(
            "user_id",
            F.col("lastclick.lv.event_id").alias("view_id"),
            F.col("lastclick.event_id").alias("click_id"),
            F.col("event_id").alias("purchase_id"),
        )
    )


_Q_EVENT_PATTERN_ORACLE = """
WITH staged1 AS (
    SELECT event_id, user_id, event_type,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ecum
    FROM events
), staged2 AS (
    SELECT *,
           max(CASE WHEN event_type = 'view'
                    THEN {'event_id': event_id, 'ecum': ecum} END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastview
    FROM staged1
), staged3 AS (
    SELECT *,
           max(CASE WHEN event_type = 'click'
                    THEN {'event_id': event_id, 'lv': lastview} END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastclick
    FROM staged2
)
SELECT user_id,
       lastclick.lv.event_id AS view_id,
       lastclick.event_id AS click_id,
       event_id AS purchase_id
FROM staged3
WHERE event_type = 'purchase'
  AND lastclick.lv.event_id IS NOT NULL
  AND ecum - lastclick.lv.ecum = 0
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_event_pattern": q_event_pattern,
        "q_funnel": q_funnel,
        "q_retention": q_retention,
        "q_gapfill": q_gapfill,
        "text_perplexity": text_perplexity,
        "text_bpe": text_bpe,
        "q_zorder": q_zorder,
    }


def oracle_sql() -> dict[str, str]:
    from bq_duckdb_spark.ext.bpe import train_bpe_oracle_sql

    return {
        "text_bpe": train_bpe_oracle_sql(),
        "q_event_pattern": _Q_EVENT_PATTERN_ORACLE,
        "q_funnel": _Q_FUNNEL_ORACLE,
        "q_retention": _Q_RETENTION_ORACLE,
        "q_gapfill": _Q_GAPFILL_ORACLE,
        "text_perplexity": _TEXT_PERPLEXITY_ORACLE,
        "q_zorder": _Q_ZORDER_ORACLE,
    }
