"""Tier-6 driver-contract entries: entity-resolution / runtime-filter
operators added after the TPC-H completion pass.

- ``q_fuzzy_join``: edit-distance-1 similarity self-join over customer
  names via deletion-neighborhood blocking (ext/fuzzy.py) — the classic
  entity-resolution primitive the reference has no answer to.
- ``q_bloom_semi``: split-block Bloom runtime filter
  (operators/bloom.py) pruning the lineitem fact side before an exact
  semi join.

Every entry carries a full DuckDB oracle built from a STRUCTURALLY
DIFFERENT algorithm than the Spark side (pigeonhole half-blocking vs
deletion neighborhoods; plain IN-subquery vs bloom+semi), so a
shared-logic bug cannot self-confirm.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_duckdb_spark.ext import cms, fuzzy, graph
from bq_duckdb_spark.operators.bloom import bloom_prefilter
from bq_duckdb_spark.testdata import load_table as _t


# ---------------------------------------------------------------------------
# fuzzy (edit-distance-1) similarity join
# ---------------------------------------------------------------------------


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every pair of customer names within Levenshtein distance 1 —
    near-identical entities a cleaning pipeline would flag for merge.
    Candidate generation is one equi-join shuffle on deletion-variant
    hashes (never all-pairs); exact ``levenshtein`` verifies. Output is
    the name pair itself (id-ordered), so the hash check pins both the
    pairing and the survivor strings."""
    cust = _t(spark, sf_dir, "customer")
    pairs = fuzzy.fuzzy_pairs_d1(cust, str_col="c_name", id_col="c_custkey")
    return pairs.select(
        F.col("s_a").alias("name_a"), F.col("s_b").alias("name_b")
    )


# Oracle: pigeonhole blocking, NOT deletion neighborhoods. Customer
# names are fixed-width ('Customer#' + 9 digits), so any distance-1 pair
# is a single substitution (equal-length strings at distance 1 differ in
# exactly one position). Split each name into three segments — chars
# 1-12 / 13-15 / 16-18; one substitution leaves two of the three intact,
# so every qualifying pair matches on at least one PAIR of segments.
# Three equi-joins (each far more selective than a single-split block)
# + exact levenshtein verify; UNION (distinct) merges the branches.
# Only sound for the equal-length corpus at hand (a general oracle would
# need the insertion case); the Spark operator itself is general.
_Q_FUZZY_JOIN_ORACLE = """
WITH c AS (
    SELECT c_custkey AS id, c_name AS s,
           substr(c_name, 1, 12) AS seg_a,
           substr(c_name, 13, 3) AS seg_b,
           substr(c_name, 16, 3) AS seg_c
    FROM customer
),
cand AS (
    -- carry the ID pair, not just the names: the Spark side emits one
    -- row per id pair, so two same-named customers must stay two rows
    SELECT a.id AS ia, b.id AS ib, a.s AS sa, b.s AS sb
    FROM c a JOIN c b
      ON a.seg_a = b.seg_a AND a.seg_b = b.seg_b AND a.id < b.id
    UNION
    SELECT a.id, b.id, a.s, b.s
    FROM c a JOIN c b
      ON a.seg_a = b.seg_a AND a.seg_c = b.seg_c AND a.id < b.id
    UNION
    SELECT a.id, b.id, a.s, b.s
    FROM c a JOIN c b
      ON a.seg_b = b.seg_b AND a.seg_c = b.seg_c AND a.id < b.id
)
SELECT sa AS name_a, sb AS name_b
FROM cand
WHERE levenshtein(sa, sb) <= 1
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join
# ---------------------------------------------------------------------------


def q_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to high-value orders, with the
    fact side pruned by a split-block Bloom filter (operators/bloom.py)
    BEFORE the exact semi join — the runtime-filter pattern that turns
    a shuffle-bound fact join scan-bound at 100 TB. The bloom stage is
    a strict superset filter, so the oracle is the plain semi join:
    identical results prove the zero-false-negative contract on real
    data."""
    li = _t(spark, sf_dir, "lineitem")
    hot = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    pre = bloom_prefilter(li, hot, "l_orderkey", "o_orderkey")
    return (
        pre.join(hot.select("o_orderkey"), pre.l_orderkey == F.col("o_orderkey"), "semi")
        .groupBy("l_returnflag")
        .agg(
            # cross-order float sum: round 2dp like every other revenue
            # pin (unrounded, the 1e9-scale sum's reassociation wobble
            # flips the 6dp value hash with file layout)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,6)"
                    )
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q_BLOOM_SEMI_ORACLE = """
SELECT l_returnflag,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders WHERE o_totalprice > 450000
)
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Count-Min Sketch frequency estimates
# ---------------------------------------------------------------------------

# a deliberately narrow sketch (4 x 64 over a ~50-token vocabulary) so
# collisions actually occur and the oracle checks REAL CMS behavior
# (overestimates included), not a trivially exact table; the probe set
# is data-independent and includes a token absent from the corpus
_CMS_DEPTH, _CMS_WIDTH = 4, 64
_CMS_PROBES = ["table", "query", "spark", "the", "zzz_absent"]


def sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch token-frequency estimates next to exact counts.
    The sketch counters use the portable hash family, so DuckDB rebuilds
    the IDENTICAL sketch — every counter and estimate value-checks,
    unlike opaque sketch binaries (ext/cms.py)."""
    docs = _t(spark, sf_dir, "documents")
    sketch = cms.cms_build(docs, "text", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    est = cms.cms_estimate(
        spark, sketch, _CMS_PROBES, depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    exact = (
        docs.select(
            F.explode_outer(F.expr("split(trim(text), '\\\\s+')")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, "token", "left").select(
        "token",
        F.coalesce(F.col("exact_cnt"), F.lit(0)).alias("exact_cnt"),
        "cms_est",
    )


# ---------------------------------------------------------------------------
# triangle counting on the co-purchase graph
# ---------------------------------------------------------------------------


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts joined by
    appearing in the same order) — the clustering-coefficient building
    block of basket analytics. Edge generation is one grouped pair
    expansion; counting uses the degree-ordered orientation
    (ext/graph.py triangle_count), whose wedge fan-out is skew-bounded
    at any scale. The oracle counts the same triangles with a plain
    3-way self-join, blind to the orientation trick."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("i")
    )
    edges = graph.cooccurrence_edges(li, "g", "i")
    return graph.triangle_count(edges)


_GRAPH_TRIANGLES_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
    SELECT DISTINCT a.p AS u, b.p AS v
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
)
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


# ---------------------------------------------------------------------------
# time-interval RANGE window frame
# ---------------------------------------------------------------------------


def q_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's rolling activity over the PRECEDING 10
    MINUTES — a time-interval RANGE frame (vs the contract's existing
    numeric RANGE entry). Spark has no INTERVAL frame literal; ordering
    by epoch-microseconds with an equivalent numeric range is the
    idiomatic translation and keeps full timestamp precision (ordering
    by a seconds cast would silently coarsen the boundary). One shuffle
    on user_id; frames never buffer beyond the 10-minute span."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("value").over(w).alias("sum_10m"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
    )


_Q_RANGE_INTERVAL_ORACLE = """
SELECT event_id, user_id,
       sum(value) OVER w AS sum_10m,
       count(*) OVER w AS n_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# robust outlier detection (median absolute deviation)
# ---------------------------------------------------------------------------


def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: exact median, median absolute deviation, and the
    count of robust outliers (|value - median| > 3 * MAD) — the
    data-quality screen that, unlike z-scores, is not dragged by the
    outliers it hunts. Two aggregate passes with a broadcast join-back
    of the (tiny) per-group medians between them; the exact medians
    buffer per group like q_percentiles (documented there; the
    approx-sketch twin is the 100 TB path)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.median("adev").alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * F.col("mad"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )


_Q_OUTLIERS_MAD_ORACLE = """
WITH med AS (
    SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, med.med, abs(e.value - med.med) AS adev
    FROM events e JOIN med USING (event_type)
),
mad AS (
    SELECT event_type, min(med) AS med, median(adev) AS mad
    FROM dev GROUP BY event_type
)
SELECT dev.event_type, min(mad.med) AS med, min(mad.mad) AS mad,
       sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


# ---------------------------------------------------------------------------
# A/B test: deterministic assignment + two-proportion z-test
# ---------------------------------------------------------------------------


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end experiment readout: users split 50/50 by the portable
    mix hash (deterministic, re-runnable — never rand()), conversion =
    any high-value purchase (plain "any purchase" converts every user
    at this event density, degenerating the pooled variance to 0), and
    the pooled two-proportion z statistic. Two aggregations (per-user,
    then per-variant) and a one-row pivot; the z arithmetic is
    identical IEEE ops in both engines, so the entry value-checks the
    statistic itself."""
    from bq_duckdb_spark.ext.pipeline import mix_hash_expr

    ev = _t(spark, sf_dir, "events")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .withColumn("variant", F.expr(f"{mix_hash_expr('user_id', 5)} % 2"))
    )
    s = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    one = s.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    return one.select(
        "n0",
        "c0",
        "n1",
        "c1",
        # nullif: a degenerate experiment (every user converts, or
        # none do) has pooled variance 0 — the z statistic is undefined
        # (NULL), not a DIVIDE_BY_ZERO error (gen_fuzz finding)
        F.expr(
            "(c1 / n1 - c0 / n0) / "
            "nullif(sqrt(((c0 + c1) / (n0 + n1)) * (1 - (c0 + c1) / (n0 + n1)) "
            "* (1 / n0 + 1 / n1)), 0.0)"
        ).alias("z_score"),
    )


def _q_ab_test_oracle() -> str:
    from bq_duckdb_spark.ext.pipeline import mix_hash_expr

    return f"""
WITH u AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND value > 200
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
v AS (SELECT {mix_hash_expr('user_id', 5)} % 2 AS variant, conv FROM u),
s AS (SELECT variant, count(*) AS n, sum(conv) AS c FROM v GROUP BY variant),
one AS (
    SELECT sum(CASE WHEN variant = 0 THEN n END) AS n0,
           sum(CASE WHEN variant = 0 THEN c END) AS c0,
           sum(CASE WHEN variant = 1 THEN n END) AS n1,
           sum(CASE WHEN variant = 1 THEN c END) AS c1
    FROM s
)
SELECT n0, c0, n1, c1,
       (c1 / n1 - c0 / n0) /
       nullif(sqrt(((c0 + c1) / (n0 + n1)) * (1 - (c0 + c1) / (n0 + n1))
            * (1 / n0 + 1 / n1)), 0.0) AS z_score
FROM one
"""


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def pipe_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative mining: every 100th embedding is a
    query; its 3 hardest negatives are the most-similar index vectors
    inside the cosine band [0.1, 0.8) from 2 probed IVF cells
    (ext/retrieval.py hard_negatives — near-dups and easy negatives
    excluded before ranking). Deterministic end to end, so the oracle
    re-derives the identical batch."""
    from bq_duckdb_spark.ext.contract import _query_vec
    from bq_duckdb_spark.ext.retrieval import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    cents = [_query_vec(spark, sf_dir, i) for i in range(4)]
    return hard_negatives(
        emb.filter(F.col("vec_id") % 100 == 0),
        emb.filter(F.col("vec_id") % 100 != 0),
        cents,
        k=3,
        nprobe=2,
        sim_lo=0.1,
        sim_hi=0.8,
    )


_PIPE_HARD_NEGATIVES_ORACLE = """
WITH cents AS (
    SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings WHERE vec_id < 4
),
qs AS (
    SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id % 100 = 0
),
probed AS (
    SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cid
               ) AS rn
        FROM qs q CROSS JOIN cents c
    ) WHERE rn <= 2
),
assigned AS (
    SELECT vec_id, ev, cid FROM (
        SELECT e.vec_id,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
               c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cv) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id % 100 <> 0
    ) WHERE rn = 1
),
scored AS (
    SELECT p.qid AS query_id, a.vec_id AS index_id,
           list_dot_product(q.qv, a.ev)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.ev, a.ev)))
               AS cosine
    FROM probed p
    JOIN qs q ON q.qid = p.qid
    JOIN assigned a ON a.cid = p.cid
)
SELECT query_id, index_id, cosine FROM (
    SELECT query_id, index_id, cosine,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, index_id
           ) AS rn
    FROM scored
    WHERE cosine >= 0.1 AND cosine < 0.8
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# data-quality expectations + profiling
# ---------------------------------------------------------------------------


def q_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test-style expectations over the warehouse tables in ONE
    Spark job: key uniqueness, FK integrity, null checks, value ranges,
    accepted sets (ext/validate.py; shapes documented there). Includes
    a deliberately FAILING range rule so the report's non-zero path is
    value-checked too."""
    from bq_duckdb_spark.ext import validate as v

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    return v.validation_report(
        [
            v.check_unique(orders, ["o_orderkey"]),
            v.check_unique(li, ["l_orderkey", "l_linenumber"]),
            v.check_fk(li, orders, "l_orderkey", "o_orderkey"),
            v.check_fk(orders, cust, "o_custkey", "c_custkey"),
            v.check_not_null(orders, ["o_orderkey", "o_custkey", "o_totalprice"]),
            v.check_range(li, "l_discount", lo=0.0, hi=0.1),
            v.check_range(li, "l_quantity", lo=1, hi=10),  # fails by design
            v.check_accepted_values(li, "l_returnflag", ["A", "N", "R"]),
        ]
    )


_Q_VALIDATION_REPORT_ORACLE = """
SELECT 'unique:o_orderkey' AS rule,
       coalesce(sum(n - 1), 0) AS n_violations
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'unique:l_orderkey,l_linenumber',
       coalesce(sum(n - 1), 0)
FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)
UNION ALL
SELECT 'fk:l_orderkey->o_orderkey', count(*)
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'fk:o_custkey->c_custkey', count(*)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'not_null:o_orderkey', sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) FROM orders
UNION ALL
SELECT 'not_null:o_custkey', sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) FROM orders
UNION ALL
SELECT 'not_null:o_totalprice', sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) FROM orders
UNION ALL
SELECT 'range:l_discount',
       sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
FROM lineitem
UNION ALL
SELECT 'range:l_quantity',
       sum(CASE WHEN l_quantity < 1 OR l_quantity > 10 THEN 1 ELSE 0 END)
FROM lineitem
UNION ALL
SELECT 'accepted:l_returnflag',
       sum(CASE WHEN l_returnflag IS NOT NULL
                 AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
FROM lineitem
"""


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass warehouse profile of lineitem's key columns: null
    count, exact distinct, stringified min/max, mean for numerics —
    a single aggregate row exploded per column, never a job per
    column."""
    from bq_duckdb_spark.ext import validate as v
    from bq_duckdb_spark.ext.dedup import widen_small_scan

    cols = ["l_orderkey", "l_quantity", "l_discount", "l_returnflag", "l_shipdate"]
    # project FIRST (only the profiled columns cross the widen shuffle —
    # guide §2.3), then widen: the multi-countDistinct aggregate plans
    # as an Expand (one duplicate of every row per distinct column), and
    # over a single-row-group parquet file that 6x row blowup ran on ONE
    # scan task (stage-profiled at 8.0 s executor time on 3 tasks,
    # round 10). widen_small_scan is metadata-gated: no-op at scale,
    # where file splits already parallelize the scan.
    li = widen_small_scan(_t(spark, sf_dir, "lineitem").select(*cols))
    out = v.profile_table(li, cols)
    # the mean is a cross-order float aggregate — round it 4dp for the
    # contract pin (the raw l_discount mean at sf0.01 lands within an
    # ulp-reassociation of a 6dp rounding boundary, so an unrounded pin
    # is layout- and engine-order-dependent; caught by
    # tools/layout_invariance.py)
    return out.withColumn("mean_value", F.round("mean_value", 4))


_Q_PROFILE_ORACLE = """
SELECT 'l_orderkey' AS "column",
       sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
       count(DISTINCT l_orderkey) AS n_distinct,
       CAST(min(l_orderkey) AS VARCHAR) AS min_value,
       CAST(max(l_orderkey) AS VARCHAR) AS max_value,
       round(avg(l_orderkey), 4) AS mean_value
FROM lineitem
UNION ALL
SELECT 'l_quantity',
       sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_quantity),
       CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR),
       round(avg(l_quantity), 4)
FROM lineitem
UNION ALL
SELECT 'l_discount',
       sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_discount),
       CAST(min(l_discount) AS VARCHAR), CAST(max(l_discount) AS VARCHAR),
       round(avg(l_discount), 4)
FROM lineitem
UNION ALL
SELECT 'l_returnflag',
       sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_returnflag),
       min(l_returnflag), max(l_returnflag), NULL
FROM lineitem
UNION ALL
SELECT 'l_shipdate',
       sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_shipdate),
       CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR),
       NULL
FROM lineitem
"""


# ---------------------------------------------------------------------------
# CDC: snapshot diff + SCD Type 2
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC: two deterministic views of orders (one
    missing keys %89, the other missing keys %97 and doubling the price
    of keys %101) diffed into insert/delete/update rows by one
    full-outer join with exact null-safe struct comparison
    (operators/cdc.py). The oracle classifies the same pair with plain
    SQL CASE over a FULL JOIN."""
    from bq_duckdb_spark.operators.cdc import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 89 != 0)
    new = orders.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice", "o_orderpriority"]
    )


_Q_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
    SELECT * FROM orders WHERE o_orderkey % 89 <> 0
),
new AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT o_orderkey, change_type FROM (
    SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                THEN 'update' END AS change_type
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
) WHERE change_type IS NOT NULL
"""


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 build: each customer's order-priority history
    compressed to validity intervals — consecutive same-priority orders
    collapse, each surviving version carries valid_from/valid_to/
    is_current (operators/cdc.py scd2: one shuffle, two window passes
    over one ordering). Oracle re-derives with lag/lead."""
    from bq_duckdb_spark.operators.cdc import scd2

    orders = _t(spark, sf_dir, "orders")
    return scd2(
        orders,
        ["o_custkey"],
        ["o_orderpriority"],
        "o_orderdate",
        "o_orderkey",
    ).select("o_custkey", "o_orderpriority", "valid_from", "valid_to", "is_current")


# first-row detection uses a row-presence marker (lag(1)), not the
# lagged attribute value: `prev IS NULL` cannot distinguish 'no
# previous row' from 'previous value is NULL', so consecutive NULL
# priorities would survive here while the Spark side (lag over a
# struct) correctly collapses them
_Q_SCD2_ORACLE = """
WITH s AS (
    SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
           lag(o_orderpriority) OVER w AS prev,
           lag(1) OVER w AS has_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
surv AS (
    SELECT * FROM s
    WHERE has_prev IS NULL OR o_orderpriority IS DISTINCT FROM prev
)
SELECT o_custkey, o_orderpriority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w2 AS valid_to,
       lead(o_orderdate) OVER w2 IS NULL AS is_current
FROM surv
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# entity resolution: fuzzy pairs -> components -> canonical survivor
# ---------------------------------------------------------------------------


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ER loop on one nation's customers: deletion-variant
    fuzzy pairs (distance <= 1) -> hash-min connected components ->
    every record labelled (cluster_id = component min, is_canonical =
    the survivor a merge keeps). One nation keeps the name graph
    fragmented into real multi-record clusters plus singletons (the
    full customer set is one giant digit-walk component — useless as a
    demonstration). Oracle: pigeonhole-blocked pairs + unrolled
    pointer-doubling label propagation, both algorithms different from
    the Spark side's."""
    from bq_duckdb_spark.ext.dedup import assign_dup_clusters

    cust = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") == 7)
    pairs = fuzzy.fuzzy_pairs_d1(cust, str_col="c_name", id_col="c_custkey").select(
        "id_a", "id_b"
    )
    out = assign_dup_clusters(cust.select("c_custkey"), pairs, "c_custkey")
    return out.select(
        "c_custkey", F.col("cluster_id").cast("long").alias("cluster_id"), "is_canonical"
    )


def _entity_resolution_oracle(rounds: int = 24) -> str:
    # 24 rounds, not 8: digit-substitution name graphs form LONG chains
    # (the sf0.1 nation-7 subset needs 16 rounds of relax+jump to reach
    # its fixed point — measured; 20 and 24 are stable). The Spark side
    # iterates to convergence, so only the unrolled oracle needs a
    # worst-case round count.
    prop = []
    prev = "lab0"
    for i in range(1, rounds + 1):
        prop.append(
            f"relax{i} AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM ("
            f"SELECT node, lbl FROM {prev} "
            f"UNION ALL "
            f"SELECT e.src AS node, l.lbl FROM edges e "
            f"JOIN {prev} l ON l.node = e.dst) GROUP BY node)"
        )
        prop.append(
            f"lab{i} AS MATERIALIZED (SELECT a.node, b.lbl "
            f"FROM relax{i} a JOIN relax{i} b ON b.node = a.lbl)"
        )
        prev = f"lab{i}"
    return (
        """
WITH c AS (
    SELECT c_custkey AS id, c_name AS s,
           substr(c_name, 1, 12) AS seg_a,
           substr(c_name, 13, 3) AS seg_b,
           substr(c_name, 16, 3) AS seg_c
    FROM customer WHERE c_nationkey = 7
),
cand AS (
    SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
    FROM c a JOIN c b ON a.seg_a = b.seg_a AND a.seg_b = b.seg_b AND a.id < b.id
    UNION
    SELECT a.id, b.id, a.s, b.s
    FROM c a JOIN c b ON a.seg_a = b.seg_a AND a.seg_c = b.seg_c AND a.id < b.id
    UNION
    SELECT a.id, b.id, a.s, b.s
    FROM c a JOIN c b ON a.seg_b = b.seg_b AND a.seg_c = b.seg_c AND a.id < b.id
),
pairs AS (SELECT id_a, id_b FROM cand WHERE levenshtein(sa, sb) <= 1),
edges AS MATERIALIZED (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
lab0 AS MATERIALIZED (
    SELECT src AS node, src AS lbl FROM edges UNION SELECT dst, dst FROM edges
),
"""
        + ", ".join(prop)
        + f""",
lab AS (SELECT node, min(lbl) AS cl FROM {prev} GROUP BY node),
-- convergence sentinel: one more relax step from the final labels; any
-- label that would still drop means the unrolled round count was too
-- small for this corpus. Under-iteration then emits a poison row
-- (c_custkey = -1) — a loud, diagnosable row-count mismatch instead of
-- a silent value mismatch blamed on the Spark side.
probe AS (
    SELECT node, min(lbl) AS best FROM (
        SELECT node, cl AS lbl FROM lab
        UNION ALL
        SELECT e.src AS node, l.cl AS lbl
        FROM edges e JOIN lab l ON l.node = e.dst
    ) GROUP BY node
),
unconverged AS (
    SELECT count(*) AS n FROM probe p JOIN lab l ON l.node = p.node
    WHERE p.best < l.cl
)
SELECT c.id AS c_custkey,
       CAST(coalesce(l.cl, c.id) AS BIGINT) AS cluster_id,
       c.id = coalesce(l.cl, c.id) AS is_canonical
FROM c LEFT JOIN lab l ON c.id = l.node
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), false
FROM unconverged WHERE n > 0
"""
    )


# ---------------------------------------------------------------------------
# model evaluation: AUC / calibration / confusion
# ---------------------------------------------------------------------------

_EVAL_SCORED = """
scored AS (
    -- text IS NOT NULL + coalesced label: a NULL document has no score
    -- and a NULL lang is simply not English (gen_fuzz finding)
    SELECT doc_id, source,
           1.0 / (1.0 + exp(-10.0 * ({score}))) AS prob,
           CAST(coalesce(lang = 'en', false) AS BIGINT) AS y
    FROM documents WHERE text IS NOT NULL
)
"""


def _eval_scored_df(spark: SparkSession, sf_dir: str):
    # ONE map-only projection: score and label both derive row-wise
    # from the same documents row — joining classify_documents back on
    # doc_id would rescan and shuffle for nothing
    from bq_duckdb_spark.ext.retrieval import classifier_score_expr

    score = classifier_score_expr("text", 1024, "spark")
    return (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.expr(f"1.0 / (1.0 + exp(-10.0 * ({score})))").alias("prob"),
            F.coalesce(F.col("lang") == "en", F.lit(False)).cast("long").alias("y"),
        )
    )


def _eval_cte() -> str:
    from bq_duckdb_spark.ext.retrieval import classifier_score_expr

    return _EVAL_SCORED.format(
        score=classifier_score_expr("text", 1024, "duckdb")
    )


def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of the hashed quality classifier against the language label,
    via the score-histogram Mann-Whitney formulation (ext/mleval.py) —
    the only ordered pass runs over the bounded quantized-score
    histogram, never a data-sized global rank window."""
    from bq_duckdb_spark.ext.mleval import auc

    return auc(_eval_scored_df(spark, sf_dir), "prob", "y")


def _eval_auc_oracle() -> str:
    from bq_duckdb_spark.ext.mleval import GRID

    return f"""
WITH {_eval_cte()},
g AS (
    SELECT floor(prob * {GRID}) AS sq,
           sum(y) AS np, count(*) - sum(y) AS nn
    FROM scored GROUP BY 1
),
c AS (
    SELECT np, nn,
           coalesce(sum(nn) OVER (ORDER BY sq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
    FROM g
),
u AS (
    SELECT sum(np) AS n_pos, sum(nn) AS n_neg,
           sum(np * (cum_nn + 0.5 * nn)) AS u_stat
    FROM c
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN u_stat / (n_pos * n_neg) END AS auc
FROM u
"""


_CAL_BINS = 10


def eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the same classifier: per decile of
    predicted probability, count, mean prediction, observed rate."""
    from bq_duckdb_spark.ext.mleval import calibration_bins

    return calibration_bins(
        _eval_scored_df(spark, sf_dir), "prob", "y", n_bins=_CAL_BINS
    )


def _eval_calibration_oracle() -> str:
    return f"""
WITH {_eval_cte()}
SELECT CAST(least(floor(prob * {_CAL_BINS}), {_CAL_BINS - 1}) AS BIGINT) AS bin,
       count(*) AS n,
       round(avg(prob), 4) AS mean_prob,
       round(avg(y), 4) AS pos_rate
FROM scored
GROUP BY 1
"""


_CONF_THRESHOLD = 0.5


def eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + precision/recall/F1 at threshold 0.5."""
    from bq_duckdb_spark.ext.mleval import confusion_stats

    return confusion_stats(
        _eval_scored_df(spark, sf_dir), "prob", "y", threshold=_CONF_THRESHOLD
    )


def _eval_confusion_oracle() -> str:
    t = _CONF_THRESHOLD
    return f"""
WITH {_eval_cte()},
a AS (
    SELECT sum(CASE WHEN prob >= {t} AND y = 1 THEN 1 ELSE 0 END) AS tp,
           sum(CASE WHEN prob >= {t} AND y = 0 THEN 1 ELSE 0 END) AS fp,
           sum(CASE WHEN prob < {t} AND y = 0 THEN 1 ELSE 0 END) AS tn,
           sum(CASE WHEN prob < {t} AND y = 1 THEN 1 ELSE 0 END) AS fn
    FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN 2.0 * tp / (2 * tp + fp + fn) END AS f1
FROM a
"""


def eval_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-drift monitor: Population Stability Index between the
    classifier-score distributions of two document sources (fixed
    equal-width bins — drifting data must not move its own bins;
    ext/mleval.py psi)."""
    from bq_duckdb_spark.ext.mleval import psi

    scored = _eval_scored_df(spark, sf_dir)
    return psi(
        scored.where(F.col("source") == "src0"),
        scored.where(F.col("source") == "src1"),
        "prob",
        n_bins=_CAL_BINS,
    )


def _eval_psi_oracle() -> str:
    b = _CAL_BINS
    return f"""
WITH {_eval_cte()},
be AS (
    SELECT CAST(least(floor(prob * {b}), {b - 1}) AS BIGINT) AS bin, count(*) AS ne
    FROM scored WHERE source = 'src0' GROUP BY 1
),
ba AS (
    SELECT CAST(least(floor(prob * {b}), {b - 1}) AS BIGINT) AS bin, count(*) AS na
    FROM scored WHERE source = 'src1' GROUP BY 1
),
tot AS (
    SELECT coalesce(ne, 0) AS ne, coalesce(na, 0) AS na
    FROM be FULL JOIN ba USING (bin)
),
props AS (
    SELECT ne, na,
           greatest(ne / sum(ne) OVER (), 1e-6) AS pe,
           greatest(na / sum(na) OVER (), 1e-6) AS pa
    FROM tot
)
SELECT CAST(sum(ne) AS BIGINT) AS n_expected,
       CAST(sum(na) AS BIGINT) AS n_actual,
       sum((pa - pe) * (ln(pa) - ln(pe))) AS psi
FROM props
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median / weighted p90 of price with quantity weights —
    the lower weighted percentile: the smallest value whose cumulative
    weight reaches the target fraction of the group's total weight.

    Scale: ONE cumulative-weight window per group (RANGE frame, so
    tied values share a cumulative weight — deterministic under any
    row order), then a plain aggregate; the sort is Spark's spillable
    external sorter, the same bounded-memory shape as q_percentiles.
    Cross-engine determinism: the weights are small integers stored as
    doubles, so every cumulative sum is exact in IEEE doubles and the
    boundary comparison cannot flip between engines."""
    from pyspark.sql.window import Window as W

    # NULL prices/quantities are excluded like percentile_cont excludes
    # NULL values: Spark sorts NULLs first in the cumulative window,
    # DuckDB last, so keeping them skews every threshold (gen_fuzz)
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    cum = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    tot = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(cum).alias("cw"),
        F.sum("l_quantity").over(tot).alias("tw"),
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("v"))).alias(
                "w_median"
            ),
            F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("v"))).alias(
                "w_p90"
            ),
        )
        .orderBy("l_returnflag")
    )


_Q_WEIGHTED_MEDIAN_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
)
SELECT l_returnflag,
       min(CASE WHEN cw >= 0.5 * tw THEN v END) AS w_median,
       min(CASE WHEN cw >= 0.9 * tw THEN v END) AS w_p90
FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_weighted_median": q_weighted_median,
        "q_fuzzy_join": q_fuzzy_join,
        "q_bloom_semi": q_bloom_semi,
        "sketch_cms_freq": sketch_cms_freq,
        "graph_triangles": graph_triangles,
        "q_range_interval": q_range_interval,
        "q_outliers_mad": q_outliers_mad,
        "q_ab_test": q_ab_test,
        "pipe_hard_negatives": pipe_hard_negatives,
        "q_validation_report": q_validation_report,
        "q_profile": q_profile,
        "q_snapshot_diff": q_snapshot_diff,
        "q_scd2": q_scd2,
        "q_entity_resolution": q_entity_resolution,
        "eval_auc": eval_auc,
        "eval_calibration": eval_calibration,
        "eval_confusion": eval_confusion,
        "eval_psi": eval_psi,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_weighted_median": _Q_WEIGHTED_MEDIAN_ORACLE,
        "q_fuzzy_join": _Q_FUZZY_JOIN_ORACLE,
        "q_bloom_semi": _Q_BLOOM_SEMI_ORACLE,
        "sketch_cms_freq": cms.cms_oracle_sql(
            _CMS_PROBES, depth=_CMS_DEPTH, width=_CMS_WIDTH
        ),
        "graph_triangles": _GRAPH_TRIANGLES_ORACLE,
        "q_range_interval": _Q_RANGE_INTERVAL_ORACLE,
        "q_outliers_mad": _Q_OUTLIERS_MAD_ORACLE,
        "q_ab_test": _q_ab_test_oracle(),
        "pipe_hard_negatives": _PIPE_HARD_NEGATIVES_ORACLE,
        "q_validation_report": _Q_VALIDATION_REPORT_ORACLE,
        "q_profile": _Q_PROFILE_ORACLE,
        "q_snapshot_diff": _Q_SNAPSHOT_DIFF_ORACLE,
        "q_scd2": _Q_SCD2_ORACLE,
        "q_entity_resolution": _entity_resolution_oracle(),
        "eval_auc": _eval_auc_oracle(),
        "eval_calibration": _eval_calibration_oracle(),
        "eval_confusion": _eval_confusion_oracle(),
        "eval_psi": _eval_psi_oracle(),
    }
