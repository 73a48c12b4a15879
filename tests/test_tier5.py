"""Unit + plan-shape tests for the tier-5 operators: k-means embedding
clustering, ANN recall evaluation, weighted sampling, best-of-group
dedup, and the SQL-surface wideners (COUNTIF, CUBE, LATERAL, windowed
distinct count)."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark import contract_tier5
from bq_duckdb_spark.ext.cluster import kmeans_assign
from bq_duckdb_spark.plans import audit_plan

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def _blobs(spark):
    # three tight, well-separated 4-d blobs of 10 points each
    rows = []
    for b, center in enumerate([10.0, -10.0, 30.0]):
        for i in range(10):
            rows.append(
                (b * 10 + i, [center + 0.01 * i, center, -center, 1.0])
            )
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    got = {r.vec_id: r.cell for r in kmeans_assign(df, k=3, iters=4).collect()}
    # every blob lands in exactly one cell, and distinct blobs in
    # distinct cells
    blobs = [{got[b * 10 + i] for i in range(10)} for b in range(3)]
    assert all(len(s) == 1 for s in blobs)
    assert len({next(iter(s)) for s in blobs}) == 3


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    a = sorted((r.vec_id, r.cell) for r in kmeans_assign(df, k=3, iters=3).collect())
    b = sorted((r.vec_id, r.cell) for r in kmeans_assign(df, k=3, iters=3).collect())
    assert a == b


def test_kmeans_final_assignment_map_only(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # the returned frame (the closing assignment under literal trained
    # centroids) must be map-only: assignment never shuffles
    assert audit_plan(kmeans_assign(emb, k=4, iters=1)).exchanges == 0


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # k=3 over 2 distinct points: one cell can never win a point; the
    # run must not crash and must still assign every vector
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        ["vec_id", "embedding"],
    )
    got = kmeans_assign(df, k=3, iters=3).collect()
    assert len(got) == 3


# ---------------------------------------------------------------------------
# recall eval
# ---------------------------------------------------------------------------


def test_recall_eval_bounds_and_shape(spark):
    row = contract_tier5.sim_recall_eval(spark, SF).collect()[0]
    assert 0 <= row.n_hits <= 10
    assert row.recall == pytest.approx(row.n_hits / 10.0)


# ---------------------------------------------------------------------------
# weighted sample
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_biased(spark):
    a = contract_tier5.pipe_weighted_sample(spark, SF)
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(
        r.doc_id for r in contract_tier5.pipe_weighted_sample(spark, SF).collect()
    )
    assert ids_a == ids_b and len(ids_a) == 100
    # ES keys favor heavier (longer) docs: the sample's mean token
    # count must exceed the corpus mean
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_mean = docs.select(
        F.avg(F.expr(r"size(split(trim(text), '\\s+'))"))
    ).collect()[0][0]
    sample_mean = a.select(F.avg("n_tokens")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_weighted_sample_is_take_ordered(spark):
    plan = (
        contract_tier5.pipe_weighted_sample(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# best-of-group dedup
# ---------------------------------------------------------------------------


def test_keep_best_prefers_longest_then_lowest_id(spark, tmp_path):
    import os

    rows = [
        (1, "Same Text", "en", "s", 9),
        (2, "same text  ", "en", "s", 11),   # normalizes same, longer
        (3, "same text", "en", "s", 9),
        (4, "unique", "en", "s", 6),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    # keep_best loads via sf_dir; exercise the windowed logic directly
    from pyspark.sql.window import Window

    grp = F.lower(F.trim(F.col("text")))
    w = Window.partitionBy(grp).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    out = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in out.collect()) == [2, 4]


# ---------------------------------------------------------------------------
# SQL-surface wideners
# ---------------------------------------------------------------------------


def test_countif_matches_filtered_counts(spark):
    out = {
        r.o_orderpriority: (r.n_big, r.n_finished, r.n_total)
        for r in contract_tier5.q_countif(spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want_big = {
        r.o_orderpriority: r.c
        for r in orders.filter("o_totalprice > 150000")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for pri, (n_big, _, _) in out.items():
        assert n_big == want_big.get(pri, 0)


def test_cube_lattice_consistency(spark):
    rows = contract_tier5.q_cube(spark, SF).collect()
    # 2^2 grouping sets present; the grand total row sums everything
    flags = {(r.g_rf, r.g_ls) for r in rows}
    assert flags == {(0, 0), (0, 1), (1, 0), (1, 1)}
    total = [r for r in rows if (r.g_rf, r.g_ls) == (1, 1)]
    assert len(total) == 1
    detail_n = sum(r.n_rows for r in rows if (r.g_rf, r.g_ls) == (0, 0))
    assert total[0].n_rows == detail_n


def test_lateral_matches_window_topk(spark):
    got = {
        (r.n_name, r.c_custkey)
        for r in contract_tier5.q_lateral(spark, SF).collect()
    }
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    want = {
        (r.n_name, r.c_custkey)
        for r in cust.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .collect()
    }
    assert got == want


def test_window_distinct_running_counts(spark):
    import datetime

    d = datetime.date
    rows = [
        # (orderkey, linenumber, partkey, suppkey, shipdate)
        (1, 1, 10, 100, d(2020, 1, 1)),
        (2, 1, 10, 100, d(2020, 1, 2)),  # same supp: still 1
        (3, 1, 10, 200, d(2020, 1, 3)),  # new supp: 2
        (4, 1, 20, 100, d(2020, 1, 1)),  # other part: restarts at 1
    ]
    df = spark.createDataFrame(
        rows, ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"]
    )
    from pyspark.sql.window import Window

    first_w = Window.partitionBy("l_partkey", "l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    run_w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r.l_orderkey: r.n_supps
        for r in df.withColumn(
            "first_seen", F.when(F.row_number().over(first_w) == 1, 1).otherwise(0)
        )
        .withColumn("n_supps", F.sum("first_seen").over(run_w))
        .collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_window_distinct_single_exchange(spark):
    # the explicit l_partkey repartition satisfies BOTH window specs
    # (subset rule), so exactly one exchange of lineitem in the plan
    # (audit_plan counts each physical Exchange twice in an
    # AdaptiveSparkPlan: header + detail)
    df = contract_tier5.q_window_distinct(spark, SF)
    audit = audit_plan(df)
    assert audit.exchanges <= 2, audit.formatted


# ---------------------------------------------------------------------------
# logistic-regression training
# ---------------------------------------------------------------------------


def test_train_logreg_separates_labels(spark):
    from bq_duckdb_spark.ext.dedup_portable import P, char_poly_expr
    from bq_duckdb_spark.ext.retrieval import train_logreg

    rows = []
    for i in range(40):
        # class-1 docs speak one vocabulary, class-0 another
        text = "alpha beta gamma delta" if i % 2 else "omega psi chi phi"
        rows.append((i, text, "en" if i % 2 else "de"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = train_logreg(
        df, "CAST(lang = 'en' AS INT)", n_buckets=32, iters=10, lr=4.0
    )
    # score both vocabularies under the trained model: the positive
    # class's mean feature weight must dominate
    poly = char_poly_expr("t", "spark")
    from pyspark.sql import functions as F

    w_lit = "array(" + ", ".join(f"{x!r}D" for x in w) + ")"
    scores = {
        r.lang: r.s
        for r in df.select(
            "lang",
            F.expr(
                f"aggregate(transform(split(trim(text), '\\\\s+'), "
                f"t -> element_at({w_lit}, CAST(({poly}) % 32 AS INT) + 1)), "
                f"0D, (a, x) -> a + x)"
            ).alias("s"),
        )
        .groupBy("lang")
        .agg(F.avg("s").alias("s"))
        .collect()
    }
    assert scores["en"] > 0 > scores["de"]


def test_train_logreg_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from bq_duckdb_spark.ext.retrieval import train_logreg

    a = train_logreg(docs, "CAST(lang = 'en' AS INT)", n_buckets=16, iters=2)
    b = train_logreg(docs, "CAST(lang = 'en' AS INT)", n_buckets=16, iters=2)
    assert a == b and any(x != 0 for x in a)


# ---------------------------------------------------------------------------
# token-budget selection
# ---------------------------------------------------------------------------


def test_take_until_budget_matches_naive_window(spark):
    from pyspark.sql.window import Window

    from bq_duckdb_spark.operators.budget import take_until_budget

    rows = [(i, (i * 37) % 23 + 1, float((i * 13) % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "w", "q"])
    got = sorted(
        (r.id, r.cum)
        for r in take_until_budget(
            df, [F.col("q").desc(), F.col("id")], "w", 2000, out_col="cum"
        ).collect()
    )
    w_naive = Window.orderBy(F.col("q").desc(), F.col("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = sorted(
        (r.id, r.cum)
        for r in df.withColumn("cum", F.sum("w").over(w_naive))
        .filter(F.col("cum") <= 2000)
        .collect()
    )
    assert got == want and len(got) > 0


def test_take_until_budget_no_single_partition_funnel(spark):
    from bq_duckdb_spark.operators.budget import take_until_budget

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "n_chars AS w", "CAST(doc_id % 7 AS DOUBLE) AS q"
    )
    out = take_until_budget(docs, [F.col("q").desc(), F.col("doc_id")], "w", 10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data path is range-partitioned; the only SinglePartition work
    # is the #partitions-row offsets window
    import re

    funnels = re.findall(r"Exchange SinglePartition[^\n]*", plan)
    assert len(funnels) <= 1, plan


# ---------------------------------------------------------------------------
# linear interpolation
# ---------------------------------------------------------------------------


def test_interpolate_hand_case(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    # user 1: values 10 at t=0, missing at t=30 (event 5), 20 at t=40:
    # interpolated = 10 + (20-10) * 30/40 = 17.5
    rows = [
        (1, at(0), 1, "view", 10.0, "{}"),
        (5, at(30), 1, "view", 99.0, "{}"),   # id % 5 == 0 -> nulled
        (2, at(40), 1, "view", 20.0, "{}"),
        (10, at(0), 2, "view", 7.0, "{}"),    # boundary gap: only next
        (3, at(10), 2, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r.event_id: (r.was_missing, r.value_filled)
            for r in contract_tier5.q_interpolate(spark, d).collect()
        }
    assert out[5] == (True, pytest.approx(17.5))
    assert out[10] == (True, pytest.approx(4.0))  # carries the only neighbor
    assert out[1] == (False, 10.0)


def test_interpolate_single_exchange(spark):
    df = contract_tier5.q_interpolate(spark, SF)
    audit = audit_plan(df)
    # both window specs share the user_id partitioning: one exchange
    # (audit counts each physical Exchange twice under AQE)
    assert audit.exchanges <= 2, audit.formatted


def test_apply_logreg_consistent_with_training_labels(spark):
    from bq_duckdb_spark.ext.retrieval import apply_logreg, train_logreg

    rows = []
    for i in range(60):
        text = "alpha beta gamma delta" if i % 2 else "omega psi chi phi"
        rows.append((i, text, "en" if i % 2 else "de"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = train_logreg(df, "CAST(lang = 'en' AS INT)", n_buckets=32, iters=12, lr=4.0)
    preds = {r.doc_id: r.label for r in apply_logreg(df, w).collect()}
    acc = sum(preds[i] == (i % 2) for i in range(60)) / 60
    assert acc == 1.0


def test_apply_logreg_map_only(spark):
    from bq_duckdb_spark.ext.retrieval import apply_logreg

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert audit_plan(apply_logreg(docs, [0.1] * 16)).exchanges == 0


# ---------------------------------------------------------------------------
# BPE apply (fixed merges)
# ---------------------------------------------------------------------------


def test_bpe_apply_fixed_merges_hand_case(spark):
    from bq_duckdb_spark.ext.bpe import apply_bpe

    df = spark.createDataFrame([(1, "table ble tab")], ["doc_id", "text"])
    out = apply_bpe(df, [("t", "a", 0), ("l", "e", 0), ("b", "le", 0)]).collect()[0]
    # table -> ta b le -> ta ble; ble -> b le -> ble; tab -> ta b
    assert out.bpe_tokens == ["ta", "ble", "ble", "ta", "b"]


def test_assign_shards_balanced_and_matches_naive(spark):
    from pyspark.sql.window import Window

    from bq_duckdb_spark.operators.budget import assign_shards

    rows = [(i, (i * 37) % 23 + 1) for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = assign_shards(
        df, [F.col("id")], "w", 500, num_partitions=7
    ).collect()
    w_naive = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: (r.cum - r.w) // 500
        for r in df.withColumn("cum", F.sum("w").over(w_naive)).collect()
    }
    assert {r.id: r.shard_id for r in got} == want
    # every full shard's token total stays within budget + one max row
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard_id, 0)
        by_shard[r.shard_id] += r.w
    max_w = max(w for _, w in rows)
    for sid, tot in by_shard.items():
        assert tot <= 500 + max_w
    assert len(by_shard) > 1


def test_not_in_null_is_three_valued(spark):
    row = contract_tier5.q_not_in_null(spark, SF).collect()[0]
    assert row.with_null == 0          # NULL in the list -> UNKNOWN everywhere
    assert row.clean > 0               # the clean arm actually filters


def test_decimal_agg_exact_strings(spark):
    rows_ = contract_tier5.q_decimal_agg(spark, SF).collect()
    assert len(rows_) == 5
    for r in rows_:
        # exact DECIMAL(x,2) rendering: always two fractional digits
        assert r.total.split(".")[1].__len__() == 2
        assert r.lo <= r.hi
