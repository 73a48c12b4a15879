"""Split-block Bloom prefilter (operators/bloom.py): zero false
negatives, bitmap bounds, and the single-broadcast-join plan shape."""

from pyspark.sql import functions as F

from bq_duckdb_spark.operators.bloom import bloom_prefilter, bloom_words


def _semi(big, build):
    return big.join(build.withColumnRenamed("bkey", "key"), "key", "semi")


def test_no_false_negatives_and_superset(spark):
    big = spark.range(200000).selectExpr("id % 10000 AS key", "id AS v")
    build = spark.range(300).selectExpr("id * 31 AS bkey")
    pre = bloom_prefilter(big, build, "key", "bkey")
    exact = _semi(big, build)
    # prefilter is a superset of the exact semi join...
    assert pre.count() >= exact.count()
    # ...and prefilter-then-exact is EXACTLY the exact semi join
    assert _semi(pre, build).count() == exact.count()


def test_tiny_filter_still_correct(spark):
    # 16 words = 1024 bits for 300 keys: false positives guaranteed,
    # false negatives still impossible
    big = spark.range(50000).selectExpr("id % 5000 AS key", "id AS v")
    build = spark.range(300).selectExpr("id * 7 AS bkey")
    pre = bloom_prefilter(big, build, "key", "bkey", m_words=16)
    exact = _semi(big, build)
    assert pre.count() >= exact.count()
    assert _semi(pre, build).count() == exact.count()


def test_bitmap_bounded(spark):
    build = spark.range(100000).selectExpr("id AS bkey")
    words = bloom_words(build, "bkey", m_words=1 << 10)
    assert words.count() <= 1 << 10
    # every word has at least one set bit (empty words are not emitted)
    assert words.where(F.col("word") == 0).count() == 0


def test_null_keys_dropped(spark):
    big = spark.createDataFrame([(None, 1), (0, 2)], "key long, v long")
    build = spark.range(3).selectExpr("id AS bkey")
    got = bloom_prefilter(big, build, "key", "bkey").collect()
    assert [(r.key, r.v) for r in got] == [(0, 2)]


def test_plan_single_broadcast_no_fact_shuffle(spark):
    big = spark.range(100000).selectExpr("id % 1000 AS key", "id AS v")
    build = spark.range(10).selectExpr("id AS bkey")
    pre = bloom_prefilter(big, build, "key", "bkey")
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only hash exchange is the (bounded) bitmap aggregation — the
    # fact side itself flows shuffle-free into the broadcast join
    assert plan.count("Exchange hashpartitioning") <= 1


def test_schema_passthrough(spark):
    big = spark.range(100).selectExpr("id AS key", "id * 2 AS v", "'x' AS s")
    build = spark.range(5).selectExpr("id AS bkey")
    pre = bloom_prefilter(big, build, "key", "bkey")
    assert pre.columns == ["key", "v", "s"]


def test_fact_side_word_column_survives(spark):
    # a fact table that itself has 'word'/'word_idx' columns must keep
    # them — the bitmap side is _bf_-prefixed internally
    big = spark.range(1000).selectExpr(
        "id % 50 AS key", "id AS word", "id * 2 AS word_idx"
    )
    build = spark.range(5).selectExpr("id * 10 AS bkey")
    pre = bloom_prefilter(big, build, "key", "bkey")
    assert pre.columns == ["key", "word", "word_idx"]
    exact = big.join(build.withColumnRenamed("bkey", "key"), "key", "semi")
    assert pre.join(build.withColumnRenamed("bkey", "key"), "key", "semi").count() == exact.count()
