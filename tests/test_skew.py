"""Skew/co-location helpers: salted join correctness + bucketed joins
eliding exchanges."""

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.operators.skew import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # key 0 holds 90% of the fact rows — the classic hot key
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 5, f"r{i}") for i in range(1000)], ["k", "payload"]
    )
    dim = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], ["k", "label"])
    return fact, dim


def test_salted_join_matches_plain_join(skewed_pair):
    fact, dim = skewed_pair
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(skewed_pair, spark):
    fact, dim = skewed_pair
    missing = fact.union(spark.createDataFrame([(99, "orphan")], ["k", "payload"]))
    out = salted_join(missing, dim, "k", how="left")
    orphan = [r for r in out.collect() if r.k == 99]
    assert len(orphan) == 1 and orphan[0].label is None
    assert out.count() == missing.count()


def test_salted_join_spreads_hot_key(skewed_pair):
    fact, dim = skewed_pair
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*fact.columns)), F.lit(16))
    )
    hot = salted.filter("k = 0").groupBy("__salt").count().collect()
    # the hot key's rows must land in many salt partitions, not one
    assert len(hot) >= 12


def test_bucketed_join_has_no_exchange(spark, skewed_pair):
    fact, dim = skewed_pair
    write_bucketed(fact, "b_fact", "k", num_buckets=8, sort_cols="k")
    write_bucketed(
        spark.createDataFrame([(i, i * 1.0) for i in range(5)], ["k", "w"]),
        "b_dim2", "k", num_buckets=8, sort_cols="k",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bucketed_join_ready(spark, "b_fact", "b_dim2", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == fact.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_fact")
        spark.sql("DROP TABLE IF EXISTS b_dim2")


def _unit_vecs(spark, n=50):
    import math

    def unit(seed):
        raw = [((seed * 37 + i * 13) % 19) - 9.0 for i in range(8)]
        nn = math.sqrt(sum(x * x for x in raw))
        return [x / nn for x in raw]

    df = spark.createDataFrame(
        [(i, unit(i)) for i in range(n)], ["vec_id", "embedding"]
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    return df, unit(5)


def _scan_partition_count(df):
    """(#partition dirs the scan will read, partition-filter string) for
    the single FileSourceScan leaf — the at-rest pruning ground truth."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.head()
    n = scan.selectedPartitions().partitionCount()
    return n, scan.toString()


def test_lsh_index_at_rest_partition_prunes(spark):
    """write_lsh_index + lsh_ann_topk_indexed: the probe's IN-list on
    the partition column must prune the at-rest scan to the hamming-ball
    directories only — no full read, no Exchange — and return the same
    rows as the unindexed ANN."""
    from bq_duckdb_spark.ext import similarity

    vecs, q = _unit_vecs(spark)
    try:
        similarity.write_lsh_index(vecs, "emb_lsh_idx", dim=8, nbits=6)
        total = spark.table("emb_lsh_idx").select("lsh_bucket").distinct().count()
        probe = similarity.lsh_ann_topk_indexed(
            spark, "emb_lsh_idx", q, dim=8, k=5, nbits=6, max_hamming=1
        )
        n_read, scan = _scan_partition_count(probe)
        assert "PartitionFilters" in scan and "lsh_bucket" in scan
        # hamming<=1 ball of a 6-bit bucket = 7 probe ids; only populated
        # cells materialize as directories, and the scan must read fewer
        # than all of them
        assert 0 < n_read <= 7 and n_read < total, f"read {n_read} of {total} cells"
        assert "Exchange" not in probe._jdf.queryExecution().executedPlan().toString()
        direct = similarity.lsh_ann_topk(vecs, q, dim=8, k=5, nbits=6, max_hamming=1)
        assert [tuple(r) for r in probe.collect()] == [
            tuple(r) for r in direct.collect()
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_lsh_idx")


def test_ivf_index_at_rest_partition_prunes(spark):
    """write_ivf_index + ivf_topk_indexed with nprobe=1: the scan reads
    exactly ONE cell directory and matches the unindexed ivf_topk."""
    from bq_duckdb_spark.ext import similarity

    vecs, q = _unit_vecs(spark)
    centroids = [q, [-x for x in q]]
    try:
        similarity.write_ivf_index(vecs, "emb_ivf_idx", centroids)
        probe = similarity.ivf_topk_indexed(
            spark, "emb_ivf_idx", q, centroids, k=3, nprobe=1
        )
        n_read, scan = _scan_partition_count(probe)
        assert "PartitionFilters" in scan and "ivf_cell" in scan
        assert n_read == 1, f"nprobe=1 must read exactly one cell, got {n_read}"
        direct = similarity.ivf_topk(vecs, q, centroids, k=3, nprobe=1)
        assert [tuple(r) for r in probe.collect()] == [
            tuple(r) for r in direct.collect()
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_ivf_idx")


def test_join_with_strategy_controls_physical_plan(spark, skewed_pair):
    from bq_duckdb_spark.operators import join_with_strategy

    fact, dim = skewed_pair
    expected_rows = fact.join(dim, "k").count()
    for strategy, marker in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        j = join_with_strategy(fact, dim, "k", strategy=strategy)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert marker in plan, f"{strategy} hint not honored:\n{plan[:500]}"
        assert j.count() == expected_rows
    with pytest.raises(ValueError, match="unknown join strategy"):
        join_with_strategy(fact, dim, "k", strategy="warp_drive")


def test_pq_index_at_rest_codes_only_scan(spark):
    """write_pq_index + pq_topk_indexed: the search table holds m ints
    per vector; the query scan reads codes only (no embedding column
    exists to read), no Exchange, and ranks identically to the direct
    pq_topk over the raw vectors."""
    from bq_duckdb_spark.ext import similarity

    vecs, q = _unit_vecs(spark)
    rows = [[float(x) for x in r.embedding]
            for r in vecs.orderBy("vec_id").limit(4).collect()]
    cbs = similarity.pq_codebooks_from_vectors(rows, m=4)
    try:
        similarity.write_pq_index(vecs, "emb_pq_idx", cbs)
        probe = similarity.pq_topk_indexed(spark, "emb_pq_idx", q, cbs, k=5)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "ReadSchema" in plan and "embedding" not in plan, plan
        direct = similarity.pq_topk(vecs, q, cbs, k=5)
        assert [tuple(r) for r in probe.collect()] == [
            tuple(r) for r in direct.collect()
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_pq_idx")


def test_key_skew_stats_identifies_heavy_hitter(spark):
    from bq_duckdb_spark.operators.skew import key_skew_stats
    from pyspark.sql import functions as F

    rows = [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["i", "key"])
    got = key_skew_stats(df, "key", top_k=3).collect()
    assert got[0].key == "hot" and got[0].cnt == 50
    assert got[0].pct == 0.5
    # 51 distinct keys, mean freq 100/51; hot is 50/(100/51) = 25.5x
    assert got[0].x_over_avg == 50 / (100 / 51)
    # remaining rows are singletons, tie-broken by key
    assert [r.key for r in got[1:]] == ["k1", "k11"]
