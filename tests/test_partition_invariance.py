"""Partition-count invariance: a distributed operator's RESULT must not
depend on spark.sql.shuffle.partitions (or any physical layout knob).
Anything that fails this has partition-dependent logic leaking into its
output — the bug class that surfaces only on the real cluster, where
partition counts differ from the laptop.

shuffle.partitions is a runtime conf, so one session can compute the
same entry under different values and diff exactly.
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# representative slice: hash dedup, deterministic sampling, iterative
# checkpointing, windowed top-k join, multi-stage composition, scoring
ENTRIES = [
    "dedup_minhash_portable",
    "corpus_balance",
    "graph_pagerank",
    "sim_ann_join",
    "pipe_corpus_assembly",
    "text_bm25",
]


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    fn = entry.queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(tuple(r) for r in fn(spark, SF).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert len(a) > 0
    assert a == b
