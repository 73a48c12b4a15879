"""Round-count / per-round-time probe for the connected-components loop.

Rebuilds the exact pair inputs of the four components-family entries at
a given SF dir and runs a copy of the CURRENT dedup.connected_components
loop with per-round timing, so the round count and per-round cost are
measured rather than inferred (guide §1). Usage:

  python tools/cc_probe.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bq_duckdb_spark import get_spark
from bq_duckdb_spark.ext import dedup, fuzzy
from bq_duckdb_spark.ext import dedup_portable as dp


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, name + ".parquet"))


def pairs_for(spark, sf_dir: str, entry: str):
    if entry == "dedup_clusters":
        emb = _t(spark, sf_dir, "embeddings")
        return dedup.embedding_near_dup_pairs(emb, threshold=0.3, use_lsh=True, dim=64)
    if entry == "q_entity_resolution":
        cust = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") == 7)
        return fuzzy.fuzzy_pairs_d1(cust, str_col="c_name", id_col="c_custkey").select(
            "id_a", "id_b"
        )
    if entry == "dedup_text_clusters":
        docs = _t(spark, sf_dir, "documents")
        from bq_duckdb_spark.ext.contract_portable import _BANDS, _K, _NUM_HASHES

        return dp.portable_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.3,
            num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=_K,
        )
    raise SystemExit(f"unknown entry {entry}")


def timed_components(pairs, id_a="id_a", id_b="id_b", max_iter=25):
    """Verbatim copy of the current dedup.connected_components with
    per-round timing instrumentation."""
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    t0 = time.time()
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    print(f"  init: {time.time() - t0:.2f}s  edges={n_edges}")
    if prev_sum is None:
        return
    rounds = 0
    for _ in range(max_iter):
        t0 = time.time()
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbl"))
        )
        stepped = labels.join(nbr_min, labels.node == nbr_min.dst, "left").select(
            "node", F.least(F.col("lbl"), F.coalesce("nbl", "lbl")).alias("lbl")
        )
        jump = stepped.select(F.col("node").alias("jn"), F.col("lbl").alias("jl"))
        new_labels = stepped.join(jump, stepped.lbl == jump.jn, "left").select(
            "node", F.least(F.col("lbl"), F.coalesce("jl", "lbl")).alias("lbl")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum("lbl")).first()[0]
        labels.unpersist()
        labels = new_labels
        rounds += 1
        print(f"  round {rounds}: {time.time() - t0:.2f}s  sum={new_sum}")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    print(f"  TOTAL rounds={rounds}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    entries = sys.argv[2:] or [
        "q_entity_resolution", "dedup_clusters", "dedup_text_clusters"
    ]
    spark = get_spark(app_name="cc-probe")
    for entry in entries:
        print(f"== {entry}")
        t0 = time.time()
        p = pairs_for(spark, sf_dir, entry)
        timed_components(p)
        print(f"  entry total {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
