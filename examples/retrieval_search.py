"""Hybrid lexical+vector search over the synthetic corpus — runnable
documentation for the retrieval/fusion operator suite.

    python examples/retrieval_search.py [sf_dir]

Stages:
  1. index at rest            (tf_idf materialized once — the table every
                               query reuses; engine.materialize is the
                               warehouse equivalent)
  2. lexical retriever        (retrieval.bm25_scores)
  3. second retriever         (retrieval.tfidf_query_scores — TF-IDF
                               cosine against the same query bag)
  4. rank fusion              (retrieval.rrf_fuse, k=60)
  5. dedup-aware hygiene      (dedup_portable.portable_containment_pairs:
                               drop results that are near-subsets of a
                               higher-ranked hit, the classic SERP dedup)

At 100 TB, stage 1 is the one corpus-scale job (vocabulary-keyed
shuffles inside tf_idf); every later stage is candidate-sized.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from bq_duckdb_spark import get_spark
    from bq_duckdb_spark.ext import retrieval
    from bq_duckdb_spark.ext.dedup_portable import portable_containment_pairs
    from bq_duckdb_spark.testdata import load_table

    spark = get_spark(app_name="retrieval-search", cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    query = ["join", "window", "customer"]

    bm = retrieval.ranked_topn(retrieval.bm25_scores(docs, query), "bm25")
    cos = retrieval.ranked_topn(
        retrieval.tfidf_query_scores(docs, query), "score"
    )
    fused = (
        retrieval.rrf_fuse([bm, cos], k=60)
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(20)
    )

    print("== fused top-10 (doc_id, rrf, lists) ==")
    for r in fused.limit(10).collect():
        print(f"  {r.doc_id:>6}  {r.rrf:.6f}  in {r.n_lists} list(s)")

    # SERP hygiene: a hit that is a near-subset of a higher-ranked hit
    # adds no information — flag containment pairs among the top hits
    hits = docs.join(fused.select("doc_id"), "doc_id")
    dups = portable_containment_pairs(
        hits, "text", "doc_id", threshold=0.7
    ).collect()
    print(f"== containment pairs among top-20: {len(dups)} ==")
    for r in dups[:5]:
        print(
            f"  {r.id_a} ⊇/⊆ {r.id_b}: "
            f"a_in_b={r.containment_a:.2f} b_in_a={r.containment_b:.2f}"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
