"""Model-assisted corpus curation on the synthetic test data — the
"train the filter on the corpus you are about to filter" loop every
modern data pipeline runs, composed from the tier-5 operators:

    python examples/model_curation.py [sf_dir]

  1. fit a quality classifier      (retrieval.train_logreg — distributed
                                    full-batch GD, is-English label)
  2. score every document          (retrieval.apply_logreg — map-only)
  3. fill a token budget by score  (operators.budget.take_until_budget —
                                    distributed exact prefix sum)
  4. cluster what survived         (ext.cluster.kmeans_assign over the
                                    embeddings of kept docs)
  5. report the cluster mixture    (one groupBy)

At 100 TB the same code runs with the inputs swapped: the model and
centroids are driver-sized literals, scoring/selection are a scan + one
range partition, clustering is one shuffle per Lloyd's round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from bq_duckdb_spark import get_spark
    from bq_duckdb_spark.ext.cluster import kmeans_assign
    from bq_duckdb_spark.ext.retrieval import apply_logreg, train_logreg
    from bq_duckdb_spark.ext.text import with_token_count
    from bq_duckdb_spark.operators.budget import take_until_budget
    from bq_duckdb_spark.testdata import load_table

    spark = get_spark(app_name="model-curation-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. train: logistic regression, hashed bag-of-words, 3 GD rounds
    w = train_logreg(docs, "CAST(lang = 'en' AS INT)", n_buckets=64, iters=3)
    print(f"trained {sum(1 for x in w if x)} active weights")

    # 2-3. score, then greedily fill a 15k-token budget best-first
    scored = apply_logreg(docs, w).join(
        with_token_count(docs).select("doc_id", "n_tokens"), "doc_id"
    )
    kept = take_until_budget(
        scored,
        [F.col("prob").desc(), F.col("doc_id")],
        "n_tokens",
        15_000,
        out_col="cum_tokens",
    )
    n_kept = kept.count()
    print(f"kept {n_kept} docs within the token budget")

    # 4-5. cluster the kept docs' embeddings, report the mixture
    emb = load_table(spark, sf_dir, "embeddings")
    kept_emb = emb.join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    cells = kmeans_assign(kept_emb, k=4, iters=2)
    mixture = cells.groupBy("cell").agg(F.count("*").alias("n")).orderBy("cell")
    for r in mixture.collect():
        print(f"  cluster {r.cell}: {r.n} docs")
    assert n_kept > 0
    print("model-curation pipeline complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
