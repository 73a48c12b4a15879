"""End-to-end training-corpus pipeline on the synthetic test data —
runnable documentation for the ext/ operator suite.

    python examples/corpus_pipeline.py [sf_dir]

Stages (each a named function so pieces can be lifted independently):
  1. ingest + URL hygiene        (scrub.canonicalize_urls)
  2. exact + near dedup          (dedup.exact_dedup, minhash bands)
  3. quality + language gates    (text.with_quality_scores, with_lang_id)
  4. decontamination             (text.decontaminate)
     + perplexity gate           (lm.perplexity_filter)
  5. target-aware selection      (retrieval.dsir_weights)
  6. balance + chunk + account   (pipeline.corpus_assembly_stats)

Stages stay lazy until the perplexity gate, which materializes the
surviving corpus once (localCheckpoint) because the LM trains on it and
then scores it; everything downstream reads the materialized frame. At 100 TB the same code runs with the inputs
swapped to the real corpus paths — stage shapes are documented in each
operator's docstring.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from bq_duckdb_spark import get_spark
    from bq_duckdb_spark.ext import dedup, lm, pipeline, retrieval, text
    from bq_duckdb_spark.testdata import load_table

    spark = get_spark(app_name="corpus-pipeline-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup on content hash
    deduped = dedup.exact_dedup(
        docs.withColumn("__h", F.md5(F.col("text"))), ["__h"], "doc_id"
    ).drop("__h")

    # 2. near-dup candidate pairs (MinHash bands); drop the higher id of
    #    every confirmed near-dup pair
    pairs = dedup.ngram_jaccard_pairs(
        deduped, "text", "doc_id", threshold=0.8
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    surviving = deduped.join(losers, "doc_id", "left_anti")

    # 3. quality + language gates
    scored = text.with_lang_id(text.with_quality_scores(surviving))
    gated = scored.filter(
        (F.col("n_words") >= 10) & (F.col("distinct_ratio") >= 0.2)
    )

    # 4. decontaminate against a held-out eval sample
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    contaminated = text.decontaminate(gated, ev, n=8).select("doc_id")
    clean = gated.join(contaminated, "doc_id", "left_anti")

    # 4b. perplexity gate: drop documents far out of distribution under
    #     a unigram LM trained on the surviving corpus itself (the
    #     held-out CCNet shape trains on a curated reference instead —
    #     same call, different `ref`).  `clean` is materialized first:
    #     the gate consumes it three times (LM training, scoring, the
    #     survivor semi-join) and the counts below read it again — an
    #     un-cached lineage would re-run the dedup/gate/decontam chain
    #     on every pass
    clean = clean.localCheckpoint(eager=True)
    surviving_lm = lm.perplexity_filter(clean, clean, max_nll=4.0)

    # 5. DSIR importance weights against the same target sample; keep
    #    the top half by weight. The cut uses a sketched quantile
    #    broadcast as a scalar — NOT a global rank window, which would
    #    funnel the corpus through one partition.
    weights = retrieval.dsir_weights(surviving_lm, ev)
    median = weights.agg(
        F.expr("percentile_approx(dsir, 0.5)").alias("__cut")
    )
    selected = (
        surviving_lm.join(weights, "doc_id")
        .crossJoin(F.broadcast(median))
        .filter(F.col("dsir") >= F.col("__cut"))
        .drop("__cut")
    )

    # 6. balance per language and report dataset-card stats
    stats = pipeline.corpus_assembly_stats(selected.select("doc_id", "lang", "text"))

    print(f"input docs:     {docs.count()}")
    print(f"after dedup:    {surviving.count()}")
    print(f"after gates:    {gated.count()}")
    print(f"after decontam: {clean.count()}")
    print(f"after LM gate:  {surviving_lm.count()}")
    print(f"selected:       {selected.count()}")
    print("per-language dataset card:")
    for r in stats.orderBy("lang").collect():
        print(
            f"  {r.lang}: docs={r.n_docs} tokens={r.total_tokens} "
            f"chunks={r.n_chunks}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:2])
