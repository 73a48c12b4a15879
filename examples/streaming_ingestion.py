"""Streaming corpus ingestion on the synthetic test data — runnable
documentation for the streaming/ surface:

    python examples/streaming_ingestion.py [sf_dir]

An "arriving shard" of documents flows through:
  1. ingestion-time repetition filtering   (stateless map-only gates)
  2. near-dup probe vs the existing corpus (stateless LSH banding +
                                            stream-static equi-join)
  3. quality scoring under a model trained batch-side
                                           (apply_logreg — map-only)
  4. CDC MERGE upsert of accepted docs into an engine table
                                           (foreachBatch, engine MERGE)

No stage needs streaming state: every model artifact (merge list,
weights, banded corpus) is either a driver-sized literal or a static
frame — the shapes that scale to continuous 100 TB ingestion.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from bq_duckdb_spark import get_spark
    from bq_duckdb_spark.engine import Session
    from bq_duckdb_spark.ext.retrieval import apply_logreg, train_logreg
    from bq_duckdb_spark.streaming import streams
    from bq_duckdb_spark.testdata import load_table

    spark = get_spark(app_name="streaming-ingestion-example")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)      # "existing" corpus
    arriving = docs.filter(F.col("doc_id") % 11 == 0)    # the new shard

    # batch-side model artifacts (driver-sized / static)
    weights = train_logreg(
        corpus, "CAST(lang = 'en' AS INT)", n_buckets=64, iters=8, lr=4.0
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "arriving")
        arriving.write.parquet(src)
        stream = streams.read_document_stream(spark, src)

        # 1. stateless quality gate
        gated = streams.stream_repetition_filter(stream)
        # 2. which arriving docs near-duplicate the corpus?
        dups = streams.stream_near_dup_probe(stream, corpus, threshold=0.3)
        q_dup = streams.run_available_now(
            dups.select("stream_id").distinct(), "dup_ids"
        )
        # 3. score the gated stream under the trained model
        scored = apply_logreg(gated, weights)
        q_score = streams.run_available_now(scored, "scored_docs")
        q_dup.stop(); q_score.stop()

        n_dup = spark.sql("SELECT count(*) AS n FROM dup_ids").collect()[0].n
        # quality filters threshold at a QUANTILE of the score
        # distribution, not at the nominal 0.5 (the synthetic corpus
        # shares one vocabulary across langs, so absolute probabilities
        # cluster tightly — exactly why production filters calibrate)
        accepted = spark.sql(
            "SELECT s.doc_id AS k, CAST(s.prob AS STRING) AS v "
            "FROM scored_docs s LEFT ANTI JOIN dup_ids d ON s.doc_id = d.stream_id "
            "WHERE s.prob >= (SELECT percentile_approx(prob, 0.5) FROM scored_docs)"
        )
        print(f"near-dups of corpus rejected: {n_dup}")
        print(f"accepted after gates+score:   {accepted.count()}")

        # 4. upsert the accepted docs into an engine table per micro-batch
        sess = Session(spark)
        sess.query("CREATE TABLE ingested (k INT64, v STRING)")
        chg = os.path.join(tmp, "changes")
        accepted.write.parquet(chg)
        chg_stream = spark.readStream.schema("k long, v string").parquet(chg)
        merge_sql = (
            "MERGE INTO ingested USING stream_src ON ingested.k = stream_src.k "
            "WHEN MATCHED THEN UPDATE SET v = stream_src.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (stream_src.k, stream_src.v)"
        )
        q = (
            chg_stream.writeStream.foreachBatch(
                streams.merge_each_batch(sess, merge_sql)
            )
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = sess.query("SELECT COUNT(*) AS n FROM ingested").collect()[0].n
        print(f"rows upserted into engine table: {n}")
        assert n > 0
    print("streaming-ingestion pipeline complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
