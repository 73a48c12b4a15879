"""Structured Streaming operators: streamed results must agree with the
equivalent batch computation over the same files."""

import shutil

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark import streaming

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(SRC, str(d / "part-000.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark):
    from bq_duckdb_spark.testdata import normalize_event_ts

    df = spark.read.parquet(SRC)
    return normalize_event_ts(df)


def test_windowed_counts_match_batch(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    # complete mode: append would (correctly) hold back windows newer
    # than the watermark horizon, but here we want all of them to compare
    # against the batch result
    q = streaming.run_available_now(
        streaming.windowed_counts(stream, window="6 hours"),
        "win_counts",
        output_mode="complete",
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win_counts").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            batch_events.groupBy(
                F.window("ts", "6 hours").alias("win"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
            .collect()
        )
    }
    assert got.keys() == expected.keys()
    for k, (n, total) in expected.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(total)
    q.stop()


def test_session_windows_stream(spark, stream_dir):
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_available_now(
        streaming.session_windows(stream, gap="30 minutes"), "sessions"
    )
    sessions = spark.table("sessions").collect()
    assert len(sessions) > 0
    by_user = {}
    for r in sessions:
        assert r.session_end >= r.session_start
        by_user.setdefault(r.user_id, []).append(r)
    # sessions of one user never overlap
    for rs in by_user.values():
        rs.sort(key=lambda r: r.session_start)
        for a, b in zip(rs, rs[1:]):
            assert a.session_end <= b.session_start
    q.stop()


def test_stateful_user_stats(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_available_now(
        streaming.stateful_user_stats(stream), "user_stats", output_mode="update"
    )
    # update mode: take the last emitted row per user
    got = {}
    for r in spark.table("user_stats").collect():
        got[r.user_id] = (r.n_events, r.total_value, r.max_value)
    expected = {
        r.user_id: (r.n, r.total, r.mx)
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got.keys() == expected.keys()
    for uid, (n, total, mx) in expected.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(total)
        assert got[uid][2] == pytest.approx(mx)
    q.stop()


def test_incremental_second_file_appends(spark, stream_dir, tmp_path):
    """New files are picked up incrementally by a second availableNow
    drain (checkpointed file tracking)."""
    out = str(tmp_path / "chk")
    stream = streaming.read_event_stream(spark, stream_dir)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        counts.writeStream.format("memory")
        .queryName("inc_counts")
        .outputMode("complete")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = {r.event_type: r.n for r in spark.table("inc_counts").collect()}
    # add a second copy of the data → counts double on the next drain
    shutil.copy(SRC, stream_dir + "/part-001.parquet")
    q2 = (
        counts.writeStream.format("memory")
        .queryName("inc_counts")
        .outputMode("complete")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    second = {r.event_type: r.n for r in spark.table("inc_counts").collect()}
    assert second == {k: 2 * v for k, v in first.items()}


def test_watermark_drops_late_data(spark, tmp_path):
    """Events older than the watermark horizon are dropped once the
    watermark has advanced past their window (bounded state semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_stream"
    d.mkdir()
    hour = 3_600_000_000_000  # ns
    base = 1_700_000_000_000_000_000

    def write(name, rows):
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }), str(d / name))

    # batch 1: events at t0 and t0+10h (advances watermark way past t0)
    write("p0.parquet", [(1, base), (2, base + 10 * hour)])
    stream = streaming.read_event_stream(spark, str(d))
    counts = streaming.windowed_counts(stream, window="1 hour", watermark="2 hours")
    chk, out = str(tmp_path / "chk"), str(tmp_path / "out")

    def drain():
        # parquet sink: append-mode + checkpoint recovery (memory sink
        # can't resume an append-mode checkpoint)
        q = (counts.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", chk)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return [(r.window_start, r.n_events)
                for r in spark.read.parquet(out).collect()]

    first = drain()
    # only the t0 window is finalized (the +10h window is above the
    # watermark horizon and still open)
    assert sorted(n for _, n in first) == [1]
    # batch 2: a late event back at t0 — beyond the 2h watermark horizon
    write("p1.parquet", [(3, base)])
    second = drain()
    # the late arrival is dropped: no new/updated emission for t0
    assert sorted(second) == sorted(first)


def test_batch_session_window_agrees_with_lag_formulation(spark):
    """F.session_window in batch mode produces the same session count
    per user as the lag+cumsum sessionization (q_sessionize)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    lag_based = m.queries()["q_sessionize"](spark, sf)
    lag_sessions = (
        lag_based.groupBy("user_id")
        .agg(F.max("session_seq").alias("max_seq"))
        .selectExpr("user_id", "max_seq + 1 AS n_sessions")
    )
    from bq_duckdb_spark.testdata import load_table

    ev = load_table(spark, sf, "events")
    sw = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    a = {r.user_id: r.n_sessions for r in lag_sessions.collect()}
    b = {r.user_id: r.n_sessions for r in sw.collect()}
    assert a == b


def test_stream_dedup_exact_drops_in_watermark_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first occurrence of each
    key; duplicates arriving within the watermark horizon are dropped.
    Streamed dedup count must equal the batch distinct-key count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "dup_stream"
    d.mkdir()
    base_us = 1_700_000_000_000_000
    # event_id 1 appears three times (same/near ts), 2 and 3 once
    rows_ = [
        (1, base_us * 1000, 10, "click", 1.0, "{}"),
        (1, (base_us + 1_000_000) * 1000, 10, "click", 1.0, "{}"),
        (2, (base_us + 2_000_000) * 1000, 11, "view", 2.0, "{}"),
        (1, (base_us + 3_000_000) * 1000, 10, "click", 1.0, "{}"),
        (3, (base_us + 4_000_000) * 1000, 12, "view", 3.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows_], pa.int64()),
            "ts": pa.array([r[1] for r in rows_], pa.int64()),
            "user_id": pa.array([r[2] for r in rows_], pa.int64()),
            "event_type": pa.array([r[3] for r in rows_]),
            "value": pa.array([r[4] for r in rows_], pa.float64()),
            "props": pa.array([r[5] for r in rows_]),
        }
    )
    pq.write_table(table, str(d / "part-000.parquet"))

    stream = streaming.read_event_stream(spark, str(d))
    deduped = streaming.stream_dedup_exact(stream, ["event_id"], watermark="1 hour")
    q = streaming.run_available_now(deduped, "dedup_stream")
    try:
        got = spark.sql(
            "SELECT event_id, count(*) AS c FROM dedup_stream GROUP BY event_id"
        ).collect()
        counts = {r.event_id: r.c for r in got}
        assert counts == {1: 1, 2: 1, 3: 1}
    finally:
        q.stop()


def test_stream_repetition_filter_matches_batch(spark, tmp_path):
    from bq_duckdb_spark.ext.pipeline import repetition_filter
    from bq_duckdb_spark.streaming import streams

    rows = [
        (1, "spam spam spam spam spam spam", "en", "s", 29),
        (2, "all words here are fully distinct", "en", "s", 33),
        (3, "loop loop loop loop once more now", "en", "s", 33),
    ]
    src = str(tmp_path / "docs_src")
    batch = spark.createDataFrame(rows, streams.DOC_SCHEMA)
    batch.write.parquet(src)

    stream = streams.read_document_stream(spark, src)
    q = streams.run_available_now(
        streams.stream_repetition_filter(stream), "rep_filtered"
    )
    got = {r.doc_id for r in spark.sql("SELECT * FROM rep_filtered").collect()}
    want = {r.doc_id for r in repetition_filter(batch, "text").collect()}
    assert got == want and 2 in got and 1 not in got
    q.stop()


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    from bq_duckdb_spark.ext.pipeline import decontaminate
    from bq_duckdb_spark.streaming import streams
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    heldout = docs.filter(F.col("doc_id") % 7 == 0)

    src = str(tmp_path / "corpus_src")
    out = str(tmp_path / "clean_out")
    ckpt = str(tmp_path / "ckpt")
    # two files → two micro-batches (shard-at-a-time)
    corpus.filter(F.col("doc_id") < 250).write.parquet(src)
    corpus.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)

    stream = streams.read_document_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(
            streams.decontaminate_each_batch(heldout, "text", "doc_id", n=5, out_dir=out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    want = {
        r.doc_id
        for r in decontaminate(corpus, heldout, "text", "doc_id", n=5)
        .select("doc_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_mixture_matches_batch(spark, tmp_path):
    from bq_duckdb_spark.ext.pipeline import mixture_sample
    from bq_duckdb_spark.streaming import streams

    rows = [
        (i, "w " * (i % 5 + 1), "en", f"src{i % 3}", 10 + i) for i in range(30)
    ]
    src = str(tmp_path / "mix_src")
    batch = spark.createDataFrame(rows, streams.DOC_SCHEMA)
    batch.write.parquet(src)

    weights = {"src0": 2.5, "src1": 0.5, "src2": 0.0}
    stream = streams.read_document_stream(spark, src)
    q = streams.run_available_now(
        streams.stream_mixture(stream, weights=weights, seed=5).select(
            "doc_id", "source", "epoch"
        ),
        "mixture_stream",
    )
    got = sorted(
        (r.doc_id, r.epoch)
        for r in spark.sql("SELECT * FROM mixture_stream").collect()
    )
    want = sorted(
        (r.doc_id, r.epoch)
        for r in mixture_sample(batch, "source", "doc_id", weights, seed=5).collect()
    )
    assert got == want and len(got) > 0
    q.stop()


def test_click_attribution_stream_matches_batch(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    streaming.run_available_now(
        streaming.click_attribution(stream), "click_attr"
    )
    got = {
        (r.click_id, r.view_id) for r in spark.table("click_attr").collect()
    }
    want = {
        (r.click_id, r.view_id)
        for r in streaming.click_attribution(batch_events).collect()
    }
    assert got == want
    assert len(want) > 0


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", str(d / "part-000.parquet")
    )
    return str(d)


def test_streaming_classifier_matches_batch(spark, doc_stream_dir):
    """Map-only tier-4 operators are streaming-safe as-is: the same
    classify_documents call works on a readStream frame and emits
    exactly the batch result (no state, no watermark needed)."""
    from bq_duckdb_spark.ext.retrieval import classify_documents

    stream = streaming.read_document_stream(spark, doc_stream_dir)
    q = streaming.run_available_now(
        classify_documents(stream), "cls_stream"
    )
    got = {r.doc_id: (r.prob, r.label) for r in spark.table("cls_stream").collect()}
    batch = spark.read.parquet(doc_stream_dir)
    want = {
        r.doc_id: (r.prob, r.label) for r in classify_documents(batch).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_url_canonical_matches_batch(spark, doc_stream_dir):
    from bq_duckdb_spark.ext.scrub import canonicalize_urls

    stream = streaming.read_document_stream(spark, doc_stream_dir).selectExpr(
        "doc_id", "concat('HTTPS://Ex.COM:443/p/', doc_id, '/?utm_a=1&k=', doc_id % 3) AS url"
    )
    q = streaming.run_available_now(canonicalize_urls(stream), "url_stream")
    got = {r.doc_id: r.canon_url for r in spark.table("url_stream").collect()}
    assert len(got) > 0
    for doc_id, canon in got.items():
        # the slash before '?' is path content, not a trailing slash —
        # only end-of-string slashes are stripped
        assert canon == f"https://ex.com/p/{doc_id}/?k={doc_id % 3}"


def test_stream_static_score_join_matches_batch(spark, doc_stream_dir):
    """Stream-static join: arriving document shards scored against a
    PRECOMPUTED (static) weight table — the production shape for
    incremental corpus scoring. The static side is re-read per
    micro-batch by Spark; no state, no watermark."""
    from bq_duckdb_spark.ext.retrieval import dsir_weights

    batch = spark.read.parquet(doc_stream_dir)
    target = batch.filter(F.col("doc_id") % 50 == 0)
    weights = dsir_weights(batch, target).withColumnRenamed("dsir", "w")

    stream = streaming.read_document_stream(spark, doc_stream_dir).select(
        "doc_id", "lang"
    )
    q = streaming.run_available_now(
        stream.join(weights, "doc_id"), "scored_stream"
    )
    got = {r.doc_id: r.w for r in spark.table("scored_stream").collect()}
    want = {r.doc_id: r.w for r in batch.select("doc_id").join(weights, "doc_id").collect()}
    assert got == want and len(got) > 0


def test_stream_near_dup_probe_matches_batch(spark, tmp_path):
    """Streamed LSH probe against a static corpus == batch
    cross_corpus_near_dups (after collapsing per-band duplicates),
    across multiple micro-batches."""
    from pyspark.sql import functions as F

    from bq_duckdb_spark.ext.dedup_portable import cross_corpus_near_dups
    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    incoming = docs.filter(F.col("doc_id") % 11 == 0)

    src = str(tmp_path / "arriving")
    # two shard files -> two micro-batches
    incoming.filter(F.col("doc_id") < 250).write.parquet(src)
    incoming.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)

    stream = streams.read_document_stream(spark, src, max_files_per_trigger=1)
    q = streams.run_available_now(
        streams.stream_near_dup_probe(stream, corpus, threshold=0.3),
        "near_dup_probe",
    )
    got = {
        (r.corpus_id, r.stream_id)
        for r in spark.sql(
            "SELECT DISTINCT corpus_id, stream_id FROM near_dup_probe"
        ).collect()
    }
    q.stop()
    want = {
        (r.corpus_id, r.batch_id)
        for r in cross_corpus_near_dups(
            corpus, incoming, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_near_dup_probe_is_stateless(spark, tmp_path):
    """The probe plan must need no streaming state: no watermark, no
    stateful operator in the progress metrics."""
    import json

    from pyspark.sql import functions as F

    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "arriving2")
    docs.filter(F.col("doc_id") % 17 == 0).write.parquet(src)
    stream = streams.read_document_stream(spark, src)
    q = streams.run_available_now(
        streams.stream_near_dup_probe(
            stream, docs.filter(F.col("doc_id") % 17 != 0), threshold=0.3
        ),
        "near_dup_stateless",
    )
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    assert progress, "stream produced no progress"
    for p in progress:
        for op in p.get("stateOperators", []):
            assert op.get("numRowsTotal", 0) == 0


def test_streaming_merge_upsert_matches_batch(spark, tmp_path):
    """CDC upsert: micro-batches MERGEd into an engine table through
    foreachBatch end in the same state as one batch MERGE of all the
    changes (updates are idempotent functions of the key, so trigger
    order cannot matter)."""
    from bq_duckdb_spark.engine import Session
    from bq_duckdb_spark.streaming import streams

    merge_sql = (
        "MERGE INTO tgt USING stream_src ON tgt.k = stream_src.k "
        "WHEN MATCHED THEN UPDATE SET v = stream_src.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (stream_src.k, stream_src.v)"
    )

    def fresh_target(sess):
        sess.query("CREATE TABLE tgt (k INT64, v STRING)")
        sess.query(
            "INSERT INTO tgt VALUES (1, 'old1'), (2, 'old2'), (3, 'old3')"
        )

    # the change stream: two shard files with overlapping keys; v is a
    # pure function of k so replay/order is immaterial
    changes = spark.createDataFrame(
        [(2, "new2"), (4, "new4"), (3, "new3"), (5, "new5")], "k: long, v: string"
    )
    src = str(tmp_path / "changes")
    changes.filter("k <= 3").write.parquet(src)
    changes.filter("k > 3").write.mode("append").parquet(src)

    sess = Session(spark)
    fresh_target(sess)
    stream = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(streams.merge_each_batch(sess, merge_sql))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in sess.query("SELECT k, v FROM tgt").collect()
    )

    batch_sess = Session(spark)
    fresh_target(batch_sess)
    batch_sess.register_dataframe("stream_src", changes)
    batch_sess.query(merge_sql)
    want = sorted(
        tuple(r) for r in batch_sess.query("SELECT k, v FROM tgt").collect()
    )
    assert got == want
    assert dict(got)[2] == "new2" and dict(got)[5] == "new5"


def test_streaming_kmeans_assignment_matches_batch(spark, tmp_path):
    """Cluster assignment under literal trained centroids is map-only,
    so it streams unchanged: assignments of a streamed embedding table
    equal the batch closing assignment."""
    from bq_duckdb_spark.ext.cluster import (
        assign_cells,
        kmeans_assign,
        train_kmeans_centroids,
    )
    from bq_duckdb_spark.streaming import streams

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = {
        r.vec_id: r.cell for r in kmeans_assign(emb, k=4, iters=2).collect()
    }
    cents = train_kmeans_centroids(emb, k=4, iters=2)
    src = str(tmp_path / "emb_stream")
    emb.write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = streams.run_available_now(assign_cells(stream, cents), "km_stream")
    got = {
        r.vec_id: r.cell
        for r in spark.sql("SELECT * FROM km_stream").collect()
    }
    q.stop()
    assert got == want


def test_streaming_logreg_scoring_matches_batch(spark, tmp_path):
    from bq_duckdb_spark.ext.retrieval import apply_logreg, train_logreg
    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = train_logreg(docs, "CAST(lang = 'en' AS INT)", n_buckets=32, iters=2)
    want = {r.doc_id: (r.prob, r.label) for r in apply_logreg(docs, w).collect()}
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = streams.run_available_now(apply_logreg(stream, w), "lr_stream")
    got = {
        r.doc_id: (r.prob, r.label)
        for r in spark.sql("SELECT * FROM lr_stream").collect()
    }
    q.stop()
    assert got == want and len(got) == 500


def test_merge_each_batch_replay_is_idempotent(spark):
    """foreachBatch may redeliver a batch after a restart (the sink saw
    it, the checkpoint did not commit): applying the same batch twice
    through merge_each_batch must leave the engine table unchanged —
    the property that makes the CDC upsert restart-safe."""
    from bq_duckdb_spark.engine import Session
    from bq_duckdb_spark.streaming import streams

    sess = Session(spark)
    sess.query("CREATE TABLE tgt_r (k INT64, v STRING)")
    sess.query("INSERT INTO tgt_r VALUES (1, 'old1')")
    merge_sql = (
        "MERGE INTO tgt_r USING stream_src ON tgt_r.k = stream_src.k "
        "WHEN MATCHED THEN UPDATE SET v = stream_src.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (stream_src.k, stream_src.v)"
    )
    writer = streams.merge_each_batch(sess, merge_sql)
    batch = spark.createDataFrame([(1, "new1"), (2, "new2")], "k: long, v: string")
    writer(batch, 0)
    once = sorted(tuple(r) for r in sess.query("SELECT k, v FROM tgt_r").collect())
    writer(batch, 0)  # replay of the same batch id
    twice = sorted(tuple(r) for r in sess.query("SELECT k, v FROM tgt_r").collect())
    assert once == twice == [(1, "new1"), (2, "new2")]


def test_view_conversion_outer_stream_matches_batch(spark, tmp_path):
    """LEFT OUTER interval join parity: the null (never-converted) rows
    only flush once the click-side watermark passes view_ts + horizon,
    which needs batches AFTER the data — staged here as data file ->
    sentinel file -> sentinel file with one file per trigger."""
    import pyspark.sql.functions as F

    src = tmp_path / "outer_join_src"
    src.mkdir()
    base = spark.read.parquet(SRC)
    from bq_duckdb_spark.testdata import normalize_event_ts

    base = normalize_event_ts(base)
    # a small slice keeps the join cheap; both event types present.
    # file-source streams want plain files, not write.parquet dirs —
    # stage each microbatch's file via pandas
    data = base.where(F.col("event_id") < 2000)
    data.toPandas().to_parquet(str(src / "f1.parquet"))
    # sentinels: far-future view+click for a user id outside the data,
    # advancing BOTH sides' watermarks past every real view's horizon
    far = data.agg(F.max("ts")).first()[0]
    sent = spark.createDataFrame(
        [
            (10_000_001, far, 999_999, "view", 0.0, "{}"),
            (10_000_002, far, 999_999, "click", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    sent.toPandas().to_parquet(str(src / "f2.parquet"))
    sent.withColumn("event_id", F.col("event_id") + 10).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 DAYS")
    ).toPandas().to_parquet(str(src / "f3.parquet"))

    stream = streaming.read_event_stream(spark, str(src), max_files_per_trigger=1)
    out_dir = tmp_path / "outer_out"
    ckpt = tmp_path / "outer_ckpt"
    q = (
        streaming.view_conversion_outer(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    # the sentinels' own rows sit past the final watermark (their null
    # rows can never flush — that's the semantics being tested), so
    # compare the REAL users only
    got = {
        (r.view_id, r.click_id)
        for r in spark.read.parquet(str(out_dir)).collect()
        if r.user_id != 999_999
    }
    everything = normalize_event_ts(spark.read.parquet(str(src)))
    expected = {
        (r.view_id, r.click_id)
        for r in streaming.view_conversion_outer(everything).collect()
        if r.user_id != 999_999
    }
    # every matched pair AND every never-converted (null-click) view
    assert got == expected
    assert any(c is None for _, c in expected)  # the test exercises nulls


def test_stateful_ewma_matches_batch(spark, tmp_path):
    """Streamed O(1)-state EWMA across two time-ordered micro-batches ==
    the batch operator's final row per key (same fold, same order)."""
    import pandas as pd
    from pyspark.sql.window import Window

    from bq_duckdb_spark.operators.timeseries import ewma as batch_ewma

    d = tmp_path / "ewma_stream"
    d.mkdir()
    rows = [
        (eid, uid, float(v))
        for eid, (uid, v) in enumerate(
            [(1, 10), (1, 20), (2, 5), (1, 3), (2, 9), (2, 1)]
        )
    ]
    # two single-file batches split at the time midpoint (file-source
    # streaming needs real files, not directories; see memory notes)
    cols = ["event_id", "user_id", "value"]
    early = pd.DataFrame(rows[:3], columns=cols)
    late = pd.DataFrame(rows[3:], columns=cols)
    for name, pdf in [("a.parquet", early), ("b.parquet", late)]:
        pdf["ts"] = pd.to_datetime(pdf["event_id"], unit="h")
        pdf.to_parquet(str(d / name), index=False)

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = streaming.run_available_now(
        streaming.stateful_ewma(stream, alpha=0.3), "ewma_out",
        output_mode="update",
    )
    got = {r.user_id: r.ewma for r in spark.table("ewma_out").collect()}
    q.stop()

    batch = batch_ewma(
        spark.read.parquet(str(d)), ["user_id"], ["ts", "event_id"],
        "value", 0.3,
    )
    want = {
        r.user_id: r.ewma
        for r in batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert got.keys() == want.keys()
    for uid in want:
        assert got[uid] == want[uid], uid  # bit-identical sequential folds


def test_stream_dedup_crash_recovery_resumes_from_checkpoint(spark, tmp_path):
    """Kill the stateful dedup stream mid-run (a foreachBatch sink that
    dies on its second micro-batch), restart the SAME checkpoint with a
    healthy sink, and require (a) the failed batch is re-delivered and
    applied exactly once, and (b) dedup state from batches committed
    BEFORE the crash survives the restart — a duplicate key arriving
    after recovery is still dropped. Final output must equal the batch
    distinct-key result over all files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "crash_src"
    src.mkdir()
    out = tmp_path / "crash_out"
    out.mkdir()
    chk = str(tmp_path / "crash_chk")
    base_us = 1_700_000_000_000_000

    def write_file(name, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [(base_us + r[1]) * 1000 for r in rows], pa.int64()
                    ),
                    "user_id": pa.array([7] * len(rows), pa.int64()),
                    "event_type": pa.array(["e"] * len(rows)),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            str(src / name),
        )

    # three files -> three micro-batches (maxFilesPerTrigger=1).
    # key 1 recurs in files 2 and 3: dropping it there requires the
    # state written by batch 0 to survive the crash and the restart.
    write_file("f0.parquet", [(1, 0), (2, 1_000_000)])
    write_file("f1.parquet", [(1, 2_000_000), (3, 3_000_000)])
    write_file("f2.parquet", [(1, 4_000_000), (3, 5_000_000), (4, 6_000_000)])

    def dedup_stream():
        stream = streaming.read_event_stream(
            spark, str(src), max_files_per_trigger=1
        )
        return streaming.stream_dedup_exact(
            stream, ["event_id"], watermark="2 hours"
        )

    def sink(crash_on_second: bool):
        seen = []

        def _write(batch_df, batch_id):
            if crash_on_second and len(seen) == 1:
                raise RuntimeError("injected sink crash")
            seen.append(batch_id)
            # overwrite-by-batch-id: idempotent under re-delivery
            batch_df.write.mode("overwrite").parquet(
                str(out / f"batch-{batch_id}")
            )

        return _write

    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (
        dedup_stream()
        .writeStream.foreachBatch(sink(crash_on_second=True))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected sink crash"):
        q.awaitTermination()

    # restart from the same checkpoint with a healthy sink
    q2 = (
        dedup_stream()
        .writeStream.foreachBatch(sink(crash_on_second=False))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = sorted(
        r.event_id
        for r in spark.read.parquet(str(out / "batch-*")).collect()
    )
    want = sorted(
        r.event_id
        for r in spark.read.parquet(str(src)).dropDuplicates(["event_id"]).collect()
    )
    assert got == want == [1, 2, 3, 4]


def test_stream_substring_dedup_matches_batch(spark, tmp_path):
    from bq_duckdb_spark.ext.pipeline import substring_dedup
    from bq_duckdb_spark.streaming import streams
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src = str(tmp_path / "sub_src")
    out = str(tmp_path / "sub_out")
    state = str(tmp_path / "sub_state")
    ckpt = str(tmp_path / "sub_ckpt")
    # three id-ordered shards → three micro-batches (the streamed==batch
    # contract requires ascending-id shard arrival)
    docs.filter(F.col("doc_id") < 150).write.parquet(src)
    docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 320)).write.mode(
        "append"
    ).parquet(src)
    docs.filter(F.col("doc_id") >= 320).write.mode("append").parquet(src)

    stream = streams.read_document_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(
            streams.substring_dedup_each_batch(
                "text", "doc_id", k=8, out_dir=out, state_dir=state
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def read_out():
        return {
            (r["doc_id"], r["text"], r["n_tokens"], r["removed_tokens"])
            for r in spark.read.parquet(out)
            .select("doc_id", "text", "n_tokens", "removed_tokens")
            .collect()
        }

    got = read_out()
    want = {
        (r["doc_id"], r["text"], r["n_tokens"], r["removed_tokens"])
        for r in substring_dedup(docs, "text", "doc_id", k=8).collect()
    }
    assert got == want and len(got) == 500
    # cross-batch state actually fired: later shards lost tokens to
    # windows first seen in earlier shards
    assert any(r[3] > 0 for r in got)

    # retry idempotence: re-running an already-committed batch (its
    # state write included) must leave the output unchanged — the
    # seen-set read filters to batches strictly earlier, so the batch
    # does not see its own keys, and the per-batch subdir overwrite
    # replaces rather than duplicates
    writer = streams.substring_dedup_each_batch(
        "text", "doc_id", k=8, out_dir=out, state_dir=state
    )
    writer(docs.filter(F.col("doc_id") < 150), 0)
    assert read_out() == want


def test_stream_heavy_hitter_summary_guarantee(spark, tmp_path):
    from bq_duckdb_spark.streaming import streams

    # planted-skew item stream: 3 heavy items among 400 tail types,
    # split into 3 shard files
    rows = [(f"heavy{i}",) for i in range(3) for _ in range(300)]
    rows += [(f"tail{i}",) for i in range(400) for _ in range(2)]
    import random

    rnd = random.Random(7)
    rnd.shuffle(rows)
    n = len(rows)
    third = len(rows) // 3
    src = str(tmp_path / "hh_src")
    state = str(tmp_path / "hh_state")
    ckpt = str(tmp_path / "hh_ckpt")
    df = spark.createDataFrame(rows, "term: string")
    df.limit(third).write.parquet(src)
    spark.createDataFrame(rows[third : 2 * third], "term: string").write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows[2 * third :], "term: string").write.mode(
        "append"
    ).parquet(src)

    s = 20
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            streams.heavy_hitter_summary_each_batch("term", s=s, state_dir=state)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql import functions as F

    final = spark.read.parquet(state)
    last = final.agg(F.max("batch").alias("b")).collect()[0]["b"]
    summary = {r["term"]: r["est"] for r in final.filter(F.col("batch") == last).collect()}
    # bounded state
    assert len(summary) <= s
    # guarantee: every item with count > n/(s+1) is present
    assert {"heavy0", "heavy1", "heavy2"} <= set(summary)  # 300 > n/(s+1)
    assert 300 * (s + 1) > n
    # estimates only ever undercount, by at most n/(s+1)
    for h in ("heavy0", "heavy1", "heavy2"):
        assert 300 - n / (s + 1) <= summary[h] <= 300

    # retry idempotence, unit-level (the streaming file source does not
    # guarantee which shard landed in which batch id, so replay with
    # KNOWN shards): drive the writer manually for batches 0..2, then
    # re-run batch 2 — its state write included — and assert the
    # summary is unchanged (the seen-state read filters to strictly
    # earlier batches, and the per-batch subdir overwrite replaces)
    state2 = str(tmp_path / "hh_state_manual")
    writer = streams.heavy_hitter_summary_each_batch("term", s=s, state_dir=state2)
    shards = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for i, shard in enumerate(shards):
        writer(spark.createDataFrame(shard, "term: string"), i)
    manual = {
        r["term"]: r["est"]
        for r in spark.read.parquet(state2).filter(F.col("batch") == 2).collect()
    }
    writer(spark.createDataFrame(shards[2], "term: string"), 2)
    retried = {
        r["term"]: r["est"]
        for r in spark.read.parquet(state2).filter(F.col("batch") == 2).collect()
    }
    assert retried == manual
    assert {"heavy0", "heavy1", "heavy2"} <= set(manual)
    # history pruning: only the latest batch and its predecessor remain
    import glob as _glob

    assert len(_glob.glob(state2 + "/batch=*")) <= 2

def test_stream_heavy_hitter_crash_recovery_from_checkpoint(spark, tmp_path):
    """Round-7: kill the MG-summary stream AFTER batch 1's state write
    lands but BEFORE its checkpoint commit (the nastiest re-delivery
    point — the retry must not read the batch's OWN partial state as
    'previous summary'), restart the SAME checkpoint with a healthy
    writer, and require the final summary to be byte-identical to a
    clean no-crash run over the same shard files."""
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from bq_duckdb_spark.streaming import streams

    rows = [(f"heavy{i}",) for i in range(3) for _ in range(300)]
    rows += [(f"tail{i}",) for i in range(400) for _ in range(2)]
    import random

    random.Random(11).shuffle(rows)
    third = len(rows) // 3
    shards = [rows[:third], rows[third : 2 * third], rows[2 * third :]]

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "hhc_src"
    src.mkdir()
    # explicit file names so both runs list (and batch) the shards in
    # the same order
    for i, shard in enumerate(shards):
        pq.write_table(
            pa.table({"term": pa.array([r[0] for r in shard])}),
            str(src / f"shard{i}.parquet"),
        )

    s = 20

    def run(state, ckpt, crash_on_batch1: bool):
        real = streams.heavy_hitter_summary_each_batch(
            "term", s=s, state_dir=state
        )

        def write(batch_df, batch_id):
            real(batch_df, batch_id)  # the state write LANDS first
            if crash_on_batch1 and batch_id == 1:
                raise RuntimeError("injected crash after state write")

        stream = (
            spark.readStream.schema("term string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return (
            stream.writeStream.foreachBatch(write)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def final_summary(state):
        df = spark.read.parquet(state)
        last = df.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return {
            r["term"]: r["est"]
            for r in df.filter(F.col("batch") == last).collect()
        }

    state_a, ckpt_a = str(tmp_path / "hhc_state"), str(tmp_path / "hhc_ckpt")
    q = run(state_a, ckpt_a, crash_on_batch1=True)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    # the crash left batch=1 state on disk but uncommitted in the
    # checkpoint — restart must re-deliver batch 1 and overwrite it
    q2 = run(state_a, ckpt_a, crash_on_batch1=False)
    q2.awaitTermination()

    state_b, ckpt_b = str(tmp_path / "hhc_state2"), str(tmp_path / "hhc_ckpt2")
    q3 = run(state_b, ckpt_b, crash_on_batch1=False)
    q3.awaitTermination()

    recovered, clean = final_summary(state_a), final_summary(state_b)
    assert recovered == clean
    assert {"heavy0", "heavy1", "heavy2"} <= set(recovered)
    assert len(recovered) <= s


def test_stream_event_pattern_matches_batch(spark, tmp_path):
    """Streamed automaton over three id-ordered event shards == the
    batch window formulation (contract_tier3.q_event_pattern), with at
    least one pattern spanning shard boundaries."""
    from bq_duckdb_spark import contract_tier3
    from bq_duckdb_spark.streaming import streams

    src = str(tmp_path / "pat_src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.filter(F.col("event_id") < 300).write.parquet(src)
    ev.filter((F.col("event_id") >= 300) & (F.col("event_id") < 700)).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("event_id") >= 700).write.mode("append").parquet(src)

    stream = streams.read_event_stream(spark, src, max_files_per_trigger=1)
    q = streams.run_available_now(
        streams.stream_event_pattern(stream), "pattern_out",
        output_mode="append",
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.view_id, r.click_id, r.purchase_id)
        for r in spark.table("pattern_out").collect()
    }
    want = {
        (r.user_id, r.view_id, r.click_id, r.purchase_id)
        for r in contract_tier3.q_event_pattern(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want and len(got) > 0
    # cross-batch state fired: some match's anchors live in an earlier
    # shard than its purchase
    assert any(v < 300 <= p or v < 700 <= p for _, v, _, p in got)


def test_stream_event_pattern_cross_batch_hand_sequence(spark, tmp_path):
    """view / click / purchase split across three micro-batches, with a
    blocking error in a later batch — state must carry anchors and the
    error count across restarts of the automaton."""
    import pandas as pd

    from bq_duckdb_spark.streaming import streams

    d = tmp_path / "pat_hand"
    d.mkdir()
    cols = ["event_id", "user_id", "event_type"]
    shards = [
        [(1, 7, "view"), (2, 7, "click")],
        [(3, 7, "purchase"), (4, 7, "error")],
        [(5, 7, "purchase"), (6, 8, "purchase")],
    ]
    for i, rows in enumerate(shards):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["event_id"], unit="h")
        pdf["value"] = 0.0
        pdf["props"] = "{}"
        pdf.to_parquet(str(d / f"s{i}.parquet"), index=False)

    stream = streams.read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = streams.run_available_now(
        streams.stream_event_pattern(stream), "pattern_hand_out",
        output_mode="append",
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.view_id, r.click_id, r.purchase_id)
        for r in spark.table("pattern_hand_out").collect()
    )
    # purchase 3 matches (anchors from batch 0); purchase 5 is blocked
    # by the batch-1 error; user 8 has no anchors at all
    assert got == [(7, 1, 2, 3)]


def test_stream_event_pattern_state_survives_restart(spark, tmp_path):
    """The automaton registers must come back from the CHECKPOINT, not
    memory: run 1 ingests only the view+click shard and terminates; new
    shards land; run 2 restarts from the same checkpoint and must match
    the purchase against anchors it never saw in its own lifetime."""
    import pandas as pd

    from bq_duckdb_spark.streaming import streams

    src = tmp_path / "patck_src"
    out = str(tmp_path / "patck_out")
    ckpt = str(tmp_path / "patck_ckpt")
    src.mkdir()
    cols = ["event_id", "user_id", "event_type"]

    def shard(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["event_id"], unit="h")
        pdf["value"] = 0.0
        pdf["props"] = "{}"
        pdf.to_parquet(str(src / name), index=False)

    def drain():
        stream = streams.read_event_stream(
            spark, str(src), max_files_per_trigger=1
        )
        q = (
            streams.stream_event_pattern(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    shard("s0.parquet", [(1, 7, "view"), (2, 7, "click")])
    drain()  # run 1: anchors enter the state store; no matches yet
    assert spark.read.parquet(out).count() == 0

    shard("s1.parquet", [(3, 7, "error")])
    shard("s2.parquet", [(4, 7, "view"), (5, 7, "click"), (6, 7, "purchase")])
    drain()  # run 2: fresh query instance, same checkpoint

    got = sorted(
        (r.user_id, r.view_id, r.click_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    )
    # the purchase matches the RUN-2 anchors (4, 5): the run-1 anchors
    # were superseded in state order, and the run-1 error count (1) must
    # equal the count stored with view 4 — all of which only works if
    # ecum and both anchor registers round-tripped the checkpoint
    assert got == [(7, 4, 5, 6)]


def _write_doc_shards(docs, src):
    """Three id-ordered document shards as explicitly-named single
    files, so every run lists (and batches) them in the same order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src.mkdir()
    bounds = [(0, 150), (150, 320), (320, 10**9)]
    for i, (lo, hi) in enumerate(bounds):
        pdf = (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .orderBy("doc_id")
            .toPandas()
        )
        pq.write_table(pa.Table.from_pandas(pdf), str(src / f"shard{i}.parquet"))


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Round-8: the streaming incremental near-dup writer == both the
    sequential batch fold (shard i vs shards<i + within-shard) and the
    one-shot batch pipeline over the whole corpus — pair-for-pair with
    identical jaccard values (pair coverage is shard-boundary
    invariant: every pair lands either in a within or a cross batch).
    Also pins retry idempotence of an already-committed batch."""
    from bq_duckdb_spark.ext import dedup_portable as dp
    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang", "source", "n_chars")
    src = tmp_path / "incr_src"
    out = str(tmp_path / "incr_out")
    state = str(tmp_path / "incr_state")
    ckpt = str(tmp_path / "incr_ckpt")
    _write_doc_shards(docs, src)

    stream = streams.read_document_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(
            streams.incremental_dedup_each_batch(
                "text", "doc_id", threshold=0.3, out_dir=out, state_dir=state
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def read_out():
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.read.parquet(out).collect()
        }

    got = read_out()

    # one-shot batch pipeline over the whole corpus
    oneshot = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dp.portable_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert got == oneshot and got

    # sequential batch fold (the documented streamed==batch contract)
    shards = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 150), (150, 320), (320, 10**9)]
    ]
    fold = set()
    for i, shard in enumerate(shards):
        for r in dp.portable_jaccard_pairs(
            shard, "text", "doc_id", threshold=0.3
        ).collect():
            fold.add((r["id_a"], r["id_b"], round(r["jaccard"], 9)))
        if i:
            corpus = shards[0]
            for earlier in shards[1:i]:
                corpus = corpus.unionByName(earlier)
            for r in dp.cross_corpus_near_dups(
                corpus, shard, "text", "doc_id", threshold=0.3
            ).collect():
                fold.add(
                    (r["corpus_id"], r["batch_id"], round(r["jaccard"], 9))
                )
    assert got == fold

    # cross-shard pairs actually exist (the state join fired)
    within_only = set()
    for shard in shards:
        for r in dp.portable_jaccard_pairs(
            shard, "text", "doc_id", threshold=0.3
        ).collect():
            within_only.add((r["id_a"], r["id_b"], round(r["jaccard"], 9)))
    assert got - within_only

    # retry idempotence: re-running committed batch 0 (state write
    # included) leaves the output unchanged — the state read filters to
    # strictly-earlier batches and the per-batch subdirs overwrite
    writer = streams.incremental_dedup_each_batch(
        "text", "doc_id", threshold=0.3, out_dir=out, state_dir=state
    )
    writer(shards[0], 0)
    assert read_out() == got


def test_stream_incremental_dedup_crash_recovery(spark, tmp_path):
    """Kill the incremental-dedup stream after batch 1's state write
    lands but before its checkpoint commit, restart the same
    checkpoint, and require the final pair set to equal a clean run's."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang", "source", "n_chars")
    src = tmp_path / "incrc_src"
    _write_doc_shards(docs, src)

    def run(out, state, ckpt, crash_on_batch1):
        real = streams.incremental_dedup_each_batch(
            "text", "doc_id", threshold=0.3, out_dir=out, state_dir=state
        )

        def write(batch_df, batch_id):
            real(batch_df, batch_id)  # state write LANDS first
            if crash_on_batch1 and batch_id == 1:
                raise RuntimeError("injected crash after state write")

        stream = streams.read_document_stream(
            spark, str(src), max_files_per_trigger=1
        )
        return (
            stream.writeStream.foreachBatch(write)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def pairs(out):
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.read.parquet(out).collect()
        }

    out_a, state_a = str(tmp_path / "ca_out"), str(tmp_path / "ca_state")
    ckpt_a = str(tmp_path / "ca_ckpt")
    q = run(out_a, state_a, ckpt_a, crash_on_batch1=True)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    q2 = run(out_a, state_a, ckpt_a, crash_on_batch1=False)
    q2.awaitTermination()

    out_b, state_b = str(tmp_path / "cb_out"), str(tmp_path / "cb_state")
    q3 = run(out_b, state_b, str(tmp_path / "cb_ckpt"), crash_on_batch1=False)
    q3.awaitTermination()

    assert pairs(out_a) == pairs(out_b) and pairs(out_a)
