"""Count-Min Sketch (ext/cms.py): never-underestimate guarantee, merge
by addition equals whole-corpus build, bounded sketch size, and
estimate behavior for absent keys."""

from pyspark.sql import functions as F

from bq_duckdb_spark.ext import cms

DEPTH, WIDTH = 4, 32


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


TEXTS = [
    "a b c a a",
    "b c d d d d",
    "e f a b c",
    "g g g g g g g g",
    "h i j k a",
]


def _exact(spark):
    counts = {}
    for t in TEXTS:
        for tok in t.split():
            counts[tok] = counts.get(tok, 0) + 1
    return counts


def test_never_underestimates(spark):
    docs = _docs(spark, TEXTS)
    sketch = cms.cms_build(docs, depth=DEPTH, width=WIDTH)
    exact = _exact(spark)
    est = cms.cms_estimate(spark, sketch, list(exact), depth=DEPTH, width=WIDTH)
    got = {r.token: r.cms_est for r in est.collect()}
    for tok, cnt in exact.items():
        assert got[tok] >= cnt, tok


def test_narrow_width_overestimates_somewhere(spark):
    # width 2: heavy collisions guaranteed — at least one overestimate,
    # still never an underestimate
    docs = _docs(spark, TEXTS)
    sketch = cms.cms_build(docs, depth=2, width=2)
    exact = _exact(spark)
    est = cms.cms_estimate(spark, sketch, list(exact), depth=2, width=2)
    got = {r.token: r.cms_est for r in est.collect()}
    assert all(got[t] >= c for t, c in exact.items())
    assert any(got[t] > c for t, c in exact.items())


def test_merge_equals_whole(spark):
    whole = cms.cms_build(_docs(spark, TEXTS), depth=DEPTH, width=WIDTH)
    part1 = cms.cms_build(_docs(spark, TEXTS[:2]), depth=DEPTH, width=WIDTH)
    part2 = cms.cms_build(_docs(spark, TEXTS[2:]), depth=DEPTH, width=WIDTH)
    merged = cms.cms_merge(part1, part2)
    diff = (
        whole.withColumnRenamed("cnt", "cnt_w")
        .join(merged, ["row", "cell"], "full")
        .where(
            F.coalesce(F.col("cnt_w"), F.lit(0)) != F.coalesce(F.col("cnt"), F.lit(0))
        )
    )
    assert diff.count() == 0


def test_sketch_bounded(spark):
    sketch = cms.cms_build(_docs(spark, TEXTS * 50), depth=DEPTH, width=WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    # total mass per row equals the token count
    n_tokens = sum(len(t.split()) for t in TEXTS) * 50
    per_row = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert len(per_row) == DEPTH
    assert all(r.s == n_tokens for r in per_row)


def test_absent_token_small_estimate(spark):
    docs = _docs(spark, TEXTS)
    sketch = cms.cms_build(docs, depth=DEPTH, width=WIDTH)
    est = cms.cms_estimate(spark, sketch, ["nonexistent_tok"], depth=DEPTH, width=WIDTH)
    v = est.first()["cms_est"]
    # may collide (overestimate) but is bounded by the heaviest counter
    assert 0 <= v <= sum(len(t.split()) for t in TEXTS)


def test_cms_random_property_vs_python_model(spark):
    """Random corpora: every CMS counter must equal a Python model of
    the same hashes, and every estimate must dominate the true count."""
    import random

    from bq_duckdb_spark.ext.dedup_portable import P, poly_hash_coeffs

    random.seed(9)
    vocab = ["w%d" % i for i in range(30)]
    texts = [" ".join(random.choices(vocab, k=random.randint(1, 12)))
             for _ in range(60)]
    depth, width = 3, 16
    a, b = poly_hash_coeffs(depth)

    def poly(tok):
        h = 0
        for ch in tok:
            h = (h * 131 + ord(ch)) % P
        return h

    model = {}
    truth = {}
    for t in texts:
        for tok in t.split():
            truth[tok] = truth.get(tok, 0) + 1
            h = poly(tok)
            for r in range(depth):
                cell = ((a[r] * h + b[r]) % P) % width
                model[(r, cell)] = model.get((r, cell), 0) + 1
    sketch = cms.cms_build(_docs(spark, texts), depth=depth, width=width)
    got = {(r.row, r.cell): r.cnt for r in sketch.collect()}
    assert got == model
    est = cms.cms_estimate(spark, sketch, list(truth), depth=depth, width=width)
    for r in est.collect():
        assert r.cms_est >= truth[r.token]


def test_streaming_cms_partials_match_batch(spark, tmp_path):
    """CMS counters built by an update-mode streaming aggregation over
    two microbatches equal the batch-built sketch over the same files —
    counter addition is exactly the streaming state merge."""
    import pandas as pd

    src = tmp_path / "cms_stream"
    src.mkdir()
    texts = [" ".join(f"w{(i * 7 + j) % 23}" for j in range(1 + i % 9))
             for i in range(400)]
    pd.DataFrame({"text": texts[:250]}).to_parquet(str(src / "f1.parquet"))
    pd.DataFrame({"text": texts[250:]}).to_parquet(str(src / "f2.parquet"))

    batch = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        cms.cms_build(stream, depth=DEPTH, width=WIDTH)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    got = {(r.row, r.cell): r.cnt for r in spark.table("cms_stream").collect()}
    want = {
        (r.row, r.cell): r.cnt
        for r in cms.cms_build(batch, depth=DEPTH, width=WIDTH).collect()
    }
    assert got == want
