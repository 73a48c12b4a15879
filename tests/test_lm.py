"""Held-out unigram LM scoring (ext/lm.py): arithmetic pinned to a
pure-Python reference, OOV accounting, filter semantics, and the
self-train default."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bq_duckdb_spark.ext import lm


def _py_lm(ref_texts, k=0.5):
    counts = {}
    for t in ref_texts:
        for w in t.strip().split():
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    v = len(counts)
    denom = total + k * (v + 1)
    vocab = {
        w: round(math.log((c + k) / denom) * 1_000_000)
        for w, c in counts.items()
    }
    oov = round(math.log(k / denom) * 1_000_000)
    return vocab, oov


def _assert_nll_close(got, want, n_tokens):
    """nll within ±1 micro-nat on the summed s_micro.  The sums are
    integer so there is no float re-association, but the per-term
    ln() input can differ by 1 ulp between JVM Math.log and libm (and
    Python round() is half-to-even vs Spark/DuckDB half-away-from-zero)
    — a micro-nat landing at a .5 boundary may flip the quantized
    integer by one.  Tolerating one micro-nat on the SUM keeps the
    pin tight (≪ any real divergence) without the boundary flake."""
    assert abs(got - want) * n_tokens * 1_000_000.0 <= 1.0 + 1e-6


def _py_score(text, vocab, oov):
    toks = text.strip().split()
    s = 0
    n_oov = 0
    for w in toks:
        if w in vocab:
            s += vocab[w]
        else:
            s += oov
            n_oov += 1
    n = len(toks)
    return n, n_oov, n_oov / n, -s / (n * 1_000_000.0)


REF = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
TARGETS = [
    (0, "the cat sat"),           # all in-vocab, high-frequency
    (1, "zebra quokka the"),      # 2 OOV of 3
    (2, "a a a a"),               # repeated rare-ish token
]


@pytest.fixture(scope="module")
def frames(spark):
    ref = spark.createDataFrame(
        [(i + 100, t) for i, t in enumerate(REF)], ["doc_id", "text"]
    )
    tgt = spark.createDataFrame(TARGETS, ["doc_id", "text"])
    return ref, tgt


def test_matches_python_reference(frames):
    ref, tgt = frames
    out = {
        r["doc_id"]: r
        for r in lm.with_lm_score(tgt, ref=ref).collect()
    }
    vocab, oov = _py_lm(REF)
    for doc_id, text in TARGETS:
        n, n_oov, ratio, nll = _py_score(text, vocab, oov)
        row = out[doc_id]
        assert row["n_tokens"] == n
        assert row["n_oov"] == n_oov
        assert row["oov_ratio"] == ratio
        _assert_nll_close(row["nll"], nll, n)


def test_oov_counted_and_penalized(frames):
    ref, tgt = frames
    out = {r["doc_id"]: r for r in lm.with_lm_score(tgt, ref=ref).collect()}
    assert out[0]["n_oov"] == 0 and out[0]["oov_ratio"] == 0.0
    assert out[1]["n_oov"] == 2 and out[1]["oov_ratio"] == 2 / 3
    # OOV mass is below every seen unigram's probability -> higher nll
    assert out[1]["nll"] > out[0]["nll"]


def test_self_train_default(frames):
    ref, _ = frames
    explicit = sorted(
        tuple(r) for r in lm.with_lm_score(ref, ref=ref).collect()
    )
    default = sorted(tuple(r) for r in lm.with_lm_score(ref).collect())
    assert explicit == default
    # self-trained scoring can never miss the vocabulary
    assert all(r[2] == 0 for r in default)


def test_perplexity_filter_schema_and_subset(spark, frames):
    ref, tgt = frames
    tgt2 = tgt.withColumn("extra", tgt.doc_id * 2)
    scored = {
        r["doc_id"]: r["nll"]
        for r in lm.with_lm_score(tgt2, ref=ref).collect()
    }
    cut = sorted(scored.values())[1]  # keep exactly the two lowest
    kept = lm.perplexity_filter(tgt2, ref, max_nll=cut).collect()
    assert sorted(df_r["doc_id"] for df_r in kept) == sorted(
        d for d, v in scored.items() if v <= cut
    )
    assert set(kept[0].asDict()) == {"doc_id", "text", "extra"}
    assert len(kept) == 2


def test_oov_ratio_gate(spark, frames):
    ref, tgt = frames
    kept = lm.perplexity_filter(
        tgt, ref, max_nll=1e9, max_oov_ratio=0.5
    ).collect()
    # doc 1 is 2/3 OOV -> dropped; docs 0 and 2 survive
    assert sorted(r["doc_id"] for r in kept) == [0, 2]


# small shared vocabulary so random corpora overlap (OOV and in-vocab
# tokens both occur in most examples)
_words = st.sampled_from(["aa", "bb", "cc", "dd", "zz", "qq"])
_texts = st.lists(_words, min_size=1, max_size=8).map(" ".join)


@given(
    ref_texts=st.lists(_texts, min_size=1, max_size=6),
    tgt_texts=st.lists(_texts, min_size=1, max_size=6),
    k=st.sampled_from([0.5, 1.0, 0.1]),
)
@settings(**{
    "max_examples": 10,
    "deadline": None,
    "suppress_health_check": [
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
})
def test_property_matches_python_reference(spark, ref_texts, tgt_texts, k):
    """Arbitrary tiny corpora, any smoothing k: the distributed scorer
    must equal the sequential reference bit-for-bit (integer micro-nat
    sums leave no room for float re-association)."""
    ref = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(ref_texts)], ["doc_id", "text"]
    )
    tgt = spark.createDataFrame(
        list(enumerate(tgt_texts)), ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in lm.with_lm_score(tgt, ref=ref, k=k).collect()}
    vocab, oov = _py_lm(ref_texts, k=k)
    assert len(got) == len(tgt_texts)
    for doc_id, text in enumerate(tgt_texts):
        n, n_oov, ratio, nll = _py_score(text, vocab, oov)
        row = got[doc_id]
        assert (row["n_tokens"], row["n_oov"]) == (n, n_oov)
        assert row["oov_ratio"] == ratio
        _assert_nll_close(row["nll"], nll, n)


def test_stream_perplexity_filter_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from bq_duckdb_spark.streaming import streams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 10 != 0)

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "kept_out")
    ckpt = str(tmp_path / "ckpt")
    # two files -> two micro-batches
    docs.filter(F.col("doc_id") < 250).write.parquet(src)
    docs.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)

    q = (
        streams.read_document_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            streams.perplexity_filter_each_batch(
                ref, max_nll=3.5, out_dir=out
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    want = {
        r.doc_id
        for r in lm.perplexity_filter(docs, ref, max_nll=3.5)
        .select("doc_id")
        .collect()
    }
    assert got == want and 0 < len(got) < docs.count()


def test_incremental_counts_equal_full_retrain(spark, frames):
    """state(base) merged with state(delta) must equal a direct train
    over the union — the warehouse incremental-maintenance contract
    applied to the LM's count state (integer, so exactly)."""
    ref, tgt = frames
    base = ref.filter(ref.doc_id % 2 == 0)
    delta = ref.filter(ref.doc_id % 2 == 1)
    merged = lm.merge_counts(
        lm.unigram_counts(base), lm.unigram_counts(delta)
    )
    direct = lm.unigram_counts(ref)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    vocab_m, oov_m = lm.lm_from_counts(merged)
    got = sorted(
        tuple(r) for r in lm.score_with_lm(tgt, vocab_m, oov_m).collect()
    )
    want = sorted(tuple(r) for r in lm.with_lm_score(tgt, ref=ref).collect())
    assert got == want


@given(split=st.integers(0, 5), k=st.sampled_from([0.5, 1.0]))
@settings(**{
    "max_examples": 6,
    "deadline": None,
    "suppress_health_check": [
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
})
def test_property_merge_any_split(spark, frames, split, k):
    """Any split point of the reference corpus: merged partial counts
    give the identical model."""
    ref, _ = frames
    a = ref.filter(ref.doc_id < 100 + split)
    b = ref.filter(ref.doc_id >= 100 + split)
    merged = lm.merge_counts(lm.unigram_counts(a), lm.unigram_counts(b))
    va, oa = lm.lm_from_counts(merged, k)
    vb, ob = lm.unigram_lm(ref, k=k)
    assert sorted(map(tuple, va.collect())) == sorted(map(tuple, vb.collect()))
    assert oa.collect() == ob.collect()


def test_empty_text_scores_one_empty_token(spark, frames):
    ref, _ = frames
    weird = spark.createDataFrame([(7, "")], ["doc_id", "text"])
    row = lm.with_lm_score(weird, ref=ref).collect()[0]
    # split(trim('')) yields [''] in both engines: one OOV token
    assert row["n_tokens"] == 1 and row["n_oov"] == 1
