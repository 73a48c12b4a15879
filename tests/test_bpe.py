"""BPE trainer/applier pinned against a pure-Python reference
implementation (Sennrich et al. 2016 greedy merge semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import bpe

SF = "/root/testdata/sf0.001"


def _ref_apply(s: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_train(freqs: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # tie-break (count DESC, left ASC, right ASC) — same as trainer
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((left, right, cnt))
        vocab = {w: _ref_apply(s, left, right) for w, s in vocab.items()}
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )


def test_trainer_matches_python_reference(spark, docs):
    freqs = {
        r.word: r.n for r in bpe.word_frequencies(docs, "text").collect()
    }
    want = _ref_train(freqs, n_merges=10)
    got = bpe.train_bpe_merges(docs, n_merges=10, text_col="text")
    assert got == want
    assert len(got) == 10  # enough signal in 60 docs for 10 merges


def test_trainer_deterministic(spark, docs):
    a = bpe.train_bpe_merges(docs, n_merges=5)
    b = bpe.train_bpe_merges(docs, n_merges=5)
    assert a == b


def test_apply_bpe_conserves_characters(spark, docs):
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    out = bpe.apply_bpe(docs, merges, "text").select(
        "text",
        F.concat_ws("", "bpe_tokens").alias("joined"),
        F.expr("concat_ws('', filter(split(trim(text), '\\\\s+'), w -> w != ''))").alias(
            "want"
        ),
    )
    assert out.filter(F.col("joined") != F.col("want")).count() == 0


def test_apply_bpe_matches_reference_segmentation(spark, docs):
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    row = (
        bpe.apply_bpe(docs, merges, "text")
        .orderBy("doc_id")
        .select("text", "bpe_tokens")
        .first()
    )
    want: list[str] = []
    for w in row.text.split():
        s = list(w)
        for left, right, _ in merges:
            s = _ref_apply(s, left, right)
        want.extend(s)
    assert list(row.bpe_tokens) == want


def test_merges_compress(spark, docs):
    """Applying the merges must strictly reduce token count vs chars."""
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    stats = (
        bpe.apply_bpe(docs, merges, "text")
        .select(
            F.size("bpe_tokens").alias("n_bpe"),
            F.expr(
                "aggregate(filter(split(trim(text), '\\\\s+'), w -> w != ''), "
                "0, (a, w) -> a + length(w))"
            ).alias("n_chars"),
        )
        .agg(F.sum("n_bpe").alias("b"), F.sum("n_chars").alias("c"))
        .first()
    )
    assert stats.b < stats.c


def test_apply_bpe_duckdb_oracle_parity_random(spark):
    """The DuckDB encoded-fold re-implementation of the greedy merge
    (apply_bpe_oracle_expr) must agree with the Spark applier on random
    words and random merge chains, including multi-char merged symbols
    and runs of repeated characters."""
    import random

    import duckdb

    from bq_duckdb_spark.ext.bpe import apply_bpe, apply_bpe_oracle_expr

    rng = random.Random(41)
    alphabet = "abc"
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
                for _ in range(rng.randint(1, 5))
            ),
        )
        for i in range(80)
    ]
    merges = [("a", "b", 0), ("b", "b", 0), ("ab", "c", 0), ("c", "abc", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: "|".join(r.bpe_tokens)
        for r in apply_bpe(df, merges).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = dict(
        con.sql(
            f"SELECT doc_id, {apply_bpe_oracle_expr(merges)} FROM documents"
        ).fetchall()
    )
    for k in got:
        assert got[k] == want[k], f"doc {k}: {rows[k][1]!r}: {got[k]!r} != {want[k]!r}"


def test_merge_pass_frame_anchoring(spark):
    """Regression pin for the round-10 replace-based merge pass: the
    frame encoding must anchor WHOLE symbols. A one-sided encoding let
    the merge pattern (b, b) match the tail of the multi-char symbol
    'ab' (word 'aabbac' after merge (a, b): a|ab|b|a|c must NOT become
    a|abb|a|c), and chained adjacent pairs must still all merge within
    one pass ('abab' + (a, b) -> ab|ab; 'aaa' + (a, a) -> aa|a,
    greedy left-to-right non-overlapping)."""
    df = spark.createDataFrame(
        [(1, "aabbac"), (2, "abab"), (3, "aaa")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe.apply_bpe(
            df, [("a", "b", 0), ("b", "b", 0)], "text"
        ).collect()
    }
    assert out[1] == ["a", "ab", "b", "a", "c"]
    assert out[2] == ["ab", "ab"]
    out2 = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe.apply_bpe(df, [("a", "a", 0)], "text").collect()
    }
    assert out2[3] == ["aa", "a"]
