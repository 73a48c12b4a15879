"""Hostile-corpus behavior pinned in CI: the full-size adversarial
sweep (tools/gen_adversarial.py + tools/check_oracle.py on .advdata)
runs out-of-band per round; these tests keep its key properties — the
banding cap actually triggering, bounded pair expansion, determinism,
and variant equivalence under duplication — in the fast suite with a
small in-test hostile corpus."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import dedup

CAP = 30


def _hostile_corpus(spark, n_cluster=120, n_exact=40):
    """One near-dup cluster (n_cluster variants of one doc — 4x the
    test cap) + one exact-duplicate block + background docs."""
    rng = random.Random(11)
    base = [f"tok{i}" for i in range(60)]
    rows = []
    for k in range(n_cluster):  # near-dups: one token substituted
        toks = list(base)
        toks[rng.randrange(len(toks))] = f"var{k}"
        rows.append((k, " ".join(toks)))
    dup_text = " ".join(f"dup{i}" for i in range(50))
    for k in range(n_exact):  # verbatim copies
        rows.append((1000 + k, dup_text))
    for k in range(100):  # unrelated background
        rows.append((2000 + k, " ".join(f"bg{k}w{j}" for j in range(40))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_triggers_and_bounds_pairs(spark):
    docs = _hostile_corpus(spark)

    # the cap genuinely triggers: without it, the near-dup cluster and
    # the exact block each form buckets far above CAP
    uncapped = dedup.minhash_candidate_pairs(
        docs, "text", "doc_id", max_bucket=10_000, dedup=True
    ).count()
    capped_df = dedup.minhash_candidate_pairs(
        docs, "text", "doc_id", max_bucket=CAP, dedup=True
    )
    capped = capped_df.count()
    assert uncapped > capped, "hostile corpus must exceed the cap"
    # per band, pair expansion is bounded by C(CAP, 2) per bucket; the
    # corpus has 2 degenerate groups x 8 bands as the loose global bound
    assert capped <= 8 * 2 * CAP * (CAP - 1) // 2

    # deterministic: the exact-duplicate block (identical signature ->
    # ONE bucket per band, 40 members > CAP) keeps exactly the CAP
    # smallest ids — pairs never involve a capped-out member. (The
    # near-dup cluster spreads across buckets per band, so its pairs
    # legitimately span all ids; only the exact block pins the cap.)
    rows = capped_df.collect()
    block_ids = {r.id_a for r in rows if r.id_a >= 1000} | {
        r.id_b for r in rows if r.id_b >= 1000
    }
    assert block_ids == set(range(1000, 1000 + CAP))


def test_bucket_cap_partition_invariant(spark):
    docs = _hostile_corpus(spark)
    want = sorted(
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidate_pairs(
            docs, "text", "doc_id", max_bucket=CAP
        ).collect()
    )
    for parts in (1, 7):
        got = sorted(
            (r.id_a, r.id_b)
            for r in dedup.minhash_candidate_pairs(
                docs.repartition(parts), "text", "doc_id", max_bucket=CAP
            ).collect()
        )
        assert got == want, f"cap must be layout-invariant at {parts} parts"


def test_jaccard_variants_agree_on_hostile_corpus(spark):
    """The carry-shingles and long-format verify paths must produce the
    identical pair set even when duplication makes true near-dups
    co-bucket in every band (the regime where the long path's distinct
    candidate feed matters)."""
    docs = _hostile_corpus(spark, n_cluster=60, n_exact=25)
    kw = dict(threshold=0.5, num_hashes=32, bands=8, shingle_k=3)
    carry = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", carry_shingles=True, **kw
        ).collect()
    }
    long_fmt = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", carry_shingles=False, **kw
        ).collect()
    }
    assert carry == long_fmt
    # the exact block must verify at jaccard exactly 1.0
    exact_pairs = [v for (a, b), v in carry.items() if a >= 1000 and b >= 1000]
    assert exact_pairs and all(v == 1.0 for v in exact_pairs)
