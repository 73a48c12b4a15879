"""Exact set-similarity join (ext/setjoin.py): brute-force equality on
hand data and on documents, prefix-filter boundary cases, and the
no-cartesian scale shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext.dedup_portable import _with_poly_shingle_hashes
from bq_duckdb_spark.ext.setjoin import exact_jaccard_join
from bq_duckdb_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def _brute(spark, df, threshold, k=3):
    """All-pairs Jaccard by literal enumeration (driver-side, tiny)."""
    sh = _with_poly_shingle_hashes(df, "text", k, out="sh").select("id", "sh")
    sets = {r.id: frozenset(r.sh) for r in sh.collect()}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= threshold:
            out.append((a, b, round(j, 6)))
    return sorted(out)


def _run(spark, data, threshold, k=3):
    df = spark.createDataFrame(data, "id long, text string")
    got = exact_jaccard_join(df, "text", "id", threshold, shingle_k=k)
    return sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6)) for r in got.collect()
    )


def test_hand_corpus_matches_brute_force(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different words entirely here now"),
        (5, "a short doc"),  # < k tokens: whole-doc gram
        (6, "a short doc"),  # its exact dup
        (7, "lorem ipsum dolor sit amet consectetur adipiscing"),
    ]
    df = spark.createDataFrame(data, "id long, text string")
    got = _run(spark, data, 0.3)
    want = _brute(spark, df, 0.3)
    assert got == want
    # sanity on content: the exact dups and the near-dup must be found
    ids = {(a, b) for a, b, _ in got}
    assert (1, 3) in ids and (5, 6) in ids and (1, 2) in ids


@pytest.mark.parametrize("threshold", [0.1, 0.5, 0.9, 1.0])
def test_threshold_boundaries_match_brute_force(spark, threshold):
    # sizes chosen so ceil(t*sz) hits exact-integer and fractional
    # boundaries for every tested t
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    data = [
        (1, base),
        (2, base.replace("w11", "x")),          # drop-one variant
        (3, base.replace("w10 w11", "x y")),    # drop-two variant
        (4, " ".join(f"w{i}" for i in range(6))),  # strict subset text
        (5, base),                               # exact duplicate
    ]
    df = spark.createDataFrame(data, "id long, text string")
    assert _run(spark, data, threshold) == _brute(spark, df, threshold)


def test_documents_match_brute_force(spark):
    docs = load_table(spark, SF, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    got = exact_jaccard_join(docs, "text", "id", 0.3)
    got_pairs = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6)) for r in got.collect()
    )
    assert got_pairs == _brute(spark, docs, 0.3)


def test_exact_join_superset_of_banded(spark):
    """The banded pipeline can only MISS pairs; the exact join never
    does, so banded-verified pairs must be a subset."""
    from bq_duckdb_spark.ext.dedup_portable import portable_jaccard_pairs

    docs = load_table(spark, SF, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in exact_jaccard_join(docs, "text", "doc_id", 0.3).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in portable_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert banded <= exact


def test_no_cartesian_product(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        exact_jaccard_join(docs, "text", "doc_id", 0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    with pytest.raises(ValueError):
        exact_jaccard_join(df, "text", "id", 0.0)
    with pytest.raises(ValueError):
        exact_jaccard_join(df, "text", "id", 1.5)
