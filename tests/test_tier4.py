"""Unit + plan-shape tests for the tier-4 operators: BM25 scoring,
hashed-classifier inference, random projection, URL canonicalization."""

import math

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import retrieval, scrub
from bq_duckdb_spark.plans import audit_plan

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_term_frequency_monotone(spark):
    df = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),
            (2, "cat dog fish bird"),
            (3, "fish bird fish bird"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_scores(df, ["cat"]).collect()
    }
    # doc 3 has no query term: absent; doc 1 repeats it: scores higher
    assert set(got) == {1, 2}
    assert got[1] > got[2] > 0


def test_bm25_matches_hand_formula(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a b c"), (3, "b c")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_scores(df, ["a"], k1=1.2, b=0.75).collect()
    }
    n, df_t, avgdl = 3.0, 2.0, 8.0 / 3.0
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))

    def s(tc, dl):
        return idf * tc * 2.2 / (tc + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got[1] == pytest.approx(s(1, 2))
    assert got[2] == pytest.approx(s(2, 4))


# ---------------------------------------------------------------------------
# hashed classifier
# ---------------------------------------------------------------------------


def test_classifier_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared word") for i in range(20)],
        ["doc_id", "text"],
    )
    a = {r.doc_id: (r.prob, r.label) for r in retrieval.classify_documents(df).collect()}
    b = {r.doc_id: (r.prob, r.label) for r in retrieval.classify_documents(df).collect()}
    assert a == b
    for prob, label in a.values():
        assert 0.0 < prob < 1.0
        assert label == int(prob >= 0.5)


def test_classifier_engine_neutral_score(spark):
    import duckdb

    rows = [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "zeta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s_spark = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id",
            F.expr(retrieval.classifier_score_expr("text", 64, "spark")).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    expr = retrieval.classifier_score_expr("text", 64, "duckdb")
    s_duck = dict(con.sql(f"SELECT doc_id, {expr} FROM t").fetchall())
    for k in s_spark:
        assert s_spark[k] == pytest.approx(s_duck[k], abs=1e-12)


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def test_projection_linear_and_norm_preserving(spark):
    import random

    rng = random.Random(3)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = retrieval.random_projection(df, in_dim=64, out_dim=8).collect()
    proj = {r.vec_id: [r[f"p{j}"] for j in range(8)] for r in out}
    # linearity: doubling the vector doubles the projection
    df2 = spark.createDataFrame(
        [(i, [2 * x for x in v]) for i, v in vecs], ["vec_id", "embedding"]
    )
    out2 = retrieval.random_projection(df2, in_dim=64, out_dim=8).collect()
    for r in out2:
        for j in range(8):
            assert r[f"p{j}"] == pytest.approx(2 * proj[r.vec_id][j], rel=1e-9)
    # JL: mean squared norm is preserved within 15% across the sample
    in_sq = sum(sum(x * x for x in v) for _, v in vecs) / len(vecs)
    out_sq = sum(sum(x * x for x in p) for p in proj.values()) / len(proj)
    assert out_sq == pytest.approx(in_sq, rel=0.15)


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

_CASES = [
    # mixed-case authority lowers; path case kept
    ("HTTP://WWW.Foo.COM/Bar", "http://www.foo.com/Bar"),
    # default ports stripped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # tracking params dropped wherever they sit; real params survive
    ("https://a.com/p?utm_source=x&id=1", "https://a.com/p?id=1"),
    ("https://a.com/p?id=1&utm_campaign=y", "https://a.com/p?id=1"),
    ("https://a.com/p?utm_a=1&id=2&gclid=z", "https://a.com/p?id=2"),
    ("https://a.com/p?utm_a=1&utm_b=2", "https://a.com/p"),
    # fragments and trailing slashes gone; root normalizes bare
    ("https://a.com/p/#sec", "https://a.com/p"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com/a/b///", "https://a.com/a/b"),
]


def test_url_canonical_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(_CASES)], ["i", "url"]
    )
    got = {r.i: r.canon_url for r in scrub.canonicalize_urls(df).collect()}
    for i, (u, want) in enumerate(_CASES):
        assert got[i] == want, f"{u!r} -> {got[i]!r}, want {want!r}"


def test_url_canonical_idempotent(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(_CASES)], ["i", "url"]
    )
    once = scrub.canonicalize_urls(df, out_col="c1")
    twice = scrub.canonicalize_urls(once, url_col="c1", out_col="c2")
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


# ---------------------------------------------------------------------------
# plan shape: inference and projection must be map-only
# ---------------------------------------------------------------------------


def test_inference_and_projection_zero_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert audit_plan(retrieval.classify_documents(docs)).exchanges == 0
    assert (
        audit_plan(retrieval.random_projection(embs, in_dim=64)).exchanges == 0
    )
    assert (
        audit_plan(
            scrub.canonicalize_urls(docs.selectExpr("doc_id", "text AS url"))
        ).exchanges
        == 0
    )


# ---------------------------------------------------------------------------
# decontamination / balancing / inverted index
# ---------------------------------------------------------------------------


def test_decontaminate_flags_only_overlaps(spark):
    from bq_duckdb_spark.ext.text import decontaminate

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx the quick brown fox jumps yy"),   # shares 5-grams
            (2, "totally different words here now"),  # clean
            (3, "quick brown fox jumps over filler"), # shares 5-grams
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_hits for r in decontaminate(corpus, ev, n=5).collect()}
    assert set(got) == {1, 3}
    # doc 1 shares exactly "the quick brown fox jumps";
    # doc 3 shares exactly "quick brown fox jumps over"
    assert got[1] == 1
    assert got[3] == 1


def test_balance_corpus_caps_and_deterministic(spark):
    from bq_duckdb_spark.ext.text import balance_corpus

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(90)], ["doc_id", "lang"]
    )
    a = balance_corpus(df, per_group=10)
    counts = {r.lang: r.c for r in a.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts == {"en": 10, "de": 10}
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in balance_corpus(df, per_group=10).collect())
    assert ids_a == ids_b
    # growing the corpus keeps the hash-order prefix property: the kept
    # set changes only where new ids hash earlier, never randomly
    small = balance_corpus(df.filter(F.col("doc_id") < 45), per_group=10)
    assert sorted(r.doc_id for r in small.collect()) != ids_a  # different pool


def test_inverted_index_postings(spark):
    from bq_duckdb_spark.ext.text import inverted_index

    df = spark.createDataFrame(
        [(3, "b a"), (1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    got = {r.term: (r.df_t, r.postings) for r in inverted_index(df).collect()}
    assert got == {
        "a": (2, "1,3"),
        "b": (3, "1,2,3"),
        "c": (1, "2"),
    }


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_sums_to_one_and_ranks_hub(spark):
    from bq_duckdb_spark.ext.graph import pagerank

    # star: everything links to 'hub', hub links to 'a' only
    edges = spark.createDataFrame(
        [("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0), ("hub", "a", 1.0)],
        ["src", "dst", "w"],
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=20).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got["hub"] == pytest.approx(max(got.values()))
    assert got["b"] == pytest.approx(got["c"])


def test_pagerank_dangling_mass_redistributed(spark):
    from bq_duckdb_spark.ext.graph import pagerank

    # 'sink' has no out-edges: its mass must be redistributed, keeping
    # the distribution normalized
    edges = spark.createDataFrame(
        [("a", "sink", 1.0), ("b", "sink", 1.0), ("a", "b", 1.0)],
        ["src", "dst", "w"],
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=25).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got["sink"] == max(got.values())


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_prefers_target_like_documents(spark):
    target = spark.createDataFrame(
        [(100 + i, "physics quantum field theory lecture") for i in range(3)],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "physics quantum field notes"),      # target-like
            (2, "celebrity gossip fashion news"),    # off-target
            (3, "quantum theory lecture summary"),   # target-like
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.dsir
        for r in retrieval.dsir_weights(corpus, target, n_buckets=256).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] > got[2]
    assert got[3] > got[2]


def test_dsir_weight_table_is_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 50 == 0)
    bg = docs.filter(F.col("doc_id") % 50 != 0)
    plan = retrieval.dsir_weights(bg, tgt)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


# ---------------------------------------------------------------------------
# engine parity on randomized inputs (the "one definition" claim)
# ---------------------------------------------------------------------------


def _random_texts(n, seed):
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "Gamma", "x1", "йё", "a-b", "42", "q.w"]
    return [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 12))))
        for i in range(n)
    ]


def test_feature_buckets_engine_parity_random(spark):
    import duckdb

    rows = _random_texts(60, seed=17)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {
        r.doc_id: list(r.f)
        for r in df.select(
            "doc_id",
            F.expr(retrieval.feature_buckets_expr("text", 512, "spark")).alias("f"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    expr = retrieval.feature_buckets_expr("text", 512, "duckdb")
    d = dict(con.sql(f"SELECT doc_id, {expr} FROM t").fetchall())
    for k in s:
        assert s[k] == list(d[k]), f"doc {k}: {rows[k][1]!r}"


def test_url_canonical_engine_parity_random(spark):
    import duckdb
    import random

    rng = random.Random(23)
    hosts = ["A.com", "www.B.org:443", "c.net:80", "D.io:8080"]
    paths = ["", "/", "/P/q", "/x/"]
    qs = ["", "?utm_source=a", "?id=1&utm_b=2", "?utm_a=1&utm_b=2&z=3"]
    frags = ["", "#f"]
    rows = [
        (
            i,
            f"http{'s' if rng.random() < 0.5 else ''}://"
            + rng.choice(hosts) + rng.choice(paths) + rng.choice(qs)
            + rng.choice(frags),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["i", "url"])
    s = {r.i: r.canon_url for r in scrub.canonicalize_urls(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    canon = scrub.canonical_url_expr("url", "duckdb")
    d = dict(con.sql(f"SELECT i, {canon} FROM t").fetchall())
    for k in s:
        assert s[k] == d[k], f"url {rows[k][1]!r}: {s[k]!r} vs {d[k]!r}"


def test_decontaminate_broadcasts_eval_side(spark):
    from bq_duckdb_spark.ext.text import decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    plan = (
        decontaminate(corpus, ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


# ---------------------------------------------------------------------------
# batch ANN join
# ---------------------------------------------------------------------------


def test_ann_join_topk_per_query_and_equi_join(spark):
    import random

    from bq_duckdb_spark.ext.similarity import ann_join

    rng = random.Random(5)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 5)
    index = df.filter(F.col("vec_id") >= 5)
    cents = [v for _, v in vecs[:3]]
    out = ann_join(queries, index, cents, k=4, nprobe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 4
        scores = [r.cosine for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r.index_id >= 5 for r in rows)
    # the plan must be an equi-join on the cell, never a cartesian
    plan = ann_join(queries, index, cents, k=4, nprobe=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------


def test_normalize_text_cases(spark):
    cases = [
        ("<p>Hello &amp; <b>World</b></p>", "hello & world"),
        ("Café  À   BIENTÔT", "cafe a bientot"),
        ("a\tb\r\nc", "a b c"),
        ("&lt;tag&gt; &quot;q&quot; &#39;s&#39;", '<tag> "q" \'s\''),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"]
    )
    got = {r.i: r.norm_text for r in scrub.normalize_text(df).collect()}
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, f"{t!r} -> {got[i]!r}"


def test_normalize_text_zero_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert audit_plan(scrub.normalize_text(docs)).exchanges == 0
