"""Property-based tests for the corpus-prep operators: the distributed
implementations must agree with trivial single-machine references on
arbitrary inputs (graphs for clustering, corpora for packing/sampling).

Spark jobs per example are expensive, so examples are capped low; the
strategies bias toward the interesting regimes (dense dup-clusters,
boundary-straddling docs, skewed strata).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import dedup, pipeline

# fingerprint corpora biased toward near-duplicates: a few random bases,
# each with mutants within (and just beyond) typical Hamming thresholds
_fp_corpora = st.lists(
    st.integers(0, (1 << 64) - 1), min_size=2, max_size=5
).flatmap(
    lambda bases: st.lists(
        st.tuples(
            st.sampled_from(bases),
            st.lists(st.integers(0, 63), min_size=0, max_size=5, unique=True),
        ),
        min_size=2,
        max_size=14,
    ).map(
        lambda muts: [
            base ^ sum(1 << b for b in bits) for base, bits in muts
        ]
    )
)


@given(
    fps=_fp_corpora,
    n_blocks=st.sampled_from([4, 5, 6]),
    h=st.sampled_from([1, 2, 3]),
    emit=st.sampled_from(["first_band", "distinct"]),
)
@settings(**{
    "max_examples": 10,
    "deadline": None,
    "suppress_health_check": [
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
})
def test_blocked_banding_equals_brute_force(spark, fps, n_blocks, h, emit):
    """Any block count / threshold / emit mode: the banded pair set must
    equal brute-force Hamming comparison, with every pair emitted exactly
    once — the pigeonhole guarantee and the emit-once rule, on arbitrary
    near-dup-heavy fingerprint corpora."""
    signed = [f - (1 << 64) if f >= (1 << 63) else f for f in fps]
    sh = spark.createDataFrame(
        list(enumerate(signed)), "id long, simhash long"
    )
    got = [
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.blocked_pairs_from_fp(
            sh, "id", 64, max_hamming=h, n_blocks=n_blocks, emit=emit
        ).collect()
    ]
    want = sorted(
        (i, j, (fps[i] ^ fps[j]).bit_count())
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if (fps[i] ^ fps[j]).bit_count() <= h
    )
    assert len(got) == len(set(got)), "a pair was emitted twice"
    assert sorted(got) == want

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
)


def _union_find_reference(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labelling: fully compress, then take root (roots are minima
    # because unions always point larger roots at smaller ones)
    return {x: find(x) for x in parent}


@given(edges)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, pairs):
    pdf = spark.createDataFrame(
        [(a, b) for a, b in pairs], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in dedup.connected_components(pdf).collect()}
    assert got == _union_find_reference(pairs)


corpora = st.lists(
    st.tuples(
        st.integers(0, 50),  # doc_id (dups filtered below)
        st.integers(1, 40),  # token count
        st.sampled_from(["en", "es"]),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(corpora, st.integers(3, 17))
@settings(**_SETTINGS)
def test_pack_sequences_properties(spark, corpus, seq_len):
    rows = [(i, " ".join(["w"] * nt), lang) for i, nt, lang in corpus]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    packed = pipeline.pack_sequences(df, "text", "doc_id", "lang", seq_len).collect()
    # conservation: every doc's slices sum to its token count
    per_doc = {}
    for r in packed:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tok
        assert 0 <= r.tok_start < seq_len
        assert 0 < r.n_tok <= seq_len
        assert r.tok_start + r.n_tok <= seq_len
    assert per_doc == {i: nt for i, nt, _ in corpus}
    # per (lang, seq) slices tile the block without overlap
    by_seq = {}
    for r in packed:
        by_seq.setdefault((r.lang, r.seq_no), []).append((r.tok_start, r.n_tok))
    for (lang, seq_no), slices in by_seq.items():
        slices.sort()
        pos = slices[0][0]
        for start, n in slices:
            assert start == pos  # contiguous, no gaps or overlaps
            pos = start + n
        max_seq = max(s for (lg, s) in by_seq if lg == lang)
        if seq_no < max_seq:
            assert slices[0][0] == 0 and pos == seq_len  # interior blocks full


@given(corpora, st.integers(1, 5), st.integers(0, 99))
@settings(**_SETTINGS)
def test_stratified_sample_properties(spark, corpus, k, seed):
    rows = [(i, "x", lang) for i, _, lang in corpus]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = pipeline.stratified_sample(df, ["lang"], "doc_id", k=k, seed=seed).collect()
    per = {}
    for r in got:
        per[r.lang] = per.get(r.lang, 0) + 1
    for lang in {l for _, _, l in corpus}:
        n_stratum = sum(1 for _, _, l in corpus if l == lang)
        assert per.get(lang, 0) == min(k, n_stratum)


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=15, unique=True),
       st.integers(0, 99))
@settings(**_SETTINGS)
def test_seeded_shuffle_is_always_a_permutation(spark, ids, seed):
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = pipeline.seeded_shuffle(df, "doc_id", seed=seed).collect()
    assert sorted(r.shuffle_pos for r in got) == list(range(len(ids)))
    # position equals rank of the portable mix hash (ties by id)
    keyed = sorted(
        ids, key=lambda i: ((((i + seed) % 2147483647) * 2654435761) % 2147483647, i)
    )
    want = {i: p for p, i in enumerate(keyed)}
    assert {r.doc_id: r.shuffle_pos for r in got} == want


def _span_dedup_reference(docs, n):
    """Single-machine C4-style span dedup: first occurrence of each
    exact span (by (doc_id, pos)) survives."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.strip().split() if text.strip() else [""]
        spans = [" ".join(toks[i : i + n]) for i in range(0, len(toks), n)]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        if kept:
            out[doc_id] = (" ".join(kept), len(spans), len(kept))
    return out


span_corpora = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.lists(st.sampled_from("a b c d".split()), min_size=0, max_size=9).map(
            " ".join
        ),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@given(span_corpora, st.integers(1, 4))
@settings(**_SETTINGS)
def test_span_dedup_matches_reference(spark, docs, n):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_spans, r.kept_spans)
        for r in pipeline.span_dedup(df, "text", "doc_id", n=n).collect()
    }
    assert got == _span_dedup_reference(docs, n)


@given(
    st.lists(st.integers(0, 1_000), min_size=1, max_size=12, unique=True),
    st.floats(0.0, 3.0).map(lambda w: round(w, 2)),
    st.integers(0, 99),
)
@settings(**_SETTINGS)
def test_mixture_sample_copies_law(spark, ids, w, seed):
    """Every doc appears floor(w) or ceil(w) times, epochs are dense
    0..copies-1, and the operator is deterministic."""
    import math

    df = spark.createDataFrame([(i, "s") for i in ids], ["doc_id", "source"])
    got = pipeline.mixture_sample(df, "source", "doc_id", {"s": w}, seed=seed).collect()
    per = {}
    for r in got:
        per.setdefault(r.doc_id, []).append(r.epoch)
    lo, hi = math.floor(w), math.ceil(w)
    for i in ids:
        epochs = sorted(per.get(i, []))
        assert len(epochs) in (lo, hi)
        assert epochs == list(range(len(epochs)))
