"""Driver-contract entries for the ext/ training-data operators.

SQL-expressible operators carry a DuckDB oracle; hash-based pipelines
(MinHash/SimHash/LSH/fingerprint) have no DuckDB equivalent of Spark's
xxhash64 and are registered rows-only (the driver records the weaker
check; unit tests in tests/test_ext.py pin their semantics instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import dedup, multimodal, scrub, similarity, text


from bq_duckdb_spark.testdata import load_table as _t


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row.embedding]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup stats: hash-groupBy on content (one shuffle)."""
    return dedup.exact_dup_stats(_t(spark, sf_dir, "documents"), "text", "doc_id")


_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, count(*) AS dup_count, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banding candidate pairs (shingle→minhash→band→
    bucket-join; no all-pairs). Oracle: the xxhash64-in-SQL twin
    (ext/xx_oracles). Banding follows the library default — (32, 16,
    r=2) since the RECALL_r8.txt sweep."""
    return dedup.minhash_candidate_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=32, bands=16
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, pinned to the 4-chunk banding so the
    oracle mirror is deterministic (the operator's size-adaptive default
    would pick the same scheme at every test SF; the 6-block at-scale
    scheme is oracle-pinned by dedup_simhash_blocked — the banding core
    is shared, so together the hash family and both schemes are
    value-checked)."""
    return dedup.simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3, n_blocks=4
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-3-gram Jaccard over MinHash-banded candidates."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.3
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact baseline (oracle-checked:
    the double fold dot product is bitwise-deterministic)."""
    return dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, dim=64
    )


_DEDUP_EMBEDDING_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                        list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
       / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
          * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(b.embedding, x -> CAST(x AS DOUBLE)))))
           AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND cosine >= 0.3
"""


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed variant: hyperplane signatures gate the pair join
    (the 100 TB path). Full oracle: the deterministic plane literals
    make the candidate set reproducible in SQL (_embedding_lsh_oracle)."""
    return dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, use_lsh=True, dim=64
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-bounded cosine near-dup pruning — nearest of 4
    fixed centroids (the first 4 embeddings) bounds the pair join to
    within-cell, lower vec_id survives each near-dup pair. Deterministic
    centroids + sequential-fold cosine → full DuckDB oracle."""
    cents = [_query_vec(spark, sf_dir, i) for i in range(4)]
    return dedup.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), cents, threshold=0.3
    )


_DEDUP_SEMANTIC_ORACLE = """
WITH cents AS (
    SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings WHERE vec_id < 4
),
scored AS (
    SELECT e.vec_id,
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
           c.cid,
           list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cv) AS s
    FROM embeddings e CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, ev, cid FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) = 1
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.ev, b.ev)
          / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev)))
          >= 0.3
)
SELECT a.vec_id, CAST(a.cid AS INT) AS ivf_cell FROM assigned a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def sim_ann_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN join: every 100th embedding is a query; top-3 cosine
    matches from the remaining index via 4-centroid IVF cells, 2 probes
    per query. The table-to-table retrieval join (vs the single-vector
    sim_ivf_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = [_query_vec(spark, sf_dir, i) for i in range(4)]
    return similarity.ann_join(
        emb.filter(F.col("vec_id") % 100 == 0),
        emb.filter(F.col("vec_id") % 100 != 0),
        cents,
        k=3,
        nprobe=2,
    )


_SIM_ANN_JOIN_ORACLE = """
WITH cents AS (
    SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings WHERE vec_id < 4
),
qs AS (
    SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id % 100 = 0
),
probed AS (
    SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cid
               ) AS rn
        FROM qs q CROSS JOIN cents c
    ) WHERE rn <= 2
),
assigned AS (
    SELECT vec_id, ev, cid FROM (
        SELECT e.vec_id,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
               c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cv) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id % 100 <> 0
    ) WHERE rn = 1
)
SELECT query_id, index_id, cosine FROM (
    SELECT p.qid AS query_id, a.vec_id AS index_id,
           list_dot_product(q.qv, a.ev)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.ev, a.ev)))
               AS cosine,
           row_number() OVER (
               PARTITION BY p.qid
               ORDER BY list_dot_product(q.qv, a.ev)
                        / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.ev, a.ev))) DESC,
                        a.vec_id
           ) AS rn
    FROM probed p
    JOIN qs q ON q.qid = p.qid
    JOIN assigned a ON a.cid = p.cid
) WHERE rn <= 3
"""



def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS resolved into duplicate CLUSTERS + canonical-doc
    pick: LSH-gated embedding pairs -> hash-min connected components ->
    every vector labelled (cluster_id = component min, is_canonical).
    Oracle: same pairs via _lsh_pair_ctes, components via unrolled
    Shiloach-Vishkin hash-min (components_ctes — relax + parent hook +
    jump, ~log2(component size) rounds measured, non-convergence
    surfaced by a loud sentinel row; the earlier recursive closure
    OOM'd at sf1, and the pre-round-10 hook-less chain was silently
    wrong on a fuzz seed-201 eccentricity-28 component).
    Beyond-reference: the reference stops at pair output."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dup_pairs(
        emb, threshold=0.3, use_lsh=True, dim=64
    )
    return dedup.assign_dup_clusters(
        emb.select("vec_id"), pairs, "vec_id"
    ).select(
        "vec_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "is_canonical",
    )


def _dedup_clusters_oracle() -> str:
    # unrolled hash-min label propagation, NOT WITH RECURSIVE: the
    # recursive reach closure enumerates every (node, reachable-label)
    # pair and OOM'd the 24 GB oracle fence at sf1 on the 600k-edge
    # embedding graph (ORACLE_sf1_r7 finding); the Shiloach-Vishkin
    # chain (shared builder, ext/contract_portable.components_ctes) is
    # the same recipe the text-clusters oracle uses (hook step + loud
    # convergence sentinel added round 10 after fuzz seed 201)
    from bq_duckdb_spark.ext.contract_portable import components_ctes

    return f"""
WITH {_lsh_pair_ctes()},
edges AS MATERIALIZED (
    SELECT ia AS src, ib AS dst FROM cand
    UNION
    SELECT ib, ia FROM cand
),
{components_ctes()}
SELECT v.vec_id,
       CAST(coalesce(l.cl, v.vec_id) AS BIGINT) AS cluster_id,
       v.vec_id = coalesce(l.cl, v.vec_id) AS is_canonical
FROM embeddings v LEFT JOIN lab l ON v.vec_id = l.node
UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), false
FROM lab_unconverged WHERE n > 0
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 embedding. The JVM fold
    dot product is bitwise-deterministic, so a DuckDB oracle applies."""
    return similarity.cosine_topk(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10
    )


_SIM_COSINE_TOPK_ORACLE = """
WITH q AS (
    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv)
       / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
FROM embeddings e, q
ORDER BY cosine DESC, e.vec_id
LIMIT 10
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse cells from 4 fixed centroids (the first 4
    embeddings), probe the 2 query-closest cells, exact cosine top-10
    inside them. Deterministic centroids → full DuckDB oracle."""
    cents = [_query_vec(spark, sf_dir, i) for i in range(4)]
    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir, 0),
        cents,
        k=10,
        nprobe=2,
    )


_SIM_IVF_TOPK_ORACLE = """
WITH cents AS (
    SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings WHERE vec_id < 4
),
q AS (
    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id = 0
),
probed AS (
    SELECT cid FROM cents, q ORDER BY list_dot_product(cv, qv) DESC, cid LIMIT 2
),
scored AS (
    SELECT e.vec_id,
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
           c.cid,
           list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cv) AS s
    FROM embeddings e CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, ev, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
    FROM scored
)
SELECT a.vec_id,
       list_dot_product(a.ev, q.qv)
       / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(q.qv, q.qv)))
           AS cosine
FROM assigned a, q
WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probed)
ORDER BY cosine DESC, a.vec_id
LIMIT 10
"""


_PQ_M = 8        # subvectors (64-dim embeddings -> 8 dims each)
_PQ_KSUB = 4     # centroids per sub-codebook


def _pq_codebooks() -> list[list[list[float]]]:
    """Deterministic PQ sub-codebooks from the seeded hyperplane
    generator (similarity.py:_hyperplanes): m*ksub vectors of the
    subvector dimension, reshaped to m codebooks of ksub centroids.
    Literal codebooks are what make the PQ path oracle-checkable; a
    production codebook comes from per-subspace k-means instead."""
    from bq_duckdb_spark.ext.similarity import _hyperplanes

    d = 64 // _PQ_M
    flat = _hyperplanes(d, _PQ_M * _PQ_KSUB, seed=1234)
    return [
        [list(map(float, flat[j * _PQ_KSUB + c])) for c in range(_PQ_KSUB)]
        for j in range(_PQ_M)
    ]


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10 by dot product: map-only encode
    against literal sub-codebooks, driver-side query LUT, per-partition
    k-heaps. Fully oracle-checked (deterministic codebooks + sequential
    double folds on both engines)."""
    return similarity.pq_topk(
        _t(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir, 0),
        _pq_codebooks(),
        k=10,
    )


def _pq_oracle() -> str:
    """DuckDB twin of sim_pq_topk, generated from the same codebook
    literals and expression builders (similarity.py:pq_code_exprs):
    encode per subvector, then score as sum_j dot(query_sub_j,
    centroid[code_j]) — the SQL computes each LUT entry with the same
    sequential fold Python used to precompute it for Spark."""
    from bq_duckdb_spark.ext.similarity import _flit, pq_code_exprs

    cbs = _pq_codebooks()
    d = 64 // _PQ_M
    codes = pq_code_exprs("e.embedding", cbs, engine="duckdb")
    code_cols = ", ".join(f"({c}) AS c{j}" for j, c in enumerate(codes))
    terms = []
    for j, cb in enumerate(cbs):
        cb_lit = (
            "[" + ", ".join("[" + ", ".join(_flit(x, "duckdb") for x in cent) + "]"
                            for cent in cb) + "]"
        )
        terms.append(
            f"list_dot_product(list_slice(q.qv, {j * d + 1}, {j * d + d}), "
            f"list_extract({cb_lit}, c{j} + 1))"
        )
    score = " + ".join(terms)
    return f"""
WITH q AS (
    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id = 0
),
coded AS (SELECT e.vec_id, {code_cols} FROM embeddings e)
SELECT coded.vec_id, ({score}) AS pq_score
FROM coded, q
ORDER BY pq_score DESC, coded.vec_id
LIMIT 10
"""


def _bucket_sql(v: str, dim: int = 64, nbits: int = 8, seed: int = 42) -> str:
    """DuckDB SQL expression for the nbits-bit hyperplane LSH bucket of
    list-of-double expression ``v`` — the exact planes Spark's
    with_lsh_signature uses (similarity.py:_hyperplanes), inlined as
    literals so both engines evaluate identical arithmetic."""
    from bq_duckdb_spark.ext.similarity import _hyperplanes

    planes = _hyperplanes(dim, nbits, seed)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    terms = [
        f"(CASE WHEN list_dot_product({v}, {arr(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def _lsh_ann_oracle() -> str:
    """DuckDB oracle for sim_ann_lsh, upgrading it from rows-only: the
    hyperplanes are deterministic Python-generated literals, the dot
    products are sequential folds (bitwise-identical across engines),
    so the exact bucket bits — and therefore the candidate set and
    top-k — are reproducible in SQL. Testdata embeddings are dim=64 at
    every SF (the entry's nbits=8, max_hamming=1, seed=42)."""
    bucket = _bucket_sql
    ham = " + ".join(f"((d >> {i}) & 1)" for i in range(8))
    return f"""
WITH q AS (
    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id = 0
),
qb AS (SELECT qv, {bucket('qv')} AS qbucket FROM q),
e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
    FROM embeddings
),
b AS (SELECT vec_id, ev, {bucket('ev')} AS eb FROM e),
h AS (SELECT vec_id, ev, xor(eb, qbucket) AS d, qv FROM b, qb)
SELECT vec_id,
       list_dot_product(ev, qv)
       / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
           AS cosine
FROM h
WHERE {ham} <= 1
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def _lsh_pair_ctes() -> str:
    """Shared CTE chain producing the dedup_embedding_lsh candidate
    pairs (ia, ib, cosine) in DuckDB — the building block for both the
    pair entry's oracle and the cluster-resolution oracle."""
    bucket = _bucket_sql("ev")
    ham = " + ".join(f"((d >> {i}) & 1)" for i in range(8))
    return f"""e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
    FROM embeddings
),
b AS (
    SELECT vec_id, ev, {bucket} AS eb,
           sqrt(list_dot_product(ev, ev)) AS n
    FROM e
),
h AS (
    SELECT a.vec_id AS ia, c.vec_id AS ib, a.ev AS ea, c.ev AS ec,
           a.n AS na, c.n AS nc, xor(a.eb, c.eb) AS d
    FROM b a JOIN b c ON a.vec_id < c.vec_id
),
cand AS (
    SELECT ia, ib, list_dot_product(ea, ec) / (na * nc) AS cosine
    FROM h
    WHERE {ham} <= 2 AND list_dot_product(ea, ec) / (na * nc) >= 0.3
)"""


def _embedding_lsh_oracle() -> str:
    """DuckDB oracle for dedup_embedding_lsh, upgrading it from
    rows-only. Spark's multi-probe expansion emits a pair exactly when
    the two 8-bit signatures differ in <= max_hamming(=2) bits, so the
    candidate set is reproducible as a hamming filter over the same
    deterministic bucket bits (_bucket_sql); the verify cosine is the
    bitwise-deterministic fold both engines share (see
    _DEDUP_EMBEDDING_ORACLE)."""
    return f"""
WITH {_lsh_pair_ctes()}
SELECT ia AS id_a, ib AS id_b, cosine FROM cand
"""


def emb_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean-pooling of embeddings per group (chunk→embed→
    pool). Serialized as 1e-4-quantized integers: the per-position avg
    is a cross-order aggregate, so quantization absorbs summation-order
    ulps while keeping the signature scalar for the canonicalizer."""
    emb = _t(spark, sf_dir, "embeddings").withColumn("grp", F.col("vec_id") % 10)
    pooled = similarity.mean_pool_embeddings(emb, "grp")
    return pooled.select(
        "grp",
        F.concat_ws(
            ",", F.expr("transform(pooled, x -> CAST(round(x * 10000) AS BIGINT))")
        ).alias("pooled_sig"),
    )


_EMB_MEAN_POOL_ORACLE = """
WITH e AS (
    SELECT vec_id % 10 AS grp, CAST(i AS INT) AS pos,
           CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS val
    FROM embeddings, unnest(range(0, len(embedding))) AS t(i)
),
p AS (SELECT grp, pos, avg(val) AS a FROM e GROUP BY grp, pos)
SELECT grp,
       array_to_string(list(CAST(round(a * 10000) AS BIGINT) ORDER BY pos), ',')
           AS pooled_sig
FROM p GROUP BY grp
"""


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (random hyperplanes,
    probe hamming<=1 buckets, exact cosine on the candidates)."""
    qv = _query_vec(spark, sf_dir)
    return similarity.lsh_ann_topk(
        _t(spark, sf_dir, "embeddings"), qv, dim=len(qv), k=10, nbits=8, max_hamming=1
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish subword token counts per document."""
    return text.with_token_count(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_subwords"
    )


_TEXT_TOKENS_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
            t -> 1 + CAST(floor(greatest(length(t) - 4, 0) / 4) AS INT))) AS BIGINT)
           AS n_subwords
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (lengths, punct/stopword/distinct
    ratios) — all per-row JVM expressions, no rounding needed."""
    return text.with_quality_scores(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_chars_calc",
        "n_words",
        "mean_word_len",
        "punct_ratio",
        "stopword_ratio",
        "distinct_ratio",
    )


_TEXT_QUALITY_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
       CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
            t -> length(t))) AS DOUBLE)
           / nullif(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS mean_word_len,
       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
           / nullif(length(text), 0) AS punct_ratio,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
            t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
           / nullif(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS stopword_ratio,
       CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
           / nullif(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS distinct_ratio
FROM documents
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: doc counts and average lengths."""
    docs = text.with_token_count(_t(spark, sf_dir, "documents"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


_TEXT_STATS_ORACLE = """
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       round(avg(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)), 4)
           AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-term TF-IDF (explode → aggregate → broadcast join). Rounded
    4dp: tf is an exact ratio; ln() may differ in final ulps between
    libm implementations."""
    out = text.tf_idf(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "term", F.round("tfidf", 4).alias("tfidf_r")
    )


# ONE definition of the DuckDB-side TF-IDF pipeline (CTE block + the
# per-(doc, term) value expression), shared with the tier-7 entries
# (RRF fusion, cosine scores) so the arithmetic tracking ext/text.tf_idf
# cannot drift between oracles.

TFIDF_ORACLE_CTES = """ti_exploded AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
),
ti_doc_terms AS (
    SELECT doc_id, term, count(*) AS term_count FROM ti_exploded GROUP BY doc_id, term
),
ti_doc_lens AS (
    SELECT doc_id, count(*) AS doc_len FROM ti_exploded GROUP BY doc_id
),
ti_term_df AS (
    SELECT term, count(DISTINCT doc_id) AS df_t FROM ti_doc_terms GROUP BY term
),
ti_n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
ti AS (
    SELECT dt.doc_id, dt.term,
           (dt.term_count / CAST(dl.doc_len AS DOUBLE))
               * ln(CAST(n.n_docs AS DOUBLE) / df.df_t) AS tfidf
    FROM ti_doc_terms dt
    JOIN ti_doc_lens dl USING (doc_id)
    JOIN ti_term_df df USING (term)
    CROSS JOIN ti_n n
)"""

_TEXT_TFIDF_ORACLE = (
    f"WITH {TFIDF_ORACLE_CTES}\n"
    "SELECT doc_id, term, round(tfidf, 4) AS tfidf_r FROM ti"
)


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID. Hash-free (pure argmax over
    stopword hit counts, ties alphabetical) → full DuckDB oracle."""
    return text.with_lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "pred_lang"
    )


def _langid_oracle() -> str:
    """DuckDB twin of text.with_lang_id: the Spark fold keeps the FIRST
    language (alphabetical scan order) whose score beats the running
    max strictly, i.e. the alphabetically-first argmax — reproduced
    with a >= CASE chain."""
    from bq_duckdb_spark.ext.text import _STOPWORDS

    langs = sorted(_STOPWORDS)
    score_cols = ", ".join(
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"t -> t IN ({', '.join(repr(w) for w in _STOPWORDS[lang])}))) AS s_{lang}"
        for lang in langs
    )
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1 :])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"
    # NULL text scores NULL everywhere: the Spark fold keeps its
    # ('und', -1) init (NULL > x is NULL -> acc), while a bare CASE
    # chain would fall through to the last language (gen_fuzz finding)
    return (
        f"WITH s AS (SELECT doc_id, lang, text, {score_cols} FROM documents) "
        f"SELECT doc_id, lang, "
        f"CASE WHEN text IS NULL THEN 'und' ELSE {case} END AS pred_lang FROM s"
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hash winnowing fingerprint per document. The contract entry
    uses the portable char-polynomial hash family (same min-of-window
    semantics as the default xxhash64 path) so DuckDB can reproduce the
    values exactly — see ext/text.py:with_fingerprint."""
    return text.with_fingerprint(
        _t(spark, sf_dir, "documents"), hash="poly"
    ).select("doc_id", "fingerprint")


_TEXT_FINGERPRINT_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(1, len(t) - 2),
                   i -> array_to_string(list_slice(t, i, i + 3), ' ')) END AS g
  FROM t
)
SELECT doc_id,
       list_min(list_transform(g, s ->
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(s) + 1),
                            i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
           (h, c) -> (h * 131 + c) % 2147483647))) AS fingerprint
FROM g
"""


def text_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated + deduplicated corpus selection (the composed
    curation pipeline) — doc ids with their quality features."""
    return text.curate_corpus(_t(spark, sf_dir, "documents"))


_TEXT_CURATE_ORACLE = """
WITH scored AS (
    SELECT doc_id, text,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
               / nullif(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS stopword_ratio,
           CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
               / nullif(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS distinct_ratio
    FROM documents
),
filtered AS (
    SELECT * FROM scored
    WHERE n_tokens BETWEEN 30 AND 90 AND distinct_ratio >= 0.3
),
keep AS (
    SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
)
SELECT f.doc_id, f.n_tokens, f.stopword_ratio, f.distinct_ratio
FROM filtered f JOIN keep k ON f.doc_id = k.doc_id
"""


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks, stride 24) —
    map-only fan-out, no shuffle."""
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


_TEXT_CHUNKS_ORACLE = """
WITH t AS (
    -- Spark's posexplode drops NULL-text docs (no tokens, no chunks)
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
    FROM documents WHERE text IS NOT NULL
),
c AS (
    SELECT doc_id, toks,
           greatest(1, CAST(ceil((len(toks) - 32.0) / 24.0) AS INT) + 1) AS n_chunks
    FROM t
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       array_to_string(list_slice(toks, i*24 + 1, i*24 + 32), ' ') AS chunk_text,
       CAST(len(string_split(array_to_string(list_slice(toks, i*24 + 1, i*24 + 32), ' '),
                             ' ')) AS BIGINT) AS chunk_n_tokens
FROM c, unnest(range(0, n_chunks)) AS u(i)
"""


# The synthetic corpus has no organic PII/URLs, so the scrub entries
# plant deterministic ones from existing columns — the operators then do
# real (oracle-checked) work on every row.
_PII_PLANT = (
    "concat(coalesce(text, ''), ' contact ', source, '@corp-', doc_id, '.com id 123-45-6789 "
    "tel +1 415-555-', lpad(CAST(doc_id AS STRING), 4, '0'))"
)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction counts + cleaned text over planted emails/ids/phones."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_PII_PLANT} AS text"
    )
    return scrub.redact_pii(docs).select(
        "doc_id", "n_emails", "n_ids", "n_phones", "clean_text"
    )


_PII_REDACT_ORACLE = """
WITH planted AS (
    SELECT doc_id,
           concat(coalesce(text, ''), ' contact ', source, '@corp-', doc_id, '.com id 123-45-6789 tel +1 415-555-',
                  lpad(CAST(doc_id AS VARCHAR), 4, '0')) AS text
    FROM documents
),
s1 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
               AS n_emails,
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g')
               AS no_email
    FROM planted
),
s2 AS (
    SELECT doc_id, n_emails,
           CAST(len(regexp_extract_all(no_email, '\\d{3}-\\d{2}-\\d{4}')) AS INT) AS n_ids,
           regexp_replace(no_email, '\\d{3}-\\d{2}-\\d{4}', '[ID]', 'g') AS no_id
    FROM s1
)
SELECT doc_id, n_emails, n_ids,
       CAST(len(regexp_extract_all(no_id, '\\+?\\d[\\d\\- ]{6,}\\d')) AS INT) AS n_phones,
       regexp_replace(no_id, '\\+?\\d[\\d\\- ]{6,}\\d', '[PHONE]', 'g') AS clean_text
FROM s2
"""


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-line removal over docs with a planted shared footer
    (every doc gets one): the footer must vanish, unique lines stay."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "concat(coalesce(text, ''), '\\n', 'shared footer line') AS text"
    )
    return scrub.strip_boilerplate(docs, max_doc_frac=0.2)


_TEXT_BOILERPLATE_ORACLE = """
WITH planted AS (
    SELECT doc_id, concat(coalesce(text, ''), chr(10), 'shared footer line') AS text
    FROM documents
),
arrs AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted),
lines AS (
    SELECT doc_id, CAST(i AS INT) AS idx, ls[CAST(i AS INT) + 1] AS line
    FROM arrs, unnest(range(0, len(ls))) AS t(i)
),
freq AS (SELECT line, count(DISTINCT doc_id) AS ld FROM lines GROUP BY line),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM planted)
SELECT l.doc_id, string_agg(l.line, chr(10) ORDER BY l.idx) AS clean_text
FROM lines l JOIN freq f USING (line) CROSS JOIN n
WHERE f.ld / n.nd <= 0.2
GROUP BY l.doc_id
"""


def url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus domain frequency over planted URLs (one per doc +
    a shared domain every 10th doc)."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "concat(coalesce(text, ''), ' see https://', source, '.example.com/p/', doc_id, "
        "CASE WHEN doc_id % 10 = 0 THEN ' and https://common.example.org/x' ELSE '' END) AS text",
    )
    return scrub.domain_stats(docs).orderBy("domain")


_URL_DOMAINS_ORACLE = """
WITH planted AS (
    SELECT concat(coalesce(text, ''), ' see https://', source, '.example.com/p/', doc_id,
                  CASE WHEN doc_id % 10 = 0 THEN ' and https://common.example.org/x' ELSE '' END)
               AS text
    FROM documents
)
SELECT lower(u) AS domain, count(*) AS n_urls
FROM planted, unnest(regexp_extract_all(text, 'https?://([^/\\s]+)', 1)) AS t(u)
GROUP BY lower(u) ORDER BY domain
"""




def emb_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embeddings table (map-only).
    qvec serialized to a comma string (the driver's canonicalizer
    cannot factorize list cells, same as multimodal_features)."""
    out = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        F.concat_ws(",", F.col("qvec")).alias("qvec_sig"),
        "scale",
    )


# floor(x + 0.5) rounding is IEEE-deterministic in both engines (round()
# is not: Spark rounds half-up on canonical strings, DuckDB on binary)
_EMB_QUANTIZED_ORACLE = """
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
m AS (
    SELECT vec_id, v,
           greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS mx
    FROM e
)
SELECT vec_id,
       array_to_string(list_transform(v,
           x -> CAST(floor(x * 127 / mx + 0.5) AS INT)), ',') AS qvec_sig,
       mx / 127 AS scale
FROM m
"""


def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over the int8-QUANTIZED table — integer dot
    products, scales factor out of the ranking; the documented
    query-vector fetch (see _query_vec) is the only driver job."""
    return similarity.dequantize_cosine_topk(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10
    )


_SIM_QUANTIZED_TOPK_ORACLE = """
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
m AS (
    SELECT vec_id, v,
           greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS mx
    FROM e
),
qt AS (
    SELECT vec_id,
           list_transform(v, x -> floor(x * 127 / mx + 0.5)) AS qv
    FROM m
),
q AS (SELECT qv AS qq FROM qt WHERE vec_id = 0)
SELECT qt.vec_id,
       list_dot_product(qt.qv, q.qq)
       / (sqrt(list_dot_product(qt.qv, qt.qv)) * sqrt(list_dot_product(q.qq, q.qq)))
           AS cosine
FROM qt, q
ORDER BY cosine DESC, qt.vec_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-blob feature extraction through the Arrow/mapInPandas
    plumbing (decode step stubbed deterministically).

    The contract entry serializes the ``array<float>`` feature vector to
    a scalar signature (the per-slice byte-sum integers, comma-joined):
    the driver's pandas canonicalizer can't factorize list cells, and
    x*1009 rounds exactly back to the integer the stub divided by, so
    the signature is integer-clean and oracle-checkable.
    """
    blobs = multimodal.make_blob_table(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source"
    )
    feats = multimodal.extract_features(blobs, decode_stub=True)
    return feats.select(
        "blob_id",
        "media_type",
        "n_bytes",
        "checksum",
        F.concat_ws(
            ",",
            F.transform("feature", lambda x: F.round(x * 1009).cast("int")),
        ).alias("feature_sig"),
    )


# The stub feature (ext/multimodal.py:_decode_one) is pure byte math:
# step = max(n//8, 1); slice sums mod 1009 over the UTF-8 payload, plus a
# first-256-bytes checksum. DuckDB reproduces the byte values from
# hex(encode(text)) with a strpos-based nibble decode.
_MULTIMODAL_FEATURES_ORACLE = """
WITH blobs AS (
    -- make_blob_table drops NULL payloads (a blob needs bytes)
    SELECT doc_id AS blob_id, hex(encode(text)) AS h,
           octet_length(encode(text)) AS n
    FROM documents WHERE text IS NOT NULL
),
b AS (
    SELECT blob_id, n,
           list_transform(range(0, n), j ->
               (strpos('0123456789ABCDEF', substr(h, 2*j + 1, 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(h, 2*j + 2, 1)) - 1) AS bs,
           greatest(n // 8, 1) AS step
    FROM blobs
)
SELECT blob_id,
       'application/octet-stream' AS media_type,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(coalesce(list_sum(list_slice(bs, 1, least(n, 256))), 0)
            % 2147483648 AS BIGINT) AS checksum,
       CASE WHEN n = 0 THEN '0,0,0,0,0,0,0,0'
            ELSE array_to_string(
                list_transform(range(0, least(n, 8)), i ->
                    coalesce(list_sum(list_slice(bs, i*step + 1, i*step + step)), 0)
                    % 1009),
                ',')
       END AS feature_sig
FROM b
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_embedding": dedup_embedding,
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "dedup_semantic": dedup_semantic,
        "dedup_clusters": dedup_clusters,
        "sim_cosine_topk": sim_cosine_topk,
        "sim_ann_lsh": sim_ann_lsh,
        "sim_ivf_topk": sim_ivf_topk,
        "sim_ann_join": sim_ann_join,
        "sim_pq_topk": sim_pq_topk,
        "emb_quantized": emb_quantized,
        "sim_quantized_topk": sim_quantized_topk,
        "emb_mean_pool": emb_mean_pool,
        "text_tokens": text_tokens,
        "text_quality": text_quality,
        "text_stats": text_stats,
        "text_tfidf": text_tfidf,
        "text_langid": text_langid,
        "text_fingerprint": text_fingerprint,
        "text_chunks": text_chunks,
        "text_curate": text_curate,
        "pii_redact": pii_redact,
        "url_domains": url_domains,
        "text_boilerplate": text_boilerplate,
        "multimodal_features": multimodal_features,
    }


def _xx_minhash_oracle() -> str:
    from bq_duckdb_spark.ext.xx_oracles import minhash_oracle

    return minhash_oracle()


def _xx_simhash_oracle() -> str:
    # n_blocks=4 matches the entry's pinned scheme (see dedup_simhash)
    from bq_duckdb_spark.ext.xx_oracles import simhash_oracle

    return simhash_oracle(n_blocks=4)


def _xx_jaccard_oracle() -> str:
    from bq_duckdb_spark.ext.xx_oracles import jaccard_oracle

    return jaccard_oracle()


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "dedup_embedding": _DEDUP_EMBEDDING_ORACLE,
        "dedup_embedding_lsh": _embedding_lsh_oracle(),
        "dedup_semantic": _DEDUP_SEMANTIC_ORACLE,
        "dedup_clusters": _dedup_clusters_oracle(),
        "sim_cosine_topk": _SIM_COSINE_TOPK_ORACLE,
        "sim_ivf_topk": _SIM_IVF_TOPK_ORACLE,
        "sim_ann_join": _SIM_ANN_JOIN_ORACLE,
        "sim_pq_topk": _pq_oracle(),
        "emb_quantized": _EMB_QUANTIZED_ORACLE,
        "sim_quantized_topk": _SIM_QUANTIZED_TOPK_ORACLE,
        "sim_ann_lsh": _lsh_ann_oracle(),
        "dedup_minhash": _xx_minhash_oracle(),
        "dedup_simhash": _xx_simhash_oracle(),
        "dedup_ngram_jaccard": _xx_jaccard_oracle(),
        "emb_mean_pool": _EMB_MEAN_POOL_ORACLE,
        "text_tokens": _TEXT_TOKENS_ORACLE,
        "text_quality": _TEXT_QUALITY_ORACLE,
        "text_stats": _TEXT_STATS_ORACLE,
        "text_tfidf": _TEXT_TFIDF_ORACLE,
        "text_langid": _langid_oracle(),
        "text_fingerprint": _TEXT_FINGERPRINT_ORACLE,
        "text_chunks": _TEXT_CHUNKS_ORACLE,
        "text_curate": _TEXT_CURATE_ORACLE,
        "pii_redact": _PII_REDACT_ORACLE,
        "url_domains": _URL_DOMAINS_ORACLE,
        "text_boilerplate": _TEXT_BOILERPLATE_ORACLE,
        "multimodal_features": _MULTIMODAL_FEATURES_ORACLE,
    }
