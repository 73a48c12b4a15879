"""Driver-contract entries for the portable-hash dedup twins
(ext/dedup_portable.py) — the full MinHash-LSH banding, SimHash
pigeonhole, and Jaccard-verify pipelines, value-checked against DuckDB.

The DuckDB SQL is generated from the SAME expression builders the Spark
operators use (char_poly_expr / grams_expr / band_bucket_expr /
simhash_expr with engine='duckdb'), so the arithmetic is defined once;
an oracle mismatch would mean the banding semantics themselves drifted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import dedup_portable as dp
from bq_duckdb_spark.testdata import load_table as _t

# (32 hashes, 16 bands, r=2): RECALL_r8.txt measured 99.94% recall at
# t=0.3 on the hostile gate corpus vs 89.4% for the old (32, 8, r=4) —
# same signature budget, +14% candidate volume. Worst-case S-curve
# guarantees need derive_banding (ext/dedup.py), e.g. (64, 32) for 95%.
_NUM_HASHES, _BANDS, _K = 32, 16, 3


def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banding candidates with the engine-portable hash
    family — the whole pipeline (shingle hash, permutations, band
    buckets, pair expansion) is oracle-verified; the xxhash64 twin
    (dedup_minhash) stays the production fast path."""
    return dp.portable_minhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=_K,
    )


def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pigeonhole near-dup pairs, portable hash family."""
    return dp.portable_simhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def dedup_simhash_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups under PRECISE multi-block banding — the
    at-scale scheme (Manku/Jain/Sarma WWW'07 multi-table construction):
    6 blocks of the fingerprint, one band per 3-block combination
    (C(6,3)=20 bands, ~14-bit packed keys on the 28-bit portable
    fingerprint; ~33-bit on the production 64-bit one). Versus the
    4-chunk scheme's 2^7-value buckets, random co-bucketing collapses,
    so candidate pairs — and wall time — stay ~linear in corpus size;
    the pigeonhole guarantee (every pair within Hamming 3 shares a
    band) is preserved, and this entry's oracle proves the pair set is
    IDENTICAL to brute force at this corpus. Same banding core as
    dedup.simhash_near_dup_pairs(n_blocks=6)."""
    return dp.portable_simhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3, chunks=6
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def dedup_jaccard_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over portable-minhash candidates."""
    return dp.portable_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.3,
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=_K,
    )


def dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join (prefix + length filtering, All-Pairs/
    PPJoin family — ext/setjoin.py): every pair with shingle Jaccard
    >= 0.3, no LSH recall loss. The oracle is the brute-force
    shared-shingle join, so a hash match proves the pruning drops
    nothing."""
    from bq_duckdb_spark.ext.setjoin import exact_jaccard_join

    return exact_jaccard_join(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        threshold=0.3, shingle_k=_K,
    )


def _jaccard_exact_oracle() -> str:
    # brute force by construction: candidate = ANY shared shingle
    # (output-sensitive exploded join), independent of the operator's
    # prefix filter — a hash match proves the filter is lossless
    return (
        f"WITH {_sh_cte()}, "
        "ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh), "
        "sz AS MATERIALIZED (SELECT doc_id, len(sh) AS sz FROM sh), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "count(*) AS i FROM ex a JOIN ex b ON a.s = b.s "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT id_a, id_b, "
        "CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard "
        "FROM inter "
        "JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b "
        "WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.3"
    )


def _sh_cte(where: str = "") -> str:
    # tokenize ONCE per document into a materialized CTE, then build
    # grams from the array column — inlining the regexp split into the
    # per-gram lambda is O(tokens × doc_len) per document (see
    # grams_expr docstring; this was the hostile-corpus oracle-timeout
    # root cause). sh is MATERIALIZED because most callers reference it
    # two or three more times for the verify stage.
    g = dp.grams_expr("text", _K, "duckdb", tokens="toks")
    poly = dp.char_poly_expr("s", "duckdb")
    return (
        f"shtok AS MATERIALIZED (SELECT doc_id, "
        f"regexp_split_to_array(trim(text), '\\s+') AS toks "
        f"FROM documents{where}), "
        f"sh AS MATERIALIZED (SELECT doc_id, "
        f"list_distinct(list_transform({g}, s -> {poly})) AS sh "
        f"FROM shtok)"
    )


def _banded_cte(cap: int | None = 1000) -> str:
    a, b = dp.poly_hash_coeffs(_NUM_HASHES)
    rows = _NUM_HASHES // _BANDS
    buckets = ", ".join(
        dp.band_bucket_expr("sh", a[i * rows:(i + 1) * rows], b[i * rows:(i + 1) * rows], "duckdb")
        for i in range(_BANDS)
    )
    # the trailing QUALIFY mirrors the operator's max_bucket cap (the
    # sorted collect_list slice keeps each bucket's ``cap`` SMALLEST
    # ids); cross_corpus_near_dups has no cap, so its oracle passes None
    qualify = (
        f"QUALIFY row_number() OVER (PARTITION BY u.band, buckets[u.band + 1] "
        f"ORDER BY doc_id) <= {cap}"
        if cap
        else ""
    )
    return (
        f"b AS (SELECT doc_id, [{buckets}] AS buckets FROM sh), "
        f"banded AS (SELECT doc_id, u.band, buckets[u.band + 1] AS bucket "
        f"FROM b, UNNEST(range(0, {_BANDS})) AS u(band) {qualify})"
    )


def _minhash_oracle() -> str:
    return (
        f"WITH {_sh_cte()}, {_banded_cte()} "
        "SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id < b2.doc_id"
    )


def _jaccard_oracle() -> str:
    return (
        f"WITH {_sh_cte()}, {_banded_cte()}, "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id < b2.doc_id) "
        "SELECT p.id_a, p.id_b, "
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard "
        "FROM pairs p JOIN sh sa ON sa.doc_id = p.id_a "
        "JOIN sh sb ON sb.doc_id = p.id_b "
        "WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.3"
    )


def _simhash_oracle() -> str:
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    poly = dp.char_poly_expr("t", "duckdb")
    fp = dp.simhash_expr("th", 28, "duckdb")
    return (
        f"WITH th AS (SELECT doc_id, "
        f"list_transform({toks}, t -> {poly}) AS th FROM documents), "
        f"fp AS (SELECT doc_id, {fp} AS simhash FROM th), "
        f"ch AS (SELECT doc_id, simhash, u.chunk, "
        f"(simhash >> (u.chunk * 7)) & 127 AS val "
        f"FROM fp, UNNEST(range(0, 4)) AS u(chunk) "
        # mirrors the operator's max_bucket cap (1000 smallest ids kept)
        f"QUALIFY row_number() OVER (PARTITION BY u.chunk, "
        f"(simhash >> (u.chunk * 7)) & 127 ORDER BY doc_id) <= 1000) "
        f"SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        f"CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        f"FROM ch a JOIN ch b USING (chunk, val) "
        f"WHERE a.doc_id < b.doc_id "
        f"AND bit_count(xor(a.simhash, b.simhash)) <= 3"
    )


def _simhash_blocked_oracle(cap: int = 1000) -> str:
    """Mirror of the 6-block banding: band keys, caps, and the verify are
    generated from the SAME layout/combo/pack builders the Spark
    operator uses (ext/dedup.py) — pure >>/&/*/+ arithmetic both
    engines evaluate identically."""
    from bq_duckdb_spark.ext.dedup import band_combos, band_key_exprs, block_layout

    toks = r"regexp_split_to_array(trim(text), '\s+')"
    poly = dp.char_poly_expr("t", "duckdb")
    fp = dp.simhash_expr("th", 28, "duckdb")
    combos = band_combos(6, 3)
    keys = ", ".join(band_key_exprs("simhash", block_layout(28, 6), combos))
    return (
        f"WITH th AS (SELECT doc_id, "
        f"list_transform({toks}, t -> {poly}) AS th FROM documents), "
        f"fp AS (SELECT doc_id, {fp} AS simhash FROM th), "
        f"keyed AS (SELECT doc_id, simhash, [{keys}] AS keys FROM fp), "
        f"banded AS (SELECT doc_id, simhash, u.band, keys[u.band + 1] AS key "
        f"FROM keyed, UNNEST(range(0, {len(combos)})) AS u(band) "
        # mirrors the operator's max_bucket cap (smallest ids kept per bucket)
        f"QUALIFY row_number() OVER (PARTITION BY u.band, keys[u.band + 1] "
        f"ORDER BY doc_id) <= {cap}) "
        f"SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        f"CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        f"FROM banded a JOIN banded b USING (band, key) "
        f"WHERE a.doc_id < b.doc_id "
        f"AND bit_count(xor(a.simhash, b.simhash)) <= 3"
    )


def dedup_text_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-dup pairs resolved into duplicate CLUSTERS with a
    canonical-keeper pick per cluster — the complete text-dedup loop
    (portable-jaccard pairs -> hash-min connected components -> every
    document labelled). The embedding twin is dedup_clusters."""
    from bq_duckdb_spark.ext.dedup import assign_dup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = dp.portable_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3,
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=_K,
    )
    out = assign_dup_clusters(docs.select("doc_id"), pairs, "doc_id")
    return out.select(
        "doc_id", F.col("cluster_id").cast("long").alias("cluster_id"),
        "is_canonical",
    )


def components_ctes(rounds: int = 16) -> str:
    """Connected-components CTE chain from an ``edges(src, dst)`` CTE
    (callers must also provide the reversed edges) to a final
    ``lab(node, cl)`` — Shiloach-Vishkin-style hash-min, NO ``WITH
    RECURSIVE`` (whose ``reach`` closure enumerates every (node,
    reachable-label) pair: ~30 s at sf0.1, superlinear beyond, and
    observed OOM at sf1 on the 600k-edge embedding graph).

    Each round does (a) an edge relax (min label over neighbours),
    (b) parent hooking (a node's PREVIOUS label learns the node's new
    min — the Shiloach-Vishkin step that makes reach compound), and
    (c) a pointer jump (``lbl := lbl(lbl)``). gen_fuzz finding (seed
    201, round 10): without (b), reach grows ~1 hop/round — a 394-node
    random near-dup component with eccentricity 28 needed 19 rounds and
    the unrolled 16 returned SILENTLY WRONG labels (the old docstring's
    "reach doubles per round" claim was false). With hooking the
    measured convergence on a hostile panel (random gnp, paths/cycles/
    trees to 10k nodes with permuted ids) is <= ceil(log2(n)) + 2
    rounds, so 16 rounds covers components to ~2^14 nodes — far beyond
    any banded near-dup component at the tested SFs, and pinned by
    tests/test_components_oracle.py against a union-find ground truth.

    Also emits ``lab_unconverged(n)``: at the fixpoint labels are
    constant across every edge, so n > 0 proves non-convergence.
    Callers SHOULD append an impossible sentinel row gated on it
    (``UNION ALL SELECT -1, ... FROM lab_unconverged WHERE n > 0``) so
    an under-converged oracle fails the sweep loudly and diagnosably
    instead of hash-mismatching on ordinary-looking rows — the SQL twin
    of the Spark side's raise-on-non-convergence (dedup.py)."""
    prop = []
    prev = "lab0"
    for i in range(1, rounds + 1):
        prop.append(
            f"relax{i} AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM ("
            f"SELECT node, lbl FROM {prev} "
            f"UNION ALL "
            f"SELECT e.src AS node, l.lbl AS lbl FROM edges e "
            f"JOIN {prev} l ON l.node = e.dst) GROUP BY node)"
        )
        prop.append(
            f"hook{i} AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM ("
            f"SELECT node, lbl FROM relax{i} "
            f"UNION ALL "
            f"SELECT p.lbl AS node, m.lbl AS lbl FROM {prev} p "
            f"JOIN relax{i} m ON m.node = p.node) GROUP BY node)"
        )
        prop.append(
            f"lab{i} AS MATERIALIZED (SELECT a.node, b.lbl "
            f"FROM hook{i} a JOIN hook{i} b ON b.node = a.lbl)"
        )
        prev = f"lab{i}"
    return (
        "lab0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM edges "
        "UNION SELECT dst, dst FROM edges), "
        + ", ".join(prop)
        + f", lab AS (SELECT node, min(lbl) AS cl FROM {prev} GROUP BY node)"
        + ", lab_unconverged AS (SELECT count(*) AS n FROM edges e "
        "JOIN lab a ON a.node = e.src JOIN lab b ON b.node = e.dst "
        "WHERE a.cl <> b.cl)"
    )


def _text_clusters_oracle(rounds: int = 16) -> str:
    """Connected components via :func:`components_ctes` (see there for
    why the recursive closure is unusable past sf0.1). Both engines
    converge to the same fixed point (min doc_id per component), so the
    iteration scheme cannot diverge."""
    jac = (
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh)))"
    )
    return (
        f"WITH {_sh_cte()}, {_banded_cte()}, "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id < b2.doc_id), "
        "pairs AS (SELECT p.id_a, p.id_b FROM cand p "
        "JOIN sh sa ON sa.doc_id = p.id_a JOIN sh sb ON sb.doc_id = p.id_b "
        f"WHERE {jac} >= 0.3), "
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        f"{components_ctes(rounds)} "
        "SELECT d.doc_id, CAST(coalesce(l.cl, d.doc_id) AS BIGINT) AS cluster_id, "
        "d.doc_id = coalesce(l.cl, d.doc_id) AS is_canonical "
        "FROM documents d LEFT JOIN lab l ON d.doc_id = l.node "
        "UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), false "
        "FROM lab_unconverged WHERE n > 0"
    )


def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over NEAR-dup clusters — the step a
    production dedup ends with: resolve pairs into clusters
    (dedup_text_clusters) and keep each cluster's best member
    (longest text, doc_id tiebreak), with the cluster size attached.
    dedup_keep_best is the exact-duplicate twin; this one rides the
    banding+verify+components pipeline end to end, so the oracle
    value-checks the full chain through the final business decision."""
    from pyspark.sql.window import Window

    clustered = dedup_text_clusters(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = clustered.join(docs, "doc_id")
    by_quality = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    per_cluster = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("rn", F.row_number().over(by_quality))
        .withColumn(
            "cluster_sz", F.count(F.lit(1)).over(per_cluster).cast("long")
        )
        .where(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "n_chars", "cluster_sz")
    )


def _cluster_keep_best_oracle() -> str:
    return (
        "SELECT doc_id, cluster_id, n_chars, cluster_sz FROM ("
        "SELECT c.doc_id, c.cluster_id, d.n_chars, "
        "row_number() OVER (PARTITION BY c.cluster_id "
        "ORDER BY d.n_chars DESC, c.doc_id) AS rn, "
        "count(*) OVER (PARTITION BY c.cluster_id) AS cluster_sz "
        f"FROM ({_text_clusters_oracle()}) c "
        "JOIN documents d USING (doc_id)"
        ") WHERE rn = 1"
    )


def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality harness: on a bounded subset (doc_id < 400,
    all-pairs ground truth is affordable there by construction), count
    the TRUE near-dup pairs (exact 3-gram Jaccard >= 0.3, brute force —
    the one intentional bounded BNLJ), the banded candidate pairs, the
    verified pairs the pipeline keeps, and the resulting recall. This
    is the evaluation loop run before trusting banding parameters at
    corpus scale; every number is value-checked (portable hash family
    end to end)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    # ONE lazily-checkpointed shingle pass feeds ground truth (both
    # self-join sides), banding, and verify — un-checkpointed, Spark
    # planned the shingle subtree 5x (truth a-side, truth b-side,
    # candidate banding, and both verify passes)
    sh = (
        dp._with_poly_shingle_hashes(
            dp.widen_small_scan(docs), "text", _K, out="sh"
        )
        .select(F.col("doc_id"), "sh")
        .localCheckpoint(eager=False)
    )
    a = sh.select(F.col("doc_id").alias("ia"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("ib"), F.col("sh").alias("sb"))
    jac = "size(array_intersect(sa, sb)) / size(array_union(sa, sb))"
    true_pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .where(F.expr(jac) >= 0.3)
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    cand_pairs = dp._minhash_pairs_from_shingles(
        sh, "doc_id", _NUM_HASHES, _BANDS, max_bucket=1000, sh_col="sh"
    )
    cands = cand_pairs.agg(F.count(F.lit(1)).alias("n_candidates"))
    found = (
        cand_pairs.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .where(
            F.expr("size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))")
            >= 0.3
        )
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return (
        true_pairs.crossJoin(cands)
        .crossJoin(found)
        .select(
            "n_true",
            "n_candidates",
            "n_found",
            # NULL when the slice holds no true pairs (at sf0.1 the
            # planted dup pairs span the id range, so a contiguous
            # bounded slice can legitimately have an empty truth set)
            F.when(
                F.col("n_true") > 0, F.col("n_found") / F.col("n_true")
            ).alias("recall"),
        )
    )


def _lsh_eval_oracle() -> str:
    where = " WHERE doc_id < 400"
    jac = (
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(a.sh, b.sh)))"
    )
    jac_sab = (
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh)))"
    )
    return (
        f"WITH {_sh_cte(where)}, {_banded_cte()}, "
        f"truth AS (SELECT count(*) AS n_true FROM sh a JOIN sh b "
        f"ON a.doc_id < b.doc_id WHERE {jac} >= 0.3), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id < b2.doc_id), "
        "ncand AS (SELECT count(*) AS n_candidates FROM cand), "
        "nfound AS (SELECT count(*) AS n_found FROM cand p "
        "JOIN sh sa ON sa.doc_id = p.id_a JOIN sh sb ON sb.doc_id = p.id_b "
        f"WHERE {jac_sab} >= 0.3) "
        "SELECT n_true, n_candidates, n_found, "
        "CASE WHEN n_true > 0 THEN CAST(n_found AS DOUBLE) / n_true END AS recall "
        "FROM truth, ncand, nfound"
    )




def pipe_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/eval split: hash the near-dup CLUSTER id, not
    the document id — two near-duplicate documents split independently
    would put one in train and its twin in eval, silently inflating
    every eval metric. Composition: portable-jaccard pairs -> hash-min
    components -> deterministic mix-hash split of the cluster label
    (80/20). The whole chain is value-checked: the oracle re-derives
    clusters via unrolled label propagation and applies the same split
    arithmetic."""
    from bq_duckdb_spark.ext.pipeline import mix_hash_expr

    clustered = dedup_text_clusters(spark, sf_dir)
    split = (
        f"CASE WHEN {mix_hash_expr('cluster_id', 3)} % 10 < 8 "
        f"THEN 'train' ELSE 'eval' END"
    )
    return clustered.select("doc_id", "cluster_id", F.expr(split).alias("split"))


def _leakage_free_split_oracle() -> str:
    from bq_duckdb_spark.ext.pipeline import mix_hash_expr

    split = (
        f"CASE WHEN {mix_hash_expr('cluster_id', 3)} % 10 < 8 "
        f"THEN 'train' ELSE 'eval' END"
    )
    return (
        f"SELECT doc_id, cluster_id, {split} AS split "
        f"FROM ({_text_clusters_oracle()})"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_lsh_eval": dedup_lsh_eval,
        "pipe_leakage_free_split": pipe_leakage_free_split,
        "dedup_minhash_portable": dedup_minhash_portable,
        "dedup_simhash_portable": dedup_simhash_portable,
        "dedup_simhash_blocked": dedup_simhash_blocked,
        "dedup_jaccard_portable": dedup_jaccard_portable,
        "dedup_jaccard_exact": dedup_jaccard_exact,
        "dedup_text_clusters": dedup_text_clusters,
        "dedup_cluster_keep_best": dedup_cluster_keep_best,
        "dedup_incremental": dedup_incremental,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_lsh_eval": _lsh_eval_oracle(),
        "pipe_leakage_free_split": _leakage_free_split_oracle(),
        "dedup_minhash_portable": _minhash_oracle(),
        "dedup_simhash_portable": _simhash_oracle(),
        "dedup_simhash_blocked": _simhash_blocked_oracle(),
        "dedup_jaccard_portable": _jaccard_oracle(),
        "dedup_jaccard_exact": _jaccard_exact_oracle(),
        "dedup_text_clusters": _text_clusters_oracle(),
        "dedup_cluster_keep_best": _cluster_keep_best_oracle(),
        "dedup_incremental": _incremental_oracle(),
    }


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus incremental dedup: docs with doc_id % 31 == 0 play
    the incoming shard, the rest the existing corpus; the corpus never
    shuffles (batch banding + shingles broadcast)."""
    docs = _t(spark, sf_dir, "documents")
    return dp.cross_corpus_near_dups(
        docs.filter(F.col("doc_id") % 31 != 0),
        docs.filter(F.col("doc_id") % 31 == 0),
        "text",
        "doc_id",
        threshold=0.3,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        shingle_k=_K,
    )


def _incremental_oracle() -> str:
    return (
        f"WITH {_sh_cte()}, {_banded_cte(cap=None)}, "
        "pairs AS (SELECT DISTINCT a.doc_id AS corpus_id, b2.doc_id AS batch_id "
        "FROM banded a JOIN banded b2 USING (band, bucket) "
        "WHERE a.doc_id % 31 <> 0 AND b2.doc_id % 31 = 0) "
        "SELECT p.corpus_id, p.batch_id, "
        "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard "
        "FROM pairs p JOIN sh sa ON sa.doc_id = p.corpus_id "
        "JOIN sh sb ON sb.doc_id = p.batch_id "
        "WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.3"
    )
