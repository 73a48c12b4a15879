"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hot paths stay JVM-side (higher-order functions over token arrays,
xxhash64), so they whole-stage-codegen and scale linearly; no Python UDFs.

Scale design:
- exact dedup = hash-groupBy (one shuffle on the dedup key);
- near-dup never does an all-pairs join: MinHash banding / SimHash
  chunking bucket the corpus so candidate generation is a shuffle on
  (band, bucket-hash) and verification touches only co-bucketed pairs —
  the standard shingle→minhash→band→bucket-join pipeline;
- skewed buckets (e.g. empty-text docs) can be salted or capped with a
  per-bucket LIMIT before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct key — hash-based exact dedup.
    One shuffle on the key columns; fully parallel at any scale."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*key_cols, id_col], how="inner")


def exact_dup_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per duplicate-group stats keyed by content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def _tokens_expr(text_col: str) -> str:
    return f"split(trim({text_col}), '\\\\s+')"


def _shingles_expr(text_col: str, k: int) -> str:
    """Token k-gram shingles as an array<string> (distinct)."""
    toks = _tokens_expr(text_col)
    return (
        f"array_distinct(CASE WHEN size({toks}) < {k} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {k}))) END)"
    )


def with_minhash_signature(
    df: DataFrame, text_col: str, num_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """Add ``signature: array<bigint>`` — minimum of xxhash64(shingle,
    seed_i) over the document's shingles, one element per seed. Pure
    JVM expression (no UDF); deterministic."""
    sh = _shingles_expr(text_col, shingle_k)
    sigs = ", ".join(
        f"array_min(transform(__shingles, s -> xxhash64(s, {seed})))"
        for seed in range(num_hashes)
    )
    return (
        df.withColumn("__shingles", F.expr(sh))
        .withColumn("signature", F.expr(f"array({sigs})"))
        .drop("__shingles")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, hash each
    band, and emit candidate id-pairs that share any band bucket.

    Scale: explode is bands× row inflation; the pair join shuffles on
    (band, band_hash) only — never all-pairs. Output: (id_a, id_b)
    distinct with id_a < id_b.
    """
    rows = num_hashes // bands
    sig = with_minhash_signature(df, text_col, num_hashes, shingle_k).select(
        F.col(id_col), "signature"
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> named_struct('band', b, 'bucket', "
                f"xxhash64(concat_ws(',', slice(signature, b * {rows} + 1, {rows})))))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with exact n-gram Jaccard verification over
    MinHash-banded candidates: candidates via bucket join, then
    jaccard = |A∩B| / |A∪B| on the true shingle sets — only for
    co-bucketed pairs."""
    cands = minhash_candidate_pairs(df, text_col, id_col, num_hashes, bands, shingle_k)
    sh = df.select(
        F.col(id_col), F.expr(_shingles_expr(text_col, shingle_k)).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.expr(
                "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash64(df: DataFrame, text_col: str) -> DataFrame:
    """Add ``simhash: bigint`` — 64-bit SimHash of the token set.

    Classic bit-vote construction: each token votes ±1 per bit position
    of its xxhash64; the fingerprint sets bits with positive vote sum.
    Expressed entirely with higher-order functions (fold over tokens).
    """
    toks = _tokens_expr(text_col)
    votes = (
        f"aggregate({toks}, cast(array_repeat(0, 64) as array<int>), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, 63), "
        f"i -> CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1 THEN 1 ELSE -1 END), "
        f"(a, b) -> a + b))"
    )
    pack = (
        "aggregate(sequence(0, 63), 0L, "
        "(s, i) -> CASE WHEN element_at(__votes, i + 1) > 0 "
        "THEN s | shiftleft(1L, i) ELSE s END)"
    )
    return (
        df.withColumn("__votes", F.expr(votes))
        .withColumn("simhash", F.expr(pack))
        .drop("__votes")
    )


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup id-pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into 4 16-bit
    chunks — any pair within Hamming distance 3 must agree on at least
    one chunk — bucket-join on (chunk_idx, chunk_value), then verify
    with bit_count(xor). No all-pairs comparison.
    """
    sh = with_simhash64(df, text_col).select(F.col(id_col), "simhash")
    chunked = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "c -> named_struct('chunk', c, 'val', "
                "shiftright(simhash, c * 16) & 65535))"
            )
        ).alias("cc"),
    ).select(id_col, "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
