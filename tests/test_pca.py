"""PCA over embeddings (ext/pca.py): recovers known structure, model
sanity (leading eigenvalue dominates, components ~orthonormal), and
partition-count invariance of the quantized fit."""

import math

import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import pca

SF = "/root/testdata/sf0.001"


def _toy(spark, n=400, parts=4):
    """Vectors along a known dominant axis: v = a*e0 + small noise on
    e1, deterministic from the row id."""
    rows = []
    for i in range(n):
        a = (i % 37) - 18.0          # spread along e0
        b = ((i * 7) % 5 - 2) * 0.1  # small spread along e1
        vec = [a, b] + [0.0] * 6
        rows.append((i, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def test_recovers_dominant_axis(spark):
    model = pca.train_pca(_toy(spark), k=2, vec_col="embedding")
    c1, c2 = model["components"]
    # first component is +-e0, second +-e1 (up to quantization)
    assert abs(abs(c1[0]) - 1.0) < 1e-3 and all(abs(x) < 1e-2 for x in c1[1:])
    assert abs(abs(c2[1]) - 1.0) < 1e-3
    assert model["eigenvalues"][0] > model["eigenvalues"][1] > 0


def test_rank_deficient_raises(spark):
    """Round-8 ADVICE: k beyond the data's effective rank errors loudly
    (the oracle recurrence would hit w/sqrt(0) and desync otherwise)."""
    rows = [(i, [float(i % 7 - 3)] + [0.0] * 7) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero norm"):
        pca.train_pca(df, k=2, vec_col="embedding")


def test_components_orthonormal(spark):
    from bq_duckdb_spark.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    model = pca.train_pca(emb, k=2)
    c1, c2 = model["components"]
    assert abs(sum(x * x for x in c1) - 1.0) < 1e-4
    assert abs(sum(x * x for x in c2) - 1.0) < 1e-4
    # random embeddings have a flat spectrum (lam1/lam2 ~ 1.08), so
    # 24 power iterations leave ~1e-2 residual non-orthogonality
    assert abs(sum(a * b for a, b in zip(c1, c2))) < 0.05


def test_projection_variance_ordering(spark):
    from bq_duckdb_spark.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    out = pca.pca_project(emb, k=2)
    stats = out.agg(
        F.variance("pc1").alias("v1"), F.variance("pc2").alias("v2")
    ).collect()[0]
    assert stats.v1 > stats.v2 > 0


def test_partition_count_invariance(spark):
    """The quantized fit must not depend on how rows are partitioned —
    the mapInPandas Gram partials sum in different orders under
    different layouts, and quantization must absorb that."""
    a = pca.train_pca(_toy(spark, parts=1), k=2, vec_col="embedding")
    b = pca.train_pca(_toy(spark, parts=16), k=2, vec_col="embedding")
    assert a == b


def test_projection_matches_manual_dot(spark):
    df = _toy(spark, n=50, parts=2)
    model = pca.train_pca(df, k=1, vec_col="embedding")
    got = {r.vec_id: r.pc1 for r in pca.pca_project(df, k=1, vec_col="embedding").collect()}
    m, c = model["mean"], model["components"][0]
    for r in df.collect():
        want = sum((v - mv) * cv for v, mv, cv in zip(r.embedding, m, c))
        want = math.floor(want * 10**6 + 0.5) / 10**6
        assert got[r.vec_id] == pytest.approx(want, abs=2e-6)
