"""Scaling probe: wall-time curves for the flagship operators across
data sizes (sf0.01 → sf0.1 → a synthesized 5× corpus), recording how
runtime grows relative to input growth.

The synthesized tier replicates sf0.1 documents 5× with REWRITTEN
content per replica (tokens rotated by a replica-dependent offset, a
replica-tagged lead token, and shifted ids) so the corpus grows without
planting exact/near duplicates — replicating verbatim would mass-create
identical docs, whose quadratic in-bucket pair expansion is the
documented pathological input for near-dup banding (run exact dedup
first, per ext/dedup.py), and would measure that pathology rather than
scaling. Embeddings replicate with a per-replica deterministic value
tweak for the same reason.

Usage: python tools/scaling_probe.py [out_path]
       python tools/scaling_probe.py --deep [out_path]
Writes one line per (operator, tier): name, rows, seconds; then a
summary of time-growth vs data-growth per operator.

--deep is the round-10 decade push (VERDICT r9 item 4): the standard
curves stop at 625k docs / 3M lineitem; --deep probes the four paths
the 100 TB story leans on hardest — minhash BANDING, substring dedup,
pointer-jumped connected COMPONENTS, and two-phase heavy hitters — at
625k and 3.125M docs (synth625x, one decade past synth125x), plus the
TPC-H fact-join subset at 6M and 60M lineitem rows (synth100x).
Tiers are written to /tmp parquet (not localCheckpoint) so the deep
corpora don't occupy executor storage memory while operators run.
Deepest-tier timings are single-run (the exponent over a 5x span moves
~0.06 per 10% timing noise — acceptable; a second run would double a
~25 min probe).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bq_duckdb_spark import get_spark


def synth_docs(spark, base_dir: str, copies: int, tag: str = "r"):
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(copies):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        if i:
            # rotate the token stream AND suffix every 3rd token with a
            # replica tag: every 3-gram shingle then contains a rewritten
            # token, so replicas share ~no shingles (minhash/jaccard/
            # containment see Jaccard ~0, not the ~0.4 a sparser every-7th
            # substitution left — which made those probes measure planted
            # near-dup density growing quadratically in the copy count
            # instead of scaling), and a third of the token MULTISET
            # changes (simhash is bag-of-words, so rotation alone would
            # leave replicas as planted near-dups). SUFFIXING the original
            # token (vs replacing it with one of a few fixed tags) keeps
            # the vocabulary's entropy: a fixed-tag pool collapses the
            # token space under repeated re-replication (the 125x tier
            # builds on the 25x corpus), which manufactures genuinely
            # similar docs and made every near-dup probe superlinear at
            # the deep tier — a data artifact, not an operator property.
            # ``tag`` distinguishes replication LEVELS: without it, deep
            # replica i of an untransformed base doc would reproduce the
            # first-level replica i byte for byte (same formula, same
            # input) — thousands of planted exact-dup pairs at the deep
            # tier.
            d = d.withColumn(
                "text",
                F.expr(
                    f"concat_ws(' ', concat('rep{tag}{i}x', ''), "
                    f"concat_ws(' ', transform("
                    f"  concat(slice(split(trim(text), '\\\\s+'), {i + 1}, 100000), "
                    f"         slice(split(trim(text), '\\\\s+'), 1, {i})), "
                    f"  (t, j) -> IF(pmod(j + {i}, 3) = 0, "
                    f"             concat(t, '_{tag}{i}'), t))))"
                ),
            )
        reps.append(d)
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    return out


def synth_embeddings(spark, base_dir: str, copies: int):
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = []
    for i in range(copies):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
        if i:
            e = e.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, j) -> "
                    f"CAST(x + 0.01 * {i} * (1 + j % 3) AS FLOAT))"
                ),
            )
        reps.append(e)
    out = reps[0]
    for e in reps[1:]:
        out = out.unionByName(e)
    return out


def synth_tpch(spark, base_dir: str, copies: int, out_dir: str) -> str:
    """Materialize a ``copies``x TPC-H tier: lineitem/orders replicated
    with shifted order keys (so joins fan out, never self-match), dims
    copied as-is (dims grow sublinearly in real warehouses; holding them
    fixed isolates FACT-side scaling, which is what breaks at 100 TB).
    Written as parquet dirs named ``<table>.parquet`` so the contract
    functions (load_table) run against the tier unchanged."""
    orders = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    n = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_out, o_out = None, None
    for i in range(copies):
        lr = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * n))
        orr = orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n))
        li_out = lr if li_out is None else li_out.unionByName(lr)
        o_out = orr if o_out is None else o_out.unionByName(orr)
    li_out.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    o_out.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    for dim in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(os.path.join(base_dir, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{dim}.parquet"))
    return out_dir


def deep_probe(out_path: str) -> None:
    """Round-10 decade push: banding / substring-dedup / components /
    heavy-hitters at 625k and 3.125M docs; TPC-H fact joins at 6M and
    60M lineitem rows. See module docstring (--deep)."""
    import math

    spark = get_spark(app_name="scaling-deep", cpus="32")
    from bq_duckdb_spark.ext import dedup, heavyhitters, pipeline

    def build_docs_tier(src_dir: str, copies: int, tag: str, dst: str) -> str:
        if not os.path.exists(os.path.join(dst, "documents.parquet", "_SUCCESS")):
            synth_docs(spark, src_dir, copies, tag=tag).repartition(32) \
                .write.mode("overwrite") \
                .parquet(os.path.join(dst, "documents.parquet"))
        return dst

    t25 = build_docs_tier("/root/testdata/sf0.1", 25, "r", "/tmp/deep_docs25x")
    t125 = build_docs_tier(t25, 5, "d", "/tmp/deep_docs125x")
    t625 = build_docs_tier(t125, 5, "e", "/tmp/deep_docs625x")

    def doc_ops(docs):
        return {
            "minhash_banding": lambda: dedup.minhash_candidate_pairs(
                docs, "text", "doc_id"),
            "substring_dedup": lambda: pipeline.substring_dedup(
                docs, "text", "doc_id", k=8, hash_windows=True),
            "components": lambda: dedup.connected_components(
                dedup.minhash_candidate_pairs(docs, "text", "doc_id")),
            "heavy_hitters": lambda: heavyhitters.heavy_hitters(
                docs.select(F.explode(
                    F.expr("split(trim(text), '\\\\s+')")).alias("t")),
                "t", s=1000),
        }

    lines = [
        "deep scaling probe (round 10): one decade past the standard "
        "curves",
        "docs: 125k -> 625k -> 3.125M (synth rewrites, no planted dups); "
        "TPC-H: 600k -> 6M -> 60M lineitem",
        "single timed run per (op, tier) after one warm-up of the "
        "smallest tier per op",
        "",
    ]
    results: dict[str, dict[str, float]] = {}
    doc_tiers = [("125k", t25), ("625k", t125), ("3.125M", t625)]
    # warm every op once on the smallest tier: codegen + Python worker
    # spin-up must not inflate the small-tier timings (that would
    # UNDERstate the growth exponents)
    warm_docs = spark.read.parquet(os.path.join(t25, "documents.parquet"))
    for mk in doc_ops(warm_docs).values():
        mk().write.format("noop").mode("overwrite").save()
    for tier, d in doc_tiers:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n = docs.count()
        for name, mk in doc_ops(docs).items():
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            results.setdefault(name, {})[tier] = dt
            lines.append(f"{tier:7s} {name:16s} rows={n:8d} {dt:7.2f}s")
            print(lines[-1], flush=True)

    tpch_queries = ["q06_forecast_revenue", "q09_product_profit",
                    "q18_large_volume"]
    from bq_duckdb_spark import contract_tpch
    tq = contract_tpch.queries()
    tpch_tiers = [("600k", "/root/testdata/sf0.1")]
    for copies, label in ((10, "6M"), (100, "60M")):
        dst = f"/tmp/deep_tpch{copies}x"
        if not os.path.exists(os.path.join(dst, "lineitem.parquet", "_SUCCESS")):
            synth_tpch(spark, "/root/testdata/sf0.1", copies, dst)
        tpch_tiers.append((label, dst))
    for name in tpch_queries:  # warm-up, same rationale as doc ops
        tq[name](spark, "/root/testdata/sf0.1").write.format("noop") \
            .mode("overwrite").save()
    for tier, sf_dir in tpch_tiers:
        for name in tpch_queries:
            t0 = time.time()
            tq[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            results.setdefault(name, {})[tier] = dt
            lines.append(f"{tier:7s} {name:26s} {dt:7.2f}s")
            print(lines[-1], flush=True)

    lines.append("")
    lines.append("growth exponents (alpha in time ~ data^alpha; "
                 "1.0 = linear, <1 sublinear):")
    spans = [("125k", "625k", 5.0), ("625k", "3.125M", 5.0),
             ("600k", "6M", 10.0), ("6M", "60M", 10.0)]
    for name, by_tier in sorted(results.items()):
        for a, b, factor in spans:
            if a in by_tier and b in by_tier and by_tier[a] > 0:
                alpha = math.log(by_tier[b] / by_tier[a]) / math.log(factor)
                lines.append(
                    f"  {name:26s} {a:>6s}->{b:<7s} "
                    f"{by_tier[b] / by_tier[a]:5.2f}x time per {factor:.0f}x "
                    f"data  alpha={alpha:5.2f}")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out_path}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--deep":
        deep_probe(sys.argv[2] if len(sys.argv) > 2 else "SCALING_deep.txt")
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r4.txt"
    spark = get_spark(app_name="scaling-probe", cpus="32")

    from bq_duckdb_spark.ext import dedup, heavyhitters, lm, pipeline, setjoin, text
    from bq_duckdb_spark.ext.cluster import kmeans_assign
    from bq_duckdb_spark.ext.retrieval import train_logreg
    from bq_duckdb_spark.operators.budget import take_until_budget

    def doc_ops(docs):
        return {
            "dedup_exact": lambda: dedup.exact_dup_stats(docs, "text", "doc_id"),
            "minhash_pairs": lambda: dedup.minhash_candidate_pairs(
                docs, "text", "doc_id"
            ),
            # the legacy 4-chunk scheme, kept probed as the comparison
            # curve: its 2^16-value buckets accrue random collisions, so
            # its growth goes superlinear where the 6-block default stays
            # ~linear (SCALING_r7: 2.21x vs 1.52x per 5x data at 125k docs)
            "simhash_pairs": lambda: dedup.simhash_near_dup_pairs(
                docs, "text", "doc_id", n_blocks=4
            ),
            "simhash_blocked": lambda: dedup.simhash_near_dup_pairs(
                docs, "text", "doc_id", n_blocks=6
            ),
            # round-7: exact prefix-filter similarity join — candidate
            # volume tracks sum(C(df,2)) over prefix shingles, which the
            # rewritten replicas keep ~linear (df stays flat as the
            # corpus grows; only genuinely-similar docs collide)
            "jaccard_exact": lambda: setjoin.exact_jaccard_join(
                docs, "text", "doc_id", threshold=0.3
            ),
            "tfidf": lambda: text.tf_idf(docs),
            "bigram_lm": lambda: text.ngram_lm_score(docs),
            # self-train: two corpus passes (train groupBy(term) + score
            # join/groupBy(doc)) — both linear, vocab join AQE-sized
            "lm_heldout": lambda: lm.with_lm_score(docs),
            "quality": lambda: text.with_quality_scores(docs),
            # tier-9: overlapping-window substring dedup (hash keys —
            # the at-scale path) and two-phase exact heavy hitters
            "substring_dedup": lambda: pipeline.substring_dedup(
                docs, "text", "doc_id", k=8, hash_windows=True
            ),
            "heavy_hitters": lambda: heavyhitters.heavy_hitters(
                docs.select(
                    F.explode(F.expr("split(trim(text), '\\\\s+')")).alias("t")
                ),
                "t",
                s=1000,
            ),
            "token_budget": lambda: take_until_budget(
                text.with_token_count(docs).select("doc_id", "n_tokens"),
                [F.col("n_tokens").desc(), F.col("doc_id")],
                "n_tokens",
                10**9,
                out_col="cum",
            ),
        }

    tiers = []
    docs_001 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs_01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs_05 = synth_docs(spark, "/root/testdata/sf0.1", 5).localCheckpoint(
        eager=True
    )
    # a 25x tier (125k docs) gives the doc operators a 3-point curve
    # spanning 250x total input growth
    docs_25 = synth_docs(spark, "/root/testdata/sf0.1", 25).localCheckpoint(
        eager=True
    )
    # a 125x deep tier (625k docs, ~70 MB of text) for the dedup family
    # only — the 4-point curve is what separates "looked linear for one
    # doubling" from "stays linear": built by re-replicating the 25x
    # corpus (written to parquet so synth_docs can re-rotate it)
    deep_dir = "/tmp/docs_synth25x"
    docs_25.write.mode("overwrite").parquet(
        os.path.join(deep_dir, "documents.parquet")
    )
    docs_125 = synth_docs(spark, deep_dir, 5, tag="d").localCheckpoint(eager=True)
    deep_subset = {
        "dedup_exact", "minhash_pairs", "simhash_pairs", "simhash_blocked",
        "quality", "token_budget",
    }
    emb_01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb_05 = synth_embeddings(spark, "/root/testdata/sf0.1", 5).localCheckpoint(
        eager=True
    )
    tiers = [
        ("sf0.01", docs_001, None),
        ("sf0.1", docs_01, emb_01),
        ("synth5x", docs_05, emb_05),
        ("synth25x", docs_25, None),
        ("synth125x", docs_125, None),
    ]

    lines = []
    results: dict[str, dict[str, float]] = {}
    for tier, docs, emb in tiers:
        n_docs = docs.count()
        ops = doc_ops(docs)
        for name, mk in ops.items():
            if tier == "synth125x" and name not in deep_subset:
                continue
            best = None
            for _ in range(2):
                t0 = time.time()
                mk().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[tier] = best
            lines.append(f"{tier:8s} {name:16s} rows={n_docs:7d} {best:6.2f}s")
            print(lines[-1], flush=True)
        if emb is not None:
            t0 = time.time()
            kmeans_assign(emb, k=4, iters=2).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            results.setdefault("kmeans", {})[tier] = dt
            lines.append(f"{tier:8s} {'kmeans':16s} rows={emb.count():7d} {dt:6.2f}s")
            print(lines[-1], flush=True)
        t0 = time.time()
        train_logreg(docs, "CAST(lang = 'en' AS INT)", n_buckets=64, iters=2)
        dt = time.time() - t0
        results.setdefault("logreg_train", {})[tier] = dt
        lines.append(f"{tier:8s} {'logreg_train':16s} rows={n_docs:7d} {dt:6.2f}s")
        print(lines[-1], flush=True)

    # --- relational (TPC-H) scaling: fact tables 5x, dims fixed ---
    from bq_duckdb_spark import contract_tpch

    tpch_subset = [
        "q06_forecast_revenue",    # scan + pushdown
        "q09_product_profit",      # 4-way fact join
        "q13_customer_distribution",  # outer join + double aggregate
        "q18_large_volume",        # semi over groupBy-HAVING + re-agg
        "q21_waiting_supplier",    # semi + anti double correlation
    ]
    synth_dir = synth_tpch(spark, "/root/testdata/sf0.1", 5, "/tmp/tpch_synth5x")
    tq = contract_tpch.queries()
    for tier, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("synth5x", synth_dir)):
        for name in tpch_subset:
            best = None
            for _ in range(2):
                t0 = time.time()
                tq[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[tier] = best
            lines.append(f"{tier:8s} {name:26s} {best:6.2f}s")
            print(lines[-1], flush=True)

    # --- tier-6: fuzzy join, bloom prefilter, CMS, triangles ---
    from bq_duckdb_spark.ext import cms as cms_mod
    from bq_duckdb_spark.ext import fuzzy, graph
    from bq_duckdb_spark.operators.bloom import bloom_prefilter
    from bq_duckdb_spark.ext.dedup_portable import portable_containment_pairs
    from bq_duckdb_spark.operators import incremental as inc
    from bq_duckdb_spark.operators import timeseries as ts

    cust_01 = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    n_cust = cust_01.agg(F.max("c_custkey")).collect()[0][0] + 1
    cust_05 = None
    for i in range(5):
        c = cust_01.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * n_cust))
        # rebuild the name from the shifted key: replicating names
        # verbatim would plant mass exact duplicates (the documented
        # pathological input for variant bucketing)
        c = c.withColumn(
            "c_name",
            F.expr("concat('Customer#', lpad(CAST(c_custkey AS STRING), 9, '0'))"),
        )
        cust_05 = c if cust_05 is None else cust_05.unionByName(c)
    cust_05 = cust_05.localCheckpoint(eager=True)

    def t6_ops(tier, sf_dir, cust, docs):
        from bq_duckdb_spark.ext.mleval import auc as auc_op
        from bq_duckdb_spark.ext.validate import check_not_null, check_unique, validation_report

        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        hot = orders.where(F.col("o_totalprice") > 450000)

        def _auc():
            # single projection — score and label derive from one row
            from bq_duckdb_spark.ext.retrieval import classifier_score_expr

            score = classifier_score_expr("text", 1024, "spark")
            scored = docs.select(
                F.expr(f"1.0 / (1.0 + exp(-10.0 * ({score})))").alias("prob"),
                (F.col("lang") == "en").cast("long").alias("y"),
            )
            return auc_op(scored, "prob", "y")

        return {
            "eval_auc": _auc,
            "validation": lambda: validation_report(
                [check_unique(docs, ["doc_id"]), check_not_null(docs, ["text", "lang"])]
            ),
            "fuzzy_join_d1": lambda: fuzzy.fuzzy_pairs_d1(
                cust, str_col="c_name", id_col="c_custkey"
            ),
            "bloom_prefilter": lambda: bloom_prefilter(
                li, hot, "l_orderkey", "o_orderkey"
            ),
            "cms_build": lambda: cms_mod.cms_build(docs, "text", depth=4, width=64),
            # tier-7: LSH-candidate containment (banding-shaped),
            # partial-aggregate state merge (two groupBys + union),
            # bounded-lookback EWMA over per-customer order histories
            # (orders replicate with custkeys UNCHANGED, so per-key
            # histories grow 5x — exactly the case max_lookback keeps
            # linear)
            "containment": lambda: portable_containment_pairs(
                docs, "text", "doc_id", threshold=0.5
            ),
            "incremental_agg": lambda: inc.merge_agg_states(
                [
                    inc.agg_state(
                        orders.where(F.col("o_orderkey") % 2 == 0),
                        ["o_custkey"], "o_totalprice",
                    ),
                    inc.agg_state(
                        orders.where(F.col("o_orderkey") % 2 == 1),
                        ["o_custkey"], "o_totalprice",
                    ),
                ],
                ["o_custkey"],
            ),
            "ewma_bounded": lambda: ts.ewma(
                orders, ["o_custkey"], ["o_orderdate", "o_orderkey"],
                "o_totalprice", 0.3, max_lookback=110,
            ),
            "triangles": lambda: graph.triangle_count(
                graph.cooccurrence_edges(
                    li.select(
                        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("i")
                    ),
                    "g",
                    "i",
                )
            ),
        }

    for tier, sf_dir, cust, docs in (
        ("sf0.1", "/root/testdata/sf0.1", cust_01, docs_01),
        ("synth5x", synth_dir, cust_05, docs_05),
    ):
        for name, mk in t6_ops(tier, sf_dir, cust, docs).items():
            best = None
            for _ in range(2):
                t0 = time.time()
                mk().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[tier] = best
            lines.append(f"{tier:8s} {name:26s} {best:6.2f}s")
            print(lines[-1], flush=True)

    lines.append("")
    lines.append("growth (synth5x time / sf0.1 time; data grew 5.0x):")
    for name, by_tier in sorted(results.items()):
        if "sf0.1" in by_tier and "synth5x" in by_tier and by_tier["sf0.1"] > 0:
            r = by_tier["synth5x"] / by_tier["sf0.1"]
            lines.append(f"  {name:26s} {r:5.2f}x")
    lines.append("")
    lines.append("growth (synth25x time / synth5x time; data grew 5.0x):")
    for name, by_tier in sorted(results.items()):
        if "synth5x" in by_tier and "synth25x" in by_tier and by_tier["synth5x"] > 0:
            r = by_tier["synth25x"] / by_tier["synth5x"]
            lines.append(f"  {name:26s} {r:5.2f}x")
    lines.append("")
    lines.append("growth (synth125x time / synth25x time; data grew 5.0x):")
    for name, by_tier in sorted(results.items()):
        if "synth25x" in by_tier and "synth125x" in by_tier and by_tier["synth25x"] > 0:
            r = by_tier["synth125x"] / by_tier["synth25x"]
            lines.append(f"  {name:26s} {r:5.2f}x")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
