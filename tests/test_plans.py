"""Plan-shape regression tests over the sf0.001 data: pushdown reaches
the parquet scans, schemas are pruned, small dims broadcast, theta joins
use nested-loop, scans-only pipelines have zero exchanges. These pin the
properties that make the same code viable at 100 TB."""

import pytest

import __spark_entry__ as entry
from bq_duckdb_spark.plans import audit_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    qs = entry.queries()
    return lambda name: qs[name](spark, SF)


def test_q01_filter_pushdown_and_pruning(q):
    a = audit_plan(q("q01_pricing_summary"))
    a.assert_pushed_filter("lineitem", "l_shipdate")
    # 2 group keys + 4 measure columns + shipdate = 7 of 11 columns
    a.assert_pruned_schema("lineitem", 7)
    assert a.aqe


def test_q03_all_filters_reach_scans(q):
    a = audit_plan(q("q03_shipping_priority"))
    a.assert_pushed_filter("customer", "c_mktsegment")
    a.assert_pushed_filter("orders", "o_orderdate")
    a.assert_pushed_filter("lineitem", "l_shipdate")
    a.assert_pruned_schema("customer", 2)
    assert a.broadcast_joins >= 1


def test_q05_broadcasts_dimensions(q):
    a = audit_plan(q("q05_local_supplier"))
    a.assert_pushed_filter("region", "r_name")
    assert a.broadcast_joins >= 2, "region/nation dims must broadcast"
    # the customer and supplier edges are deliberately unhinted (they
    # scale with SF): each may PLAN as a SortMergeJoin, which AQE
    # converts to a runtime broadcast at this scale (pinned in the
    # companion test below); a third SMJ would mean a fixed-size dim
    # edge lost its broadcast.
    assert a.sortmerge_joins <= 2, "only the unhinted customer/supplier edges may plan as SMJ"


def test_q05_aqe_converts_supplier_edge(q):
    # companion to the static-plan check: after execution, AQE must have
    # replaced the planned supplier SortMergeJoin with a broadcast — if
    # this ever stops converting at sf0.001, the unhinted-edge tradeoff
    # documented in q05 no longer holds and the hint decision needs
    # revisiting.
    df = q("q05_local_supplier")
    df.collect()
    # AdaptiveSparkPlan.toString prints Final Plan then Initial Plan;
    # only the final section reflects what actually ran
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final
    # the fact-fact edge must stay the pinned ShuffledHashJoin even
    # after AQE rewrites everything else to broadcasts
    assert "ShuffledHashJoin" in final, final


def test_fact_fact_edge_never_broadcasts_lineitem(q):
    # q03/q05 pin orders⋈lineitem to a shuffled hash join: small-SF size
    # estimates would otherwise broadcast lineitem itself (single-task
    # hash build locally, OOM shape at scale). Guard against a silent
    # revert of the hint.
    for name in ("q03_shipping_priority", "q05_local_supplier"):
        a = audit_plan(q(name))
        assert "ShuffledHashJoin" in a.formatted, name
        # no BroadcastExchange whose OWN input schema carries lineitem's
        # revenue columns — only dims may broadcast (the first Input
        # line after the node header is that exchange's input)
        for seg in a.formatted.split("BroadcastExchange")[1:]:
            inp = next(
                (ln for ln in seg.splitlines() if ln.startswith("Input")), ""
            )
            assert "l_extendedprice" not in inp, (name, inp)


def test_runtime_bloom_filter_engages_on_shuffled_fact_join(q, spark):
    # At 100 TB the filtered orders side of a fact-fact join is far too
    # big to broadcast, so the join shuffles — and Spark's runtime bloom
    # filter (on by default, gated behind a 10 GB application-side scan
    # threshold) then injects a might_contain prefilter into the lineitem
    # side, cutting the dominant shuffle ~selectivity-fold. Recreate the
    # at-scale conditions (no broadcast, thresholds relaxed) and pin that
    # the injection actually fires on our join shape AND that results are
    # unchanged — if a future hint or rewrite broke eligibility, this is
    # the only place that would notice.
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        "o_orderdate >= DATE'1994-01-01' AND o_orderdate < DATE'1994-04-01'"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    baseline = sorted(map(tuple, joined.collect()))
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        assert sorted(map(tuple, df.collect())) == baseline
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_map_only_query_has_no_exchange(q):
    a = audit_plan(q("q_filter_case"))
    assert a.exchanges == 0, f"map-only pipeline must not shuffle\n{a.formatted}"
    a.assert_pushed_filter("lineitem", "l_discount")
    assert a.codegen_spans >= 1


def test_theta_join_uses_nested_loop(q):
    a = audit_plan(q("q_theta_join"))
    assert a.nested_loop_joins >= 1


def test_window_single_shuffle(q):
    a = audit_plan(q("q_window_rank"))
    # one partitionBy shuffle (doubled in AQE's initial+final printout)
    assert a.exchanges <= 2, f"window should shuffle once\n{a.formatted}"


def test_semi_join_shape(q):
    a = audit_plan(q("q_exists_semi"))
    assert a.broadcast_joins + a.sortmerge_joins >= 1
    a.assert_pushed_filter("orders", "o_totalprice")


def test_dedup_exact_single_shuffle(q):
    a = audit_plan(q("dedup_exact"))
    # hash-groupBy: partial agg → exchange → final agg
    assert a.exchanges <= 2


def test_unpartitioned_window_list_is_closed():
    """Every Window.orderBy (unpartitioned spec) in the source must be
    on tools/audit_plans.py's closed, justified list — a new global
    window cannot land silently (see the audit for per-file reasons)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from audit_plans import audit_unpartitioned_windows

    assert audit_unpartitioned_windows("/root/repo") == []


def test_minhash_bucket_cap_prunes_map_side(q, spark):
    """The max_bucket cap must run as a rank-limit window that (a)
    shares the bucket aggregation's (band, bucket) exchange — no extra
    shuffle — and (b) compiles to WindowGroupLimit on BOTH sides of
    that exchange, so a degenerate bucket (e.g. a giant exact-duplicate
    block) is pruned to max_bucket rows per map partition BEFORE it
    ships. Without the map-side limit, a 10^9-copy block floods the
    shuffle and the collect_list buffer no matter what the cap does
    afterwards."""
    from bq_duckdb_spark.ext.dedup import minhash_candidate_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    a = audit_plan(
        minhash_candidate_pairs(docs, "text", "doc_id", dedup=False)
    )
    # widen repartition + ONE (band,bucket) exchange feeding both the
    # window and the bucket aggregation (the audit counts each node
    # twice: tree line + detail header, like the other pins here)
    assert a.exchanges <= 4, f"window must share the agg shuffle\n{a.formatted}"
    assert a.formatted.count("WindowGroupLimit") >= 2, (
        f"rank-limit must prune on the map side\n{a.formatted}"
    )


def test_cosine_topk_no_shuffle_scan(q):
    """Brute-force top-k must be scan + TakeOrdered — no exchange."""
    a = audit_plan(q("sim_cosine_topk"))
    assert "TakeOrderedAndProject" in a.formatted
    assert a.exchanges == 0, f"top-k should not shuffle\n{a.formatted}"


def test_asof_join_single_shuffle(q):
    """The union+carry-forward as-of join must shuffle once on the key
    (plus AQE's printed duplicate), never build row pairs."""
    a = audit_plan(q("q_asof_join"))
    assert a.sortmerge_joins == 0 and a.nested_loop_joins == 0
    # union → one hash partitioning on user_id → window; AQE prints
    # initial+final plans so allow the doubled count
    assert a.exchanges <= 2, f"as-of should be one shuffle\n{a.formatted}"


def test_ntile_scalable_no_single_partition_bigdata_window(q):
    """The scalable NTILE's heavy window runs partitioned by __pid; only
    the offsets window (one row per partition) may be SinglePartition."""
    df = q("q_ntile_scalable")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__pid" in plan, plan
    # global-window formulation would put orders through one task:
    # its signature is a Window with ntile over SinglePartition
    assert "ntile" not in plan.lower()


def test_ntile_scalable_matches_global_window(q, spark):
    """Exact equality with the single-task global NTILE on sf0.001."""
    got = {r.o_orderkey: r.quartile for r in q("q_ntile_scalable").collect()}
    want = {r.o_orderkey: r.quartile for r in q("q_ntile").collect()}
    assert got == want


def test_percentiles_scalable_matches_window_form(q):
    """Round 8: the range-partitioned exact percentile equals the
    per-group window form value-for-value on sf0.001."""
    got = {r.l_returnflag: (r.p50, r.p95) for r in q("q_percentiles_scalable").collect()}
    want = {r.l_returnflag: (r.p50, r.p95) for r in q("q_percentiles").collect()}
    assert got == want


def test_percentiles_scalable_no_per_group_window(q):
    """The heavy window must partition by (__pid, group) — parallelism
    #partitions x #groups — never by the 3-value group alone."""
    df = q("q_percentiles_scalable")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the row-level rank window exchanges on (__pid, __g); the only
    # __g-alone partitioning is the offsets window over tiny count rows
    assert "hashpartitioning(__pid" in plan, plan


def test_percentiles_scalable_null_group(spark):
    """Round 9 (ADVICE): a NULL group key is a group like any other in
    SQL GROUP BY — the offsets/totals joins must be null-safe or every
    row of the NULL group silently vanishes."""
    from bq_duckdb_spark.operators.percentile import percentile_cont_scalable

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)]
        + [(None, float(v)) for v in range(1, 5)],
        "g string, v double",
    )
    got = {
        r.g: (r.p_0, r.p_1)
        for r in percentile_cont_scalable(df, "g", "v", [0.5, 0.95]).collect()
    }
    assert set(got) == {"a", None}
    # percentile_cont over 1..10: p50 = 5.5, p95 = 9.55
    assert got["a"] == (pytest.approx(5.5), pytest.approx(9.55))
    # over 1..4: p50 = 2.5, p95 = 3.85
    assert got[None] == (pytest.approx(2.5), pytest.approx(3.85))


def test_percentiles_approx_brackets_exact(q):
    """Sketch estimates must sit within 2% of the exact percentiles."""
    exact = {r.l_returnflag: (r.p50, r.p95) for r in q("q_percentiles").collect()}
    approx = {
        r.l_returnflag: (r.p50_approx, r.p95_approx)
        for r in q("q_percentiles_approx").collect()
    }
    assert set(exact) == set(approx)
    for k, (p50, p95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - p50) / p50 < 0.02
        assert abs(a95 - p95) / p95 < 0.02


def test_text_chunks_map_only(q):
    """Chunking is row-local fan-out: no exchange anywhere."""
    a = audit_plan(q("text_chunks"))
    assert a.exchanges == 0, f"chunking must not shuffle\n{a.formatted}"


def test_pii_redact_map_only(q):
    a = audit_plan(q("pii_redact"))
    assert a.exchanges == 0, f"redaction must not shuffle\n{a.formatted}"


def test_ivf_topk_no_shuffle(q):
    """IVF probe is scan + filter + TakeOrdered: no exchange."""
    a = audit_plan(q("sim_ivf_topk"))
    assert "TakeOrderedAndProject" in a.formatted
    assert a.exchanges == 0, f"IVF probe should not shuffle\n{a.formatted}"


def test_pipe_repetition_map_only(q):
    # Gopher repetition stats are per-row expressions: zero exchanges
    a = audit_plan(q("pipe_repetition"))
    assert a.exchanges == 0, a.formatted


def test_pipe_decontaminate_corpus_never_shuffles(q):
    # held-out n-grams broadcast; the corpus reaches the semi join with
    # no exchange below it (plans print top-down: the join's subtree
    # follows its line). Downstream exchanges move matched ids only.
    df = q("pipe_decontaminate")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the n-gram probe is a LeftSemi broadcast join whose STREAMED side
    # is the corpus n-gram stream: it must reach the join with no
    # exchange. (The held-out side's distinct and the matched-id
    # distinct both shuffle, but those move benchmark-sized /
    # contaminated-row-sized data only.) The streamed child's lines sit
    # between the join line and its Broadcast* child.
    assert "LeftSemi, BuildRight" in plan, plan
    after_join = plan.split("LeftSemi", 1)[1].splitlines()
    streamed = []
    for ln in after_join[1:]:
        if "BroadcastQueryStage" in ln or "BroadcastExchange" in ln:
            break
        streamed.append(ln)
    assert streamed and not any("Exchange" in ln for ln in streamed), plan


def test_pipe_pack_sequences_single_group_shuffle_no_funnel(q):
    a = audit_plan(q("pipe_pack_sequences"))
    assert "SinglePartition" not in a.formatted, a.formatted
    # one exchange: hash-partition by the group column for the window
    import re

    assert len(re.findall(r"\(\d+\) Exchange", a.formatted)) == 1, a.formatted
    assert "hashpartitioning(lang" in a.formatted, a.formatted


def test_pipe_vocab_topk_partial_aggregation(q):
    # the (group, term) count must partial-aggregate map-side before its
    # shuffle (HashAggregate appears above AND below the exchange)
    import re

    a = audit_plan(q("pipe_vocab_topk"))
    assert "SinglePartition" not in a.formatted, a.formatted
    # formatted-plan block ids are execution order: a HashAggregate block
    # must run BEFORE the first Exchange (map-side partial aggregation)
    blocks = dict(
        (int(m.group(1)), m.group(2))
        for m in re.finditer(r"\((\d+)\) (\w+)", a.formatted)
    )
    agg_ids = [i for i, op in blocks.items() if op == "HashAggregate"]
    ex_ids = [i for i, op in blocks.items() if op == "Exchange"]
    assert agg_ids and ex_ids, a.formatted
    assert min(agg_ids) < min(ex_ids), a.formatted


def test_pipe_quantile_curate_no_global_funnel(q):
    a = audit_plan(q("pipe_quantile_curate"))
    assert "SinglePartition" not in a.formatted, a.formatted


def test_pipe_span_dedup_two_shuffles_no_funnel(q):
    # winner pick shuffles on the span key, reassembly on the doc id —
    # exactly two data exchanges (AQE may add stage-boundary reads),
    # and no SinglePartition funnel anywhere
    a = audit_plan(q("pipe_span_dedup"))
    assert "SinglePartition" not in a.formatted, a.formatted
    # each Exchange node matches twice in `formatted` (tree + detail block)
    assert a.exchanges <= 4, f"span dedup should be two shuffles\n{a.formatted}"


def test_pipe_mixture_map_only(q):
    # epoch materialization is generate-over-scan: zero exchanges, and
    # the copies CASE must not be re-inlined into a pre-Generate filter
    # (the explode_outer pattern — see ext/pipeline.py:mixture_sample)
    a = audit_plan(q("pipe_mixture"))
    assert a.exchanges == 0, a.formatted
    # outer explode renders as `explode(..., <input>, true, [epoch...])`
    assert ", true, [epoch" in a.formatted, a.formatted
    # the copies CASE is evaluated once, in a projection below the
    # Generate — the generator and the post-filter reference only the
    # projected attribute, never the hash arithmetic itself
    import re
    gen_block = re.search(r"\(\d+\) Generate.*?(?=\n\(\d+\))", a.formatted, re.DOTALL)
    assert gen_block and "2654435761" not in gen_block.group(0), a.formatted


def test_sim_pq_topk_map_only_kheap(q):
    # PQ-ADC search: codebooks are plan literals, encode+score is one
    # codegen'd scan, top-k is per-partition heaps — zero exchanges
    a = audit_plan(q("sim_pq_topk"))
    assert "TakeOrderedAndProject" in a.formatted
    assert a.exchanges == 0, f"PQ search should not shuffle\n{a.formatted}"
