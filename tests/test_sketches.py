"""HLL sketch partial/rollup (operators/sketches.py): rolled-up
estimates equal direct estimates (merge is lossless), errors stay
within the lg_k bound, and the partial table is bounded by group
count."""

from pyspark.sql import functions as F

from bq_duckdb_spark.operators.sketches import hll_partials, hll_rollup


def _events(spark):
    # (day, hour, user): 30 days x 24 hours, user ids overlapping across
    # days so rollups genuinely deduplicate across partials
    return spark.range(100000).selectExpr(
        "id % 30 AS day",
        "(id * 7) % 24 AS hour",
        "(id * 131) % 4000 AS user_id",
    )


def test_rollup_tracks_direct_estimate(spark):
    ev = _events(spark)
    partials = hll_partials(ev, ["day", "hour"], "user_id")
    # union-of-partials tracks sketching the raw rows directly at the
    # coarser grain; NOT bit-identical (the union gadget re-targets
    # registers), but within the configured error bound of it
    rolled = hll_rollup(partials, ["day"]).withColumnRenamed("n_distinct", "est")
    direct = (
        ev.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est"))
    )
    off = (
        rolled.join(direct, "day")
        .where(F.abs(rolled.est - direct.est) > direct.est * 0.05)
    )
    assert off.count() == 0


def test_global_rollup_error_bound(spark):
    ev = _events(spark)
    partials = hll_partials(ev, ["day"], "user_id")
    est = hll_rollup(partials, []).first()["n_distinct"]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    # lg_k=12 -> ~1.6% relative standard error; 5% is a >3-sigma bound
    assert abs(est - exact) / exact < 0.05


def test_merge_reassociation_stays_in_bound(spark):
    # (hour -> day -> global) vs (hour -> global): re-associated unions
    # may differ by a few registers but both stay within the error
    # bound of the exact answer — re-rolling stored partials is safe
    ev = _events(spark)
    by_hour = hll_partials(ev, ["day", "hour"], "user_id")
    by_day = (
        by_hour.groupBy("day")
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
    )
    two_step = hll_rollup(by_day, []).first()["n_distinct"]
    one_step = hll_rollup(by_hour, []).first()["n_distinct"]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    assert abs(two_step - exact) / exact < 0.05
    assert abs(one_step - exact) / exact < 0.05


def test_partial_table_bounded(spark):
    ev = _events(spark)
    partials = hll_partials(ev, ["day"], "user_id")
    assert partials.count() == 30
    assert dict(partials.dtypes)["hll_sketch"] == "binary"


def test_streaming_partials_match_batch(spark, tmp_path):
    """HLL partials built incrementally by a stream (update-mode
    stateful agg) union to the same estimates as batch partials over
    the same files — the sketch table is safe to build at ingestion."""
    import pandas as pd

    src = tmp_path / "sketch_stream"
    src.mkdir()
    rows = [(i % 10, (i * 131) % 500) for i in range(20000)]
    pdf = pd.DataFrame(rows, columns=["day", "user_id"])
    # two files -> two microbatches with one file per trigger
    pdf.iloc[:12000].to_parquet(str(src / "f1.parquet"))
    pdf.iloc[12000:].to_parquet(str(src / "f2.parquet"))

    batch = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = hll_partials(stream, ["day"], "user_id")
    q = (
        agg.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    got = hll_rollup(spark.table("hll_stream"), ["day"]).collect()
    want = hll_rollup(hll_partials(batch, ["day"], "user_id"), ["day"]).collect()
    assert {(r.day, r.n_distinct) for r in got} == {
        (r.day, r.n_distinct) for r in want
    }
