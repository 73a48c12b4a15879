"""Z-order layout: the Morton-clustered table must let parquet row-group
min/max stats skip most of the file on a filter over the SECOND
dimension, where a single-column sort order skips nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_duckdb_spark.operators.zorder import with_zvalue, write_zordered

SF = "/root/testdata/sf0.01"


def _scan_output_rows(df) -> int:
    """Rows the parquet scan produced AFTER row-group skipping (pushed
    filters prune whole row groups; surviving groups are read fully)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return leaves.head().metrics().apply("numOutputRows").value()


def test_zorder_skips_on_second_dimension(spark, tmp_path_factory):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = tmp_path_factory.mktemp("layouts")
    linear_path = str(base / "linear")
    z_path = str(base / "zorder")
    # baseline layout: clustered by totalprice ONLY — every file spans
    # the full custkey range, so custkey stats can exclude nothing
    (
        orders.repartitionByRange(64, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(linear_path)
    )
    write_zordered(orders, z_path, ["o_totalprice", "o_custkey"], num_files=64)

    lo, hi = 100, 140  # ~2.6% of the custkey domain
    pred = (F.col("o_custkey") >= lo) & (F.col("o_custkey") < hi)
    linear_rows = _scan_output_rows(spark.read.parquet(linear_path).filter(pred))
    z_rows = _scan_output_rows(spark.read.parquet(z_path).filter(pred))
    total = orders.count()
    # linear layout reads everything; z-order skips most row groups
    assert linear_rows == total
    assert z_rows < total / 2, f"z-order read {z_rows} of {total}"
    # and the data survives the round trip
    want = orders.filter(pred).count()
    assert spark.read.parquet(z_path).filter(pred).count() == want


def test_zvalue_locality(spark):
    """Points close in both dimensions get close Morton keys: the key's
    high bits come from the ranks' high bits."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    z = with_zvalue(orders, ["o_totalprice", "o_custkey"], bits=8)
    row = z.select(
        F.min("z").alias("zmin"), F.max("z").alias("zmax")
    ).first()
    assert 0 <= row.zmin < row.zmax <= (1 << 16) - 1
