"""BigQuery storage DDL (PARTITION BY / CLUSTER BY) and EXPORT DATA."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _src(spark):
    return spark.range(200).select(
        F.col("id"),
        F.expr("date_add(date'2024-01-01', cast(id % 5 as int))").alias("d"),
        (F.col("id") % 13).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def _warehouse_path(session, name):
    return os.path.join(session._warehouse, name.lower().replace(".", "_"))


def test_ctas_partitioned_by_column_prunes(session):
    session.register_dataframe("src", _src(session.spark))
    session.query("CREATE TABLE part_t PARTITION BY d CLUSTER BY k AS SELECT * FROM src")
    # hive-style partition directories on disk
    path = _warehouse_path(session, "part_t")
    assert sorted(os.path.basename(p) for p in glob.glob(f"{path}/d=*"))
    # filters on the partition column reach the scan as PartitionFilters
    df = session.query("SELECT k, v FROM part_t WHERE d = DATE '2024-01-03'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2024-01-03" in plan, plan
    assert df.count() == 40
    # schema order and types survive the partitionBy round trip
    full = session.query("SELECT * FROM part_t")
    assert full.columns == ["id", "d", "k", "v"]
    assert dict(full.dtypes)["d"] == "date"
    assert full.count() == 200


def test_ctas_expression_partition_hidden_key(session):
    session.register_dataframe("src", _src(session.spark))
    session.query(
        "CREATE TABLE exp_t PARTITION BY DATE_ADD(d, 1) AS SELECT * FROM src"
    )
    path = _warehouse_path(session, "exp_t")
    assert glob.glob(f"{path}/__bq_part=*"), os.listdir(path)
    out = session.query("SELECT * FROM exp_t")
    # the derived key never surfaces in the visible schema
    assert out.columns == ["id", "d", "k", "v"]
    assert out.count() == 200


def test_cluster_by_single_column_sorts_file_ranges(session):
    session.register_dataframe("src", _src(session.spark))
    # AQE rightly coalesces a 200-row range exchange into ONE size-
    # targeted file (the at-scale behavior we want); disable it here so
    # the range partitioner's layout is observable across several files
    session.spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        session.query("CREATE TABLE clus_t CLUSTER BY k AS SELECT * FROM src")
    finally:
        session.spark.conf.set("spark.sql.adaptive.enabled", "true")
    path = _warehouse_path(session, "clus_t")
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        ranges.append((min(t), max(t)))
    assert len(ranges) > 1  # range partitioner actually split the data
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # contiguous, non-overlapping key ranges


def test_create_then_insert_then_rewrite_keeps_layout(session):
    session.query(
        "CREATE TABLE decl_t (d DATE, k INT64, v STRING) PARTITION BY d CLUSTER BY k"
    )
    entry = session.tables["decl_t"]
    assert entry.partition_by == "d" and entry.cluster_by == ["k"]
    session.query(
        "INSERT INTO decl_t VALUES (DATE '2024-01-01', 1, 'a'), (DATE '2024-01-02', 2, 'b')"
    )
    assert session.query("SELECT count(*) AS c FROM decl_t").collect()[0]["c"] == 2
    # a DML rewrite goes through materialize() and inherits the spec
    session.query("UPDATE decl_t SET v = 'z' WHERE k = 2")
    path = _warehouse_path(session, "decl_t")
    assert glob.glob(f"{path}/d=*"), os.listdir(path)
    got = {
        (str(r["d"]), r["k"], r["v"])
        for r in session.query("SELECT * FROM decl_t").collect()
    }
    assert got == {("2024-01-01", 1, "a"), ("2024-01-02", 2, "z")}


def test_export_data_parquet_roundtrip(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_parquet"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/part-*.parquet', format='PARQUET') "
        "AS SELECT id, k, v FROM src WHERE k < 3"
    )
    back = session.spark.read.parquet(str(out))
    want = _src(session.spark).filter("k < 3").select("id", "k", "v")
    assert back.count() == want.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in want.collect()}


def test_export_data_csv_header_delimiter(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_csv"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', header=true, "
        "field_delimiter='|') AS SELECT id, v FROM src WHERE id < 3"
    )
    files = glob.glob(f"{out}/*.csv")
    assert files
    lines = sorted(
        line for f in files for line in open(f).read().splitlines() if line
    )
    assert "id|v" in lines
    assert "0|v0" in lines and "2|v2" in lines


def test_export_data_json(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_json"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.json', format='JSON') "
        "AS SELECT id FROM src WHERE id = 7"
    )
    back = session.spark.read.json(str(out))
    assert [r["id"] for r in back.collect()] == [7]


def test_export_data_errors(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    q = "AS SELECT id FROM src"
    with pytest.raises(FileNotFoundError, match="connector"):
        session.query(
            f"EXPORT DATA OPTIONS(uri='gs://bkt/x/*.csv', format='CSV') {q}"
        )
    with pytest.raises(ValueError, match="wildcard"):
        session.query(
            f"EXPORT DATA OPTIONS(uri='{tmp_path}/plain.csv', format='CSV') {q}"
        )
    with pytest.raises(ValueError, match="format"):
        session.query(f"EXPORT DATA OPTIONS(uri='{tmp_path}/a/*.csv') {q}")
    with pytest.raises(ValueError, match="AVRO"):
        session.query(
            f"EXPORT DATA OPTIONS(uri='{tmp_path}/a/*.avro', format='AVRO') {q}"
        )
    out = tmp_path / "dup"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.json', format='JSON') {q}"
    )
    with pytest.raises(ValueError, match="overwrite"):
        session.query(
            f"EXPORT DATA OPTIONS(uri='{out}/*.json', format='JSON') {q}"
        )
    # overwrite=true succeeds over the existing target
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.json', format='JSON', overwrite=true) {q}"
    )


def test_describe_table_reports_storage_spec(session):
    session.query(
        "CREATE TABLE spec_t (d DATE, k INT64) PARTITION BY d CLUSTER BY k"
    )
    desc = session.describe_table("spec_t")
    assert desc["partitionBy"] == "d" and desc["clusterBy"] == ["k"]
    # tables without a spec keep the reference's flat shape
    session.query("CREATE TABLE plain_t (x INT64)")
    desc2 = session.describe_table("plain_t")
    assert "partitionBy" not in desc2 and "clusterBy" not in desc2


def test_export_data_quoted_paren_delimiter(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_paren"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', "
        "field_delimiter=')') AS SELECT id, v FROM src WHERE id = 1"
    )
    lines = [
        line
        for f in glob.glob(f"{out}/*.csv")
        for line in open(f).read().splitlines()
        if line
    ]
    assert lines == ["1)v1"]


def test_ctas_if_not_exists_is_noop(session):
    session.register_dataframe("src", _src(session.spark))
    session.query("CREATE TABLE ine_t AS SELECT id FROM src WHERE id < 5")
    session.query(
        "CREATE TABLE IF NOT EXISTS ine_t AS SELECT id FROM src WHERE id < 100"
    )
    # the second statement is a no-op: the original 5-row snapshot stays
    assert session.query("SELECT count(*) AS c FROM ine_t").collect()[0]["c"] == 5


def test_ctas_declared_column_count_mismatch_raises(session):
    session.register_dataframe("src", _src(session.spark))
    with pytest.raises(ValueError, match="column-count mismatch"):
        session.query(
            "CREATE TABLE bad_t (a INT64, b STRING) AS SELECT id FROM src"
        )


def test_export_overwrite_refuses_stray_files(session, tmp_path):
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "not_an_export_dir"
    out.mkdir()
    (out / "precious.txt").write_text("user data")
    with pytest.raises(ValueError, match="precious.txt"):
        session.query(
            f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', "
            "overwrite=true) AS SELECT id FROM src"
        )
    assert (out / "precious.txt").read_text() == "user data"


def test_default_project_rewrite_keeps_spec(session):
    session.register_dataframe("src", _src(session.spark))
    session.query(
        "CREATE TABLE proj.ds.q_t PARTITION BY d AS SELECT * FROM src"
    )
    session.default_project = "proj"
    # 2-level name resolves through the default project; the rewrite
    # must find the SAME entry and keep its storage spec
    session.query("UPDATE ds.q_t SET v = 'x' WHERE k = 1")
    assert [k for k in session.tables if "q_t" in k] == ["proj.ds.q_t"]
    entry = session.tables["proj.ds.q_t"]
    assert entry.partition_by == "d"
    path = _warehouse_path(session, "proj.ds.q_t")
    assert glob.glob(f"{path}/d=*"), os.listdir(path)


def test_partition_by_nested_expression(session):
    """Round-7 ADVICE fix: PARTITION BY DATE(TIMESTAMP_MILLIS(x)) must
    parse the WHOLE nested call (balanced parens), not stop at the first
    ')' and reject the statement."""
    session.register_dataframe(
        "ms_src",
        session.spark.range(10).select(
            F.col("id"), (F.col("id") * 86400000 + 1704067200000).alias("ms")
        ),
    )
    session.query(
        "CREATE TABLE nested_part_t PARTITION BY DATE(TIMESTAMP_MILLIS(ms)) "
        "AS SELECT * FROM ms_src"
    )
    desc = session.describe_table("nested_part_t")
    assert desc["partitionBy"] == "DATE(TIMESTAMP_MILLIS(ms))"
    assert (
        session.query("SELECT count(*) AS c FROM nested_part_t").collect()[0]["c"]
        == 10
    )
    # the derived hidden key produced real hive directories per day
    part_dirs = glob.glob(_warehouse_path(session, "nested_part_t") + "/__bq_part=*")
    assert len(part_dirs) == 10


def test_export_data_doubled_quote_delimiter(session, tmp_path):
    """Round-7 ADVICE fix: field_delimiter='''' is ONE apostrophe (BQ/SQL
    doubled-quote escape), not the two-character string "''"."""
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_quote"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', "
        "field_delimiter='''') AS SELECT id, v FROM src WHERE id = 1"
    )
    lines = [
        line
        for f in glob.glob(f"{out}/*.csv")
        for line in open(f).read().splitlines()
        if line
    ]
    assert lines == ["1'v1"]


def test_export_data_mixed_escape_delimiter(session, tmp_path):
    """Round-8 ADVICE fix: option literals now decode in ONE left-to-right
    pass handling backslash escapes and doubled quotes together, so a mixed
    literal ``'\\''''`` (escaped quote + doubled quote) is two apostrophes.

    A brute-force sweep over all <=9-char literal bodies showed the old
    two-pass decode (collapse '' first, then backslash) diverges only on
    odd-trailing-quote bodies the statement lexer cannot terminate anyway —
    this pins the unambiguous mixed case end-to-end."""
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_mixed"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', "
        "field_delimiter='\\'''') AS SELECT id, v FROM src WHERE id = 1"
    )
    lines = [
        line
        for f in glob.glob(f"{out}/*.csv")
        for line in open(f).read().splitlines()
        if line
    ]
    assert lines == ["1''v1"]


def test_ctas_over_existing_table_raises(session):
    """Round-7 ADVICE fix: plain CTAS over an existing name errors (BigQuery
    does too), matching plain CREATE TABLE instead of silently replacing."""
    session.register_dataframe("src", _src(session.spark))
    session.query("CREATE TABLE dup_ctas AS SELECT id FROM src WHERE id < 3")
    with pytest.raises(ValueError, match="already exists"):
        session.query("CREATE TABLE dup_ctas AS SELECT id FROM src")
    # the original snapshot is untouched
    assert (
        session.query("SELECT count(*) AS c FROM dup_ctas").collect()[0]["c"] == 3
    )


def test_ctas_declared_columns_via_default_project_alias(session):
    """Round-7 ADVICE fix: declared-columns CTAS addressed via a 2-level
    default-project alias must attach .columns to the CANONICAL entry the
    data was materialized under, not KeyError on the alias spelling."""
    session.default_project = "projx"
    session.query("CREATE TABLE projx.ds.t0 (v INT64)")
    session.query("CREATE TABLE seed (v INT64)")
    session.query("INSERT INTO seed VALUES (1), (2)")
    # replace via the 2-level alias with a declared column list
    session.query(
        "CREATE OR REPLACE TABLE ds.t0 (doubled INT64) "
        "AS SELECT v * 2 FROM seed"
    )
    desc = session.describe_table("projx.ds.t0")
    assert desc["columns"] == [{"name": "doubled", "type": "INT64"}]
    got = sorted(
        r["doubled"]
        for r in session.query("SELECT doubled FROM ds.t0").collect()
    )
    assert got == [2, 4]


def test_export_data_backslash_tab_delimiter(session, tmp_path):
    """Round-7 review fix: field_delimiter='\\t' (a BigQuery string
    literal) resolves to a real TAB — the option splitter honors the
    escape, so the unquoter must too."""
    session.register_dataframe("src", _src(session.spark))
    out = tmp_path / "exp_tab"
    session.query(
        f"EXPORT DATA OPTIONS(uri='{out}/*.csv', format='CSV', "
        "field_delimiter='\\t') AS SELECT id, v FROM src WHERE id = 1"
    )
    lines = [
        line
        for f in glob.glob(f"{out}/*.csv")
        for line in open(f).read().splitlines()
        if line
    ]
    assert lines == ["1\tv1"]
