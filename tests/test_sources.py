"""Source readers: format round-trips under a declared BigQuery schema."""

import pytest

COLUMNS = [
    {"name": "id", "type": "INT64"},
    {"name": "name", "type": "STRING"},
    {"name": "score", "type": "FLOAT64"},
    {"name": "active", "type": "BOOL"},
]
ROWS = [(1, "a", 1.5, True), (2, "b", 2.5, False), (3, None, None, None)]


from bq_duckdb_spark.sources import read_csv, read_json, read_parquet, write_parquet


@pytest.fixture()
def sample(spark):
    from bq_duckdb_spark.types import schema_from_columns

    return spark.createDataFrame(ROWS, schema_from_columns(COLUMNS))


def _check(df):
    got = sorted([tuple(r) for r in df.collect()])
    assert got == sorted(ROWS)
    assert [f.name for f in df.schema.fields] == ["id", "name", "score", "active"]
    assert df.schema["id"].dataType.simpleString() == "bigint"
    assert df.schema["score"].dataType.simpleString() == "double"


def test_parquet_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_parquet(sample, p)
    _check(read_parquet(spark, p, COLUMNS))


def test_csv_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.csv")
    sample.write.option("header", "true").csv(p)
    _check(read_csv(spark, p, COLUMNS))


def test_json_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.json")
    sample.write.json(p)
    _check(read_json(spark, p, COLUMNS))


def test_csv_without_schema_infers(spark, sample, tmp_path):
    p = str(tmp_path / "t2.csv")
    sample.write.option("header", "true").csv(p)
    df = read_csv(spark, p)
    assert df.count() == 3


def test_partitioned_write_prunes(spark, sample, tmp_path):
    p = str(tmp_path / "part")
    write_parquet(sample, p, partition_by=["active"])
    df = read_parquet(spark, p).filter("active = true")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 1
    # partition filter must prune at the source, not post-filter
    assert "PartitionFilters: [isnotnull(active" in plan


def test_coercion_casts_types(spark, tmp_path):
    """An INT64 parquet column declared FLOAT64 arrives as double."""
    df = spark.createDataFrame([(1,), (2,)], "v long")
    p = str(tmp_path / "c.parquet")
    df.write.parquet(p)
    out = read_parquet(spark, p, [{"name": "v", "type": "FLOAT64"}])
    assert out.schema["v"].dataType.simpleString() == "double"
    assert sorted(r.v for r in out.collect()) == [1.0, 2.0]


def test_orc_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.orc")
    sample.write.orc(p)
    from bq_duckdb_spark.sources import read_orc
    _check(read_orc(spark, p, COLUMNS))


def test_avro_gated(spark, tmp_path):
    from bq_duckdb_spark.sources import read_avro
    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope.avro"))


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import glob

    from bq_duckdb_spark.sources.readers import compact_parquet

    src = str(tmp_path / "small")
    # 40 tiny files
    spark.range(0, 4000).selectExpr(
        "id", "CAST(id % 7 AS INT) AS k"
    ).repartition(40).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 40

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    files = glob.glob(dst + "/part-*")
    assert n == 1 and len(files) == 1
    # content preserved exactly
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_parquet_sort_within_keeps_stats_selective(spark, tmp_path):
    from bq_duckdb_spark.sources.readers import compact_parquet

    src = str(tmp_path / "unsorted")
    spark.range(0, 5000).selectExpr("id", "id % 100 AS k").repartition(
        10
    ).write.parquet(src)
    dst = str(tmp_path / "sorted")
    compact_parquet(
        spark, src, dst, target_file_bytes=1 << 30, sort_within_by=["id"]
    )
    # sorted within the single output file: first rows ascend
    got = [r.id for r in spark.read.parquet(dst).limit(50).collect()]
    assert got == sorted(got)


# -- RPC loader surface: bq.loadCsv / bq.loadJson / bq.loadOrc -------------


def _rpc(server, method, params):
    import json as _json

    resp = server.handle_message(
        _json.dumps({"jsonrpc": "2.0", "id": 1, "method": method, "params": params})
    )
    return resp


def test_rpc_load_csv_json_orc(spark, sample, tmp_path):
    from bq_duckdb_spark.engine import SessionManager
    from bq_duckdb_spark.server import RpcServer

    server = RpcServer(SessionManager(spark))
    sid = _rpc(server, "bq.createSession", {})["result"]["sessionId"]
    try:
        paths = {}
        paths["bq.loadCsv"] = str(tmp_path / "t_csv")
        sample.write.option("header", "true").csv(paths["bq.loadCsv"])
        paths["bq.loadJson"] = str(tmp_path / "t_json")
        sample.write.json(paths["bq.loadJson"])
        paths["bq.loadOrc"] = str(tmp_path / "t_orc")
        sample.write.orc(paths["bq.loadOrc"])
        for i, (method, path) in enumerate(paths.items()):
            name = f"rpc_t{i}"
            out = _rpc(
                server,
                method,
                {"sessionId": sid, "tableName": name, "path": path, "schema": COLUMNS},
            )
            assert out["result"] == {"success": True, "rowCount": 3}, out
            q = _rpc(
                server,
                "bq.query",
                {"sessionId": sid, "sql": f"SELECT count(*) AS c FROM {name} WHERE id >= 1"},
            )
            assert str(q["result"]["rows"][0]["f"][0]["v"]) == "3"
    finally:
        _rpc(server, "bq.destroySession", {"sessionId": sid})


def test_rpc_load_csv_cloud_path_loader_error(spark):
    from bq_duckdb_spark.engine import SessionManager
    from bq_duckdb_spark.server import LOADER_ERROR, RpcServer

    server = RpcServer(SessionManager(spark))
    sid = _rpc(server, "bq.createSession", {})["result"]["sessionId"]
    try:
        out = _rpc(
            server,
            "bq.loadCsv",
            {"sessionId": sid, "tableName": "x", "path": "gs://bkt/t.csv"},
        )
        assert out["error"]["code"] == LOADER_ERROR
        assert "connector" in out["error"]["message"]
    finally:
        _rpc(server, "bq.destroySession", {"sessionId": sid})
