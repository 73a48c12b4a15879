"""BQ ⇄ Spark type bijection (SURVEY §1.3 table)."""

from pyspark.sql import types as T

from bq_duckdb_spark.types import bq_to_spark, columns_from_schema, spark_to_bq


def test_scalar_roundtrip():
    for bq, spark_t in [
        ("BOOL", T.BooleanType()),
        ("INT64", T.LongType()),
        ("FLOAT64", T.DoubleType()),
        ("STRING", T.StringType()),
        ("BYTES", T.BinaryType()),
        ("DATE", T.DateType()),
        ("DATETIME", T.TimestampNTZType()),
        ("TIMESTAMP", T.TimestampType()),
        ("NUMERIC", T.DecimalType(38, 9)),
        ("BIGNUMERIC", T.DecimalType(38, 18)),
    ]:
        assert bq_to_spark(bq) == spark_t
        assert spark_to_bq(spark_t) == bq


def test_aliases():
    assert bq_to_spark("BOOLEAN") == T.BooleanType()
    assert bq_to_spark("INTEGER") == T.LongType()
    assert bq_to_spark("FLOAT") == T.DoubleType()
    assert bq_to_spark("DECIMAL") == T.DecimalType(38, 9)


def test_array_nested():
    t = bq_to_spark("ARRAY<INT64>")
    assert t == T.ArrayType(T.LongType())
    assert spark_to_bq(t) == "ARRAY<INT64>"
    assert bq_to_spark("ARRAY<ARRAY<STRING>>") == T.ArrayType(T.ArrayType(T.StringType()))


def test_struct():
    t = bq_to_spark("STRUCT<x INT64, y STRING>")
    assert t == T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("y", T.StringType())]
    )
    assert spark_to_bq(t) == "STRUCT<x INT64, y STRING>"


def test_struct_nested_array():
    t = bq_to_spark("STRUCT<a ARRAY<INT64>, b STRUCT<c BOOL>>")
    assert t.fields[0].dataType == T.ArrayType(T.LongType())
    assert t.fields[1].dataType == T.StructType([T.StructField("c", T.BooleanType())])


def test_time_and_geography_degrade_to_string():
    assert bq_to_spark("TIME") == T.StringType()
    assert bq_to_spark("GEOGRAPHY") == T.StringType()
    assert bq_to_spark("JSON") == T.StringType()


def test_unknown_falls_back_to_string():
    assert bq_to_spark("WHATEVER") == T.StringType()


def test_range_as_struct():
    t = bq_to_spark("RANGE<DATE>")
    assert [f.name for f in t.fields] == ["start", "end"]
    assert t.fields[0].dataType == T.DateType()


def test_columns_from_schema():
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    assert columns_from_schema(schema) == [
        {"name": "id", "type": "INT64"},
        {"name": "name", "type": "STRING"},
    ]


def test_int_widths_report_int64():
    assert spark_to_bq(T.IntegerType()) == "INT64"
    assert spark_to_bq(T.ShortType()) == "INT64"
    assert spark_to_bq(T.FloatType()) == "FLOAT64"
