"""Triangulation for the XXH64 oracle machinery: Spark xxhash64 ==
Python mirror == generated DuckDB SQL, on random tokens and chained
longs — the foundation under the dedup_minhash / dedup_simhash /
dedup_ngram_jaccard full oracles."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bq_duckdb_spark.ext import xxoracle as xo


def _random_tokens(n, seed):
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789_.,"
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 31)))
        for _ in range(n)
    ]


def test_string_hash_spark_python_duckdb(spark):
    toks = _random_tokens(200, seed=7)
    df = spark.createDataFrame([(t,) for t in toks], ["s"])
    got_spark = {
        r.s: r.h for r in df.select("s", F.expr("xxhash64(s)").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE ts (s VARCHAR)")
    con.executemany("INSERT INTO ts VALUES (?)", [(t,) for t in set(toks)])
    ch = xo.StageChain("b", "SELECT s FROM ts", ["s"])
    xo.add_hash_string_stages(ch, "s", "h_u")
    got_duck = dict(
        con.sql(
            f"WITH {ch.render_ctes()} SELECT s, {xo.signed('h_u')} FROM {ch.cur}"
        ).fetchall()
    )
    for t in set(toks):
        want = xo.to_signed(xo.py_hash_bytes(t.encode()))
        assert got_spark[t] == want == got_duck[t], repr(t)


def test_long_chain_spark_python_duckdb(spark):
    rng = random.Random(11)
    rows = [
        (rng.randint(-(2**63), 2**63 - 1), rng.randint(-(2**63), 2**63 - 1))
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got_spark = {
        (r.a, r.b): r.h
        for r in df.select("a", "b", F.expr("xxhash64(a, b)").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tl (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO tl VALUES (?, ?)", rows)
    ch = xo.StageChain(
        "b", f"SELECT a, b, CAST({xo.SEED} AS HUGEINT) AS s0 FROM tl",
        ["a", "b", "s0"],
    )
    xo.add_hash_long_stages(ch, "a", "s0", "h1")
    xo.add_hash_long_stages(ch, "b", "h1", "h2")
    got_duck = {
        (a, b): h
        for a, b, h in con.sql(
            f"WITH {ch.render_ctes()} SELECT a, b, {xo.signed('h2')} FROM {ch.cur}"
        ).fetchall()
    }
    for key, h in got_spark.items():
        a, b = key
        want = xo.to_signed(
            xo.py_hash_long(xo.to_unsigned(b), xo.py_hash_long(xo.to_unsigned(a)))
        )
        assert h == want == got_duck[key]


def test_long_token_self_flags(spark):
    """>= 32-byte tokens take Spark's stripe path, which the oracle
    deliberately does not reproduce — the values must DIFFER (a silent
    false-pass would be worse than the documented gap)."""
    t = "x" * 40
    df = spark.createDataFrame([(t,)], ["s"])
    got_spark = df.select(F.expr("xxhash64(s)").alias("h")).collect()[0].h
    con = duckdb.connect()
    con.execute("CREATE TABLE ts (s VARCHAR)")
    con.execute("INSERT INTO ts VALUES (?)", [t])
    ch = xo.StageChain("b", "SELECT s FROM ts", ["s"])
    xo.add_hash_string_stages(ch, "s", "h_u")
    got_duck = con.sql(
        f"WITH {ch.render_ctes()} SELECT {xo.signed('h_u')} FROM {ch.cur}"
    ).fetchone()[0]
    assert got_spark != got_duck


def test_string_hash_duckdb_matches_python_fuzz():
    """Property fuzz (no Spark needed): the generated DuckDB SQL agrees
    with the Python mirror on arbitrary ASCII strings < 32 bytes,
    including every length class (words / 4-block / tail bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    con.execute("CREATE TABLE tf (s VARCHAR)")
    ch = xo.StageChain("b", "SELECT s FROM tf", ["s"])
    xo.add_hash_string_stages(ch, "s", "h_u")
    q = f"WITH {ch.render_ctes()} SELECT {xo.signed('h_u')} FROM {ch.cur}"

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=127),
            min_size=0,
            max_size=31,
        )
    )
    def check(s):
        con.execute("DELETE FROM tf")
        con.execute("INSERT INTO tf VALUES (?)", [s])
        got = con.sql(q).fetchone()[0]
        assert got == xo.to_signed(xo.py_hash_bytes(s.encode()))

    check()
