"""Independent anchor for percentile_interp_sql (ADVICE r9, medium).

Since round 9 both q_percentiles AND its DuckDB oracle run the SAME
generated bracketing-rank SQL (percentile_interp_sql), so the
cross-engine gate can no longer catch a semantic bug in the generator
itself — both engines would agree on the same wrong answer. This test
restores the independent anchor: the generated duckdb-dialect SQL must
reproduce DuckDB's NATIVE ``percentile_cont(q) WITHIN GROUP`` on
randomized double data within a tiny relative tolerance (the two
formulas may legitimately differ by ~1 ulp of interpolation plus the
generator's deterministic ABSOLUTE half-up quantization to the 1e-4
grid (``floor(x * 1e4 + 0.5) / 1e4`` — see percentile_interp_sql's
docstring), so the tolerance is abs 6e-5 (half a grid step + slack)
OR rel 1e-9 (ulp noise on large magnitudes), not a semantic margin).

Covers: multiple group cardinalities, NULL values, a NULL group key,
tiny groups (n=1, n=2), duplicate-heavy values, negative values, and
quantile endpoints 0.0/1.0 alongside interior quantiles.
"""

import math
import random

import duckdb
import pytest

from bq_duckdb_spark.operators.percentile import percentile_interp_sql

QUANTILES = {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p95": 0.95, "p100": 1.0}
# generator quantizes to the 1e-4 ABSOLUTE grid half-up (max abs error
# 5e-5); large magnitudes also accumulate interpolation ulps
ABS_TOL = 6e-5
REL_TOL = 1e-9


def _make_rows(rng: random.Random, n_rows: int, n_groups: int):
    rows = []
    for i in range(n_rows):
        g = rng.randrange(n_groups)
        grp = None if g == 0 and rng.random() < 0.5 else f"g{g}"
        if rng.random() < 0.05:
            v = None
        else:
            kind = rng.random()
            if kind < 0.3:
                v = float(rng.randint(-5, 5))  # duplicate-heavy
            elif kind < 0.6:
                v = rng.uniform(-1e6, 1e6)
            else:
                v = rng.gauss(0, 1) * 10 ** rng.randint(-3, 6)
        rows.append((grp, v))
    # force tiny groups: one singleton, one pair
    rows.append(("solo", 42.5))
    rows.append(("pair", -1.25))
    rows.append(("pair", 7.75))
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_generated_sql_matches_native_percentile_cont(seed):
    rng = random.Random(seed)
    rows = _make_rows(rng, n_rows=400, n_groups=4 + seed)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)

    gen_sql = percentile_interp_sql("t", "grp", "v", QUANTILES,
                                    dialect="duckdb")
    gen = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT * FROM ({gen_sql}) ORDER BY grp NULLS FIRST"
        ).fetchall()
    }

    native_cols = ", ".join(
        f"percentile_cont({q}) WITHIN GROUP (ORDER BY v) AS {name}"
        for name, q in QUANTILES.items()
    )
    native = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT grp, {native_cols} FROM t GROUP BY grp "
            "ORDER BY grp NULLS FIRST"
        ).fetchall()
    }

    assert set(gen) == set(native), "group keys diverge"
    for grp in native:
        for name, g_val, n_val in zip(QUANTILES, gen[grp], native[grp]):
            if n_val is None or g_val is None:
                assert g_val == n_val, (
                    f"seed={seed} grp={grp!r} {name}: "
                    f"generated={g_val!r} native={n_val!r}"
                )
                continue
            assert math.isclose(g_val, n_val, rel_tol=REL_TOL,
                                abs_tol=ABS_TOL), (
                f"seed={seed} grp={grp!r} {name}: "
                f"generated={g_val!r} native={n_val!r}"
            )


def test_all_null_group_yields_null_percentiles():
    """A group whose every value is NULL must still appear (counts CTE
    keeps it) with NULL percentiles — matching native NULL handling."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [("a", 1.0), ("a", 3.0), ("allnull", None), ("allnull", None)],
    )
    gen_sql = percentile_interp_sql("t", "grp", "v", {"p50": 0.5},
                                    dialect="duckdb")
    got = dict(con.execute(f"SELECT grp, p50 FROM ({gen_sql})").fetchall())
    native = dict(
        con.execute(
            "SELECT grp, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) "
            "FROM t GROUP BY grp"
        ).fetchall()
    )
    assert got == native == {"a": 2.0, "allnull": None}


def test_local_counts_form_identical(spark):
    """percentile_interp_spark (counts collected once into a
    LocalRelation — the 100 TB path that saves the third fact-table
    scan, PERCENTILE_r10.md) must be bit-identical to the 3-scan SQL
    form at sf0.001."""
    from bq_duckdb_spark.operators.percentile import (
        percentile_interp_spark,
        percentile_interp_sql,
    )

    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .createOrReplaceTempView("lineitem")
    q = {"p50": 0.5, "p95": 0.95}
    sql_form = spark.sql(percentile_interp_sql(
        "lineitem", "l_returnflag", "l_extendedprice", q, dialect="spark"))
    local_form = percentile_interp_spark(
        spark, "lineitem", "l_returnflag", "l_extendedprice", q)
    a = sorted(map(tuple, sql_form.collect()))
    b = sorted(map(tuple, local_form.collect()))
    assert a == b
