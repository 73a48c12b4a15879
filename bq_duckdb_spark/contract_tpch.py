"""Complete TPC-H query suite (q02-q22, shape-faithful adaptations).

The reference engine (src/executor/query.rs, delegating SQL to its engine
crate) answers arbitrary BigQuery-dialect SQL; TPC-H is the canonical
workload for proving relational completeness, so every query the driver
testdata can express is implemented here Spark-first with a DuckDB oracle.
q01/q03/q05 live in __spark_entry__.py since round 1; this module adds the
other 19.

The driver testdata (TESTDATA.md) is TPC-H-ish, not TPC-H: there is no
partsupp table, and several columns are absent (l_commitdate,
l_receiptdate, l_shipmode, p_container, p_mfgr, c_phone, o_comment...).
Each query here preserves the ORIGINAL query's distinctive operator
pattern — the thing TPC-H exercises — re-expressed over the available
columns; the adaptation is documented per query:

- q02: min-within-group + join-back (partsupp -> distinct shipped pairs)
- q04: correlated EXISTS semi-join with inequality on outer column
- q06: pure scan-filter-aggregate (verbatim; all columns exist)
- q07: double nation self-join with symmetric pair predicate
- q08: market-share ratio of conditional aggregates
- q09: profit decomposition by nation x year (supplycost -> retailprice)
- q10: top-k customers by returned revenue
- q11: HAVING against a global scalar subquery
- q12: CASE-bucketed counts by class with lateness predicate
- q13: LEFT JOIN with join-condition filter + distribution-of-counts
- q14: conditional-aggregate percentage
- q15: CTE revenue view + max scalar subquery equality
- q16: COUNT(DISTINCT) with anti-join supplier exclusion
- q17: correlated per-part average threshold (0.2 * avg)
- q18: IN over a groupBy-HAVING subquery, re-join + re-aggregate
- q19: disjunction-of-conjunctions join predicate
- q20: nested semi-join chain (qualifying quantities -> suppliers)
- q21: EXISTS + NOT EXISTS double correlation on the same table
- q22: anti-join + global average scalar with derived country code

Scale notes (100 TB): every join below shuffles on its natural equi-key
or broadcasts a genuinely-small side (region/nation/supplier at TPC-H
geometry are broadcast-size at ANY SF; part/customer grow linearly and
are left to AQE). Top-k outputs compile to TakeOrderedAndProject. The
only global funnels are single-row aggregate outputs (q06/q14/q17/q19)
where the funnel receives one row per partition.

Oracle parity conventions follow __spark_entry__.py: identical aliases
both sides, DOUBLE sums rounded to 2dp / ratios to 4dp, counts BIGINT on
both sides, year() cast to INTEGER in DuckDB (Spark year() is int).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_duckdb_spark.testdata import load_table as _t


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# Exact fixed-point revenue term for entries whose aggregate exceeds the
# 6dp hash floor at adversarial row counts (q07/q09/q15: the r5 sf1 sweep
# measured Spark/DuckDB 2dp-rounded sums straddling a cent at ~450k
# doubles per group, and q15's revenue = max(revenue) equality missing
# entirely under DuckDB's re-associating parallel sum). The scale is
# 10000, not 100: extendedprice carries 2dp and discount 2dp, so the
# per-row product carries exactly 4 decimal digits — floor(x*10000+0.5)
# recovers that 4dp decimal EXACTLY from the double, so the integer sum
# equals the true decimal total (a cents scale would quantize each row
# and let group totals drift ~0.003*sqrt(n) dollars from the canonical
# value). Both engines compute the IDENTICAL bigint from the identical
# double product (pure double arithmetic + floor, no engine rounding
# mode); the integer sum is exact and order-free, and one final /10000.0
# maps back (4dp totals stay far below 2^53 per group, so the division
# is a single exact-operand float op). Same convention as
# q_running_total (__spark_entry__.py).
def _rev_cents() -> F.Column:
    return F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )


_REV_CENTS_SQL = (
    "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
)


def _dec_sum(col: F.Column, digits: int = 2) -> F.Column:
    """Exact money aggregation for UNBOUNDED-group sums (the q01 sf1
    lesson): a double sum's association-order error grows ~sqrt(n) and
    crossed the 2dp rounding boundary at 6M rows. Per-row double
    products are identical IEEE values in both engines; the decimal
    addition is exact and order-independent, and rounding BEFORE the
    final double cast keeps that cast exact (< 2^53 in 10^-digits
    units). Caveat (round-8 ADVICE): the per-row double->DECIMAL(30,6)
    cast paths differ — Spark goes through the shortest-decimal string
    (BigDecimal.valueOf), DuckDB scales the exact binary value — so a
    rare 1e-6-unit per-row flip is possible in principle; the exact sum
    plus the 2dp round absorbs it (a mismatch needs correlated flips
    totalling >= 0.005 in one group). Unlike the BIGINT-cents fold
    (_rev_cents, kept where integer EQUALITY is the point, q15) this
    cannot overflow."""
    return F.round(F.sum(col.cast("decimal(30,6)")), digits).cast("double")


def _dec_sum_sql(expr: str, digits: int = 2) -> str:
    """DuckDB mirror of :func:`_dec_sum`."""
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(30,6))), {digits}) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# q02 — min-within-group + join-back (original: min ps_supplycost in EUROPE)
# ---------------------------------------------------------------------------


def q02_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier with the
    MINIMUM account balance among suppliers that ever shipped it.

    Adaptation: partsupp does not exist -> the (part, supplier) relation is
    the DISTINCT (l_partkey, l_suppkey) pairs from lineitem; min
    ps_supplycost -> min s_acctbal.

    Scale: the distinct-pair projection is one shuffle on the pair key;
    region/nation/supplier broadcast; the min-per-part is a window over the
    part key (same shuffle as the preceding join on p_partkey).
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(15, 25, 35))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    shipped = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    supp_eur = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                )
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cand = (
        part.join(shipped, part.p_partkey == shipped.l_partkey)
        .join(F.broadcast(supp_eur), shipped.l_suppkey == supp_eur.s_suppkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q02_ORACLE = """
WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
  FROM part p
  JOIN shipped sh ON p.p_partkey = sh.l_partkey
  JOIN supplier s ON sh.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size IN (15, 25, 35) AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM cand
QUALIFY s_acctbal = min(s_acctbal) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q04 — EXISTS with inequality against the outer row
# ---------------------------------------------------------------------------


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority that had at least one LATE
    line item, for one quarter.

    Adaptation: l_commitdate < l_receiptdate (late delivery) ->
    l_shipdate > o_orderdate + 60 days (late shipment); the correlated
    EXISTS with an inequality against the outer row is preserved.

    Scale: left-semi join shuffles both sides on the order key once;
    the 5-group aggregate is map-side partial.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q04_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q06 — pure scan-filter-aggregate (verbatim TPC-H)
# ---------------------------------------------------------------------------


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 verbatim (every referenced column exists): one-year shipdate
    band, discount band, quantity cap -> single revenue scalar.

    Scale: the canonical pushdown probe — all three predicates reach the
    parquet scan (PushedFilters), aggregate is a one-row funnel receiving
    one partial per partition.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


_Q06_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q07 — double nation self-join, symmetric pair predicate
# ---------------------------------------------------------------------------


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, both directions,
    by year. nation joined twice (supplier side and customer side) with the
    symmetric (n1,n2)|(n2,n1) disjunction.

    Scale: the two nation joins broadcast; lineitem->orders->customer
    shuffles on the natural keys; the (2 x 2 x years) group is tiny.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        # exact cents (see _rev_cents): portable at any group size
        .agg((F.sum(_rev_cents()) / F.lit(10000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q07_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       sum(volume_cents) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REV_CENTS_SQL} AS volume_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q08 — market-share ratio of conditional aggregates
# ---------------------------------------------------------------------------


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue delivered
    into ASIA, by order year — the ratio-of-conditional-sums pattern.

    Scale: part filter prunes before the join; nation/region/supplier
    broadcast; 2-row output.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    all_nations = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q08_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q09 — profit decomposition by nation x year
# ---------------------------------------------------------------------------


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red%' parts by supplier nation and year.

    Adaptation: ps_supplycost * l_quantity -> 0.1 * p_retailprice *
    l_quantity (partsupp absent); the profit expression keeps the
    revenue-minus-cost decomposition over a part-name LIKE filter.

    Scale: part filter prunes before the join; supplier/nation broadcast;
    group is (25 nations x years).
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            # exact cents of the full profit term (see _rev_cents);
            # floor(x+0.5) on a possibly-negative amount is still the
            # same pure-double computation in both engines
            F.expr(
                "CAST(floor((l_extendedprice * (1 - l_discount)"
                " - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5) AS BIGINT)"
            ).alias("amount_cents"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg((F.sum("amount_cents") / F.lit(10000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q09_ORACLE = """
SELECT nation, o_year, sum(amount_cents) / 10000.0 AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(floor((l_extendedprice * (1 - l_discount)
           - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5) AS BIGINT)
           AS amount_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE 'red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q10 — top-k customers by returned revenue
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on RETURNED items for
    one quarter, with customer/nation detail columns carried through the
    aggregate.

    Scale: returnflag + date filters reach the scans; nation broadcasts;
    top-20 compiles to TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q11 — HAVING against a global scalar subquery
# ---------------------------------------------------------------------------


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, keeping
    parts whose value exceeds a FRACTION OF THE GLOBAL TOTAL (the
    HAVING-vs-scalar-subquery pattern).

    Adaptation: ps_supplycost * ps_availqty -> sum(l_extendedprice *
    l_quantity) over that nation's shipments (partsupp absent).

    Scale: one shuffle on l_partkey; the global total is a second pass
    over the same aggregate (Spark: one-row broadcast crossJoin — no
    driver collect); threshold filter is map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    filtered = li.join(
        F.broadcast(
            supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        ),
        li.l_suppkey == F.col("s_suppkey"),
    )
    per_part = filtered.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("raw_value")
    )
    total = per_part.agg(
        (F.sum("raw_value") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(
            "l_partkey", F.round(F.col("raw_value"), 2).alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q11_ORACLE = """
WITH nation_value AS (
  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT l_partkey, round(raw_value, 2) AS part_value
FROM nation_value
WHERE raw_value > (SELECT sum(raw_value) * 0.001 FROM nation_value)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q12 — CASE-bucketed counts with lateness predicate
# ---------------------------------------------------------------------------


def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line class, how many high- vs low-priority
    orders shipped LATE in one year (the CASE-bucketed dual count).

    Adaptation: l_shipmode -> l_linestatus as the grouping class;
    l_receiptdate-vs-commitdate lateness -> shipped > 30 days after order.

    Scale: one shuffle on the order key; two CASE sums fold into one
    map-side partial aggregate.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q13 — LEFT JOIN with ON-clause filter + distribution of counts
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts, with the
    order filter in the JOIN CONDITION (so zero-order customers survive),
    then a second aggregate over the counts.

    Adaptation: o_comment NOT LIKE '%special%requests%' ->
    o_orderpriority <> '5-LOW'.

    Scale: one shuffle on custkey for the outer join + count; the second
    aggregate groups the 1500-row (per-customer) table by count — tiny.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c_orders = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "5-LOW"),
        "left",
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q14 — conditional-aggregate percentage
# ---------------------------------------------------------------------------


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue as a percentage of total revenue for
    one month (conditional sum over a join, divided by the plain sum).

    Scale: date filter reaches the lineitem scan; part join shuffles on
    partkey (AQE may broadcast at small SF); single-row output.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
            / F.sum(_rev()),
            4,
        ).alias("promo_revenue")
    )


_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# q15 — CTE revenue view + max scalar equality
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier (a CTE 'view'),
    then the supplier(s) whose revenue EQUALS the max (scalar subquery
    equality, not top-1 — ties must all return).

    Scale: one shuffle on suppkey; the max is a one-row broadcast
    crossJoin, not a driver collect; supplier join broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-04-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    # exact cents (see _rev_cents): the revenue = max(revenue) equality
    # is INTEGER equality — a double sum misses it entirely once the
    # engines' association orders drift (observed: DuckDB's parallel
    # re-associating sum returned 0 rows at the adversarial 6M-lineitem
    # scale while Spark returned 1)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("revenue_cents")
    )
    max_rev = revenue.agg(F.max("revenue_cents").alias("max_cents"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("revenue_cents") == F.col("max_cents"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("revenue_cents") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({_REV_CENTS_SQL}) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-04-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue_cents / 10000.0 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE revenue_cents = (SELECT max(revenue_cents) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q16 — COUNT(DISTINCT) with anti-join exclusion
# ---------------------------------------------------------------------------


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    for qualifying parts, EXCLUDING a supplier blacklist via NOT IN.

    Adaptation: partsupp -> distinct shipped (l_partkey, l_suppkey)
    pairs; the '%Customer%Complaints%' comment blacklist ->
    negative-balance suppliers. NOT IN compiles to a (broadcast)
    left-anti join — s_suppkey is non-null so the NULL-semantics trap
    (covered separately by q_not_in_null) does not bite.

    Scale: distinct pairs = one shuffle; anti join broadcasts the
    blacklist; COUNT(DISTINCT suppkey) expands then re-groups — two
    aggregate passes over one shuffle each.
    """
    pairs = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30))
    )
    return (
        pairs.join(
            F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q17 — correlated per-part average threshold
# ---------------------------------------------------------------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 0.2 x that part's average quantity) were not filled —
    the correlated per-group average threshold.

    Adaptation: p_container filter -> p_type = 'SMALL'.

    Scale: the per-part average is a groupBy over ALL of lineitem joined
    back on partkey (two shuffles on the same key — co-partitioned);
    single-row output.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "SMALL")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        # exact decimal sum rounded 2dp FIRST (exact double), then the
        # /7.0 and final round are the same IEEE ops on identical doubles
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")), 2)
                .cast("double") / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


_Q17_ORACLE = """
SELECT round(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# ---------------------------------------------------------------------------
# q18 — IN over groupBy-HAVING, re-join + re-aggregate
# ---------------------------------------------------------------------------


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders total > 300 units — the
    orderkey IN (groupBy ... HAVING sum > k) pattern, re-joined to
    customer/orders/lineitem and re-aggregated, top-100 by price.

    Scale: the HAVING subquery and the outer aggregate shuffle on the
    same orderkey (co-partitioned); customer join shuffles on custkey;
    top-100 compiles to TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum("l_quantity").alias("oq"))
        .filter(F.col("oq") > 300)
        .select("b_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("b_orderkey"), "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q19 — disjunction-of-conjunctions join predicate
# ---------------------------------------------------------------------------


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    bands — the disjunction-of-conjunctions predicate that exercises
    filter factoring (the equi-join key stays partkey; the disjunction
    is a residual filter, NOT a fallback to a nested-loop join).

    Scale: Catalyst keeps the equi-join on partkey and applies the OR
    residual post-join; single-row output.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(_dec_sum(_rev()).alias("revenue"))
    )


_Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q20 — nested semi-join chain
# ---------------------------------------------------------------------------


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped a LARGE
    cumulative quantity of some SMALL-type part — the nested
    IN-(groupBy-HAVING over a join) chain collapsing to semi-joins.

    Adaptation: the availqty > half-year-demand inner subquery ->
    per-(supplier, part) shipped quantity > 100 on SMALL-type parts.

    Scale: the qualifying aggregate shuffles on the (suppkey, partkey)
    pair; both semi-joins broadcast (supplier table is nation-filtered
    and tiny at any SF; at TPC-H geometry supplier is 1/10 of customer).
    """
    li = _t(spark, sf_dir, "lineitem")
    part_small = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey"
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    qualifying = (
        li.join(F.broadcast(part_small), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 100
  )
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# q21 — EXISTS + NOT EXISTS double correlation on the same table
# ---------------------------------------------------------------------------


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers (one nation, finished orders) who were
    the LAST to ship on a multi-supplier order — EXISTS (another supplier
    on the order) AND NOT EXISTS (another supplier shipping later), both
    correlated to the same outer lineitem row.

    Adaptation: receipt-vs-commit lateness -> latest l_shipdate on the
    order; the double correlation on lineitem is preserved exactly.

    Scale: both the semi and the anti join shuffle on the order key —
    three co-partitioned shuffles total; supplier/nation broadcast;
    top-100 compiles to TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(
            F.broadcast(
                supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            ),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
    )
    with_other = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    not_latest = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not_latest.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q22 — anti-join + global average scalar with derived code
# ---------------------------------------------------------------------------


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers (balance above the positive-balance
    average) in selected 'country codes' with NO orders — global scalar
    subquery + NOT EXISTS anti-join + derived grouping code.

    Adaptation: substring(c_phone,1,2) country code -> c_custkey % 7
    (customer phone absent); 'no orders' -> 'no orders since 2000-01-01'
    (every testdata customer has SOME order); the code-IN filter, the
    positive-average scalar, and the anti join are preserved.

    Scale: the average is a one-row broadcast; the anti join shuffles on
    custkey; 5-group output.
    """
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_custkey") % 7
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    in_codes = cust.filter(F.col("cntrycode").isin(0, 1, 2, 3, 4))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        in_codes.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, in_codes.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_ORACLE = """
SELECT cntrycode, count(*) AS numcust, CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_custkey % 7 AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_custkey % 7 IN (0, 1, 2, 3, 4)
    AND c_acctbal > (
      SELECT avg(c_acctbal) FROM customer
      WHERE c_acctbal > 0 AND c_custkey % 7 IN (0, 1, 2, 3, 4)
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q02_min_acctbal_supplier": q02_min_acctbal_supplier,
    "q04_order_priority": q04_order_priority,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_volume_shipping": q07_volume_shipping,
    "q08_market_share": q08_market_share,
    "q09_product_profit": q09_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_parts": q11_important_parts,
    "q12_shipping_modes": q12_shipping_modes,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_volume": q18_large_volume,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_sales_opportunity": q22_sales_opportunity,
}

_ORACLES: dict[str, str] = {
    "q02_min_acctbal_supplier": _Q02_ORACLE,
    "q04_order_priority": _Q04_ORACLE,
    "q06_forecast_revenue": _Q06_ORACLE,
    "q07_volume_shipping": _Q07_ORACLE,
    "q08_market_share": _Q08_ORACLE,
    "q09_product_profit": _Q09_ORACLE,
    "q10_returned_items": _Q10_ORACLE,
    "q11_important_parts": _Q11_ORACLE,
    "q12_shipping_modes": _Q12_ORACLE,
    "q13_customer_distribution": _Q13_ORACLE,
    "q14_promo_effect": _Q14_ORACLE,
    "q15_top_supplier": _Q15_ORACLE,
    "q16_part_supplier_counts": _Q16_ORACLE,
    "q17_small_quantity": _Q17_ORACLE,
    "q18_large_volume": _Q18_ORACLE,
    "q19_discounted_revenue": _Q19_ORACLE,
    "q20_excess_suppliers": _Q20_ORACLE,
    "q21_waiting_supplier": _Q21_ORACLE,
    "q22_sales_opportunity": _Q22_ORACLE,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
