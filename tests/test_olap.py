"""OLAP golden suite — ports the reference's olap_test.clj golden-output
tests (fixtures per FIXTURES.md §1) through the engine's BigQuery-SQL
surface (Session.query), so the dialect shim is exercised too."""

import pytest

from tests.conftest import rows


@pytest.fixture()
def sess(session):
    return session


def make(sess, name, cols, data):
    sess.pipeline.register([{"name": name, "schema": cols, "rows": data}])
    sess.pipeline.run(targets=[name])


def test_row_number_partition(sess):
    """olap_test.clj:17-28."""
    make(sess, "sales",
         [{"name": "region", "type": "STRING"}, {"name": "amount", "type": "FLOAT64"}],
         [["East", 100.0], ["East", 200.0], ["West", 150.0], ["West", 300.0]])
    got = rows(sess.query(
        "SELECT region, amount, ROW_NUMBER() OVER (PARTITION BY region "
        "ORDER BY amount DESC) AS rn FROM sales ORDER BY region, rn"))
    assert got == [("East", 200.0, 1), ("East", 100.0, 2),
                   ("West", 300.0, 1), ("West", 150.0, 2)]


def test_rank_vs_dense_rank_ties(sess):
    """Ties → rank 1,1,3,4 vs dense_rank 1,1,2,3 (olap_test.clj:30-41)."""
    make(sess, "scores",
         [{"name": "name", "type": "STRING"}, {"name": "score", "type": "INT64"}],
         [["Alice", 100], ["Bob", 100], ["Charlie", 90], ["Dave", 80]])
    got = rows(sess.query(
        "SELECT name, RANK() OVER (ORDER BY score DESC) AS r, "
        "DENSE_RANK() OVER (ORDER BY score DESC) AS dr "
        "FROM scores ORDER BY score DESC, name"))
    assert got == [("Alice", 1, 1), ("Bob", 1, 1), ("Charlie", 3, 2), ("Dave", 4, 3)]


def test_lag_lead_edge_nulls(sess):
    """olap_test.clj:43-54."""
    make(sess, "timeseries",
         [{"name": "day", "type": "INT64"}, {"name": "value", "type": "FLOAT64"}],
         [[1, 10.0], [2, 20.0], [3, 15.0], [4, 25.0]])
    got = rows(sess.query(
        "SELECT day, LAG(value) OVER (ORDER BY day) AS prev, "
        "LEAD(value) OVER (ORDER BY day) AS nxt FROM timeseries ORDER BY day"))
    assert got == [(1, None, 20.0), (2, 10.0, 15.0), (3, 20.0, 25.0), (4, 15.0, None)]


def test_running_total_rows_frame(sess):
    """olap_test.clj:56-67."""
    make(sess, "transactions",
         [{"name": "id", "type": "INT64"}, {"name": "amount", "type": "FLOAT64"}],
         [[1, 100.0], [2, 50.0], [3, 75.0], [4, 25.0]])
    got = rows(sess.query(
        "SELECT id, SUM(amount) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS total FROM transactions ORDER BY id"))
    assert got == [(1, 100.0), (2, 150.0), (3, 225.0), (4, 250.0)]


def test_cte_sum(sess):
    """olap_test.clj:71-78."""
    make(sess, "nums", [{"name": "n", "type": "INT64"}], [[1], [2], [3], [4], [5]])
    got = rows(sess.query(
        "WITH doubled AS (SELECT n * 2 AS d FROM nums) SELECT SUM(d) AS s FROM doubled"))
    assert got == [(30,)]


def test_chained_cte_rank_filter(sess):
    """Two CTEs, later references earlier, RANK, downstream WHERE rank<=2
    with ties at the top (olap_test.clj:80-99)."""
    make(sess, "orders",
         [{"name": "customer_id", "type": "INT64"}, {"name": "amount", "type": "FLOAT64"}],
         [[1, 100.0], [1, 200.0], [2, 150.0], [2, 50.0], [3, 300.0]])
    got = rows(sess.query(
        "WITH totals AS (SELECT customer_id, SUM(amount) AS total FROM orders "
        "GROUP BY customer_id), "
        "ranked AS (SELECT customer_id, total, RANK() OVER (ORDER BY total DESC) "
        "AS rnk FROM totals) "
        "SELECT customer_id, total, rnk FROM ranked WHERE rnk <= 2 "
        "ORDER BY customer_id"))
    # totals: 1→300, 2→200, 3→300; ties at 300 → both rank 1, 200 → rank 3
    assert got == [(1, 300.0, 1), (3, 300.0, 1)]


def test_group_by_aggregates(sess):
    """olap_test.clj:103-115."""
    make(sess, "products",
         [{"name": "category", "type": "STRING"},
          {"name": "subcategory", "type": "STRING"},
          {"name": "revenue", "type": "FLOAT64"}],
         [["Electronics", "Phones", 1000.0], ["Electronics", "Laptops", 2000.0],
          ["Clothing", "Shirts", 500.0], ["Clothing", "Pants", 750.0]])
    got = rows(sess.query(
        "SELECT category, SUM(revenue) AS total, AVG(revenue) AS avg_rev, "
        "COUNT(*) AS cnt FROM products GROUP BY category ORDER BY category"))
    assert got == [("Clothing", 1250.0, 625.0, 2), ("Electronics", 3000.0, 1500.0, 2)]


def test_having(sess):
    """HAVING COUNT(*) >= 3 (olap_test.clj:118-126)."""
    make(sess, "events",
         [{"name": "user_id", "type": "INT64"}, {"name": "event_type", "type": "STRING"}],
         [[1, "click"], [1, "click"], [1, "view"], [2, "click"],
          [3, "click"], [3, "click"], [3, "click"]])
    got = rows(sess.query(
        "SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id "
        "HAVING COUNT(*) >= 3 ORDER BY user_id"))
    assert got == [(1, 3), (3, 3)]


def test_cross_join_product(sess):
    """2×2 product (olap_test.clj:148-161)."""
    make(sess, "users",
         [{"name": "id", "type": "INT64"}, {"name": "name", "type": "STRING"}],
         [[1, "Alice"], [2, "Bob"]])
    make(sess, "tags", [{"name": "tag", "type": "STRING"}], [["active"], ["vip"]])
    got = rows(sess.query(
        "SELECT name, tag FROM users CROSS JOIN tags ORDER BY name, tag"))
    assert got == [("Alice", "active"), ("Alice", "vip"),
                   ("Bob", "active"), ("Bob", "vip")]


def test_scalar_subquery_diff(sess):
    """salary - (SELECT AVG(salary)) (olap_test.clj:165-176)."""
    make(sess, "employees",
         [{"name": "id", "type": "INT64"}, {"name": "salary", "type": "FLOAT64"}],
         [[1, 50000.0], [2, 60000.0], [3, 70000.0], [4, 80000.0]])
    got = rows(sess.query(
        "SELECT id, salary - (SELECT AVG(salary) FROM employees) AS diff "
        "FROM employees ORDER BY id"))
    assert got == [(1, -15000.0), (2, -5000.0), (3, 5000.0), (4, 15000.0)]


def test_correlated_exists(sess):
    """EXISTS semi-join (olap_test.clj:179-187)."""
    make(sess, "customers",
         [{"name": "id", "type": "INT64"}, {"name": "name", "type": "STRING"}],
         [[1, "Alice"], [2, "Bob"], [3, "Carol"]])
    make(sess, "purchases",
         [{"name": "customer_id", "type": "INT64"}, {"name": "product", "type": "STRING"}],
         [[1, "Widget"], [3, "Gadget"], [3, "Gizmo"]])
    got = rows(sess.query(
        "SELECT name FROM customers c WHERE EXISTS "
        "(SELECT 1 FROM purchases p WHERE p.customer_id = c.id) ORDER BY name"))
    assert got == [("Alice",), ("Carol",)]


def test_three_way_join_null_fill(sess):
    """INNER + LEFT join with NULL fill for unmatched lead
    (olap_test.clj:191-210)."""
    make(sess, "departments",
         [{"name": "id", "type": "INT64"}, {"name": "name", "type": "STRING"}],
         [[1, "Sales"], [2, "Engineering"]])
    make(sess, "staff",
         [{"name": "id", "type": "INT64"}, {"name": "name", "type": "STRING"},
          {"name": "dept_id", "type": "INT64"}],
         [[1, "Ann", 1], [2, "Ben", 2], [3, "Cy", 2]])
    make(sess, "projects",
         [{"name": "id", "type": "INT64"}, {"name": "title", "type": "STRING"},
          {"name": "lead_id", "type": "INT64"}],
         [[1, "Alpha", 1], [2, "Beta", 2]])
    got = rows(sess.query(
        "SELECT s.name AS staff_name, d.name AS dept, p.title AS title "
        "FROM staff s JOIN departments d ON s.dept_id = d.id "
        "LEFT JOIN projects p ON p.lead_id = s.id ORDER BY s.name"))
    assert got == [("Ann", "Sales", "Alpha"), ("Ben", "Engineering", "Beta"),
                   ("Cy", "Engineering", None)]


def test_case_when_bucketing(sess):
    """olap_test.clj:214-232."""
    make(sess, "metrics", [{"name": "value", "type": "INT64"}],
         [[10], [50], [75], [100]])
    got = rows(sess.query(
        "SELECT value, CASE WHEN value < 50 THEN 'low' WHEN value < 100 "
        "THEN 'medium' ELSE 'high' END AS bucket FROM metrics ORDER BY value"))
    assert got == [(10, "low"), (50, "medium"), (75, "medium"), (100, "high")]


def test_percentile_cont_golden(sess):
    """p50=55.0, p95=95.5 over 10.0..100.0 — continuous interpolation
    (olap_test.clj:269-275)."""
    make(sess, "response_times", [{"name": "ms", "type": "FLOAT64"}],
         [[float(x)] for x in range(10, 101, 10)])
    got = rows(sess.query(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY ms) AS p50, "
        "percentile_cont(0.95) WITHIN GROUP (ORDER BY ms) AS p95 "
        "FROM response_times"))
    assert got == [(55.0, 95.5)]


def test_ntile_quartiles(sess):
    """1..8 into NTILE(4) → 1,1,2,2,3,3,4,4 (olap_test.clj:277-292)."""
    make(sess, "vals", [{"name": "v", "type": "INT64"}], [[x] for x in range(1, 9)])
    got = rows(sess.query(
        "SELECT v, NTILE(4) OVER (ORDER BY v) AS quartile FROM vals ORDER BY v"))
    assert got == [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3), (7, 4), (8, 4)]


def test_cohort_left_join_count_distinct(sess):
    """Cohort shape: 2 CTEs, LEFT JOIN, COUNT(DISTINCT), MIN
    (olap_test.clj:296-325)."""
    make(sess, "user_events",
         [{"name": "user_id", "type": "INT64"}, {"name": "event_date", "type": "STRING"},
          {"name": "event_type", "type": "STRING"}],
         [[1, "2024-01-01", "signup"], [1, "2024-01-03", "purchase"],
          [2, "2024-01-02", "signup"], [3, "2024-01-02", "signup"],
          [3, "2024-01-05", "purchase"]])
    got = rows(sess.query(
        "WITH signups AS (SELECT user_id, MIN(event_date) AS signup_date "
        "FROM user_events WHERE event_type = 'signup' GROUP BY user_id), "
        "buyers AS (SELECT DISTINCT user_id FROM user_events "
        "WHERE event_type = 'purchase') "
        "SELECT s.signup_date, COUNT(DISTINCT s.user_id) AS n_signups, "
        "COUNT(DISTINCT b.user_id) AS n_buyers "
        "FROM signups s LEFT JOIN buyers b ON s.user_id = b.user_id "
        "GROUP BY s.signup_date ORDER BY s.signup_date"))
    assert got == [("2024-01-01", 1, 1), ("2024-01-02", 2, 1)]


def test_unnest_literal(sess):
    """UNNEST([1,2,3]) → 3 rows (client_test.clj:118-123)."""
    got = rows(sess.query("SELECT x FROM UNNEST([1, 2, 3]) AS x ORDER BY x"))
    assert got == [(1,), (2,), (3,)]


def test_struct_literal(sess):
    """STRUCT(1 AS x, 2 AS y) (client_test.clj:126-130)."""
    got = sess.query("SELECT STRUCT(1 AS x, 2 AS y) AS s").collect()
    assert got[0].s.x == 1 and got[0].s.y == 2


def test_literal_select_alias(sess):
    """SELECT 1 AS x, 'hello' AS greeting (client_test.clj:51-54)."""
    got = rows(sess.query("SELECT 1 AS x, 'hello' AS greeting"))
    assert got == [(1, "hello")]


def test_date_functions(sess):
    """EXTRACT, DATE literal, DATE_ADD+INTERVAL, CAST (olap_test.clj:236-248)."""
    got = rows(sess.query(
        "SELECT EXTRACT(YEAR FROM DATE '2024-03-15') AS yr, "
        "EXTRACT(MONTH FROM DATE '2024-03-15') AS mo, "
        "CAST(DATE_ADD(DATE '2024-03-15', INTERVAL 10 DAY) AS STRING) AS plus10"))
    assert got == [(2024, 3, "2024-03-25")]


def test_string_functions(sess):
    """UPPER/LOWER/CONCAT/LENGTH (olap_test.clj:252-256) +
    REGEXP_CONTAINS (olap_test.clj:259-264)."""
    got = rows(sess.query(
        "SELECT UPPER('abc') AS u, LOWER('ABC') AS l, "
        "CONCAT('foo', 'bar') AS c, LENGTH('hello') AS n, "
        "REGEXP_CONTAINS('hello world', 'wor') AS has_wor, "
        "REGEXP_CONTAINS('hello world', '^wor') AS starts_wor"))
    assert got == [("ABC", "abc", "foobar", 5, True, False)]


def test_modulo_filter(sess):
    """value % 2 = 0 (pipeline.rs:959; dag_test.clj:185)."""
    make(sess, "numbers", [{"name": "n", "type": "INT64"}], [[x] for x in range(1, 6)])
    got = rows(sess.query("SELECT n FROM numbers WHERE n % 2 = 0 ORDER BY n"))
    assert got == [(2,), (4,)]


def test_boolean_literal_equality(sess):
    """active = true predicate (pipeline.rs:1475-1507)."""
    make(sess, "flags",
         [{"name": "name", "type": "STRING"}, {"name": "active", "type": "BOOL"}],
         [["a", True], ["b", False], ["c", True]])
    got = rows(sess.query(
        "SELECT name FROM flags WHERE active = true ORDER BY name"))
    assert got == [("a",), ("c",)]


def test_null_roundtrip(sess):
    """NULL insert → NULL result (pipeline.rs:1453-1473)."""
    make(sess, "with_nulls",
         [{"name": "id", "type": "INT64"}, {"name": "value", "type": "STRING"}],
         [[1, "x"], [2, None], [3, "z"]])
    got = rows(sess.query("SELECT id, value FROM with_nulls ORDER BY id"))
    assert got == [(1, "x"), (2, None), (3, "z")]


def test_float_filter(sess):
    """reading > 50 (pipeline.rs:1509-1539)."""
    make(sess, "measurements",
         [{"name": "sensor", "type": "STRING"}, {"name": "reading", "type": "FLOAT64"}],
         [["temp", 23.5], ["humidity", 65.2], ["pressure", 1013.25]])
    got = rows(sess.query(
        "SELECT sensor FROM measurements WHERE reading > 50 ORDER BY sensor"))
    assert got == [("humidity",), ("pressure",)]


def test_order_by_desc_limit(sess):
    """ORDER BY … DESC LIMIT 1 (dag_test.clj:273-274)."""
    make(sess, "vals2", [{"name": "v", "type": "INT64"}], [[5], [9], [3]])
    assert rows(sess.query("SELECT v FROM vals2 ORDER BY v DESC LIMIT 1")) == [(9,)]


def test_union_all(sess):
    make(sess, "u1", [{"name": "v", "type": "INT64"}], [[1], [2]])
    got = rows(sess.query(
        "SELECT v FROM u1 UNION ALL SELECT v + 10 AS v FROM u1 ORDER BY v"))
    assert got == [(1,), (2,), (11,), (12,)]


def test_derived_table_subquery_alias(sess):
    """FROM (SELECT …) AS sub (pipeline.rs:2228-2236)."""
    make(sess, "real_table", [{"name": "v", "type": "INT64"}], [[42]])
    got = rows(sess.query("SELECT v FROM (SELECT v FROM real_table) AS sub"))
    assert got == [(42,)]


def test_qualify_clause(sess):
    """BigQuery QUALIFY filters window output (dialect rewrite)."""
    make(sess, "q_sales",
         [{"name": "region", "type": "STRING"}, {"name": "amount", "type": "FLOAT64"}],
         [["East", 100.0], ["East", 200.0], ["West", 150.0], ["West", 300.0]])
    got = rows(sess.query(
        "SELECT region, amount, ROW_NUMBER() OVER (PARTITION BY region "
        "ORDER BY amount DESC) AS rn FROM q_sales QUALIFY rn = 1 ORDER BY region"))
    assert got == [("East", 200.0, 1), ("West", 300.0, 1)]


def test_star_except(sess):
    """BigQuery SELECT * EXCEPT(col) — native in Spark 4."""
    make(sess, "se_t", [{"name": "a", "type": "INT64"}, {"name": "b", "type": "STRING"}],
         [[1, "x"]])
    df = sess.query("SELECT * EXCEPT (b) FROM se_t")
    assert df.columns == ["a"]


def test_engine_generated_ingestion_functions(sess):
    """DATE_FROM_UNIX_DATE / TIMESTAMP_MICROS — the functions the
    reference emits for Arrow ingestion (yachtsql.rs:365-366,405-444)."""
    got = rows(sess.query(
        "SELECT CAST(DATE_FROM_UNIX_DATE(19000) AS STRING) AS d, "
        "CAST(TIMESTAMP_MICROS(1640000000000000) AS STRING) AS ts"))
    assert got == [("2022-01-08", "2021-12-20 11:33:20")]


def test_qualified_table_column_refs(sess):
    """Columns qualified by the user-facing table name must resolve even
    though the engine renames tables to session views (the mapping
    carries the original name as an alias)."""
    make(sess, "qt", [{"name": "id", "type": "INT64"}], [[1], [2]])
    assert rows(sess.query("SELECT qt.id FROM qt ORDER BY qt.id")) == [(1,), (2,)]
    # user alias wins when both are present
    assert rows(sess.query("SELECT z.id FROM qt z WHERE z.id = 2")) == [(2,)]


def test_unnest_with_offset_via_engine(sess):
    make(sess, "seqs", [{"name": "id", "type": "INT64"}], [[1]])
    got = rows(
        sess.query(
            "SELECT seqs.id, v, i FROM seqs, UNNEST([7, 8]) AS v WITH OFFSET i "
            "ORDER BY i"
        )
    )
    assert got == [(1, 7, 0), (1, 8, 1)]


def test_tablesample_system(sess):
    """BigQuery TABLESAMPLE SYSTEM (n PERCENT) runs (approximate row
    count by design — assert bounds, not exact)."""
    make(sess, "big", [{"name": "id", "type": "INT64"}],
         [[i] for i in range(500)])
    n = rows(sess.query(
        "SELECT count(*) AS c FROM big TABLESAMPLE SYSTEM (10 PERCENT)"))[0][0]
    assert 0 <= n < 250
    # with a user alias too
    n2 = rows(sess.query(
        "SELECT count(t.id) AS c FROM big t TABLESAMPLE SYSTEM (50 PERCENT)"))[0][0]
    assert 100 <= n2 <= 400


def test_lowercase_as_alias(sess):
    """User aliases written with lowercase 'as' collapse correctly."""
    make(sess, "lc", [{"name": "id", "type": "INT64"}], [[5]])
    assert rows(sess.query("SELECT z.id FROM lc as z")) == [(5,)]
