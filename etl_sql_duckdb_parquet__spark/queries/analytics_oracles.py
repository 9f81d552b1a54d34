"""DuckDB oracle SQL twins for queries/analytics.py.

Column names/aliases match the Spark queries exactly (driver hashes
values with columns sorted by name).  Type-parity notes:

- DuckDB ``sum`` over INTEGER/BIGINT returns HUGEINT → always CAST to
  BIGINT to match Spark's LongType.
- DuckDB ``year``/``rank``/``floor`` return BIGINT/DOUBLE → cast to the
  Spark-side type (INT / INT / BIGINT).
- All float aggregates are ROUNDed in both engines so last-ulp
  summation-order differences can't flip the value hash.
"""

ANALYTICS_ORACLES: dict[str, str] = {
    "q01_orders_per_nation": """
        SELECT n_name,
               count(DISTINCT c_custkey) AS n_customers,
               count(DISTINCT o_orderkey) AS n_orders
        FROM nation
        LEFT JOIN customer ON n_nationkey = c_nationkey
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "q02_top10_lowest_acctbal": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer
        ORDER BY acctbal ASC NULLS LAST, c_custkey ASC
        LIMIT 10
    """,
    "q03_lineitem_flag": """
        SELECT CASE WHEN l_discount > 0.08 THEN 'HIGH_DISC'
                    WHEN l_tax > 0.06 THEN 'HIGH_TAX'
                    WHEN l_returnflag = 'R' THEN 'RETURNED'
                    ELSE 'OK' END AS flag,
               count(*) AS n
        FROM lineitem
        GROUP BY flag
        ORDER BY flag
    """,
    "q04_segment_revenue": """
        SELECT c_mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(avg(l_discount), 4) AS avg_disc,
               max(l_quantity) AS max_qty,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q05_priority_stats": """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q06_rank_in_nation": """
        SELECT * FROM (
            SELECT n_name,
                   c_custkey,
                   round(c_acctbal, 2) AS acctbal,
                   CAST(rank() OVER (PARTITION BY n_name
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS INT) AS rank_low,
                   CAST(row_number() OVER (PARTITION BY n_name
                        ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn_high
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rank_low <= 3
        ORDER BY n_name, rank_low, c_custkey
    """,
    "q07_null_rates": """
        SELECT 'customer' AS table_name, 'c_acctbal' AS column_name,
               count(*) AS n_rows,
               CAST(count(*) FILTER (WHERE c_acctbal IS NULL) AS BIGINT) AS n_null,
               round(100.0 * count(*) FILTER (WHERE c_acctbal IS NULL) / count(*), 2) AS null_pct
        FROM customer
        UNION ALL
        SELECT 'orders', 'o_totalprice', count(*),
               CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
               round(100.0 * count(*) FILTER (WHERE o_totalprice IS NULL) / count(*), 2)
        FROM orders
        UNION ALL
        SELECT 'lineitem', 'l_discount', count(*),
               CAST(count(*) FILTER (WHERE l_discount IS NULL) AS BIGINT),
               round(100.0 * count(*) FILTER (WHERE l_discount IS NULL) / count(*), 2)
        FROM lineitem
        ORDER BY table_name
    """,
    "q08_customers_without_orders": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q09_segment_share_by_region": """
        WITH g AS (
            SELECT r_name, c_mktsegment,
                   count(DISTINCT c_custkey) AS n_cust
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, c_mktsegment
        )
        SELECT r_name, c_mktsegment, n_cust,
               round(100.0 * n_cust / sum(n_cust) OVER (PARTITION BY r_name), 1)
                   AS pct_of_region
        FROM g
        ORDER BY r_name, c_mktsegment
    """,
    "q10_returnflag_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q11_event_value_flags": """
        SELECT event_type,
               count(*) AS n,
               CAST(count(*) FILTER (WHERE value > 500) AS BIGINT) AS n_high,
               round(100.0 * count(*) FILTER (WHERE value > 500) / count(*), 2)
                   AS pct_high
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q12_orders_by_year": """
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY order_year
        ORDER BY order_year
    """,
    "q13_value_histogram": """
        SELECT CAST(floor(value / 100) AS BIGINT) AS bin, count(*) AS n
        FROM events
        GROUP BY bin
        ORDER BY bin
    """,
    "q14_profile_lineitem": """
        SELECT 'l_quantity' AS column_name,
               count(*) AS n,
               CAST(count(*) FILTER (WHERE l_quantity IS NULL) AS BIGINT) AS n_null,
               count(DISTINCT l_quantity) AS n_distinct,
               round(min(l_quantity), 4) AS min_v,
               round(max(l_quantity), 4) AS max_v,
               round(avg(l_quantity), 4) AS mean_v,
               round(stddev_samp(l_quantity), 4) AS std_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               CAST(count(*) FILTER (WHERE l_extendedprice IS NULL) AS BIGINT),
               count(DISTINCT l_extendedprice),
               round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
               round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
        FROM lineitem
        ORDER BY column_name
    """,
    "q15_price_outliers": """
        WITH b AS (
            SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM orders
        )
        SELECT round(b.q1, 4) AS q1,
               round(b.q3, 4) AS q3,
               CAST((SELECT count(*) FROM orders, b
                     WHERE o_totalprice < b.q1 - 1.5 * (b.q3 - b.q1)
                        OR o_totalprice > b.q3 + 1.5 * (b.q3 - b.q1)) AS BIGINT)
                   AS n_outliers
        FROM b
    """,
    "q16_duplicate_events": """
        WITH d AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events
            GROUP BY user_id, event_type
            HAVING count(*) > 1
        )
        SELECT event_type,
               count(*) AS n_dup_keys,
               CAST(sum(n) AS BIGINT) AS n_dup_rows
        FROM d
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q17_dedup_keep_latest": """
        WITH ranked AS (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT event_type,
               count(*) AS n_kept,
               round(sum(value), 2) AS sum_value
        FROM ranked
        WHERE rn = 1
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q18_correlations": """
        SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc
        FROM lineitem
    """,
    "q19_high_balance_order_stats": """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "q20_flagged_orderkeys": """
        WITH flagged AS (
            SELECT DISTINCT l_orderkey FROM (
                SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
                UNION ALL
                SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
                UNION ALL
                SELECT l_orderkey FROM lineitem WHERE l_tax > 0.07
                UNION ALL
                SELECT l_orderkey FROM lineitem
                WHERE l_returnflag = 'R' AND l_linestatus = 'F'
            )
        )
        SELECT count(*) AS n_flagged,
               min(l_orderkey) AS min_key,
               max(l_orderkey) AS max_key
        FROM flagged
    """,
    "q21_global_stats": """
        SELECT count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               round(avg(o_totalprice), 2) AS avg_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders
    """,
    "q22_brand_strings": """
        SELECT upper(p_brand) AS brand,
               count(*) AS n_parts,
               floor(CAST(sum(length(p_name)) AS DOUBLE) / count(*)
                     * 100 + 0.5) / 100 AS avg_name_len,
               min(p_size) AS min_size,
               max(p_size) AS max_size
        FROM part
        GROUP BY brand
        ORDER BY brand
    """,
    "q23_props_extract": """
        SELECT CAST(props->>'$.k' AS INT) % 10 AS k_bucket, count(*) AS n
        FROM events
        GROUP BY k_bucket
        ORDER BY k_bucket
    """,
    "q24_ship_month": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY ship_month
        ORDER BY ship_month
    """,
    "q25_validation_report": """
        SELECT 'orders' AS table_name, 'o_orderkey' AS column_name,
               'NOT_NULL' AS rule,
               CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_orderstatus', 'ENUM',
               CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_totalprice', 'RANGE',
               CAST(count(*) FILTER (WHERE o_totalprice < 0
                                        OR o_totalprice IS NULL) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem', 'l_discount', 'RANGE',
               CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem', 'l_quantity', 'POSITIVE',
               CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders', 'o_orderdate', 'FUTURE_DATE',
               CAST(count(*) FILTER (WHERE o_orderdate >
                    TIMESTAMP '2026-01-01 00:00:00') AS BIGINT)
        FROM orders
        ORDER BY table_name, column_name, rule
    """,
    "q27_sessionization": """
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS session_seq
            FROM marked
        ),
        per AS (
            SELECT user_id, session_seq, count(*) AS n_events
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users,
               round(avg(n_events), 4) AS avg_events_per_session,
               CAST(max(n_events) AS BIGINT) AS max_events_per_session
        FROM per
    """,
    "q26_audit_rowhash": """
        SELECT o_orderkey,
               sha256(concat_ws(chr(31), CAST(o_orderkey AS VARCHAR),
                                o_orderstatus, o_orderpriority)) AS row_hash
        FROM orders
        WHERE o_orderkey <= 50
        ORDER BY o_orderkey
    """,
    "q59_rollup_revenue": """
        SELECT coalesce(r_name, 'ALL') AS r_name,
               coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
               CAST(GROUPING(r_name, c_mktsegment) AS INT) AS gid,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, c_mktsegment)
        ORDER BY gid, r_name, c_mktsegment
    """,
    "q62_cube_order_counts": """
        SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus, o_orderpriority
    """,
}
