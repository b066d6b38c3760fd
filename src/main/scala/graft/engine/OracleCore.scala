package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB-runnable ANSI SQL oracles for the wave-1 keys (QueriesCore).
  * Every string aliases output columns to the exact names the Spark
  * plan emits and applies identical rounding / null-ordering
  * (SURVEY.md §2.3 rules 1–7).
  */
object OracleCore {
  val sql: ListMap[String, String] = ListMap(
    "scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "scan_events_ns" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "source_param_table" ->
      """SELECT p.min_qty, p.seg, count(*) AS cnt,
        |       round(sum(l.l_extendedprice), 4) AS total_price
        |FROM (SELECT CAST(30.0 AS DOUBLE) AS min_qty, 'BUILDING' AS seg) p
        |CROSS JOIN lineitem l
        |WHERE l.l_quantity > p.min_qty
        |GROUP BY p.min_qty, p.seg
        |ORDER BY p.seg""".stripMargin,

    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_tax
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 23:59:59.999'
        |  AND NOT (l_discount < 0.02 OR l_tax > 0.06)
        |  AND nullif(l_linestatus, 'O') IS NOT DISTINCT FROM 'F'
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_discount, l_tax""".stripMargin,

    "project_expressions" ->
      """SELECT o_orderkey,
        |  round((o_totalprice * CAST(1.1 AS DOUBLE) + CAST(5.0 AS DOUBLE))
        |        / CAST(2.0 AS DOUBLE), 4) AS arith,
        |  CASE WHEN o_orderstatus = 'F' THEN 'done'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'other' END AS status_word,
        |  coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW!') AS prio,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q3_top_unshipped" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_multiway_join" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "join_left_right_full" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100),
        |     o AS (SELECT o_orderkey, o_custkey FROM orders
        |           WHERE o_custkey BETWEEN 50 AND 150 AND o_orderstatus = 'F')
        |SELECT 'L' AS jtype, c_custkey, o_orderkey
        |  FROM c LEFT JOIN o ON c_custkey = o_custkey
        |UNION ALL
        |SELECT 'R' AS jtype, c_custkey, o_orderkey
        |  FROM c RIGHT JOIN o ON c_custkey = o_custkey
        |UNION ALL
        |SELECT 'F' AS jtype, c_custkey, o_orderkey
        |  FROM c FULL JOIN o ON c_custkey = o_custkey
        |ORDER BY jtype, c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "join_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_acctbal > 0
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "join_cross_limited" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_having_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       round(sum(DISTINCT l_quantity), 4) AS sumd_qty,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |HAVING count(*) > 100
        |ORDER BY l_returnflag""".stripMargin,

    "distinct_exact" ->
      "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem",

    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 4) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "window_rank_frame" ->
      """SELECT o_custkey, o_orderkey, rn, mv_sum FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey
        |                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mv_sum
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 2
        |ORDER BY o_custkey, rk""".stripMargin,

    "sort_multikey_nulls" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey""".stripMargin,

    "limit_offset_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25 OFFSET 5""".stripMargin,

    "setop_union" ->
      """SELECT o_orderkey, count(*) AS appearances FROM (
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
        |) u GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "setop_intersect_except" ->
      """WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     woa AS (SELECT o_custkey AS k FROM orders),
        |     hb AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'intersect' AS op, k FROM (SELECT k FROM wo INTERSECT SELECT k FROM hb) a
        |UNION ALL
        |SELECT 'except' AS op, k FROM (SELECT k FROM wo EXCEPT SELECT k FROM hb) b
        |UNION ALL
        |SELECT 'except_all' AS op, k FROM (SELECT k FROM woa EXCEPT ALL SELECT k FROM hb) c
        |ORDER BY op, k""".stripMargin,
  )
}
