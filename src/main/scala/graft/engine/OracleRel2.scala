package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the wave-2 relational keys (QueriesRel2).
  * `distinct_approx` is intentionally absent (no-oracle: sketch values
  * are engine-specific; scalatest bounds it to ±5% of exact).
  */
object OracleRel2 {
  val sql: ListMap[String, String] = ListMap(
    // Round-trip sinks must reproduce the source table exactly.
    "scan_multiformat" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "scan_orc_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "join_theta_range" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate,
        |       round(l_extendedprice / o_totalprice, 6) AS price_ratio
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate - INTERVAL 30 DAY
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |  AND l_extendedprice / o_totalprice
        |      BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.5 AS DOUBLE)
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, price_ratio""".stripMargin,

    "join_asof" ->
      """WITH o AS (SELECT o_custkey AS uid, o_orderdate AS t,
        |                  max(o_orderkey) AS ok
        |           FROM orders GROUP BY 1, 2),
        |     e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |     m AS (SELECT e.event_id, e.user_id, e.ts,
        |                  (SELECT max(o.t) FROM o
        |                   WHERE o.uid = e.user_id AND o.t <= e.ts) AS mt
        |           FROM e)
        |SELECT m.event_id, m.user_id, m.ts, o.ok AS matched_orderkey
        |FROM m LEFT JOIN o ON o.uid = m.user_id AND o.t = m.mt
        |ORDER BY event_id""".stripMargin,

    "param_grid_cross" ->
      """SELECT g.min_qty, g.max_disc, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |         AS revenue
        |FROM (SELECT CAST(q AS DOUBLE) AS min_qty, CAST(dd AS DOUBLE) AS max_disc
        |      FROM (VALUES (10.0), (25.0), (40.0)) qs(q)
        |      CROSS JOIN (VALUES (0.02), (0.04), (0.06), (0.08)) ds(dd)) g
        |CROSS JOIN lineitem
        |WHERE l_quantity > g.min_qty AND l_discount <= g.max_disc
        |GROUP BY g.min_qty, g.max_disc
        |ORDER BY g.min_qty, g.max_disc""".stripMargin,

    "agg_cube_gsets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 4) AS total,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey,
        |       array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
        |         AS order_keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "window_ranking_matrix" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  rank()         OVER w AS rnk,
        |  dense_rank()   OVER w AS drnk,
        |  ntile(4)       OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist()    OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rnk""".stripMargin,

    "window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1, CAST(-1.0 AS DOUBLE))  OVER wo AS prev_price,
        |  lead(o_totalprice, 1, CAST(-1.0 AS DOUBLE)) OVER wo AS next_price,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey)  OVER wf AS last_key,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key
        |FROM orders
        |WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, dnum,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY dnum
        |          RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 4) AS run_rev
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dnum
        |      FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
