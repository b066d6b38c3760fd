package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for the round-16 SQL-write-surface keys
  * ([[QueriesR22]]). Each text reconstructs the POST-DML end state of
  * the key's script relationally from the raw corpus — the oracle
  * proves WHAT the routed statements computed; SqlDmlSpec proves HOW
  * (clause splitting, loud rejections, surgical reports). */
object OracleR22 {

  val sql: ListMap[String, String] = ListMap(

    // CTAS over keys < 20000 then INSERT of the rest = all orders.
    "sql_ctas_insert" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status,
        |       o_custkey AS cust
        |FROM orders ORDER BY key""".stripMargin,

    "sql_delete_where" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status,
        |       o_custkey AS cust
        |FROM orders
        |WHERE NOT (o_orderstatus = 'O' AND o_orderkey % 7 = 3)
        |ORDER BY key""".stripMargin,

    "sql_update_set" ->
      """SELECT o_orderkey AS key,
        |  CASE WHEN o_orderstatus = 'P' AND o_orderkey % 5 = 1
        |       THEN o_orderstatus || '_u' ELSE o_orderstatus END AS status,
        |  CASE WHEN o_orderstatus = 'P' AND o_orderkey % 5 = 1
        |       THEN o_custkey + 500000 ELSE o_custkey END AS cust
        |FROM orders
        |ORDER BY key""".stripMargin,

    // Upsert-all merge: matched keys take the source status, unmatched
    // source keys insert. The shifted (+2*10^8) keys are disjoint from
    // every o_orderkey, so they are exactly the insert leg.
    "sql_merge_using" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status FROM orders),
        |src AS (
        |  SELECT DISTINCT l_orderkey AS key, 'R' AS status
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_orderkey < 30000
        |  UNION ALL
        |  SELECT DISTINCT l_orderkey + 200000000 AS key, 'Z' AS status
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_orderkey < 3000)
        |SELECT coalesce(t.key, s.key) AS key,
        |       coalesce(s.status, t.status) AS status
        |FROM target t FULL OUTER JOIN src s ON t.key = s.key
        |ORDER BY key""".stripMargin,

    // v0 = CTAS (< 20000), v1 = + the rest, v2 = post-DELETE.
    "sql_time_travel" ->
      """WITH base AS (SELECT o_orderkey AS key FROM orders)
        |SELECT 'v0' AS snap, count(*) AS n,
        |       CAST(sum(key) AS BIGINT) AS key_sum
        |FROM base WHERE key < 20000
        |UNION ALL
        |SELECT 'v1' AS snap, count(*) AS n,
        |       CAST(sum(key) AS BIGINT) AS key_sum FROM base
        |UNION ALL
        |SELECT 'v2' AS snap, count(*) AS n,
        |       CAST(sum(key) AS BIGINT) AS key_sum
        |FROM base WHERE key % 11 <> 5
        |ORDER BY snap""".stripMargin,

    // If the MV rollup rewrite mis-derives any partial, this direct
    // recompute from raw orders hash-fails it.
    "mv_rewrite_rollup" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       max(o_custkey) AS cust_max
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // The refreshed MV must equal a from-scratch recompute over the
    // full corpus — any lost/double-counted delta row hash-fails.
    "mv_rewrite_incremental" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       min(o_custkey) AS cust_min
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // CTAS(<20000) + INSERT(rest) = all orders; the final aggregate
    // (post-REFRESH, served from the MV) must equal the raw recompute.
    "sql_create_mv" ->
      """SELECT o_orderstatus AS st, count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       max(o_custkey) AS cust_max
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY st""".stripMargin,

    // Month buckets recomputed from raw orders: a mis-matched or
    // mis-folded derived-expression MV hash-fails.
    "mv_rewrite_timebucket" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |       count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       max(o_custkey) AS cust_max
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // Segment rollup recomputed from the raw join: a join-base MV
    // that mis-matched or mis-aggregated hash-fails.
    "mv_rewrite_starjoin" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Layout maintenance is content-neutral: post OPTIMIZE + VACUUM
    // the table still reads as the raw relation.
    "sql_optimize_vacuum" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status,
        |       o_custkey AS cust
        |FROM orders ORDER BY key""".stripMargin
  )
}
