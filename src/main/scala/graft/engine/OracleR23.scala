package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-17 keys ([[QueriesR23]]). Each text
  * recomputes the key's answer straight from the raw corpus — a
  * rewrite that served a stale/mismatched summary, a pruned read that
  * dropped a surviving row, or a derivation that over-pruned would
  * hash-fail here. */
object OracleR23 {

  val sql: ListMap[String, String] = ListMap(

    // The star-join rollup WITH the extra group-column WHERE,
    // recomputed from the raw filtered join: if the containment
    // rewrite mis-applied (or mis-skipped) the extra predicate over
    // the summary, the values diverge.
    "mv_rewrite_extra_where" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Day buckets recomputed in the QUERY's spelling (timestamp-typed
    // date_trunc): the bridge must reproduce these exact values from
    // the date-spelled summary.
    "mv_rewrite_datebridge" ->
      """SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       max(o_custkey) AS cust_max
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // The sub-range aggregate recomputed from raw orders: an
    // implication match that mis-scoped the slice would hash-fail.
    "mv_rewrite_implied_range" ->
      """SELECT o_custkey, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders WHERE o_custkey < 500
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // The refreshed star summary must equal a from-scratch recompute
    // over the full join — any lost/double-counted delta row fails.
    "mv_rewrite_star_incremental" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // The MOR subtract view (status 'P' and returned keys tombstoned)
    // restricted to the predicate range — a pruned directory that
    // actually held a surviving in-range row would hash-fail.
    "lake_mor_pruned" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status
        |FROM orders
        |WHERE o_orderkey >= 256 AND o_orderkey < 1024
        |  AND o_orderstatus <> 'P'
        |  AND o_orderkey NOT IN (
        |    SELECT DISTINCT l_orderkey FROM lineitem
        |    WHERE l_returnflag = 'R')
        |ORDER BY key""".stripMargin,

    // Post-DELETE end state under the date predicate.
    "sql_delete_dates" ->
      """SELECT o_orderkey AS key, CAST(o_orderdate AS DATE) AS od,
        |       o_orderstatus AS status
        |FROM orders
        |WHERE NOT (CAST(o_orderdate AS DATE) < DATE '1996-01-01')
        |ORDER BY key""".stripMargin,

    // Post-DELETE end state under the timestamp bound.
    "sql_delete_timestamps" ->
      """SELECT o_orderkey AS key, o_orderdate AS ots,
        |       o_orderstatus AS status
        |FROM orders
        |WHERE NOT (o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |ORDER BY key""".stripMargin,

    // Post-DELETE end state under the OR-of-ranges predicate: rows in
    // the [2001, 11999] gap must SURVIVE (the union interval is scan
    // pruning only, never the delete predicate).
    "sql_delete_or_ranges" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status
        |FROM orders
        |WHERE NOT (o_orderkey BETWEEN 1000 AND 2000
        |           OR o_orderkey BETWEEN 12000 AND 12500)
        |ORDER BY key""".stripMargin
  )
}
