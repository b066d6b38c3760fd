package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-18 keys ([[QueriesR24]]). Each text
  * recomputes the key's answer straight from the raw corpus — a
  * subset serve that lost or duplicated fact rows through the
  * dropped dimension, a cast implication that mis-scoped the slice,
  * or an AVG rollup that diverged from the direct aggregate would
  * hash-fail here. */
object OracleR24 {

  val sql: ListMap[String, String] = ListMap(

    // The SUBSET join recomputed raw: the MV summarized the 3-table
    // star, the query joined only orders ⋈ customer — served exactly
    // iff the dropped nation join was multiplicity-preserving.
    "mv_rewrite_join_subset" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // The sub-bound recomputed raw in the QUERY's spelling (a DATE
    // bound over the timestamp column): a cast implication that
    // mis-placed the midnight boundary would hash-fail on the
    // boundary day's rows.
    "mv_rewrite_implied_cast" ->
      """SELECT o_orderdate AS od, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(o_orderkey) AS key_max
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) <= DATE '1996-06-15'
        |GROUP BY od ORDER BY od""".stripMargin,

    // The averages recomputed raw: both engines divide exact integer
    // sums by exact counts, so a rollup that summed the wrong partial
    // (or dropped a group's rows) diverges bit-for-bit.
    "mv_rewrite_avg_int" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        |       avg(o_orderkey) AS key_avg,
        |       max(o_orderkey) AS key_max
        |FROM orders GROUP BY status ORDER BY status""".stripMargin,

    // All five aggregates recomputed raw: a distinct count that
    // re-counted duplicated combinations, a mis-weighted null-aware
    // count, or a key min/max off the summary would hash-fail.
    "mv_rewrite_count_distinct" ->
      """SELECT o_orderstatus AS status,
        |       count(DISTINCT o_custkey) AS custs,
        |       count(o_custkey) AS n_cust,
        |       min(o_custkey) AS cust_min,
        |       max(o_custkey) AS cust_max,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY status ORDER BY status""".stripMargin,

    // The subtract view under the read predicate: keys below 256 are
    // tombstoned (the [768, 1024) tombstone lies wholly outside the
    // predicate and must change nothing whether scanned or skipped) —
    // a skip that dropped a masking tombstone, or a prune that
    // skipped a masking one, would hash-fail.
    "lake_mor_tombstone_pruned" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status
        |FROM orders
        |WHERE o_orderkey < 512 AND o_orderkey >= 256
        |ORDER BY key""".stripMargin
  )
}
