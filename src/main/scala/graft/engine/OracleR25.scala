package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-19 keys ([[QueriesR25]]). Each text
  * recomputes the key's answer straight from the raw corpus. */
object OracleR25 {

  val sql: ListMap[String, String] = ListMap(

    // The LEFT join recomputed raw (the even-key dim re-derived in
    // SQL): a serve that dropped the null-extended rows — i.e.
    // treated the outer join as inner — would lose every odd-key
    // order and hash-fail.
    "mv_rewrite_left_star" ->
      """SELECT o_orderstatus AS status, c_mktsegment AS segment,
        |       count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders LEFT JOIN
        |     (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_custkey % 2 = 0) d
        |  ON o_custkey = c_custkey
        |GROUP BY status, segment ORDER BY status, segment""".stripMargin,

    // The filtered join recomputed raw: statistics may only change
    // the PLAN — any row lost or duplicated by the cost-informed
    // physical choice would hash-fail here.
    "lake_cbo_filtered_join" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY segment ORDER BY segment""".stripMargin,

    // The decimal average recomputed via EXACT integer arithmetic:
    // sum as integer cents (decimal sums are exact in both engines),
    // then half-up rounding of the exact rational mean at micro
    // grain — (2·num + den) // (2·den) for the positive numerator —
    // which is precisely the rounding Spark's decimal AVG applies at
    // scale 6. A rollup that divided from a wider operand (rounding
    // the quotient at a different digit) would miss by one micro.
    // The OR recomputed raw in the query's own spelling: a
    // containment decision that let a branch outside the IN-slice
    // serve (or dropped a branch's rows) would hash-fail.
    "mv_rewrite_or_filters" ->
      """SELECT o_orderpriority AS prio, o_orderstatus AS status,
        |       count(*) AS n,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       max(o_custkey) AS cust_max
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |GROUP BY prio, status ORDER BY prio, status""".stripMargin,

    "mv_rewrite_avg_decimal" ->
      """WITH t AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(CAST(o_orderkey % 1000 AS VARCHAR) || '.' ||
        |              lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')
        |              AS DECIMAL(12,2)) AS v
        |  FROM orders)
        |SELECT status, count(*) AS n,
        |       CAST((2 * CAST(sum(v) * 100 AS HUGEINT) * 10000
        |             + count(v)) // (2 * count(v)) AS BIGINT)
        |         AS avg_micros,
        |       CAST(sum(v) * 100 AS BIGINT) AS sum_cents,
        |       CAST(max(v) * 100 AS BIGINT) AS max_cents
        |FROM t GROUP BY status ORDER BY status""".stripMargin
  )
}
