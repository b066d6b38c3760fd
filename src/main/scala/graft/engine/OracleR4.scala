package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-4 correlated-subquery keys. Same SQL
  * shape as the Spark side on purpose: the subquery formulations are
  * engine-portable, and the exactness tricks (integer-grid threshold,
  * decimal revenue accumulator) are spelled identically so both
  * engines compute on the same value grid. */
object OracleR4 {
  val sql: ListMap[String, String] = ListMap(
    "q17_small_qty_revenue" ->
      """SELECT p.p_brand,
        |       CAST(COUNT(*) AS BIGINT) AS n_small,
        |       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 10
        |  AND l.l_quantity * 5.0 *
        |        (SELECT COUNT(*) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)
        |      < (SELECT SUM(l2.l_quantity) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin,

    "q21_last_shipper" ->
      """SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 25""".stripMargin,
  )
}
