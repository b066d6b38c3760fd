package graft.engine

/** DuckDB oracles for the round-16 TPC-H completion wave (q2, q11,
  * q12, q16, q20 shapes — see QueriesR20). Same SQL as the Spark
  * side modulo dialect: `date_diff('day', a, b)` for `datediff(b,
  * a)`, and HUGEINT aggregates CAST back to BIGINT at the output.
  * The derived `ps` relation is spelled identically (exact bigint
  * quantity sums; MIN over IEEE divisions) so every comparison sits
  * on engine-independent values.
  */
object OracleR20 {

  private val psCte: String =
    """ps AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |             SUM(CAST(l_quantity AS BIGINT)) AS qty,
      |             MIN(l_extendedprice / l_quantity) AS cost
      |      FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  val sql: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      s"""WITH $psCte,
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE')
        |SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_brand,
        |       ps.cost AS supply_cost
        |FROM part p JOIN ps ON ps.partkey = p.p_partkey
        |JOIN eu s ON s.s_suppkey = ps.suppkey
        |WHERE p.p_size <= 5 AND p.p_type = 'ECONOMY'
        |  AND ps.cost = (SELECT MIN(ps2.cost)
        |                 FROM ps ps2 JOIN eu s2 ON s2.s_suppkey = ps2.suppkey
        |                 WHERE ps2.partkey = p.p_partkey)
        |ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $psCte,
        |gs AS (SELECT ps.partkey, ps.qty FROM ps
        |       JOIN supplier ON s_suppkey = ps.suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE')
        |SELECT partkey AS p_partkey, CAST(SUM(qty) AS BIGINT) AS stock_qty
        |FROM gs GROUP BY partkey
        |HAVING SUM(qty) > (SELECT SUM(qty) FROM gs) * 0.001
        |ORDER BY stock_qty DESC, p_partkey""".stripMargin,

    "q12_latency_priority" ->
      """SELECT ship_bucket,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 90
        |                    THEN 'DELAYED'
        |                  WHEN date_diff('day', o_orderdate, l_shipdate) >= 30
        |                    THEN 'SLOW'
        |                  ELSE 'FAST' END AS ship_bucket, o_orderpriority
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
        |GROUP BY ship_bucket ORDER BY ship_bucket""".stripMargin,

    "q16_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS partkey,
        |                   l_suppkey AS suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = partkey
        |WHERE p_brand <> 'Brand#17' AND p_type <> 'ECONOMY'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_excess_suppliers" ->
      s"""WITH $psCte
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND s_suppkey IN (
        |    SELECT ps.suppkey FROM ps
        |    WHERE ps.partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'red%')
        |      AND ps.qty > 2 * (SELECT SUM(CAST(l_quantity AS BIGINT))
        |                        FROM lineitem
        |                        WHERE l_partkey = ps.partkey
        |                          AND l_suppkey = ps.suppkey
        |                          AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |                          AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin
  )
}
