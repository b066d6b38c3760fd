package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 coverage wave: correlated subqueries — the one SQL planning
  * surface (scalar-subquery decorrelation, EXISTS/NOT EXISTS
  * predicate-subquery rewrite) the registry had not exercised. Both
  * keys go through `spark.sql` deliberately: the DSL has no scalar
  * subquery, and the point is to prove Catalyst's
  * RewriteCorrelatedScalarSubquery / RewritePredicateSubquery produce
  * the decorrelated join plans (PlanSpec asserts no per-row subplan
  * survives).
  */
object QueriesR4 {
  import Tables._

  /** TPC-H Q17 shape — "small-quantity" revenue: lineitems whose
    * quantity is below 0.2× the part's average quantity, revenue per
    * brand. The threshold is the classic correlated SCALAR subquery;
    * Catalyst decorrelates it into one aggregate over lineitem grouped
    * by l_partkey joined back to the probe side — at 100 TB that is
    * one map-side-combined agg + one shuffle join, never a per-row
    * rescan.
    *
    * Cross-engine exactness (§2.3): `q < 0.2*avg(q)` is restated as
    * `q * 5 * count < sum` — quantities are integral doubles (1..50),
    * so every term is an exact integer-valued double in ANY evaluation
    * order; the strict `<` can never sit on an engine-dependent
    * boundary, where `0.2*avg` (a rounded division) could. Two scalar
    * subqueries over the same correlated group also exercise
    * MergeScalarSubqueries. Revenue uses the repo's decimal-accumulator
    * idiom (4-decimal grid exact, order-proof). */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("q17_lineitem")
    part(s, d).createOrReplaceTempView("q17_part")
    s.sql("""
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_small,
             CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM q17_lineitem l JOIN q17_part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
        AND l.l_quantity * 5.0 *
              (SELECT COUNT(*) FROM q17_lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(l2.l_quantity) FROM q17_lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand
      ORDER BY p.p_brand""")
  }

  /** TPC-H Q21 shape — per supplier, lineitems that shipped LAST among
    * multi-supplier finished orders: a correlated EXISTS (another
    * supplier participated) AND a correlated NOT EXISTS (no other
    * supplier shipped strictly later). Catalyst rewrites the pair into
    * a left-semi and a left-anti join on l_orderkey with the
    * inequality as residual condition — both hash-joinable on the
    * order key at any scale (PlanSpec asserts no nested loop).
    * Deterministic: shipdate comparisons only; ties on max shipdate
    * qualify in both engines; (numwait DESC, s_name) is a total order
    * because s_name is unique. */
  def q21LastShipper(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("q21_lineitem")
    orders(s, d).createOrReplaceTempView("q21_orders")
    supplier(s, d).createOrReplaceTempView("q21_supplier")
    s.sql("""
      SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM q21_supplier s
      JOIN q21_lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM q21_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s.s_name
      LIMIT 25""")
  }
}
