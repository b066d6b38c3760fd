package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for the round-12 keys (QueriesR17). */
object OracleR17 {
  val sql: ListMap[String, String] = ListMap(

    // The sql_* keys run through graft.Sql (spark.sql over registered
    // views); the oracles restate the same relational content in
    // DuckDB's dialect — hash equality proves the SQL front door
    // compiles to the same results as the engine's DSL path.
    "sql_join_revenue" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(o_orderdate AS DATE)
        |      BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "sql_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders WHERE o_custkey <= 200) t
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,

    "sql_lateral_tokens" ->
      """SELECT doc_id, i AS pos, tokens[i] AS tok
        |FROM (SELECT doc_id, tokens,
        |        unnest(range(1, len(tokens) + 1)) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tokens
        |            FROM documents WHERE doc_id < 50) t1) t2
        |ORDER BY doc_id, pos""".stripMargin,

    // The 3-D file-grain Z-order layout changes what is SCANNED,
    // never what is returned — the oracle is the plain box aggregate.
    "lake_zorder_files" ->
      """SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
        |    AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      BETWEEN '1994-01-01' AND '1995-12-31'
        |  AND o_custkey BETWEEN 1 AND 750
        |  AND CAST(round(o_totalprice, 2) AS DOUBLE)
        |      BETWEEN 50000 AND 150000
        |GROUP BY 1 ORDER BY month""".stripMargin,
  )
}
