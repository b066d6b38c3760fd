package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for the round-13 keys (QueriesR18). */
object OracleR18 {
  val sql: ListMap[String, String] = ListMap(

    // Each version's content re-derived from orders directly:
    // version 5 = the first 6 of the 14 key%14 append slices,
    // version 13 (latest, read THROUGH the checkpoint) = all of them.
    "lake_log_checkpoint" ->
      """WITH base AS (SELECT o_orderkey AS key,
        |                o_orderstatus AS status
        |              FROM orders),
        |v AS (SELECT 5::BIGINT AS version, status FROM base
        |      WHERE key % 14 <= 5
        |      UNION ALL
        |      SELECT 13::BIGINT, status FROM base)
        |SELECT version, status, count(*) AS n
        |FROM v GROUP BY 1, 2 ORDER BY version, status""".stripMargin,
  )
}
