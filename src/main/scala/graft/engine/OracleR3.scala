package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-3 coverage wave. The oracles spell the
  * PLAIN formulation (un-binned range join, un-salted join) — equality
  * with the engine's binned/salted plans is exactly what the keys
  * demonstrate. */
object OracleR3 {
  val sql: ListMap[String, String] = ListMap(
    "join_range_binned" ->
      """WITH od AS (SELECT DISTINCT o_orderdate FROM orders),
        |     sd AS (SELECT l_shipdate, count(*) AS n
        |            FROM lineitem GROUP BY l_shipdate)
        |SELECT od.o_orderdate, CAST(sum(sd.n) AS BIGINT) AS n_shipped
        |FROM od JOIN sd
        |  ON abs(date_diff('day', od.o_orderdate, sd.l_shipdate)) <= 3
        |GROUP BY od.o_orderdate ORDER BY od.o_orderdate""".stripMargin,

    "join_skew_salted" ->
      """WITH dim AS (SELECT event_type, round(avg(value), 6) AS avg_value
        |             FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS cnt,
        |       round(sum(e.value), 4) AS sum_above
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |WHERE e.value > dim.avg_value
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING sum(l_quantity) > 150)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "emb_random_projection" ->
      """WITH planes AS (
        |  SELECT a.p, b.j,
        |    (CAST(('0x' || substr(md5(a.p || '_' || b.j), 1, 8))::BIGINT
        |          % 2001 AS DOUBLE) - 1000.0) / 1000.0 AS h
        |  FROM (SELECT unnest(range(0, 8)) AS p) a,
        |       (SELECT unnest(range(1, 65)) AS j) b),
        |pe AS (SELECT vec_id, i AS j, CAST(embedding[i] AS DOUBLE) AS x
        |       FROM (SELECT vec_id, embedding,
        |               unnest(range(1, len(embedding) + 1)) AS i
        |             FROM embeddings) t)
        |SELECT pe.vec_id,
        |  round(sum(CASE WHEN planes.p = 0 THEN pe.x * planes.h END), 6) AS p0,
        |  round(sum(CASE WHEN planes.p = 1 THEN pe.x * planes.h END), 6) AS p1,
        |  round(sum(CASE WHEN planes.p = 2 THEN pe.x * planes.h END), 6) AS p2,
        |  round(sum(CASE WHEN planes.p = 3 THEN pe.x * planes.h END), 6) AS p3,
        |  round(sum(CASE WHEN planes.p = 4 THEN pe.x * planes.h END), 6) AS p4,
        |  round(sum(CASE WHEN planes.p = 5 THEN pe.x * planes.h END), 6) AS p5,
        |  round(sum(CASE WHEN planes.p = 6 THEN pe.x * planes.h END), 6) AS p6,
        |  round(sum(CASE WHEN planes.p = 7 THEN pe.x * planes.h END), 6) AS p7
        |FROM pe JOIN planes ON pe.j = planes.j
        |GROUP BY pe.vec_id ORDER BY pe.vec_id""".stripMargin,
  )
}
