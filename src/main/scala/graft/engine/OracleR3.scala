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

    "docs_chunk_windows" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |ch AS (SELECT doc_id, i,
        |         CAST((i - 1) // 24 AS INT) AS chunk_idx,
        |         tokens[i : i + 31] AS ctoks
        |       FROM (SELECT doc_id, tokens,
        |               unnest(range(1, greatest(len(tokens) - 31, 1) + 1, 24))
        |                 AS i
        |             FROM tok) t)
        |SELECT doc_id, chunk_idx, i AS start_tok,
        |       CAST(len(ctoks) AS BIGINT) AS n_tokens,
        |       substr(md5(array_to_string(ctoks, ' ')), 1, 16) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "docs_contamination" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         array_to_string(tokens[i : i + 7], ' ') AS shingle
        |       FROM (SELECT doc_id, tokens,
        |               unnest(range(1, len(tokens) - 6)) AS i
        |             FROM tok WHERE len(tokens) >= 8) t),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
        |SELECT doc_id, count(*) AS n_shingles,
        |       count(b.shingle) AS n_hit,
        |       round(CAST(count(b.shingle) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS contamination
        |FROM (SELECT * FROM sh WHERE doc_id % 50 <> 0) s
        |LEFT JOIN bench b ON s.shingle = b.shingle
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "docs_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(1, len(tokens) - 1),
        |          i -> array_to_string(tokens[i : i + 2], ' ')) AS grams
        |      FROM tok WHERE len(tokens) >= 3)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |             / CAST(len(grams) AS DOUBLE), 6) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "docs_source_mix" ->
      """SELECT source, count(*) AS n_docs,
        |       round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
        |       count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "scan_schema_evolution" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |       count(o_totalprice) AS n_with_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "events_session_native" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM m)
        |SELECT user_id, min(ts) AS s_start,
        |       max(ts) + INTERVAL '30 minutes' AS s_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, s_start""".stripMargin,

    "events_topk_per_window" ->
      """WITH per AS (
        |  SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP))
        |           AS wstart,
        |         user_id, round(sum(value), 4) AS sv
        |  FROM events GROUP BY wstart, user_id),
        |r AS (SELECT wstart, user_id, sv,
        |        row_number() OVER (PARTITION BY wstart
        |                           ORDER BY sv DESC, user_id) AS rk
        |      FROM per)
        |SELECT wstart, rk, user_id, sv AS total_value
        |FROM r WHERE rk <= 3 ORDER BY wstart, rk""".stripMargin,

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
