package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-9 keys. OHLC's open/close are
  * re-derived with ORDER BY inside array_agg (DuckDB's ordered
  * aggregation) — same total order (ts, event_id) as the Spark
  * struct-min spelling, unique event_id tiebreak, so both engines
  * pick the identical boundary rows; sum rides the shared
  * DECIMAL(28,9) grid. The transition matrix restates the lead()
  * derivation verbatim.
  */
object OracleR12 {
  val sql: ListMap[String, String] = ListMap(
    "events_ohlc" ->
      """SELECT event_type,
        |       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |       (array_agg(value ORDER BY ts, event_id))[1] AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       (array_agg(value ORDER BY ts DESC, event_id DESC))[1] AS close,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE)
        |         AS sum_value
        |FROM events
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "docs_dedup_incremental" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, tokens,
        |          unnest(range(1, len(tokens) - 3)) AS i FROM tok) t1) t2),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT id1, id2,
        |    round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 6) AS jaccard
        |  FROM inter
        |  JOIN sz s1 ON s1.doc_id = id1
        |  JOIN sz s2 ON s2.doc_id = id2
        |  WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8
        |    AND (id1 % 3 = 0 OR id2 % 3 = 0))
        |SELECT CASE WHEN id1 % 3 = 0 AND id2 % 3 <> 0 THEN id1
        |            WHEN id2 % 3 = 0 AND id1 % 3 <> 0 THEN id2
        |            ELSE id2 END AS doc_id,
        |       CASE WHEN id1 % 3 = 0 AND id2 % 3 <> 0 THEN id2
        |            WHEN id2 % 3 = 0 AND id1 % 3 <> 0 THEN id1
        |            ELSE id1 END AS match_id,
        |       CASE WHEN id1 % 3 = 0 AND id2 % 3 = 0 THEN 'delta'
        |            ELSE 'base' END AS match_src,
        |       jaccard
        |FROM pairs
        |ORDER BY doc_id, match_src, match_id""".stripMargin,

    "events_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tr AS (
        |  SELECT cur, nxt, count(*) AS n
        |  FROM seq WHERE nxt IS NOT NULL
        |  GROUP BY cur, nxt)
        |SELECT cur, nxt, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6)
        |         AS p
        |FROM tr
        |ORDER BY cur, nxt""".stripMargin
  )
}
