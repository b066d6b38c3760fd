package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the events/streaming keys (QueriesEvents).
  * Spark `window(ts, len[, slide])` is epoch-aligned exactly like
  * DuckDB `time_bucket`; sliding windows are expanded via a 4-way
  * bucket shift. Sessionization is the identical gaps-and-islands SQL
  * on both sides (SURVEY.md §7.4-5).
  */
object OracleEvents {
  val sql: ListMap[String, String] = ListMap(
    "events_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS wstart,
        |       event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,

    "events_sliding" ->
      """SELECT wstart, event_type, count(*) AS cnt,
        |       round(sum(value), 4) AS sum_value
        |FROM (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |             - k.k * INTERVAL '15 minutes' AS wstart,
        |             event_type, value
        |      FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)) t
        |GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,

    "events_session" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS s_start, max(ts) AS s_end
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "events_watermark_late" ->
      """WITH w AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             max(CAST(ts AS TIMESTAMP)) OVER (ORDER BY event_id
        |               ROWS UNBOUNDED PRECEDING) AS wm
        |           FROM events)
        |SELECT event_id, user_id, ts, wm FROM w
        |WHERE ts >= wm - INTERVAL '10 minutes'
        |ORDER BY event_id""".stripMargin,

    "events_watermark_late_perkey" ->
      """WITH w AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             max(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |               ORDER BY event_id
        |               ROWS UNBOUNDED PRECEDING) AS wm
        |           FROM events)
        |SELECT event_id, user_id, ts, wm FROM w
        |WHERE ts >= wm - INTERVAL '10 minutes'
        |ORDER BY event_id""".stripMargin,

    "events_stateful_dedup" ->
      """SELECT event_id, user_id, event_type, ts FROM (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "events_json_props" ->
      """SELECT CAST(props->>'k' AS INT) // 10 AS k_bucket,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,
  )
}
