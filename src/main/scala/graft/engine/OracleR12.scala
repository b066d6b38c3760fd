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
