package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-4 wave-4 keys. try_* maps to the
  * portable spellings (CASE-guarded division, TRY_CAST, literal NULL
  * for the overflow case DuckDB would raise on); null-safe equality
  * is IS NOT DISTINCT FROM. */
object OracleR7 {
  val sql: ListMap[String, String] = ListMap(
    "join_nullsafe_eq" ->
      """SELECT nullif(c.c_nationkey, 3) AS nkey,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |         AS bal_sum
        |FROM customer c JOIN supplier s
        |  ON nullif(c.c_nationkey, 3) IS NOT DISTINCT FROM
        |     nullif(s.s_nationkey, 3)
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "fn_try_arith" ->
      """SELECT o_orderkey,
        |  round(CASE WHEN year(o_orderdate) = 1997 THEN NULL
        |             ELSE o_totalprice / (year(o_orderdate) - 1997) END, 6)
        |    AS td,
        |  TRY_CAST(o_orderpriority AS INT) AS tc,
        |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807
        |       ELSE CAST(NULL AS BIGINT) END AS ta,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS tp
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q9_product_profit" ->
      """SELECT n.n_name AS supp_nation,
        |       year(o.o_orderdate) AS o_year,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |                     AS DECIMAL(18,4))
        |              - CAST(round(p.p_retailprice * l.l_quantity, 2)
        |                     AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p     ON l.l_partkey = p.p_partkey
        |               AND p.p_name LIKE '%rod%'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n   ON s.s_nationkey = n.n_nationkey
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dq_constraints" ->
      """WITH li AS (
        |  SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |           AS pk_dup,
        |         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |           AS null_ship,
        |         SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
        |                  THEN 1 ELSE 0 END) AS bad_disc
        |  FROM lineitem),
        |ord AS (
        |  SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
        |         SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
        |           AS bad_price
        |  FROM orders),
        |fko AS (SELECT COUNT(*) AS v FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                          WHERE c.c_custkey = o.o_custkey)),
        |fkl AS (SELECT COUNT(*) AS v FROM lineitem l
        |        WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                          WHERE o.o_orderkey = l.l_orderkey)),
        |rows_ AS (
        |  SELECT 'lineitem.pk_unique' AS check_name,
        |         CAST(pk_dup AS BIGINT) AS violations FROM li
        |  UNION ALL SELECT 'lineitem.shipdate_not_null',
        |         CAST(null_ship AS BIGINT) FROM li
        |  UNION ALL SELECT 'lineitem.discount_in_0_1',
        |         CAST(bad_disc AS BIGINT) FROM li
        |  UNION ALL SELECT 'orders.pk_unique',
        |         CAST(pk_dup AS BIGINT) FROM ord
        |  UNION ALL SELECT 'orders.totalprice_positive',
        |         CAST(bad_price AS BIGINT) FROM ord
        |  UNION ALL SELECT 'orders.custkey_fk_customer',
        |         CAST(v AS BIGINT) FROM fko
        |  UNION ALL SELECT 'lineitem.orderkey_fk_orders',
        |         CAST(v AS BIGINT) FROM fkl)
        |SELECT check_name, violations, violations = 0 AS pass
        |FROM rows_ ORDER BY check_name""".stripMargin,

    "events_distinct_users" ->
      """SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS wstart,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events
        |GROUP BY wstart ORDER BY wstart""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate >= TIMESTAMP '1997-02-01 00:00:00')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(round(l_extendedprice * l_discount, 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24.0""".stripMargin,

    "window_interval_range" ->
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  round(SUM(value) OVER w, 4) AS v_1h
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
        |                   AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Same exact-Jaccard pair derivation + transitive closure as the
    // docs_dedup_cc oracle (the MinHash-LSH pipeline is verified
    // recall-complete on this corpus), extended to singleton-inclusive
    // cluster sizes.
    "docs_dedup_weights" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
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
        |pairs AS (SELECT id1, id2 FROM inter
        |          JOIN sz s1 ON s1.doc_id = id1
        |          JOIN sz s2 ON s2.doc_id = id2
        |          WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8),
        |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        |),
        |cc AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        |       FROM reach GROUP BY u),
        |m AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        |      FROM documents d LEFT JOIN cc c USING (doc_id))
        |SELECT cluster_id AS survivor_id,
        |       CAST(COUNT(*) AS BIGINT) AS cluster_size,
        |       CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
        |FROM m GROUP BY cluster_id ORDER BY survivor_id""".stripMargin,

    "docs_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT t FROM (
        |    SELECT t, COUNT(*) AS c,
        |           row_number() OVER (ORDER BY COUNT(*) DESC, t) AS rn
        |    FROM tok GROUP BY t) v
        |  WHERE rn <= 64)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS oov_rate
        |FROM tok LEFT JOIN vocab v USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
