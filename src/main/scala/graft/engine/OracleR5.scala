package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-4 wave-2 keys. Subquery/CTE keys keep
  * the same SQL shape as the Spark side (the formulations are
  * engine-portable); the corpus keys re-derive spans/samples from
  * first principles with DuckDB list idioms (the docs_chunk_windows
  * precedent). Exactness: decimal accumulators, quotient-then-round,
  * md5 hex thresholds compared as lowercase strings. */
object OracleR5 {
  val sql: ListMap[String, String] = ListMap(
    "q14_promo_ratio" ->
      """WITH j AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |         p.p_type,
        |         CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |              AS DECIMAL(18,4)) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT month,
        |  CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN rev END),
        |                0) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  round(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN rev END),
        |                      0) AS DOUBLE) * 100.0
        |        / CAST(SUM(rev) AS DOUBLE), 6) AS promo_pct
        |FROM j GROUP BY month ORDER BY month""".stripMargin,

    "q19_disjunctive_pred" ->
      """SELECT p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 5 AND 25)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 10 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_notin_nullaware" ->
      """SELECT c_mktsegment,
        |       CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_nationkey NOT IN
        |      (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "join_lateral_topk" ->
      """SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 3) t
        |ORDER BY n.n_name, c_acctbal DESC, t.c_name""".stripMargin,

    "subquery_select_scalar" ->
      """SELECT c.c_custkey,
        |  CAST((SELECT COUNT(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        |  CAST(COALESCE((SELECT SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |                 FROM orders o
        |                 WHERE o.o_custkey = c.c_custkey), 0) AS DOUBLE)
        |    AS total_spend
        |FROM customer c
        |WHERE c.c_custkey % 7 = 0
        |ORDER BY c.c_custkey""".stripMargin,

    "cte_recursive_months" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        |  WHERE m < DATE '2001-08-01'
        |),
        |agg AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |         COUNT(*) AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |  FROM orders GROUP BY 1
        |)
        |SELECT CAST(m AS DATE) AS month,
        |       CAST(COALESCE(n, 0) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(tot, 0) AS DOUBLE) AS total_price
        |FROM months LEFT JOIN agg ON CAST(m AS DATE) = mon
        |ORDER BY month""".stripMargin,

    "docs_span_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |sp AS (SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS span_idx,
        |         array_to_string(w[i : i + 9], ' ') AS span
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, 10)) AS i
        |             FROM tok) t),
        |k AS (SELECT doc_id, span_idx, span,
        |        row_number() OVER (PARTITION BY span
        |                           ORDER BY doc_id, span_idx) AS rn
        |      FROM sp)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN span END, ' '
        |                      ORDER BY span_idx), '') AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "docs_token_budget_mix" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tokens) AS tok_total,
        |               COUNT(*) AS n_docs
        |        FROM tok GROUP BY source),
        |tgt AS (SELECT MIN(tok_total) AS tok_target FROM tot),
        |rates AS (
        |  SELECT source, n_docs, tok_total,
        |         round(CAST(tok_target AS DOUBLE)
        |               / CAST(tok_total AS DOUBLE), 6) AS rate
        |  FROM tot, tgt),
        |flags AS (
        |  SELECT t.source, t.n_tokens, r.n_docs, r.tok_total, r.rate,
        |         (r.rate >= 1.0 OR
        |          substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) <
        |          lower(lpad(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)),
        |                     8, '0'))) AS keep
        |  FROM tok t JOIN rates r USING (source))
        |SELECT source,
        |  CAST(MIN(n_docs) AS BIGINT) AS n_docs,
        |  CAST(MIN(tok_total) AS BIGINT) AS tok_total,
        |  MIN(rate) AS rate,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
        |    AS tokens_kept
        |FROM flags GROUP BY source ORDER BY source""".stripMargin,
  )
}
