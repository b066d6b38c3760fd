package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-4 correlated-subquery keys. Same SQL
  * shape as the Spark side on purpose: the subquery formulations are
  * engine-portable, and the exactness tricks (integer-grid threshold,
  * decimal revenue accumulator) are spelled identically so both
  * engines compute on the same value grid. */
object OracleR4 {
  val sql: ListMap[String, String] = ListMap(
    "q17_small_qty_revenue" ->
      """SELECT p.p_brand,
        |       CAST(COUNT(*) AS BIGINT) AS n_small,
        |       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 10
        |  AND l.l_quantity * 5.0 *
        |        (SELECT COUNT(*) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)
        |      < (SELECT SUM(l2.l_quantity) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin,

    "q21_last_shipper" ->
      """SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 25""".stripMargin,

    "q22_idle_balance" ->
      """SELECT c_custkey % 10 AS cc,
        |       CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > 0.0
        |  AND CAST(c_acctbal AS DECIMAL(12,2)) *
        |        (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
        |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2)))
        |         FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_custkey % 10
        |ORDER BY cc""".stripMargin,

    "docs_pack_sequences" ->
      """SELECT doc_id, source, n_tokens,
        |       running - n_tokens AS start_pos,
        |       CAST(floor((running - n_tokens) / 512) AS BIGINT) AS seq_first,
        |       CAST(floor((running - 1) / 512) AS BIGINT) AS seq_last
        |FROM (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |        CAST(sum(len(string_split(text, ' ')))
        |          OVER (PARTITION BY source ORDER BY doc_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    // The oracle unrolls the same three damped power iterations with
    // the same 6-dp rounding per iteration (the kmeans-oracle
    // precedent: identical rounded inputs each round keep both
    // engines on the same value grid).
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_suppkey AS sup, o_custkey + 1000000 AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT sup AS src, cust AS dst FROM pairs
        |  UNION ALL
        |  SELECT cust AS src, sup AS dst FROM pairs),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT src AS node_id, 1.0 AS rank FROM deg),
        |r1 AS (SELECT e.dst AS node_id,
        |              round(0.15 + 0.85 * sum(r.rank / d.outdeg), 6) AS rank
        |       FROM edges e JOIN r0 r ON e.src = r.node_id
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node_id,
        |              round(0.15 + 0.85 * sum(r.rank / d.outdeg), 6) AS rank
        |       FROM edges e JOIN r1 r ON e.src = r.node_id
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node_id,
        |              round(0.15 + 0.85 * sum(r.rank / d.outdeg), 6) AS rank
        |       FROM edges e JOIN r2 r ON e.src = r.node_id
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst)
        |SELECT d.src AS node_id, CAST(d.outdeg AS BIGINT) AS degree, r3.rank
        |FROM deg d JOIN r3 ON d.src = r3.node_id
        |ORDER BY node_id""".stripMargin,

    "merge_upsert_scd1" ->
      """WITH returned AS (
        |  SELECT l_orderkey, count(*) AS n_returned
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
        |upd AS (
        |  SELECT l_orderkey AS key, 'R' AS new_status, n_returned
        |  FROM returned
        |  UNION ALL
        |  SELECT l_orderkey + 100000000 AS key, 'N' AS new_status, n_returned
        |  FROM returned WHERE l_orderkey % 50 = 0),
        |tgt AS (SELECT o_orderkey AS key, o_orderstatus FROM orders)
        |SELECT COALESCE(t.key, u.key) AS key,
        |       COALESCE(u.new_status, t.o_orderstatus) AS status,
        |       CAST(COALESCE(u.n_returned, 0) AS BIGINT) AS n_returned,
        |       CASE WHEN u.new_status IS NULL THEN 'keep'
        |            WHEN t.o_orderstatus IS NULL THEN 'insert'
        |            ELSE 'update' END AS action
        |FROM tgt t FULL OUTER JOIN upd u ON t.key = u.key
        |ORDER BY key""".stripMargin,

    "multimodal_decode_wav" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS audio_format,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(2 AS BIGINT) AS n_chunks,
        |  CAST(n_chars % 200 + 50 AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(
        |         range(0, CAST(n_chars % 200 + 50 AS INT)),
        |         i -> abs((doc_id * 31 + i * 7) % 65536 - 32768)))
        |       AS BIGINT) AS sum_abs
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
