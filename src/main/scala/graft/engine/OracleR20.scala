package graft.engine

/** DuckDB oracles for the round-16 TPC-H completion wave (q2, q11,
  * q12, q16, q20 shapes — see QueriesR20). Same SQL as the Spark
  * side modulo dialect: `date_diff('day', a, b)` for `datediff(b,
  * a)`, and HUGEINT aggregates CAST back to BIGINT at the output.
  * The derived `ps` relation is spelled identically (exact bigint
  * quantity sums; MIN over IEEE divisions) so every comparison sits
  * on engine-independent values.
  */
object OracleR20 {

  private def cosPair(x: String, y: String): String =
    s"""list_aggregate(list_transform(list_zip($x.embedding, $y.embedding),
       |        z -> CAST(z[1] AS DOUBLE) * z[2]), 'sum')
       |      / (sqrt(list_aggregate(list_transform($x.embedding,
       |           z -> CAST(z AS DOUBLE) * z), 'sum'))
       |       * sqrt(list_aggregate(list_transform($y.embedding,
       |           z -> CAST(z AS DOUBLE) * z), 'sum')))""".stripMargin

  /** The refresh replay from first principles: quality gate → batch-0
    * codebook (OracleKmeans, unprefixed) → batches 0/1 accept chain
    * under the original cells → RETRAIN over the accepted two-batch
    * corpus (OracleKmeans again, `r_`-prefixed) → re-assign the
    * corpus and assign batch-2 survivors under the NEW cells → batch-2
    * accept chain. A hash match pins retraining determinism, the
    * atomic re-assignment, and post-refresh ingest semantics at once. */
  private val embRefreshSql: String =
    s"""WITH eb AS MATERIALIZED (SELECT vec_id, embedding, vec_id % 3 AS b,
       |        floor(sqrt(list_aggregate(list_transform(embedding[1:8],
       |          x -> CAST(x AS DOUBLE) * x), 'sum')) * 1e6 + 0.5) AS m8
       |      FROM embeddings),
       |filt AS (SELECT vec_id FROM eb
       |         WHERE m8 < 200000 OR m8 IS NULL),
       |surv AS MATERIALIZED (SELECT vec_id, embedding, b FROM eb
       |         WHERE m8 IS NOT NULL AND m8 >= 200000),
       |b0 AS (SELECT vec_id, embedding FROM surv WHERE b = 0),
       |${OracleKmeans.codebookCtesFrom("b0")},
       |s01 AS MATERIALIZED (SELECT vec_id, embedding, b FROM surv WHERE b <= 1),
       |rnk AS (SELECT a.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY round(${OracleKmeans.cosFD("a", "c")}, 6) DESC,
       |                    c.cid) AS rn
       |       FROM s01 a JOIN cent c ON true),
       |asg AS (SELECT s.vec_id, s.embedding, s.b, r.cid
       |        FROM s01 s JOIN rnk r ON s.vec_id = r.vec_id AND r.rn = 1),
       |pp AS (SELECT a.vec_id, a.b AS xb, b.vec_id AS dup_of, b.b AS yb,
       |         round(${cosPair("a", "b")}, 6) AS cos
       |       FROM asg a JOIN asg b
       |         ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |       WHERE round(${cosPair("a", "b")}, 6) > 0.45),
       |acc0 AS (SELECT vec_id FROM asg WHERE b = 0 AND NOT EXISTS (
       |    SELECT 1 FROM pp WHERE pp.vec_id = asg.vec_id
       |      AND pp.yb = 0 AND pp.dup_of < asg.vec_id)),
       |acc1 AS (SELECT vec_id FROM asg WHERE b = 1 AND NOT EXISTS (
       |    SELECT 1 FROM pp WHERE pp.vec_id = asg.vec_id AND (
       |      (pp.yb = 1 AND pp.dup_of < asg.vec_id) OR
       |      (pp.yb = 0 AND pp.dup_of IN (SELECT vec_id FROM acc0))))),
       |acc01 AS (SELECT vec_id FROM acc0
       |          UNION ALL SELECT vec_id FROM acc1),
       |tr AS MATERIALIZED (SELECT s.vec_id, s.embedding FROM surv s
       |       JOIN acc01 a ON s.vec_id = a.vec_id),
       |${OracleKmeans.codebookCtesFrom("tr", "r_")},
       |s2 AS (SELECT vec_id, embedding FROM surv WHERE b = 2),
       |ru AS MATERIALIZED (SELECT vec_id, embedding FROM tr
       |       UNION ALL SELECT vec_id, embedding FROM s2),
       |rrnk AS (SELECT a.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY round(${OracleKmeans.cosFD("a", "c")}, 6) DESC,
       |                    c.cid) AS rn
       |       FROM ru a JOIN r_cent c ON true),
       |rasg AS MATERIALIZED (SELECT u.vec_id, u.embedding, r.cid
       |         FROM ru u JOIN rrnk r ON u.vec_id = r.vec_id AND r.rn = 1),
       |base1 AS (SELECT ra.vec_id, ra.embedding, ra.cid FROM rasg ra
       |          JOIN acc01 a ON ra.vec_id = a.vec_id),
       |d2 AS (SELECT ra.vec_id, ra.embedding, ra.cid FROM rasg ra
       |       JOIN s2 ON ra.vec_id = s2.vec_id),
       |pp2 AS (SELECT a.vec_id, b.vec_id AS dup_of, 'base' AS match_src,
       |          round(${cosPair("a", "b")}, 6) AS cos
       |        FROM d2 a JOIN base1 b ON a.cid = b.cid
       |        WHERE round(${cosPair("a", "b")}, 6) > 0.45
       |        UNION ALL
       |        SELECT a.vec_id, b.vec_id, 'delta',
       |          round(${cosPair("a", "b")}, 6)
       |        FROM d2 a JOIN d2 b
       |          ON a.cid = b.cid AND b.vec_id < a.vec_id
       |        WHERE round(${cosPair("a", "b")}, 6) > 0.45),
       |acc2 AS (SELECT vec_id FROM d2 WHERE NOT EXISTS (
       |    SELECT 1 FROM pp2 WHERE pp2.vec_id = d2.vec_id))
       |SELECT vec_id, dup_of, match_src, cos, cell_id FROM (
       |  SELECT pp.vec_id, pp.dup_of, 'delta' AS match_src, pp.cos,
       |         CAST(NULL AS BIGINT) AS cell_id
       |  FROM pp WHERE pp.yb = pp.xb AND pp.dup_of < pp.vec_id
       |  UNION ALL
       |  SELECT pp.vec_id, pp.dup_of, 'base', pp.cos,
       |         CAST(NULL AS BIGINT)
       |  FROM pp WHERE pp.yb < pp.xb
       |    AND pp.dup_of IN (SELECT vec_id FROM acc0)
       |  UNION ALL
       |  SELECT vec_id, dup_of, match_src, cos, CAST(NULL AS BIGINT)
       |  FROM pp2
       |  UNION ALL
       |  SELECT b.vec_id, CAST(NULL AS BIGINT), 'accepted',
       |         CAST(NULL AS DOUBLE), b.cid
       |  FROM base1 b
       |  UNION ALL
       |  SELECT d.vec_id, CAST(NULL AS BIGINT), 'accepted',
       |         CAST(NULL AS DOUBLE), d.cid
       |  FROM d2 d JOIN acc2 a ON d.vec_id = a.vec_id
       |  UNION ALL
       |  SELECT vec_id, CAST(NULL AS BIGINT), 'filtered',
       |         CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
       |  FROM filt) t
       |ORDER BY vec_id, match_src, dup_of""".stripMargin

  private val psCte: String =
    """ps AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |             SUM(CAST(l_quantity AS BIGINT)) AS qty,
      |             MIN(l_extendedprice / l_quantity) AS cost
      |      FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  val sql: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      s"""WITH $psCte,
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE')
        |SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_brand,
        |       ps.cost AS supply_cost
        |FROM part p JOIN ps ON ps.partkey = p.p_partkey
        |JOIN eu s ON s.s_suppkey = ps.suppkey
        |WHERE p.p_size <= 5 AND p.p_type = 'ECONOMY'
        |  AND ps.cost = (SELECT MIN(ps2.cost)
        |                 FROM ps ps2 JOIN eu s2 ON s2.s_suppkey = ps2.suppkey
        |                 WHERE ps2.partkey = p.p_partkey)
        |ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $psCte,
        |gs AS (SELECT ps.partkey, ps.qty FROM ps
        |       JOIN supplier ON s_suppkey = ps.suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE')
        |SELECT partkey AS p_partkey, CAST(SUM(qty) AS BIGINT) AS stock_qty
        |FROM gs GROUP BY partkey
        |HAVING SUM(qty) > (SELECT SUM(qty) FROM gs) * 0.001
        |ORDER BY stock_qty DESC, p_partkey""".stripMargin,

    "q12_latency_priority" ->
      """SELECT ship_bucket,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 90
        |                    THEN 'DELAYED'
        |                  WHEN date_diff('day', o_orderdate, l_shipdate) >= 30
        |                    THEN 'SLOW'
        |                  ELSE 'FAST' END AS ship_bucket, o_orderpriority
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
        |GROUP BY ship_bucket ORDER BY ship_bucket""".stripMargin,

    "q16_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS partkey,
        |                   l_suppkey AS suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = partkey
        |WHERE p_brand <> 'Brand#17' AND p_type <> 'ECONOMY'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_excess_suppliers" ->
      s"""WITH $psCte
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND s_suppkey IN (
        |    SELECT ps.suppkey FROM ps
        |    WHERE ps.partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'red%')
        |      AND ps.qty > 2 * (SELECT SUM(CAST(l_quantity AS BIGINT))
        |                        FROM lineitem
        |                        WHERE l_partkey = ps.partkey
        |                          AND l_suppkey = ps.suppkey
        |                          AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |                          AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin,

    "ingest_emb_refresh" -> embRefreshSql,

    // The multi-statement Spark session collapsed into one WITH: the
    // two temp views become CTEs.
    "sql_session_multi" ->
      """WITH sm_rev AS (
        |  SELECT o_orderkey, CAST(month(o_orderdate) AS INT) AS mth,
        |         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                       AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY o_orderkey, month(o_orderdate)),
        |sm_mtot AS (
        |  SELECT mth,
        |         CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS mrev,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM sm_rev GROUP BY mth)
        |SELECT r.mth, r.o_orderkey, r.revenue, CAST(r.rk AS BIGINT) AS rk,
        |       t.mrev, t.n_orders
        |FROM (SELECT mth, o_orderkey, revenue,
        |        row_number() OVER (PARTITION BY mth
        |          ORDER BY revenue DESC, o_orderkey) AS rk
        |      FROM sm_rev) r JOIN sm_mtot t ON r.mth = t.mth
        |WHERE r.rk <= 5
        |ORDER BY r.mth, r.rk""".stripMargin,

    // The artifact view's content re-derived from first principles
    // (exact shingle Jaccard — the docs_dedup_near oracle, nested).
    "sql_neardup_audit" ->
      s"""WITH np AS (
        |${OracleDocs.sql("docs_dedup_near")}
        |),
        |best AS (
        |  SELECT id1, id2, jaccard,
        |         row_number() OVER (PARTITION BY id1
        |           ORDER BY jaccard DESC, id2) AS rk
        |  FROM np)
        |SELECT b.id1, b.id2, b.jaccard,
        |       d1.lang AS lang1, d2.lang AS lang2
        |FROM best b JOIN documents d1 ON d1.doc_id = b.id1
        |JOIN documents d2 ON d2.doc_id = b.id2
        |WHERE b.rk = 1
        |ORDER BY b.id1""".stripMargin,

    // The accepted set re-derived by the full 3-batch replay chain.
    "sql_ingested_stats" ->
      s"""WITH fate AS (
        |${OracleR19.docsReplaySql}
        |),
        |accd AS (SELECT DISTINCT doc_id FROM fate
        |         WHERE match_src = 'accepted')
        |SELECT d.lang, CAST(i.doc_id % 3 AS BIGINT) AS batch,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
        |FROM accd i JOIN documents d ON d.doc_id = i.doc_id
        |GROUP BY d.lang, i.doc_id % 3
        |ORDER BY lang, batch""".stripMargin
  )
}
