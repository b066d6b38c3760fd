package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-4 wave-3 keys. The TPC-H-shape keys
  * restate the joins relationally (DuckDB plans them its own way —
  * the point is value agreement, not plan agreement); the LM key
  * mirrors the per-term 1e-9 rounding + decimal-sum contract; the PQ
  * key re-derives codebook/codes/ADC from first principles with
  * DuckDB list idioms (the OracleKmeans precedent: same arithmetic,
  * same tie-breaks, different engine). */
object OracleR6 {
  val sql: ListMap[String, String] = ListMap(
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       year(l.l_shipdate) AS l_year,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        |   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH j AS (
        |  SELECT year(o.o_orderdate) AS o_year,
        |         sn.n_name AS supp_nation,
        |         CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |              AS DECIMAL(18,4)) AS rev
        |  FROM lineitem l
        |  JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA')
        |SELECT o_year,
        |  CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev END),
        |                0) AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  round(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev END),
        |                      0) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE), 6)
        |    AS mkt_share
        |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q13_order_count_dist" ->
      """WITH pc AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_cust
        |FROM pc GROUP BY n_orders
        |ORDER BY n_cust DESC, n_orders DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                  AS DECIMAL(18,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name,
        |       CAST(r.total_rev AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    "docs_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |model AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |nv AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total,
        |              CAST(COUNT(*) AS DOUBLE) AS v_vocab FROM model),
        |dt AS (SELECT doc_id, t, COUNT(*) AS c_doc FROM tok GROUP BY doc_id, t),
        |terms AS (
        |  SELECT d.doc_id, d.c_doc,
        |    CAST(round(-d.c_doc * ln((m.c + 1) / (nv.n_total + nv.v_vocab)), 9)
        |         AS DECIMAL(28,9)) AS term
        |  FROM dt d JOIN model m USING (t), nv)
        |SELECT doc_id,
        |  CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(term) AS DOUBLE) / CAST(SUM(c_doc) AS DOUBLE), 6)
        |    AS cross_entropy
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "docs_lm_bigram" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |bi AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |             FROM tok) t),
        |bim AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
        |unim AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
        |v AS (SELECT CAST(COUNT(DISTINCT w1) AS DOUBLE) AS v_vocab FROM bi),
        |dt AS (SELECT doc_id, w1, w2, COUNT(*) AS c_doc
        |       FROM bi GROUP BY doc_id, w1, w2),
        |terms AS (
        |  SELECT d.doc_id, d.c_doc,
        |    CAST(round(-d.c_doc * ln((m.c12 + 1) / (u.c1 + v.v_vocab)), 9)
        |         AS DECIMAL(28,9)) AS term
        |  FROM dt d JOIN bim m USING (w1, w2) JOIN unim u USING (w1), v)
        |SELECT doc_id,
        |  CAST(SUM(c_doc) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(term) AS DOUBLE) / CAST(SUM(c_doc) AS DOUBLE), 6)
        |    AS cross_entropy
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "emb_pq_adc" ->
      """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
        |samp AS (
        |  SELECT embedding AS cemb,
        |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            vec_id) - 1 AS cid
        |  FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        |  LIMIT 16),
        |ms AS (SELECT unnest(range(8)) AS m),
        |cslice AS (
        |  SELECT m, cid,
        |         list_transform(range(1, 9),
        |                        i -> CAST(cemb[m*8 + i] AS DOUBLE)) AS cvec
        |  FROM samp, ms),
        |vslice AS (
        |  SELECT vec_id, m,
        |         list_transform(range(1, 9),
        |                        i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS vvec
        |  FROM emb, ms),
        |dists AS (
        |  SELECT v.vec_id, v.m, c.cid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (v.vvec[i] - c.cvec[i]) * (v.vvec[i] - c.cvec[i])))
        |           AS dist
        |  FROM vslice v JOIN cslice c USING (m)),
        |codes AS (
        |  SELECT vec_id, m, cid AS code FROM (
        |    SELECT vec_id, m, cid,
        |           row_number() OVER (PARTITION BY vec_id, m
        |                              ORDER BY dist, cid) AS rn
        |    FROM dists) r WHERE rn = 1),
        |qtab AS (
        |  SELECT m, cid AS code, dist AS qdist FROM dists WHERE vec_id = 0)
        |SELECT c.vec_id,
        |  round(SUM(q.qdist), 6) AS adc_dist,
        |  string_agg(CAST(c.code AS VARCHAR), '-' ORDER BY c.m) AS code_str
        |FROM codes c JOIN qtab q ON c.m = q.m AND c.code = q.code
        |GROUP BY c.vec_id
        |ORDER BY adc_dist, c.vec_id
        |LIMIT 10""".stripMargin,

    // IVF-PQ: the k-means CTE chain (cell assignment, verified
    // bit-identical for emb_ann_ivf) composed with the PQ chain. The
    // PQ sample codebook IS seedord's first 16 rows — the same
    // deterministic md5-least sample seeds both quantizers.
    "emb_ivf_pq" ->
      s"""WITH ${OracleKmeans.codebookCtes},
        |asg AS (SELECT a.vec_id, b.cid,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(${OracleKmeans.cosFD("a", "b")}, 6) DESC,
        |               b.cid) AS rn
        |  FROM embeddings a JOIN cent b ON true),
        |assign AS (SELECT vec_id, cid AS cell_id FROM asg WHERE rn = 1),
        |qcells AS (SELECT cid FROM asg WHERE vec_id = 0 AND rn <= 4),
        |pms AS (SELECT unnest(range(8)) AS m),
        |psamp AS (SELECT embedding AS pemb, cid AS pcid
        |          FROM seedord WHERE cid < 16),
        |pdists AS (
        |  SELECT e.vec_id, s.m, p.pcid,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (CAST(e.embedding[s.m*8 + i] AS DOUBLE)
        |            - CAST(p.pemb[s.m*8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[s.m*8 + i] AS DOUBLE)
        |            - CAST(p.pemb[s.m*8 + i] AS DOUBLE)))) AS dist
        |  FROM embeddings e, pms s, psamp p),
        |pcodes AS (SELECT vec_id, m, pcid AS code FROM (
        |    SELECT vec_id, m, pcid,
        |           row_number() OVER (PARTITION BY vec_id, m
        |                              ORDER BY dist, pcid) AS rn
        |    FROM pdists) t WHERE rn = 1),
        |pqtab AS (SELECT m, pcid AS code, dist AS qdist
        |          FROM pdists WHERE vec_id = 0)
        |SELECT c.vec_id, a.cell_id, round(SUM(q.qdist), 6) AS adc_dist
        |FROM pcodes c JOIN assign a ON c.vec_id = a.vec_id
        |JOIN qcells qc ON a.cell_id = qc.cid
        |JOIN pqtab q ON c.m = q.m AND c.code = q.code
        |GROUP BY c.vec_id, a.cell_id
        |ORDER BY adc_dist, c.vec_id
        |LIMIT 10""".stripMargin,

    "merge_upsert_scd2" ->
      """WITH target AS (SELECT o_orderkey AS key, o_orderstatus FROM orders),
        |ret AS (SELECT l_orderkey, COUNT(*) AS n_returned
        |        FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
        |upd AS (SELECT l_orderkey AS key, 'R' AS new_status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0),
        |j AS (SELECT COALESCE(t.key, u.key) AS key, t.o_orderstatus,
        |             u.new_status
        |      FROM target t FULL OUTER JOIN upd u ON t.key = u.key)
        |SELECT key, status, version, is_current FROM (
        |  SELECT key, o_orderstatus AS status, 1 AS version,
        |         (new_status IS NULL OR new_status = o_orderstatus)
        |           AS is_current
        |  FROM j WHERE o_orderstatus IS NOT NULL
        |  UNION ALL
        |  SELECT key, new_status,
        |         CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 2 END, true
        |  FROM j WHERE new_status IS NOT NULL
        |    AND (o_orderstatus IS NULL OR new_status <> o_orderstatus)) v
        |ORDER BY key, version""".stripMargin,
  )
}
