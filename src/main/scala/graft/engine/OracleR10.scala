package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-7 keys. The BPE encode oracle extends
  * the shared unrolled-CTE training chain (OracleR9.bpeChain) with the
  * corpus join + char-fallback rule, so the whole tokenizer — train
  * AND apply — is pinned end-to-end by one SQL derivation.
  */
object OracleR10 {
  private val cosinePair =
    """list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
      |      / (sqrt(list_aggregate(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum'))
      |       * sqrt(list_aggregate(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum')))""".stripMargin

  /** Per-method recall@3 distribution against exact3 — shared by the
    * three method branches of the emb_recall_matrix oracle. */
  private def recallDist(method: String, annCte: String): String =
    s"""SELECT '$method' AS method, matched, count(*) AS n_vecs FROM (
       |  SELECT e.vec_id,
       |    CAST(count(*) FILTER (WHERE a.vec_id IS NOT NULL) AS BIGINT)
       |      AS matched
       |  FROM exact3 e LEFT JOIN $annCte a
       |    ON e.vec_id = a.vec_id AND e.neighbor_id = a.neighbor_id
       |  GROUP BY e.vec_id) GROUP BY matched""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    // The recall harness re-derives each index exactly as its own
    // oracle does — IVF from the k-means CTE chain (emb_ann_ivf),
    // PQ codes/ADC from the subspace-distance chain (emb_pq_adc /
    // emb_ivf_pq) — restricted to the deterministic 10% query sample,
    // then grades each method's top-3 against the exact list.
    "emb_recall_matrix" ->
      s"""WITH ${OracleKmeans.codebookCtes},
        |exq AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |          round($cosinePair, 6) AS cos_sim
        |        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |        WHERE a.vec_id % 10 = 0),
        |exact3 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM exq) t WHERE rk <= 3),
        |rnk AS (SELECT a.vec_id, b.cid,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(${OracleKmeans.cosFD("a", "b")}, 6) DESC,
        |               b.cid) AS rn
        |  FROM embeddings a JOIN cent b ON true),
        |idx AS (SELECT e.vec_id, e.embedding, r.cid AS cell_id
        |        FROM embeddings e JOIN rnk r
        |          ON e.vec_id = r.vec_id AND r.rn = 1),
        |probes AS (SELECT e.vec_id, e.embedding, r.cid AS cell_id
        |           FROM embeddings e JOIN rnk r
        |             ON e.vec_id = r.vec_id AND r.rn <= 4
        |           WHERE e.vec_id % 10 = 0),
        |ivfp AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |        round($cosinePair, 6) AS cos_sim
        |      FROM probes a JOIN idx b
        |        ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
        |ivf3 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM ivfp) t WHERE rk <= 3),
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
        |ptab AS (SELECT vec_id AS qid, m, pcid AS code, dist AS qdist
        |         FROM pdists WHERE vec_id % 10 = 0),
        |adcp AS (SELECT t.qid, c.vec_id, round(SUM(t.qdist), 6) AS adc
        |         FROM pcodes c JOIN ptab t
        |           ON c.m = t.m AND c.code = t.code AND c.vec_id <> t.qid
        |         GROUP BY t.qid, c.vec_id),
        |pq3 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT qid AS vec_id, vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
        |  FROM adcp) t WHERE rk <= 3),
        |cand AS (SELECT q.vec_id AS qid, a.vec_id
        |         FROM rnk q JOIN rnk a ON a.rn = 1 AND a.cid = q.cid
        |         WHERE q.vec_id % 10 = 0 AND q.rn <= 4),
        |adci AS (SELECT t.qid, c.vec_id, round(SUM(t.qdist), 6) AS adc
        |         FROM cand d
        |         JOIN pcodes c ON c.vec_id = d.vec_id
        |         JOIN ptab t ON t.qid = d.qid AND t.m = c.m
        |           AND t.code = c.code
        |         WHERE c.vec_id <> t.qid
        |         GROUP BY t.qid, c.vec_id),
        |ipq3 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT qid AS vec_id, vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
        |  FROM adci) t WHERE rk <= 3)
        |SELECT method, matched, n_vecs FROM (
        |  ${recallDist("ivf", "ivf3")}
        |  UNION ALL
        |  ${recallDist("pq_adc", "pq3")}
        |  UNION ALL
        |  ${recallDist("ivf_pq", "ipq3")}) u
        |ORDER BY method, matched""".stripMargin,
    // words keep their original split index for ordering (empties from
    // doubled spaces are dropped AFTER indexing, mirroring the
    // engine's posexplode+filter); OOV words — anything outside the
    // trainer's ^[a-z]{2,}$ vocab — fall back to char symbols via the
    // LEFT JOIN + COALESCE; token ids are dense alphabetical ranks
    // over the (bounded) token inventory.
    "docs_bpe_encode" -> (OracleR9.bpeChain(8) +
      """
        |, w AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS wi
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |              FROM documents)),
        |wd AS (SELECT doc_id, CAST(wi AS INT) AS wpos, ws[wi] AS word
        |       FROM w WHERE length(ws[wi]) > 0),
        |enc AS (SELECT d.doc_id, d.wpos,
        |        COALESCE(s.syms,
        |          list_transform(range(1, length(d.word) + 1),
        |                         i -> d.word[i:i])) AS syms
        |        FROM wd d LEFT JOIN s8 s ON s.word = d.word),
        |cum AS (SELECT doc_id, wpos, syms,
        |        sum(len(syms)) OVER (PARTITION BY doc_id ORDER BY wpos)
        |          - len(syms) AS base
        |        FROM enc),
        |tok AS (SELECT doc_id, CAST(base + ti - 1 AS INT) AS pos,
        |               syms[ti] AS token
        |        FROM (SELECT doc_id, base, syms,
        |              unnest(range(1, len(syms) + 1)) AS ti FROM cum)),
        |ids AS (SELECT token,
        |          CAST(row_number() OVER (ORDER BY token) - 1 AS INT)
        |            AS token_id
        |        FROM (SELECT DISTINCT token FROM tok))
        |SELECT t.doc_id, t.pos, t.token, i.token_id
        |FROM tok t JOIN ids i USING (token)
        |ORDER BY doc_id, pos""".stripMargin),

    // the custom Generator must be indistinguishable from the explode
    // spelling — same oracle as udtf_generator_ngrams verbatim
    "udtf_ngrams_native" ->
      """SELECT doc_id, i AS pos, array_to_string(tokens[i:i+1], ' ') AS ngram
        |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens))) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tokens
        |            FROM documents WHERE doc_id < 200) t1) t2
        |ORDER BY doc_id, pos""".stripMargin,

    // layout (partitioning + Z-order) never changes results — the
    // oracle is the plain join+filter semantics over the raw table
    "scan_zorder_dpp" ->
      """SELECT year(l_shipdate) AS l_year,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       MAX(d.n_orders) AS n_orders
        |FROM lineitem
        |JOIN (SELECT year(o_orderdate) AS y,
        |             CAST(COUNT(*) AS BIGINT) AS n_orders
        |      FROM orders WHERE o_orderdate >= DATE '2001-01-01'
        |      GROUP BY 1) d
        |  ON year(l_shipdate) = d.y
        |WHERE l_partkey >= 100 AND l_partkey <= 299
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // lineage is pinned by CONTENT: shard i holds exactly the
    // c_custkey % 3 = i slice, so the per-file audit is re-derivable
    // without knowing the engine's file paths
    "scan_glob_lineage" ->
      """SELECT 'shard' || CAST(c_custkey % 3 AS VARCHAR) || '.parquet'
        |         AS src_file,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_acctbal
        |FROM customer
        |GROUP BY 1 ORDER BY src_file""".stripMargin,
  )
}
