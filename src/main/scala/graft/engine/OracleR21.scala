package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-16 surgical-DML keys ([[QueriesR21]]).
  * Each oracle computes the POST-DML end state of the lake fixture
  * straight from the raw corpus — the engine's prune / copy-on-write
  * / atomic-commit pipeline must land on exactly this content.
  * `ingest_forget` wraps the full ingest-replay oracle
  * ([[OracleR19.docsReplaySql]] — the definitional O(n²) Jaccard +
  * three-batch greedy chain) and applies the same purge rule on top,
  * so the two stay in lockstep by construction. */
object OracleR21 {

  private val morDeleteSql: String =
    """SELECT o_orderkey AS key, o_orderstatus AS status
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |  AND o_orderkey NOT IN (
      |    SELECT DISTINCT l_orderkey FROM lineitem
      |    WHERE l_returnflag = 'R')
      |ORDER BY key""".stripMargin

  val sql: ListMap[String, String] = ListMap(

    "lake_delete_surgical" ->
      """SELECT o_orderkey AS key, o_orderstatus AS status
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_orderkey < 8192)
        |ORDER BY key""".stripMargin,

    "lake_delete_bloom" ->
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 97 = 13 ORDER BY doc_id LIMIT 5)
        |ORDER BY doc_id""".stripMargin,

    "lake_merge_surgical" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'
        |          AND l_orderkey >= 16384 AND l_orderkey < 32768),
        |upd AS (SELECT l_orderkey AS key, 'R' AS status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0)
        |SELECT coalesce(t.key, u.key) AS key,
        |       coalesce(u.status, t.status) AS status
        |FROM target t FULL OUTER JOIN upd u ON t.key = u.key
        |ORDER BY key""".stripMargin,

    // MOR view and post-compaction table are the SAME relation — the
    // two keys share this text deliberately (the equivalence is the
    // merge-on-read contract).
    "lake_delete_mor" -> morDeleteSql,
    "lake_delete_mor_compacted" -> morDeleteSql,

    "lake_update_surgical" ->
      """SELECT o_orderkey AS key,
        |  CASE WHEN o_orderstatus = 'P' AND o_orderkey < 8192
        |       THEN 'X' ELSE o_orderstatus END AS status,
        |  CASE WHEN o_orderstatus = 'P' AND o_orderkey < 8192
        |       THEN o_custkey + 1000000 ELSE o_custkey END AS cust
        |FROM orders
        |ORDER BY key""".stripMargin,

    // CDC across the DML sequence: the feed between the clustered
    // base and the post-merge+delete snapshot, classified
    // Delta-CDF-style. Update and delete key ranges are disjoint, so
    // every row lands in exactly one class.
    "lake_change_feed_dml" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'
        |          AND l_orderkey >= 16384 AND l_orderkey < 32768),
        |upd AS (SELECT l_orderkey AS key, 'R' AS status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0),
        |merged AS (
        |  SELECT coalesce(t.key, u.key) AS key,
        |         coalesce(u.status, t.status) AS status
        |  FROM target t FULL OUTER JOIN upd u ON t.key = u.key),
        |final AS (SELECT key, status FROM merged
        |          WHERE NOT (status = 'F' AND key < 8192)),
        |feed AS (
        |  SELECT f.key, f.status, 'insert' AS change_type
        |  FROM final f LEFT JOIN target t ON f.key = t.key
        |  WHERE t.key IS NULL
        |  UNION ALL
        |  SELECT t.key, t.status, 'update_preimage'
        |  FROM target t JOIN final f ON t.key = f.key
        |  WHERE t.status <> f.status
        |  UNION ALL
        |  SELECT f.key, f.status, 'update_postimage'
        |  FROM target t JOIN final f ON t.key = f.key
        |  WHERE t.status <> f.status
        |  UNION ALL
        |  SELECT t.key, t.status, 'delete'
        |  FROM target t LEFT JOIN final f ON t.key = f.key
        |  WHERE f.key IS NULL)
        |SELECT key, status, change_type FROM feed
        |ORDER BY key, change_type""".stripMargin,

    // The ingest fate projection after the forget purge: forgotten =
    // accepted docs ≡ 7 (mod 10); their marker rows vanish (deleted
    // from the docs lake) and every audit pair naming them vanishes
    // (purged from the rejects lake). NOT IN is null-safe here: the
    // forgotten CTE's ids are never NULL, and NULL match_ids are
    // admitted explicitly.
    "ingest_forget" ->
      s"""WITH proj AS (${OracleR19.docsReplaySql}),
         |forgotten AS (SELECT doc_id FROM proj
         |              WHERE match_src = 'accepted' AND doc_id % 10 = 7)
         |SELECT doc_id, match_id, match_src, jaccard FROM proj
         |WHERE doc_id NOT IN (SELECT doc_id FROM forgotten)
         |  AND (match_id IS NULL
         |       OR match_id NOT IN (SELECT doc_id FROM forgotten))
         |ORDER BY doc_id, match_src, match_id""".stripMargin,

    // The embedding-leg twin: the full emb-replay oracle (OracleKmeans
    // retrain + cell-scoped greedy chain) with the same purge rule on
    // top — forgotten = accepted vec_ids ≡ 3 (mod 10).
    "ingest_forget_emb" ->
      s"""WITH proj AS (${OracleR19.sql("ingest_emb_replay")}),
         |forgotten AS (SELECT vec_id FROM proj
         |              WHERE match_src = 'accepted' AND vec_id % 10 = 3)
         |SELECT vec_id, dup_of, match_src, cos FROM proj
         |WHERE vec_id NOT IN (SELECT vec_id FROM forgotten)
         |  AND (dup_of IS NULL
         |       OR dup_of NOT IN (SELECT vec_id FROM forgotten))
         |ORDER BY vec_id, match_src, dup_of""".stripMargin,
  )
}
