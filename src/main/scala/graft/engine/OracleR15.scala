package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-10 keys. The sign-signature banding
  * is pure integer arithmetic (the emb_sign_hamming_topk bit recipe
  * with DuckDB's range-checked 1<<63 spelled as the min-long
  * literal), so the candidate set — and hence the re-scored top-5 —
  * re-derives exactly.
  */
object OracleR15 {

  val sql: ListMap[String, String] = ListMap(
    "emb_maxsim_ann" ->
      s"""WITH ex AS (SELECT vec_id,
        |              unnest(range(1, len(embedding) + 1)) AS i,
        |              embedding
        |            FROM embeddings),
        |bits AS (SELECT vec_id,
        |           bit_or(CASE WHEN embedding[i] <= 0 THEN 0::BIGINT
        |                  WHEN i = 64
        |                  THEN (-9223372036854775807 - 1)::BIGINT
        |                  ELSE 1::BIGINT << (i - 1) END) AS sig
        |         FROM ex GROUP BY vec_id),
        |sg AS (SELECT vec_id // 5 AS doc, sig FROM bits),
        |qb0 AS (SELECT DISTINCT doc AS qdoc, b,
        |          (sig >> (8 * b)) & 255 AS val
        |        FROM sg, range(0, 8) t(b) WHERE doc % 10 = 0),
        |qband AS (SELECT DISTINCT qdoc, b,
        |            xor(val, CASE WHEN i = 0 THEN 0
        |                     WHEN i = 1 THEN 1::BIGINT << CAST(b AS INT)
        |                     ELSE 1::BIGINT << CAST((b + 4) % 8 AS INT)
        |                END) AS val
        |          FROM qb0, range(0, 3) f(i)),
        |cband AS (SELECT DISTINCT doc, b, (sig >> (8 * b)) & 255 AS val
        |          FROM sg, range(0, 8) t(b) WHERE doc % 10 <> 0),
        |cand AS (SELECT DISTINCT qdoc, doc
        |         FROM qband JOIN cband USING (b, val)),
        |v AS (SELECT vec_id, vec_id // 5 AS doc, embedding
        |      FROM embeddings),
        |q AS (SELECT doc AS qdoc, vec_id AS qv, embedding FROM v
        |      WHERE doc % 10 = 0),
        |c AS (SELECT doc, embedding FROM v WHERE doc % 10 <> 0),
        |p AS (SELECT a.qdoc, a.qv, b.doc,
        |        round(${OracleDocs.cosinePair}, 6) AS cs
        |      FROM cand JOIN q a USING (qdoc) JOIN c b USING (doc)),
        |m AS (SELECT qdoc, qv, doc, max(cs) AS mx FROM p
        |      GROUP BY 1, 2, 3),
        |sc AS (SELECT qdoc, doc,
        |         CAST(sum(CAST(mx AS DECIMAL(18,6))) AS DOUBLE)
        |           AS maxsim
        |       FROM m GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY qdoc ORDER BY maxsim DESC, doc) AS INT)
        |        AS rk
        |      FROM sc)
        |SELECT qdoc, doc, maxsim, rk FROM r WHERE rk <= 5
        |ORDER BY qdoc, rk""".stripMargin,

    // Restates docJpegBlobs' closed-form block model: uniform even-
    // valued 8x8 blocks decode bit-exactly (DC-only DCT, Q(0,0)=16
    // divides 8*(v-128) when v is even), so every statistic is pure
    // integer arithmetic over the raster block index i.
    "multimodal_decode_jpeg" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 3 + 1 AS nbx,
        |         (doc_id // 3) % 2 + 1 AS nby
        |  FROM documents),
        |blk AS (SELECT doc_id, nbx, nby,
        |          unnest(range(0, nbx * nby)) AS i
        |        FROM dims),
        |v AS (SELECT doc_id, nbx, nby, i,
        |        2 * ((doc_id * 31 + i * 67) % 128) AS p
        |      FROM blk)
        |SELECT doc_id,
        |  CAST(max(nbx) * 8 AS INT) AS width,
        |  CAST(max(nby) * 8 AS INT) AS height,
        |  CAST(count(*) AS INT) AS n_blocks,
        |  CAST(sum(p) * 64 AS BIGINT) AS px_sum,
        |  round(CAST(sum(p) * 64 AS DOUBLE) / (count(*) * 64), 6)
        |    AS px_mean,
        |  CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max,
        |  CAST(64 * sum(CASE WHEN p < 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dark,
        |  CAST(min(CASE WHEN i = 0 THEN p END) AS INT) AS px_first,
        |  CAST(min(CASE WHEN i = nbx * nby - 1 THEN p END) AS INT)
        |    AS px_last
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Each lake version's CONTENT re-derived from orders directly:
    // version 0 = keys ≡ 0 mod 3, version 1 adds keys ≡ 1, version 2
    // is the content-preserving compaction (= version 1's rows).
    "lake_time_travel" ->
      """WITH base AS (SELECT o_orderkey AS key,
        |                o_orderstatus AS status
        |              FROM orders),
        |v AS (SELECT 0::BIGINT AS version, status FROM base
        |      WHERE key % 3 = 0
        |      UNION ALL
        |      SELECT 1::BIGINT, status FROM base WHERE key % 3 IN (0, 1)
        |      UNION ALL
        |      SELECT 2::BIGINT, status FROM base WHERE key % 3 IN (0, 1))
        |SELECT version, status, count(*) AS n
        |FROM v GROUP BY 1, 2 ORDER BY version, status""".stripMargin,

    "lake_merge_upsert" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status
        |                FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'),
        |upd AS (SELECT l_orderkey AS key, 'R' AS new_status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0)
        |SELECT coalesce(t.key, u.key) AS key,
        |  coalesce(u.new_status, t.status) AS status
        |FROM target t FULL OUTER JOIN upd u ON t.key = u.key
        |ORDER BY key""".stripMargin,

    // The version-0 → version-1 row delta, Delta-CDF-style: inserts,
    // update pre/post images, deletes (none under a pure upsert);
    // unchanged rows excluded.
    "lake_change_feed" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status
        |                FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'),
        |upd AS (SELECT l_orderkey AS key, 'R' AS new_status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0),
        |merged AS (
        |  SELECT coalesce(t.key, u.key) AS key,
        |    coalesce(u.new_status, t.status) AS status
        |  FROM target t FULL OUTER JOIN upd u ON t.key = u.key),
        |feed AS (
        |  SELECT m.key, m.status, 'insert' AS change_type
        |  FROM merged m LEFT JOIN target t ON m.key = t.key
        |  WHERE t.key IS NULL
        |  UNION ALL
        |  SELECT t.key, t.status, 'update_preimage'
        |  FROM target t JOIN merged m ON t.key = m.key
        |  WHERE t.status <> m.status
        |  UNION ALL
        |  SELECT m.key, m.status, 'update_postimage'
        |  FROM target t JOIN merged m ON t.key = m.key
        |  WHERE t.status <> m.status
        |  UNION ALL
        |  SELECT t.key, t.status, 'delete'
        |  FROM target t LEFT JOIN merged m ON t.key = m.key
        |  WHERE m.key IS NULL)
        |SELECT key, status, change_type FROM feed
        |ORDER BY key, change_type""".stripMargin,

    // Skipping changes what is SCANNED, never what is returned: the
    // readout is the plain range aggregate over orders.
    "lake_data_skipping" ->
      """SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      BETWEEN '1994-01-01' AND '1995-12-31'
        |GROUP BY 1 ORDER BY month""".stripMargin,

    // Pre-migration rows (even keys, landed before the column
    // existed) report NULL priority — the add-column no-backfill
    // contract, visible as the null bucket.
    "lake_schema_evolution" ->
      """SELECT o_orderstatus AS status,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |    AS priority,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1, 2 ORDER BY status, priority""".stripMargin,

    // The k-means chain trained on the BASE slice only (the
    // codebookCtes fragment retargeted at embeddings_base), then both
    // slices assigned by the emb_ann_ivf rule; delta rows read out
    // with their cell's base occupancy.
    "emb_ann_incremental" ->
      s"""WITH embeddings_base AS (
        |  SELECT * FROM embeddings WHERE vec_id % 7 <> 0),
        |${OracleKmeans.codebookCtes
             .replace("FROM embeddings", "FROM embeddings_base")},
        |ab AS (SELECT e.vec_id, c.cid,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(${OracleKmeans.cosFD("e", "c")}, 6)
        |             DESC, c.cid) AS rn
        |       FROM embeddings_base e JOIN cent c ON true),
        |occ AS (SELECT cid, count(*) AS n_base FROM ab
        |        WHERE rn = 1 GROUP BY cid),
        |dd AS (SELECT e.vec_id, c.cid,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(${OracleKmeans.cosFD("e", "c")}, 6)
        |             DESC, c.cid) AS rn
        |       FROM (SELECT * FROM embeddings WHERE vec_id % 7 = 0) e
        |       JOIN cent c ON true)
        |SELECT d.vec_id, CAST(d.cid AS INT) AS cell_id,
        |  CAST(coalesce(o.n_base, 0) AS BIGINT) AS n_base
        |FROM dd d LEFT JOIN occ o ON d.cid = o.cid
        |WHERE d.rn = 1
        |ORDER BY d.vec_id""".stripMargin,

    // Clustering changes the LAYOUT only: the readout is the plain
    // 1996 range aggregate over orders.
    "lake_cluster_compact" ->
      """SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
        |    1, 7) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      BETWEEN '1996-01-01' AND '1996-12-31'
        |GROUP BY 1 ORDER BY month""".stripMargin,

    // Exact DECIMAL cumulative revenue under the (rev DESC, cust)
    // total order; classes cut by integer-scaled cross-multiplication
    // so no float boundary can disagree.
    "orders_abc_pareto" ->
      """WITH m AS (SELECT o_custkey AS c_custkey,
        |    sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM m),
        |r AS (SELECT c_custkey, rev,
        |        sum(rev) OVER (ORDER BY rev DESC, c_custkey) AS cum
        |      FROM m)
        |SELECT c_custkey, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    AS cum_share,
        |  CASE WHEN cum * 10 <= total * 7 THEN 'A'
        |       WHEN cum * 10 <= total * 9 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM r, t ORDER BY c_custkey""".stripMargin,

    // The date-minus-row_number anchor: consecutive days share one
    // anchor, any gap shifts it.
    "events_activity_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id
        |                ORDER BY day) AS INT) AS anchor
        |      FROM days),
        |runs AS (SELECT user_id, anchor, count(*) AS len
        |         FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, max(len) AS longest_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The IVM contract: incrementally-refreshed aggregate == full
    // recompute over the post-merge state.
    "lake_ivm_refresh" ->
      """WITH target AS (SELECT o_orderkey AS key,
        |                  o_orderstatus AS status
        |                FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'),
        |upd AS (SELECT l_orderkey AS key, 'R' AS new_status FROM ret
        |        UNION ALL
        |        SELECT l_orderkey + 100000000, 'N' FROM ret
        |        WHERE l_orderkey % 50 = 0),
        |merged AS (
        |  SELECT coalesce(t.key, u.key) AS key,
        |    coalesce(u.new_status, t.status) AS status
        |  FROM target t FULL OUTER JOIN upd u ON t.key = u.key)
        |SELECT status, count(*) AS n FROM merged
        |GROUP BY status ORDER BY status""".stripMargin)
}
