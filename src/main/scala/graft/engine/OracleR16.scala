package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for the round-11 keys (QueriesR16). */
object OracleR16 {
  val sql: ListMap[String, String] = ListMap(

    // The Z-order layout changes what is SCANNED, never what is
    // returned — the oracle is the plain two-predicate aggregate.
    "lake_zorder_2d" ->
      """SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
        |    AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      BETWEEN '1994-01-01' AND '1995-12-31'
        |  AND o_custkey BETWEEN 1 AND 750
        |GROUP BY 1 ORDER BY month""".stripMargin,

    // Full recompute over the post-merge state (v1) — the IVM refresh
    // must equal this exactly: a wrong delta sign, a missed delete,
    // or a stale (non-rescanned) min breaks the hash. Delete wins
    // over update for keys that are both returned and ≡ 0 mod 97.
    "lake_ivm_sumavg" ->
      """WITH base AS (SELECT o_orderkey AS key,
        |                o_orderstatus AS status,
        |                CAST(round(o_totalprice, 2) AS DECIMAL(18,2))
        |                  AS price
        |              FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'),
        |merged AS (
        |  SELECT b.key,
        |    CASE WHEN r.l_orderkey IS NOT NULL THEN 'R'
        |         ELSE b.status END AS status,
        |    CASE WHEN r.l_orderkey IS NOT NULL
        |         THEN CAST(b.price + 100.00 AS DECIMAL(18,2))
        |         ELSE b.price END AS price
        |  FROM base b LEFT JOIN ret r ON b.key = r.l_orderkey
        |  WHERE b.key % 97 <> 0
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, 'N',
        |    CAST(50.00 AS DECIMAL(18,2))
        |  FROM ret WHERE l_orderkey % 50 = 0)
        |SELECT status, count(*) AS n,
        |  CAST(sum(price) AS DOUBLE) AS sum_price,
        |  round(CAST(sum(price) AS DOUBLE) / count(*), 6) AS avg_price,
        |  CAST(min(price) AS DOUBLE) AS min_price
        |FROM merged GROUP BY status ORDER BY status""".stripMargin,

    // Same merge model as lake_ivm_sumavg, classified row-by-row —
    // the delete branch emits the vanished row's image; a price-only
    // change still fires the pre/post pair.
    "lake_change_feed_deletes" ->
      """WITH base AS (SELECT o_orderkey AS key,
        |                o_orderstatus AS status,
        |                CAST(round(o_totalprice, 2) AS DECIMAL(18,2))
        |                  AS price
        |              FROM orders),
        |ret AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE l_returnflag = 'R'),
        |merged AS (
        |  SELECT b.key,
        |    CASE WHEN r.l_orderkey IS NOT NULL THEN 'R'
        |         ELSE b.status END AS status,
        |    CASE WHEN r.l_orderkey IS NOT NULL
        |         THEN CAST(b.price + 100.00 AS DECIMAL(18,2))
        |         ELSE b.price END AS price
        |  FROM base b LEFT JOIN ret r ON b.key = r.l_orderkey
        |  WHERE b.key % 97 <> 0
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, 'N',
        |    CAST(50.00 AS DECIMAL(18,2))
        |  FROM ret WHERE l_orderkey % 50 = 0)
        |SELECT m.key, m.status, CAST(m.price AS DOUBLE) AS price,
        |  'insert' AS change_type
        |FROM merged m LEFT JOIN base b ON m.key = b.key
        |WHERE b.key IS NULL
        |UNION ALL
        |SELECT b.key, b.status, CAST(b.price AS DOUBLE), 'delete'
        |FROM base b LEFT JOIN merged m ON b.key = m.key
        |WHERE m.key IS NULL
        |UNION ALL
        |SELECT b.key, b.status, CAST(b.price AS DOUBLE),
        |  'update_preimage'
        |FROM base b JOIN merged m ON b.key = m.key
        |WHERE b.status <> m.status OR b.price <> m.price
        |UNION ALL
        |SELECT m.key, m.status, CAST(m.price AS DOUBLE),
        |  'update_postimage'
        |FROM base b JOIN merged m ON b.key = m.key
        |WHERE b.status <> m.status OR b.price <> m.price
        |ORDER BY key, change_type""".stripMargin,

    // Restates docJpegColorBlobs' closed-form block model: uniform
    // even-valued luma blocks (DC divides K.1's Q(0,0)=16) and
    // uniform 128+17t chroma blocks (DC divides K.2's Q(0,0)=17)
    // decode bit-exactly, so every per-channel statistic is pure
    // integer arithmetic over the block indexes. Luma raster i runs
    // over (2·nmx)×(2·nmy) 8×8 blocks; chroma raster j over nmx×nmy
    // (the half-resolution planes).
    "multimodal_decode_jpeg_color" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 2 + 1 AS nmx,
        |         (doc_id // 2) % 2 + 1 AS nmy
        |  FROM documents),
        |yb AS (SELECT doc_id, nmx, nmy,
        |         unnest(range(0, 4 * nmx * nmy)) AS i
        |       FROM dims),
        |yv AS (SELECT doc_id, nmx, nmy, i,
        |         2 * ((doc_id * 31 + i * 67) % 128) AS p
        |       FROM yb),
        |ya AS (SELECT doc_id,
        |         CAST(max(nmx) * 16 AS INT) AS width,
        |         CAST(max(nmy) * 16 AS INT) AS height,
        |         CAST(count(*) AS BIGINT) AS n_yblocks,
        |         CAST(sum(p) * 64 AS BIGINT) AS y_sum,
        |         round(CAST(sum(p) * 64 AS DOUBLE) / (count(*) * 64), 6)
        |           AS y_mean,
        |         CAST(min(p) AS INT) AS y_min,
        |         CAST(max(p) AS INT) AS y_max,
        |         CAST(max(CASE WHEN i = 0 THEN p END) AS INT) AS y_first,
        |         CAST(max(CASE WHEN i = 4 * nmx * nmy - 1 THEN p END)
        |           AS INT) AS y_last
        |       FROM yv GROUP BY doc_id),
        |cb AS (SELECT doc_id, nmx, nmy,
        |         unnest(range(0, nmx * nmy)) AS j
        |       FROM dims),
        |cv AS (SELECT doc_id, nmx, nmy, j,
        |         128 + 17 * (((doc_id * 5 + j * 3) % 15) - 7) AS pb,
        |         128 + 17 * (((doc_id * 7 + j * 11) % 15) - 7) AS pr
        |       FROM cb),
        |ca AS (SELECT doc_id,
        |         CAST(sum(pb) * 64 AS BIGINT) AS cb_sum,
        |         CAST(min(pb) AS INT) AS cb_min,
        |         CAST(max(pb) AS INT) AS cb_max,
        |         CAST(max(CASE WHEN j = 0 THEN pb END) AS INT)
        |           AS cb_first,
        |         CAST(sum(pr) * 64 AS BIGINT) AS cr_sum,
        |         CAST(min(pr) AS INT) AS cr_min,
        |         CAST(max(pr) AS INT) AS cr_max,
        |         CAST(max(CASE WHEN j = nmx * nmy - 1 THEN pr END)
        |           AS INT) AS cr_last,
        |         CAST(count(*) AS BIGINT) AS n_cblocks
        |       FROM cv GROUP BY doc_id)
        |SELECT ya.doc_id, width, height,
        |  CAST(n_yblocks + 2 * n_cblocks AS INT) AS n_units,
        |  y_sum, y_mean, y_min, y_max, y_first, y_last,
        |  cb_sum, cb_min, cb_max, cb_first,
        |  cr_sum, cr_min, cr_max, cr_last
        |FROM ya JOIN ca ON ya.doc_id = ca.doc_id
        |ORDER BY ya.doc_id""".stripMargin)
}
