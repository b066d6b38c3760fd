package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-9 wave-7 keys (graph neighborhood
  * similarity, path mining, time-weighted averaging). Integer
  * thresholds are the same cross-multiplications as the Spark side;
  * every ratio is a single IEEE-exact quotient rounded 6 dp.
  */
object OracleR14 {

  val sql: ListMap[String, String] = ListMap(
    "graph_jaccard_neighbors" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l.l_suppkey AS sup, o.o_custkey AS cust
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (SELECT sup, count(*) AS deg FROM pairs GROUP BY 1),
        |com AS (SELECT a.sup AS sup_a, b.sup AS sup_b,
        |          count(*) AS common
        |        FROM pairs a JOIN pairs b
        |          ON a.cust = b.cust AND a.sup < b.sup
        |        GROUP BY 1, 2)
        |SELECT sup_a, sup_b, common, da.deg AS deg_a, db.deg AS deg_b,
        |  round(CAST(common AS DOUBLE)
        |        / (da.deg + db.deg - common), 6) AS jaccard
        |FROM com
        |JOIN deg da ON da.sup = com.sup_a
        |JOIN deg db ON db.sup = com.sup_b
        |WHERE common * 5 >= da.deg + db.deg - common
        |ORDER BY sup_a, sup_b""".stripMargin,

    "events_user_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT step1, step2, step3, count(*) AS n FROM seq
        |      WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |      GROUP BY 1, 2, 3),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (ORDER BY n DESC, step1, step2, step3) AS INT) AS rank
        |      FROM c)
        |SELECT step1, step2, step3, n, rank FROM r
        |WHERE rank <= 25 ORDER BY rank""".stripMargin,

    "orders_rfm_segments" ->
      """WITH m AS (
        |  SELECT o_custkey AS c_custkey, max(o_orderdate) AS recency,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |         AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |t AS (SELECT *,
        |  CAST(ntile(3) OVER (ORDER BY recency, c_custkey) AS INT)
        |    AS r_tile,
        |  CAST(ntile(3) OVER (ORDER BY frequency, c_custkey) AS INT)
        |    AS f_tile,
        |  CAST(ntile(3) OVER (ORDER BY monetary, c_custkey) AS INT)
        |    AS m_tile
        |  FROM m)
        |SELECT c_custkey, recency, frequency, monetary,
        |  r_tile, f_tile, m_tile,
        |  CAST(r_tile * 100 + f_tile * 10 + m_tile AS INT) AS segment
        |FROM t ORDER BY c_custkey""".stripMargin,

    "events_rolling_wau" ->
      """WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |           FROM events),
        |x AS (SELECT day + CAST(k AS INT) AS window_end, user_id, day
        |      FROM e CROSS JOIN
        |        (SELECT unnest(range(0, 7)) AS k) ks)
        |SELECT window_end, count(DISTINCT user_id) AS wau,
        |  count(DISTINCT day) AS n_active_days
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "multimodal_pixel_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(n_chars % 64 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 48 + 1 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i
        |       FROM dims),
        |v AS (SELECT doc_id, w, h, (doc_id + i) % 251 AS p FROM px)
        |SELECT doc_id, CAST(max(w) AS INT) AS width,
        |  CAST(max(h) AS INT) AS height,
        |  count(*) AS n_pixels,
        |  CAST(sum(p) AS BIGINT) AS px_sum,
        |  round(CAST(sum(p) AS DOUBLE) / count(*), 6) AS px_mean,
        |  CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max,
        |  CAST(sum(CASE WHEN p < 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dark
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256,
        |  md5(p_name || '|' || p_brand) AS h_composite,
        |  substring(md5(p_name), 1, 2) AS shard
        |FROM part ORDER BY p_partkey""".stripMargin,

    "join_pit_scd2" ->
      """WITH flips AS (SELECT DISTINCT l_orderkey AS key
        |               FROM lineitem WHERE l_returnflag = 'R'),
        |base AS (SELECT o.o_orderkey AS key, o.o_orderstatus,
        |           CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |           CASE WHEN f.key IS NULL THEN 0 ELSE 1 END AS flips
        |         FROM orders o LEFT JOIN flips f
        |           ON o.o_orderkey = f.key),
        |dim AS (
        |  SELECT key, o_orderstatus AS status,
        |    CAST(NULL AS DATE) AS valid_from,
        |    CASE WHEN flips = 1 THEN o_orderdate + 30 END AS valid_to
        |  FROM base
        |  UNION ALL
        |  SELECT key, 'R', o_orderdate + 30, NULL
        |  FROM base WHERE flips = 1)
        |SELECT d.status AS pit_status, l.l_returnflag,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS qty
        |FROM lineitem l JOIN dim d ON l.l_orderkey = d.key
        |WHERE (d.valid_from IS NULL
        |       OR CAST(l.l_shipdate AS DATE) >= d.valid_from)
        |  AND (d.valid_to IS NULL
        |       OR CAST(l.l_shipdate AS DATE) < d.valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9)))
        |               AS DOUBLE) / count(*), 6) AS m
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type,
        |        round(CAST(sum(CAST(m AS DECIMAL(18,6))) AS DOUBLE)
        |              / count(*), 9) AS g
        |      FROM daily GROUP BY 1),
        |sd AS (SELECT d.event_type, d.day,
        |         sum(CAST(round(m - g, 9) AS DECIMAL(28,9)))
        |           OVER (PARTITION BY d.event_type ORDER BY d.day
        |                 ROWS UNBOUNDED PRECEDING) AS cs
        |       FROM daily d JOIN g ON d.event_type = g.event_type),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(cs) DESC, day) AS rk
        |      FROM sd)
        |SELECT event_type, day AS cp_day,
        |  round(CAST(cs AS DOUBLE), 6) AS cusum,
        |  CASE WHEN cs > 0 THEN 'above' ELSE 'below' END AS direction
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "events_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) >
        |              sum(CASE WHEN event_type = 'click'
        |                       THEN 1 ELSE 0 END)
        |         THEN 1 ELSE 0 END AS converted,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |              < '8'
        |         THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |agg AS (SELECT
        |  CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
        |       AS BIGINT) AS c_a,
        |  CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
        |       AS BIGINT) AS c_b
        |  FROM u),
        |r AS (SELECT n_a, n_b, c_a, c_b,
        |        round(c_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
        |        round(c_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
        |        round((c_a + c_b) / CAST(n_a + n_b AS DOUBLE), 9)
        |          AS p_pool
        |      FROM agg),
        |z AS (SELECT n_a, n_b, c_a, c_b, rate_a, rate_b,
        |        round(rate_b - rate_a, 6) AS lift,
        |        CASE WHEN p_pool > 0 AND p_pool < 1 THEN
        |          round((rate_b - rate_a) / sqrt(p_pool * (1 - p_pool) *
        |            (1.0/n_a + 1.0/n_b)), 6) END AS z_score
        |      FROM r)
        |SELECT *, CASE WHEN z_score IS NOT NULL AND abs(z_score) > 1.96
        |          THEN 1 ELSE 0 END
        |  AS significant
        |FROM z""".stripMargin,

    "docs_keyphrase_rake" ->
      """WITH ex AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS i,
        |              ts
        |            FROM (SELECT doc_id, string_split(text, ' ') AS ts
        |                  FROM documents)),
        |tok AS (SELECT doc_id, i AS pos, ts[i] AS t,
        |          CASE WHEN ts[i] IN ('the','of','and','to','in','a',
        |                              'is','for')
        |               THEN 1 ELSE 0 END AS is_stop
        |        FROM ex),
        |runs AS (SELECT *, sum(is_stop) OVER (PARTITION BY doc_id
        |           ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
        |         FROM tok),
        |t2 AS (SELECT *, count(*) OVER (PARTITION BY doc_id, grp)
        |         AS plen
        |       FROM runs WHERE is_stop = 0),
        |wsc AS (SELECT doc_id, t,
        |          round(CAST(sum(plen) AS DOUBLE) / count(*), 9) AS ws
        |        FROM t2 GROUP BY 1, 2),
        |ph AS (SELECT t2.doc_id, grp,
        |         string_agg(t2.t, ' ' ORDER BY pos) AS phrase,
        |         round(CAST(sum(CAST(ws AS DECIMAL(28,9))) AS DOUBLE),
        |               6) AS score
        |       FROM t2 JOIN wsc ON t2.doc_id = wsc.doc_id
        |                       AND t2.t = wsc.t
        |       GROUP BY 1, 2),
        |dd AS (SELECT doc_id, phrase, max(score) AS score FROM ph
        |       GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, phrase) AS INT) AS rk
        |      FROM dd)
        |SELECT doc_id, phrase, score, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "events_peak_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |             AS BIGINT) AS session_id
        |      FROM m),
        |sess AS (SELECT user_id, session_id,
        |           epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |         FROM g GROUP BY 1, 2),
        |ep AS (SELECT user_id * 1000000 + session_id AS sid,
        |         s_us AS us, 1::BIGINT AS delta
        |       FROM sess
        |       UNION ALL
        |       SELECT user_id * 1000000 + session_id, e_us, -1::BIGINT
        |       FROM sess),
        |rs AS (SELECT *,
        |         CAST(sum(delta) OVER (ORDER BY us, delta DESC, sid
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc,
        |         CAST(make_timestamp(us) AS DATE) AS day
        |       FROM ep),
        |r2 AS (SELECT day, conc, us,
        |         row_number() OVER (PARTITION BY day
        |           ORDER BY conc DESC, us, sid) AS rk
        |       FROM rs)
        |SELECT day, conc AS peak, make_timestamp(us) AS at_ts
        |FROM r2 WHERE rk = 1 ORDER BY day""".stripMargin,

    "docs_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |              FROM documents),
        |len AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
        |        FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |          FROM len),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
        |       WHERE t IN ('hash', 'join', 'spark') GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
        |           ((tf * 2.2) /
        |            (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 9)
        |           AS ts
        |       FROM tf JOIN df USING (t) JOIN len USING (doc_id)
        |       CROSS JOIN stats),
        |agg AS (SELECT doc_id,
        |          round(CAST(sum(CAST(ts AS DECIMAL(28,9)))
        |                     AS DOUBLE), 6) AS score,
        |          count(*) AS n_terms
        |        FROM sc GROUP BY 1),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (ORDER BY score DESC, doc_id) AS INT) AS rk
        |      FROM agg)
        |SELECT doc_id, n_terms, score, rk FROM r WHERE rk <= 10
        |ORDER BY rk""".stripMargin,

    "orders_cohort_ltv" ->
      """WITH f AS (SELECT o_custkey,
        |             date_trunc('month', min(o_orderdate)) AS cohort
        |           FROM orders GROUP BY 1),
        |o AS (SELECT orders.o_custkey,
        |        date_trunc('month', o_orderdate) AS m,
        |        o_totalprice, cohort
        |      FROM orders JOIN f ON orders.o_custkey = f.o_custkey),
        |b AS (SELECT cohort,
        |        CAST(datediff('month', cohort, m) AS INT) AS month_offset,
        |        count(*) AS n_orders,
        |        count(DISTINCT o_custkey) AS n_active,
        |        sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |          AS rev
        |      FROM o GROUP BY 1, 2)
        |SELECT CAST(cohort AS DATE) AS cohort, month_offset, n_orders,
        |  n_active, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY month_offset)
        |       AS DOUBLE) AS cum_revenue
        |FROM b ORDER BY cohort, month_offset""".stripMargin,

    "events_anomaly_mad" ->
      """WITH v AS (SELECT event_id, event_type, value FROM events),
        |r1 AS (SELECT *,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |       FROM v),
        |med AS (SELECT event_type, avg(value) AS med FROM r1
        |        WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2
        |        GROUP BY event_type),
        |d AS (SELECT v.event_id, v.event_type, v.value, m.med,
        |        abs(v.value - m.med) AS dev
        |      FROM v JOIN med m USING (event_type)),
        |r2 AS (SELECT *,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY dev, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |       FROM d),
        |mad AS (SELECT event_type, avg(dev) AS mad FROM r2
        |        WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2
        |        GROUP BY event_type)
        |SELECT d.event_id, d.event_type, round(d.value, 6) AS value,
        |  round(d.med, 6) AS med, round(m2.mad, 6) AS mad,
        |  round(d.dev, 6) AS dev
        |FROM d JOIN mad m2 USING (event_type)
        |WHERE d.dev > 4.4478 * m2.mad
        |ORDER BY d.event_id""".stripMargin,

    "emb_sign_hamming_topk" ->
      """WITH ex AS (SELECT vec_id,
        |              unnest(range(1, len(embedding) + 1)) AS i,
        |              embedding
        |            FROM embeddings),
        |bits AS (SELECT vec_id,
        |           -- bit 63 spelled as the min-long literal: DuckDB
        |           -- range-checks 1 << 63 where Java shiftleft wraps
        |           bit_or(CASE WHEN embedding[i] <= 0 THEN 0::BIGINT
        |                  WHEN i = 64
        |                  THEN (-9223372036854775807 - 1)::BIGINT
        |                  ELSE 1::BIGINT << (i - 1) END) AS sig
        |         FROM ex GROUP BY vec_id),
        |q AS (SELECT * FROM bits WHERE vec_id % 10 = 0),
        |c AS (SELECT * FROM bits WHERE vec_id % 10 <> 0),
        |p AS (SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
        |        CAST(bit_count(xor(q.sig, c.sig)) AS INT) AS hamming
        |      FROM q JOIN c ON true),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY vec_id
        |         ORDER BY hamming, neighbor_id) AS INT) AS rk
        |      FROM p)
        |SELECT vec_id, neighbor_id, hamming, rk FROM r WHERE rk <= 10
        |ORDER BY vec_id, rk""".stripMargin,

    "emb_maxsim_topk" ->
      s"""WITH v AS (SELECT vec_id, vec_id // 5 AS doc, embedding
        |           FROM embeddings),
        |q AS (SELECT * FROM v WHERE doc % 10 = 0),
        |c AS (SELECT * FROM v WHERE doc % 10 <> 0),
        |p AS (SELECT a.doc AS qdoc, a.vec_id AS qv, b.doc AS doc,
        |        round(${OracleDocs.cosinePair}, 6) AS cs
        |      FROM q a JOIN c b ON true),
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

    "merge_upsert_delete" ->
      """WITH target AS (
        |  SELECT o_orderkey AS key, o_orderstatus, o_custkey
        |  FROM orders),
        |ret AS (SELECT l_orderkey, count(*) AS n_returned
        |        FROM lineitem WHERE l_returnflag = 'R'
        |        GROUP BY 1 HAVING l_orderkey % 97 <> 0),
        |cdc AS (
        |  SELECT l_orderkey AS key, 'U' AS op, 'R' AS new_status,
        |    n_returned
        |  FROM ret
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, 'U', 'N', n_returned
        |  FROM ret WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT key, 'D', NULL, CAST(0 AS BIGINT)
        |  FROM target WHERE key % 97 = 0)
        |SELECT coalesce(t.key, c.key) AS key,
        |  coalesce(c.new_status, t.o_orderstatus) AS status,
        |  coalesce(c.n_returned, 0) AS n_returned,
        |  CASE WHEN c.op IS NULL THEN 'keep'
        |       WHEN t.o_orderstatus IS NULL THEN 'insert'
        |       ELSE 'update' END AS action
        |FROM target t FULL OUTER JOIN cdc c ON t.key = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY key""".stripMargin,

    "events_twap_daily" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS us,
        |    event_id, value
        |  FROM events),
        |n AS (SELECT *, lead(us) OVER (PARTITION BY user_id, day
        |                               ORDER BY us, event_id) AS next_us
        |      FROM e),
        |sp AS (SELECT user_id, day, (next_us - us) // 1000 AS dur_ms,
        |         CAST(round(value * ((next_us - us) // 1000), 6)
        |              AS DECIMAL(28,6)) AS wv
        |       FROM n WHERE next_us IS NOT NULL)
        |SELECT user_id, day, count(*) AS n_spans,
        |  CAST(sum(dur_ms) AS BIGINT) AS total_ms,
        |  round(CAST(sum(wv) AS DOUBLE) / sum(dur_ms), 6) AS twap
        |FROM sp GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,
  )
}
