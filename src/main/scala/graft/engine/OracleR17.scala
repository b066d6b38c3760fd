package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for the round-12 keys (QueriesR17). */
object OracleR17 {
  val sql: ListMap[String, String] = ListMap(

    // The sql_* keys run through graft.Sql (spark.sql over registered
    // views); the oracles restate the same relational content in
    // DuckDB's dialect — hash equality proves the SQL front door
    // compiles to the same results as the engine's DSL path.
    "sql_join_revenue" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(o_orderdate AS DATE)
        |      BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "sql_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders WHERE o_custkey <= 200) t
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,

    "sql_lateral_tokens" ->
      """SELECT doc_id, i AS pos, tokens[i] AS tok
        |FROM (SELECT doc_id, tokens,
        |        unnest(range(1, len(tokens) + 1)) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tokens
        |            FROM documents WHERE doc_id < 50) t1) t2
        |ORDER BY doc_id, pos""".stripMargin,

    // Same relational content as expr_native_cosine's oracle — the
    // engine side differs only in ARRIVING THROUGH SQL TEXT.
    "sql_expr_cosine" ->
      s"""SELECT a.vec_id AS vec_id,
        |  round(${OracleDocs.cosinePair}, 6) AS cos_next
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY vec_id""".stripMargin,

    // The progressive fixture's closed-form block model, re-derived
    // without touching a JPEG: nbx = id%2+1, nby = (id/2)%3+1 blocks,
    // block i uniform at 2*((id*37 + i*71) % 128).
    "multimodal_decode_jpeg_progressive" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 2 + 1 AS nbx,
        |         (doc_id // 2) % 3 + 1 AS nby
        |  FROM documents),
        |blk AS (SELECT doc_id, nbx, nby,
        |          unnest(range(0, nbx * nby)) AS i
        |        FROM dims),
        |v AS (SELECT doc_id, nbx, nby, i,
        |        2 * ((doc_id * 37 + i * 71) % 128) AS p
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

    // The same extraction pipeline through DuckDB's RE2 engine (the
    // 'g' flag makes each replace global, matching Spark's default).
    "docs_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style>p{color:red}</style></head><body><p>' ||
        |    substr(text, 1, 80) ||
        |    '</p><!-- boilerplate --><p>tail &amp; &lt;tag&gt; ' ||
        |    (doc_id % 50) || ' &quot;q&quot;</p></body></html>' AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(html,
        |          '(?s)<head>.*?</head>', '', 'g'),
        |        '(?s)<!--.*?-->', '', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<', 'g'),
        |        '&gt;', '>', 'g'),
        |        '&quot;', '"', 'g'),
        |        '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g'),
        |      '^ | $', '', 'g') AS body_text
        |  FROM h)
        |SELECT doc_id, title, body_text,
        |  CAST(length(body_text) AS INT) AS n_body_chars
        |FROM x ORDER BY doc_id""".stripMargin,

    // The normalization chain again (see docs_url_normalize), grouped
    // on the canonical form — min-id keeper per URL.
    "docs_dedup_url" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
        |    || '://WWW.Site' || (doc_id % 7) || '.COM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN
        |          (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
        |        WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
        |    || '/A' || (doc_id % 5) || '/b'
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&q=' || (doc_id % 10)
        |    || '&a=' || (doc_id % 3)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
        |      AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1))
        |      AS host,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]*:([0-9]+)', 1)
        |      AS port,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
        |      AS path0,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query0
        |  FROM raw),
        |norm AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |            OR (scheme = 'https' AND port = '443') THEN ''
        |          ELSE ':' || port END) ||
        |    (CASE WHEN regexp_replace(path0, '/$', '') = '' THEN '/'
        |          ELSE regexp_replace(path0, '/$', '') END) ||
        |    (CASE WHEN array_to_string(list_sort(list_filter(
        |            string_split(query0, '&'),
        |            p -> NOT starts_with(p, 'utm_'))), '&') = '' THEN ''
        |          ELSE '?' || array_to_string(list_sort(list_filter(
        |            string_split(query0, '&'),
        |            p -> NOT starts_with(p, 'utm_'))), '&') END)
        |      AS url_norm
        |  FROM parts)
        |SELECT url_norm, min(doc_id) AS keeper,
        |  count(*) AS n_dups
        |FROM norm GROUP BY url_norm ORDER BY url_norm""".stripMargin,

    // The same capped-space containment recomputed from scratch:
    // kept = shingles with df <= 64; containment over kept shingles.
    "docs_dedup_containment" ->
      """WITH g AS (SELECT DISTINCT doc_id, substr(text, i, 12) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) - 10, 4)) AS i
        |        FROM documents WHERE length(text) >= 12) z),
        |kept AS (
        |  SELECT g.doc_id, g.gram FROM g
        |  JOIN (SELECT gram FROM g GROUP BY gram
        |        HAVING count(*) <= 64) keep USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    count(*) AS n_shared
        |  FROM kept a JOIN kept b
        |    ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, n_shared, s1.sz AS sz1, s2.sz AS sz2,
        |  round(CAST(n_shared AS DOUBLE) / least(s1.sz, s2.sz), 6)
        |    AS containment
        |FROM inter
        |JOIN sz s1 ON s1.doc_id = id1
        |JOIN sz s2 ON s2.doc_id = id2
        |WHERE n_shared * 5 >= least(s1.sz, s2.sz) * 3
        |ORDER BY id1, id2""".stripMargin,

    // An INDEPENDENT parse of the same synthesized URLs: DuckDB
    // regexes + list functions re-derive the canonical form.
    "docs_url_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
        |    || '://WWW.Site' || (doc_id % 7) || '.COM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN
        |          (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
        |        WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
        |    || '/A' || (doc_id % 5) || '/b'
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&q=' || (doc_id % 10)
        |    || '&a=' || (doc_id % 3)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
        |      AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1))
        |      AS host,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]*:([0-9]+)', 1)
        |      AS port,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
        |      AS path0,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query0
        |  FROM raw),
        |norm AS (
        |  SELECT doc_id, scheme, host,
        |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |           OR (scheme = 'https' AND port = '443') THEN ''
        |         ELSE ':' || port END AS portseg,
        |    CASE WHEN regexp_replace(path0, '/$', '') = '' THEN '/'
        |         ELSE regexp_replace(path0, '/$', '') END AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(query0, '&'),
        |      p -> NOT starts_with(p, 'utm_'))), '&') AS qnorm
        |  FROM parts)
        |SELECT doc_id,
        |  scheme || '://' || host || portseg || path ||
        |    (CASE WHEN qnorm = '' THEN '' ELSE '?' || qnorm END)
        |    AS url_norm,
        |  host,
        |  CAST(len(list_filter(string_split(qnorm, '&'), p -> p <> ''))
        |    AS INT) AS n_params
        |FROM norm ORDER BY doc_id""".stripMargin,

    // The identical IEEE recurrence stepped by a recursive CTE
    // (alpha = beta = 1/2: adds and exact halvings only, so both
    // engines produce the same doubles before the 6-dp round).
    "events_holt_trend" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |      AS i
        |  FROM events),
        |nn AS (SELECT user_id, max(i) AS n FROM o GROUP BY user_id),
        |hw(user_id, i, lev, tr) AS (
        |  SELECT user_id, CAST(1 AS BIGINT), value, CAST(0.0 AS DOUBLE)
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.user_id, o.i,
        |    (o.value + h.lev + h.tr) / 2,
        |    (((o.value + h.lev + h.tr) / 2) - h.lev + h.tr) / 2
        |  FROM hw h JOIN o
        |    ON o.user_id = h.user_id AND o.i = h.i + 1)
        |SELECT h.user_id, nn.n AS n_events,
        |  round(h.lev, 6) AS level, round(h.tr, 6) AS trend,
        |  round(h.lev + h.tr, 6) AS forecast_1
        |FROM hw h JOIN nn ON nn.user_id = h.user_id AND h.i = nn.n
        |ORDER BY h.user_id""".stripMargin,

    // An INDEPENDENT traversal of the same graph: recursive CTE
    // expanding (typ, id, dist) triples, min(dist) per node = BFS.
    "graph_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT l_suppkey AS sup, o_custkey AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |bfs(typ, id, dist) AS (
        |  SELECT 's', s_suppkey, 0 FROM supplier
        |  WHERE s_suppkey % 50 = 1
        |  UNION
        |  SELECT CASE WHEN b.typ = 's' THEN 'c' ELSE 's' END,
        |         CASE WHEN b.typ = 's' THEN e.cust ELSE e.sup END,
        |         b.dist + 1
        |  FROM bfs b JOIN e
        |    ON (b.typ = 's' AND e.sup = b.id)
        |    OR (b.typ = 'c' AND e.cust = b.id)
        |  WHERE b.dist < 3)
        |SELECT typ, id, CAST(min(dist) AS INT) AS dist
        |FROM bfs GROUP BY typ, id ORDER BY typ, id""".stripMargin,

    // Per-frame closed form: frame f of doc d has lines A1(d,f)*64 at
    // bin 32 and A2(d,f)*32 at bin 16; energy 16*(4*A1^2 + 2*A2^2).
    "multimodal_audio_stft" ->
      """WITH fr AS (
        |  SELECT doc_id, unnest(range(0, CAST(doc_id % 3 + 2 AS INT)))
        |    AS frame
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, frame,
        |    ((doc_id * 7 + frame * 11) % 40) + 10 AS a1,
        |    2 * ((doc_id * 13 + frame * 5) % 40) + 15 AS a2
        |  FROM fr)
        |SELECT doc_id, CAST(frame AS INT) AS frame,
        |  round(CAST(a1 * 64 AS DOUBLE), 4) AS mag_half,
        |  round(CAST(a2 * 32 AS DOUBLE), 4) AS mag_quarter,
        |  CAST(CASE WHEN a2 * 32 > a1 * 64 THEN 16 ELSE 32 END AS INT)
        |    AS peak_bin,
        |  CAST(16 * (4 * a1 * a1 + 2 * a2 * a2) AS BIGINT) AS energy
        |FROM p ORDER BY doc_id, frame""".stripMargin,

    // GIF is lossless: the pixel model p(i) = (3*doc_id + i) % 251
    // over i = 0..w*h-1 restated directly (the PNG oracle posture).
    "multimodal_decode_gif" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(n_chars % 40 + 1 AS INT) AS w,
        |    CAST(doc_id % 24 + 1 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h),
        |      i -> (3 * doc_id + i) % 251) AS p
        |  FROM d)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(list_sum(p) AS BIGINT) AS px_sum,
        |  CAST(list_aggregate(p, 'min') AS INT) AS px_min,
        |  CAST(list_aggregate(p, 'max') AS INT) AS px_max,
        |  CAST(p[1] AS INT) AS px_first,
        |  CAST(p[w * h] AS INT) AS px_last
        |FROM px ORDER BY doc_id""".stripMargin,

    // The two-tone signal's spectrum in closed form: lines only at
    // n/2 (A1*n) and n/4 (A2*n/2); DC exactly zero; energy
    // (n/4)*(4*A1^2 + 2*A2^2); A2 odd => no peak ties.
    "multimodal_audio_fft" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(64 * power(2, doc_id % 4) AS BIGINT) AS n,
        |    (doc_id * 7) % 40 + 10 AS a1,
        |    2 * ((doc_id * 13) % 40) + 15 AS a2
        |  FROM documents)
        |SELECT doc_id, CAST(n AS INT) AS n,
        |  round(CAST(a1 * n AS DOUBLE), 4) AS mag_half,
        |  round(CAST(a2 * n / 2 AS DOUBLE), 4) AS mag_quarter,
        |  CAST(CASE WHEN a2 * n / 2 > a1 * n THEN n / 4 ELSE n / 2 END
        |    AS INT) AS peak_bin,
        |  CAST(0.0 AS DOUBLE) AS mag_dc,
        |  CAST((n / 4) * (4 * a1 * a1 + 2 * a2 * a2) AS BIGINT) AS energy
        |FROM p ORDER BY doc_id""".stripMargin,

    // The 3-D file-grain Z-order layout changes what is SCANNED,
    // never what is returned — the oracle is the plain box aggregate.
    "lake_zorder_files" ->
      """SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
        |    AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |      BETWEEN '1994-01-01' AND '1995-12-31'
        |  AND o_custkey BETWEEN 1 AND 750
        |  AND CAST(round(o_totalprice, 2) AS DOUBLE)
        |      BETWEEN 50000 AND 150000
        |GROUP BY 1 ORDER BY month""".stripMargin,
  )
}
