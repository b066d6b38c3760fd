package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-8 keys. `emb_semdedup` re-derives the
  * shared k-means codebook through `OracleKmeans.codebookCtes` (the
  * emb_ann_ivf precedent — bit-identical centroids), so assignment and
  * the within-cell kill rule are pinned by the same SQL chain the IVF
  * family already hash-matches. The sparse-similarity and perplexity
  * oracles reuse the DECIMAL(28,9) order-proof accumulator spelling
  * from docs_lm_score.
  */
object OracleR11 {
  private val cosinePair =
    """list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
      |      / (sqrt(list_aggregate(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum'))
      |       * sqrt(list_aggregate(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum')))""".stripMargin

  /** One power iteration over `e(vec_id, x)` given `v$p(v)` →
    * `v$i(v)`; same rounding ladder as the Spark kernel. */
  private def pcaIter(i: Int, p: String): String =
    s"""s$i AS (SELECT e.vec_id, e.x,
       |    round(list_aggregate(list_transform(list_zip(e.x, vv.v),
       |      q -> q[1] * q[2]), 'sum'), 6) AS sc
       |  FROM e, v$p vv),
       |t$i AS (SELECT j, CAST(round(xj * sc, 9) AS DECIMAL(28,9)) AS t
       |  FROM (SELECT sc, unnest(x) AS xj,
       |          unnest(range(1, len(x) + 1)) AS j FROM s$i) q),
       |w$i AS (SELECT j, CAST(sum(t) AS DOUBLE) AS wj FROM t$i GROUP BY j),
       |a$i AS (SELECT list(wj ORDER BY j) AS w FROM w$i),
       |v$i AS (SELECT list_transform(w, y -> round(y /
       |    sqrt(list_aggregate(list_transform(w, z -> z * z), 'sum')), 6))
       |    AS v FROM a$i)""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "emb_pca_power" ->
      s"""WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
        |  FROM embeddings),
        |v0 AS (SELECT list_transform(x, y -> round(y /
        |    sqrt(list_aggregate(list_transform(x, z -> z * z), 'sum')), 6))
        |    AS v FROM e WHERE vec_id = 0),
        |${pcaIter(1, "0")},
        |${pcaIter(2, "1")},
        |${pcaIter(3, "2")}
        |SELECT CAST(j - 1 AS INTEGER) AS dim, v[j] AS loading
        |FROM (SELECT v, unnest(range(1, len(v) + 1)) AS j FROM v3) t
        |ORDER BY dim""".stripMargin,
    "emb_semdedup" ->
      s"""WITH ${OracleKmeans.codebookCtes},
        |rnk AS (SELECT a.vec_id, b.cid,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(${OracleKmeans.cosFD("a", "b")}, 6) DESC,
        |               b.cid) AS rn
        |  FROM embeddings a JOIN cent b ON true),
        |asg AS (SELECT e.vec_id, e.embedding, r.cid
        |        FROM embeddings e JOIN rnk r
        |          ON e.vec_id = r.vec_id AND r.rn = 1),
        |dup AS (SELECT a.vec_id, min(b.vec_id) AS dup_of
        |        FROM asg a JOIN asg b
        |          ON a.cid = b.cid AND b.vec_id < a.vec_id
        |        WHERE round($cosinePair, 6) > 0.45
        |        GROUP BY a.vec_id)
        |SELECT a.vec_id, a.cid, d.dup_of, d.dup_of IS NULL AS kept
        |FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    "docs_sparse_sim_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        |        GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT t.doc_id, t.term,
        |        round(t.tf * ln(CAST(n.n AS DOUBLE) / f.df), 6) AS wt
        |      FROM tf t JOIN dfq f USING (term), n
        |      WHERE f.df * 10 <= n.n),
        |nrm AS (SELECT doc_id,
        |          sqrt(CAST(sum(CAST(round(wt * wt, 9) AS DECIMAL(28,9)))
        |               AS DOUBLE)) AS nrm
        |        FROM w GROUP BY doc_id),
        |dot AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |          CAST(sum(CAST(round(a.wt * b.wt, 9) AS DECIMAL(28,9)))
        |               AS DOUBLE) AS dt
        |        FROM w a JOIN w b
        |          ON a.term = b.term AND a.doc_id < b.doc_id
        |        GROUP BY a.doc_id, b.doc_id),
        |sim AS (SELECT d.id1, d.id2,
        |          round(d.dt / (n1.nrm * n2.nrm), 6) AS cos
        |        FROM dot d JOIN nrm n1 ON d.id1 = n1.doc_id
        |                   JOIN nrm n2 ON d.id2 = n2.doc_id),
        |sym AS (SELECT id1 AS doc_id, id2 AS sim_doc, cos FROM sim
        |        UNION ALL
        |        SELECT id2 AS doc_id, id1 AS sim_doc, cos FROM sim),
        |r AS (SELECT doc_id, sim_doc, cos,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY cos DESC, sim_doc) AS rk
        |      FROM sym)
        |SELECT doc_id, sim_doc, cos, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    // Quantizations spelled as floor(x*10^s + 0.5) — the IEEE ops both
    // engines execute bit-identically — never library round(), whose
    // half-up tie handling differs per engine (the r13 sf0.1 sweep's
    // one divergence: a term on a 9dp boundary).
    "events_ewma" ->
      """WITH o AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS i
        |  FROM events),
        |contrib AS (SELECT user_id, i + k AS ti,
        |    CAST(floor(value * power(2.0, -k) * 1000000000.0 + 0.5)
        |         AS BIGINT) AS term_u
        |  FROM (SELECT user_id, i, value, unnest(range(0, 32)) AS k
        |        FROM o) t),
        |agg AS (SELECT user_id, ti, sum(term_u) AS num_u, count(*) AS m
        |        FROM contrib GROUP BY user_id, ti)
        |SELECT o.event_id, o.user_id, o.ts, o.value, a.m,
        |  floor((CAST(a.num_u AS DOUBLE) / 1e9
        |         / (2.0 - power(2.0, 1.0 - a.m))) * 1e6 + 0.5) / 1e6
        |    AS ewma
        |FROM o JOIN agg a ON o.user_id = a.user_id AND o.i = a.ti
        |ORDER BY o.event_id""".stripMargin,

    // one-shot direct aggregate on purpose: the Spark side merges two
    // slice partials, so the hash match PROVES merge ≡ one-shot
    "agg_incremental_refresh" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*), 6) AS avg_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY year(o_orderdate), o_orderstatus
        |ORDER BY o_year, o_orderstatus""".stripMargin,

    "dq_profile_drift" ->
      """WITH prof AS (
        |  SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-07-01'
        |              THEN 'a' ELSE 'b' END AS slice,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
        |             CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ss,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |         AS DOUBLE) AS n_null,
        |    CAST(count(DISTINCT o_totalprice) AS DOUBLE) AS nd,
        |    min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders GROUP BY 1),
        |a AS (SELECT * FROM prof WHERE slice = 'a'),
        |b AS (SELECT * FROM prof WHERE slice = 'b'),
        |m AS (
        |  SELECT 'mean' AS metric, round(a.sm / a.n, 6) AS val_a,
        |         round(b.sm / b.n, 6) AS val_b FROM a, b
        |  UNION ALL
        |  SELECT 'stddev',
        |         round(sqrt((a.ss - (a.sm / a.n) * a.sm) / a.n), 6),
        |         round(sqrt((b.ss - (b.sm / b.n) * b.sm) / b.n), 6)
        |  FROM a, b
        |  UNION ALL
        |  SELECT 'null_rate', round(a.n_null / a.n, 6),
        |         round(b.n_null / b.n, 6) FROM a, b
        |  UNION ALL SELECT 'n_distinct', a.nd, b.nd FROM a, b
        |  UNION ALL SELECT 'min', a.mn, b.mn FROM a, b
        |  UNION ALL SELECT 'max', a.mx, b.mx FROM a, b)
        |SELECT metric, val_a, val_b,
        |  round(abs(val_b - val_a) / nullif(abs(val_a), 0.0), 6) AS drift
        |FROM m ORDER BY metric""".stripMargin,

    // direct scan of the SOURCE table: a hash match proves the
    // fragmented->compacted rewrite preserved content exactly
    "maintenance_compact" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(md5(CAST(o_orderkey AS VARCHAR))) AS md5_min,
        |  max(md5(CAST(o_orderkey AS VARCHAR))) AS md5_max
        |FROM orders""".stripMargin,

    // brute-force cross filter on purpose: the hash match proves the
    // grid-binned equi join finds EXACTLY the radius pairs
    "join_spatial_grid" ->
      """WITH c AS (SELECT c_custkey,
        |    CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.5 AS c_lat,
        |    CAST((c_custkey * 7) % 360 AS DOUBLE) - 180 + 0.5 AS c_lon
        |  FROM customer
        |  WHERE abs(CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.5) <= 45),
        |s AS (SELECT s_suppkey,
        |    CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90 + 0.5 AS s_lat,
        |    CAST((s_suppkey * 29) % 360 AS DOUBLE) - 180 + 0.5 AS s_lon
        |  FROM supplier
        |  WHERE abs(CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90 + 0.5) <= 45),
        |p AS (SELECT s.s_suppkey, c.c_custkey,
        |    round(2 * 6371.0 * asin(sqrt(
        |      pow(sin((c.c_lat - s.s_lat) * pi() / 180 / 2), 2) +
        |      cos(s.s_lat * pi() / 180) * cos(c.c_lat * pi() / 180) *
        |      pow(sin((c.c_lon - s.s_lon) * pi() / 180 / 2), 2))), 4)
        |      AS dist_km
        |  FROM s, c)
        |SELECT s_suppkey, c_custkey, dist_km FROM p
        |WHERE dist_km <= 1000.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    // restates F from the source: only a write that replaced EXACTLY
    // the F partition (kept O/P, didn't append) can match this
    "sink_partition_overwrite" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
        |           CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 1 END)
        |       AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "emb_matryoshka_eval" ->
      """WITH pv AS (
        |  SELECT k.k AS dims,
        |    round(sqrt(list_aggregate(list_transform(
        |            list_slice(embedding, 1, k.k),
        |            x -> CAST(x AS DOUBLE) * x), 'sum'))
        |        / sqrt(list_aggregate(list_transform(embedding,
        |            x -> CAST(x AS DOUBLE) * x), 'sum')), 6) AS ret
        |  FROM embeddings, (VALUES (8), (16), (32), (64)) k(k))
        |SELECT dims,
        |  round(CAST(sum(CAST(round(ret, 9) AS DECIMAL(28,9))) AS DOUBLE)
        |        / count(*), 6) AS avg_retention,
        |  min(ret) AS min_retention
        |FROM pv GROUP BY dims ORDER BY dims""".stripMargin,

    // checksums the SOURCE texts (same newline flattening): a match
    // proves the gzip text round-trip preserved every line
    "scan_text_gzip" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(length(regexp_replace(text, '[\r\n]', ' ', 'g')))
        |       AS BIGINT) AS total_chars,
        |  min(md5(regexp_replace(text, '[\r\n]', ' ', 'g'))) AS md5_min,
        |  max(md5(regexp_replace(text, '[\r\n]', ' ', 'g'))) AS md5_max
        |FROM documents""".stripMargin,

    // the construction plants exactly 7 malformed lines among the
    // documents rows; parsing must recover every good row's n_chars
    "scan_json_corrupt" ->
      """SELECT count(*) AS n_good,
        |  CAST(7 AS BIGINT) AS n_corrupt,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_good
        |FROM documents""".stripMargin,

    "agg_mode_exact" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY cnt DESC, l_quantity) AS rn FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "docs_sentence_split" ->
      """WITH sents AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split_regex(text, '[.!?]+\s*'), t -> trim(t)),
        |      t -> t != '') AS l
        |  FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS sent_idx,
        |  CAST(len(string_split(l[i], ' ')) AS INTEGER) AS n_tokens,
        |  md5(l[i]) AS sent_md5
        |FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
        |      FROM sents) t
        |ORDER BY doc_id, sent_idx""".stripMargin,

    "docs_pmi_cooccur" ->
      """WITH tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w,
        |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        |        FROM documents) t),
        |pairs AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
        |  FROM tok a JOIN tok b
        |    ON a.doc_id = b.doc_id
        |   AND b.pos > a.pos AND b.pos <= a.pos + 2),
        |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY w1, w2),
        |cx AS (SELECT w, count(*) AS c_x FROM tok GROUP BY w),
        |tot AS (SELECT (SELECT count(*) FROM tok) AS n_tok,
        |               (SELECT count(*) FROM pairs) AS n_pair)
        |SELECT p.w1, p.w2, p.c_xy,
        |  round(ln((CAST(p.c_xy AS DOUBLE) * t.n_tok * t.n_tok) /
        |           (CAST(t.n_pair AS DOUBLE) * x1.c_x * x2.c_x)), 6) AS pmi
        |FROM cxy p
        |JOIN cx x1 ON p.w1 = x1.w
        |JOIN cx x2 ON p.w2 = x2.w, tot t
        |WHERE p.c_xy >= 5
        |ORDER BY pmi DESC, p.w1, p.w2
        |LIMIT 50""".stripMargin,

    "docs_perplexity_buckets" ->
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
        |  FROM dt d JOIN model m USING (t), nv),
        |scored AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(term) AS DOUBLE) / CAST(SUM(c_doc) AS DOUBLE), 6)
        |      AS cross_entropy
        |  FROM terms GROUP BY doc_id),
        |tiled AS (
        |  SELECT doc.doc_id, doc.lang, s.cross_entropy,
        |    ntile(3) OVER (PARTITION BY doc.lang
        |                   ORDER BY s.cross_entropy, doc.doc_id) AS tile
        |  FROM documents doc JOIN scored s ON doc.doc_id = s.doc_id)
        |SELECT doc_id, lang, cross_entropy,
        |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM tiled ORDER BY doc_id""".stripMargin
  )
}
