package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-9 wave-3 keys. The logreg oracle
  * unrolls the 4 gradient steps as CTE pairs (g_i → w_i), the
  * docs_bpe_train precedent: train and apply both pinned in SQL.
  * Everything rides IEEE-exact ops (+,·,/,abs) — no exp/ln —
  * so the weight trajectory is bit-identical by construction, not by
  * libm luck.
  */
object OracleR13 {

  /** σ(z)·f gradient-term builder: the algebraic logistic surrogate
    * 0.5 + 0.5·z/(1+|z|) with z spelled in the same left-associated
    * order as the Spark Column expression. */
  private def zExpr = "(w0 + w1*f1 + w2*f2 + w3*f3)"
  private def pExpr = s"(0.5 + 0.5*($zExpr / (1 + abs($zExpr))))"
  private def gradCte(g: String, prevW: String): String = {
    def term(mul: String) =
      s"sum(CAST(round(($pExpr - y)$mul, 9) AS DECIMAL(28,9)))"
    s"""$g AS (SELECT ${term("")} AS g0, ${term(" * f1")} AS g1,
       |  ${term(" * f2")} AS g2, ${term(" * f3")} AS g3, count(*) AS n
       |  FROM feat CROSS JOIN $prevW)""".stripMargin
  }
  private def stepCte(w: String, g: String, prevW: String): String = {
    def upd(j: Int) =
      s"round(w$j - 1.0*(CAST(g$j AS DOUBLE)/n), 9) AS w$j"
    s"""$w AS (SELECT ${upd(0)}, ${upd(1)}, ${upd(2)}, ${upd(3)}
       |  FROM $g CROSS JOIN $prevW)""".stripMargin
  }
  private val steps = (1 to 6).map { i =>
    gradCte(s"g$i", if (i == 1) "w0_init" else s"w${i - 1}") + ",\n" +
      stepCte(s"w$i", s"g$i", if (i == 1) "w0_init" else s"w${i - 1}")
  }.mkString(",\n")

  /** The exact-kNN vote CTE chain over the mod-5 holdout — the body
    * both emb_knn_classify and emb_knn_eval share (eval re-derives
    * the predictions, then aggregates them into per-label metrics). */
  private val knnVoteCtes =
    s"""q AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
      |c AS (SELECT * FROM embeddings WHERE vec_id % 5 <> 0),
      |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nid, b.label AS label,
      |        round(${OracleDocs.cosinePair}, 6) AS cs
      |      FROM q a JOIN c b ON a.vec_id <> b.vec_id),
      |r AS (SELECT vec_id, nid, label, cs,
      |        row_number() OVER (PARTITION BY vec_id
      |                           ORDER BY cs DESC, nid) AS rk
      |      FROM p),
      |v AS (SELECT vec_id, label,
      |        sum(CAST(cs AS DECIMAL(18,6))) AS w
      |      FROM r WHERE rk <= 10 GROUP BY vec_id, label),
      |best AS (SELECT vec_id, label, w,
      |           row_number() OVER (PARTITION BY vec_id
      |                              ORDER BY w DESC, label) AS brk
      |         FROM v)""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "events_cep_pattern" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |m AS (
        |  SELECT *,
        |    max(CASE WHEN event_type = 'signup' THEN rn END) OVER w AS ls,
        |    max(CASE WHEN event_type = 'error'  THEN rn END) OVER w AS le
        |  FROM seq
        |  WINDOW w AS (PARTITION BY user_id ORDER BY rn
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT p.user_id, s.event_id AS signup_id,
        |       p.event_id AS purchase_id,
        |       s.ts AS t_signup, p.ts AS t_purchase,
        |       CAST(p.rn - s.rn - 1 AS BIGINT) AS n_between
        |FROM m p JOIN seq s ON p.user_id = s.user_id AND p.ls = s.rn
        |WHERE p.event_type = 'purchase' AND p.ls IS NOT NULL
        |  AND (p.le IS NULL OR p.le < p.ls)
        |  AND epoch_us(p.ts) - epoch_us(s.ts) <= 86400000000
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    "emb_knn_outlier_score" ->
      s"""WITH p AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nid,
        |    round(${OracleDocs.cosinePair}, 6) AS cs
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, cs,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY cs DESC, nid) AS rk
        |      FROM p)
        |SELECT vec_id, cs AS knn10_sim FROM r WHERE rk = 10
        |ORDER BY vec_id""".stripMargin,

    "events_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, ts AS t_ts,
        |        event_type AS channel
        |      FROM events WHERE event_type IN ('view', 'click')),
        |pr AS (SELECT p.p_id, p.value, t.t_id, t.t_ts, t.channel
        |       FROM p JOIN t ON p.user_id = t.user_id
        |       WHERE t.t_ts < p.p_ts
        |         AND epoch_us(p.p_ts) - epoch_us(t.t_ts)
        |             <= 86400000000),
        |rk AS (SELECT *,
        |         row_number() OVER (PARTITION BY p_id
        |                            ORDER BY t_ts, t_id) AS rf,
        |         row_number() OVER (PARTITION BY p_id
        |                            ORDER BY t_ts DESC, t_id DESC) AS rl,
        |         count(*) OVER (PARTITION BY p_id) AS n
        |       FROM pr),
        |ft AS (SELECT channel,
        |         sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS rev
        |       FROM rk WHERE rf = 1 GROUP BY 1),
        |lt AS (SELECT channel,
        |         sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS rev
        |       FROM rk WHERE rl = 1 GROUP BY 1),
        |lin AS (SELECT channel,
        |          sum(CAST(round(value / n, 6) AS DECIMAL(18,6))) AS rev
        |        FROM rk GROUP BY 1)
        |SELECT model, channel, CAST(rev AS DOUBLE) AS revenue FROM (
        |  SELECT 'first_touch' AS model, channel, rev FROM ft
        |  UNION ALL SELECT 'last_touch', channel, rev FROM lt
        |  UNION ALL SELECT 'linear', channel, rev FROM lin)
        |ORDER BY model, channel""".stripMargin,

    "docs_phrase_search" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
        |             FROM documents),
        |ex AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS i, ts
        |       FROM tok),
        |terms AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |            ts[i] AS term FROM ex),
        |t0 AS (SELECT doc_id, pos FROM terms WHERE term = 'hash'),
        |t1 AS (SELECT doc_id, pos - 1 AS pos FROM terms
        |       WHERE term = 'join')
        |SELECT t0.doc_id, count(*) AS n_hits,
        |       min(t0.pos) AS first_pos
        |FROM t0 JOIN t1 ON t0.doc_id = t1.doc_id AND t0.pos = t1.pos
        |GROUP BY t0.doc_id ORDER BY t0.doc_id""".stripMargin,

    "basket_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |tot AS (SELECT count(DISTINCT okey) AS n_baskets FROM items),
        |cnt AS (SELECT item, count(*) AS n_item FROM items GROUP BY 1),
        |pairs AS (SELECT a.item AS ante, b.item AS cons,
        |            count(*) AS pair_n
        |          FROM items a JOIN items b
        |            ON a.okey = b.okey AND a.item <> b.item
        |          GROUP BY 1, 2)
        |SELECT ante, cons, pair_n,
        |  round(CAST(pair_n AS DOUBLE) / n_baskets, 6) AS support,
        |  round(CAST(pair_n AS DOUBLE) / ca.n_item, 6) AS confidence,
        |  round(CAST(n_baskets * pair_n AS DOUBLE)
        |        / (ca.n_item * cb.n_item), 6) AS lift
        |FROM pairs
        |JOIN cnt ca ON ca.item = pairs.ante
        |JOIN cnt cb ON cb.item = pairs.cons
        |CROSS JOIN tot
        |WHERE pair_n * 200 >= n_baskets
        |ORDER BY ante, cons""".stripMargin,

    "fn_regexp" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)
        |    AS brand_num,
        |  regexp_extract(p_name, '^[a-z]+') AS first_word,
        |  CAST(length(regexp_replace(p_name, '[^aeiou]', '', 'g'))
        |    AS BIGINT) AS n_vowels,
        |  array_to_string(regexp_extract_all(
        |    p_name || ' ' || p_brand || ' ' || CAST(p_size AS VARCHAR),
        |    '[0-9]+'), ',') AS all_nums,
        |  CASE WHEN regexp_matches(p_type, '^(ECONOMY|STANDARD)')
        |       THEN 1 ELSE 0 END AS is_econ_std
        |FROM part ORDER BY p_partkey""".stripMargin,

    "docs_gopher_rules" ->
      // Integer cross-multiplied thresholds — no floats, no rounding
      // rule to disagree at a boundary.
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_ns,
        |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
        |         AS BIGINT) AS sym,
        |    CAST(length(text) AS BIGINT) AS chars_all,
        |    CAST(len(list_filter(string_split(text, ' '),
        |           t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_w,
        |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |           ['the','of','and','to','in','a','is','for']))
        |         AS BIGINT) AS stop_d,
        |    CAST(greatest(len(string_split(text, ' ')) - 2, 0)
        |         AS BIGINT) AS grams,
        |    CAST(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |      greatest(len(string_split(text, ' ')) - 2, 0) -
        |      len(list_distinct(list_transform(
        |        range(1, len(string_split(text, ' ')) - 1),
        |        i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
        |      ELSE 0 END AS BIGINT) AS dups
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tok >= 50 AND n_tok <= 100000 THEN 1 ELSE 0 END
        |      AS r_len,
        |    CASE WHEN chars_ns >= 3*n_tok AND chars_ns <= 10*n_tok
        |         THEN 1 ELSE 0 END AS r_word_len,
        |    CASE WHEN 10*sym <= chars_all THEN 1 ELSE 0 END AS r_symbols,
        |    CASE WHEN 5*alpha_w >= 4*n_tok THEN 1 ELSE 0 END AS r_alpha,
        |    CASE WHEN stop_d >= 2 THEN 1 ELSE 0 END AS r_stopwords,
        |    CASE WHEN 5*dups <= grams THEN 1 ELSE 0 END AS r_repeat
        |  FROM f)
        |SELECT doc_id, r_len, r_word_len, r_symbols, r_alpha,
        |       r_stopwords, r_repeat,
        |       CAST(r_len + r_word_len + r_symbols + r_alpha +
        |            r_stopwords + r_repeat AS BIGINT) AS n_passed,
        |       CASE WHEN r_len + r_word_len + r_symbols + r_alpha +
        |                 r_stopwords + r_repeat = 6
        |            THEN 1 ELSE 0 END AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "multimodal_phash_dedup" ->
      // Every dHash bit re-derived from the closed-form pixel model
      // pixel(x, y) = (doc_id + y·w + x) mod 251 with the same integer
      // 9×8 grid (x = cx·w//9, y = cy·h//8) — the oracle never decodes
      // a PNG; agreement proves the engine's decode→fingerprint path.
      """WITH dims AS (
        |  SELECT doc_id, CAST(n_chars % 64 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 48 + 1 AS BIGINT) AS h
        |  FROM documents),
        |grid AS (SELECT cy.cy AS cy, cx.cx AS cx
        |         FROM (SELECT unnest(range(0, 8)) AS cy) cy
        |         CROSS JOIN (SELECT unnest(range(0, 8)) AS cx) cx),
        |bits AS (
        |  SELECT d.doc_id, g.cy, g.cx,
        |    CASE WHEN (d.doc_id + ((g.cy*d.h)//8)*d.w + ((g.cx+1)*d.w)//9)
        |               % 251 >
        |              (d.doc_id + ((g.cy*d.h)//8)*d.w + (g.cx*d.w)//9)
        |               % 251
        |         THEN '1' ELSE '0' END AS b
        |  FROM dims d CROSS JOIN grid g),
        |ph AS (SELECT doc_id, string_agg(b, '' ORDER BY cy, cx) AS phash
        |       FROM bits GROUP BY doc_id),
        |cl AS (SELECT phash, min(doc_id) AS keep_id,
        |              count(*) AS cluster_size
        |       FROM ph GROUP BY phash)
        |SELECT p.doc_id, p.phash,
        |       CAST(length(replace(p.phash, '0', '')) AS BIGINT) AS n_set,
        |       c.keep_id, c.cluster_size
        |FROM ph p JOIN cl c USING (phash) ORDER BY p.doc_id""".stripMargin,

    "multimodal_phash_near" ->
      // Brute-force all-pairs hamming over the closed-form phash +
      // recursive-CTE transitive closure — the engine's pigeonhole
      // banding (4×16-bit bands, threshold 3) has exact recall, so
      // its pair set equals this one.
      """WITH RECURSIVE dims AS (
        |  SELECT doc_id, CAST(n_chars % 64 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 48 + 1 AS BIGINT) AS h
        |  FROM documents),
        |grid AS (SELECT cy.cy AS cy, cx.cx AS cx
        |         FROM (SELECT unnest(range(0, 8)) AS cy) cy
        |         CROSS JOIN (SELECT unnest(range(0, 8)) AS cx) cx),
        |bits AS (
        |  SELECT d.doc_id, g.cy, g.cx,
        |    CASE WHEN (d.doc_id + ((g.cy*d.h)//8)*d.w + ((g.cx+1)*d.w)//9)
        |               % 251 >
        |              (d.doc_id + ((g.cy*d.h)//8)*d.w + (g.cx*d.w)//9)
        |               % 251
        |         THEN '1' ELSE '0' END AS b
        |  FROM dims d CROSS JOIN grid g),
        |ph AS (SELECT doc_id, string_agg(b, '' ORDER BY cy, cx) AS phash
        |       FROM bits GROUP BY doc_id),
        |reps AS (SELECT phash, min(doc_id) AS rep FROM ph GROUP BY phash),
        |pairs AS (
        |  SELECT a.rep AS r1, b.rep AS r2
        |  FROM reps a JOIN reps b ON a.rep < b.rep
        |  WHERE len(list_filter(range(1, 65),
        |          i -> substr(a.phash, CAST(i AS INT), 1) <>
        |               substr(b.phash, CAST(i AS INT), 1))) <= 3),
        |edges AS (SELECT r1 AS u, r2 AS v FROM pairs
        |          UNION ALL SELECT r2, r1 FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |comp AS (SELECT u AS rep, least(u, min(v)) AS cluster_id
        |         FROM reach GROUP BY u),
        |repc AS (SELECT r.phash,
        |                coalesce(c.cluster_id, r.rep) AS cluster_id
        |         FROM reps r LEFT JOIN comp c ON c.rep = r.rep),
        |docs2 AS (SELECT p.doc_id, rc.cluster_id
        |          FROM ph p JOIN repc rc USING (phash)),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size
        |          FROM docs2 GROUP BY cluster_id)
        |SELECT d.doc_id, d.cluster_id, s.cluster_size
        |FROM docs2 d JOIN sizes s USING (cluster_id)
        |ORDER BY d.doc_id""".stripMargin,

    "emb_knn_classify" ->
      s"""WITH $knnVoteCtes
        |SELECT b.vec_id, e.label AS label_true, b.label AS label_pred,
        |       CAST(b.w AS DOUBLE) AS vote_weight,
        |       CASE WHEN e.label = b.label THEN 1 ELSE 0 END AS correct
        |FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
        |WHERE b.brk = 1 ORDER BY b.vec_id""".stripMargin,

    "emb_knn_eval" ->
      s"""WITH $knnVoteCtes,
        |pred AS (SELECT e.label AS label_true, b.label AS label_pred,
        |           CASE WHEN e.label = b.label THEN 1 ELSE 0 END AS correct
        |         FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
        |         WHERE b.brk = 1),
        |byt AS (SELECT label_true AS label, count(*) AS n_true,
        |          CAST(sum(correct) AS BIGINT) AS tp
        |        FROM pred GROUP BY 1),
        |byp AS (SELECT label_pred AS label, count(*) AS n_pred
        |        FROM pred GROUP BY 1),
        |m AS (SELECT l.label,
        |        coalesce(t.n_true, 0) AS n_true,
        |        coalesce(p.n_pred, 0) AS n_pred,
        |        coalesce(t.tp, 0) AS tp,
        |        CASE WHEN coalesce(p.n_pred, 0) > 0 THEN
        |          round(CAST(coalesce(t.tp, 0) AS DOUBLE) / p.n_pred, 6)
        |        END AS precision,
        |        CASE WHEN coalesce(t.n_true, 0) > 0 THEN
        |          round(CAST(coalesce(t.tp, 0) AS DOUBLE) / t.n_true, 6)
        |        END AS recall
        |      FROM (SELECT DISTINCT label FROM embeddings) l
        |      LEFT JOIN byt t ON t.label = l.label
        |      LEFT JOIN byp p ON p.label = l.label)
        |SELECT label, n_true, n_pred, tp, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |        AND precision + recall > 0 THEN
        |    round(2.0 * precision * recall / (precision + recall), 6)
        |  END AS f1
        |FROM m ORDER BY label""".stripMargin,

    "docs_quality_logreg" ->
      s"""WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    round(CAST(len(list_filter(string_split(text, ' '),
        |            t -> t IN ('the','of','and','to','in','a','is','for')))
        |            AS DOUBLE) / len(string_split(text, ' ')), 9) AS f1,
        |    round(CAST(length(text) - (len(string_split(text, ' ')) - 1)
        |            AS DOUBLE) / len(string_split(text, ' ')) / 10, 9)
        |      AS f2,
        |    round(CAST(len(list_distinct(string_split(text, ' ')))
        |            AS DOUBLE) / len(string_split(text, ' ')), 9) AS f3
        |  FROM documents),
        |w0_init AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
        |$steps
        |SELECT doc_id, CAST(y AS INT) AS label_en,
        |       round($pExpr, 6) AS p_quality,
        |       CASE WHEN round($pExpr, 6) >= 0.5 THEN 1 ELSE 0 END AS keep
        |FROM feat CROSS JOIN w6 ORDER BY doc_id""".stripMargin
  )
}
