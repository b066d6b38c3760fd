package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-5 wave-1 keys. The DPP key's oracle is
  * the plain join semantics (pruning is a plan property, asserted in
  * PlanSpec — the oracle pins that pruning never changes results); the
  * normalize oracle rebuilds the deterministic augmentation with chr()
  * codepoints and RE2 \x{...} classes (DuckDB regex is RE2, Spark's is
  * Java — the classes are spelled per-dialect, same semantics); the
  * patchify oracle recomputes every patch digest from the pixel
  * generator arithmetic.
  */
object OracleR8 {
  val sql: ListMap[String, String] = ListMap(
    "scan_dpp_partitioned" ->
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
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "docs_text_normalize" ->
      """WITH aug AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN 'Cafe' || chr(769) || chr(8203) || chr(9) || text
        |         ELSE text END AS aug
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, text, aug,
        |    trim(regexp_replace(regexp_replace(
        |      nfc_normalize(aug),
        |      '[\x00-\x1f\x7f\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |      ' {2,}', ' ', 'g')) AS norm
        |  FROM aug
        |)
        |SELECT doc_id,
        |       CAST(length(aug) AS INT) AS len_before,
        |       CAST(length(norm) AS INT) AS len_after,
        |       norm <> text AS changed,
        |       substr(norm, 1, 24) AS prefix
        |FROM n ORDER BY doc_id""".stripMargin,

    "events_interval_join" ->
      """SELECT c.user_id,
        |       c.event_id AS click_id,
        |       p.event_id AS purchase_id,
        |       CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) // 1000000
        |          - epoch_us(CAST(c.ts AS TIMESTAMP)) // 1000000
        |         AS BIGINT) AS gap_sec
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts
        | AND p.ts <= c.ts + INTERVAL '10 minutes'
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY 1, 2, 3""".stripMargin,

    "docs_train_split" ->
      """SELECT CASE WHEN ('0x' || substr(md5(text), 1, 6))::BIGINT % 10 < 8
        |            THEN 'train'
        |            WHEN ('0x' || substr(md5(text), 1, 6))::BIGINT % 10 = 8
        |            THEN 'val' ELSE 'test' END AS split,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "docs_corpus_pipeline" ->
      """WITH surv AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        |), kept AS (
        |  SELECT d.lang,
        |         len(string_split(d.text, ' ')) AS n_tokens,
        |         round(0.4 * least(len(string_split(d.text, ' ')) / 50.0, 1.0)
        |             + 0.4 * (1 - CAST(len(list_filter(string_split(d.text, ' '),
        |                     t -> t IN ('the','a','of'))) AS DOUBLE)
        |                     / len(string_split(d.text, ' ')))
        |             + 0.2 * (1 - CAST(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |                     / length(d.text)), 6) AS quality
        |  FROM documents d JOIN surv USING (doc_id)
        |)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |       round(AVG(quality), 6) AS avg_quality
        |FROM kept WHERE quality >= 0.75
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "events_resample_gapfill" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |         value
        |  FROM events
        |), agg AS (
        |  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt,
        |         round(SUM(value), 4) AS sum_value
        |  FROM ev GROUP BY 1, 2
        |), bounds AS (
        |  SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev
        |), hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM bounds
        |), grid AS (
        |  SELECT e.event_type, h.bucket
        |  FROM hours h, (SELECT DISTINCT event_type FROM ev) e
        |)
        |SELECT g.event_type, g.bucket,
        |       COALESCE(a.cnt, 0) AS cnt,
        |       COALESCE(a.sum_value, 0) AS sum_value
        |FROM grid g LEFT JOIN agg a
        |  ON g.event_type = a.event_type AND g.bucket = a.bucket
        |ORDER BY 1, 2""".stripMargin,

    "events_gapfill_interp" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket
        |  FROM events
        |), agg AS (
        |  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM ev GROUP BY 1, 2
        |), bounds AS (
        |  SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev
        |), hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM bounds
        |), grid AS (
        |  SELECT e.event_type, h.bucket
        |  FROM hours h, (SELECT DISTINCT event_type FROM ev) e
        |), series AS (
        |  SELECT g.event_type, g.bucket,
        |         epoch_us(g.bucket) // 1000000 AS t,
        |         CAST(a.cnt AS DOUBLE) AS v, a.cnt
        |  FROM grid g LEFT JOIN agg a
        |    ON g.event_type = a.event_type AND g.bucket = a.bucket
        |), w AS (
        |  SELECT *,
        |    LAST_VALUE(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY t
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY t
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    FIRST_VALUE(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY t
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY t
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM series
        |)
        |SELECT event_type, bucket, COALESCE(cnt, 0) AS cnt,
        |       round(CASE WHEN v IS NOT NULL THEN v
        |                  ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END, 6)
        |         AS cnt_interp
        |FROM w ORDER BY 1, 2""".stripMargin,

    "docs_stratified_sample" ->
      """WITH b AS (
        |  SELECT lang, text,
        |         ('0x' || substr(md5(text), 7, 6))::BIGINT % 100 AS bucket,
        |         CASE WHEN lang = 'en' THEN 100
        |              WHEN lang = 'de' THEN 50 ELSE 25 END AS rate
        |  FROM documents
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       MAX(bucket) AS max_bucket
        |FROM b WHERE bucket < rate
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "join_fuzzy_blocked" ->
      """WITH names AS (
        |  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n,
        |         string_split(p_name, ' ')[1] AS block
        |  FROM part GROUP BY 1
        |)
        |SELECT a.name AS name1, b.name AS name2,
        |       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
        |       a.n * b.n AS pair_weight
        |FROM names a JOIN names b
        |  ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY 1, 2""".stripMargin,

    "docs_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |), idx AS (
        |  SELECT word, unnest(range(1, length(word))) AS i
        |  FROM words WHERE length(word) >= 2
        |)
        |SELECT substr(word, CAST(i AS INT), 2) AS pair,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM idx
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "multimodal_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(n_chars % 64 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 48 + 1 AS BIGINT) AS h
        |  FROM documents
        |), g1 AS (
        |  SELECT doc_id, w, unnest(range(0, h // 2)) AS py FROM dims
        |), grid AS (
        |  SELECT doc_id, w, py, unnest(range(0, w // 2)) AS px FROM g1
        |), vals AS (
        |  SELECT doc_id,
        |    ((doc_id + (py * 2) * w + px * 2) % 251
        |     + (doc_id + (py * 2) * w + px * 2 + 1) % 251
        |     + (doc_id + (py * 2 + 1) * w + px * 2) % 251
        |     + (doc_id + (py * 2 + 1) * w + px * 2 + 1) % 251) // 4 AS v
        |  FROM grid
        |)
        |SELECT d.doc_id,
        |       CAST(d.w // 2 AS INT) AS out_w,
        |       CAST(d.h // 2 AS INT) AS out_h,
        |       CAST(COALESCE(SUM(v), 0) AS BIGINT) AS px_sum,
        |       CAST(COALESCE(MIN(v), -1) AS INT) AS px_min,
        |       CAST(COALESCE(MAX(v), -1) AS INT) AS px_max
        |FROM dims d LEFT JOIN vals USING (doc_id)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "multimodal_patchify" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(n_chars % 64 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 48 + 1 AS BIGINT) AS h
        |  FROM documents
        |), g1 AS (
        |  SELECT doc_id, w, unnest(range(0, h // 8)) AS py FROM dims
        |), grid AS (
        |  SELECT doc_id, w, py, unnest(range(0, w // 8)) AS px FROM g1
        |), vals AS (
        |  SELECT doc_id, py, px,
        |    list_transform(range(0, 64),
        |      k -> (doc_id + (py * 8 + (k // 8)) * w
        |            + px * 8 + (k % 8)) % 251) AS vs
        |  FROM grid
        |)
        |SELECT doc_id,
        |       CAST(py AS INT) AS patch_row,
        |       CAST(px AS INT) AS patch_col,
        |       CAST(list_sum(vs) AS BIGINT) AS px_sum,
        |       CAST(list_min(vs) AS INT) AS px_min,
        |       CAST(list_max(vs) AS INT) AS px_max
        |FROM vals
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,
  )
}
