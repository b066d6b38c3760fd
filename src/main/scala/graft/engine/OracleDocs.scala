package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the LLM-data (J) and extension-surface (K) keys.
  * The near-dup oracle is EXACT (all pairs sharing ≥1 shingle, Jaccard
  * filtered) — the engine's LSH pipeline must reproduce it, which pins
  * the LSH band configuration's recall at the threshold. Cosine is
  * expressed as double math over list_zip in index order so the
  * summation sequence matches the engine's loop bit-for-bit.
  */
object OracleDocs {
  private[engine] val cosinePair =
    """list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
      |      / (sqrt(list_aggregate(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum'))
      |       * sqrt(list_aggregate(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum')))""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "docs_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY h ORDER BY h""".stripMargin,

    "docs_token_stats" ->
      """SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |       round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
        |       max(n_chars) AS max_chars, count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "docs_lang_filter_tf" ->
      """SELECT term, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term
        |      FROM documents WHERE lang = 'en') t
        |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    "docs_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.term,
        |         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, term) AS rk
        |      FROM sc)
        |SELECT doc_id, term, score, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "docs_dedup_near" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, tokens,
        |          unnest(range(1, len(tokens) - 3)) AS i FROM tok) t1) t2),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sz s1 ON s1.doc_id = id1
        |JOIN sz s2 ON s2.doc_id = id2
        |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8
        |ORDER BY id1, id2""".stripMargin,

    "emb_knn_bruteforce" ->
      s"""WITH p AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    round($cosinePair, 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, cos_sim,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY cos_sim DESC, neighbor_id) AS rk
        |      FROM p)
        |SELECT vec_id, neighbor_id, cos_sim, rk FROM r WHERE rk <= 5
        |ORDER BY vec_id, rk""".stripMargin,

    "emb_centroid_per_label" ->
      """WITH pe AS (SELECT vec_id, label, i AS pos,
        |              CAST(embedding[i] AS DOUBLE) AS x
        |            FROM (SELECT vec_id, label, embedding,
        |                    unnest(range(1, len(embedding) + 1)) AS i
        |                  FROM embeddings) t),
        |cent AS (SELECT label, pos, round(avg(x), 6) AS c
        |         FROM pe GROUP BY label, pos)
        |SELECT pe.vec_id, pe.label,
        |       round(sqrt(sum(pow(pe.x - cent.c, 2))), 6) AS dist_to_centroid
        |FROM pe JOIN cent ON pe.label = cent.label AND pe.pos = cent.pos
        |GROUP BY pe.vec_id, pe.label ORDER BY pe.vec_id""".stripMargin,

    "emb_norm_filter" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * x), 'sum')), 6) AS l2_norm,
        |  round(sqrt(list_aggregate(list_transform(embedding[1:8],
        |    x -> CAST(x AS DOUBLE) * x), 'sum')), 6) AS norm8
        |FROM embeddings
        |WHERE round(sqrt(list_aggregate(list_transform(embedding[1:8],
        |    x -> CAST(x AS DOUBLE) * x), 'sum')), 6) BETWEEN 0.25 AND 0.45
        |ORDER BY vec_id""".stripMargin,

    "udf_scalar_haversine" ->
      """SELECT c_custkey, lat1, lon1,
        |  round(2 * 6371.0 * asin(sqrt(
        |    pow(sin((48.85 - lat1) * pi() / 180 / 2), 2) +
        |    cos(lat1 * pi() / 180) * cos(48.85 * pi() / 180) *
        |    pow(sin((2.35 - lon1) * pi() / 180 / 2), 2))), 4) AS dist_km
        |FROM (SELECT c_custkey,
        |        CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.5 AS lat1,
        |        CAST((c_custkey * 7) % 360 AS DOUBLE) - 180 + 0.5 AS lon1
        |      FROM customer) t
        |ORDER BY c_custkey""".stripMargin,

    "udaf_typed_geomean" ->
      """SELECT o_orderpriority,
        |       round(exp(avg(ln(o_totalprice))), 4) AS geo_price,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "udtf_generator_ngrams" ->
      """SELECT doc_id, i AS pos, array_to_string(tokens[i:i+1], ' ') AS ngram
        |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens))) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tokens
        |            FROM documents WHERE doc_id < 200) t1) t2
        |ORDER BY doc_id, pos""".stripMargin,

    "expr_native_cosine" ->
      s"""SELECT a.vec_id AS vec_id, round($cosinePair, 6) AS cos_next
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY vec_id""".stripMargin,
  )
}
