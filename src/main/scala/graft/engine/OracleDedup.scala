package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the remaining dedup-family keys. SimHash bits
  * come from md5 hex (portable); DuckDB's '0x…'::INT ≡ Spark's
  * conv(hex, 16, 10) (verified), xor()/bit_count() ≡ ^ / bit_count.
  */
object OracleDedup {
  val sql: ListMap[String, String] = ListMap(
    "docs_dedup_resolve" ->
      // Exact O(n²) word-5-gram Jaccard (same formulation as
      // docs_dedup_near's oracle) → drop any doc pairing with a lower
      // id at ≥ 0.8 → survivors.
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
        |          GROUP BY 1, 2),
        |drops AS (SELECT DISTINCT id2 AS doc_id FROM inter
        |          JOIN sz s1 ON s1.doc_id = id1
        |          JOIN sz s2 ON s2.doc_id = id2
        |          WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8)
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY doc_id""".stripMargin,

    "docs_dedup_cc" ->
      // Exact word-5-gram Jaccard pairs (as in docs_dedup_near's
      // oracle) → transitive closure via recursive CTE → component
      // minimum per node.
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, tokens,
        |          unnest(range(1, len(tokens) - 3)) AS i FROM tok) t1) t2),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT id1, id2 FROM inter
        |          JOIN sz s1 ON s1.doc_id = id1
        |          JOIN sz s2 ON s2.doc_id = id2
        |          WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8),
        |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        |)
        |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    "docs_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, t, count(*) AS cnt FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |   FROM documents) z GROUP BY 1, 2),
        |th AS (SELECT doc_id, cnt,
        |         ('0x' || substr(md5(t), 1, 4))::INT AS b0,
        |         ('0x' || substr(md5(t), 5, 4))::INT AS b1,
        |         ('0x' || substr(md5(t), 9, 4))::INT AS b2,
        |         ('0x' || substr(md5(t), 13, 4))::INT AS b3
        |       FROM tok),
        |bands AS (SELECT doc_id, cnt, j.j AS j,
        |    CASE j.j WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS v
        |  FROM th CROSS JOIN (VALUES (0), (1), (2), (3)) j(j)),
        |sums AS (SELECT doc_id, j, i.i AS i,
        |    sum(CASE WHEN (v >> i.i) & 1 = 1 THEN cnt ELSE -cnt END) AS s
        |  FROM bands CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
        |    (8),(9),(10),(11),(12),(13),(14),(15)) i(i)
        |  GROUP BY 1, 2, 3),
        |bv AS (SELECT doc_id, j,
        |    CAST(sum(CASE WHEN s > 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS bv
        |  FROM sums GROUP BY 1, 2),
        |sh AS (SELECT doc_id,
        |    max(CASE WHEN j = 0 THEN bv END) AS v0,
        |    max(CASE WHEN j = 1 THEN bv END) AS v1,
        |    max(CASE WHEN j = 2 THEN bv END) AS v2,
        |    max(CASE WHEN j = 3 THEN bv END) AS v3
        |  FROM bv GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bv a JOIN bv b
        |    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |    CAST(bit_count(xor(sa.v0, sb.v0)) + bit_count(xor(sa.v1, sb.v1)) +
        |         bit_count(xor(sa.v2, sb.v2)) + bit_count(xor(sa.v3, sb.v3))
        |         AS INT) AS hamming
        |FROM cand
        |JOIN sh sa ON sa.doc_id = id1
        |JOIN sh sb ON sb.doc_id = id2
        |WHERE bit_count(xor(sa.v0, sb.v0)) + bit_count(xor(sa.v1, sb.v1)) +
        |      bit_count(xor(sa.v2, sb.v2)) + bit_count(xor(sa.v3, sb.v3)) <= 3
        |ORDER BY id1, id2""".stripMargin,

    "docs_dedup_ngram_jaccard" ->
      """WITH g AS (SELECT DISTINCT doc_id, substr(text, i, 12) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 10, 4)) AS i
        |        FROM documents WHERE length(text) >= 12) z),
        |sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CAST(count(*) AS DOUBLE) AS i
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, round(i / (s1.sz + s2.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sz s1 ON s1.doc_id = id1
        |JOIN sz s2 ON s2.doc_id = id2
        |WHERE i / (s1.sz + s2.sz - i) >= 0.8
        |ORDER BY id1, id2""".stripMargin,

    "emb_dedup_cosine" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
        |      / (sqrt(list_aggregate(list_transform(a.embedding,
        |           x -> CAST(x AS DOUBLE) * x), 'sum'))
        |       * sqrt(list_aggregate(list_transform(b.embedding,
        |           x -> CAST(x AS DOUBLE) * x), 'sum'))), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
        |      / (sqrt(list_aggregate(list_transform(a.embedding,
        |           x -> CAST(x AS DOUBLE) * x), 'sum'))
        |       * sqrt(list_aggregate(list_transform(b.embedding,
        |           x -> CAST(x AS DOUBLE) * x), 'sum'))), 6) >= 0.45
        |ORDER BY id1, id2""".stripMargin,
  )
}
