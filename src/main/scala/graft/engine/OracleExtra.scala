package graft.engine

import scala.collection.immutable.ListMap

/** Shared DuckDB spelling of Ops.kmeansCodebook: md5-seeded init, 3
  * unrolled Lloyd iterations, every arithmetic step rounded exactly
  * like the Spark side (assignment cosine and per-dim means both to
  * 6dp) — verified bit-identical codebooks at sf0.01. Used by the
  * emb_ann_ivf and emb_ivf_recall oracles.
  */
object OracleKmeans {
  /** Cosine between a float-list embedding (alias `a`) and a
    * double-list centroid (alias `c`). */
  def cosFD(a: String, c: String): String =
    s"""list_aggregate(list_transform(list_zip($a.embedding, $c.cemb),
       |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
       |      / (sqrt(list_aggregate(list_transform($a.embedding,
       |           x -> CAST(x AS DOUBLE) * x), 'sum'))
       |       * sqrt(list_aggregate(list_transform($c.cemb,
       |           x -> x * x), 'sum')))""".stripMargin

  private def iteration(i: Int, src: String, p: String): String =
    s"""${p}a$i AS (SELECT e.vec_id, e.embedding, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY round(${cosFD("e", "c")}, 6) DESC, c.cid) AS rn
       |       FROM $src e JOIN ${p}c${i - 1} c ON true),
       |${p}m$i AS (SELECT cid, j, round(avg(CAST(x AS DOUBLE)), 6) AS m
       |       FROM (SELECT cid, unnest(embedding) AS x,
       |                    unnest(range(1, len(embedding) + 1)) AS j
       |             FROM ${p}a$i WHERE rn = 1) t
       |       GROUP BY cid, j),
       |${p}n$i AS (SELECT cid, list(m ORDER BY j) AS cemb
       |       FROM ${p}m$i GROUP BY cid),
       |${p}c$i AS MATERIALIZED (SELECT c.cid, coalesce(n.cemb, c.cemb)
       |         AS cemb
       |       FROM ${p}c${i - 1} c LEFT JOIN ${p}n$i n
       |         ON c.cid = n.cid)""".stripMargin

  /** WITH-list fragment ending in `{prefix}cent(cid, cemb)`,
    * parameterized on the (vec_id, embedding) source relation the
    * codebook trains on — `embeddings` for the batch keys, a
    * survivors CTE for the ingest replay (OracleR19, where training
    * sees only the first batch's quality-gate survivors), the
    * accepted-corpus CTE for the refresh replay (OracleR20, which
    * instantiates the machinery TWICE in one query — the prefix keeps
    * the two trainings' CTE names apart). Same structure either way:
    * md5-seeded init capped at k=16, 3 unrolled Lloyd iterations on
    * the 6dp grid. */
  def codebookCtesFrom(src: String, prefix: String = ""): String = {
    val p = prefix
    s"""${p}seedord AS (SELECT vec_id, embedding,
       |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |                           vec_id) - 1 AS cid
       |      FROM $src),
       |${p}c0 AS MATERIALIZED (SELECT cid,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       |       FROM ${p}seedord WHERE cid < 16),
       |${iteration(1, src, p)},
       |${iteration(2, src, p)},
       |${iteration(3, src, p)},
       |${p}cent AS (SELECT cid, cemb FROM ${p}c3)""".stripMargin
  }

  /** WITH-list fragment ending in `cent(cid, cemb)`. */
  val codebookCtes: String = codebookCtesFrom("embeddings")
}

/** DuckDB oracles for the beyond-SURVEY training-data-pipeline keys. */
object OracleExtra {
  private val cosinePair =
    """list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
      |      / (sqrt(list_aggregate(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum'))
      |       * sqrt(list_aggregate(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum')))""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "docs_lang_id" ->
      """WITH f AS (SELECT doc_id, lang, string_split(text, ' ') AS tokens
        |           FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_filter(tokens, t -> t IN ('the','a','of'))) AS s_de,
        |  len(list_filter(tokens, t -> t IN ('the','fast','key'))) AS s_en,
        |  len(list_filter(tokens, t -> t IN ('query','table','row'))) AS s_es,
        |  len(list_filter(tokens, t -> t IN ('join','merge','sort'))) AS s_fr,
        |  len(list_filter(tokens, t -> t IN ('scan','filter','group'))) AS s_zh
        |  FROM f)
        |SELECT doc_id, lang,
        |  CASE WHEN s_de >= greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
        |       WHEN s_en >= greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
        |       WHEN s_es >= greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
        |       WHEN s_fr >= greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  greatest(s_de,s_en,s_es,s_fr,s_zh) AS best_score
        |FROM sc ORDER BY doc_id""".stripMargin,

    "docs_quality_score" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  length(text) AS n_chars_m,
        |  round(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |        / length(text), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the','a','of'))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 6) AS stop_ratio,
        |  round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
        |      + 0.4 * (1 - CAST(len(list_filter(string_split(text, ' '),
        |              t -> t IN ('the','a','of'))) AS DOUBLE)
        |              / len(string_split(text, ' ')))
        |      + 0.2 * (1 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |              / length(text)), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "docs_fingerprint" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, array_to_string(tokens[i:i+3], ' ') AS shingle
        |  FROM (SELECT doc_id, tokens,
        |          unnest(range(1, len(tokens) - 2)) AS i FROM tok) t1) t2)
        |SELECT doc_id, min(substr(md5(shingle), 1, 8)) AS fp,
        |       count(*) AS n_shingles
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "docs_token_bpe" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_pieces,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_num,
        |  len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS n_uniq_alpha
        |FROM documents ORDER BY doc_id""".stripMargin,

    "emb_ann_ivf" ->
      s"""WITH ${OracleKmeans.codebookCtes},
        |rnk AS (SELECT a.vec_id, b.cid,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(${OracleKmeans.cosFD("a", "b")}, 6) DESC,
        |               b.cid) AS rn
        |  FROM embeddings a JOIN cent b ON true),
        |idx AS (SELECT e.vec_id, e.embedding, r.cid AS cell_id
        |        FROM embeddings e JOIN rnk r
        |          ON e.vec_id = r.vec_id AND r.rn = 1),
        |probes AS (SELECT e.vec_id, e.embedding, r.cid AS cell_id
        |           FROM embeddings e JOIN rnk r
        |             ON e.vec_id = r.vec_id AND r.rn <= 4),
        |p AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |        round($cosinePair, 6) AS cos_sim
        |      FROM probes a JOIN idx b
        |        ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, cos_sim,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY cos_sim DESC, neighbor_id) AS rk
        |      FROM p)
        |SELECT vec_id, neighbor_id, cos_sim, rk FROM r WHERE rk <= 3
        |ORDER BY vec_id, rk""".stripMargin,

    "join_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_salted_skew" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sink_partitioned" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       round(sum(o_totalprice), 4) AS total
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "multimodal_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
        |       length(substr(text, i * 16 + 1, 16)) AS frame_len,
        |       md5(substr(text, i * 16 + 1, 16)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, CAST(ceil(length(text) / 16.0) AS INT))) AS i
        |      FROM documents) t
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // The oracle re-derives every decoded field from first principles:
    // dimensions from the doc fields the encoder used, structural
    // constants from the PNG layout the decoder must recover (3 chunks,
    // gray8, all CRCs valid, rawLen = (w+1)*h with filter bytes), and
    // the pixel sum as the modular series the encoder painted — so a
    // one-bit error anywhere in the codec round-trip breaks the hash.
    "multimodal_decode_png" ->
      """SELECT doc_id,
        |  CAST(n_chars % 64 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 48 + 1 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(0 AS BIGINT) AS color_type,
        |  CAST(3 AS BIGINT) AS n_chunks,
        |  CAST((n_chars % 64 + 2) * (doc_id % 48 + 1) AS BIGINT) AS raw_len,
        |  CAST(1 AS BIGINT) AS crc_ok,
        |  CAST(list_sum(list_transform(
        |         range(0, CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) AS INT)),
        |         i -> (doc_id + i) % 251)) AS BIGINT) AS pixel_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
