package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-7 keys. The BPE encode oracle extends
  * the shared unrolled-CTE training chain (OracleR9.bpeChain) with the
  * corpus join + char-fallback rule, so the whole tokenizer — train
  * AND apply — is pinned end-to-end by one SQL derivation.
  */
object OracleR10 {
  val sql: ListMap[String, String] = ListMap(
    // words keep their original split index for ordering (empties from
    // doubled spaces are dropped AFTER indexing, mirroring the
    // engine's posexplode+filter); OOV words — anything outside the
    // trainer's ^[a-z]{2,}$ vocab — fall back to char symbols via the
    // LEFT JOIN + COALESCE; token ids are dense alphabetical ranks
    // over the (bounded) token inventory.
    "docs_bpe_encode" -> (OracleR9.bpeChain(8) +
      """
        |, w AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS wi
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |              FROM documents)),
        |wd AS (SELECT doc_id, CAST(wi AS INT) AS wpos, ws[wi] AS word
        |       FROM w WHERE length(ws[wi]) > 0),
        |enc AS (SELECT d.doc_id, d.wpos,
        |        COALESCE(s.syms,
        |          list_transform(range(1, length(d.word) + 1),
        |                         i -> d.word[i:i])) AS syms
        |        FROM wd d LEFT JOIN s8 s ON s.word = d.word),
        |cum AS (SELECT doc_id, wpos, syms,
        |        sum(len(syms)) OVER (PARTITION BY doc_id ORDER BY wpos)
        |          - len(syms) AS base
        |        FROM enc),
        |tok AS (SELECT doc_id, CAST(base + ti - 1 AS INT) AS pos,
        |               syms[ti] AS token
        |        FROM (SELECT doc_id, base, syms,
        |              unnest(range(1, len(syms) + 1)) AS ti FROM cum)),
        |ids AS (SELECT token,
        |          CAST(row_number() OVER (ORDER BY token) - 1 AS INT)
        |            AS token_id
        |        FROM (SELECT DISTINCT token FROM tok))
        |SELECT t.doc_id, t.pos, t.token, i.token_id
        |FROM tok t JOIN ids i USING (token)
        |ORDER BY doc_id, pos""".stripMargin),

    // the custom Generator must be indistinguishable from the explode
    // spelling — same oracle as udtf_generator_ngrams verbatim
    "udtf_ngrams_native" ->
      """SELECT doc_id, i AS pos, array_to_string(tokens[i:i+1], ' ') AS ngram
        |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens))) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS tokens
        |            FROM documents WHERE doc_id < 200) t1) t2
        |ORDER BY doc_id, pos""".stripMargin,

    // lineage is pinned by CONTENT: shard i holds exactly the
    // c_custkey % 3 = i slice, so the per-file audit is re-derivable
    // without knowing the engine's file paths
    "scan_glob_lineage" ->
      """SELECT 'shard' || CAST(c_custkey % 3 AS VARCHAR) || '.parquet'
        |         AS src_file,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_acctbal
        |FROM customer
        |GROUP BY 1 ORDER BY src_file""".stripMargin,
  )
}
