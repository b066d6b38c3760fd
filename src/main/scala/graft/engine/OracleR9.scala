package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-6 keys. The bloom-join and sorted-skip
  * oracles are the PLAIN join/filter semantics — runtime filtering and
  * row-group skipping are plan/IO properties, asserted in PlanSpec;
  * the oracles pin that neither ever changes results. The nearest-asof
  * oracle restates the direction/tolerance pick with correlated
  * min/max subqueries (DuckDB's native ASOF JOIN is backward-only).
  */
object OracleR9 {
  val sql: ListMap[String, String] = ListMap(
    "join_runtime_bloom" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'PROMO' AND p_size <= 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "scan_sorted_skip" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1996-03-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // nearest-with-tolerance: backward candidate = latest order at or
    // before the event, forward = earliest strictly after; a candidate
    // with gap > 30 days is out; nearer wins, ties to backward; signed
    // gap records the side. Gaps are floor-second diffs, matching
    // Spark's timestamp→long cast.
    "join_asof_nearest" ->
      """WITH o AS (SELECT o_custkey AS uid,
        |                  CAST(o_orderdate AS TIMESTAMP) AS t,
        |                  max(o_orderkey) AS ok
        |           FROM orders GROUP BY 1, 2),
        |     e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |     c AS (SELECT e.event_id, e.user_id, e.ts,
        |                  (SELECT max(o.t) FROM o
        |                   WHERE o.uid = e.user_id AND o.t <= e.ts) AS bt,
        |                  (SELECT min(o.t) FROM o
        |                   WHERE o.uid = e.user_id AND o.t > e.ts) AS ft
        |           FROM e),
        |     g AS (SELECT *,
        |                  epoch_us(ts) // 1000000
        |                    - epoch_us(bt) // 1000000 AS gb,
        |                  epoch_us(ft) // 1000000
        |                    - epoch_us(ts) // 1000000 AS gf
        |           FROM c),
        |     p AS (SELECT event_id, user_id, ts, bt, ft, gb, gf,
        |                  CASE WHEN bt IS NOT NULL AND gb <= 2592000
        |                            AND (ft IS NULL OR gf > 2592000
        |                                 OR gb <= gf) THEN 'b'
        |                       WHEN ft IS NOT NULL AND gf <= 2592000
        |                         THEN 'f' END AS side
        |           FROM g)
        |SELECT p.event_id, p.user_id, p.ts,
        |       o.ok AS matched_orderkey,
        |       CASE WHEN p.side = 'b' THEN p.gb
        |            WHEN p.side = 'f' THEN -p.gf END AS gap_sec
        |FROM p LEFT JOIN o ON o.uid = p.user_id
        |   AND o.t = CASE WHEN p.side = 'b' THEN p.bt
        |                  WHEN p.side = 'f' THEN p.ft END
        |ORDER BY event_id""".stripMargin,

    "docs_bpe_train" -> bpeTrainSql(8),

    // frames recomputed from the PCM generator arithmetic (same
    // formula the engine ENCODES with; the engine additionally
    // round-trips through the real RIFF container)
    "multimodal_audio_energy" ->
      """WITH docs AS (SELECT doc_id, n_chars % 200 + 50 AS n
        |              FROM documents),
        |idx AS (SELECT doc_id, unnest(range(0, n)) AS i FROM docs),
        |smp AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |        (doc_id * 31 + i * 7) % 65536 - 32768 AS s FROM idx),
        |fr AS (SELECT doc_id, i, s,
        |       CAST(i // 64 AS INT) AS frame,
        |       lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |       FROM smp)
        |SELECT doc_id, frame,
        |       CAST(count(*) AS INT) AS n_samp,
        |       CAST(sum(s * s) AS BIGINT) AS energy,
        |       CAST(count(*) FILTER (i % 64 > 0 AND prev * s < 0) AS INT)
        |         AS zc
        |FROM fr GROUP BY doc_id, frame
        |ORDER BY doc_id, frame""".stripMargin,

    // bloom prefiltering is exact-verified inside the key, so the
    // oracle is the PLAIN semi join — the sketch never changes results
    "join_bloom_prefilter" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderdate >= DATE '2001-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "docs_bpe_tokenize" -> (bpeChain(8) +
      """
        |, corners AS (
        |  SELECT unnest(syms) AS sym, freq, word, syms FROM s8)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s8) AS n_words,
        |       (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM corners)
        |         AS n_symbols,
        |       (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s8)
        |         AS n_tokens,
        |       (SELECT CAST(sum(freq * length(word)) AS BIGINT) FROM s8)
        |         AS n_chars,
        |       (SELECT round(CAST(sum(freq * length(word)) AS DOUBLE)
        |                     / sum(freq * len(syms)), 6) FROM s8)
        |         AS chars_per_token""".stripMargin),

    "graph_triangles" ->
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
        |pr AS (SELECT id1 AS a, id2 AS b FROM inter
        |       JOIN sz s1 ON s1.doc_id = id1
        |       JOIN sz s2 ON s2.doc_id = id2
        |       WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8),
        |tri AS (SELECT p1.a AS x, p1.b AS y, p2.b AS z
        |        FROM pr p1 JOIN pr p2 ON p1.b = p2.a
        |        JOIN pr p3 ON p3.a = p1.a AND p3.b = p2.b),
        |c AS (SELECT unnest([x, y, z]) AS v FROM tri)
        |SELECT CAST(count(*) // 3 AS BIGINT) AS n_triangles,
        |       CAST(count(DISTINCT v) AS BIGINT) AS n_nodes
        |FROM c""".stripMargin,

    "scan_zorder_skip" ->
      """SELECT CAST(l_partkey % 100 AS BIGINT) AS part_bucket,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |WHERE l_partkey >= 100 AND l_partkey <= 299
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** The BPE trainer's oracle, generated: N greedy merge rounds
    * unrolled as chained CTEs. Round r counts adjacent pairs over
    * round r-1's symbol sequences (pair lists via range/list_transform
    * — range() must stay a list expression, not a table function, for
    * lateral column args), picks the (cnt DESC, a, b) argmax, and
    * applies it with a list_reduce fold identical to the engine's
    * aggregate() fold (init = first singleton, so both folds see the
    * same left-to-right non-overlapping walk). */
  private def bpeTrainSql(n: Int): String = {
    val sb = new StringBuilder(bpeChain(n))
    sb.append("\nSELECT step, a AS lhs, b AS rhs, m AS merged, cnt FROM (")
    sb.append((1 to n).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL "))
    sb.append(") ORDER BY step")
    sb.toString
  }

  /** Just the CTE chain (vocab → s0 → … → s_n with b_r merge picks),
    * shared by the trainer, tokenize, and encode (OracleR10) oracles. */
  private[engine] def bpeChain(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH vocab AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w ~ '^[a-z]{2,}$' GROUP BY 1),
        |s0 AS (SELECT word, freq,
        |       list_transform(range(1, length(word) + 1),
        |                      i -> word[i:i]) AS syms
        |       FROM vocab)""".stripMargin)
    for (r <- 1 to n) {
      sb.append(s""",
        |p$r AS (SELECT pr[1] AS a, pr[2] AS b,
        |        CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq,
        |        unnest(CASE WHEN len(syms) < 2 THEN []
        |          ELSE list_transform(range(1, len(syms)),
        |                 i -> [syms[i], syms[i+1]]) END) AS pr
        |        FROM s${r - 1})
        |  GROUP BY 1, 2),
        |b$r AS (SELECT $r AS step, a, b, a || b AS m, cnt FROM p$r
        |        ORDER BY cnt DESC, a, b LIMIT 1),
        |s$r AS (SELECT word, freq,
        |  CASE WHEN b.a IS NULL THEN s.syms ELSE
        |    list_reduce(list_transform(s.syms, x -> [x]),
        |      (acc, x) -> CASE WHEN acc[-1] = b.a AND x[1] = b.b
        |                  THEN acc[:-2] || [b.m] ELSE acc || x END)
        |  END AS syms
        |  FROM s${r - 1} s LEFT JOIN b$r b ON TRUE)""".stripMargin)
    }
    sb.toString
  }
}
