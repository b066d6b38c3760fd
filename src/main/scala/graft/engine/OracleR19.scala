package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-14 ingest-replay keys — the
  * definitional replay of graft.engine.Ingest's deterministic
  * 3-batch schedule (batch = id % 3, arriving in order), from first
  * principles:
  *
  *  - docs: exact O(n²) 5-shingle Jaccard pairs (the LSH band index
  *    is the candidate path only — recall must be total for the hash
  *    to match), then the greedy accept chain as three nested CTEs:
  *    batch b rejects a doc iff an exact pair ≥ 0.8 links it to an
  *    EARLIER-id doc of its own batch (partner's own fate
  *    irrelevant — the greedy-chain rule) or to an ACCEPTED doc of
  *    an earlier batch.
  *  - emb: the frozen codebook re-trained in SQL over the BATCH-0
  *    quality-gate survivors (OracleKmeans.codebookCtesFrom — same
  *    md5 seeding, 3 Lloyd iterations, 6dp grid), argmax cell
  *    assignment for every survivor, then the same greedy chain over
  *    same-cell pairs with 6dp cosine STRICTLY above 0.45.
  *  - knn: brute-force cosine top-5 over the replayed accepted
  *    corpus — Ingest.knnProbe at nprobe = all cells is contractually
  *    exact, so brute force IS its oracle.
  *
  * Quality gates ride the floor-shift grid (`floor(x·10^6 + 0.5)`),
  * never library round() — the r13 engine-tie rule.
  */
object OracleR19 {

  private def cosPair(x: String, y: String): String =
    s"""list_aggregate(list_transform(list_zip($x.embedding, $y.embedding),
       |        z -> CAST(z[1] AS DOUBLE) * z[2]), 'sum')
       |      / (sqrt(list_aggregate(list_transform($x.embedding,
       |           z -> CAST(z AS DOUBLE) * z), 'sum'))
       |       * sqrt(list_aggregate(list_transform($y.embedding,
       |           z -> CAST(z AS DOUBLE) * z), 'sum')))""".stripMargin

  /** The shared embedding-replay WITH-list: quality gate → batch-0
    * codebook → assignment → same-cell pairs → 3-batch accept chain.
    * Ends at `acc(vec_id)`; `pp`, `filt`, `asg` stay referencable. */
  private val embReplayCtes: String =
    s"""eb AS (SELECT vec_id, embedding, vec_id % 3 AS b,
       |        floor(sqrt(list_aggregate(list_transform(embedding[1:8],
       |          x -> CAST(x AS DOUBLE) * x), 'sum')) * 1e6 + 0.5) AS m8
       |      FROM embeddings),
       |filt AS (SELECT vec_id FROM eb
       |         WHERE m8 < 200000 OR m8 IS NULL),
       |surv AS (SELECT vec_id, embedding, b FROM eb
       |         WHERE m8 IS NOT NULL AND m8 >= 200000),
       |b0 AS (SELECT vec_id, embedding FROM surv WHERE b = 0),
       |${OracleKmeans.codebookCtesFrom("b0")},
       |rnk AS (SELECT a.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY round(${OracleKmeans.cosFD("a", "c")}, 6) DESC,
       |                    c.cid) AS rn
       |       FROM surv a JOIN cent c ON true),
       |asg AS (SELECT s.vec_id, s.embedding, s.b, r.cid
       |        FROM surv s JOIN rnk r ON s.vec_id = r.vec_id AND r.rn = 1),
       |pp AS (SELECT a.vec_id, a.b AS xb, b.vec_id AS dup_of, b.b AS yb,
       |         round(${cosPair("a", "b")}, 6) AS cos
       |       FROM asg a JOIN asg b
       |         ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |       WHERE round(${cosPair("a", "b")}, 6) > 0.45),
       |acc0 AS (SELECT vec_id FROM asg WHERE b = 0 AND NOT EXISTS (
       |    SELECT 1 FROM pp WHERE pp.vec_id = asg.vec_id
       |      AND pp.yb = 0 AND pp.dup_of < asg.vec_id)),
       |acc1 AS (SELECT vec_id FROM asg WHERE b = 1 AND NOT EXISTS (
       |    SELECT 1 FROM pp WHERE pp.vec_id = asg.vec_id AND (
       |      (pp.yb = 1 AND pp.dup_of < asg.vec_id) OR
       |      (pp.yb = 0 AND pp.dup_of IN (SELECT vec_id FROM acc0))))),
       |acc2 AS (SELECT vec_id FROM asg WHERE b = 2 AND NOT EXISTS (
       |    SELECT 1 FROM pp WHERE pp.vec_id = asg.vec_id AND (
       |      (pp.yb = 2 AND pp.dup_of < asg.vec_id) OR
       |      (pp.yb = 0 AND pp.dup_of IN (SELECT vec_id FROM acc0)) OR
       |      (pp.yb = 1 AND pp.dup_of IN (SELECT vec_id FROM acc1))))),
       |acc AS (SELECT vec_id FROM acc0 UNION ALL SELECT vec_id FROM acc1
       |        UNION ALL SELECT vec_id FROM acc2)""".stripMargin

  private[engine] val docsReplaySql: String =
    """WITH ball AS (SELECT doc_id, text, n_chars, doc_id % 3 AS b
        |              FROM documents),
        |filt AS (SELECT doc_id FROM ball WHERE n_chars < 100),
        |d AS (SELECT doc_id, text, b FROM ball WHERE n_chars >= 100),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM d),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, tokens,
        |          unnest(range(1, len(tokens) - 3)) AS i FROM tok) t1) t2),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pr AS (SELECT id1, id2,
        |    round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 6) AS jaccard
        |  FROM inter
        |  JOIN sz s1 ON s1.doc_id = id1
        |  JOIN sz s2 ON s2.doc_id = id2
        |  WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8),
        |psym AS (SELECT id1 AS doc_id, id2 AS match_id, jaccard FROM pr
        |         UNION ALL
        |         SELECT id2 AS doc_id, id1 AS match_id, jaccard FROM pr),
        |pb AS (SELECT p.doc_id, x.b AS xb, p.match_id, y.b AS yb, p.jaccard
        |       FROM psym p JOIN d x ON x.doc_id = p.doc_id
        |                   JOIN d y ON y.doc_id = p.match_id),
        |acc0 AS (SELECT doc_id FROM d WHERE b = 0 AND NOT EXISTS (
        |    SELECT 1 FROM pb WHERE pb.doc_id = d.doc_id
        |      AND pb.yb = 0 AND pb.match_id < d.doc_id)),
        |acc1 AS (SELECT doc_id FROM d WHERE b = 1 AND NOT EXISTS (
        |    SELECT 1 FROM pb WHERE pb.doc_id = d.doc_id AND (
        |      (pb.yb = 1 AND pb.match_id < d.doc_id) OR
        |      (pb.yb = 0 AND pb.match_id IN (SELECT doc_id FROM acc0))))),
        |acc2 AS (SELECT doc_id FROM d WHERE b = 2 AND NOT EXISTS (
        |    SELECT 1 FROM pb WHERE pb.doc_id = d.doc_id AND (
        |      (pb.yb = 2 AND pb.match_id < d.doc_id) OR
        |      (pb.yb = 0 AND pb.match_id IN (SELECT doc_id FROM acc0)) OR
        |      (pb.yb = 1 AND pb.match_id IN (SELECT doc_id FROM acc1))))),
        |acc AS (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1
        |        UNION ALL SELECT doc_id FROM acc2)
        |SELECT doc_id, match_id, match_src, jaccard FROM (
        |  SELECT pb.doc_id, pb.match_id, 'delta' AS match_src, pb.jaccard
        |  FROM pb WHERE pb.yb = pb.xb AND pb.match_id < pb.doc_id
        |  UNION ALL
        |  SELECT pb.doc_id, pb.match_id, 'base' AS match_src, pb.jaccard
        |  FROM pb WHERE pb.yb < pb.xb
        |    AND pb.match_id IN (SELECT doc_id FROM acc)
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS BIGINT), 'accepted' AS match_src,
        |         CAST(NULL AS DOUBLE)
        |  FROM acc
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS BIGINT), 'filtered' AS match_src,
        |         CAST(NULL AS DOUBLE)
        |  FROM filt) t
        |ORDER BY doc_id, match_src, match_id""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "ingest_docs_replay" -> docsReplaySql,

    // Same SQL as ingest_docs_replay BY CONSTRUCTION: the maintained
    // replay's contract is that compact/checkpoint/vacuum/prune
    // change nothing a reader can observe, so the definitional
    // replay (which knows nothing of maintenance) is its oracle too.
    "ingest_docs_replay_maintained" -> docsReplaySql,

    "ingest_emb_replay" ->
      s"""WITH $embReplayCtes
        |SELECT vec_id, dup_of, match_src, cos FROM (
        |  SELECT pp.vec_id, pp.dup_of, 'delta' AS match_src, pp.cos
        |  FROM pp WHERE pp.yb = pp.xb AND pp.dup_of < pp.vec_id
        |  UNION ALL
        |  SELECT pp.vec_id, pp.dup_of, 'base' AS match_src, pp.cos
        |  FROM pp WHERE pp.yb < pp.xb
        |    AND pp.dup_of IN (SELECT vec_id FROM acc)
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 'accepted' AS match_src,
        |         CAST(NULL AS DOUBLE)
        |  FROM acc
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 'filtered' AS match_src,
        |         CAST(NULL AS DOUBLE)
        |  FROM filt) t
        |ORDER BY vec_id, match_src, dup_of""".stripMargin,

    // The machine replayed as a recursive CTE: state after event rn
    // derives from state after rn-1 under the same guard order the
    // Scala fold applies (completion resets both stamps; a stage
    // only fills an empty slot whose predecessor stamp allows it).
    "events_funnel_episodes" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type AS typ, CAST(ts AS TIMESTAMP) AS ts,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts, CASE event_type WHEN 'signup' THEN 0
        |             WHEN 'click' THEN 1 WHEN 'purchase' THEN 2
        |             ELSE 3 END, event_id) AS rn
        |  FROM events),
        |st AS (
        |  SELECT user_id, rn,
        |    CASE WHEN typ = 'signup' THEN ts END AS t_s,
        |    CAST(NULL AS TIMESTAMP) AS t_c,
        |    CAST(NULL AS TIMESTAMP) AS emit_s,
        |    CAST(NULL AS TIMESTAMP) AS emit_c,
        |    CAST(NULL AS TIMESTAMP) AS emit_p
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn,
        |    CASE WHEN e.typ = 'purchase' AND s.t_c IS NOT NULL
        |              AND e.ts >= s.t_c THEN NULL
        |         WHEN e.typ = 'signup' AND s.t_s IS NULL THEN e.ts
        |         ELSE s.t_s END,
        |    CASE WHEN e.typ = 'purchase' AND s.t_c IS NOT NULL
        |              AND e.ts >= s.t_c THEN NULL
        |         WHEN e.typ = 'click' AND s.t_s IS NOT NULL
        |              AND e.ts >= s.t_s AND s.t_c IS NULL THEN e.ts
        |         ELSE s.t_c END,
        |    CASE WHEN e.typ = 'purchase' AND s.t_c IS NOT NULL
        |              AND e.ts >= s.t_c THEN s.t_s END,
        |    CASE WHEN e.typ = 'purchase' AND s.t_c IS NOT NULL
        |              AND e.ts >= s.t_c THEN s.t_c END,
        |    CASE WHEN e.typ = 'purchase' AND s.t_c IS NOT NULL
        |              AND e.ts >= s.t_c THEN e.ts END
        |  FROM st s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY rn)
        |       AS INT) AS episode,
        |  emit_s AS t_signup, emit_c AS t_click, emit_p AS t_purchase
        |FROM st WHERE emit_p IS NOT NULL
        |ORDER BY user_id, episode""".stripMargin,

    // The landmark hashes restated from (doc_id, frame) arithmetic —
    // valid because the two spectral lines provably dominate the
    // integer-rounding leakage (see the key's Scaladoc), so the
    // Spark side's REAL FFT peak extraction must recover exactly
    // these bins; the join/threshold/resolve replays verbatim.
    "multimodal_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 2 AS INT) AS nf
        |           FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, nf - 1)) AS f FROM d),
        |fp AS (SELECT DISTINCT doc_id,
        |         (((((doc_id*5 + f*3) % 13 + 2) * 31
        |            + ((doc_id*11 + f*7) % 13 + 18)) * 31
        |            + ((doc_id*5 + (f+1)*3) % 13 + 2)) * 31
        |            + ((doc_id*11 + (f+1)*7) % 13 + 18)) AS h
        |       FROM fr),
        |nfp AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |                 count(*) AS n_common
        |          FROM fp a JOIN fp b
        |            ON a.h = b.h AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |m AS (SELECT p.id1, p.id2, p.n_common
        |      FROM pairs p JOIN nfp n1 ON n1.doc_id = p.id1
        |                   JOIN nfp n2 ON n2.doc_id = p.id2
        |      WHERE p.n_common * 10 >= greatest(n1.n_fp, n2.n_fp) * 9),
        |r AS (SELECT id2 AS doc_id, min(id1) AS dup_of,
        |        (array_agg(n_common ORDER BY id1))[1] AS mc
        |      FROM m GROUP BY id2)
        |SELECT n.doc_id, n.n_fp, r.dup_of,
        |       coalesce(r.mc, 0) AS n_common
        |FROM nfp n LEFT JOIN r ON n.doc_id = r.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // Every frame's pixel array restated from the closed-form paint
    // rule (shot = running count of planted boundaries), diffs as
    // exact integer list sums — so the Spark side's real PNG
    // round-trip per frame must reproduce them bit-for-bit.
    "multimodal_scene_change" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 3 AS INT) AS nf
        |           FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, nf)) AS f FROM d),
        |sh AS (SELECT doc_id, f,
        |         sum(CASE WHEN f >= 1 AND (doc_id*13 + f*17) % 5 = 0
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY f) AS shot
        |       FROM fr),
        |px AS (SELECT doc_id, f,
        |         list_transform(range(0, 48),
        |           i -> ((doc_id*31 + shot*97) % 251 + i + f) % 251) AS p
        |       FROM sh),
        |df AS (SELECT a.doc_id, a.f,
        |         list_sum(list_transform(list_zip(a.p, b.p),
        |           z -> abs(z[1] - z[2]))) AS sad
        |       FROM px a JOIN px b
        |         ON a.doc_id = b.doc_id AND b.f = a.f - 1)
        |SELECT doc_id, CAST(f AS INT) AS frame,
        |       CAST(sad AS BIGINT) AS sum_abs_diff,
        |       sad > 480 AS is_cut
        |FROM df ORDER BY doc_id, frame""".stripMargin,

    "ingest_knn_probe" ->
      s"""WITH $embReplayCtes,
        |accv AS (SELECT s.vec_id, s.embedding
        |         FROM surv s JOIN acc ON acc.vec_id = s.vec_id),
        |qq AS (SELECT vec_id AS qid, embedding FROM embeddings
        |       WHERE vec_id % 7 = 0),
        |p AS (SELECT q.qid, a.vec_id AS neighbor_id,
        |        round(${cosPair("q", "a")}, 6) AS cos_sim
        |      FROM qq q JOIN accv a ON true),
        |r AS (SELECT qid, neighbor_id, cos_sim,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY cos_sim DESC, neighbor_id) AS rk
        |      FROM p)
        |SELECT qid, neighbor_id, cos_sim, rk FROM r WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin
  )
}
