package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the round-2 coverage wave (QueriesR2).
  * Dtype-kind discipline (§2.3 + round-1 postmortem): every DuckDB
  * aggregate over integers is CAST to BIGINT (sum(int) → HUGEINT →
  * pandas float64 otherwise), and no output column is array-typed. */
object OracleR2 {

  private val argScore =
    "CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey"

  private val cosinePair =
    """list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
      |      / (sqrt(list_aggregate(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum'))
      |       * sqrt(list_aggregate(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * x), 'sum')))""".stripMargin

  val sql: ListMap[String, String] = ListMap(
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_argminmax" ->
      s"""SELECT o_orderpriority,
         |  arg_max(o_orderkey, $argScore) AS top_order,
         |  arg_min(o_orderkey, $argScore) AS bottom_order,
         |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
         |  bool_or(o_totalprice > 400000.0) AS any_big,
         |  bool_and(o_totalprice > 1000.0) AS all_over_1k
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "pivot_status_matrix" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "unpivot_balance_metrics" ->
      """SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, 'bal' AS metric, c_acctbal AS val FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'bal_2x', c_acctbal * 2 FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'bal_neg', -c_acctbal FROM customer) u
        |ORDER BY c_custkey, metric""".stripMargin,

    "sample_hash_deterministic" ->
      """SELECT o_orderstatus, count(*) AS n_sampled,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sampled_total
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_string_similarity" ->
      """SELECT a.p_partkey AS id1, b.p_partkey AS id2,
        |  levenshtein(a.p_name, b.p_name) AS lev,
        |  round(CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        |        / CAST(greatest(len(a.p_name), len(b.p_name)) AS DOUBLE), 6)
        |    AS lev_norm
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey <= 60 AND b.p_partkey <= 60
        |ORDER BY id1, id2""".stripMargin,

    "docs_pii_redact" ->
      """WITH r AS (SELECT doc_id, text,
        |  regexp_replace(regexp_replace(text, '[0-9]{2,}', '<NUM>', 'g'),
        |                 '\bthe\b', '<W>', 'g') AS red
        |  FROM documents)
        |SELECT doc_id,
        |  substring(red, 1, 60) AS red_prefix,
        |  len(red) AS red_len,
        |  len(regexp_extract_all(text, '\bthe\b')) AS n_the
        |FROM r ORDER BY doc_id""".stripMargin,

    "ts_gap_fill" ->
      """WITH o AS (SELECT o_custkey, date_trunc('day', o_orderdate) AS day
        |           FROM orders WHERE o_custkey < 20),
        |s AS (SELECT o_custkey, min(day) AS d0, max(day) AS d1
        |      FROM o GROUP BY o_custkey),
        |d AS (SELECT o_custkey,
        |        unnest(generate_series(d0, d1, INTERVAL 1 day)) AS day
        |      FROM s),
        |c AS (SELECT o_custkey, day, count(*) AS n FROM o GROUP BY 1, 2)
        |SELECT d.o_custkey, d.day, coalesce(c.n, 0) AS n_orders
        |FROM d LEFT JOIN c USING (o_custkey, day)
        |ORDER BY o_custkey, day""".stripMargin,

    "fn_trig" ->
      """SELECT c_custkey,
        |  round(sin(c_acctbal / 1000), 6) AS sn,
        |  round(cos(c_acctbal / 1000), 6) AS cs,
        |  round(tan(c_custkey % 7 + 0.1), 6) AS tn,
        |  round(asin((c_custkey % 19) / 19.0), 6) AS asn,
        |  round(acos((c_custkey % 19) / 19.0), 6) AS acs,
        |  round(atan(c_acctbal / 1000), 6) AS atn,
        |  round(atan2(c_acctbal, c_custkey + 1.0), 6) AS at2,
        |  round(degrees(c_acctbal / 1000), 6) AS dg,
        |  round(radians(CAST(c_custkey % 360 AS DOUBLE)), 6) AS rd,
        |  round((exp(c_acctbal / 10000) - exp(-c_acctbal / 10000)) / 2, 6) AS snh,
        |  round((exp(c_acctbal / 10000) + exp(-c_acctbal / 10000)) / 2, 6) AS csh,
        |  round((exp(c_acctbal / 10000) - exp(-c_acctbal / 10000))
        |        / (exp(c_acctbal / 10000) + exp(-c_acctbal / 10000)), 6) AS tnh
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_weighted_stats" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS w_mass,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))
        |                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |        / CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE), 6)
        |    AS w_mean,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))
        |                 * (CAST(l_extendedprice AS DECIMAL(12,2))
        |                    * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE)
        |        / CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE)
        |        - pow(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))
        |                       * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |              / CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE), 2),
        |        4) AS w_var
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_bitwise" ->
      """SELECT event_id,
        |  event_id & user_id AS band,
        |  event_id | user_id AS bor,
        |  xor(event_id, user_id) AS bxor,
        |  ~event_id AS bnot,
        |  user_id << 3 AS shl,
        |  event_id >> 2 AS shr,
        |  CAST(bit_count(event_id) AS INT) AS bc,
        |  event_id % 8 AS bucket
        |FROM events ORDER BY event_id""".stripMargin,

    "window_ignore_nulls" ->
      """WITH b AS (SELECT o_custkey, o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS v
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, v,
        |  last_value(v IGNORE NULLS) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_last,
        |  nth_value(v, 2 IGNORE NULLS) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_nn,
        |  lead(v IGNORE NULLS) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_nn
        |FROM b ORDER BY o_custkey, o_orderkey""".stripMargin,

    "sample_stratified" ->
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 100
        |ORDER BY o_orderstatus, rn""".stripMargin,

    "docs_entropy" ->
      """WITH tc AS (SELECT doc_id, t, count(*) AS c FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |   FROM documents) z GROUP BY doc_id, t),
        |wn AS (SELECT doc_id, c,
        |         sum(c) OVER (PARTITION BY doc_id) AS n
        |       FROM tc)
        |SELECT doc_id,
        |  count(*) AS n_unique,
        |  CAST(min(n) AS BIGINT) AS n_tokens,
        |  round(-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 6)
        |    AS entropy
        |FROM wn GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |a AS (SELECT user_id, min(ts) AS t_signup FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |b AS (SELECT c.user_id, a.t_signup, min(c.ts) AS t_click
        |      FROM e c JOIN a ON c.user_id = a.user_id
        |      WHERE c.event_type = 'click' AND c.ts >= a.t_signup
        |      GROUP BY c.user_id, a.t_signup),
        |c3 AS (SELECT p.user_id, min(p.ts) AS t_purchase
        |       FROM e p JOIN b ON p.user_id = b.user_id
        |       WHERE p.event_type = 'purchase' AND p.ts >= b.t_click
        |       GROUP BY p.user_id)
        |SELECT a.user_id, a.t_signup, b.t_click, c3.t_purchase,
        |  CAST(CASE WHEN c3.t_purchase IS NOT NULL THEN 3
        |            WHEN b.t_click IS NOT NULL THEN 2
        |            ELSE 1 END AS INT) AS stage
        |FROM a
        |LEFT JOIN b ON a.user_id = b.user_id
        |LEFT JOIN c3 ON a.user_id = c3.user_id
        |ORDER BY a.user_id""".stripMargin,

    "events_retention" ->
      """WITH e AS (SELECT user_id,
        |             date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        |           FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e
        |      GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(date_diff('day', c.cohort_week, e.week) // 7 AS INT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_anomaly_zscore" ->
      """WITH s AS (SELECT event_id, event_type, value,
        |    avg(value) OVER (PARTITION BY event_type) AS mu,
        |    stddev_samp(value) OVER (PARTITION BY event_type) AS sd
        |  FROM events)
        |SELECT event_id, event_type, value,
        |       round((value - mu) / sd, 4) AS z
        |FROM s WHERE abs(round((value - mu) / sd, 4)) > 3.0
        |ORDER BY event_id""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(least(floor(n_chars / 100.0), 20) AS INT) AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    "emb_ivf_recall" ->
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
        |ap AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |        round($cosinePair, 6) AS cos_sim
        |      FROM probes a JOIN idx b
        |        ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
        |ann AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM ap) t WHERE rk <= 3),
        |ep AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    round($cosinePair, 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |exact AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM ep) t WHERE rk <= 3),
        |pervec AS (SELECT e.vec_id,
        |    CAST(count(*) FILTER (WHERE ann.vec_id IS NOT NULL) AS BIGINT)
        |      AS matched
        |  FROM exact e LEFT JOIN ann
        |    ON e.vec_id = ann.vec_id AND e.neighbor_id = ann.neighbor_id
        |  GROUP BY e.vec_id)
        |SELECT matched, count(*) AS n_vecs
        |FROM pervec GROUP BY matched ORDER BY matched""".stripMargin,

    "emb_ann_lsh" ->
      s"""WITH planes AS (
        |  SELECT a.p, b.j,
        |    (CAST(('0x' || substr(md5(a.p || '_' || b.j), 1, 8))::BIGINT
        |          % 2001 AS DOUBLE) - 1000.0) / 1000.0 AS h
        |  FROM (SELECT unnest(range(0, 8)) AS p) a,
        |       (SELECT unnest(range(1, 65)) AS j) b),
        |pe AS (SELECT vec_id, i AS j, CAST(embedding[i] AS DOUBLE) AS x
        |       FROM (SELECT vec_id, embedding,
        |               unnest(range(1, len(embedding) + 1)) AS i
        |             FROM embeddings) t),
        |dots AS (SELECT pe.vec_id, planes.p,
        |           round(sum(planes.h * pe.x), 6) AS dot
        |         FROM pe JOIN planes ON pe.j = planes.j
        |         GROUP BY pe.vec_id, planes.p),
        |sig AS (SELECT vec_id,
        |          CAST(sum(CASE WHEN dot > 0 THEN 1 << CAST(p AS INT)
        |                        ELSE 0 END) AS BIGINT) AS bucket
        |        FROM dots GROUP BY vec_id),
        |ws AS (SELECT e.vec_id, e.embedding, s.bucket
        |       FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id),
        |pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |            round($cosinePair, 6) AS cos_sim
        |          FROM ws a JOIN ws b
        |            ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        |SELECT vec_id, neighbor_id, cos_sim, rk FROM (
        |  SELECT vec_id, neighbor_id, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rk
        |  FROM pairs) t
        |WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,

    "emb_quantize_int8" ->
      """WITH b AS (SELECT vec_id, embedding,
        |    greatest(list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))), 1e-9) / 127.0 AS scale
        |  FROM embeddings),
        |p AS (SELECT vec_id, scale,
        |        unnest(embedding) AS x,
        |        unnest(range(1, len(embedding) + 1)) AS pos1
        |      FROM b),
        |q AS (SELECT vec_id, scale, pos1,
        |        CAST(round(CAST(x AS DOUBLE) / scale) AS INT) AS qv
        |      FROM p)
        |SELECT vec_id, min(scale) AS scale,
        |  CAST(sum(qv * pos1) AS BIGINT) AS qdot,
        |  CAST(sum(abs(qv)) AS BIGINT) AS l1
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,
  )
}
