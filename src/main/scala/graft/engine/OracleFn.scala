package graft.engine

import scala.collection.immutable.ListMap

/** DuckDB oracles for the scalar-function-matrix keys (QueriesFn).
  * Name translations: instr→strpos, split→string_split, size→len,
  * date_format→strftime, dayofweek→dow+1, slice→list slicing,
  * aggregate→list_aggregate('sum') over list_transform, map exercise →
  * plain UNION ALL relational truth (maps never compared raw).
  */
object OracleFn {
  val sql: ListMap[String, String] = ListMap(
    "fn_string" ->
      """SELECT p_partkey,
        |  concat(p_name, '_', p_brand) AS cat,
        |  substr(p_name, 3, 8) AS sub,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  trim(concat(' ', p_name, ' ')) AS tr,
        |  ltrim(concat('xx', p_name), 'x') AS ltr,
        |  rtrim(concat(p_name, 'yy'), 'y') AS rtr,
        |  lpad(p_brand, 12, '.') AS lp,
        |  length(p_name) AS len_name,
        |  replace(p_name, 'a', '@') AS repl,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS rre,
        |  regexp_extract(p_name, '([a-m]+)', 1) AS rex,
        |  len(string_split(p_name, ' ')) AS n_tokens,
        |  strpos(p_name, 'e') AS pos_e,
        |  left(p_name, 4) AS l4,
        |  right(p_name, 3) AS r3
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since_1995,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow1,
        |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |  CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS back_to_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT c_custkey,
        |  abs(c_acctbal) AS ab,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
        |  round(c_acctbal / CAST(1.337 AS DOUBLE), 2) AS rnd,
        |  round(sqrt(abs(c_acctbal) + 1), 6) AS sq,
        |  round(exp(c_acctbal / 10000), 6) AS ex,
        |  round(ln(abs(c_acctbal) + 1), 6) AS lnx,
        |  round(log10(abs(c_acctbal) + 1), 6) AS lg,
        |  round(pow(c_acctbal, 2), 4) AS p2,
        |  CAST(sign(c_acctbal) AS INT) AS sg,
        |  c_custkey % 7 AS md,
        |  greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS grt,
        |  least(c_acctbal, CAST(0.0 AS DOUBLE)) AS lst
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  len(embedding) AS n,
        |  CAST(embedding[1:4][1] AS DOUBLE) AS f1,
        |  CAST(embedding[1:4][4] AS DOUBLE) AS f4,
        |  CAST(embedding[2] AS DOUBLE) AS e2,
        |  list_contains([label, label + 1], 5) AS has5,
        |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS amax,
        |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS amin,
        |  round(list_aggregate(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * x), 'sum'), 6) AS sumsq,
        |  CAST(list_sort(embedding[1:4], 'DESC')[1] AS DOUBLE) AS srt1,
        |  CAST(list_sort(embedding[1:4], 'DESC')[4] AS DOUBLE) AS srt4,
        |  array_to_string(list_sort(list_distinct([label % 3, label % 3, 1])), ',') AS dedup,
        |  array_to_string(flatten([[label, 1], [2, label]]), ',') AS flat,
        |  list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[3] AS dbl3
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_array_explode" ->
      """SELECT vec_id, k.k AS pos, embedding[k.k + 1] AS val
        |FROM embeddings CROSS JOIN (VALUES (0), (1)) k(k)
        |ORDER BY vec_id, pos""".stripMargin,

    "fn_map" ->
      """SELECT c_custkey, mkey, mval, c_mktsegment AS seg_lookup,
        |       'bal,key,nation,seg' AS all_keys
        |FROM (
        |  SELECT c_custkey, 'seg' AS mkey, c_mktsegment AS mval, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR), c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'key', CAST(c_custkey AS VARCHAR), c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'bal', CAST(CAST(floor(c_acctbal) AS BIGINT) AS VARCHAR),
        |         c_mktsegment
        |  FROM customer) t
        |ORDER BY c_custkey, mkey""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(props->>'k' AS INT) AS k_int,
        |  props->>'k' AS k_str,
        |  CAST(props->>'k' AS INT) AS k_from_struct,
        |  '{"k":' || (props->>'k') || '}' AS roundtrip
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_conditional" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg,
        |  CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS iff,
        |  CASE WHEN c_acctbal > 5000 THEN 'high'
        |       WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS coal,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'X') AS nv,
        |  CASE WHEN c_acctbal < 0 THEN CAST(-1.0 AS DOUBLE)
        |       ELSE c_acctbal END AS nan_fixed,
        |  least(c_acctbal, CAST(0.0 AS DOUBLE)) AS lst,
        |  greatest(c_acctbal, CAST(5000.0 AS DOUBLE)) AS grt
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
