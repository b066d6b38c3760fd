package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2-I: scalar function matrix — one key per family, each
  * projecting a deterministic row set through the family's functions.
  * Cross-engine divergences (Gotcha #6) are pinned here:
  *  - `date_trunc` → Spark TIMESTAMP vs DuckDB DATE: cast both to DATE;
  *  - `dayofweek` (Sun=1) vs DuckDB `dow` (Sun=0): oracle adds 1;
  *  - `sign` → cast to INT on both sides;
  *  - `months_between` has no DuckDB twin → portable month arithmetic;
  *  - leading/trailing trims use ANSI `TRIM(LEADING/TRAILING … FROM …)`.
  */
object QueriesFn {
  import Tables._

  def fnString(s: SparkSession, d: String): DataFrame =
    part(s, d).selectExpr(
      "p_partkey",
      "concat(p_name, '_', p_brand) AS cat",
      "substr(p_name, 3, 8) AS sub",
      "upper(p_name) AS up",
      "lower(p_brand) AS lo",
      "trim(concat(' ', p_name, ' ')) AS tr",
      "trim(LEADING 'x' FROM concat('xx', p_name)) AS ltr",
      "trim(TRAILING 'y' FROM concat(p_name, 'yy')) AS rtr",
      "lpad(p_brand, 12, '.') AS lp",
      "length(p_name) AS len_name",
      "replace(p_name, 'a', '@') AS repl",
      "regexp_replace(p_name, '[aeiou]', '*') AS rre",
      "regexp_extract(p_name, '([a-m]+)', 1) AS rex",
      "size(split(p_name, ' ')) AS n_tokens",
      "instr(p_name, 'e') AS pos_e",
      "left(p_name, 4) AS l4",
      "right(p_name, 3) AS r3")
      .orderBy("p_partkey")

  def fnDate(s: SparkSession, d: String): DataFrame =
    orders(s, d).selectExpr(
      "o_orderkey",
      "year(o_orderdate) AS y",
      "month(o_orderdate) AS m",
      "day(o_orderdate) AS d",
      "CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start",
      "date_add(CAST(o_orderdate AS DATE), 30) AS plus30",
      "(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since_1995",
      "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since",
      "last_day(CAST(o_orderdate AS DATE)) AS eom",
      "dayofweek(o_orderdate) AS dow1",
      "date_format(o_orderdate, 'yyyy-MM-dd') AS fmt",
      "to_date(date_format(o_orderdate, 'yyyy-MM-dd')) AS back_to_date")
      .orderBy("o_orderkey")

  def fnMath(s: SparkSession, d: String): DataFrame =
    customer(s, d).selectExpr(
      "c_custkey",
      "abs(c_acctbal) AS ab",
      "ceil(c_acctbal) AS ce",
      "floor(c_acctbal) AS fl",
      // division, not multiplication: a 2-decimal × 3-decimal product
      // has exactly 5 decimals, so round(..., 2) can land on a true
      // decimal midpoint where Spark (BigDecimal shortest-repr HALF_UP)
      // and DuckDB (scaled-multiply) disagree — hit once at sf0.1.
      // Quotients have non-terminating expansions; midpoints unreachable.
      "round(c_acctbal / CAST(1.337 AS DOUBLE), 2) AS rnd",
      "round(sqrt(abs(c_acctbal) + 1), 6) AS sq",
      "round(exp(c_acctbal / 10000), 6) AS ex",
      "round(ln(abs(c_acctbal) + 1), 6) AS lnx",
      "round(log10(abs(c_acctbal) + 1), 6) AS lg",
      "round(pow(c_acctbal, 2), 4) AS p2",
      "CAST(sign(c_acctbal) AS INT) AS sg",
      "c_custkey % 7 AS md",
      "greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS grt",
      "least(c_acctbal, CAST(0.0 AS DOUBLE)) AS lst")
      .orderBy("c_custkey")

  /** Higher-order array functions over the 64-dim embedding column.
    * Lambdas cast elements to DOUBLE before arithmetic so both engines
    * compute the identical double sequence (float32 → double is exact). */
  def fnArray(s: SparkSession, d: String): DataFrame =
    // The array ops under test (slice/sort_array/array_distinct/flatten/
    // transform) still run — but every OUTPUT column is scalar, because
    // the driver's pandas compare cannot sort/hash ndarray cells.
    // Float elements are projected out as DOUBLE columns (float32→double
    // is exact on both engines); int arrays are comma-joined strings.
    embeddings(s, d).selectExpr(
      "vec_id",
      "size(embedding) AS n",
      "CAST(element_at(slice(embedding, 1, 4), 1) AS DOUBLE) AS f1",
      "CAST(element_at(slice(embedding, 1, 4), 4) AS DOUBLE) AS f4",
      "CAST(element_at(embedding, 2) AS DOUBLE) AS e2",
      "array_contains(array(label, label + 1), 5) AS has5",
      "CAST(array_max(embedding) AS DOUBLE) AS amax",
      "CAST(array_min(embedding) AS DOUBLE) AS amin",
      "round(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x), 6) AS sumsq",
      "CAST(element_at(reverse(sort_array(slice(embedding, 1, 4))), 1) AS DOUBLE) AS srt1",
      "CAST(element_at(reverse(sort_array(slice(embedding, 1, 4))), 4) AS DOUBLE) AS srt4",
      "array_join(transform(sort_array(array_distinct(array(label % 3, label % 3, 1))), x -> CAST(x AS STRING)), ',') AS dedup",
      "array_join(transform(flatten(array(array(label, 1), array(2, label))), x -> CAST(x AS STRING)), ',') AS flat",
      "element_at(transform(slice(embedding, 1, 3), x -> CAST(x AS DOUBLE) * 2.0), 3) AS dbl3")
      .orderBy("vec_id")

  /** posexplode companion to fn_array (Generator path through explode). */
  def fnArrayExplode(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 2)))
      .withColumnRenamed("col", "val")
      .orderBy("vec_id", "pos")

  /** Map construction (map_from_arrays + str_to_map + map_concat),
    * lookup, and explode-to-sorted-rows output (§2.3-5: never compare
    * raw map columns — iteration order is undefined on both engines). */
  def fnMap(s: SparkSession, d: String): DataFrame = {
    val m1 = map_from_arrays(
      array(lit("seg"), lit("nation")),
      array(col("c_mktsegment"), col("c_nationkey").cast("string")))
    val m2 = expr(
      "str_to_map(concat('key=', c_custkey, ';bal=', CAST(floor(c_acctbal) AS BIGINT)), ';', '=')")
    customer(s, d)
      .withColumn("m", map_concat(m1, m2))
      .withColumn("seg_lookup", element_at(col("m"), lit("seg")))
      .withColumn("all_keys", array_join(array_sort(map_keys(col("m"))), ","))
      // explode_outer: the maps are never empty, and the non-outer
      // Generate plants a `size(m) > 0` filter that re-inlines the whole
      // map expression — measured 2× planning/codegen cost for nothing.
      .select(col("c_custkey"), explode_outer(col("m")).as(Seq("mkey", "mval")),
              col("seg_lookup"), col("all_keys"))
      .orderBy("c_custkey", "mkey")
  }

  def fnJson(s: SparkSession, d: String): DataFrame = {
    val kInt = get_json_object(col("props"), "$.k").cast("int")
    events(s, d)
      .select(
        col("event_id"),
        kInt.as("k_int"),
        json_tuple(col("props"), "k").as("k_str"),
        from_json(col("props"), "k INT", Map.empty[String, String])
          .getField("k").as("k_from_struct"),
        to_json(struct(kInt.as("k"))).as("roundtrip"))
      .orderBy("event_id")
  }

  def fnConditional(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        expr("if(c_acctbal > 0, 'pos', 'nonpos')").as("iff"),
        when(col("c_acctbal") > 5000, "high")
          .when(col("c_acctbal") > 0, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE"))
          .as("coal"),
        expr("nvl(nullif(c_mktsegment, 'BUILDING'), 'X')").as("nv"),
        nanvl(when(col("c_acctbal") < 0, lit(Double.NaN))
                .otherwise(col("c_acctbal")), lit(-1.0)).as("nan_fixed"),
        least(col("c_acctbal"), lit(0.0)).as("lst"),
        greatest(col("c_acctbal"), lit(5000.0)).as("grt"))
      .orderBy("c_custkey")
}
