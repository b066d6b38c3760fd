package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wave-2 relational breadth: remaining SURVEY.md §2.2 A/C/D/E keys.
  *
  * Determinism rules (§2.3) and scale notes as in QueriesCore. The two
  * non-equi joins here are written so they stay scale-safe:
  *  - `join_theta_range` keeps the equi key (`l_orderkey = o_orderkey`)
  *    in the join condition so Catalyst plans a hash/sort-merge join
  *    with the range+band terms as residual predicates — never a
  *    nested-loop over the cross product.
  *  - `join_asof` is the union-tag window formulation: O(n log n)
  *    shuffle on the key, no per-row probe; the standard way to asof
  *    at 100 TB (both sides shuffle-partition by user).
  */
object QueriesRel2 {
  import Tables._

  private def ts(x: String): Column = to_timestamp(lit(x))

  // ---------- A. scans / sources ----------

  /** Sink+source round-trip: write `region` as JSON and CSV, read both
    * back with the original schema, union, dedup. Result must equal the
    * original table (oracle = plain scan of region). */
  def scanMultiformat(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d)
    // Per-JVM scratch dir (RunScratch): isolated from concurrent
    // processes, reused (overwritten) across calls within this JVM.
    val tmp = RunScratch.dir("multiformat")
    r.write.mode("overwrite").json(s"$tmp/json")
    r.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val j = s.read.schema(r.schema).json(s"$tmp/json")
    val c = s.read.schema(r.schema).option("header", "true").csv(s"$tmp/csv")
    j.unionByName(c).distinct().orderBy("r_regionkey")
  }

  /** ORC sink + source round-trip (the third columnar format after
    * parquet and csv/json): write nation as ORC, read it back, prove
    * content identity against the original table. ORC is Spark
    * built-in (no connector jar) and carries the same pushdown/pruning
    * surface as parquet. */
  def scanOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d)
    val tmp = RunScratch.dir("orc")
    n.write.mode("overwrite").orc(tmp)
    s.read.schema(n.schema).orc(tmp).orderBy("n_nationkey")
  }

  // ---------- C. joins ----------

  /** Equi-key + residual theta: lineitems shipped within ±30 days of
    * their order's date AND with price ratio in a band. */
  def joinThetaRange(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    lineitem(s, d)
      .join(o,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 30 DAYS") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS") &&
        (col("l_extendedprice") / col("o_totalprice"))
          .between(lit(0.05), lit(0.5)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
              col("o_orderdate"),
              round(col("l_extendedprice") / col("o_totalprice"), 6)
                .as("price_ratio"))
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "price_ratio")
  }

  /** As-of join: each event matched to the user's most recent order at
    * event time (inclusive). Union-tag window formulation; orders are
    * pre-deduped to one row per (user, date) keeping max(o_orderkey) so
    * tie semantics are pinned on both sides. */
  def joinAsof(s: SparkSession, d: String): DataFrame =
    Ops.asofJoin(events(s, d), "event_id", "user_id", "ts",
                 orders(s, d), "o_custkey", "o_orderdate", "o_orderkey",
                 "matched_orderkey")
      .orderBy("event_id")

  /** P4 grid-search: 3×4 parameter grid crossed with a parameterized
    * aggregate over lineitem. */
  def paramGridCross(s: SparkSession, d: String): DataFrame = {
    val qtys = s.range(1).select(explode(array(
      lit(10.0), lit(25.0), lit(40.0))).as("min_qty"))
    val discs = s.range(1).select(explode(array(
      lit(0.02), lit(0.04), lit(0.06), lit(0.08))).as("max_disc"))
    val grid = qtys.crossJoin(discs)
    grid.crossJoin(lineitem(s, d))
      .filter(col("l_quantity") > col("min_qty") &&
              col("l_discount") <= col("max_disc"))
      .groupBy("min_qty", "max_disc")
      // decimal-exact revenue: price(2dp) × (1 − disc(2dp)) is an exact
      // 4dp decimal; summing ~1e9 of it in doubles leaves the 4th
      // decimal to addition order. Decimal accumulator → same double on
      // every engine.
      .agg(count(lit(1)).as("cnt"),
           sum(col("l_extendedprice").cast("decimal(18,2)") *
               (lit(BigDecimal(1)).cast("decimal(3,2)") -
                col("l_discount").cast("decimal(3,2)")))
             .cast("double").as("revenue"))
      .orderBy("min_qty", "max_disc")
  }

  // ---------- D. aggregations ----------

  /** HLL approximate distinct — sketch values are engine-specific, so
    * no-oracle; scalatest asserts ±5% of exact instead. */
  def distinctApprox(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .agg(approx_count_distinct(col("l_partkey")).as("n_parts_approx"))

  /** CUBE with grouping() markers (grouping-sets surface: CUBE(a,b) ≡
    * GROUPING SETS ((a,b),(a),(b),()) — oracle uses the GROUPING SETS
    * spelling to pin the equivalence). */
  def aggCubeGsets(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
           round(sum("o_totalprice"), 4).as("total"),
           grouping(col("o_orderstatus")).cast("int").as("g_status"),
           grouping(col("o_orderpriority")).cast("int").as("g_prio"))
      .orderBy(col("g_status"), col("g_prio"),
               col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)

  /** Statistical aggregate family over numerically-small columns
    * (quantity/discount) so cross-engine summation-order noise stays
    * far below the 6dp rounding (SURVEY.md §2.3-2). */
  def aggStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("min_price"),
           max("l_extendedprice").as("max_price"),
           round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
           round(var_samp(col("l_quantity")), 6).as("var_qty"),
           round(corr(col("l_quantity"), col("l_extendedprice")), 6)
             .as("corr_qty_price"),
           round(covar_samp(col("l_quantity"), col("l_discount")), 6)
             .as("cov_qty_disc"))
      .orderBy("l_returnflag")

  /** Per-group sorted collect_list — sorting makes the array
    * deterministic (unsorted collect is not; §2.3-5). */
  /** collect_list → sorted → comma-joined STRING: the list itself is the
    * operator under test, but the output column must be scalar — the
    * driver's pandas-based compare cannot sort/hash ndarray cells. Int
    * elements render identically in both engines, so the join is safe. */
  def aggCollectSorted(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_custkey")
      .agg(array_join(
        expr("transform(array_sort(collect_list(o_orderkey)), x -> CAST(x AS STRING))"),
        ",").as("order_keys"))
      .orderBy("o_custkey")

  // ---------- E. windows ----------

  /** rank / dense_rank / ntile / percent_rank / cume_dist over one
    * totally-ordered partition (tiebreaker key makes ranks exact). */
  def windowRankingMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("c_mktsegment", "rnk")
  }

  /** lag / lead with defaults, first_value / last_value with explicit
    * frames, nth_value. */
  def windowAnalytic(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1, -1.0).over(wo).as("prev_price"),
        lead(col("o_totalprice"), 1, -1.0).over(wo).as("next_price"),
        first(col("o_orderkey")).over(wFull).as("first_key"),
        last(col("o_orderkey")).over(wFull).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Running 90-day revenue per customer: RANGE frame over a numeric
    * day index (both engines window over the same integer — Gotcha:
    * Spark range frames need numeric ordering). */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("dnum"))
      .rangeBetween(-90, 0)
    orders(s, d)
      .withColumn("dnum", datediff(col("o_orderdate").cast("date"),
                                   lit("1970-01-01").cast("date")))
      .select(col("o_custkey"), col("o_orderkey"), col("dnum"),
        round(sum(col("o_totalprice")).over(w), 4).as("run_rev"))
      .orderBy("o_custkey", "o_orderkey")
  }
}
