package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 2: the SQL planning surfaces still unexercised after
  * the correlated-subquery keys (null-aware anti join, LATERAL
  * decorrelation, scalar-subquery-in-SELECT, recursive CTE /
  * UnionLoop, disjunctive pushdown, conditional-ratio aggregates) plus
  * two corpus-pipeline operators every pretraining run needs:
  * cross-corpus span dedup (the C4 recipe) and source-mix rebalancing
  * to a token budget.
  *
  * Determinism contract is SURVEY.md §2.3 throughout: decimal
  * accumulators on exact grids for money sums, quotient-then-round for
  * ratios (never round products — see BASELINE.md round-3 notes), md5
  * for portable hashing, and total output orders.
  */
object QueriesR5 {
  import Tables._

  /** Exact-decimal lineitem revenue — the repo's §2.3 money idiom. */
  private val revDec =
    expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")

  /** TPC-H Q14 shape — promo revenue share per ship month. The
    * conditional-ratio aggregate: one pass, two CASE-routed decimal
    * accumulators, ratio taken as a double quotient then rounded
    * (quotients don't sit on round midpoints; products do). Part is
    * broadcast under a size gate — when it fits, the fact table
    * streams through one map-side-combined aggregate and never
    * shuffles before the 80-group reduce; past the gate the join
    * degrades to a shuffle join (part scales with SF). */
  def q14PromoRatio(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      // size-gated: part scales with SF — hint only while the scan
      // estimate fits; at 100 TB AQE decides from runtime sizes
      .join(Ops.broadcastIfSmall(part(s, d), part(s, d)),
            col("l_partkey") === col("p_partkey"))
      .groupBy(expr("CAST(date_trunc('month', l_shipdate) AS DATE)").as("month"))
      .agg(
        coalesce(sum(when(col("p_type") === "PROMO", revDec)), expr("CAST(0 AS DECIMAL(18,4))"))
          .cast("double").as("promo_revenue"),
        sum(revDec).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        round(col("promo_revenue") * 100.0 / col("total_revenue"), 6))
      .orderBy("month")

  /** TPC-H Q19 shape — an OR of brand/size/quantity conjunctions
    * spanning both join sides. Exercises disjunctive predicate
    * handling: Catalyst extracts the per-side implications (the
    * brand/size OR reaches the part scan as a pushed filter, the
    * quantity OR reaches lineitem) so neither side scans full before
    * the join — PlanSpec pins this. Part broadcasts under the same
    * size gate as q14. */
  def q19DisjunctivePred(s: SparkSession, d: String): DataFrame = {
    val disj =
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
        col("l_quantity").between(5, 25)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 35) &&
        col("l_quantity").between(10, 30))
    lineitem(s, d)
      // size-gated like q14: part grows with SF
      .join(Ops.broadcastIfSmall(part(s, d), part(s, d)),
            col("l_partkey") === col("p_partkey"))
      .filter(disj)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
           sum(revDec).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  /** NOT IN (subquery) — the null-aware anti join, the one join
    * variant the registry had not planned (semi/anti cover IN/EXISTS;
    * NOT IN needs the null-probe build side because one NULL in the
    * subquery empties the result under three-valued logic). Spark
    * plans BroadcastHashJoin(LeftAnti, isNullAware=true) — PlanSpec
    * pins the flag. At sf0.001 the subquery is empty (no
    * negative-balance supplier) and NOT IN keeps everything — both
    * engines agree; larger SFs exclude most nations. */
  def joinNotinNullaware(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("nn_customer")
    supplier(s, d).createOrReplaceTempView("nn_supplier")
    s.sql("""
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      FROM nn_customer
      WHERE c_nationkey NOT IN
            (SELECT s_nationkey FROM nn_supplier WHERE s_acctbal < 0.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT — per-nation
    * top-3 customers by balance. Catalyst decorrelates the lateral
    * limit into a ranked window join (DecorrelateInnerQuery), never a
    * per-outer-row rescan; c_name breaks acctbal ties so the top-3 set
    * is engine-independent. The DSL topk_per_group key computes the
    * same shape imperatively; this one proves the SQL planning path. */
  def joinLateralTopk(s: SparkSession, d: String): DataFrame = {
    nation(s, d).createOrReplaceTempView("lat_nation")
    customer(s, d).createOrReplaceTempView("lat_customer")
    s.sql("""
      SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS c_acctbal
      FROM lat_nation n,
      LATERAL (SELECT c_name, c_acctbal FROM lat_customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 3) t
      ORDER BY n.n_name, c_acctbal DESC, t.c_name""")
  }

  /** Correlated scalar subqueries in the SELECT list (not WHERE —
    * q17/q22 cover that): per sampled customer, order count and total
    * spend. Decorrelates to ONE aggregate over orders left-outer-joined
    * back to the probe (COUNT over the empty group must yield 0, not
    * NULL — the classic decorrelation correctness trap this key locks
    * in); the two subqueries share one subtree via
    * MergeScalarSubqueries. */
  def subquerySelectScalar(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("ssq_customer")
    orders(s, d).createOrReplaceTempView("ssq_orders")
    s.sql("""
      SELECT c.c_custkey,
        CAST((SELECT COUNT(*) FROM ssq_orders o
              WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        CAST(COALESCE((SELECT SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                       FROM ssq_orders o
                       WHERE o.o_custkey = c.c_custkey), 0) AS DOUBLE)
          AS total_spend
      FROM ssq_customer c
      WHERE c.c_custkey % 7 = 0
      ORDER BY c.c_custkey""")
  }

  /** Recursive CTE (Spark 4 UnionLoop) — a calendar spine: 80 month
    * starts generated by recursion, left-joined to per-month order
    * aggregates so empty months surface as zeros (the warehouse
    * gap-fill idiom; ts_gap_fill does it from data, this one from a
    * generator). Orders are aggregated BEFORE the join — the spine
    * join touches 80×80 rows however big orders is, which is the only
    * sane shape at 100 TB. Recursion depth 80 < Spark's level limit
    * (100); the spine bounds are data-independent (the generator
    * ranges over the fixed 1995-01..2001-08 corpus window, identical
    * at every SF). */
  def cteRecursiveMonths(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("rcte_orders")
    s.sql("""
      WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL '1' MONTH FROM months
        WHERE m < DATE '2001-08-01'
      ),
      agg AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        FROM rcte_orders GROUP BY 1
      )
      SELECT CAST(m AS DATE) AS month,
             CAST(COALESCE(n, 0) AS BIGINT) AS n_orders,
             CAST(COALESCE(tot, 0) AS DOUBLE) AS total_price
      FROM months LEFT JOIN agg ON CAST(m AS DATE) = mon
      ORDER BY month""")
  }

  /** Cross-corpus span dedup — the C4 recipe: cut every document into
    * fixed 10-token spans, keep only each span's FIRST occurrence
    * corpus-wide (first = lowest (doc_id, span_idx) — a total order,
    * so the survivor set is engine-independent), and reassemble the
    * cleaned document from its surviving spans in order. One shuffle,
    * keyed by span text — exactly how the pass runs at 100 TB (the
    * span key would be its hash there; the text itself keeps the
    * oracle comparable). Reassembly is array-native: collect the
    * surviving (idx, span) pairs per doc, sort in-row, join — no
    * second window. */
  def docsSpanDedup(s: SparkSession, d: String): DataFrame = {
    val spans = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST(ceil(size(w) / 10.0) AS INT) - 1)," +
          " i -> array_join(slice(w, i * 10 + 1, 10), ' '))")))
      .select(col("doc_id"), col("pos").as("span_idx"), col("col").as("span"))
    spans
      .withColumn("rn", row_number().over(
        Window.partitionBy("span").orderBy("doc_id", "span_idx")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          expr("transform(array_sort(collect_list(CASE WHEN rn = 1 THEN " +
            "struct(span_idx, span) END)), x -> x.span)"), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Source-mix rebalancing to a token budget: every source is
    * down-sampled toward the smallest source's token count (the
    * uniform-mix target a pretraining data recipe starts from). The
    * sample is a deterministic hash gate — keep iff the doc's md5
    * prefix falls below the rate's 8-hex-digit threshold — so the
    * same doc survives on any cluster, any partitioning, either
    * engine (thresholds compare lexicographically on lowercase hex;
    * rate 1.0 short-circuits so the 9-hex-digit boundary case never
    * forms). Two tiny broadcasts; the corpus is scanned once. */
  def docsTokenBudgetMix(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d).select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val totals = tok.groupBy("source")
      .agg(sum("n_tokens").as("tok_total"), count(lit(1)).as("n_docs"))
    val tmin = totals.agg(min("tok_total").as("tok_target"))
    val rates = totals.crossJoin(broadcast(tmin))
      .withColumn("rate",
        round(col("tok_target").cast("double") / col("tok_total").cast("double"), 6))
      .withColumn("thresh",
        lower(lpad(hex(floor(col("rate") * 4294967296.0).cast("long")), 8, "0")))
    tok.join(broadcast(rates.select("source", "n_docs", "tok_total", "rate", "thresh")),
             "source")
      .withColumn("keep", col("rate") >= 1.0 ||
        substring(md5(col("doc_id").cast("string")), 1, 8) < col("thresh"))
      .groupBy("source")
      .agg(min("n_docs").as("n_docs"),
           min("tok_total").as("tok_total"),
           min("rate").as("rate"),
           sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .orderBy("source")
  }
}
