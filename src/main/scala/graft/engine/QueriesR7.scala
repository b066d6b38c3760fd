package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 wave 4: the last unexercised equi-join variant (null-safe
  * equality — `<=>` IS a hash-join key, unlike a general null
  * predicate), the ANSI error-safe arithmetic surface (try_*), and a
  * vocabulary-coverage corpus operator (OOV rate against a trained
  * top-K vocab — the tokenizer-fit signal next to docs_lm_score's LM
  * perplexity). §2.3 determinism rules throughout. */
object QueriesR7 {
  import Tables._

  private def ts(x: String): Column = to_timestamp(lit(x))

  /** Null-safe equality join: keys are made nullable with nullif
    * (nation 3 → NULL on BOTH sides), then joined with `<=>` so the
    * NULL group matches itself — three-valued `=` would drop it.
    * EqualNullSafe is a genuine equi key (hash-joinable — PlanSpec
    * asserts no nested loop), which is exactly why the variant
    * deserves its own key: the naive `(a = b) OR (a IS NULL AND b IS
    * NULL)` spelling degrades to a nested loop at 100 TB; `<=>`
    * stays one shuffle (or a broadcast, as here — supplier is the
    * dim). */
  def joinNullsafeEq(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
      .select(expr("nullif(c_nationkey, 3)").as("c_nk"), col("c_acctbal"))
    val sup = supplier(s, d)
      .select(expr("nullif(s_nationkey, 3)").as("s_nk"), col("s_suppkey"))
    // size-gated: supplier scales with SF
    c.join(Ops.broadcastIfSmall(sup, supplier(s, d)),
           col("c_nk") <=> col("s_nk"))
      .groupBy(col("c_nk").as("nkey"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("s_suppkey")).as("n_supp"),
           sum(expr("CAST(c_acctbal AS DECIMAL(12,2))"))
             .cast("double").as("bal_sum"))
      .orderBy(col("nkey").asc_nulls_first)
  }

  /** ANSI error-safe arithmetic: try_divide yields NULL on /0 instead
    * of an error or ±Inf (mixed null/value across rows — year 1997
    * divides by zero), try_cast NULL on an unparseable string,
    * try_add NULL on bigint overflow. The oracle restates each as its
    * portable CASE/TRY_CAST spelling — the key pins that this engine's
    * failure mode for bad arithmetic is NULL, not a job abort (what
    * a 100 TB pipeline needs: one poison row must not kill the
    * stage). */
  def fnTryArith(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        round(expr("try_divide(o_totalprice, year(o_orderdate) - 1997)"), 6)
          .as("td"),
        expr("try_cast(o_orderpriority AS INT)").as("tc"),
        // overflows (→ NULL) for every key except 0 — a mixed column,
        // not a constant: the oracle mirrors the boundary explicitly
        expr("try_add(o_orderkey, 9223372036854775807)").as("ta"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("tp"))
      .orderBy("o_orderkey")

  /** TPC-H Q9 shape — product-line profit per supplier nation per
    * order year, for parts whose name contains 'rod'. The LIKE
    * '%rod%' contains-filter is the point: it pushes to the part scan
    * as StringContains (PlanSpec pins it — the one pushed-filter
    * class no other key exercises), so the 100 TB part table prunes
    * BEFORE its broadcast. Profit = revenue − cost on exact decimal
    * grids: both products are rounded onto their grid (4dp / 2dp)
    * before the decimal cast, and the subtraction is exact decimal
    * arithmetic (§2.3 — the round-3 q10 one-cent lesson). */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val amount =
      expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))") -
      expr("CAST(round(p_retailprice * l_quantity, 2) AS DECIMAL(18,2))")
    lineitem(s, d)
      // size-gated: part and supplier both scale with SF (nation's
      // own broadcast stays unconditional — bounded by schema)
      .join(Ops.broadcastIfSmall(
              part(s, d).filter(col("p_name").contains("rod")), part(s, d)),
            col("l_partkey") === col("p_partkey"))
      .join(Ops.broadcastIfSmall(
              supplier(s, d)
                .join(broadcast(nation(s, d)),
                      col("s_nationkey") === col("n_nationkey"))
                .select(col("s_suppkey"), col("n_name")),
              supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("supp_nation"),
               year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_items"),
           sum(amount).cast("double").as("profit"))
      .orderBy("supp_nation", "o_year")
  }

  /** Declarative data-quality constraint report — the deequ/dbt-test
    * surface: uniqueness, completeness, value-range, and referential
    * integrity checks, each reported as (constraint, violations,
    * pass). Scale shape: all of a table's row-local constraints FUSE
    * into one aggregate pass (one scan of lineitem covers uniqueness
    * + null-rate + range); referential integrity is an anti-join
    * count on the natural key. The lineitem PK check is a genuine
    * FAILURE on this corpus — (l_orderkey, l_linenumber) is NOT
    * unique in the synthetic data (FIXTURES.md) — so the report
    * proves it reports violations honestly instead of rubber-
    * stamping. */
  def dqConstraints(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).agg(
      (count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("pk_dup"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_ship"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
        .otherwise(0L)).as("bad_disc"))
    val ord = orders(s, d).agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("bad_price"))
    val fkOrd = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"),
            "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkLi = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"),
            "left_anti")
      .agg(count(lit(1)).as("v"))
    def row(name: String, viol: Column): Column =
      struct(lit(name).as("check_name"), viol.cast("long").as("violations"))
    li.select(explode(array(
        row("lineitem.pk_unique", col("pk_dup")),
        row("lineitem.shipdate_not_null", col("null_ship")),
        row("lineitem.discount_in_0_1", col("bad_disc")))).as("r"))
      .unionByName(ord.select(explode(array(
        row("orders.pk_unique", col("pk_dup")),
        row("orders.totalprice_positive", col("bad_price")))).as("r")))
      .unionByName(fkOrd.select(
        row("orders.custkey_fk_customer", col("v")).as("r")))
      .unionByName(fkLi.select(
        row("lineitem.orderkey_fk_orders", col("v")).as("r")))
      .select(col("r.check_name"), col("r.violations"),
              (col("r.violations") === 0L).as("pass"))
      .orderBy("check_name")
  }

  /** Exact distinct users per tumbling day — the DAU report:
    * events_tumbling counts ROWS per window; this key counts DISTINCT
    * keys, the expensive variant (a two-level shuffle: dedup on
    * (window, user), then count). At 100 TB this exact form is what
    * the mergeable-HLL key (`agg_distinct_hll`) replaces when ±2% is
    * acceptable — the pair documents the trade explicitly. */
  def eventsDistinctUsers(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .select(col("w.start").as("wstart"), col("n_users"), col("n_events"))
      .orderBy("wstart")

  /** TPC-H Q4 shape — order-priority distribution of orders with at
    * least one late lineitem (shipped after a cutoff) in a quarter:
    * EXISTS → left-semi join on the order key (the Q21 rewrite,
    * here in its simplest aggregate-after-semi form), date windows
    * pushed to both scans. Completes the expressible TPC-H set with
    * q6: every query not requiring partsupp (Q2/11/16/20) or
    * l_shipmode/commitdate (Q12) now has a registry key. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-04-01 00:00:00"))
    val late = lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1997-02-01 00:00:00"))
      .select(col("l_orderkey"))
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 shape — the forecasting-revenue scan: one fact table,
    * three pushed range predicates, one exact-decimal sum, no join.
    * Trivial by design: it pins that a pure filter-aggregate stays a
    * single whole-stage-codegen scan with every predicate in
    * PushedFilters (the shape most 100 TB queries degrade FROM when
    * pushdown breaks). */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00") &&
              col("l_discount").between(0.02, 0.06) &&
              col("l_quantity") < 24.0)
      .agg(count(lit(1)).as("n_items"),
           sum(expr("CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))"))
             .cast("double").as("revenue"))

  /** Time-interval RANGE window frame — `RANGE BETWEEN INTERVAL '1'
    * HOUR PRECEDING AND CURRENT ROW` over an event-time ORDER BY: the
    * trailing-window-per-row shape (rolling rate counters, freshness
    * checks) that the numeric window_range_frame key cannot express.
    * Only the SQL surface plans calendar-interval range frames (the
    * DSL's rangeBetween takes longs), so the key goes through
    * spark.sql. RANGE frames include ALL ts-peers of the current row,
    * so tie order cannot change the frame set — deterministic on both
    * engines. */
  def windowIntervalRange(s: SparkSession, d: String): DataFrame = {
    events(s, d).createOrReplaceTempView("wir_events")
    s.sql("""
      SELECT event_id, user_id,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        round(SUM(value) OVER w, 4) AS v_1h
      FROM wir_events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING
                         AND CURRENT ROW)
      ORDER BY event_id""")
  }

  /** Dedup survivor re-weighting — the step after clustering that a
    * counted-dedup pretraining recipe needs: each near-dup cluster
    * collapses to its survivor (the component minimum, the
    * docs_dedup_resolve rule) carrying the cluster size as its
    * repeat weight; docs in no cluster are singletons of weight 1.
    * Composes the SAME pair-list artifact + pointer-jump CC as
    * docs_dedup_cc, then one left join + one aggregate over the
    * corpus — at 100 TB the cluster map is tiny next to the corpus
    * and broadcasts. */
  def docsDedupWeights(s: SparkSession, d: String): DataFrame = {
    val cc = Ops.connectedComponents(
      Artifacts.nearDupPairs(s, d).select("id1", "id2"), "id1", "id2")
      .select(col("n").as("doc_id"), col("label").as("cluster_id"))
    documents(s, d).select(col("doc_id"))
      // size-gated: the cluster map grows with the corpus's dup mass —
      // at 100 TB it must NOT be forced onto the driver; the gate
      // (keyed to the corpus scan estimate) leaves the join to AQE
      // there, while small fixtures keep the broadcast
      .join(Ops.broadcastIfSmall(cc, documents(s, d)), Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .groupBy(col("cluster_id").as("survivor_id"))
      .agg(count(lit(1)).as("cluster_size"),
           (count(lit(1)) - 1).as("n_removed"))
      .orderBy("survivor_id")
  }

  /** Out-of-vocabulary rate against a corpus-trained top-64 vocab
    * (ties at the cut broken by token text — a total order, so the
    * vocab set is engine-independent). The vocab is the broadcast
    * side; the corpus is scanned once — the standard tokenizer-
    * coverage report before committing to a vocab size. */
  def docsOovRate(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(64)
      .select(col("t"), lit(1).as("iv"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
      .orderBy("doc_id")
  }
}
