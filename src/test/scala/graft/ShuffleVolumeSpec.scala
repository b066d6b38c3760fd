package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Measured-shuffle gates (round 13): the scale story's central claim
  * — "this plan moves less data than the naive spelling" — asserted
  * on the EXECUTED plan's exchange metrics, not on operator counts
  * alone. After an action, every shuffle exchange reports the bytes
  * it materialized (`dataSize`); summing those gives the actual
  * inter-stage traffic a cluster would put on the wire. A refactor
  * that silently reintroduces a full-table shuffle fails here with a
  * byte count, not at 100 TB.
  */
class ShuffleVolumeSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  /** Runs the frame THROUGH ITS OWN QueryExecution (collect, never
    * count — count() builds a separate QueryExecution whose metrics
    * the original plan never sees) and returns (hash-partitioned
    * exchange count, total bytes materialized across ALL shuffle
    * exchanges — range/presentation sorts included in bytes). A
    * reused exchange counts once — it moves data once. */
  private def shuffleVolume(df: DataFrame): (Int, Long) = {
    df.collect()
    val seen = scala.collection.mutable.Set[Int]()
    var nHash = 0
    var bytes = 0L
    def record(s: ShuffleExchangeLike): Unit = if (seen.add(s.id)) {
      if (s.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
        nHash += 1
      bytes += s.metrics.get("dataSize").map(_.value).getOrElse(0L)
    }
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan) // stage wrappers are leaves
        case s: ShuffleExchangeLike => record(s)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (nHash, bytes)
  }

  test("q3: the broadcast spelling moves a fraction of the naive plan's shuffle bytes") {
    import graft.engine.Tables._
    val (nHinted, bHinted) =
      shuffleVolume(SparkEntry.queries("q3_top_unshipped")(spark, sf01))
    // the naive spelling: no semi-fold, no hints — both joins shuffle
    val c = customer(spark, sf01).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, sf01)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = graft.engine.Tables.lineitem(spark, sf01)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    val naive = spark.sessionState.conf
    val prior = naive.getConfString("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (nNaive, bNaive) =
      try shuffleVolume(
        l.join(o, col("o_orderkey") === col("l_orderkey"))
          .join(c, col("c_custkey") === col("o_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(10))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(nHinted == 1, s"q3 must shuffle exactly once, saw $nHinted")
    assert(nNaive >= 3, s"naive twin should shuffle 3+ times, saw $nNaive")
    assert(bHinted * 3 < bNaive,
      s"q3 shuffle bytes $bHinted not < 1/3 of naive $bNaive")
  }

  test("q5: hand-pushed ASIA dims + size-gated broadcasts move a fraction of the naive chain's bytes") {
    import graft.engine.Tables._
    val (_, bEngine) =
      shuffleVolume(SparkEntry.queries("q5_multiway_join")(spark, sf01))
    // naive spelling: region filter applied ABOVE the 6-way join, no
    // pushed dims, broadcasts disabled — every join shuffles both sides
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (_, bNaive) =
      try shuffleVolume(
        customer(spark, sf01)
          .join(orders(spark, sf01)
              .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                      col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(lineitem(spark, sf01), col("o_orderkey") === col("l_orderkey"))
          .join(supplier(spark, sf01),
            col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(nation(spark, sf01), col("s_nationkey") === col("n_nationkey"))
          .join(region(spark, sf01), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name")))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(bEngine * 2 < bNaive,
      s"q5 shuffle bytes $bEngine not < 1/2 of naive $bNaive")
  }

  test("docs_dedup_exact: the one shuffle carries digests, not payloads") {
    import graft.engine.Tables
    val docs = Tables.documents(spark, sf01)
    val payloadBytes = docs
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val (n, bytes) =
      shuffleVolume(SparkEntry.queries("docs_dedup_exact")(spark, sf01))
    assert(n == 1, s"exact dedup must be one shuffle, saw $n")
    assert(bytes * 2 < payloadBytes,
      s"dedup shuffled $bytes bytes — the md5 fold should move far " +
        s"less than the $payloadBytes bytes of payload")
  }

  test("q1: map-side partial aggregation collapses the shuffle to group-state size") {
    val (n, bytes) =
      shuffleVolume(SparkEntry.queries("q1_pricing_summary")(spark, sf01))
    // 60k lineitem rows fold to a handful of (flag, status) groups per
    // task before the exchange: the wire carries partial states only
    assert(n == 1, s"q1 must shuffle exactly once, saw $n")
    assert(bytes < 64 * 1024,
      s"q1 shuffled $bytes bytes — partial agg must keep the exchange " +
        "at group-state size, not row size")
  }

  // ---- r13 verdict #6: byte gates for the top of the cost table ----

  /** Runs `df` with broadcasts disabled so the twin models the 100 TB
    * posture (nothing broadcastable), then restores the threshold. */
  private def noBroadcast[T](f: => T): T = {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("graph_jaccard_neighbors: the candidate cap bounds pair-generation shuffle bytes") {
    // The key's 100 TB claim: the per-customer top-`cap` candidate
    // edge set bounds hub emissions at cap²/2, so the pair join and
    // the (sup_a, sup_b) aggregation move bytes proportional to the
    // CAPPED edge count, not the raw degree distribution. Executed
    // gate: the same plan at a tight cap must move a fraction of the
    // effectively-uncapped spelling's bytes (cap=512 exceeds every
    // test-SF degree, so it IS the uncapped semantics).
    import graft.engine.QueriesR14
    val (_, bUncapped) = shuffleVolume(
      QueriesR14.graphJaccardNeighborsCapped(spark, sf01,
        QueriesR14.JaccardNeighborCap))
    val (_, bCapped) = shuffleVolume(
      QueriesR14.graphJaccardNeighborsCapped(spark, sf01, 4))
    assert(bCapped * 2 < bUncapped,
      s"cap=4 shuffled $bCapped bytes, not < 1/2 of uncapped " +
        s"$bUncapped — the cap no longer bounds pair-generation traffic")
  }

  test("basket_assoc_rules: per-row pair transform moves a fraction of the self-join twin's bytes") {
    // The key's claim: ONE shuffle on the basket key + a per-row
    // array transform generates pairs — no basket self-join. The
    // naive twin joins the (basket, item) table with itself on the
    // basket key (broadcasts off — at 100 TB neither side
    // broadcasts), which ships the item table across the wire again
    // and re-derives the lineitem⋈part subtree per side.
    import graft.engine.Tables._
    val (bEngine, bNaive) = {
      val (_, e) = shuffleVolume(
        SparkEntry.queries("basket_assoc_rules")(spark, sf01))
      val items = lineitem(spark, sf01).select("l_orderkey", "l_partkey")
        .join(part(spark, sf01).select("p_partkey", "p_brand"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("item"))
        .distinct()
      val (_, n) = noBroadcast(shuffleVolume(
        items.select(col("okey"), col("item").as("ante"))
          .join(items.select(col("okey"), col("item").as("cons")), "okey")
          .filter(col("ante") =!= col("cons"))
          .groupBy("ante", "cons").agg(count(lit(1)).as("pair_n"))))
      (e, n)
    }
    assert(bEngine * 2 < bNaive,
      s"basket_assoc_rules shuffled $bEngine bytes, not < 1/2 of the " +
        s"self-join twin's $bNaive")
  }

  test("graph_pagerank: the pinned edge artifact caps per-iteration shuffle bytes") {
    // The key's claim: the degree-weighted edge table is built ONCE
    // (P6 artifact); each of the 3 unrolled iterations joins the tiny
    // rank frame against the artifact SCAN. The twin re-derives the
    // lineitem⋈orders + distinct + degree subtree inline, so every
    // reference pays the base shuffles again (modulo whatever
    // Catalyst can reuse) — with broadcasts off, as at scale.
    import graft.engine.Tables._
    val (_, bEngine) = shuffleVolume(
      SparkEntry.queries("graph_pagerank")(spark, sf01))
    val pairs = lineitem(spark, sf01)
      .join(orders(spark, sf01), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sup"),
              (col("o_custkey") + 1000000L).as("cust"))
      .distinct()
    val edges = pairs.select(col("sup").as("src"), col("cust").as("dst"))
      .union(pairs.select(col("cust").as("src"), col("sup").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesW = edges.join(deg, "src")
    val nodes = edgesW.groupBy(col("src").as("node_id"))
      .agg(min("outdeg").as("outdeg"))
    def step(r: DataFrame): DataFrame =
      edgesW.join(r.withColumnRenamed("node_id", "src"), "src")
        .groupBy(col("dst").as("node_id"))
        .agg(round(lit(0.15) + lit(0.85) * sum(col("rank") / col("outdeg")), 6)
          .as("rank"))
    val r0 = nodes.select(col("node_id"), lit(1.0).as("rank"))
    val twin = nodes.join(step(step(step(r0))), "node_id")
      .select(col("node_id"), col("outdeg").as("degree"), col("rank"))
      .orderBy("node_id")
    val (_, bNaive) = noBroadcast(shuffleVolume(twin))
    assert(bEngine * 2 < bNaive,
      s"graph_pagerank shuffled $bEngine bytes, not < 1/2 of the " +
        s"re-derived twin's $bNaive — the edge artifact is not " +
        "absorbing the base subtree")
  }
}
