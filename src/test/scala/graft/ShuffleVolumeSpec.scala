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
}
