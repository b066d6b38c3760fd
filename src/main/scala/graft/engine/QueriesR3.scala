package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 coverage wave: the remaining join-at-scale recipes as
  * executable keys (pure range join, salted skew join), a second
  * TPC-H-style deep relational query, and random-projection
  * dimensionality reduction for the embedding pipeline.
  */
object QueriesR3 {
  import Tables._

  /** Pure range join with NO equi key — per order date, how many
    * lineitems (of any order) shipped within ±3 days. Two scale moves
    * stack: (1) both sides pre-aggregate to per-DAY rows before any
    * join (the range predicate only reads the day), collapsing 100 TB
    * of facts to a few thousand date rows; (2) Ops.rangeJoinBinned
    * turns the remaining range predicate into an equi join on 7-day
    * bins — no nested loop anywhere (PlanSpec asserts). */
  def joinRangeBinned(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val od = orders(s, d)
      .select(col("o_orderdate"),
              datediff(col("o_orderdate"), epoch).cast("long").as("od"))
      .distinct()
    val sd = lineitem(s, d)
      .groupBy("l_shipdate")
      .agg(count(lit(1)).as("n"))
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("sd"),
              col("n"))
    Ops.rangeJoinBinned(od, "od", sd, "sd", radius = 3, binWidth = 7)
      .groupBy("o_orderdate")
      .agg(sum("n").as("n_shipped"))
      .orderBy("o_orderdate")
  }

  /** Salted JOIN — the skew recipe for joins (the aggregation half is
    * agg_salted_skew): the per-type dim row is replicated under 8
    * salts, each fact row routes to one salt by a data-derived key
    * (never rand(), §2.3), and the merge hint pins a shuffled join so
    * the salt genuinely spreads the 5 hot event_type keys across 40
    * reducer groups instead of 5. Result ≡ the plain join (the
    * oracle). At 100 TB this is what keeps one hot key from pinning
    * one reducer when the dim is too large to broadcast. */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val dim = events(s, d).groupBy("event_type")
      .agg(round(avg("value"), 6).as("avg_value"))
    val dimSalted = dim.withColumn("salt",
      explode(array((0 until S).map(i => lit(i.toLong)): _*)))
    val fact = events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(S.toLong)))
    fact.hint("merge").join(dimSalted, Seq("event_type", "salt"))
      .filter(col("value") > col("avg_value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_above"))
      .orderBy("event_type")
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose lineitems
    * total > 150 units, joined back to customer, top 20 by price.
    * The group-filter runs FIRST and on lineitem alone (map-side
    * combine on l_orderkey), so the expensive fact table reduces to a
    * sliver before touching orders/customer — at 100 TB the only
    * full-table pass is the one partial aggregation. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Random-projection dimensionality reduction (64 → 8 dims): the
    * same md5-derived deterministic hyperplanes as emb_ann_lsh, but
    * emitting the CONTINUOUS projections — the cheap JL-style
    * compression an embedding pipeline applies before indexing/ANN.
    * One broadcast of 512 plane coefficients + one narrow aggregation;
    * projections rounded to 6dp so cross-engine sum order can't leak
    * into the hash (§2.3). Scalar output columns p0..p7 (never
    * array cells — driver-compare rule). */
  def embRandomProjection(s: SparkSession, d: String): DataFrame = {
    val pe = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("j"),
              col("col").cast("double").as("x"))
    val planes = s.range(0, 8).select(col("id").as("p"))
      .crossJoin(s.range(1, 65).select(col("id").as("j")))
      .select(col("p"), col("j"), expr(
        "(CAST(CAST(conv(substring(md5(concat(p, '_', j)), 1, 8), 16, 10) AS BIGINT) % 2001 AS DOUBLE) - 1000.0) / 1000.0")
        .as("h"))
    val projCols = (0 until 8).map(p =>
      round(sum(when(col("p") === p, col("x") * col("h"))), 6).as(s"p$p"))
    pe.join(broadcast(planes), Seq("j"))
      .groupBy("vec_id")
      .agg(projCols.head, projCols.tail: _*)
      .orderBy("vec_id")
  }
}
