package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2-K: the four engine extension points — scalar UDF,
  * typed Aggregator UDAF, generator-style table function, and the
  * native Catalyst Expression (Exprs.scala).
  */
object QueriesExt {
  import Tables._

  /** Scala scalar UDF in a query: synthetic lat/lon from keys, distance
    * to a fixed point. Oracle inlines the identical formula as SQL. */
  def udfScalarHaversine(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        ((col("c_custkey") % 180).cast("double") - 90 + 0.5).as("lat1"),
        (((col("c_custkey") * 7) % 360).cast("double") - 180 + 0.5).as("lon1"))
      .withColumn("dist_km",
        round(Udfs.haversineUdf(col("lat1"), col("lon1"),
                                lit(48.85), lit(2.35)), 4))
      .orderBy("c_custkey")

  /** Typed Aggregator[Double,(Double,Long),Double] geometric mean,
    * registered through functions.udaf. */
  def udafTypedGeomean(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(round(Udfs.geomean(col("o_totalprice")), 4).as("geo_price"),
           count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Table-function surface: text → (pos, bigram) rows via the
    * idiomatic Spark spelling (posexplode of an array-building expr). */
  def udtfGeneratorNgrams(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), i -> array_join(slice(split(text, ' '), i, 2), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
              col("col").as("ngram"))
      .orderBy("doc_id", "pos")

  /** The custom codegen Expression on its own: cosine between each
    * vector and its successor. */
  def exprNativeCosine(s: SparkSession, d: String): DataFrame = {
    Exprs.register(s)
    val e = embeddings(s, d).select("vec_id", "embedding")
    e.as("a").join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.vec_id").as("vec_id"),
              round(expr("cosine_sim(a.embedding, b.embedding)"), 6)
                .as("cos_next"))
      .orderBy("vec_id")
  }
}
