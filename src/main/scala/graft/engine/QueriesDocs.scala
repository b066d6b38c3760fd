package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2-J: LLM-data-pipeline operators over documents +
  * embeddings.
  *
  * Scale design (the 100 TB story, §7.6):
  *  - exact dedup is a hash-groupBy — shuffles once on md5(text);
  *  - near-dedup is MinHash-LSH: 32 seeded minhashes, 16 bands × 2 rows
  *    (candidate-recall at the J=0.8 threshold ≈ 1 − (1−0.8²)¹⁶ ≈
  *    1 − 8e-11); exact Jaccard verification touches ONLY candidate
  *    pairs — never the O(n²) cross product. Engine-salted xxhash64
  *    stays internal (§2.3-3); the compared output is the verified pair
  *    list, which an exact shared-shingle oracle reproduces.
  *  - knn is brute-force top-k as the declared baseline; cosine runs in
  *    the codegen'd CosineSimilarityExpr (Exprs.scala), and the IVF
  *    variant in QueriesExtra is the ANN scale path.
  */
object QueriesDocs {
  import Tables._

  def docsDedupExact(s: SparkSession, d: String): DataFrame =
    Ops.exactDedup(documents(s, d), "doc_id", "text").orderBy("h")

  def docsTokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .groupBy("lang")
      .agg(sum("n_tok").as("total_tokens"),
           round(avg("n_tok"), 6).as("avg_tokens"),
           max("n_chars").as("max_chars"),
           count(lit(1)).as("n_docs"))
      .orderBy("lang")

  def docsLangFilterTf(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("lang") === "en")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(20)

  /** tf-idf with rank computed over the ROUNDED score so cross-engine
    * FP ordering can never flip ranks. */
  def docsTfidfTopk(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "score", "rk")
      .orderBy("doc_id", "rk")
  }

  /** MinHash-LSH near-duplicate detection — Ops.minhashNearDup with the
    * default 32-hash / 16-band configuration (see Ops scaladoc for the
    * recall math and 100 TB posture). Served from the shared
    * Artifacts.nearDupPairs materialization: this key, _resolve, and
    * _cc all consume one cached pair-list artifact instead of running
    * the LSH pipeline three times (P6 on the engine's own hot spot). */
  def docsDedupNear(s: SparkSession, d: String): DataFrame =
    Artifacts.nearDupPairs(s, d)
      .orderBy("id1", "id2")

  /** Exact k-NN: top-5 cosine neighbors per vector; ranks over the
    * rounded similarity with neighbor-id tiebreak.
    *
    * Physical shape: Ops.knnBruteForce's block-broadcast kernel — the
    * comparison set is broadcast in blocks (like a broadcast-join build
    * side) and each partition streams its vectors through a primitive
    * double scan with a bounded insertion top-k, emitting n×5 rows
    * directly. No pair join, no shuffle of pair rows. The
    * join+TopKByScore shape (codegen'd CosineSimilarityExpr feeding the
    * bounded aggregate) lives on in Ops.annIvf, where cells are joined
    * rather than broadcast. */
  def embKnnBruteforce(s: SparkSession, d: String): DataFrame =
    Artifacts.knnTop5(s, d)
      .orderBy("vec_id", "rk")

  /** Per-label mean vector; each vector's L2 distance to its own
    * centroid, computed from the ROUNDED centroid so both engines feed
    * identical inputs into the distance sum. */
  def embCentroidPerLabel(s: SparkSession, d: String): DataFrame = {
    val pe = embeddings(s, d)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")))
      .select(col("label"), col("vec_id"), (col("pos") + 1).as("pos"),
              col("col").cast("double").as("x"))
    val cent = pe.groupBy("label", "pos").agg(round(avg("x"), 6).as("c"))
    pe.join(cent, Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(round(sqrt(sum(pow(col("x") - col("c"), 2))), 6)
        .as("dist_to_centroid"))
      .orderBy("vec_id")
  }

  /** L2 norms (full + first-8-dim slice) with a band filter on the
    * rounded slice norm (full norms are ≈1: embeddings are normalized). */
  def embNormFilter(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .selectExpr(
        "vec_id", "label",
        "round(sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * x)), 6) AS l2_norm",
        "round(sqrt(aggregate(slice(embedding, 1, 8), CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * x)), 6) AS norm8")
      .filter(col("norm8").between(0.25, 0.45))
      .orderBy("vec_id")
}
