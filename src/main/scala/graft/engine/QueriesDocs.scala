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
    documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

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

  /** MinHash-LSH near-duplicate detection (see object scaladoc). */
  def docsDedupNear(s: SparkSession, d: String): DataFrame = {
    val numHashes = 32
    val rowsPerBand = 2
    val numBands = numHashes / rowsPerBand

    val sh = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tokens) - 4), i -> array_join(slice(tokens, i, 5), ' '))"))
        .as("shingle"))
      .distinct()

    val mhAggs = (0 until numHashes)
      .map(k => min(xxhash64(lit(k), col("shingle"))).as(s"mh$k"))
    val mh = sh.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)

    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(col(s"mh${rowsPerBand * b}"),
                      col(s"mh${rowsPerBand * b + 1}")).as("bh"))
    }
    val banded = mh
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    val shArr = sh.groupBy("doc_id")
      .agg(array_sort(collect_list("shingle")).as("shs"),
           count(lit(1)).as("sz"))

    cand
      .join(shArr.as("s1"), col("id1") === col("s1.doc_id"))
      .join(shArr.as("s2"), col("id2") === col("s2.doc_id"))
      .withColumn("i", size(array_intersect(col("s1.shs"), col("s2.shs")))
        .cast("double"))
      .withColumn("jaccard",
        round(col("i") / (col("s1.sz") + col("s2.sz") - col("i")), 6))
      .filter(col("i") / (col("s1.sz") + col("s2.sz") - col("i")) >= 0.8)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** Exact k-NN: top-5 cosine neighbors per vector; ranks over the
    * rounded similarity with neighbor-id tiebreak.
    *
    * Physical shape: codegen'd CosineSimilarityExpr inside the pair
    * join, then the bounded TopKByScore aggregate (TopK.scala) instead
    * of a row_number window — the window would shuffle+sort all n²
    * pair rows; the aggregate map-side-combines to n×5 tuples.
    * Measured at sf0.1: 22.5 s (window) → see BENCH (aggregate). */
  def embKnnBruteforce(s: SparkSession, d: String): DataFrame = {
    Exprs.register(s)
    TopK.register(s)
    // ObjectHashAggregate (which runs TypedImperativeAggregate) falls
    // back to SORT-based aggregation after 128 distinct groups by
    // default — that re-sorts all n² pair rows and defeats the point
    // of the bounded aggregate. Plenty of memory for one 5-tuple
    // buffer per group.
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
               "10000000")
    val e = embeddings(s, d).select("vec_id", "embedding")
    e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
              col("b.vec_id").as("neighbor_id"),
              round(expr("cosine_sim(a.embedding, b.embedding)"), 6)
                .as("cos_sim"))
      .groupBy("vec_id")
      .agg(expr("topk_by_score(cos_sim, neighbor_id, 5)").as("top"))
      .select(col("vec_id"), posexplode(col("top")))
      .select(col("vec_id"), col("col.id").as("neighbor_id"),
              col("col.score").as("cos_sim"), (col("pos") + 1).as("rk"))
      .orderBy("vec_id", "rk")
  }

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
