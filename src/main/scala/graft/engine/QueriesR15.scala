package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-10 keys: the ANN→MaxSim retrieval composition the r9
  * verdict asked to prove (#3), plus the JPEG leg of the multimodal
  * decode family (#5) — all under the §2.3 determinism discipline.
  */
object QueriesR15 {
  import Tables._

  /** ANN-candidates → MaxSim re-score — the COMPOSED retrieval plan
    * emb_maxsim_topk's scaladoc promises ("at 100 TB the ANN family
    * generates candidates and this kernel re-scores"), proven as a
    * declared key: candidate (query-doc, corpus-doc) pairs come from
    * hamming-banding the per-vector 64-bit sign signatures (the
    * emb_sign_hamming_topk quantizer + the multimodal_phash_near
    * band recipe: 8 bands × 8 bits — a pigeonhole guarantee that any
    * two vectors within hamming distance 7 share a band), and ONLY
    * those pairs pay the exact 5×5 token-level MaxSim kernel. Top-5
    * docs per query under the (score DESC, doc) total order.
    *
    * Determinism (§2.3): signatures and bands are pure integer ops;
    * the re-score is emb_maxsim_topk's exact kernel verbatim
    * (cosines rounded 6 dp BEFORE the max, maxima summed as
    * DECIMAL(18,6), doc tiebreak) — truncation affects only WHICH
    * pairs are scored, never a reported score.
    *
    * Recall: MaxsimAnnSpec grades this key against the brute-force
    * emb_maxsim_topk ground truth — recall@5 = 0.64 at the fixture
    * SFs with ~half the pair surface; at production scale the band
    * join prunes to near-duplicate buckets (the fixture's random-ish
    * vectors are the worst case for sign banding — real embedding
    * clusters collide on far more bands).
    *
    * Scale shape: signatures are 8 bytes/vector; the band join is an
    * equi-join on (band, value) — index-bucketed, never all-pairs —
    * with the query side O(batch) broadcast (the emb_maxsim_topk
    * allowlist case); the exact kernel then touches only candidate
    * pairs × 25 token combinations, map-side-combined. */
  def embMaxsimAnn(s: SparkSession, d: String): DataFrame = {
    Exprs.register(s)
    val v = embeddings(s, d)
      .select(expr("vec_id div 5").as("doc"), col("vec_id"),
              col("embedding"))
    val sig = v.select(col("doc"),
      expr("aggregate(zip_with(embedding, " +
           "sequence(0, size(embedding) - 1), " +
           "(e, i) -> IF(e > 0D, shiftleft(1L, i), 0L)), " +
           "0L, (acc, x) -> acc | x)").as("sig"))
    // 8 bands × 8 bits per signature; the arithmetic shift's sign
    // extension is masked off by & 255, matching DuckDB bit-for-bit
    def bands(df: DataFrame, docAs: String) = df
      .select(col("doc").as(docAs), explode(expr(
        "transform(sequence(0, 7), b -> " +
        "struct(b AS b, shiftright(sig, 8 * b) & 255 AS val))")).as("p"))
      .select(col(docAs), col("p.b").as("b"), col("p.val").as("val"))
      .distinct()
    val qband = bands(sig.filter(col("doc") % 10 === 0), "qdoc")
    val cband = bands(sig.filter(col("doc") % 10 =!= 0), "doc")
    // candidate generation: bucket equi-join, query side O(batch)
    val cand = cband.join(broadcast(qband), Seq("b", "val"))
      .select("qdoc", "doc").distinct()
    val q = v.filter(col("doc") % 10 === 0)
      .select(col("doc").as("qdoc"), col("vec_id").as("qv"),
              col("embedding").as("qe"))
    val c = v.filter(col("doc") % 10 =!= 0)
      .select(col("doc"), col("embedding").as("ce"))
    // exact MaxSim kernel over candidates only — 25 token pairs per
    // candidate doc pair, the emb_maxsim_topk spelling verbatim
    cand.join(broadcast(q), Seq("qdoc"))
      .join(c, Seq("doc"))
      .select(col("qdoc"), col("qv"), col("doc"),
              round(expr("cosine_sim(qe, ce)"), 6).as("cs"))
      .groupBy("qdoc", "qv", "doc").agg(max("cs").as("mx"))
      .groupBy("qdoc", "doc")
      .agg(sum(col("mx").cast(DecimalType(18, 6))).cast("double")
        .as("maxsim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qdoc")
          .orderBy(col("maxsim").desc, col("doc"))))
      .filter(col("rk") <= 5)
      .orderBy("qdoc", "rk")
  }
}
