package graft

import org.apache.spark.sql.functions._

/** Pins docs_dedup_containment's scale contract: candidate pairs come
  * ONLY from shared DF-CAPPED shingles, so emissions are bounded by
  * Σ_shingle C(df, 2) ≤ cap/2 · |kept rows| — linear in the shingle
  * table at fixed cap, never quadratic in a hot shingle's document
  * frequency (the posting-list discipline docs_sparse_sim_topk and
  * graph_jaccard_neighbors already carry). */
class ContainmentBoundSpec extends SparkTestBase {
  import graft.engine.QueriesR17

  test("df cap bounds candidate emissions at cap/2 x kept rows") {
    val g = QueriesR17.containmentShingles(spark, sfDir)
    val cap = 4 // force real truncation at the test SF
    val maxDf = g.groupBy("shingle").count()
      .agg(max("count")).head.getLong(0)
    assert(maxDf > cap,
      s"fixture's hottest shingle (df=$maxDf) does not exceed cap=$cap;" +
        " the truncation path is not exercised")
    val kept = QueriesR17.containmentKept(g, cap)
    val keptRows = kept.count()
    val emitted = kept.select(col("doc_id").as("id1"), col("shingle"))
      .join(kept.select(col("doc_id").as("id2"), col("shingle")),
        Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .count()
    assert(emitted <= cap.toLong * keptRows / 2,
      s"emissions $emitted exceed the cap/2 x kept bound " +
        s"(${cap.toLong * keptRows / 2})")
    // and the cap genuinely constrains: the uncapped surface is larger
    val uncapped = g.select(col("doc_id").as("id1"), col("shingle"))
      .join(g.select(col("doc_id").as("id2"), col("shingle")),
        Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .count()
    assert(emitted < uncapped,
      s"cap=$cap did not shrink the candidate surface " +
        s"($emitted vs $uncapped)")
  }
}
