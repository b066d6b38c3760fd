package graft

import org.apache.spark.sql.functions._

/** Grades the composed ANN→MaxSim key (r9 verdict #3) against the
  * brute-force emb_maxsim_topk ground truth: the multi-probed
  * sign-band candidate generator must recover a pinned fraction of
  * the exact top-5 while genuinely pruning the pair surface — the
  * recall/efficiency trade every deployed ANN index is graded on
  * (the emb_recall_matrix posture, applied to the late-interaction
  * kernel). Round 11 raised the recall floor from 0.5 to 0.85 (the
  * r10 verdict task): one-bit-flip multi-probing of the query bands
  * lifted measured recall@5 from 0.64 to 1.0 at the fixture SFs.
  */
class MaxsimAnnSpec extends SparkTestBase {
  import graft.engine.{QueriesR14, QueriesR15}

  test("ANN-candidate MaxSim recovers >= 85% of the exact top-5") {
    val exact = QueriesR14.embMaxsimTopk(spark, sfDir)
      .select("qdoc", "doc")
    val ann = QueriesR15.embMaxsimAnn(spark, sfDir)
      .select("qdoc", "doc")
    val nExact = exact.count()
    assert(nExact > 0, "empty ground truth")
    val hits = exact.join(ann, Seq("qdoc", "doc"), "left_semi").count()
    val recall = hits.toDouble / nExact
    // 1.0 measured at sf0.001 and sf0.01; pinned with margin
    assert(recall >= 0.85,
      f"recall@5 $recall%.3f below the 0.85 floor ($hits/$nExact)")
  }

  test("band candidates genuinely prune the pair surface") {
    // the efficiency half of the trade: the multi-probe must not
    // degenerate to all-pairs. Count the CANDIDATE surface itself
    // (before the exact kernel) against the full qdoc × doc cross
    // product — at the fixture's random-ish vectors (sign-banding's
    // adversarial case) the probed band join must still discard a
    // meaningful fraction of the cross product.
    val cand = QueriesR15.embMaxsimAnnCandidates(spark, sfDir)
    val nQ = cand.select("qdoc").distinct().count()
    val nC = cand.select("doc").distinct().count()
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
      .select(expr("vec_id div 5").as("doc")).distinct()
    val allQ = emb.filter(col("doc") % 10 === 0).count()
    val allC = emb.filter(col("doc") % 10 =!= 0).count()
    val surface = cand.count()
    val cross = allQ * allC
    assert(surface < cross,
      s"candidate surface $surface equals/exceeds the $cross cross " +
        "product — the band join is not pruning at all")
    info(f"pair surface: $surface/$cross = ${surface.toDouble / cross}%.3f " +
      s"(qdocs probed: $nQ/$allQ, docs reached: $nC/$allC)")
    // and nothing is invented: ANN pairs score with the same exact
    // kernel, so any pair ANN ranks top-5 that brute force does not
    // must have been DISPLACED by a missed better pair, never a new doc
    val exact = QueriesR14.embMaxsimTopk(spark, sfDir)
      .select("qdoc", "doc")
    val ann = QueriesR15.embMaxsimAnn(spark, sfDir)
      .select("qdoc", "doc")
    val annOnly = ann.join(exact, Seq("qdoc", "doc"), "left_anti")
    if (annOnly.isEmpty) ()
    else {
      val perQ = annOnly.groupBy("qdoc").count()
        .agg(max("count")).head.getLong(0)
      assert(perQ <= 5, s"a query gained $perQ > 5 non-exact pairs")
    }
  }
}
