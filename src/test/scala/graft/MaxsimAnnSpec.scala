package graft

import org.apache.spark.sql.functions._

/** Grades the composed ANN→MaxSim key (r9 verdict #3) against the
  * brute-force emb_maxsim_topk ground truth: the sign-band candidate
  * generator must recover a pinned fraction of the exact top-5 while
  * genuinely pruning the pair surface — the recall/efficiency trade
  * every deployed ANN index is graded on (the emb_recall_matrix
  * posture, applied to the late-interaction kernel).
  */
class MaxsimAnnSpec extends SparkTestBase {
  import graft.engine.{QueriesR14, QueriesR15}

  test("ANN-candidate MaxSim recovers >= 50% of the exact top-5") {
    val exact = QueriesR14.embMaxsimTopk(spark, sfDir)
      .select("qdoc", "doc")
    val ann = QueriesR15.embMaxsimAnn(spark, sfDir)
      .select("qdoc", "doc")
    val nExact = exact.count()
    assert(nExact > 0, "empty ground truth")
    val hits = exact.join(ann, Seq("qdoc", "doc"), "left_semi").count()
    val recall = hits.toDouble / nExact
    // 0.64 at the fixture SFs; pinned with margin — the random-ish
    // fixture vectors are the sign-band worst case
    assert(recall >= 0.5,
      f"recall@5 $recall%.3f below the 0.5 floor ($hits/$nExact)")
  }

  test("band candidates genuinely prune the pair surface") {
    // every scored pair came through a shared (band, value) bucket:
    // the ANN result can never contain MORE (qdoc, doc) pairs than
    // the full cross surface, and at the fixture it must be a strict
    // subset (some exact top-5 pairs share no band — recall < 1)
    val exact = QueriesR14.embMaxsimTopk(spark, sfDir)
      .select("qdoc", "doc")
    val ann = QueriesR15.embMaxsimAnn(spark, sfDir)
      .select("qdoc", "doc")
    val missed = exact.join(ann, Seq("qdoc", "doc"), "left_anti").count()
    assert(missed > 0,
      "ANN result equals brute force at the fixture — the band join is " +
        "not actually pruning (candidate generation degenerated to the " +
        "full cross product)")
    // and nothing is invented: ANN pairs score with the same exact
    // kernel, so any pair ANN ranks top-5 that brute force does not
    // must have been DISPLACED by a missed better pair, never a new doc
    val annOnly = ann.join(exact, Seq("qdoc", "doc"), "left_anti")
    val perQ = annOnly.groupBy("qdoc").count()
      .agg(max("count")).head.getLong(0)
    assert(perQ <= 5, s"a query gained $perQ > 5 non-exact pairs")
  }
}
