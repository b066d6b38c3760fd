package graft

import org.apache.spark.sql.functions._

/** Pins docs_sparse_sim_topk's scale contract (r8 verdict #3): the
  * candidate surface is generated from a per-term posting index
  * truncated to an ABSOLUTE top-B cap, so pair emissions are bounded
  * by B/2 per posting — linear in corpus size by construction — where
  * the relative df·10 ≤ n stopword prune alone still admitted
  * (n/10)² pairs per surviving term. Also pins that the production
  * cap is a no-op at the test SF (every posting list shorter than B),
  * which is what keeps the key's DuckDB oracle byte-identical.
  */
class SparseSimBoundSpec extends SparkTestBase {
  import graft.engine.QueriesR11

  test("candidate emissions respect the absolute cap on a skew-forced index") {
    val w = QueriesR11.sparseSimWeights(spark, sfDir)
    val postings = w.count()
    val cap = 8 // force real truncation: sf0.001 posting lists exceed this
    val maxDf = w.groupBy("term").count().agg(max("count")).head.getLong(0)
    assert(maxDf > cap,
      s"fixture's hottest term ($maxDf postings) does not exceed cap=$cap; " +
        "the truncation path is not exercised")
    val pairs = QueriesR11.sparseSimCandidates(w, cap).count()
    // per term: C(min(df,cap),2) ≤ cap/2 × min(df,cap) ≤ cap/2 × df,
    // summed over terms: ≤ cap/2 × postings. THE bound that makes the
    // quadratic path impossible: emissions grow linearly with corpus
    // size at fixed cap, never with (n/10)².
    assert(pairs <= cap.toLong * postings / 2,
      s"candidate pairs $pairs exceed the cap/2×postings bound " +
        s"(${cap.toLong * postings / 2})")
    // and the cap genuinely constrains: the uncapped surface is larger
    val uncapped = QueriesR11
      .sparseSimCandidates(w, 1 << 20).count()
    assert(pairs < uncapped,
      s"cap=$cap did not shrink the candidate surface ($pairs vs $uncapped)")
  }

  test("production cap is a no-op at test SF: capped ≡ uncapped candidates") {
    // the oracle-equivalence precondition: SparseSimPostingCap must
    // exceed every surviving posting list at the fixture SFs, so the
    // shipped key's candidate set — and hence its output — is
    // identical to the uncapped spelling
    val w = QueriesR11.sparseSimWeights(spark, sfDir)
    val maxDf = w.groupBy("term").count().agg(max("count")).head.getLong(0)
    assert(maxDf <= QueriesR11.SparseSimPostingCap,
      s"fixture posting list ($maxDf) exceeds the production cap " +
        s"${QueriesR11.SparseSimPostingCap}; the key's oracle would drift")
    val capped = QueriesR11
      .sparseSimCandidates(w, QueriesR11.SparseSimPostingCap)
    val uncapped = QueriesR11.sparseSimCandidates(w, 1 << 20)
    assert(capped.exceptAll(uncapped).isEmpty &&
           uncapped.exceptAll(capped).isEmpty,
      "capped candidate set differs from uncapped at test SF")
  }
}
