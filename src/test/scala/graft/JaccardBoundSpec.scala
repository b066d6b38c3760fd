package graft

import org.apache.spark.sql.functions._

/** Pins graph_jaccard_neighbors' scale contract (r9 verdict #1): the
  * shared-neighbor self-join runs over a per-customer candidate
  * prefix truncated to an ABSOLUTE top-`cap` of lowest-degree
  * suppliers, so pair emissions are bounded by Σ min(deg(cust),
  * cap)² — linear in customers by construction — where the uncapped
  * spelling let one hub customer of degree D emit D² pairs. Also
  * pins that the production cap is a no-op at the test SF (every
  * per-customer degree under the cap), which is what keeps the key's
  * DuckDB oracle byte-identical, and that a genuinely truncating cap
  * is CONSERVATIVE: surviving pairs' jaccard never exceeds the exact
  * value (degrees stay uncapped, commons can only shrink).
  */
class JaccardBoundSpec extends SparkTestBase {
  import graft.engine.QueriesR14

  test("candidate emissions respect the absolute cap under a skew-forcing cap") {
    val pairs = QueriesR14.jaccardBipartitePairs(spark, sfDir)
    val cap = 4 // force real truncation: fixture hubs exceed this
    val degs = pairs.groupBy("cust").count()
    val maxDeg = degs.agg(max("count")).head.getLong(0)
    assert(maxDeg > cap,
      s"fixture's hottest customer ($maxDeg suppliers) does not exceed " +
        s"cap=$cap; the truncation path is not exercised")
    val capped = QueriesR14.jaccardCappedEdges(pairs, cap)
    // per-customer emission count never exceeds the cap
    val maxKept = capped.groupBy("cust").count()
      .agg(max("count")).head.getLong(0)
    assert(maxKept <= cap, s"capped edge set kept $maxKept > cap=$cap")
    // self-join surface: Σ C(min(deg,cap),2) ≤ cap/2 × edges — THE
    // bound that makes the hub-quadratic path impossible: emissions
    // grow linearly with the edge count at fixed cap, never with D².
    val emitted = capped.as("a")
      .join(capped.as("b"),
        col("a.cust") === col("b.cust") && col("a.sup") < col("b.sup"))
      .count()
    val edges = capped.count()
    assert(emitted <= cap.toLong * edges / 2,
      s"pair emissions $emitted exceed the cap/2×edges bound " +
        s"(${cap.toLong * edges / 2})")
    // and the cap genuinely constrains: the uncapped surface is larger
    val uncapped = pairs.as("a")
      .join(pairs.as("b"),
        col("a.cust") === col("b.cust") && col("a.sup") < col("b.sup"))
      .count()
    assert(emitted < uncapped,
      s"cap=$cap did not shrink the pair surface ($emitted vs $uncapped)")
  }

  test("truncating cap is conservative: subset with lower-bound jaccard") {
    val cap = 4
    val exact = QueriesR14
      .graphJaccardNeighborsCapped(spark, sfDir, 1 << 20)
      .select(col("sup_a"), col("sup_b"), col("jaccard"))
    val trunc = QueriesR14
      .graphJaccardNeighborsCapped(spark, sfDir, cap)
      .select(col("sup_a"), col("sup_b"), col("jaccard").as("j_trunc"))
    // every surviving pair exists in the exact result with
    // jaccard ≥ the truncated estimate (degrees exact, commons ≤)
    val joined = trunc.join(exact, Seq("sup_a", "sup_b"), "left")
    val missing = joined.filter(col("jaccard").isNull).count()
    assert(missing == 0,
      s"$missing truncated pairs absent from the exact result — the cap " +
        "must only DROP pairs, never invent them")
    val inflated = joined.filter(col("j_trunc") > col("jaccard")).count()
    assert(inflated == 0,
      s"$inflated truncated pairs report jaccard above the exact value — " +
        "the capped estimate must be a lower bound")
  }

  test("production cap is a no-op at test SF: capped ≡ uncapped result") {
    val pairs = QueriesR14.jaccardBipartitePairs(spark, sfDir)
    val maxDeg = pairs.groupBy("cust").count()
      .agg(max("count")).head.getLong(0)
    assert(maxDeg <= QueriesR14.JaccardNeighborCap,
      s"fixture degree ($maxDeg) exceeds the production cap " +
        s"${QueriesR14.JaccardNeighborCap}; the key's oracle would drift")
    val capped = QueriesR14.graphJaccardNeighbors(spark, sfDir)
    val uncapped = QueriesR14
      .graphJaccardNeighborsCapped(spark, sfDir, 1 << 20)
    assert(capped.exceptAll(uncapped).isEmpty &&
           uncapped.exceptAll(capped).isEmpty,
      "capped result differs from uncapped at test SF")
  }

  test("salted fallback: byte-equal to the window spelling on a synthetic hub") {
    import spark.implicits._
    val cap = 3
    // one hub supplier (deg 40) + long-tail suppliers, with overlap
    // so degrees, dedup, and tie-breaks are all exercised; duplicate
    // raw rows exercise the dedup phase
    val raw = (
      (1L to 40L).map(c => (999L, c)) ++            // hub sup
      (1L to 40L).map(c => (999L, c)) ++            // dup rows
      (1L to 10L).map(c => (7L, c)) ++
      (5L to 14L).map(c => (8L, c)) ++
      (1L to 4L).map(c => (9L, c)) ++
      Seq((10L, 1L), (11L, 1L), (12L, 1L))          // degree ties at 1
    ).toDF("sup", "cust")
    val windowed = QueriesR14.jaccardCappedEdgesDeg(raw, cap)
      .orderBy("cust", "sup").collect().toSeq
    val salted = QueriesR14.jaccardCappedEdgesDegSalted(raw, cap)
      .orderBy("cust", "sup").collect().toSeq
    assert(windowed == salted,
      "salted spelling must be byte-equal to the window spelling")
    // the auto trigger: a hub past the threshold selects the salted
    // spelling (same rows); below it, the window spelling
    val auto = QueriesR14.jaccardCappedEdgesDegAuto(raw, cap,
      hubThreshold = 10L).orderBy("cust", "sup").collect().toSeq
    assert(auto == windowed)
    // plan shapes: the salted dedup exchanges on BOTH keys (the pair
    // hash is the salt), never on sup alone before the degree agg,
    // and the degree aggregate is two-phase (a partial_count exists)
    val saltedPlan = QueriesR14.jaccardCappedEdgesDegSalted(raw, cap)
      .queryExecution.executedPlan.toString
    assert(saltedPlan.contains("hashpartitioning(sup") &&
           saltedPlan.contains("cust"),
      s"salted dedup should partition on (sup, cust):\n$saltedPlan")
    assert(saltedPlan.contains("partial_count"),
      "salted degree aggregate should be two-phase (map-side combine)")
    // the window spelling keeps its documented single-exchange shape
    val windowPlan = QueriesR14.jaccardCappedEdgesDeg(raw, cap)
      .queryExecution.executedPlan.toString
    assert(windowPlan.contains("Window"),
      "window spelling unexpectedly changed shape")
  }
}
