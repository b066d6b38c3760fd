package graft

/** The plan-dump surface: formatted plans land as files, the index
  * tallies operators, and the dump shows the properties PlanSpec
  * asserts (pushdown reaches the scan).
  */
class ExplainSpec extends SparkTestBase {

  test("Explain.run dumps formatted plans with pushdown visible") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_explain_spec").toString
    val (written, failed) = Explain.run(spark, sfDir, out,
      Set("scan_project_filter", "q5_multiway_join", "docs_gopher_rules"))
    assert(written == 3 && failed == 0)
    val scan = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/scan_project_filter.txt"))
    // formatted mode with the real operator tree (no AQE placeholder)
    assert(scan.contains("Physical Plan"))
    assert(!scan.contains("AdaptiveSparkPlan"), "dump hidden behind AQE")
    assert(scan.contains("PushedFilters"), "pushdown not visible in dump")
    val index = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/_index.txt"))
    // q5 is a 6-table join: the tally must see multiple joins; the
    // gopher ledger is shuffle-free before its sort
    val q5 = index.linesIterator.find(_.startsWith("q5_multiway_join")).get
    assert("joins=(\\d+)".r.findFirstMatchIn(q5).get.group(1).toInt >= 4, q5)
    val gr = index.linesIterator.find(_.startsWith("docs_gopher_rules")).get
    assert(gr.contains("joins=0"), gr)
  }
}
