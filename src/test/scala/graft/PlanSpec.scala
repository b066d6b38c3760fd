package graft

/** Plan-shape regression tests: the properties that make these queries
  * scale are asserted on the optimized physical plan, so a refactor
  * that silently drops pushdown or degrades a join to a nested loop
  * fails here, not in a 100 TB run.
  */
class PlanSpec extends SparkTestBase {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("scan_project_filter: filter pushed to parquet, columns pruned") {
    val p = plan("scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$p")
    // pruned read schema: exactly the 4 projected columns reach the scan
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"),
      s"columns not pruned:\n$p")
  }

  test("dimension joins broadcast (q3, q5, join_broadcast)") {
    for (k <- Seq("q3_top_unshipped", "q5_multiway_join", "join_broadcast")) {
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k lost broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$k shuffles a sort-merge join at dim scale:\n$p")
    }
  }

  test("theta-range join keeps its equi key (no nested loop)") {
    val p = plan("join_theta_range")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"theta join has no equi strategy:\n$p")
    assert(!p.contains("NestedLoop"), s"theta join degraded to nested loop:\n$p")
  }

  test("bucketed join reads co-located buckets with no pre-join shuffle") {
    val p = plan("join_bucketed")
    assert(p.contains("SortMergeJoin"), s"bucketed join not sort-merge:\n$p")
    // the only exchanges allowed are the post-join aggregation/sort
    // ones; nothing may repartition on the join keys
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
           !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join shuffled its inputs:\n$p")
    assert(p.contains("SelectedBucketsCount"), s"scan not bucket-aware:\n$p")
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"q1 lost partial aggregation:\n$p")
  }

  test("semi/anti joins stay semi/anti (no row-multiplying rewrite)") {
    val p = plan("join_semi_anti")
    assert(p.contains("LeftSemi"), s"semi join rewritten:\n$p")
    assert(p.contains("LeftAnti"), s"anti join rewritten:\n$p")
  }
}
