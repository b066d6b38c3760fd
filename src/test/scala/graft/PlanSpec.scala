package graft

/** Plan-shape regression tests: the properties that make these queries
  * scale are asserted on the optimized physical plan, so a refactor
  * that silently drops pushdown or degrades a join to a nested loop
  * fails here, not in a 100 TB run.
  */
class PlanSpec extends SparkTestBase {

  // Every assertion here pins an UN-rewritten plan shape; a leaked MV
  // registration from a suite that ran registry keys earlier in the
  // session (PlanGateSpec/ExplainSpec run ALL keys, arming the
  // session-wide rewrite rule) would legitimately serve e.g. the
  // pivot's inner count from the mv_orders artifact and flip the
  // shape. Pin a rewrite-free session up front.
  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.engine.Mv.clear(spark)
  }

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

  test("q3 is a single-shuffle plan ending in top-k (VERDICT r12 #2)") {
    // The scale/latency contract for the one gated key that rode the
    // 2x line: with both dim sides size-gate-broadcast, the only
    // shuffle left is the group-by exchange, and the final sort+limit
    // is a TakeOrderedAndProject (never a global Sort). 3 AQE stages
    // collapsed to 2; the per-stage scheduling floor on a sub-second
    // key was the whole 1.5-2.3x-vs-stock gap.
    val p = plan("q3_top_unshipped")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"q3 expected exactly 1 shuffle exchange, got $shuffles:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q3 top-10 must be TakeOrderedAndProject, not global sort:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2,
      s"q3 expected both dim joins broadcast:\n$p")
  }

  test("q5 supplier broadcast is size-gated: no hint when the scan exceeds the gate") {
    // The scale contract for What's-wrong r8 #1: q5's supplier-side
    // broadcast only exists because the raw scan estimate is tiny at
    // test SF. Re-derive the gated side with the gate forced shut
    // (maxBytes=0 stands in for supplier at 100 TB-equivalent) and
    // assert NO broadcast hint reaches the logical plan — the join is
    // left to AQE/sort-merge instead of a forced driver build.
    import graft.engine.{Ops, Tables}
    import org.apache.spark.sql.functions._
    val sup = Tables.supplier(spark, sfDir)
    val open = Ops.broadcastIfSmall(sup, sup)
    val shut = Ops.broadcastIfSmall(sup, sup, maxBytes = 0L)
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.toString.contains("UnresolvedHint") ||
      df.queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(open), "gate failed to hint a small scan")
    assert(!hinted(shut), "gate hinted a side that exceeds the size bound")
    // and the gated q5 plan itself (previous test) stays broadcast at
    // this SF, so the gate costs nothing where it's safe
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

  test("hash sampling evaluates scan-side: filter before any exchange") {
    val p = plan("sample_hash_deterministic")
    // the md5 filter must sit below the first Exchange (scan stage),
    // so at 100 TB the sample shrinks data before anything wide
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.indexOf("Exchange")
    assert(filterIdx >= 0 && exchangeIdx >= 0,
      s"expected Filter and Exchange in plan:\n$p")
    // executedPlan prints top-down: scan-side filter appears AFTER the
    // aggregate's exchange in the text, i.e. deeper in the tree
    assert(filterIdx > exchangeIdx,
      s"sampling filter is not below the shuffle (runs post-exchange):\n$p")
  }

  test("pivot keeps map-side combine at both aggregate levels, 2 hash shuffles") {
    // Spark pivot = count per (prio,status) then pivotfirst per prio —
    // two partial+final pairs. The contract is that BOTH stay partial
    // (map-side combine) and nothing shuffles beyond the two group-bys
    // + the output sort.
    val p = plan("pivot_status_matrix")
    assert(p.contains("partial_count"), s"inner agg lost partial:\n$p")
    assert(p.contains("partial_pivotfirst"), s"pivot agg lost partial:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"pivot shuffles more than its two group-bys:\n$p")
  }

  test("minhash verify stage materializes arrays only for candidates (semi-join)") {
    // The docs_dedup_near KEY now reads the cached pair artifact
    // (Artifacts.nearDupPairs), so the shape assertion targets the
    // pipeline that produces the artifact.
    val p = graft.engine.Ops
      .minhashNearDup(graft.engine.Tables.documents(spark, sfDir),
                      "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      s"shingle-array aggregate not candidate-filtered:\n$p")
  }

  test("binned range join stays an equi join (no nested loop, no cartesian)") {
    val p = plan("join_range_binned")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"),
      s"range join lost its bin equi key:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"range join degraded to a cross product:\n$p")
  }

  test("salted skew join shuffles on (key, salt), not a broadcast") {
    // the salt only spreads hot keys if the join is actually shuffled
    val p = plan("join_skew_salted")
    assert(p.contains("SortMergeJoin"), s"salted join lost its merge hint:\n$p")
  }

  test("contamination probe broadcasts the benchmark shingle set") {
    val p = plan("docs_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark set not broadcast (corpus would shuffle on shingle):\n$p")
  }

  test("chunking is map-side only: no exchange before the explode") {
    val p = plan("docs_chunk_windows")
    // exactly one exchange: the final orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).length -
      "ReusedExchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"chunking shuffles before the sort:\n$p")
  }

  test("annIvf scans the codebook once (index reuses the probe ranking's shuffle)") {
    // index cells and probe cells now come from one identical ranked
    // subtree — after execution the adaptive plan must show the
    // codebook cross-join's exchange reused, not recomputed. (The
    // emb_ann_ivf KEY serves the cached artifact, so the shape
    // assertion targets the operator that produces it.)
    import graft.engine.{Ops, Tables}
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cent = e.filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cid"),
              org.apache.spark.sql.functions.col("embedding").as("cemb"))
    val df = Ops.annIvf(e, "vec_id", "embedding", cent, k = 3, nprobe = 4)
    df.collect() // execute THIS plan (count() would derive a new one)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"codebook assignment computed twice (no exchange reuse):\n$p")
  }

  test("q17 correlated scalar subqueries decorrelate to joins (no per-row subplan)") {
    val p = plan("q17_small_qty_revenue")
    // RewriteCorrelatedScalarSubquery must leave NO subquery node in
    // the physical plan — a surviving Subquery/InSubquery would mean a
    // per-outer-row rescan of lineitem at 100 TB.
    assert(!p.contains("Subquery"), s"correlated subquery not decorrelated:\n$p")
    // the decorrelated per-part aggregate joins back via an equi join
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
           p.contains("ShuffledHashJoin"),
      s"no equi join carrying the decorrelated aggregate:\n$p")
    assert(!p.contains("NestedLoop"), s"q17 degraded to nested loop:\n$p")
  }

  test("q22 uncorrelated scalar subqueries run once; NOT EXISTS is an anti join") {
    val p = plan("q22_idle_balance")
    // the threshold aggregates must appear as one-shot subqueries
    // (Subquery/ReusedSubquery), NOT be decorrelated into per-row
    // joins — and the second occurrence should reuse the first's
    // result rather than rescan customer
    assert(p.contains("Subquery"), s"uncorrelated scalar lost its subquery plan:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$p")
    assert(!p.contains("NestedLoop"), s"q22 degraded to nested loop:\n$p")
  }

  test("q21 single-exchange aggregate shape (r19: no lineitem self-joins)") {
    val p = plan("q21_last_shipper")
    // the r19 rewrite answers both EXISTS subqueries from per-order
    // aggregates over ONE exchange of lineitem — a reappearing
    // lineitem-keyed LeftSemi/LeftAnti would mean the triple-scan
    // self-join is back. The ONLY semi join allowed is the r20
    // finished-ORDERS prefilter (build side = o_orderkey), which
    // halves the bytes through the pinned repartition.
    assert(!p.contains("LeftAnti"), s"q21 re-grew a lineitem anti join:\n$p")
    assert(p.linesIterator.filter(_.contains("LeftSemi"))
             .forall(_.contains("o_orderkey")),
      s"q21 grew a semi join that is not the orders prefilter:\n$p")
    assert(!p.contains("NestedLoop"), s"q21 degraded to nested loop:\n$p")
    // lineitem is shuffled ONLY by the explicit l_orderkey repartition
    // — the grain collapse, supplier maxima, order window and join-back
    // all reuse its clustering (the probe and build legs print as two
    // identical subtrees in the INITIAL plan; AQE stage-reuse dedups
    // them at runtime, so assert the exchange KEY, not the scan count)
    val liExchanges = "Exchange hashpartitioning\\(l_".r.findAllIn(p).length
    val repart = "REPARTITION_BY_NUM".r.findAllIn(p).length
    assert(liExchanges == repart && repart >= 1,
      s"q21 grew a non-repartition lineitem exchange " +
        s"($liExchanges lineitem-keyed vs $repart repartition):\n$p")
  }

  test("q2 correlated scalar MIN (with joins in its body) decorrelates") {
    val p = plan("q2_min_cost_supp")
    // RewriteCorrelatedScalarSubquery must fold the per-part European
    // minimum into ONE grouped MIN joined back on (cost, partkey) —
    // a surviving Subquery would rescan ps per outer part at 100 TB.
    assert(!p.contains("Subquery"), s"q2 scalar not decorrelated:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
           p.contains("ShuffledHashJoin"),
      s"no equi join carrying the decorrelated minimum:\n$p")
    assert(!p.contains("NestedLoop"), s"q2 degraded to nested loop:\n$p")
  }

  test("q11 global-fraction HAVING keeps a one-shot uncorrelated subquery") {
    val p = plan("q11_important_stock")
    assert(p.contains("Subquery"),
      s"uncorrelated threshold lost its one-shot subquery plan:\n$p")
    assert(!p.contains("NestedLoop"), s"q11 degraded to nested loop:\n$p")
  }

  test("q20 nested INs become semi joins; inner correlated SUM decorrelates") {
    val p = plan("q20_excess_suppliers")
    assert(p.contains("LeftSemi"), s"IN not rewritten to semi join:\n$p")
    assert(!p.contains("Subquery"),
      s"inner correlated scalar not decorrelated:\n$p")
    assert(!p.contains("NestedLoop"), s"q20 degraded to nested loop:\n$p")
  }

  test("q16 NOT IN is a null-aware anti join; q12 pushes the date range") {
    val p16 = plan("q16_supplier_cnt")
    assert(p16.contains("LeftAnti"), s"NOT IN not an anti join:\n$p16")
    assert(!p16.contains("NestedLoop"), s"q16 degraded to nested loop:\n$p16")
    val p12 = plan("q12_latency_priority")
    assert(p12.contains("GreaterThanOrEqual(l_shipdate") &&
           p12.contains("LessThan(l_shipdate"),
      s"q12 ship-date range not pushed to the lineitem scan:\n$p12")
  }

  test("NOT IN plans the null-aware anti join (broadcast, single key)") {
    val p = plan("join_notin_nullaware")
    // BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true —
    // the trailing `true` is isNullAwareAntiJoin: the build side
    // carries the null-probe so three-valued NOT IN semantics hold
    // without a per-row rescan.
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"NOT IN did not plan a null-aware anti join:\n$p")
    assert(!p.contains("NestedLoop"), s"NOT IN degraded to nested loop:\n$p")
  }

  test("lateral LIMIT decorrelates to a ranked window, not a per-row rescan") {
    val p = plan("join_lateral_topk")
    assert(!p.contains("Subquery"), s"lateral not decorrelated:\n$p")
    assert(p.contains("Window"),
      s"lateral LIMIT did not become a ranked window:\n$p")
    assert(!p.contains("NestedLoop"),
      s"lateral degraded to nested loop:\n$p")
  }

  test("SELECT-list scalar subqueries decorrelate to one outer-joined aggregate") {
    val p = plan("subquery_select_scalar")
    assert(!p.contains("Subquery"),
      s"SELECT-list scalar subquery not decorrelated:\n$p")
    assert(p.contains("HashAggregate"),
      s"decorrelated aggregate missing:\n$p")
    assert(!p.contains("NestedLoop"),
      s"scalar subquery degraded to nested loop:\n$p")
  }

  test("recursive CTE plans the UnionLoop operator") {
    val p = plan("cte_recursive_months")
    assert(p.contains("UnionLoop"), s"recursive CTE not a UnionLoop:\n$p")
  }

  test("q19 disjunction pushes per-side implications to both scans") {
    val p = plan("q19_disjunctive_pred")
    assert(p.contains("BroadcastHashJoin"), s"q19 lost broadcast join:\n$p")
    // each side's OR-of-conjunctions must reach its parquet scan: the
    // part scan sees the brand/size disjunction, the lineitem scan the
    // quantity disjunction — neither side full-scans before the join.
    val pushedOnPart = "PushedFilters: \\[[^\\]]*p_brand".r.findFirstIn(p)
    val pushedOnLineitem = "PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p)
    assert(pushedOnPart.isDefined, s"brand/size OR not pushed to part scan:\n$p")
    assert(pushedOnLineitem.isDefined,
      s"quantity OR not pushed to lineitem scan:\n$p")
  }

  test("q7 dual-role nation dims broadcast; pair filter prunes both scans") {
    val p = plan("q7_volume_shipping")
    assert(p.contains("BroadcastHashJoin"), s"q7 lost its dim broadcasts:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q7 degraded:\n$p")
    // the nation-pair IN filter must reach the nation scans (it is what
    // shrinks supplier/customer before the fact joins)
    assert("PushedFilters: \\[[^\\]]*In\\(n_name".r.findFirstIn(p).isDefined,
      s"nation pair filter not pushed to the nation scan:\n$p")
  }

  test("q13 keeps the outer join (ON-residual must not turn it inner)") {
    val p = plan("q13_order_count_dist")
    assert(p.contains("LeftOuter"), s"q13 outer join lost:\n$p")
    // the priority residual belongs on the orders side scan, not WHERE
    assert("PushedFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(p).isDefined,
      s"priority residual not pushed to the orders scan:\n$p")
  }

  test("q15 max-of-aggregate runs as a one-shot subquery") {
    val p = plan("q15_top_supplier")
    assert(p.contains("Subquery"),
      s"q15 threshold did not stay an uncorrelated one-shot subquery:\n$p")
    assert(!p.contains("NestedLoop"), s"q15 degraded to nested loop:\n$p")
    // the quarter window must prune the lineitem scan
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"ship-date window not pushed to the lineitem scan:\n$p")
  }

  test("q6 pure filter-aggregate pushes all three range predicates") {
    val p = plan("q6_forecast_revenue")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(("PushedFilters: \\[[^\\]]*" + c).r.findFirstIn(p).isDefined,
        s"$c predicate not pushed to the lineitem scan:\n$p")
    // (WholeStageCodegen spans don't render in the pre-execution AQE
    // plan string, so codegen isn't assertable here; the scan shape is)
    assert(!p.contains("Join"), s"q6 should be a pure scan-aggregate:\n$p")
  }

  test("q9 LIKE contains-filter pushes to the part scan") {
    val p = plan("q9_product_profit")
    assert("PushedFilters: \\[[^\\]]*StringContains\\(p_name,rod\\)".r
             .findFirstIn(p).isDefined,
      s"LIKE '%rod%' not pushed as StringContains:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q9 lost dim broadcasts:\n$p")
  }

  test("null-safe equality is a hash-join key (no nested loop)") {
    val p = plan("join_nullsafe_eq")
    assert(p.contains("BroadcastHashJoin"),
      s"<=> join lost its hash strategy:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"null-safe join degraded:\n$p")
  }

  test("PQ encode joins broadcast the 128-row codebook") {
    val p = plan("emb_pq_adc")
    assert(p.contains("BroadcastHashJoin"),
      s"PQ codebook/distance-table joins lost their broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"PQ encode shuffles the store against a 128-row codebook:\n$p")
  }

  test("interval join keeps its equi key (no nested loop on the time bound)") {
    val p = plan("events_interval_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"interval join lost its user_id equi strategy:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"interval join degraded on the time-bound residual:\n$p")
  }

  test("corpus pipeline keeps the semi join and prunes the doc scan") {
    val p = plan("docs_corpus_pipeline")
    assert(p.contains("LeftSemi"), s"dedup survivor join not semi:\n$p")
    assert(!p.contains("CartesianProduct"), s"pipeline degraded:\n$p")
    // only the three consumed columns may reach the documents scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      s"documents scan not pruned to (doc_id, text, lang):\n$p")
  }

  test("fuzzy join pairs only within blocks (equi key, no cross product)") {
    val p = plan("join_fuzzy_blocked")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"fuzzy join lost its blocking equi key:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"fuzzy join degraded to all-pairs:\n$p")
  }

  test("AQE splits a skewed join partition (the runtime skew remedy)") {
    // Mechanism probe for the 100 TB skew story SURVEY §7.6 describes:
    // salting (agg_salted_skew) is the manual remedy, AQE's
    // OptimizeSkewedJoin is the runtime one. Thresholds are lowered so
    // the local fixture's hot key (90% of rows) crosses them; assert
    // the final adaptive plan marks the join skew=true (split reads).
    import org.apache.spark.sql.functions._
    val confs = Seq(
      // 4 parts: with only 2, the hot partition IS the median, so the
      // skewedPartitionFactor test (size > factor × median) never fires
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = spark.range(0, 50000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
                col("id").as("payload"))
      val right = spark.range(0, 64).select(col("id").as("k"),
                                            lit("dim").as("tag"))
      val j = left.join(right, "k").groupBy("tag").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("perplexity buckets: no data window partitioned by lang alone") {
    // r8 verdict #3: ntile over Window.partitionBy(lang) put each
    // language's whole corpus in one task. The respelling may window
    // (a) the DATA by (lang, slice) — bounded by a range partition —
    // and (b) the metadata-sized slice-count frame by lang, which sits
    // directly on an Aggregate. Assert every lang-only window is the
    // metadata kind: its subtree contains an aggregate over
    // (lang, slice), never a raw corpus scan.
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("docs_perplexity_buckets")(spark, sfDir)
      val wins = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "expected window operators in the plan")
      val langOnly = wins.filter(w => w.partitionSpec.size == 1 &&
        w.partitionSpec.head.toString.contains("lang"))
      langOnly.foreach { w =>
        val aggBelow = w.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
        }
        assert(aggBelow.nonEmpty,
          s"lang-only window runs over raw data (one task per language):\n$w")
      }
      // the data-path window must key on MORE than lang
      assert(wins.exists(_.partitionSpec.size >= 2),
        "no bounded (lang, slice) data window found")
    } finally aqePrior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("sparse sim joins only through the term index (equi join, no cross product)") {
    // the inverted-index recipe only scales if the pair surface stays
    // an equi join on the term — a cartesian respelling would be n²
    val p = plan("docs_sparse_sim_topk")
    // the only nested-loop allowed is the broadcast of the 1-row corpus
    // count; a shuffled cartesian would mean the pair surface went n²
    assert(!p.contains("CartesianProduct"),
      s"sparse similarity degraded to a cross product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"term index join missing:\n$p")
  }

  test("incremental dedup probes the base index through a (band, bh) equi join") {
    // the scale contract: delta candidates meet the persisted base
    // index ONLY through the band-bucket equi key — a nested loop or
    // cartesian here would re-pair the delta against the whole corpus
    val p = plan("docs_dedup_incremental")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"band-index probe lost its equi strategy:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"incremental dedup degraded to all-pairs:\n$p")
    // verification must stay candidate-pruned: the raw docs reach the
    // shingle explode only through the candidate semi join
    assert(p.contains("LeftSemi"),
      s"verification shingles not candidate-pruned:\n$p")
  }

  test("spatial radius join stays an equi join on the grid cell") {
    val p = plan("join_spatial_grid")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"spatial join degraded to a cross product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"grid equi join missing:\n$p")
  }

  test("semdedup broadcasts the codebook and equi-joins within cells") {
    val p = plan("emb_semdedup")
    // assignment: the 16-row codebook must arrive as a broadcast, and
    // the within-cell pair join must key on cid — not cross the corpus
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"codebook not broadcast:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"),
      s"within-cell join lost its cid equi key:\n$p")
  }

  test("scan_dpp_partitioned: DPP subquery reaches the scan and skips files") {
    // AQE off for this probe so the physical tree (and its metrics) is
    // directly traversable; DPP itself is an optimizer-rule property
    // and fires identically with AQE on.
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("scan_dpp_partitioned")(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"no dynamicpruning expression reached a scan:\n$p")
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val dpp = scans.find(_.partitionFilters.mkString.contains("dynamicpruning"))
      assert(dpp.nonEmpty, s"no scan carries a dynamicpruning partition filter:\n$p")
      val read = dpp.get.metrics("numFiles").value
      val static = dpp.get.metrics("staticFilesNum").value
      assert(read < static,
        s"DPP did not skip any files: read=$read of static=$static")
    } finally aqePrior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("join_runtime_bloom: runtime bloom filter reaches the fact side") {
    // The row-grain companion to the DPP probe above: Spark's
    // InjectRuntimeFilter gates on the application side scanning
    // >= 10 GB (exactly right at 100 TB, never true at test SF), so
    // the thresholds are lowered here to prove the mechanism, and the
    // result is pinned byte-identical to the default-conf plan.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: the rule only injects where the filter
      // can intercept rows BEFORE an exchange
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val base = SparkEntry.queries("join_runtime_bloom")(spark, sfDir).collect()
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = SparkEntry.queries("join_runtime_bloom")(spark, sfDir)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$p")
      // the filter must probe the FACT table's key: assert l_partkey
      // appears inside the might_contain call's own argument list
      // (a bare p.contains("l_partkey") would match the join
      // condition and prove nothing)
      assert("""might_contain\([^\n]*l_partkey""".r.findFirstIn(p).nonEmpty,
        s"bloom filter does not probe the fact join key:\n$p")
      val filtered = df.collect()
      assert(filtered.sameElements(base),
        "runtime bloom filtering changed query results")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_bloom_prefilter: probe and exact verify both survive optimization") {
    val p = plan("join_bloom_prefilter")
    // the bf_contains predicate must survive optimization on the probe
    // side — Catalyst fuses the 1-row broadcast + filter into a
    // BroadcastNestedLoopJoin whose CONDITION is bf_contains (the
    // scalar-broadcast shape) — and the exactness pass must stay a
    // semi join. The RELATIVE order of the two is the optimizer's
    // cost call (at this SF it runs the broadcast semi join first;
    // results are order-independent) — the prefilter's actual pruning
    // is pinned by BfSpec's passed < total counts, not by plan order.
    assert(p.contains("bf_contains"),
      s"bloom prefilter optimized away:\n$p")
    assert(p.contains("LeftSemi"), s"exact verify lost its semi join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"prefilter degraded to a real cartesian:\n$p")
  }

  test("scan_zorder_skip: Z-ordered layout skips row groups on BOTH dimensions") {
    // The defining Z-order property — one layout serves band
    // predicates on EITHER clustered column. Runs at sf0.01: the
    // layout there spans ~30 row groups, enough granularity for
    // min/max skipping to show (sf0.001 fits in ~8 groups whose
    // boundaries are dominated by one dimension's high bits).
    import org.apache.spark.sql.functions._
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sf01 = "/root/testdata/sf0.01"
      def readRows(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.head.metrics("numOutputRows").value
      }
      val total = graft.engine.Tables.lineitem(spark, sf01).count()
      val partRead = readRows(
        SparkEntry.queries("scan_zorder_skip")(spark, sf01))
      val zli = graft.engine.QueriesR9.zorderLineitem(spark, sf01)
      val dateRead = readRows(
        zli.filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
                   col("l_shipdate") <= lit("1996-03-31").cast("date"))
          .groupBy(lit(1)).count())
      assert(partRead < total / 2,
        s"part-key band read $partRead of $total — no skipping on dim 2")
      assert(dateRead < total / 2,
        s"date band read $dateRead of $total — no skipping on dim 1")
    } finally aqePrior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("scan_zorder_dpp: directory pruning AND row-group skipping fire on one scan") {
    import org.apache.spark.sql.functions._
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sf01 = "/root/testdata/sf0.01"
      val df = SparkEntry.queries("scan_zorder_dpp")(spark, sf01)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val fact = scans.find(_.partitionFilters.mkString.contains("dynamicpruning"))
      assert(fact.nonEmpty,
        s"no scan carries a dynamicpruning partition filter:\n" +
          df.queryExecution.executedPlan)
      // grain 1: DPP pruned year DIRECTORIES (files read < static count)
      val read = fact.get.metrics("numFiles").value
      val static = fact.get.metrics("staticFilesNum").value
      assert(read < static,
        s"DPP did not skip any files: read=$read of static=$static")
      // grain 2: the part-key band skipped ROW GROUPS inside the
      // surviving directory — rows read must be well under that
      // year's row count (dir pruning alone would read all of them)
      val rowsRead = fact.get.metrics("numOutputRows").value
      val dirRows = graft.engine.Tables.lineitem(spark, sf01)
        .filter(year(col("l_shipdate").cast("date")) === 2001).count()
      assert(rowsRead < dirRows / 2,
        s"no row-group skipping inside the pruned partition: " +
          s"read $rowsRead of $dirRows 2001 rows")
    } finally aqePrior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("udtf_ngrams_native: the custom Generator reaches the physical plan") {
    val df = SparkEntry.queries("udtf_ngrams_native")(spark, sfDir)
    // executedPlan is an AdaptiveSparkPlanExec LEAF (collect cannot
    // descend into it), so assert on the printed tree: the physical
    // Generate node must carry the custom generator by name
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate ngrams_gen("),
      s"no physical Generate carries ngrams_gen:\n$p")
    // and the lateral spelling is indistinguishable from the explode one
    val native = df.collect().map(_.toSeq)
    val explode = SparkEntry.queries("udtf_generator_ngrams")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(native.sameElements(explode),
      "generator and explode spellings diverged")
  }

  test("scan_sorted_skip: sorted layout skips row groups; unsorted twin cannot") {
    import org.apache.spark.sql.functions._
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // created ahead of the try so an assertion failure still reaches
    // the finally-block cleanup instead of leaking the directory
    val twinDir = java.nio.file.Files
      .createTempDirectory("graft_unsorted_twin_").toString
    try {
      val df = SparkEntry.queries("scan_sorted_skip")(spark, sfDir)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      val sortedRead = scan.metrics("numOutputRows").value
      val total = graft.engine.Tables.lineitem(spark, sfDir).count()
      // the unsorted twin: same narrow projection, same 64 KB row
      // groups, natural (shipdate-scattered) order — every row group's
      // min/max spans the band, so nothing can be skipped
      // same DATE-typed key as the artifact so the comparison isolates
      // ORDER (sorted vs natural), not column type
      val src = graft.engine.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"),
                col("l_shipdate").cast("date").as("l_shipdate"),
                col("l_extendedprice"), col("l_discount"))
      // per-run temp dir (created above): a fixed shared path would
      // race a concurrent test JVM mid-scan
      src.write.mode("overwrite")
        .option("parquet.block.size", "65536")
        .option("parquet.page.size", "4096")
        .option("parquet.enable.dictionary", "false")
        .parquet(twinDir)
      val twin = spark.read.parquet(twinDir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate") <= lit("1996-03-31").cast("date"))
        .groupBy(lit(1)).count()
      twin.collect()
      val twinRead = twin.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numOutputRows").value
      // sorted layout: only the row groups overlapping one quarter of
      // ~7 years of dates survive the min/max check
      assert(sortedRead < total / 2,
        s"sorted scan read $sortedRead of $total rows — no row-group skipping")
      assert(sortedRead < twinRead,
        s"sorted scan ($sortedRead) read no fewer rows than the " +
          s"unsorted twin ($twinRead)")
    } finally {
      aqePrior match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None    => spark.conf.unset("spark.sql.adaptive.enabled")
      }
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(twinDir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }

  /** Runs `body` with AQE off so executedPlan is the concrete tree
    * (AdaptiveSparkPlanExec hides subtrees from collect/toString). */
  private def withoutAqe[T](body: => T): T = {
    val prior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("cep pattern: every window keys on user_id, signup fetch is an equi join") {
    withoutAqe {
      val df = SparkEntry.queries("events_cep_pattern")(spark, sfDir)
      val exec = df.queryExecution.executedPlan
      val wins = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "expected window operators")
      // the sequence-number and running-maxima windows must all be
      // per-user (a global window would sort the whole stream in one
      // task) and share the user_id partitioning
      wins.foreach { w =>
        assert(w.partitionSpec.nonEmpty &&
               w.partitionSpec.exists(_.toString.contains("user_id")),
          s"window not partitioned by user_id:\n$w")
      }
      val p = exec.toString
      assert(!p.contains("CartesianProduct") &&
             !p.contains("BroadcastNestedLoopJoin"),
        s"signup fetch degraded to a non-equi join:\n$p")
    }
  }

  test("gopher rules: in-row projection — no hash shuffle before the sort") {
    // every rule is computed per row from the text; the only exchange
    // the plan may contain is the final ORDER BY's range partitioning
    val p = plan("docs_gopher_rules")
    assert(!p.contains("Exchange hashpartitioning"),
      s"rule ledger introduced a data shuffle:\n$p")
    assert(p.contains("rangepartitioning"), s"missing output sort:\n$p")
  }

  test("phash near-dup verifies candidates with integer popcount, equi band join") {
    withoutAqe {
      // the pair stage is what the CC checkpoint hides from the final
      // key's plan — assert it directly on a representative frame
      import spark.implicits._
      val reps = Seq(("0" * 64, 1L), ("0" * 63 + "1", 2L))
        .toDF("phash", "rep")
      val df = graft.engine.QueriesR13.phashNearPairs(reps)
      val p = df.queryExecution.executedPlan.toString
      // the band self-join must stay an equi join on (band, bh) — never
      // a cross product over representatives
      assert(!p.contains("CartesianProduct") &&
             !p.contains("BroadcastNestedLoopJoin"),
        s"band join degraded:\n$p")
      // verification is the codegen-friendly XOR+popcount, not the
      // CodegenFallback string-positional higher-order filter
      assert(p.contains("bit_count"), s"integer hamming missing:\n$p")
      assert(!p.contains("ArrayFilter"),
        s"string-positional hamming crept back (CodegenFallback):\n$p")
      // and the stage is semantically right on the toy pair
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 2L)))
    }
  }
}
