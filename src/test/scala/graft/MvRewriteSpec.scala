package graft

import java.nio.file.Files

import graft.engine.{LakeTable, Mv}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Gates the [[Mv]] rollup rewrite in BOTH directions — the half the
  * mv_rewrite_rollup oracle cannot see: the rewrite must actually
  * FIRE on derivable aggregates (the optimized plan scans the MV
  * files, not the base), and must DECLINE every non-derivable shape
  * (filters under the aggregate, DISTINCT, AVG, unregistered
  * relations) by leaving the plan untouched.
  */
class MvRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val baseDir = Files.createTempDirectory("graft_mv_base").toString
  private val mvRoot = Files.createTempDirectory("graft_mv_sum").toString + "/mv"

  private lazy val base: DataFrame = {
    Seq(("a", "p1", 10L), ("a", "p1", 20L), ("a", "p2", 5L),
        ("b", "p1", 7L), ("b", "p2", 100L), ("b", "p2", 1L))
      .toDF("g1", "g2", "x").write.mode("overwrite").parquet(baseDir)
    val df = spark.read.parquet(baseDir)
    Mv.register(spark, "spec_mv", df, Seq("g1", "g2"), Seq("x"), mvRoot)
    df
  }

  override def afterAll(): Unit = {
    Mv.clear() // keep later suites' plans rewrite-free
    super.afterAll()
  }

  private def scannedPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString.stripPrefix("file:"))
        case _ => Seq.empty
      }
    }.flatten.toSet

  test("rollup rewrite fires: subset group-by over the base scans only the MV") {
    val q = base.groupBy("g1")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
           min("x").as("mn"), max("x").as("mx"))
      .orderBy("g1")
    val paths = scannedPaths(q)
    assert(paths.nonEmpty && paths.forall(_.startsWith(mvRoot)),
      s"expected MV-only scan, got $paths")
    val got = q.as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 35L, 5L, 20L), ("b", 3L, 108L, 1L, 100L)))
  }

  test("full group-by and SQL-text count(*) rewrite too") {
    base.createOrReplaceTempView("mv_base_v")
    val q = spark.sql(
      "SELECT g1, g2, count(*) AS n FROM mv_base_v GROUP BY g1, g2")
    assert(scannedPaths(q).forall(_.startsWith(mvRoot)))
    assert(q.orderBy("g1", "g2").as[(String, String, Long)].collect().toSeq ==
      Seq(("a", "p1", 2L), ("a", "p2", 1L),
          ("b", "p1", 1L), ("b", "p2", 2L)))
  }

  test("declines non-derivable shapes, leaving the base scan in place") {
    // a filter under the aggregate
    val f = base.filter($"x" > 1L).groupBy("g1").agg(sum("x").as("sx"))
    assert(scannedPaths(f).exists(_.startsWith(baseDir)))
    // DISTINCT aggregate
    val d = base.groupBy("g1").agg(countDistinct("x").as("nd"))
    assert(scannedPaths(d).exists(_.startsWith(baseDir)))
    // integral AVG IS in the rollup algebra since r18 (exact from
    // sum/cntn partials) — it must SERVE here; the fractional decline
    // is pinned in the dedicated avg test below
    val a = base.groupBy("g1").agg(avg("x").as("ax"))
    assert(scannedPaths(a).forall(_.startsWith(mvRoot)))
    // grouping by a column the MV does not group by
    val g = base.groupBy("x").agg(count(lit(1)).as("n"))
    assert(scannedPaths(g).exists(_.startsWith(baseDir)))
    // sum over a column the MV carries no partials for: g2 is a
    // string — use a derived column instead to stay type-valid
    val e = base.groupBy("g1").agg(sum($"x" * 2).as("sx2"))
    assert(scannedPaths(e).exists(_.startsWith(baseDir)))
    // and the declined plans still compute correctly
    assert(f.orderBy("g1").as[(String, Long)].collect().toSeq ==
      Seq(("a", 35L), ("b", 107L)))
  }

  test("values survive a rule-off comparison") {
    val q = base.groupBy("g2")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("g2")
    val rewritten = q.as[(String, Long, Long)].collect().toSeq
    Mv.clear()
    try {
      val plain = base.groupBy("g2")
        .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("g2")
        .as[(String, Long, Long)].collect().toSeq
      assert(rewritten == plain)
    } finally Mv.register(spark, "spec_mv", base, Seq("g1", "g2"),
      Seq("x"), mvRoot)
  }

  test("filter-aware: a predicate on group columns is served from the MV") {
    val q = base.filter($"g1" === "a")
      .groupBy("g2").agg(sum("x").as("sx")).orderBy("g2")
    val paths = scannedPaths(q)
    assert(paths.nonEmpty && paths.forall(_.startsWith(mvRoot)),
      s"group-column filter should be servable, got $paths")
    assert(q.as[(String, Long)].collect().toSeq ==
      Seq(("p1", 30L), ("p2", 5L)))
    // a predicate on the AGG column needs pre-aggregation rows: decline
    val d = base.filter($"x" > 5L).groupBy("g1").agg(sum("x").as("sx"))
    assert(scannedPaths(d).exists(_.startsWith(baseDir)))
    assert(d.orderBy("g1").as[(String, Long)].collect().toSeq ==
      Seq(("a", 30L), ("b", 107L)))
  }

  test("HLL sketch rollup is byte-exact: merged partials equal the raw sketch") {
    graft.engine.Hll.register(spark)
    val hllRoot =
      Files.createTempDirectory("graft_mv_hll").toString + "/mv"
    Mv.register(spark, "spec_mv_hll", base, Seq("g1", "g2"), Seq("x"),
      hllRoot, hllCols = Seq("x"))
    val q = base.groupBy("g1")
      .agg(expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("g1")
    assert(scannedPaths(q).forall(_.startsWith(hllRoot)))
    val got = q.as[(String, Long)].collect().toSeq
    Mv.clear()
    val plain = base.groupBy("g1")
      .agg(expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("g1").as[(String, Long)].collect().toSeq
    // byte-identical sketches → identical estimates, not just close
    assert(got == plain)
    Mv.register(spark, "spec_mv", base, Seq("g1", "g2"), Seq("x"), mvRoot)
  }

  test("incremental refresh folds an append-only delta exactly") {
    val dir2 = Files.createTempDirectory("graft_mv_base2").toString
    val r2 = Files.createTempDirectory("graft_mv_sum2").toString + "/mv"
    Seq(("a", "p1", 1L), ("b", "p1", 2L)).toDF("g1", "g2", "x")
      .write.mode("overwrite").parquet(dir2)
    val b0 = spark.read.parquet(dir2)
    Mv.register(spark, "spec_mv_inc", b0, Seq("g1", "g2"), Seq("x"), r2,
      hllCols = Seq("x"))
    // the base grows: new files in the same root path set
    val delta = Seq(("a", "p2", 10L), ("c", "p1", 7L), ("a", "p1", 1L))
      .toDF("g1", "g2", "x")
    delta.write.mode("append").parquet(dir2)
    Mv.refresh(spark, "spec_mv_inc", spark.read.parquet(dir2), delta)
    val q = spark.read.parquet(dir2).groupBy("g1")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
           min("x").as("mn"), max("x").as("mx"),
           expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("g1")
    assert(scannedPaths(q).forall(_.startsWith(r2)))
    val got = q.as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      Seq(("a", 3L, 12L, 1L, 10L), ("b", 1L, 2L, 2L, 2L),
          ("c", 1L, 7L, 7L, 7L)))
    // the HLL leg: byte-exact vs a raw recompute with the rule off
    Mv.clear()
    val plain = spark.read.parquet(dir2).groupBy("g1")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
           min("x").as("mn"), max("x").as("mx"),
           expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("g1")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == plain)
    Mv.register(spark, "spec_mv", base, Seq("g1", "g2"), Seq("x"), mvRoot)
  }

  test("null-aware count(col) rolls on its own partial") {
    val dirN = Files.createTempDirectory("graft_mv_nulls").toString
    val rN = Files.createTempDirectory("graft_mv_nsum").toString + "/mv"
    Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)), ("b", None))
      .toDF("g1", "x").write.mode("overwrite").parquet(dirN)
    val b = spark.read.parquet(dirN)
    Mv.register(spark, "spec_mv_nulls", b, Seq("g1"), Seq("x"), rN)
    val q = b.groupBy("g1")
      .agg(count(lit(1)).as("n"), count($"x").as("nx"))
      .orderBy("g1")
    assert(scannedPaths(q).forall(_.startsWith(rN)))
    assert(q.as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 3L, 2L), ("b", 1L, 0L)))
  }

  test("derived group expressions: a date-bucket MV serves date_trunc group-bys") {
    val dirT = Files.createTempDirectory("graft_mv_time").toString
    val rT = Files.createTempDirectory("graft_mv_tsum").toString + "/mv"
    spark.sql(
      """SELECT timestampadd(HOUR, CAST(id AS INT), timestamp'2024-01-01 00:00:00') AS ts,
        |       id AS x FROM range(100)""".stripMargin)
      .write.mode("overwrite").parquet(dirT)
    val b = spark.read.parquet(dirT)
    Mv.register(spark, "spec_mv_time", b, Nil, Seq("x"), rT,
      groupExprs = Seq(("day", "date_trunc('DAY', ts)")))
    val q = b.groupBy(expr("date_trunc('DAY', ts)").as("day"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .orderBy("day")
    assert(scannedPaths(q).forall(_.startsWith(rT)),
      s"date-bucket group-by should serve from the MV, got ${scannedPaths(q)}")
    val got = q.as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    Mv.clear()
    val plain = b.groupBy(expr("date_trunc('DAY', ts)").as("day"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .orderBy("day").as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got == plain)
    // 100 hourly rows = days of 24/24/24/24/4 — the bucketing really
    // collapsed rows, and a DIFFERENT bucketing must decline
    assert(got.map(_._2) == Seq(24L, 24L, 24L, 24L, 4L))
    Mv.register(spark, "spec_mv_time", b, Nil, Seq("x"), rT,
      groupExprs = Seq(("day", "date_trunc('DAY', ts)")))
    val week = b.groupBy(expr("date_trunc('WEEK', ts)").as("w"))
      .agg(sum("x").as("sx"))
    assert(scannedPaths(week).exists(_.startsWith(dirT)),
      "a different bucket granularity must not be served")
    Mv.register(spark, "spec_mv", base, Seq("g1", "g2"), Seq("x"), mvRoot)
  }

  test("staleness guard: files appended after registration stop the rewrite") {
    val dir3 = Files.createTempDirectory("graft_mv_base3").toString
    val r3 = Files.createTempDirectory("graft_mv_sum3").toString + "/mv"
    Seq(("a", "p1", 1L)).toDF("g1", "g2", "x")
      .write.mode("overwrite").parquet(dir3)
    Mv.register(spark, "spec_mv_stale", spark.read.parquet(dir3),
      Seq("g1", "g2"), Seq("x"), r3)
    Seq(("a", "p1", 100L)).toDF("g1", "g2", "x")
      .write.mode("append").parquet(dir3)
    // the base grew without a refresh: the rewrite must DECLINE (fresh
    // file listing ≠ registered file set) and the answer stays correct
    val q = spark.read.parquet(dir3).groupBy("g1").agg(sum("x").as("sx"))
    assert(scannedPaths(q).exists(_.startsWith(dir3)))
    assert(q.as[(String, Long)].head() == ("a", 101L))
  }

  test("the registry key's own plan is answered from the MV artifact") {
    val df = graft.engine.Registry.queries("mv_rewrite_rollup")(spark, sfDir)
    val paths = scannedPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("mv_orders")),
      s"mv_rewrite_rollup should scan only the mv_orders artifact, got $paths")
    val inc =
      graft.engine.Registry.queries("mv_rewrite_incremental")(spark, sfDir)
    val ipaths = scannedPaths(inc)
    assert(ipaths.nonEmpty &&
      ipaths.forall(p => p.contains("mv_orders_inc") && p.contains("/mv/")),
      s"mv_rewrite_incremental should scan only the refreshed MV, got $ipaths")
    val tb =
      graft.engine.Registry.queries("mv_rewrite_timebucket")(spark, sfDir)
    val tpaths = scannedPaths(tb)
    assert(tpaths.nonEmpty &&
      tpaths.forall(p => p.contains("mv_orders_month") && p.contains("/mv/")),
      s"mv_rewrite_timebucket should scan only the month MV, got $tpaths")
    val sj =
      graft.engine.Registry.queries("mv_rewrite_starjoin")(spark, sfDir)
    val spaths = scannedPaths(sj)
    assert(spaths.nonEmpty && spaths.forall(_.contains("mv_star")),
      s"mv_rewrite_starjoin should scan only the star MV, got $spaths")
  }

  test("star-schema v1: an inner-equi-join base matches by whole-subtree normal form") {
    val fdir = Files.createTempDirectory("graft_mv_fact").toString
    val ddir = Files.createTempDirectory("graft_mv_dim").toString
    val rJ = Files.createTempDirectory("graft_mv_jsum").toString + "/mv"
    Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("fk", "x")
      .write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def fact = spark.read.parquet(fdir)
    def dim = spark.read.parquet(ddir)
    def joined = fact.join(dim, col("fk") === col("dk"))
    Mv.register(spark, "spec_mv_join", joined, Seq("dname"), Seq("x"), rJ)
    // a FRESH instance of the same join shape is served
    val q = joined.groupBy("dname")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("dname")
    assert(scannedPaths(q).nonEmpty && scannedPaths(q).forall(_.startsWith(rJ)),
      s"join-base aggregate should serve from the MV, got ${scannedPaths(q)}")
    assert(q.as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 3L, 37L), ("b", 1L, 5L)))
    // structural differences decline: join key, join type, filters
    val otherKey = fact.join(dim, col("x") === col("dk"))
      .groupBy("dname").agg(sum("x").as("sx"))
    assert(scannedPaths(otherKey).exists(_.startsWith(fdir)))
    val leftJoin = fact.join(dim, col("fk") === col("dk"), "left")
      .groupBy("dname").agg(sum("x").as("sx"))
    assert(scannedPaths(leftJoin).exists(_.startsWith(fdir)))
    val filtered = joined.filter(col("x") > 5L)
      .groupBy("dname").agg(sum("x").as("sx"))
    assert(scannedPaths(filtered).exists(_.startsWith(fdir)))
    assert(filtered.orderBy("dname").as[(String, Long)].collect().toSeq ==
      Seq(("a", 37L)))
  }

  test("filter containment on join bases: one extra group-column WHERE is served") {
    val fdir = Files.createTempDirectory("graft_mv_factx").toString
    val ddir = Files.createTempDirectory("graft_mv_dimx").toString
    val rX = Files.createTempDirectory("graft_mv_xsum").toString + "/mv"
    Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("fk", "x")
      .write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def joined = spark.read.parquet(fdir)
      .join(spark.read.parquet(ddir), col("fk") === col("dk"))
    Mv.register(spark, "spec_mv_joinx", joined, Seq("dname"), Seq("x"), rX)
    // the registered shape PLUS an extra predicate on the GROUP column
    val q = joined.filter(col("dname") === "a")
      .groupBy("dname").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .orderBy("dname")
    assert(scannedPaths(q).nonEmpty && scannedPaths(q).forall(_.startsWith(rX)),
      s"extra group-column WHERE should serve from the MV, got ${scannedPaths(q)}")
    assert(q.as[(String, Long, Long)].collect().toSeq == Seq(("a", 3L, 37L)))
    // an IN-list extra predicate serves too
    val q2 = joined.filter(col("dname").isin("a", "zzz"))
      .groupBy("dname").agg(sum("x").as("sx"))
    assert(scannedPaths(q2).forall(_.startsWith(rX)))
    assert(q2.orderBy("dname").as[(String, Long)].collect().toSeq ==
      Seq(("a", 37L)))
    // an extra predicate on the AGGREGATED column still declines
    val d = joined.filter(col("x") > 5L)
      .groupBy("dname").agg(sum("x").as("sx"))
    assert(scannedPaths(d).exists(_.startsWith(fdir)))
    assert(d.orderBy("dname").as[(String, Long)].collect().toSeq ==
      Seq(("a", 37L)))
  }

  test("a FILTERED base registers its conjuncts; only containing queries serve") {
    val dirF = Files.createTempDirectory("graft_mv_fbase").toString
    val rF = Files.createTempDirectory("graft_mv_fsum").toString + "/mv"
    Seq(("a", 1L), ("a", 2L), ("b", 30L), ("b", 4L), ("c", 500L))
      .toDF("g1", "x").write.mode("overwrite").parquet(dirF)
    val raw = spark.read.parquet(dirF)
    // the MV summarizes ONLY x < 100 rows (a filter on the AGG column
    // is fine on the BASE side — only EXTRA query conjuncts must sit
    // on group columns)
    Mv.register(spark, "spec_mv_fb", raw.filter($"x" < 100L),
      Seq("g1"), Seq("x"), rF)
    // an UNFILTERED query over the same relation must NOT be served
    // (the summary is missing the x >= 100 rows)
    val unf = raw.groupBy("g1").agg(sum("x").as("sx")).orderBy("g1")
    assert(scannedPaths(unf).exists(_.startsWith(dirF)),
      "a query missing the base's filter must decline")
    assert(unf.as[(String, Long)].collect().toSeq ==
      Seq(("a", 3L), ("b", 34L), ("c", 500L)))
    // the SAME filter serves; filter + an extra group-col conjunct too
    val same = raw.filter($"x" < 100L)
      .groupBy("g1").agg(sum("x").as("sx")).orderBy("g1")
    assert(scannedPaths(same).nonEmpty &&
      scannedPaths(same).forall(_.startsWith(rF)),
      s"the base's own filter should serve, got ${scannedPaths(same)}")
    assert(same.as[(String, Long)].collect().toSeq ==
      Seq(("a", 3L), ("b", 34L)))
    val extra = raw.filter($"x" < 100L).filter($"g1" === "a")
      .groupBy("g1").agg(sum("x").as("sx"))
    assert(scannedPaths(extra).nonEmpty &&
      scannedPaths(extra).forall(_.startsWith(rF)),
      s"base filter + extra group-col conjunct should serve, got ${scannedPaths(extra)}")
    assert(extra.as[(String, Long)].collect().toSeq == Seq(("a", 3L)))
  }

  test("range implication: a filtered-slice MV serves sub-range queries") {
    val dirI = Files.createTempDirectory("graft_mv_ibase").toString
    val rI = Files.createTempDirectory("graft_mv_isum").toString + "/mv"
    (0L to 99L).map(k => (k, k * 10))
      .toDF("g", "x").write.mode("overwrite").parquet(dirI)
    val raw = spark.read.parquet(dirI)
    // the MV summarizes the g < 50 slice, grouped by g
    Mv.register(spark, "spec_mv_impl", raw.filter($"g" < 50L),
      Seq("g"), Seq("x"), rI)
    // a STRICTLY TIGHTER query range is served: g < 20 implies g < 50,
    // and the extra conjunct sits on the group column
    val sub = raw.filter($"g" < 20L)
      .groupBy("g").agg(sum("x").as("sx")).orderBy("g")
    assert(scannedPaths(sub).nonEmpty &&
      scannedPaths(sub).forall(_.startsWith(rI)),
      s"sub-range should serve via implication, got ${scannedPaths(sub)}")
    assert(sub.as[(Long, Long)].collect().toSeq ==
      (0L to 19L).map(k => (k, k * 10)))
    // bounded two-sided sub-range too
    val mid = raw.filter($"g" >= 10L && $"g" < 30L)
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(mid).forall(_.startsWith(rI)))
    assert(mid.orderBy("g").as[(Long, Long)].collect().toSeq ==
      (10L to 29L).map(k => (k, k * 10)))
    // an IN list inside the slice serves (hull ⊆ base interval)
    val inq = raw.filter($"g".isin(3L, 7L, 49L))
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(inq).forall(_.startsWith(rI)))
    assert(inq.orderBy("g").as[(Long, Long)].collect().toSeq ==
      Seq((3L, 30L), (7L, 70L), (49L, 490L)))
    // a WIDER range must decline (g < 80 does not imply g < 50)
    val wide = raw.filter($"g" < 80L).groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(wide).exists(_.startsWith(dirI)),
      "a range wider than the MV slice must not be served")
    assert(wide.count() == 80)
    // the boundary case: g <= 49 implies g < 50 (integer literals are
    // compared as values, not spellings) — but g <= 50 must decline
    val edge = raw.filter($"g" <= 49L).groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(edge).forall(_.startsWith(rI)))
    val over = raw.filter($"g" <= 50L).groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(over).exists(_.startsWith(dirI)))
    assert(over.count() == 51)
  }

  test("spelling bridges: CAST-as-date MV serves date_trunc('DAY') and back") {
    val dirB = Files.createTempDirectory("graft_mv_bridge").toString
    val rB = Files.createTempDirectory("graft_mv_bsum").toString + "/mv"
    val rB2 = Files.createTempDirectory("graft_mv_bsum2").toString + "/mv"
    spark.sql(
      """SELECT timestampadd(HOUR, CAST(id AS INT), timestamp'2024-01-01 00:00:00') AS ts,
        |       id AS x FROM range(100)""".stripMargin)
      .write.mode("overwrite").parquet(dirB)
    val b = spark.read.parquet(dirB)
    // MV stores the DATE spelling; the query buckets in TIMESTAMP
    Mv.register(spark, "spec_mv_bridge", b, Nil, Seq("x"), rB,
      groupExprs = Seq(("d", "CAST(ts AS DATE)")))
    val q = b.groupBy(expr("date_trunc('DAY', ts)").as("day"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("day")
    assert(scannedPaths(q).nonEmpty && scannedPaths(q).forall(_.startsWith(rB)),
      s"date_trunc('DAY') should bridge to the CAST-as-date MV, got ${scannedPaths(q)}")
    val got = q.as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    Mv.clear()
    val plain = b.groupBy(expr("date_trunc('DAY', ts)").as("day"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("day")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got == plain)
    assert(got.map(_._2) == Seq(24L, 24L, 24L, 24L, 4L))
    // the REVERSE direction: MV stores date_trunc('DAY'); the query
    // takes CAST(ts AS DATE)
    Mv.register(spark, "spec_mv_bridge2", b, Nil, Seq("x"), rB2,
      groupExprs = Seq(("d", "date_trunc('DAY', ts)")))
    val q2 = b.groupBy(expr("CAST(ts AS DATE)").as("d"))
      .agg(sum("x").as("sx")).orderBy("d")
    assert(scannedPaths(q2).nonEmpty && scannedPaths(q2).forall(_.startsWith(rB2)),
      s"CAST-as-date should bridge to the date_trunc MV, got ${scannedPaths(q2)}")
    val got2 = q2.as[(java.sql.Date, Long)].collect().toSeq
    Mv.clear()
    val plain2 = b.groupBy(expr("CAST(ts AS DATE)").as("d"))
      .agg(sum("x").as("sx")).orderBy("d")
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(got2 == plain2)
    // a NON-day-aligned spelling must not bridge: HOUR buckets are
    // not 1:1 with dates
    Mv.register(spark, "spec_mv_bridge", b, Nil, Seq("x"), rB,
      groupExprs = Seq(("d", "CAST(ts AS DATE)")))
    val hq = b.groupBy(expr("date_trunc('HOUR', ts)").as("h"))
      .agg(sum("x").as("sx"))
    assert(scannedPaths(hq).exists(_.startsWith(dirB)),
      "HOUR buckets must not be served by a date-grain MV")
    Mv.clear()
    Mv.register(spark, "spec_mv", base, Seq("g1", "g2"), Seq("x"), mvRoot)
  }

  test("fingerprint guard: re-registering after the base changed rebuilds the summary") {
    val dirG = Files.createTempDirectory("graft_mv_fpbase").toString
    val rG = Files.createTempDirectory("graft_mv_fpsum").toString + "/mv"
    Seq(("a", 1L), ("b", 2L)).toDF("g1", "x")
      .write.mode("overwrite").parquet(dirG)
    Mv.register(spark, "spec_mv_fp", spark.read.parquet(dirG),
      Seq("g1"), Seq("x"), rG)
    val v0 = LakeTable.latestVersion(spark, rG).get
    // the base GROWS, then a fresh session-equivalent re-registration
    // happens (same args, same root) — the r16 ADVICE #1 trap: the old
    // code would skip materialization and stamp the STALE summary
    // fresh for the new file set
    Seq(("a", 100L)).toDF("g1", "x").write.mode("append").parquet(dirG)
    Mv.register(spark, "spec_mv_fp", spark.read.parquet(dirG),
      Seq("g1"), Seq("x"), rG)
    assert(LakeTable.latestVersion(spark, rG).get > v0,
      "a changed base fingerprint must rebuild the summary")
    val q = spark.read.parquet(dirG).groupBy("g1")
      .agg(sum("x").as("sx")).orderBy("g1")
    assert(scannedPaths(q).nonEmpty && scannedPaths(q).forall(_.startsWith(rG)))
    assert(q.as[(String, Long)].collect().toSeq ==
      Seq(("a", 101L), ("b", 2L)))
    // idempotent skip: re-registering the UNCHANGED base writes no
    // new version
    val v1 = LakeTable.latestVersion(spark, rG).get
    Mv.register(spark, "spec_mv_fp", spark.read.parquet(dirG),
      Seq("g1"), Seq("x"), rG)
    assert(LakeTable.latestVersion(spark, rG).get == v1)
  }

  test("round-17 registry keys are answered from their MV artifacts") {
    val xw = graft.engine.Registry.queries("mv_rewrite_extra_where")(spark, sfDir)
    val xp = scannedPaths(xw)
    assert(xp.nonEmpty && xp.forall(_.contains("mv_star")),
      s"mv_rewrite_extra_where should scan only the star MV, got $xp")
    val db = graft.engine.Registry.queries("mv_rewrite_datebridge")(spark, sfDir)
    val dp = scannedPaths(db)
    assert(dp.nonEmpty &&
      dp.forall(p => p.contains("mv_orders_day") && p.contains("/mv/")),
      s"mv_rewrite_datebridge should scan only the day MV, got $dp")
    val si = graft.engine.Registry
      .queries("mv_rewrite_star_incremental")(spark, sfDir)
    val sp = scannedPaths(si)
    assert(sp.nonEmpty &&
      sp.forall(p => p.contains("mv_star_inc") && p.contains("/mv/")),
      s"mv_rewrite_star_incremental should scan only the refreshed MV, got $sp")
    val ir = graft.engine.Registry
      .queries("mv_rewrite_implied_range")(spark, sfDir)
    val ip = scannedPaths(ir)
    assert(ip.nonEmpty && ip.forall(_.contains("mv_orders_slice")),
      s"mv_rewrite_implied_range should scan only the slice MV, got $ip")
  }

  test("join-subset: dropping a verified FK-non-filtering dim serves; unsafe drops decline") {
    val fdir = Files.createTempDirectory("graft_mv_ssf").toString
    val ddir = Files.createTempDirectory("graft_mv_ssd").toString
    val rS = Files.createTempDirectory("graft_mv_sssum").toString + "/mv"
    Seq((1L, "r", 10L), (1L, "s", 20L), (2L, "r", 5L), (3L, "s", 7L))
      .toDF("fk", "tag", "x").write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def fact = spark.read.parquet(fdir)
    def dim = spark.read.parquet(ddir)
    def joined = fact.join(dim, col("fk") === col("dk"))
    // group col lives on the FACT side, so the dim is pure plumbing —
    // unique on dk, every fk matches, no filters: droppable
    Mv.register(spark, "spec_mv_sub", joined, Seq("tag"), Seq("x"), rS)
    val q = fact.groupBy("tag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("tag")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(rS)),
      s"fact-only aggregate should serve from the star MV, got $qp")
    assert(q.as[(String, Long, Long)].collect().toSeq ==
      Seq(("r", 2L, 15L), ("s", 2L, 27L)))
    Mv.clear(spark)

    // MUST-DECLINE: the dim carries a filter — dropping it would
    // resurrect the filtered-out fact rows
    Mv.register(spark, "spec_mv_subf",
      fact.join(dim.filter(col("dname") === "a"), col("fk") === col("dk")),
      Seq("tag"), Seq("x"),
      Files.createTempDirectory("graft_mv_ssfsum").toString + "/mv")
    val qf = fact.groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(qf).exists(_.startsWith(fdir)),
      "a filtered dim must not be dropped")
    Mv.clear(spark)

    // MUST-DECLINE: dim NOT unique on the join key (each fact row
    // fans out — dropping the dim would halve the partials)
    val ddup = Files.createTempDirectory("graft_mv_ssdup").toString
    Seq((1L, "a"), (1L, "a2"), (2L, "b"), (3L, "a")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddup)
    val rDup = Files.createTempDirectory("graft_mv_ssdupsum").toString + "/mv"
    def joinedDup = fact.join(spark.read.parquet(ddup),
      col("fk") === col("dk"))
    Mv.register(spark, "spec_mv_subdup", joinedDup, Seq("tag"), Seq("x"), rDup)
    val qd = fact.groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(qd).exists(_.startsWith(fdir)),
      "a non-unique dim must not be dropped")
    // the FULL shape still serves (fan-out is part of the summary)
    val qdFull = joinedDup.groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(qdFull).forall(_.startsWith(rDup)))
    assert(qdFull.orderBy("tag").as[(String, Long)].collect().toSeq ==
      Seq(("r", 25L), ("s", 47L))) // fk=1 rows doubled by the dup dim
    Mv.clear(spark)

    // MUST-DECLINE: a fact key with NO match (the inner join drops
    // that row; the bare fact keeps it)
    val dmiss = Files.createTempDirectory("graft_mv_ssmiss").toString
    Seq((1L, "a"), (2L, "b")).toDF("dk", "dname") // fk=3 unmatched
      .write.mode("overwrite").parquet(dmiss)
    Mv.register(spark, "spec_mv_submiss",
      fact.join(spark.read.parquet(dmiss), col("fk") === col("dk")),
      Seq("tag"), Seq("x"),
      Files.createTempDirectory("graft_mv_ssmisssum").toString + "/mv")
    val qm = fact.groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(qm).exists(_.startsWith(fdir)),
      "an unmatched fact key must block the drop")
    Mv.clear(spark)
  }

  test("a renamed dim join key declines the drop instead of crashing register") {
    val fdir = Files.createTempDirectory("graft_mv_rnf").toString
    val ddir = Files.createTempDirectory("graft_mv_rnd").toString
    val rR = Files.createTempDirectory("graft_mv_rnsum").toString + "/mv"
    Seq((1L, "r", 10L), (2L, "s", 20L)).toDF("fk", "tag", "x")
      .write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    // the join key is an ALIAS of the leaf column — the verification
    // jobs would select a name the files don't have; the leg must
    // decline (register itself must not throw)
    val joined = spark.read.parquet(fdir)
      .join(spark.read.parquet(ddir).withColumnRenamed("dk", "ck"),
        col("fk") === col("ck"))
    Mv.register(spark, "spec_mv_rename", joined, Seq("tag"), Seq("x"), rR)
    val q = spark.read.parquet(fdir).groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(q).exists(_.startsWith(fdir)),
      "a renamed-key dim must not be droppable")
    Mv.clear(spark)
  }

  test("FK verdicts persist: a fresh session re-registering skips the verification jobs") {
    val fdir = Files.createTempDirectory("graft_mv_fkp").toString
    val ddir = Files.createTempDirectory("graft_mv_fkpd").toString
    val rP = Files.createTempDirectory("graft_mv_fkpsum").toString + "/mv"
    Seq((1L, "r", 10L), (2L, "s", 20L)).toDF("fk", "tag", "x")
      .write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def joined = spark.read.parquet(fdir)
      .join(spark.read.parquet(ddir), col("fk") === col("dk"))
    Mv.clearFkMemo()
    val before = Mv.fkVerifyRuns.get()
    Mv.register(spark, "spec_mv_fkp", joined, Seq("tag"), Seq("x"), rP)
    assert(Mv.fkVerifyRuns.get() > before,
      "first registration must actually verify")
    // simulate a fresh session: drop the in-process memo only — the
    // sidecar under the MV root must carry the verdicts
    Mv.clearFkMemo()
    val mid = Mv.fkVerifyRuns.get()
    Mv.register(spark, "spec_mv_fkp", joined, Seq("tag"), Seq("x"), rP)
    assert(Mv.fkVerifyRuns.get() == mid,
      "re-registration must load the persisted verdict, not re-run jobs")
    // …and the subset serve still works off the loaded verdict
    val q = spark.read.parquet(fdir).groupBy("tag").agg(sum("x").as("sx"))
    assert(scannedPaths(q).forall(_.startsWith(rP)),
      "subset serve should work from the persisted verdict")
    Mv.clear(spark)
  }

  test("incremental FK verification: a fact append re-verifies only the delta files") {
    val fdir = Files.createTempDirectory("graft_mv_fki").toString
    val ddir = Files.createTempDirectory("graft_mv_fkid").toString
    val rI = Files.createTempDirectory("graft_mv_fkisum").toString + "/mv"
    Seq((1L, "r", 10L), (2L, "s", 20L)).toDF("fk", "tag", "x")
      .repartition(1).write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def joined = spark.read.parquet(fdir)
      .join(spark.read.parquet(ddir), col("fk") === col("dk"))
    Mv.clearFkMemo()
    val files0 = Mv.fkVerifyFactFiles.get()
    Mv.register(spark, "spec_mv_fki", joined, Seq("tag"), Seq("x"), rI)
    val firstScan = Mv.fkVerifyFactFiles.get() - files0
    assert(firstScan == 1L,
      s"initial verification scans the single fact file, got $firstScan")
    // the fact GROWS by one appended file (keys still all matching);
    // the whole (dim, fact) fingerprint changes, but coverage is a
    // per-FILE fact — re-verification must scan ONLY the new file
    Seq((1L, "r", 100L), (2L, "s", 200L)).toDF("fk", "tag", "x")
      .repartition(1).write.mode("append").parquet(fdir)
    val mid = Mv.fkVerifyFactFiles.get()
    Mv.register(spark, "spec_mv_fki", joined, Seq("tag"), Seq("x"), rI)
    assert(Mv.fkVerifyFactFiles.get() == mid + 1,
      s"append re-verification must scan only the delta file, " +
        s"scanned ${Mv.fkVerifyFactFiles.get() - mid}")
    // …and the subset serve reflects the grown base exactly
    val q = spark.read.parquet(fdir).groupBy("tag")
      .agg(sum("x").as("sx")).orderBy("tag")
    assert(scannedPaths(q).forall(_.startsWith(rI)),
      "subset serve should fire on the re-registered grown base")
    assert(q.as[(String, Long)].collect().toSeq ==
      Seq(("r", 110L), ("s", 220L)))
    // a FRESH session reloads the per-file verdicts from the sidecar:
    // zero files scanned, zero jobs run
    Mv.clearFkMemo()
    val runs = Mv.fkVerifyRuns.get()
    val files = Mv.fkVerifyFactFiles.get()
    Mv.register(spark, "spec_mv_fki", joined, Seq("tag"), Seq("x"), rI)
    assert(Mv.fkVerifyRuns.get() == runs &&
           Mv.fkVerifyFactFiles.get() == files,
      "sidecar-loaded per-file verdicts must skip all verification work")
    Mv.clear(spark)
  }

  test("join-order canonicalization: a reversed join spelling still serves") {
    val fdir = Files.createTempDirectory("graft_mv_jof").toString
    val ddir = Files.createTempDirectory("graft_mv_jod").toString
    val rJ = Files.createTempDirectory("graft_mv_josum").toString + "/mv"
    Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("fk", "x")
      .write.mode("overwrite").parquet(fdir)
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("dk", "dname")
      .write.mode("overwrite").parquet(ddir)
    def fact = spark.read.parquet(fdir)
    def dim = spark.read.parquet(ddir)
    Mv.register(spark, "spec_mv_joinorder",
      fact.join(dim, col("fk") === col("dk")),
      Seq("dname"), Seq("x"), rJ)
    // the REVERSED spelling (dim ⋈ fact) renders to the same flat
    // form — legs and conditions are order-canonical
    val q = dim.join(fact, col("dk") === col("fk"))
      .groupBy("dname").agg(sum("x").as("sx")).orderBy("dname")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(rJ)),
      s"reversed join spelling should serve from the MV, got $qp")
    assert(q.as[(String, Long)].collect().toSeq ==
      Seq(("a", 37L), ("b", 5L)))
    Mv.clear(spark)
  }

  test("join-subset: a 3-table star serves the 2-table sub-join (registry key shape)") {
    val sub = graft.engine.Registry
      .queries("mv_rewrite_join_subset")(spark, sfDir)
    val sp = scannedPaths(sub)
    assert(sp.nonEmpty &&
      sp.forall(p => p.contains("mv_star3")),
      s"mv_rewrite_join_subset should scan only the star MV, got $sp")
    // rule-off ground truth: identical values from the raw sub-join
    val spark2 = spark
    import graft.engine.Tables
    val raw = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"),
           max("o_orderkey").as("key_max"))
      .orderBy("c_mktsegment")
    assert(sub.collect().toSeq == raw.collect().toSeq)
    // the cross-spelling key serves from its slice MV too
    val ic = graft.engine.Registry
      .queries("mv_rewrite_implied_cast")(spark, sfDir)
    val icp = scannedPaths(ic)
    assert(icp.nonEmpty && icp.forall(_.contains("mv_orders_castslice")),
      s"mv_rewrite_implied_cast should scan only the slice MV, got $icp")
    Mv.clear(spark)
  }

  test("cross-spelling implication: CAST(ts AS DATE) bounds serve a ts-sliced MV") {
    val dir = Files.createTempDirectory("graft_mv_cast").toString
    val rC = Files.createTempDirectory("graft_mv_castsum").toString + "/mv"
    // hourly NTZ timestamps over four days starting 1996-06-28
    spark.sql(
      """SELECT timestampadd(HOUR, CAST(id AS INT),
        |       TIMESTAMP_NTZ '1996-06-28 00:00:00') AS ts, id AS x
        |FROM range(96)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    def base = spark.read.parquet(dir)
    def sliced = base.filter(
      col("ts") < expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    Mv.register(spark, "spec_mv_cast", sliced, Seq("ts"), Seq("x"), rC)
    // equal endpoint, compatible strictness: CAST(ts AS DATE) <=
    // '1996-06-30' ⟺ ts < midnight(07-01) — exactly the slice bound
    val q = base.filter(expr("CAST(ts AS DATE) <= DATE '1996-06-30'"))
      .groupBy("ts").agg(sum("x").as("sx")).orderBy("ts")
    assert(scannedPaths(q).nonEmpty &&
           scannedPaths(q).forall(_.startsWith(rC)),
      s"cast bound at the slice boundary should serve, got ${scannedPaths(q)}")
    assert(q.count() == 72 &&
      q.agg(sum("sx")).head.getLong(0) == (0L until 72L).sum)
    // a tighter bound serves too
    val q2 = base.filter(expr("CAST(ts AS DATE) < DATE '1996-06-29'"))
      .groupBy("ts").agg(count(lit(1)).as("n"))
    assert(scannedPaths(q2).forall(_.startsWith(rC)))
    assert(q2.count() == 24)
    // MUST-DECLINE: one day past the slice (midnight(07-02) ⊄ slice)
    val d1 = base.filter(expr("CAST(ts AS DATE) <= DATE '1996-07-01'"))
      .groupBy("ts").agg(sum("x").as("sx"))
    assert(scannedPaths(d1).exists(_.startsWith(dir)),
      "a bound past the slice must decline")
    Mv.clear(spark)
  }

  test("cross-spelling implication: a ts literal over a DATE column rounds to its day bucket") {
    val dir = Files.createTempDirectory("graft_mv_dcol").toString
    val rD = Files.createTempDirectory("graft_mv_dcolsum").toString + "/mv"
    spark.sql(
      """SELECT date_add(DATE '1995-01-01', CAST(id AS INT)) AS d,
        |       id AS x FROM range(60)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    def base = spark.read.parquet(dir)
    def sliced = base.filter(col("d") >= expr("DATE '1995-01-01'"))
    Mv.register(spark, "spec_mv_dcol", sliced, Seq("d"), Seq("x"), rD)
    // the analyzer promotes d to TIMESTAMP against a ts literal; a
    // NON-midnight bound rounds UP to the next day (no date's
    // midnight sits at 18:00), landing inside the slice
    val q = base.filter(col("d") >= expr("TIMESTAMP '1994-12-31 18:00:00'"))
      .groupBy("d").agg(sum("x").as("sx")).orderBy("d")
    assert(scannedPaths(q).nonEmpty &&
           scannedPaths(q).forall(_.startsWith(rD)),
      s"rounded-up ts bound should serve, got ${scannedPaths(q)}")
    assert(q.count() == 60)
    // exact midnight AT the slice bound serves (equal endpoints)
    val q2 = base.filter(
        col("d") >= expr("TIMESTAMP '1995-01-01 00:00:00'"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    assert(scannedPaths(q2).forall(_.startsWith(rD)))
    // MUST-DECLINE: a midnight strictly before the slice start
    val d1 = base.filter(
        col("d") >= expr("TIMESTAMP '1994-12-31 00:00:00'"))
      .groupBy("d").agg(sum("x").as("sx"))
    assert(scannedPaths(d1).exists(_.startsWith(dir)),
      "a bound before the slice must decline")
    Mv.clear(spark)
  }

  test("integral AVG rolls up exactly; fractional AVG still declines") {
    // earlier tests Mv.clear()ed the session — re-arm the base MV
    // (idempotent: the fingerprint matches, so no rebuild)
    Mv.register(spark, "spec_mv", base, Seq("g1", "g2"), Seq("x"), mvRoot)
    val q = base.groupBy("g1")
      .agg(avg("x").as("ax"), count(lit(1)).as("n")).orderBy("g1")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(mvRoot)),
      s"integral avg should serve from the MV, got $qp")
    assert(q.as[(String, Double, Long)].collect().toSeq ==
      Seq(("a", 35.0 / 3, 3L), ("b", 36.0, 3L)))
    // SQL-text spelling too, mixed with other rollables
    base.createOrReplaceTempView("mv_avg_v")
    val q2 = spark.sql(
      "SELECT g1, avg(x) AS ax, sum(x) AS sx FROM mv_avg_v GROUP BY g1")
    assert(scannedPaths(q2).forall(_.startsWith(mvRoot)))
    // MUST-DECLINE: fractional AVG (order-sensitive addition)
    val ddir = Files.createTempDirectory("graft_mv_davg").toString
    val rA = Files.createTempDirectory("graft_mv_davgsum").toString + "/mv"
    Seq(("a", 1.5), ("a", 2.5), ("b", 3.25)).toDF("g", "v")
      .write.mode("overwrite").parquet(ddir)
    val dbase = spark.read.parquet(ddir)
    Mv.register(spark, "spec_mv_davg", dbase, Seq("g"), Seq("v"), rA)
    val qd = dbase.groupBy("g").agg(avg("v").as("av"))
    assert(scannedPaths(qd).exists(_.startsWith(ddir)),
      "double avg must decline (sum/count partials still serve sum/count)")
    // …while sum/count over the same double column DO serve
    val qs = dbase.groupBy("g").agg(sum("v").as("sv"),
      count(col("v")).as("nv"))
    assert(scannedPaths(qs).forall(_.startsWith(rA)))
  }

  test("disjunctive containment: OR / IN query filters serve against sliced bases") {
    val odir = Files.createTempDirectory("graft_mv_or").toString
    val rO = Files.createTempDirectory("graft_mv_orsum").toString + "/mv"
    Seq(("a", 10L, 1L), ("a", 110L, 2L), ("b", 20L, 3L), ("b", 220L, 4L),
        ("c", 30L, 5L), ("d", 999L, 6L), ("d", 40L, 7L))
      .toDF("g", "k", "x").write.mode("overwrite").parquet(odir)
    val base = spark.read.parquet(odir)
    // base sliced by an IN-list on the group column
    def sliced = base.filter($"g".isin("a", "b", "c"))
    Mv.register(spark, "spec_mv_or", sliced, Seq("g", "k"), Seq("x"), rO)
    // OR of equalities: each branch ∈ the base IN-set → serve, the OR
    // re-applied over the summary
    val q = base.filter($"g" === "a" || $"g" === "b")
      .groupBy("g").agg(sum("x").as("sx")).orderBy("g")
    assert(scannedPaths(q).nonEmpty &&
           scannedPaths(q).forall(_.startsWith(rO)),
      s"OR-of-equalities inside the base IN should serve, got ${scannedPaths(q)}")
    assert(q.as[(String, Long)].collect().toSeq ==
      Seq(("a", 3L), ("b", 7L)))
    // a narrower IN serves too
    val q2 = base.filter($"g".isin("b", "c"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    assert(scannedPaths(q2).forall(_.startsWith(rO)))
    assert(q2.orderBy("g").as[(String, Long)].collect().toSeq ==
      Seq(("b", 2L), ("c", 1L)))
    // MUST-DECLINE: a branch OUTSIDE the base IN-set ('d' rows are
    // not in the summary — serving would silently drop them)
    val d1 = base.filter($"g" === "a" || $"g" === "d")
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(d1).exists(_.startsWith(odir)),
      "an OR branch outside the slice must decline")
    Mv.clear(spark)

    // range-sliced base, OR of sub-ranges on another group column
    val rR = Files.createTempDirectory("graft_mv_orrange").toString + "/mv"
    def rsliced = base.filter($"k" < 500L)
    Mv.register(spark, "spec_mv_orrange", rsliced, Seq("g", "k"),
      Seq("x"), rR)
    val q3 = base.filter($"k" < 50L || ($"k" >= 100L && $"k" < 300L))
      .groupBy("g").agg(sum("x").as("sx")).orderBy("g")
    assert(scannedPaths(q3).nonEmpty &&
           scannedPaths(q3).forall(_.startsWith(rR)),
      s"OR of sub-ranges inside the slice should serve, got ${scannedPaths(q3)}")
    assert(q3.as[(String, Long)].collect().toSeq ==
      Seq(("a", 3L), ("b", 7L), ("c", 5L), ("d", 7L)))
    // MUST-DECLINE: one branch exceeds the slice
    val d2 = base.filter($"k" < 50L || $"k" >= 400L)
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(d2).exists(_.startsWith(odir)),
      "an OR branch past the slice must decline")
    // MUST-DECLINE: an OR branch on an AGG column can never re-apply
    // over the summary (x is aggregated away)
    val d3 = base.filter($"g" === "a" || $"x" > 3L)
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(d3).exists(_.startsWith(odir)),
      "an OR branch on an agg column must decline")
    Mv.clear(spark)
  }

  test("DECIMAL AVG rolls up bit-exactly, including boundary quotients and capped precision") {
    val ddir = Files.createTempDirectory("graft_mv_decavg").toString
    val rD = Files.createTempDirectory("graft_mv_decavgsum").toString + "/mv"
    // quotients chosen non-terminating (30.02/3) and half-way-ish
    // (0.125/2 = 0.0625) so the scale-6 rounding path is exercised;
    // plus a NULL for the cntn leg and a negative value
    Seq(("a", "10.00"), ("a", "10.01"), ("a", "10.01"),
        ("b", "0.12"), ("b", "0.01"), ("b", null),
        ("c", "-7.77"))
      .toDF("g", "raw")
      .select($"g", $"raw".cast("decimal(12,2)").as("v"))
      .write.mode("overwrite").parquet(ddir)
    val dbase = spark.read.parquet(ddir)
    Mv.register(spark, "spec_mv_decavg", dbase, Seq("g"), Seq("v"), rD)
    val q = dbase.groupBy("g").agg(avg("v").as("av"), sum("v").as("sv"))
      .orderBy("g")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(rD)),
      s"decimal avg should serve from the MV, got $qp")
    val served = q.collect().toSeq
    Mv.clear(spark)
    val direct = dbase.groupBy("g").agg(avg("v").as("av"), sum("v").as("sv"))
      .orderBy("g").collect().toSeq
    assert(served == direct,
      s"served decimal avg must be BIT-equal to direct: $served vs $direct")
    // result type is Average's own (p+4, s+4)
    assert(q.schema("av").dataType.toString == "DecimalType(16,6)")
    // precision-capped edge: a DECIMAL(38,10) column (sum partial and
    // Average's internal sum both cap at precision 38) still serves
    // and still matches the direct aggregate exactly
    val hdir = Files.createTempDirectory("graft_mv_decavg38").toString
    val rH = Files.createTempDirectory("graft_mv_decavg38sum").toString + "/mv"
    // integer part stays ≤24 digits so the (38,14) AVG result type
    // can represent the mean — larger and the DIRECT aggregate itself
    // raises NUMERIC_VALUE_OUT_OF_RANGE under ANSI
    Seq(("a", "123456789012345678901234.0123456789"),
        ("a", "1.0000000001"), ("b", "3.33"))
      .toDF("g", "raw")
      .select($"g", $"raw".cast("decimal(38,10)").as("v"))
      .write.mode("overwrite").parquet(hdir)
    val hbase = spark.read.parquet(hdir)
    Mv.register(spark, "spec_mv_decavg38", hbase, Seq("g"), Seq("v"), rH)
    val qh = hbase.groupBy("g").agg(avg("v").as("av")).orderBy("g")
    assert(scannedPaths(qh).forall(_.startsWith(rH)))
    val servedH = qh.collect().toSeq
    Mv.clear(spark)
    val directH = hbase.groupBy("g").agg(avg("v").as("av"))
      .orderBy("g").collect().toSeq
    assert(servedH == directH)
  }

  test("round-18 registry key mv_rewrite_avg_int is answered from its MV artifact") {
    val q = graft.engine.Registry.queries("mv_rewrite_avg_int")(spark, sfDir)
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.contains("mv_orders_avg")),
      s"mv_rewrite_avg_int should scan only the avg MV, got $qp")
    // rule-off ground truth
    val raw = graft.engine.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), avg("o_orderkey").as("key_avg"),
           max("o_orderkey").as("key_max"))
      .orderBy("status")
    assert(q.collect().toSeq == raw.collect().toSeq)
    Mv.clear(spark)
  }

  test("round-19 registry key mv_rewrite_or_filters is answered from its MV artifact") {
    val q = graft.engine.Registry.queries("mv_rewrite_or_filters")(spark, sfDir)
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.contains("mv_orders_prio")),
      s"mv_rewrite_or_filters should scan only its MV artifact, got $qp")
    val served = q.collect().toSeq
    Mv.clear(spark)
    val raw = graft.engine.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH")
      .groupBy(col("o_orderpriority").as("prio"),
               col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), sum("o_custkey").as("cust_sum"),
           max("o_custkey").as("cust_max"))
      .orderBy("prio", "status").collect().toSeq
    assert(served == raw)
  }

  test("round-19 registry key mv_rewrite_avg_decimal is answered from its MV artifact") {
    val q = graft.engine.Registry.queries("mv_rewrite_avg_decimal")(spark, sfDir)
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(p =>
        p.contains("mv_orders_decavg") && p.contains("/mv") &&
        !p.contains("/base")),
      s"mv_rewrite_avg_decimal should scan only the SUMMARY, got $qp")
    val served = q.collect().toSeq
    // rule-off ground truth: same derivation recomputed raw
    Mv.clear(spark)
    val raw = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderstatus").as("status"),
        expr("CAST(CONCAT(CAST(o_orderkey % 1000 AS STRING), '.', " +
             "LPAD(CAST(o_orderkey % 100 AS STRING), 2, '0')) " +
             "AS DECIMAL(12,2))").as("v"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
           (avg("v") * lit(1000000)).cast("long").as("avg_micros"),
           (sum("v") * lit(100)).cast("long").as("sum_cents"),
           (max("v") * lit(100)).cast("long").as("max_cents"))
      .orderBy("status").collect().toSeq
    assert(served == raw)
  }

  test("aggregates over GROUP columns serve: distinct count, min/max, null-aware count") {
    val gdir = Files.createTempDirectory("graft_mv_gagg").toString
    val rG = Files.createTempDirectory("graft_mv_gaggsum").toString + "/mv"
    Seq(("a", java.lang.Long.valueOf(1L), 10L),
        ("a", java.lang.Long.valueOf(1L), 20L),
        ("a", java.lang.Long.valueOf(2L), 5L),
        ("a", null.asInstanceOf[java.lang.Long], 9L),
        ("b", java.lang.Long.valueOf(2L), 7L),
        ("b", java.lang.Long.valueOf(3L), 1L))
      .toDF("g1", "g2", "x").write.mode("overwrite").parquet(gdir)
    val gbase = spark.read.parquet(gdir)
    Mv.register(spark, "spec_mv_gagg", gbase, Seq("g1", "g2"), Seq("x"), rG)
    val q = gbase.groupBy("g1").agg(
      countDistinct("g2").as("nd"), count(col("g2")).as("nn"),
      min("g2").as("mn"), max("g2").as("mx"), sum("x").as("sx"))
      .orderBy("g1")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(rG)),
      s"group-column aggregates should serve from the MV, got $qp")
    // nd: distinct non-null g2 per g1; nn: null-aware count weighs by
    // the cnt partial (the 'a'/null combination contributes 0, the
    // 'a'/1 combination contributes its TWO raw rows)
    assert(q.as[(String, Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq(("a", 2L, 3L, 1L, 2L, 44L), ("b", 2L, 2L, 2L, 3L, 8L)))
    // SUM of the integral group column: cnt-weighted, null-skipping
    val qs = gbase.groupBy("g1").agg(sum("g2").as("sg"))
    assert(scannedPaths(qs).forall(_.startsWith(rG)))
    // a: 1+1+2 (null skipped) = 4; b: 2+3 = 5
    assert(qs.orderBy("g1").as[(String, Long)].collect().toSeq ==
      Seq(("a", 4L), ("b", 5L)))
    // count(DISTINCT agg-column) still declines — not derivable
    val d = gbase.groupBy("g1").agg(countDistinct("x").as("ndx"))
    assert(scannedPaths(d).exists(_.startsWith(gdir)))
    Mv.clear(spark)
  }

  test("LEFT-join star MV serves on exact form; outer legs never subset-drop") {
    val fdir = Files.createTempDirectory("graft_mv_ljf").toString
    val ddir = Files.createTempDirectory("graft_mv_ljd").toString
    val rL = Files.createTempDirectory("graft_mv_ljsum").toString + "/mv"
    Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 2L, 3L), ("b", 3L, 4L),
        ("c", 9L, 5L))
      .toDF("g", "k", "x").write.mode("overwrite").parquet(fdir)
    // dim misses the odd keys — the left join's null-extension is
    // what distinguishes it from inner (rows k=1,3,9 survive with dv
    // NULL)
    Seq((0L, "even0"), (2L, "even2"))
      .toDF("k2", "dv").write.mode("overwrite").parquet(ddir)
    val fact = spark.read.parquet(fdir)
    val dim = spark.read.parquet(ddir)
    def base = fact.join(dim, col("k") === col("k2"), "left")
    Mv.register(spark, "spec_mv_lj", base, Seq("g", "dv"), Seq("x"), rL)
    val q = base.groupBy("g", "dv")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("g", "dv")
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(_.startsWith(rL)),
      s"the LEFT-join query should serve from the MV, got $qp")
    val served = q.collect().toSeq
    // rule-off ground truth (null-extended rows included)
    Mv.clear(spark)
    val direct = fact.join(dim, col("k") === col("k2"), "left")
      .groupBy("g", "dv")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).orderBy("g", "dv")
      .collect().toSeq
    assert(served == direct, s"$served vs $direct")
    assert(served.exists(_.isNullAt(1)),
      "the fixture must exercise null-extension or the test proves nothing")
    Mv.register(spark, "spec_mv_lj", base, Seq("g", "dv"), Seq("x"), rL)
    // MUST-DECLINE: the INNER spelling of the same join is a
    // different form (it drops the null-extended rows)
    val d1 = fact.join(dim, col("k") === col("k2"))
      .groupBy("g", "dv").agg(sum("x").as("sx"))
    assert(scannedPaths(d1).exists(_.startsWith(fdir)),
      "an inner spelling must decline against a left-join MV")
    // MUST-DECLINE: dropping the LEFT-joined dim is never a valid
    // subset serve (outer legs are excluded from subset proofs)
    val d2 = fact.groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(d2).exists(_.startsWith(fdir)),
      "dropping an outer dim must decline")
    // a null-rejecting filter on the dim side above the join becomes
    // an INNER join in the optimizer — also a different form, declines
    val d3 = base.filter(col("dv") === "even0")
      .groupBy("g").agg(sum("x").as("sx"))
    assert(scannedPaths(d3).exists(_.startsWith(fdir)))
    Mv.clear(spark)
  }

  test("round-19 registry key mv_rewrite_left_star is answered from its MV artifact") {
    val q = graft.engine.Registry.queries("mv_rewrite_left_star")(spark, sfDir)
    val qp = scannedPaths(q)
    assert(qp.nonEmpty && qp.forall(p =>
        p.contains("mv_orders_leftstar") && p.contains("/mv")),
      s"mv_rewrite_left_star should scan only the SUMMARY, got $qp")
    val served = q.collect().toSeq
    Mv.clear(spark)
    val raw = graft.engine.Registry.queries("mv_rewrite_left_star")(
      spark, sfDir)
    Mv.clear(spark) // rule-off for the ground-truth collect
    assert(served == raw.collect().toSeq)
    // the fixture exercises null-extension (odd custkeys unmatched)
    assert(served.exists(_.isNullAt(1)))
    Mv.clear(spark)
  }

  test("ANSI serving contract: overflowing group-column SUM raises from BOTH spellings") {
    // r18 ADVICE #5, resolved as a contract PIN rather than a gate:
    // the served g×cnt spelling is built with the session's eval mode,
    // so under ansi.enabled (Spark 4's default) a guaranteed overflow
    // (same-sign total past 2^63) raises from the rollup exactly as it
    // does from the direct aggregate — no silent wrapped value exists
    // in either mode. (Integral AVG needs no pin: Spark's Average
    // sums as DOUBLE, so neither spelling can raise.)
    assume(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val odir = Files.createTempDirectory("graft_mv_ovf").toString
    val rO = Files.createTempDirectory("graft_mv_ovfsum").toString + "/mv"
    Seq(("a", Long.MaxValue, 1L), ("a", Long.MaxValue, 2L),
        ("b", 5L, 3L))
      .toDF("g1", "g2", "x").write.mode("overwrite").parquet(odir)
    val obase = spark.read.parquet(odir)
    Mv.register(spark, "spec_mv_ovf", obase, Seq("g1", "g2"), Seq("x"), rO)
    val q = obase.groupBy("g1").agg(sum("g2").as("sg"))
    // the serve FIRES (the error contract is what's under test, not a
    // decline) …
    assert(scannedPaths(q).forall(_.startsWith(rO)))
    // … and raises on overflow exactly like the direct spelling
    val served = intercept[Exception](q.collect())
    assert(served.toString.contains("ARITHMETIC_OVERFLOW") ||
           Option(served.getMessage).exists(_.contains("overflow")),
      s"served overflow should raise ARITHMETIC_OVERFLOW, got $served")
    Mv.clear(spark)
    val direct = intercept[Exception](
      obase.groupBy("g1").agg(sum("g2").as("sg")).collect())
    assert(direct.toString.contains("ARITHMETIC_OVERFLOW") ||
           Option(direct.getMessage).exists(_.contains("overflow")))
  }

  test("MV summary itself is sane") {
    val mv = LakeTable.read(spark, mvRoot)
    assert(mv.count() == 4)
    assert(mv.columns.toSet ==
      Set("g1", "g2", "cnt", "sum_x", "min_x", "max_x", "cntn_x"))
  }
}
