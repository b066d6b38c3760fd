package graft

import java.nio.file.Files

import graft.engine.{LakeStats, LakeTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Commit-log statistics reach Catalyst (r17 verdict #2): lake
  * relations report logged row counts through a synthetic catalog
  * table, and with CBO enabled (AQE off — this is the BEFORE-runtime
  * half of the story) a three-lake-table join REORDERS by
  * cardinality instead of executing as written. Legacy logs without
  * row counts decline cleanly (no stats, stock behavior).
  */
class LakeStatsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withCboSession[A](f: SparkSession => A): A = {
    val shared = SparkTestBase.session // pin the JVM's SparkContext
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().master("local[2]")
      .withExtensions(new graft.engine.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("a 3-lake-table join reorders by logged row counts with AQE disabled") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo").toString
      LakeTable.append((0L until 100000L).map(k => (k, k % 97, k % 13))
        .toDF("a_k", "a_f1", "a_f2"), s"$dir/big")
      LakeTable.append((0L until 97L).map(k => (k, s"m$k"))
        .toDF("m_k", "m_v"), s"$dir/mid")
      LakeTable.append((0L until 13L).map(k => (k, s"s$k"))
        .toDF("s_k", "s_v"), s"$dir/small")
      val big = LakeTable.read(s, s"$dir/big")
      val mid = LakeTable.read(s, s"$dir/mid")
      val small = LakeTable.read(s, s"$dir/small")
      // spelled WORST-first: big ⋈ mid, then ⋈ small
      val q = big.join(mid, col("a_f1") === col("m_k"))
        .join(small, col("a_f2") === col("s_k"))
        .groupBy("s_v").agg(count(lit(1)).as("n"))
      // every lake relation surfaced its logged row count
      val rowCounts = q.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.stats.rowCount.map(_.toLong)
      }
      assert(rowCounts.flatten.sorted == Seq(13L, 97L, 100000L),
        s"logged row counts should reach Catalyst, got $rowCounts")
      // …and CostBasedJoinReorder used them: the INNERMOST join pairs
      // the fact with a dimension other than the spelled-first `mid`
      // (cardinality says join `small` first)
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size == 2)
      val innermost = joins.last
      val innerCols = innermost.output.map(_.name).toSet
      assert(innerCols.contains("s_k") && !innerCols.contains("m_k"),
        s"expected the 13-row table joined first, innermost join " +
          s"outputs $innerCols")
      // values are unchanged by the reorder
      assert(q.orderBy("s_v").as[(String, Long)].collect().toSeq ==
        (0L until 13L).map(k => (s"s$k", 100000L / 13 +
          (if (k < 100000L % 13) 1 else 0))).sortBy(_._1))
    }
  }

  test("legacy lake logs fall back to footer counts; non-parquet declines") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo_legacy").toString
      // hand-written pre-r18 commit: a data dir and a bare add record
      (0L until 50L).map(k => (k, k % 5)).toDF("k", "g")
        .write.parquet(s"$dir/t/data-v0000000000-legacy")
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/t/_graft_log"))
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/t/_graft_log/0000000000.json"),
        """{"version":0,"add":["data-v0000000000-legacy"]}""")
      LakeStats.clearCache()
      val t = LakeTable.read(s, s"$dir/t")
      val lrs = t.groupBy("g").agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr
        }
      // the log never counted the dir, but the file set is small and
      // parquet — the raw footer fallback supplies the TRUE count
      assert(lrs.nonEmpty &&
             lrs.forall(_.stats.rowCount.contains(BigInt(50))),
        s"legacy lake table should footer-count, got " +
          s"${lrs.map(_.stats.rowCount)}")
      assert(t.count() == 50L)
      // a non-parquet relation has no footers to count — no stats
      (0L until 20L).map(k => (k, s"j$k")).toDF("k", "v")
        .write.json(s"$dir/j")
      val j = s.read.json(s"$dir/j")
      val jlrs = j.groupBy("k").agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr
        }
      assert(jlrs.nonEmpty && jlrs.forall(_.stats.rowCount.isEmpty),
        "a non-parquet relation must decline")
    }
  }

  test("mixed join: a raw parquet dim reorders against lake tables via footer counts") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo_mixed").toString
      LakeTable.append((0L until 50000L).map(k => (k, k % 7))
        .toDF("b_k", "b_f"), s"$dir/big")
      LakeTable.append((0L until 400L).map(k => (k, k % 7))
        .toDF("m_k", "m_f"), s"$dir/mid")
      // the small dim is a RAW parquet directory, not a lake table
      (0L until 7L).map(k => (k, s"s$k")).toDF("s_k", "s_v")
        .write.parquet(s"$dir/rawsmall")
      val big = LakeTable.read(s, s"$dir/big")
      val mid = LakeTable.read(s, s"$dir/mid")
      val small = s.read.parquet(s"$dir/rawsmall")
      val q = big.join(mid, col("b_f") === col("m_f"))
        .join(small, col("b_f") === col("s_k"))
        .groupBy("s_v").agg(count(lit(1)).as("n"))
      val rowCounts = q.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.stats.rowCount.map(_.toLong)
      }
      assert(rowCounts.flatten.sorted == Seq(7L, 400L, 50000L),
        s"all three relations need counts for CBO, got $rowCounts")
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size == 2)
      val innerCols = joins.last.output.map(_.name).toSet
      assert(innerCols.contains("s_k") && !innerCols.contains("m_k"),
        s"expected the raw 7-row dim joined first, got $innerCols")
    }
  }

  test("column stats: a selective filter on the BIG table flips the plan to broadcast (AQE off)") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo_cols").toString
      // big: 200k rows, `cat` has 100 distinct values → `cat = 7`
      // keeps ~1%; mid: 30k rows, comfortably OVER the broadcast
      // threshold below
      LakeTable.append((0L until 200000L).map(k => (k % 30000L, k % 100L))
        .toDF("b_k", "b_cat"), s"$dir/big")
      LakeTable.append((0L until 30000L).map(k => (k, s"name_$k"))
        .toDF("m_k", "m_v"), s"$dir/mid")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      def q = LakeTable.read(s, s"$dir/big").filter(col("b_cat") === 7L)
        .join(LakeTable.read(s, s"$dir/mid"), col("b_k") === col("m_k"))
        .groupBy("m_v").agg(count(lit(1)).as("n"))
      // BEFORE analyze: row counts exist but no column stats — the
      // filter's selectivity defaults to 1, both sides estimate over
      // the threshold, and the join sort-merges
      LakeStats.clearCache()
      val before = q.queryExecution.executedPlan
      assert(before.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.isDefined,
        s"without column stats the join should sort-merge:\n$before")
      // analyze both tables → NDV reaches the estimator → the filtered
      // big side estimates ~1% and BROADCASTS
      assert(LakeStats.analyze(s, s"$dir/big") == 1)
      assert(LakeStats.analyze(s, s"$dir/mid") == 1)
      LakeStats.clearCache()
      val filterRows = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.stats.rowCount.map(_.toLong)
      }.flatten
      // two Filters exist (the inferred isnotnull on mid keeps its
      // full 30000) — the selective one must estimate ~1% of 200000
      assert(filterRows.exists(n => n > 500 && n < 8000),
        s"FilterEstimation should see ~2000 of 200000 rows, got $filterRows")
      val after = q.queryExecution.executedPlan
      assert(after.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.isDefined,
        s"with column stats the filtered big side should broadcast:\n$after")
      // the estimator changed the PLAN, never the ANSWER
      assert(q.agg(sum("n")).head.getLong(0) == 2000L)
      // merged column stats surfaced on the relation: NDV ≈ 100 for
      // cat (HLL p=12 is ~1.6% stderr), exact null count 0, min/max
      val cs = q.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation
            if lr.schema.fieldNames.contains("b_cat") =>
          lr.catalogTable.flatMap(_.stats).map(_.colStats)
      }.flatten.headOption.getOrElse(Map.empty)
      val cat = cs.get("b_cat")
      assert(cat.exists(_.distinctCount.exists(n => n >= 95 && n <= 105)),
        s"b_cat NDV should be ~100, got ${cat.map(_.distinctCount)}")
      assert(cat.exists(_.nullCount.contains(BigInt(0))))
      assert(cat.exists(c => c.min.contains("0") && c.max.contains("99")))
    }
  }

  test("analyze is incremental per directory and its stats fold through checkpoints") {
    val s = SparkTestBase.session
    import s.implicits._
    val root = Files.createTempDirectory("graft_cbo_an").toString
    LakeTable.append((0L until 1000L).map(k => (k, k % 10L)).toDF("k", "g"),
      root)
    assert(LakeStats.analyze(s, root) == 1)
    assert(LakeStats.analyze(s, root) == 0) // idempotent: nothing new
    // an append creates ONE unanalyzed dir; re-analyze touches only it
    LakeTable.append((1000L until 1500L).map(k => (k, k % 10L))
      .toDF("k", "g"), root)
    assert(LakeStats.analyze(s, root) == 1)
    LakeTable.checkpoint(s, root)
    LakeTable.append((1500L until 1600L).map(k => (k, 77L)).toDF("k", "g"),
      root)
    assert(LakeStats.analyze(s, root) == 1)
    val st = LakeTable.replayState(s, root, None)
    assert(st.active.forall(st.colMeta.contains),
      "colMeta must fold across the checkpoint for every active dir")
    // merged NDV over all three dirs: k is unique (≈1600), g has 11
    // distinct values (10 + the 77 wave)
    LakeStats.clearCache()
    val df = LakeTable.read(s, root)
    // drive statsFor directly (the shared session has CBO off)
    val lr = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l }.head
    val ct = LakeStats.statsFor(s, lr)
    assert(ct.exists(_.stats.exists(_.rowCount.contains(BigInt(1600)))))
    val cs = ct.flatMap(_.stats).map(_.colStats).getOrElse(Map.empty)
    assert(cs.get("k").exists(_.distinctCount.exists(n =>
      n >= 1550 && n <= 1650)), s"k NDV ≈ 1600, got ${cs.get("k")}")
    assert(cs.get("g").exists(_.distinctCount.exists(n =>
      n >= 10 && n <= 12)), s"g NDV ≈ 11, got ${cs.get("g")}")
    assert(cs.get("g").exists(c => c.min.contains("0") &&
      c.max.contains("77")))
    // OPTIMIZE rewrites directories → the new dirs carry row counts
    // (writeCommit footers) but no column meta until re-ANALYZE;
    // serving declines cleanly in between, and the re-analyze is
    // again incremental (only the rewritten dirs scan)
    LakeTable.rewriteClustered(LakeTable.read(s, root), root, "k", 2)
    val st2 = LakeTable.replayState(s, root, None)
    assert(st2.active.forall(d => !st2.colMeta.contains(d)),
      "rewritten dirs must start without column meta")
    assert(LakeStats.analyze(s, root) == st2.active.size)
    val st3 = LakeTable.replayState(s, root, None)
    assert(st3.active.forall(st3.colMeta.contains))
  }

  test("join-key NDV reaches JoinEstimation: the joined output cardinality is key-bounded") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo_jndv").toString
      // fact: 50k rows over 50 distinct join keys; dim: 50 rows keyed
      // uniquely — with NDV on both key columns, JoinEstimation bounds
      // the join output near the fact size instead of a naive product
      LakeTable.append((0L until 50000L).map(k => (k % 50L, k))
        .toDF("j_k", "payload"), s"$dir/fact")
      LakeTable.append((0L until 50L).map(k => (k, s"d$k"))
        .toDF("d_k", "d_v"), s"$dir/dim")
      LakeStats.analyze(s, s"$dir/fact")
      LakeStats.analyze(s, s"$dir/dim")
      LakeStats.clearCache()
      val q = LakeTable.read(s, s"$dir/fact")
        .join(LakeTable.read(s, s"$dir/dim"), col("j_k") === col("d_k"))
      val joinRows = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.stats.rowCount.map(_.toLong)
      }.flatten
      assert(joinRows.nonEmpty &&
             joinRows.forall(n => n >= 40000 && n <= 70000),
        s"join estimate should land near the 50000-row fact, got $joinRows")
    }
  }

  test("raw parquet above the driver cap footer-counts in ONE distributed job") {
    withCboSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_cbo_bigraw").toString
      // 40 files ≫ a test-shrunk driver cap of 8 → the distributed
      // path must engage (one job, partial sums reduced on the
      // driver — the driver never holds more than the path list)
      (0L until 4000L).map(k => (k, k % 7L)).toDF("k", "f")
        .repartition(40).write.parquet(s"$dir/bigraw")
      LakeTable.append((0L until 7L).map(k => (k, s"v$k"))
        .toDF("d_k", "d_v"), s"$dir/dim")
      val saved = LakeStats.rawFooterDriverCap
      LakeStats.rawFooterDriverCap = 8
      LakeStats.clearCache()
      val jobs0 = LakeStats.rawDistributedJobs.get()
      try {
        val q = s.read.parquet(s"$dir/bigraw")
          .join(LakeTable.read(s, s"$dir/dim"), col("f") === col("d_k"))
          .groupBy("d_v").agg(count(lit(1)).as("n"))
        val rowCounts = q.queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr.stats.rowCount.map(_.toLong)
        }
        assert(rowCounts.flatten.sorted == Seq(7L, 4000L),
          s"the >cap raw table must still report its count, got $rowCounts")
        assert(LakeStats.rawDistributedJobs.get() == jobs0 + 1,
          "the distributed footer-count path must have run exactly once")
        // second plan hits the fingerprint cache — no second job
        q.queryExecution.optimizedPlan
        assert(LakeStats.rawDistributedJobs.get() == jobs0 + 1)
        assert(q.agg(sum("n")).head.getLong(0) == 4000L)
      } finally LakeStats.rawFooterDriverCap = saved
    }
  }

  test("ANALYZE t COMPUTE STATISTICS writes column stats through the SQL front door") {
    val s = SparkTestBase.session
    import s.implicits._
    val sql = new graft.engine.LakeSql.Session(s,
      Files.createTempDirectory("graft_lakesql_an").toString)
    (0L until 500L).map(k => (k, k % 5L)).toDF("k", "g")
      .createOrReplaceTempView("lakestats_src")
    sql.exec("CREATE TABLE st AS SELECT k, g FROM lakestats_src")
    val rep = sql.exec("ANALYZE st COMPUTE STATISTICS").head()
    assert(rep.getAs[String]("verb") == "analyze")
    assert(rep.getAs[Int]("rewritten_dirs") == 1) // one dir analyzed
    // idempotent: nothing new to analyze
    assert(sql.exec("ANALYZE st COMPUTE STATISTICS").head()
      .getAs[Int]("rewritten_dirs") == 0)
    // the read-verb ANALYZE still reports, and the log now carries meta
    val st = LakeTable.replayState(s,
      s"${sql.scratchRoot}/st", None)
    assert(st.active.forall(st.colMeta.contains))
    assert(st.colMeta.values.head.keySet == Set("k", "g"))
  }

  test("row counts fold through commits and checkpoints") {
    val s = SparkTestBase.session
    import s.implicits._
    val root = Files.createTempDirectory("graft_cbo_fold").toString
    LakeTable.append((0L until 10L).toDF("k"), root)
    LakeTable.append((10L until 25L).toDF("k"), root)
    LakeTable.checkpoint(s, root)
    LakeTable.append((25L until 27L).toDF("k"), root)
    val st = LakeTable.replayState(s, root, None)
    assert(st.rowCounts.values.toSeq.sorted == Seq(2L, 10L, 15L),
      s"footer counts should fold across checkpoint, got ${st.rowCounts}")
    assert(st.active.forall(st.rowCounts.contains))
  }
}
