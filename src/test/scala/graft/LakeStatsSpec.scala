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
