package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions resolves the custom functions in a session built
  * with the extensions hook and zero programmatic registration — the
  * cluster deployment path (spark.sql.extensions=graft.engine.
  * GraftExtensions). The session shares the JVM's SparkContext with
  * the other suites (one context per JVM), so it is swapped in and
  * out rather than stopped.
  */
class ExtensionsSpec extends AnyFunSuite {
  test("custom functions resolve through SparkSessionExtensions") {
    val shared = SparkTestBase.session // force shared session first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.engine.GraftExtensions())
      .getOrCreate()
    try {
      assert(s ne shared) // genuinely a fresh session state
      val cos = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))"""
          .stripMargin).collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      // the k-way Morton code resolves too (bit 0 of x at position 0,
      // bit 0 of y at 1, bit 0 of z at 2 for a 3-ary interleave)
      val z = s.sql("SELECT zordern(1L, 0L, 1L)").collect()(0).getLong(0)
      assert(z == 5L, s"zordern(1,0,1) gave $z")
      val top = s.sql(
        """SELECT g, topk_by_score(s, id, 2) FROM VALUES
          |  (1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.7D, 12L)
          |  AS t(g, s, id) GROUP BY g""".stripMargin).collect()(0)
      val pairs = top.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(pairs == Seq((0.9, 11L), (0.7, 12L)))
      // narrower numerics (float score, int id) must implicit-cast at
      // analysis instead of ClassCastException-ing at execution
      val topCast = s.sql(
        """SELECT g, topk_by_score(s, id, 1) FROM VALUES
          |  (1, CAST(0.5 AS FLOAT), 10), (1, CAST(0.9 AS FLOAT), 11)
          |  AS t(g, s, id) GROUP BY g""".stripMargin).collect()(0)
      val castPairs = topCast.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(castPairs.map(_._2) == Seq(11L))
      // round-5 surface: NFC normalization + the quantile-sketch family
      val nfc = s.sql("SELECT nfc_normalize('Cafe\u0301')")
        .collect()(0).getString(0)
      assert(nfc == "Caf\u00e9" && nfc.length == 4)
      val med = s.sql(
        """SELECT qsk_quantiles(qsk_merge(sk), array(0.5D))[0] AS p50,
          |       qsk_count(qsk_merge(sk)) AS n
          |FROM (SELECT g % 2 AS shard, qsk_sketch(v, k) AS sk FROM VALUES
          |        (0, 1.0D, 1L), (1, 2.0D, 2L), (2, 3.0D, 3L),
          |        (3, 4.0D, 4L), (4, 5.0D, 5L)
          |        AS t(g, v, k) GROUP BY g % 2)""".stripMargin).collect()(0)
      assert(med.getDouble(0) == 3.0 && med.getLong(1) == 5L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("the MV rewrite rides the extension as a true injected optimizer rule") {
    val shared = SparkTestBase.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.engine.GraftExtensions())
      .getOrCreate()
    try {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ext_mv").toString
      val mvRoot = s"$dir/mv"
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "x")
        .write.parquet(s"$dir/base")
      val base = s.read.parquet(s"$dir/base")
      graft.engine.Mv.register(s, "ext_mv", base, Seq("g"), Seq("x"), mvRoot)
      // strip the programmatic arm: the INJECTED rule must carry it alone
      s.experimental.extraOptimizations = Seq.empty
      val q = base.groupBy("g").agg(sum("x").as("sx")).orderBy("g")
      val scans = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString.stripPrefix("file:"))
            case _ => Seq.empty
          }
      }.flatten
      assert(scans.nonEmpty && scans.forall(_.startsWith(mvRoot)),
        s"injected rule did not serve the MV: $scans")
      assert(q.as[(String, Long)].collect().toSeq ==
        Seq("a" -> 3L, "b" -> 3L))
    } finally {
      graft.engine.Mv.clear()
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
