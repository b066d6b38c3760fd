package graft

import java.nio.file.Files

import graft.engine.{LakeTable, Mv}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The full production serving loop in one drain: a file stream feeds
  * a lake base table via foreachBatch, each microbatch BOTH appends
  * the rows and folds them into the registered MV under an (appId,
  * batchId) token — so after the drain, an aggregate a user writes
  * against the base is answered from a summary that streaming
  * maintenance kept exact, and a re-delivered batch cannot
  * double-count. This is CdcStream's exactly-once discipline applied
  * to [[Mv]] maintenance.
  */
class MvStreamSpec extends SparkTestBase {
  import spark.implicits._

  override def afterAll(): Unit = {
    Mv.clear()
    super.afterAll()
  }

  test("a streaming drain maintains the MV exactly-once; the base query serves from it") {
    val work = Files.createTempDirectory("graft_mv_stream").toString
    val in = s"$work/in"; new java.io.File(in).mkdirs()
    val baseRoot = s"$work/base"
    val mvRoot = s"$work/mv"
    // three event-derived chunks: (grp, x)
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select((col("user_id") % 5).cast("string").as("grp"),
              col("event_id").as("x"))
    for (b <- 0 to 2)
      stageOnePart(ev.filter(pmod(xxhash64(col("x")), lit(3)) === b),
        in, s"chunk$b")

    val stream = spark.readStream
      .schema("grp STRING, x BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        LakeTable.appendTxn(batch, baseRoot, "mvstream-base", batchId)
        val current = LakeTable.read(s, baseRoot)
        if (LakeTable.latestVersion(s, mvRoot).isEmpty)
          Mv.register(s, "stream_mv", current, Seq("grp"), Seq("x"),
            mvRoot, hllCols = Seq("x"))
        else
          Mv.refresh(s, "stream_mv", current, batch.toDF(),
            txn = Some(("mvstream", batchId)))
        ()
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // the served query over the CURRENT base (register the sketch
    // functions on THIS session — the drain registered them on
    // foreachBatch's cloned micro-batch session)
    graft.engine.Hll.register(spark)
    val base = LakeTable.read(spark, baseRoot)
    // arm the rewrite on THIS session (foreachBatch armed only its
    // cloned micro-batch session): registration is idempotent — the
    // summary exists, so this just binds defs + the rule here, the
    // serving-session half of the deployment pattern (a conf-driven
    // session gets the rule from GraftExtensions instead)
    Mv.register(spark, "stream_mv", base, Seq("grp"), Seq("x"), mvRoot,
      hllCols = Seq("x"))
    val served = base.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
           expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("grp")
    val scans = served.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString.stripPrefix("file:"))
          case _ => Seq.empty
        }
    }.flatten
    assert(scans.nonEmpty && scans.forall(_.startsWith(mvRoot)),
      s"post-drain query should serve from the MV, got $scans")
    val got = served.as[(String, Long, Long, Long)].collect().toSeq

    // ground truth: the same aggregate with the rewrite off
    Mv.clear()
    val plain = base.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
           expr("hll_estimate(hll_sketch(x))").as("nd"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == plain, "streamed MV maintenance diverged from batch")
    assert(got.map(_._2).sum == ev.count())

    // exactly-once: re-delivering the LAST batch's fold is a no-op
    // (hex the sketch column: Row equality on binary is by reference)
    def mvSnap(): Seq[org.apache.spark.sql.Row] =
      LakeTable.read(spark, mvRoot)
        .select(col("grp"), col("cnt"), col("sum_x"),
                hex(col("hll_x")).as("h"))
        .orderBy("grp").collect().toSeq
    val mvBefore = mvSnap()
    Mv.register(spark, "stream_mv", base, Seq("grp"), Seq("x"), mvRoot,
      hllCols = Seq("x"))
    val lastBatch = spark.read.parquet(in).limit(50)
    Mv.refresh(spark, "stream_mv", base, lastBatch,
      txn = Some(("mvstream", 2L)))
    assert(mvSnap() == mvBefore, "replayed token must not re-fold")
  }
}
