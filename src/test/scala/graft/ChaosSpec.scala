package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{CommitFault, Ingest, LakeTable}

/** Kill-mid-commit chaos for the ingest loop (VERDICT r15 #3).
  *
  * The crash contract (Ingest's recomputation-determinism argument:
  * re-delivery recomputes identical verdicts under EVERY
  * partial-commit state) was proven by hand-enumerating commit
  * states; this suite is its adversarial twin — an executioner that
  * aborts the REAL ingestBatch/ingestEmbBatch between table commits
  * at seeded points, re-delivers (sometimes crashing AGAIN at an
  * earlier point), and asserts the final tables are byte-identical
  * to an uninterrupted run. One case dies for real: a forked JVM
  * running the ingest calls System.exit(137) between commits
  * (ChaosKillMain) and the parent re-delivers into its root.
  *
  * Abort mechanics: [[CommitFault.hook]] fires at the top of every
  * [[LakeTable.appendTxn]], BEFORE anything is written — so aborting
  * the n-th fire leaves exactly the first n−1 of the batch's table
  * commits durable, the precise windows the determinism argument
  * quantifies over (docs leg: docs→bands→rejects→filtered; emb leg:
  * [codebook→]vecs→vrejects→vfiltered).
  */
class ChaosSpec extends SparkTestBase {

  private case class ChaosAbort() extends RuntimeException("chaos abort")

  /** Hook that throws on the n-th appendTxn fire (1-based); n beyond
    * the batch's commit count aborts nothing. */
  private def armAbort(n: Int): Unit = {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    CommitFault.hook =
      (_, _, _) => if (seen.incrementAndGet() == n) throw ChaosAbort()
  }

  private def tableRows(root: String): Map[String, Set[String]] = {
    def rows(sub: String): Set[String] = {
      val r = s"$root/$sub"
      if (LakeTable.latestVersion(spark, r).isDefined &&
          LakeTable.activeDirs(spark, r).nonEmpty)
        LakeTable.read(spark, r).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      else Set.empty
    }
    Seq("docs", "bands", "rejects", "filtered",
        "vecs", "vrejects", "vfiltered", "codebook")
      .map(s => s -> rows(s)).toMap
  }

  override def afterAll(): Unit = {
    CommitFault.reset()
    super.afterAll()
  }

  test("docs ingest: 12 seeded abort schedules across 4 batches re-deliver to byte-identical tables") {
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint()
    def batchOf(b: Long): DataFrame = all.filter(col("doc_id") % 4 === b)
    def ingest(root: String, b: Long): Unit =
      Ingest.ingestBatch(batchOf(b), root, "t", b,
        filter = Some(Ingest.tooShortRule(100)))
    val ref = java.nio.file.Files
      .createTempDirectory("graft_chaos_ref").toString
    for (b <- 0L to 3L) ingest(ref, b)
    val refRows = tableRows(ref)
    assert(refRows("docs").nonEmpty && refRows("rejects").nonEmpty,
      "reference run produced no docs/rejects — chaos would assert nothing")
    for (seed <- 1 to 12) {
      val rnd = new java.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_chaos_$seed").toString
      for (b <- 0L to 3L) {
        // 0–2 crashes per batch, each before a random commit index
        // (1..4 = the batch's four table commits; the docs leg fires
        // exactly 4 appendTxns per delivery, data-bearing or empty).
        val crashes = rnd.nextInt(3)
        for (_ <- 0 until crashes) {
          armAbort(1 + rnd.nextInt(4))
          intercept[ChaosAbort] { ingest(root, b) }
          CommitFault.reset()
        }
        ingest(root, b)                      // the delivery that lands
      }
      assert(tableRows(root) == refRows,
        s"seed $seed: chaos-interrupted ingest diverged from the " +
          "uninterrupted reference")
    }
  }

  test("embedding ingest: 8 seeded abort schedules across 3 batches re-deliver to byte-identical tables") {
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    def batchOf(b: Long): DataFrame = all.filter(col("vec_id") % 3 === b)
    def ingest(root: String, b: Long): Unit =
      Ingest.ingestEmbBatch(batchOf(b), root, "t", b, dupCos = 0.45,
        k = 8)
    val ref = java.nio.file.Files
      .createTempDirectory("graft_echaos_ref").toString
    for (b <- 0L to 2L) ingest(ref, b)
    val refRows = tableRows(ref)
    assert(refRows("vecs").nonEmpty && refRows("codebook").nonEmpty,
      "reference emb run produced no corpus — chaos would assert nothing")
    for (seed <- 1 to 8) {
      val rnd = new java.util.Random(100 + seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_echaos_$seed").toString
      for (b <- 0L to 2L) {
        val crashes = rnd.nextInt(3)
        for (_ <- 0 until crashes) {
          // batch 0 fires 4 commits (codebook first); later batches 3
          armAbort(1 + rnd.nextInt(4))
          try { ingest(root, b); CommitFault.reset() }
          catch { case _: ChaosAbort => CommitFault.reset() }
        }
        ingest(root, b)
      }
      assert(tableRows(root) == refRows,
        s"seed $seed: chaos-interrupted emb ingest diverged from the " +
          "uninterrupted reference")
    }
  }

  test("forked-JVM kill: a real System.exit between commits, restart, re-deliver — tables identical") {
    val ref = java.nio.file.Files
      .createTempDirectory("graft_kill_ref").toString
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint()
    def batchOf(b: Long): DataFrame = all.filter(col("doc_id") % 2 === b)
    for (b <- 0L to 1L)
      Ingest.ingestBatch(batchOf(b), ref, "t", b,
        filter = Some(Ingest.tooShortRule(100)))
    val root = java.nio.file.Files
      .createTempDirectory("graft_kill").toString
    // batch 0 lands normally IN-PROCESS; batch 1 runs in a CHILD JVM
    // that System.exit(137)s right before its third table commit —
    // a hard death no finally/shutdown-hook cleanup softens.
    Ingest.ingestBatch(batchOf(0L), root, "t", 0L,
      filter = Some(Ingest.tooShortRule(100)))
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.toArray.map(String.valueOf)
      .filter(a => a.startsWith("--add-opens") ||
                   a.startsWith("--add-exports"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g",
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.ChaosKillMain", sfDir, root, "1", "3")
    val p = new ProcessBuilder(cmd: _*).inheritIO().start()
    val exit = p.waitFor()
    assert(exit == 137, s"child JVM exited $exit, expected the kill 137")
    // the kill left a commit prefix; the restart re-delivers batch 1
    Ingest.ingestBatch(batchOf(1L), root, "t", 1L,
      filter = Some(Ingest.tooShortRule(100)))
    assert(tableRows(root) == tableRows(ref),
      "kill-and-restart ingest diverged from the uninterrupted reference")
  }
}
