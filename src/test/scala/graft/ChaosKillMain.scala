package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{CommitFault, Ingest}

/** Child-JVM executioner for ChaosSpec's forked-kill case: runs ONE
  * ingestBatch against the parent's lake root and calls
  * System.exit(137) at the top of the `killAt`-th table commit — a
  * real process death between commits, not an exception a finally
  * block could soften. Usage:
  *   ChaosKillMain <sfDir> <root> <batchId> <killAtCommit>
  */
object ChaosKillMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, root, batchIdS, killAtS) = args
    val (batchId, killAt) = (batchIdS.toLong, killAtS.toInt)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-chaos-kill")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    CommitFault.hook = (_, _, _) =>
      if (seen.incrementAndGet() == killAt) {
        System.err.println(s"[chaos] dying before commit $killAt")
        Runtime.getRuntime.halt(137)    // no shutdown hooks, no mercy
      }
    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === batchId)
    Ingest.ingestBatch(batch, root, "t", batchId,
      filter = Some(Ingest.tooShortRule(100)))
    // reachable only if killAt exceeded the batch's commit count
    System.exit(0)
  }
}
