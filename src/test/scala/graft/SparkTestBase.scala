package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** Stages `df` as ONE parquet part at <destDir>/<name>.parquet —
    * the append-only file-source staging the streaming tests share.
    * Single-part by construction, so a maxFilesPerTrigger=1 drain
    * sees exactly one microbatch per stage (a multi-part write would
    * silently split batches — hence the coalesce and the loud failure
    * if no part emerges). */
  def stageOnePart(df: org.apache.spark.sql.DataFrame, destDir: String,
                   name: String): Unit = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file staged for $name"))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(destDir, s"$name.parquet"))
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
