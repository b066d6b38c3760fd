package graft.engine

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed artifact materialization — the Spark re-expression
  * of the reference's ONE real computed semantic (pipetree's
  * specific/dependency/parameter hash caching; SURVEY.md §2.1-P6,
  * §4.1): a stage rerun is skipped iff the hash of (computation ×
  * inputs) is unchanged.
  *
  * Hash composition:
  *  - "specific hash"   → the canonicalized logical plan (normalizes
  *    alias ids/ordering, so equivalent plans share a hash);
  *  - "dependency hash" → the leaf input files' (path, length,
  *    modification time) fingerprint, via the Hadoop FS API — works
  *    unchanged against any Hadoop-compatible store (local now,
  *    s3a/hdfs by config, matching pipetree's Local/S3 backends).
  *
  * At 100 TB: artifacts are parquet directories keyed by hash; the
  * existence probe is one FS metadata call, and re-listing leaf files
  * costs one listing per input table — never a data read.
  */
object ArtifactCache {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Stable content hash of a DataFrame's computation + inputs.
    * Includes Dataset.semanticHash and the full schema alongside the
    * canonicalized plan string: Spark TRUNCATES long plan strings
    * (SparkStringUtils), so the string alone could collide for wide
    * plans differing only in truncated regions. */
  def artifactHash(df: DataFrame): String = {
    val planPart = df.semanticHash().toString + "\n" +
      df.schema.json + "\n" +
      df.queryExecution.logical.canonicalized.toString
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val inputPart = df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.mkString("\n")
    md5hex(planPart + "\n--inputs--\n" + inputPart)
  }

  /** Returns the cached artifact if one exists for this computation's
    * hash; otherwise computes, writes, and reads back. The read-back
    * (rather than returning `df`) makes downstream consumers scan the
    * materialized parquet — identical behavior on hit and miss. */
  def materialize(df: DataFrame, cacheRoot: String, name: String): DataFrame = {
    val spark = df.sparkSession
    val hash = artifactHash(df)
    val dir = new Path(s"$cacheRoot/$name-$hash")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new Path(dir, "_SUCCESS")
    if (!fs.exists(success)) {
      df.write.mode("overwrite").parquet(dir.toString)
    }
    spark.read.parquet(dir.toString)
  }

  /** True iff `materialize` would skip recomputation. */
  def isCached(df: DataFrame, cacheRoot: String, name: String): Boolean = {
    val hash = artifactHash(df)
    val dir = new Path(s"$cacheRoot/$name-$hash/_SUCCESS")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.exists(dir)
  }
}
