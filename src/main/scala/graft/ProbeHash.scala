package graft
import org.apache.spark.sql.SparkSession

/** Times each ingredient of ArtifactCache.artifactHash on the
  * nearDupPairs producing frame (r19 optimization diagnostics). */
object ProbeHash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionHygiene.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"rep $rep")
      val df = t("build frame") {
        Ops.minhashNearDup(Tables.documents(spark, d), "doc_id", "text")
      }
      t("schema.json (analysis)") { df.schema.json }
      val an = t("analyzed") { df.queryExecution.analyzed }
      val canon = t("canonicalized") { an.canonicalized }
      spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
      t("canonicalized.toString") { canon.toString.length }
      t("inputFiles + statuses") {
        val conf = spark.sparkContext.hadoopConfiguration
        df.inputFiles.sorted.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val fs = p.getFileSystem(conf)
          val st = fs.getFileStatus(p)
          s"$f:${st.getLen}:${st.getModificationTime}"
        }.mkString("\n").length
      }
      t("full artifactHash") { ArtifactCache.artifactHash(df) }
      t("artifact read.parquet") { Artifacts.nearDupPairs(spark, d) }
    }
    spark.stop()
  }
}
