package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the connectedComponents call inside
  * docs_dedup_cc (r19 optimization diagnostics). */
object ProbeCc {
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
      println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // warm the artifact + JVM
    Artifacts.nearDupPairs(spark, d).count()
    for (rep <- 1 to 3) {
      println(s"rep $rep")
      val pairs = t("nearDupPairs frame") {
        Artifacts.nearDupPairs(spark, d).select("id1", "id2")
      }
      val edges = t("edges union + localCheckpoint") {
        pairs.select(col("id1").as("u"), col("id2").as("v"))
          .union(pairs.select(col("id2").as("u"), col("id1").as("v")))
          .localCheckpoint(true)
      }
      val seedObs = org.apache.spark.sql.Observation(s"seed_$rep")
      var labels = t("seed groupBy + checkpoint") {
        edges.groupBy(col("u"))
          .agg(min("v").as("mv"))
          .select(col("u").as("n"), least(col("u"), col("mv")).as("label"))
          .observe(seedObs, sum("label").as("s"))
          .localCheckpoint(true)
      }
      t("isEmpty probe") { labels.isEmpty }
      var prevSum = seedObs.get("s").asInstanceOf[Long]
      var i = 0
      var converged = false
      while (i < 20 && !converged) {
        val (s, cp) = t(s"round $i") {
          val prop = edges.as("e").join(labels.as("l"), col("e.v") === col("l.n"))
            .select(col("e.u").as("n"), col("l.label").as("label"))
          val m1 = labels.unionByName(prop)
            .groupBy("n").agg(min("label").as("label"))
            .localCheckpoint(false)
          val jumped = m1.as("x")
            .join(m1.as("y"), col("x.label") === col("y.n"), "left")
            .select(col("x.n").as("n"),
                    coalesce(col("y.label"), col("x.label")).as("label"))
          val obs = org.apache.spark.sql.Observation(s"cc_${rep}_$i")
          val cp0 = jumped.observe(obs, sum("label").as("s"))
            .localCheckpoint(true)
          (obs.get("s").asInstanceOf[Long], cp0)
        }
        labels = pairs.sparkSession.createDataFrame(cp.rdd, cp.schema)
        converged = s == prevSum
        prevSum = s
        i += 1
      }
      println(s"  rounds=$i")
    }
    spark.stop()
  }
}
