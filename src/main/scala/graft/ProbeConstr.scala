package graft
import org.apache.spark.sql.SparkSession

/** Round-19 optimization micro-probe: times the driver-side frame
  * CONSTRUCTION ingredients that BenchSplit showed dominating the
  * sql_* / lake_* / dedup keys (guide §1 — find where the time goes
  * before changing anything). Pure diagnostics; no assertions. */
object ProbeConstr {
  def time[A](label: String, reps: Int = 5)(f: => A): Unit = {
    f // warm
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"$label%-44s med=${ts(reps / 2)}%7.4f min=${ts.head}%7.4f max=${ts.last}%7.4f")
  }

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

    time("read.parquet(lineitem)") { Tables.lineitem(spark, d) }
    time("read.parquet(lineitem) + count") { Tables.lineitem(spark, d).count() }
    time("Tables.events (repairTs)") { Tables.events(spark, d) }
    time("Sql.register (views+fns)") { graft.Sql.register(spark, d) }
    time("Artifacts.nearDupPairs") { Artifacts.nearDupPairs(spark, d) }
    time("Sql.registerAll") { graft.Sql.registerAll(spark, d) }
    val droot = QueriesR19.ensureDocsIngest(spark, d)
    time("LakeTable.read(ingested docs)") {
      LakeTable.read(spark, Ingest.docsRoot(droot))
    }
    time("LakeTable.read + count") {
      LakeTable.read(spark, Ingest.docsRoot(droot)).count()
    }
    time("artifactHash(simple orders frame)") {
      ArtifactCache.artifactHash(
        Tables.orders(spark, d).select("o_orderkey", "o_orderstatus"))
    }
    time("inputFiles(simple orders frame)") {
      Tables.orders(spark, d).select("o_orderkey").inputFiles.length
    }
    spark.stop()
  }
}
