package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the events_anomaly_mad watch item (r14 verdict
  * watch #1: close-session median crept to 1.8 s in r13's driver
  * close, re-measured 0.84 s in the latest full map; trigger = if
  * the idle-box median stays >1.4 s, PROFILE the two
  * repartitionByRange passes before touching the plan). Times, in
  * one warm session at the driver config:
  *   - the full key,
  *   - the first exact-median pass alone (pass 1: range exchange +
  *     slice-local sort over events.value),
  *   - the dev frame build INCLUDING its localCheckpoint (the one
  *     deliberate events-sized materialization),
  *   - the second exact-median pass over the checkpointed dev,
  *   - the raw events scan.
  * Builder-side tool like Q3Floor; not part of the driver
  * contract. */
object MadFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS").map(_.toInt).getOrElse(5)
    val spark = SessionHygiene.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.{Ops, QueriesR14, Tables}

    def times(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      println(f"[madfloor] $label%-22s med=$med%6.3f min=${ts.head}%6.3f max=${ts.last}%6.3f")
    }

    val v = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
    def medianOf(df: org.apache.spark.sql.DataFrame, valueCol: String,
                 out: String) =
      Ops.exactGroupRank(df, Seq("event_type"),
                         Seq(col(valueCol), col("event_id")))
        .filter(col("rnk") === expr("(n_total + 1) div 2") ||
                col("rnk") === expr("(n_total + 2) div 2"))
        .groupBy("event_type").agg(avg(valueCol).as(out))

    times("full_key") {
      QueriesR14.eventsAnomalyMad(spark, sfDir).count(); () }
    times("events_scan") { v.count(); () }
    times("median_pass1") { medianOf(v, "value", "med").count(); () }
    val dev = v.join(medianOf(v, "value", "med"), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    times("dev_localCheckpoint") { dev.localCheckpoint(true).count(); () }
    val devPinned = dev.localCheckpoint(true)
    times("median_pass2") {
      medianOf(devPinned.select("event_id", "event_type", "dev"),
               "dev", "mad").count(); () }
  }
}
