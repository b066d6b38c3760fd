package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic for the q3_top_unshipped floor (r13 verdict #1: driver
  * median 0.917 s = 1.70× stock vs the 0.68–0.71 s local claim — the
  * one gated key without ~2× slack). Times, in one warm session at
  * the driver config:
  *   - the full key (N repeats),
  *   - the same plan with AQE off (isolates AQE's per-stage
  *     materialization barriers: the pinned plan has 2 broadcast
  *     stages + 1 shuffle stage = 3 sequential job launches under
  *     AQE, vs 1 job + async broadcast threads without),
  *   - the component floor: lineitem scan+filter, orders
  *     scan+filter, the (o ⋉ c) dim build alone.
  * Builder-side tool like BenchFloor; not part of the driver
  * contract. */
object Q3Floor {
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
    import graft.engine.{QueriesCore, Tables}
    import org.apache.spark.sql.functions.col

    def times(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      println(f"[q3floor] $label%-22s med=$med%6.3f min=${ts.head}%6.3f max=${ts.last}%6.3f")
    }

    times("q3_full_aqe_on") { QueriesCore.q3TopUnshipped(spark, sfDir).count(); () }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    times("q3_full_aqe_off") { QueriesCore.q3TopUnshipped(spark, sfDir).count(); () }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val ts1998 = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    times("lineitem_scan_filter") {
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") > ts1998).count(); ()
    }
    times("orders_scan_filter") {
      Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < ts1998).count(); ()
    }
    times("dim_build_semi") {
      val c = Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < ts1998)
        .join(org.apache.spark.sql.functions.broadcast(c),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .count(); ()
    }
    spark.stop()
  }
}
