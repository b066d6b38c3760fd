package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionHygiene.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Verify/tests: keys evaluate date functions (and
      // scan_dpp_partitioned PERSISTS year(l_shipdate) into a shared
      // artifact whose hash doesn't see the timezone) — an unpinned
      // local zone would poison that artifact for the UTC sessions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One untimed warmup execution per query, then the timed run —
    // matching BASELINE.md's methodology ("median of 3 runs after 1
    // warm-up"): the baseline numbers exclude JIT/codegen warmup, so
    // comparable measurements must too.
    //
    // SPARK_GRAFT_BENCH_COLD=1 is the mechanical cold-kernel probe:
    // it skips warmup AND gives every key a fresh artifact-cache
    // root, so artifact-backed keys (knn / ann_ivf / ivf_recall /
    // dedup family) time their full compute — a kernel regression
    // cannot hide behind P6 reuse, including reuse of an artifact a
    // PRIOR listed key just built. SPARK_GRAFT_BENCH_KEYS=k1,k2
    // restricts the run (cold runs target the artifact-backed
    // subset).
    val warm = !sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    val keyFilter = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = keyFilter match {
      case Some(ks) =>
        val unknown = ks -- SparkEntry.queries.keySet
        // A typo'd key would otherwise vanish silently and the "cold
        // regression probe" would pass without measuring anything.
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_KEYS names unknown keys: ${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter { case (n, _) => ks(n) }
      case None => SparkEntry.queries
    }
    // SPARK_GRAFT_BENCH_GCSTATS=1: per-key stderr line with GC-time
    // delta, heap use, and pinned-RDD count — the round-11 diagnostic
    // for session-tail slowdown (a key whose wall time inflates only
    // in full-session runs shows up here as GC time, not kernel time).
    val gcStats = sys.env.get("SPARK_GRAFT_BENCH_GCSTATS").contains("1")
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    var keyIdx = 0
    var errors = List.empty[(String, String)]
    val results = selected.map { case (name, fn) =>
      keyIdx += 1
      SessionHygiene.step(spark, keyIdx)
      val gc0 = if (gcStats) gcMillis else 0L
      if (warm) { try { fn(spark, sfDir).count() } catch { case _: Throwable => } }
      else {
        // Isolate rather than destroy — and PER KEY, not per JVM:
        // pointing the cache at a fresh temp root before every timed
        // key makes each key's full kernel run cold even when several
        // listed keys share an artifact (knn → ivf → recall), without
        // deleting the shared root under a concurrent session's reads.
        System.setProperty("graft.cache.root",
          java.nio.file.Files.createTempDirectory("graft_cold_cache_")
            .toString)
      }
      // A key that throws records -1 (an impossible duration) AND its
      // error — round 7 proved that timing the failure instead turns an
      // instant AnalysisException into a fake 4.5x "speedup".
      val t0 = System.nanoTime()
      val sec = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors ::= name ->
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
          -1.0
        }
      if (gcStats) {
        val rt = Runtime.getRuntime
        val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
        val nPinned = spark.sparkContext.getPersistentRDDs.size
        System.err.println(f"[gcstats] $name%-28s sec=$sec%7.3f gc_ms=${gcMillis - gc0}%6d heap_mb=$heapMb%6d pinned_rdds=$nPinned%4d")
      }
      name -> sec
    }
    def jstr(s: String): String = JsonOut.str(s)
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse
      .map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    // total sums SUCCESSFUL keys only; n_errors > 0 is the red flag
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_keys":${results.size},"n_errors":${errors.size},"errors":$errJson}""")
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size}/${results.size} keys FAILED: " +
        errors.reverse.map(_._1).mkString(", "))
    spark.stop()
  }
}
