package graft.engine

/** One randomly-named scratch root per JVM for operator sinks
  * (multiformat/ORC round-trips, partitioned sink, schema evolution).
  * Per-JVM randomness keeps concurrent processes isolated (the ADVICE
  * shared-path race); per-key subdirs are REUSED within the JVM with
  * mode("overwrite") writes, so repeated bench/verify invocations
  * rewrite in place instead of accreting one full table copy per call
  * in /tmp. */
object RunScratch {
  lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft_run_").toString

  def dir(name: String): String = {
    val d = java.nio.file.Paths.get(root, name)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }
}
