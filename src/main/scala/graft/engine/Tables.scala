package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema catalog + readers for the testdata tables.
  *
  * Design notes (SURVEY.md §1.2, §7.4):
  *  - All readers are plain parquet scans so Catalyst predicate pushdown
  *    and column pruning reach the source (`PushedFilters`/`ReadSchema`).
  *  - `events.ts` has shipped in TWO encodings across testdata
  *    generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses by
  *    default — the `nanosAsLong` legacy flag surfaces it as raw longs)
  *    and TIMESTAMP(MICROS, NTZ). `repairTs` branches on the type the
  *    scan actually produced, so either encoding — or a mixed lake of
  *    both — normalizes to the same TimestampType(µs)/UTC column.
  *  - At 100 TB these readers would point at partitioned layouts
  *    (date/lang partition dirs); nothing else changes because every
  *    operator downstream is partition-count-agnostic.
  */
object Tables {
  // Round-19 optimization (guide §1/§6): a bare `spark.read.parquet`
  // runs a schema-INFERENCE job (read footers) on every call — 134 ms
  // measured per table read at sf0.1, paid by every key's every run
  // (≈ 2 tables × 4 runs × 308 keys across a bench session). A real
  // deployment reads through a catalog that already knows the schema;
  // this memo is that catalog: it caches ONLY the inferred schema,
  // keyed by the table path + the footer-semantics conf, and
  // re-validated against the file statuses (len+mtime, one stat/list
  // per call) so a rewritten table re-infers. The returned frame is
  // still a fresh `spark.read...parquet(path)` — file listing, scan,
  // pushdown, and the DATA are untouched; only the redundant
  // inference job is skipped.
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  private def statFp(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).map(c =>
            s"${c.getPath.getName}:${c.getLen}:${c.getModificationTime}")
          .sorted.mkString(",")
      else s"${st.getLen}:${st.getModificationTime}"
    } catch { case _: Exception => "absent" }
  }

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // EVERY footer-inference-affecting conf (nanosAsLong,
    // binaryAsString, int96AsTimestamp, inferTimestampNTZ,
    // caseSensitive — the shared ArtifactCache list, r19 ADVICE) is in
    // the key, so flipping one mid-JVM re-infers instead of serving
    // the other configuration's schema.
    val key = s"$path|${ArtifactCache.parquetInferConfFp(spark)}"
    val fp = statFp(spark, path)
    val m = schemaMemo.get(key)
    val schema =
      if (m != null && m._1 == fp) m._2
      else {
        val inferred = spark.read.parquet(path).schema
        ArtifactCache.capMemo(schemaMemo)
        schemaMemo.put(key, (fp, inferred))
        inferred
      }
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Normalize an events frame's `ts` to TimestampType (µs, UTC) and
    * expose epoch nanos as `ts_ns`, whatever the writer's encoding:
    *  - `LongType` — a TIMESTAMP(NANOS) file read under the
    *    `nanosAsLong` flag: truncate ns→µs (matches DuckDB's native
    *    ns→µs cast exactly);
    *  - `TimestampNTZType` / `TimestampType` — a TIMESTAMP(MICROS)
    *    file: cast (wall-clock-identity under the pinned UTC session),
    *    `ts_ns` derived as µs×1000.
    * Pure projection — works on batch and streaming frames alike, so
    * `graft.Stream`'s readStream path shares it. */
  private[graft] def repairTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — expected " +
          "long (ns), timestamp_ntz, or timestamp")
    }

  /** events with `ts` repaired to TimestampType (µs), UTC.
    * Epoch-nanos column preserved as `ts_ns` for callers that need it. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Keep the legacy flag on so a ns-encoded generation still reads
    // (as raw longs) instead of failing analysis; µs files ignore it.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    repairTs(t(s, d, "events"))
  }
}
