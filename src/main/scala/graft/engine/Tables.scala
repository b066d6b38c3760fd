package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema catalog + readers for the testdata tables.
  *
  * Design notes (SURVEY.md §1.2, §7.4):
  *  - All readers are plain parquet scans so Catalyst predicate pushdown
  *    and column pruning reach the source (`PushedFilters`/`ReadSchema`).
  *  - `events.ts` is parquet timestamp[ns], which Spark 4 refuses by
  *    default. We set `spark.sql.legacy.parquet.nanosAsLong=true` (a
  *    runtime SQLConf) before the scan and convert raw nanos with
  *    `timestamp_micros(ts div 1000)` — verified to match DuckDB's
  *    native ns→µs truncation exactly.
  *  - At 100 TB these readers would point at partitioned layouts
  *    (date/lang partition dirs); nothing else changes because every
  *    operator downstream is partition-count-agnostic.
  */
object Tables {
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events with `ts` repaired to TimestampType (µs), UTC.
    * Raw nanos column preserved as `ts_ns` for callers that need it. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
