package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2-H: streaming semantics over `events`, batch-computed
  * with the exact functions Structured Streaming uses (`window()`,
  * watermark-style running max, dropDuplicates-style row_number). The
  * streaming-native execution of the same plans is validated in
  * scalatest via MemoryStream (§5.3-5); oracles compare the
  * deterministic batch results.
  *
  * Scale notes: tumbling/sliding windows and sessionization shuffle on
  * (window×type) / user_id respectively — both partition-count-agnostic.
  * `events_watermark_late` uses a single global arrival-order window by
  * design (it models a monotone stream clock); at 100 TB the same
  * semantics would ride per-partition watermarks in Structured
  * Streaming rather than a batch global window —
  * `events_watermark_late_perkey` is that partitioned, scale-safe form
  * as a batch operator.
  */
object QueriesEvents {
  import Tables._

  /** 1-hour tumbling window × event_type: count + sum. */
  def eventsTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
              col("cnt"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** 1-hour window sliding every 15 minutes (each event in 4 windows). */
  def eventsSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
              col("cnt"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** 30-min-gap sessionization per user — gaps-and-islands (portable
    * SQL on both sides; engine-native session_window is kept for the
    * streaming-only test per SURVEY.md §7.4-5). */
  def eventsSession(s: SparkSession, d: String): DataFrame =
    Ops.sessionize(events(s, d), "user_id", "ts", "event_id", "30 MINUTES")
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min("ts").as("s_start"), max("ts").as("s_end"))
      .orderBy("user_id", "session_id")

  /** Watermark semantics, batch-emulated: drop events more than 10 min
    * behind the arrival-order running max timestamp. */
  def eventsWatermarkLate(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("wm", max("ts").over(w))
      .filter(col("ts") >= col("wm") - expr("INTERVAL 10 MINUTES"))
      .select("event_id", "user_id", "ts", "wm")
      .orderBy("event_id")
  }

  /** Per-key watermark semantics: drop events more than 10 min behind
    * the PER-USER arrival-order running max timestamp — the scale-safe
    * batch form of events_watermark_late. The global variant's single
    * total-order window is one task sorting the whole table (kept as
    * the documented stream-clock model); this one shuffles once on
    * user_id and sorts per key, so it parallelizes like every other
    * keyed window at 100 TB — and it is exactly the state Structured
    * Streaming keeps for dropDuplicates/withWatermark on a keyed
    * stream. */
  def eventsWatermarkLatePerkey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("wm", max("ts").over(w))
      .filter(col("ts") >= col("wm") - expr("INTERVAL 10 MINUTES"))
      .select("event_id", "user_id", "ts", "wm")
      .orderBy("event_id")
  }

  /** First event per (user_id, event_type) by time — the batch analog
    * of streaming dropDuplicatesWithinWatermark. */
  def eventsStatefulDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "ts")
      .orderBy("user_id", "event_type")
  }

  /** JSON property extraction + bucketed aggregate. */
  def eventsJsonProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", expr("k div 10"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .orderBy("k_bucket")
}
