package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 keys: two ordered-aggregation primitives every
  * event-analytics pipeline ships — OHLC bars (first/last-by-order
  * aggregation) and a Markov transition matrix (lead-over-sequence) —
  * both spelled with the §2.3 determinism discipline.
  */
object QueriesR12 {
  import Tables._

  /** Per (event_type, day) OHLC bars: open/close are the values at
    * the FIRST/LAST (ts, event_id) position — the ordered-aggregation
    * primitive (candlesticks, session bookends, state-at-boundary).
    *
    * Determinism (§2.3): open/close ride min/max over a
    * (ts, event_id, value) struct — lexicographic struct ordering
    * with the unique event_id as tiebreak, so both engines pick the
    * identical row without any window sort; high/low are plain
    * min/max (no arithmetic, bit-identical doubles both sides);
    * sum_value goes through the 1e-9 DECIMAL grid (order-proof).
    *
    * Scale shape: ONE map-side-combined aggregate — the struct
    * min/max partials merge associatively like any min/max, so no
    * window, no per-group sort, one shuffle on the (type, day) key.
    * This is why the struct-min spelling beats the row_number-over-
    * window spelling at 100 TB: the window would sort every
    * partition's full day of events; the aggregate keeps 3 structs
    * per group. */
  def eventsOhlc(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"),
               date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value, 9) AS DECIMAL(28,9))"))
          .cast("double").as("sum_value"))
      .orderBy("event_type", "day")

  /** Incremental near-duplicate detection — the production INGESTION
    * shape none of the full-corpus dedup keys exercise: a new DELTA
    * batch (doc_id ≡ 0 mod 3 stands in for "today's crawl") dedups
    * against (a) the persisted LSH band index of the EXISTING corpus
    * (`Artifacts.baseBandIndex` — the base is never re-hashed) and
    * (b) itself, with the earlier-id survivor rule within the batch.
    * Emits (doc_id, match_id, match_src ∈ base|delta, jaccard) for
    * every pair at or above 0.8 exact Jaccard.
    *
    * Oracle: exact shingle-Jaccard over the split — the LSH bands are
    * the candidate path only (the docs_dedup_near recall contract),
    * so the hash match proves the incremental path finds exactly the
    * pairs the batch recompute would.
    *
    * Scale shape: delta hashing costs O(batch); the base index probe
    * is one equi join on (band, bh); exact verification re-shingles
    * only matched candidates (semi-join). This is the shape that
    * makes daily dedup O(delta · corpus-overlap), not O(corpus²). */
  def docsDedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isDelta = col("doc_id") % 3 === 0
    Ops.minhashNearDupIncremental(
        Artifacts.baseBandIndex(s, d),
        docs.filter(!isDelta), docs.filter(isDelta), "doc_id", "text",
        memoKey = Some(d))
      .orderBy("doc_id", "match_src", "match_id")
  }

  /** Per-user event-type transition matrix with conditional
    * probabilities — the first-order Markov model of the event
    * stream (session modeling, anomaly priors, next-action
    * features). Each user's events order by (ts, event_id); every
    * consecutive pair (cur → nxt) counts once; p = n / Σ n over cur.
    *
    * Determinism (§2.3): the sequence order carries the unique
    * event_id tiebreak; counts are integers (exact); p is a single
    * quotient then round (quotients don't sit on round midpoints).
    *
    * Scale shape: the lead() window partitions by user_id — bounded
    * by the hottest user, the same per-key window contract as every
    * H-family key — and the probability window runs over the
    * AGGREGATED type×type frame (≤ |types|² rows, domain-bounded;
    * the plan-gate's aggregate-beneath rule admits it). One shuffle
    * on user, one on the pair key. */
  def eventsMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val seq = events(s, d)
      .withColumn("nxt", lead("event_type", 1).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("nxt").isNotNull)
    val tr = seq.groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    tr.withColumn("p",
        round(col("n").cast("double") /
              sum("n").over(Window.partitionBy("cur")), 6))
      .orderBy("cur", "nxt")
  }
}
