package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming t3 tests (SURVEY.md §5.3-5, §7.5): the H-keys' semantics
  * re-executed through Structured Streaming — watermarks, stateful
  * dedup, and native session windows — validated engine-side (these
  * have no DuckDB oracle; batch keys carry the oracle).
  */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed count with watermark drops too-late rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val agg = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two rows around 10:xx, watermark advances to 10:50
    in.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // batch 2: a row 2 hours late (08:30 < watermark) must be DROPPED,
    // plus one live row that keeps the 11:00 window open
    in.addData((3L, ts("2024-01-01 08:30:00")), (4L, ts("2024-01-01 11:30:00")))
    q.processAllAvailable()
    // batch 3: advance watermark far so all open windows emit
    in.addData((5L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_out")
      .select(col("window.start").cast("string"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("2024-01-01 10:00:00") == 1L)
    assert(rows("2024-01-01 11:00:00") == 2L)       // late 08:30 row absent
    assert(!rows.contains("2024-01-01 08:00:00"))
  }

  test("funnel TTL evicts idle state on watermark; within-TTL completes") {
    // The resident-mode bounded-state contract: a signup whose later
    // stages arrive only after the TTL gap must NOT complete (the
    // state was evicted when the watermark passed signup + TTL); the
    // same stages within the TTL must. TTL = 30 min, watermark
    // delay = 10 min.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.funnelStepTtlTs(30L * 60000))
    val q = out.writeStream.format("memory").queryName("fttl_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: both users sign up at 10:00
    in.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L),
               (2L, "signup", ts("2024-01-01 10:00:00"), 2L))
    q.processAllAvailable()
    // batch 2: user 2 completes WITHIN the TTL; a bystander event
    // pushes the watermark to 11:50 — far past user 1's 10:30 timeout
    in.addData((2L, "click", ts("2024-01-01 10:10:00"), 3L),
               (2L, "purchase", ts("2024-01-01 10:20:00"), 4L),
               (9L, "view", ts("2024-01-01 12:00:00"), 5L))
    q.processAllAvailable()
    // batch 3: a dataless batch FOR USER 1 — expired timeouts fire
    // only for groups with no incoming data, so this is where the
    // idle signup state evicts (hasTimedOut branch)
    in.addData((9L, "view", ts("2024-01-01 12:05:00"), 6L))
    q.processAllAvailable()
    // batch 4: user 1's click + purchase arrive AFTER the TTL gap —
    // with the signup evicted, the funnel must NOT complete
    in.addData((1L, "click", ts("2024-01-01 11:56:00"), 7L),
               (1L, "purchase", ts("2024-01-01 11:58:00"), 8L))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("fttl_out").select("user_id").collect()
      .map(_.getLong(0)).toSet
    assert(hits == Set(2L),
      s"TTL eviction broken: completed users = $hits (want {2})")
  }

  test("CEP TTL evicts an idle signup; within-TTL purchase still matches") {
    // The resident-mode CEP contract (cepStepTtl): a purchase whose
    // signup idled past the TTL must NOT match even inside the 24 h
    // pattern span (the signup state evicted on watermark), while an
    // identical within-TTL purchase matches. TTL = 30 min, watermark
    // delay = 10 min, span = 24 h.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.cepStepTtl(86400000000L, 30L * 60000))
    val q = out.writeStream.format("memory").queryName("cttl_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: both users sign up at 10:00
    in.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L),
               (2L, "signup", ts("2024-01-01 10:00:00"), 2L))
    q.processAllAvailable()
    // batch 2: user 2 purchases WITHIN the TTL (matches); a bystander
    // pushes the watermark to 11:50, far past user 1's 10:30 timeout
    in.addData((2L, "purchase", ts("2024-01-01 10:20:00"), 3L),
               (9L, "view", ts("2024-01-01 12:00:00"), 4L))
    q.processAllAvailable()
    // batch 3: dataless for user 1 — the expired timeout fires and
    // evicts the idle signup
    in.addData((9L, "view", ts("2024-01-01 12:05:00"), 5L))
    q.processAllAvailable()
    // batch 4: user 1's purchase arrives after the TTL gap but well
    // inside the 24 h span — with the signup evicted it must NOT match
    in.addData((1L, "purchase", ts("2024-01-01 11:58:00"), 6L))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("cttl_out").select("user_id").collect()
      .map(_.getLong(0)).toSet
    assert(hits == Set(2L),
      s"CEP TTL eviction broken: matched users = $hits (want {2})")
    spark.sql("DROP TABLE IF EXISTS cttl_out")
  }

  test("ordered EWMA: out-of-order cross-batch arrival equals the batch recurrence; frontier drops true stragglers") {
    // The buffer-on-watermark contract (ewmaStepOrdered): rows
    // arriving OUT of (ts, event_id) order across microbatches —
    // the case the plain ewma sink's invariant forbids — must fold
    // in event-time order once the watermark passes them, matching
    // the batch arithmetic point-for-point; a row behind the fold
    // frontier is dropped, never folded out of order.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (event_id, user_id, ts, value)
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = in.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[(Long, Long, Timestamp, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.ewmaStepOrdered)
    val q = out.writeStream.format("memory").queryName("oewma_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1's SECOND and FOURTH points arrive first —
    // disorder within the watermark lag
    in.addData((12L, 1L, ts("2024-01-01 10:02:00"), 4.0),
               (14L, 1L, ts("2024-01-01 10:06:00"), 8.0))
    q.processAllAvailable()
    // batch 2: the FIRST and THIRD points arrive late but inside the
    // lag (watermark after batch 1 = 10:06 - 10 min = 09:56)
    in.addData((11L, 1L, ts("2024-01-01 10:00:00"), 2.0),
               (13L, 1L, ts("2024-01-01 10:04:00"), 6.0))
    q.processAllAvailable()
    // batch 3: a bystander pushes the watermark far past all four —
    // the buffered rows flush, in (ts, event_id) order
    in.addData((99L, 9L, ts("2024-01-01 12:00:00"), 0.0))
    q.processAllAvailable()
    // batch 4: fire pending event-time timeouts (flush on a batch
    // where user 1 has no data) + a true straggler behind the
    // frontier, which must be dropped
    in.addData((10L, 1L, ts("2024-01-01 09:59:00"), 100.0),
               (98L, 9L, ts("2024-01-01 12:05:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("oewma_out")
      .filter(col("user_id") === 1L)
      .select("event_id", "m", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the batch arithmetic over the four in-order points
    // (the straggler 10L is NOT part of it — it arrived behind the
    // frontier and a correct operator must have dropped it)
    def batchEwma(vals: Seq[Double]): Seq[(Long, Double)] =
      vals.indices.map { i =>
        val window = vals.take(i + 1).reverse
        val numU = window.zipWithIndex.map { case (v, k) =>
          math.floor(v * math.pow(2.0, -k) * 1e9 + 0.5).toLong }.sum
        val denom = 2.0 - math.pow(2.0, 1.0 - window.size)
        ((i + 1).toLong,
         math.floor((numU.toDouble / 1e9 / denom) * 1e6 + 0.5) / 1e6)
      }
    val want = Seq(11L, 12L, 13L, 14L)
      .zip(batchEwma(Seq(2.0, 4.0, 6.0, 8.0)))
      .map { case (eid, (m, e)) => (eid, m, e) }.toSet
    assert(got == want,
      s"ordered EWMA diverged: got=$got want=$want")
    spark.sql("DROP TABLE IF EXISTS oewma_out")
  }

  test("ordered transitions: out-of-order cross-batch arrival yields the in-order pair log") {
    // transStepOrdered is the ewma_ordered recipe on the transition
    // machine: feed a user's events REVERSED across batches (inside
    // the watermark lag) and the released pair log must equal the
    // event-time-ordered chain a → b → c, stamped with the later
    // event of each pair.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.transStepOrdered)
    val q = out.writeStream.format("memory").queryName("otrans_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "c", ts("2024-01-01 10:04:00"), 3L))
    q.processAllAvailable()
    in.addData((1L, "b", ts("2024-01-01 10:02:00"), 2L),
               (1L, "a", ts("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 9L)) // push wm
    q.processAllAvailable()
    in.addData((8L, "view", ts("2024-01-01 12:05:00"), 8L)) // fire timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("otrans_out").filter(col("user_id") === 1L)
      .select("cur", "nxt", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("b", "c", 3L)),
      s"ordered transition log wrong: $got")
    spark.sql("DROP TABLE IF EXISTS otrans_out")
  }

  test("ordered CEP: a poisoning error arriving after its purchase still kills the match") {
    // cepStepOrdered's reason to exist: the pattern machine is
    // order-SENSITIVE (signup resets, error poisons, purchase
    // matches), so cross-batch disorder the plain cep sink forbids
    // must still produce the event-time-order verdict. Event-time
    // truth for user 1: signup(1) → error(2) → signup(3) →
    // purchase(4); fed purchase+error first, signups second. The only
    // hit must pair purchase 4 with signup 3 (n_between = 0) — a
    // matcher that folded in arrival order would emit nothing (no
    // signup live when the purchase arrived).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.cepStepOrdered(86400000000L))
    val q = out.writeStream.format("memory").queryName("ocep_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "purchase", ts("2024-01-01 10:06:00"), 4L),
               (1L, "error", ts("2024-01-01 10:02:00"), 2L))
    q.processAllAvailable()
    in.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L),
               (1L, "signup", ts("2024-01-01 10:04:00"), 3L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 9L)) // push wm
    q.processAllAvailable()
    in.addData((8L, "view", ts("2024-01-01 12:05:00"), 8L)) // fire timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ocep_out").filter(col("user_id") === 1L)
      .select("signup_id", "purchase_id", "n_between").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 4L, 0L)),
      s"ordered CEP wrong: $got (want {(3,4,0)})")
    spark.sql("DROP TABLE IF EXISTS ocep_out")
  }

  test("ordered funnel: a signup arriving after its purchase in processing order still completes the funnel") {
    // funnelStepOrdered's reason to exist: the stage machine only
    // advances signup → click → purchase in event-time order, so a
    // funnel whose EARLIER stages arrive in LATER microbatches (but
    // inside the watermark lag) must still convert — the plain
    // funnel sink's cross-batch ordering invariant forbids exactly
    // this arrival. User 1's stages arrive purchase+click first,
    // signup second; user 2 has a stage-incomplete stream (no
    // signup ever) and must not convert.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.funnelStepOrdered)
    val q = out.writeStream.format("memory").queryName("ofun_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "purchase", ts("2024-01-01 10:04:00"), 3L),
               (1L, "click", ts("2024-01-01 10:02:00"), 2L),
               (2L, "purchase", ts("2024-01-01 10:05:00"), 5L))
    q.processAllAvailable()
    // the signup arrives a batch later but earlier in event time,
    // inside the 10 min lag (watermark after batch 1 = 09:55)
    in.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L),
               (2L, "click", ts("2024-01-01 10:01:00"), 4L))
    q.processAllAvailable()
    // bystander pushes the watermark past the stages, then fires the
    // flush timeouts
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    in.addData((8L, "view", ts("2024-01-01 12:05:00"), 8L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ofun_out")
      .select("user_id", "t_signup", "t_click", "t_purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val us = (s: String) => ts(s).getTime * 1000L
    assert(got == Set((1L, us("2024-01-01 10:00:00"),
                       us("2024-01-01 10:02:00"),
                       us("2024-01-01 10:04:00"))),
      s"ordered funnel wrong: $got")
    spark.sql("DROP TABLE IF EXISTS ofun_out")
  }

  test("ordered+TTL funnel: disorder completes in event-time order; eviction voids a stale signup; completion removal re-emits") {
    // The composed resident funnel (funnelStepOrderedTtl), three legs:
    // user 1's stages arrive purchase-first inside the lag (disorder —
    // must still convert), then user 2's signup idles past the 30 min
    // TTL and evicts, so the later click+purchase — in event time
    // within a valid funnel — find no signup and must NOT convert;
    // finally user 1 converts a SECOND time after their completion
    // removed state (the funnel_ttl re-emission contract, now under
    // ordering).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.funnelStepOrderedTtl(30L * 60000))
    val q = out.writeStream.format("memory").queryName("oftl_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 purchase+click first, user 2's lone signup
    in.addData((1L, "purchase", ts("2024-01-01 10:04:00"), 3L),
               (1L, "click", ts("2024-01-01 10:02:00"), 2L),
               (2L, "signup", ts("2024-01-01 10:00:00"), 10L))
    q.processAllAvailable()
    // batch 2: user 1's signup, late in processing but earliest in
    // event time (inside the 10 min lag; wm after batch 1 = 09:54)
    in.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    // batches 3+4: bystander pushes the watermark past the stages and
    // past user 2's 30 min TTL, then fires the timeouts — user 1's
    // funnel completes (state removes), user 2 evicts as idle
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 90L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 12:05:00"), 91L))
    q.processAllAvailable()
    // batch 5: user 2's click+purchase — within a valid funnel of the
    // EVICTED signup in event time, but the signup is gone: no hit.
    // user 1 starts a fresh second funnel post-completion.
    in.addData((2L, "click", ts("2024-01-01 12:30:00"), 11L),
               (2L, "purchase", ts("2024-01-01 12:31:00"), 12L),
               (1L, "signup", ts("2024-01-01 12:30:00"), 4L),
               (1L, "click", ts("2024-01-01 12:32:00"), 5L),
               (1L, "purchase", ts("2024-01-01 12:34:00"), 6L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 14:00:00"), 92L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 14:05:00"), 93L))
    q.processAllAvailable()
    q.stop()
    val us = (s: String) => ts(s).getTime * 1000L
    val got = spark.table("oftl_out")
      .select("user_id", "t_signup", "t_purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:04:00")),
        (1L, us("2024-01-01 12:30:00"), us("2024-01-01 12:34:00"))),
      s"ordered+TTL funnel wrong: $got")
    spark.sql("DROP TABLE IF EXISTS oftl_out")
  }

  test("ordered+TTL CEP: disorder still matches in event-time order; idle state evicts; post-eviction purchase misses") {
    // The composed resident spelling (cepStepOrderedTtl): user 2's
    // purchase arrives BEFORE its signup (the disorder leg — fold
    // must wait for the watermark and replay in event-time order),
    // then both users idle past the 30 min TTL and evict (the
    // eviction leg), so user 1's late purchase — inside the 24 h
    // pattern span — finds no live signup (the post-eviction leg).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.cepStepOrderedTtl(86400000000L, 30L * 60000))
    val q = out.writeStream.format("memory").queryName("octtl_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 2's purchase first, user 1's signup. The 8 min
    // disorder span stays INSIDE the 10 min lag: Spark's stateful
    // operator itself discards input older than the watermark, so
    // wider disorder never even reaches the step function.
    in.addData((2L, "purchase", ts("2024-01-01 10:08:00"), 3L),
               (1L, "signup", ts("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    // batch 2: user 2's signup arrives late but inside the lag
    // (watermark after batch 1 = 09:58)
    in.addData((2L, "signup", ts("2024-01-01 10:00:00"), 2L))
    q.processAllAvailable()
    // batches 3+4: bystander pushes the watermark far past both the
    // buffered rows and the 30 min TTL, then fires the timeouts —
    // user 2's purchase folds AFTER its signup (hit), both users
    // then evict as idle
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 12:05:00"), 10L))
    q.processAllAvailable()
    // batch 5: user 1's purchase, inside the 24 h span of its evicted
    // signup — must NOT match
    in.addData((1L, "purchase", ts("2024-01-01 11:58:00"), 4L))
    q.processAllAvailable()
    // flush the trailing purchase for completeness (no emission)
    in.addData((9L, "view", ts("2024-01-01 14:00:00"), 11L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 14:05:00"), 12L))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("octtl_out")
      .select("user_id", "signup_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits == Set((2L, 2L, 3L)),
      s"ordered+TTL CEP wrong: $hits (want {(2,2,3)})")
    spark.sql("DROP TABLE IF EXISTS octtl_out")
  }

  test("ordered paths: reversed cross-batch arrival yields the in-order trigram log") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_type, ts, event_id)
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val out = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.pathStepOrdered)
    val q = out.writeStream.format("memory").queryName("opath_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "d", ts("2024-01-01 10:06:00"), 4L),
               (1L, "c", ts("2024-01-01 10:04:00"), 3L))
    q.processAllAvailable()
    in.addData((1L, "b", ts("2024-01-01 10:02:00"), 2L),
               (1L, "a", ts("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    in.addData((9L, "view", ts("2024-01-01 12:00:00"), 9L)) // push wm
    q.processAllAvailable()
    in.addData((8L, "view", ts("2024-01-01 12:05:00"), 8L)) // fire timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("opath_out").filter(col("user_id") === 1L)
      .select("step1", "step2", "step3", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3))).toSet
    assert(got == Set(("a", "b", "c", 3L), ("b", "c", "d", 4L)),
      s"ordered path log wrong: $got")
    spark.sql("DROP TABLE IF EXISTS opath_out")
  }

  test("ordered TWAP spans: disorder cannot attribute the wrong live value to a span") {
    // The span machine attributes each span the value that was live
    // when it OPENED — arrival disorder on the plain sink would pair
    // durations with the wrong values. Event-time truth for user 1:
    // v=2 @10:00, v=4 @10:02, v=8 @10:06 → spans (120 s, 2.0) and
    // (240 s, 4.0).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // (user_id, event_id, ts, value)
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = in.toDF().toDF("user_id", "event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[(Long, Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.spanStepOrdered)
    val q = out.writeStream.format("memory").queryName("ospan_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, 3L, ts("2024-01-01 10:06:00"), 8.0),
               (1L, 1L, ts("2024-01-01 10:00:00"), 2.0))
    q.processAllAvailable()
    in.addData((1L, 2L, ts("2024-01-01 10:02:00"), 4.0))
    q.processAllAvailable()
    in.addData((9L, 9L, ts("2024-01-01 12:00:00"), 0.0)) // push wm
    q.processAllAvailable()
    in.addData((8L, 8L, ts("2024-01-01 12:05:00"), 0.0)) // fire timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ospan_out").filter(col("user_id") === 1L)
      .select("dur_ms", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((120000L, 2.0), (240000L, 4.0)),
      s"ordered span log wrong: $got")
    spark.sql("DROP TABLE IF EXISTS ospan_out")
  }

  test("ordered EWMA: buffered state survives a checkpoint restart; released prefix equals batch") {
    // The restart contract for the buffer-on-watermark sinks: pending
    // rows, the trailing window, and the fold frontier all live in
    // GroupState, so a kill-and-restart must resume mid-buffer — no
    // re-emission, no gap, and the final released prefix equals the
    // batch events_ewma key on every watermark-released row.
    import graft.engine.Tables
    val base = java.nio.file.Files.createTempDirectory("graft_oewma_ckpt").toString
    val inDir = s"$base/input"
    new java.io.File(inDir).mkdirs()
    val evAll = Tables.events(spark, sfDir)
    val Array(mnUs, mxUs) = evAll
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val cutUs = mnUs + (mxUs - mnUs) / 2
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageOnePart(half, inDir, s"events-$name")
    def drain(): Set[(Long, Long, Double)] = {
      val df = Stream.queries(spark, inDir)("ewma_ordered")
      val q = df.writeStream.format("parquet")
        .option("path", s"$base/oewma")
        .option("checkpointLocation", s"$base/checkpoints/oewma")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.schema(df.schema).parquet(s"$base/oewma")
        .select("event_id", "m", "ewma").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    stage(evAll.filter(unix_micros(col("ts")) <= cutUs), "a")
    val afterA = drain()
    val afterNoop = drain()          // restart, nothing new
    assert(afterNoop == afterA,
      s"empty restart changed the sink: ${(afterNoop -- afterA).take(3)}")
    stage(evAll.filter(unix_micros(col("ts")) > cutUs), "b")
    val finalSink = drain()
    assert(afterA.subsetOf(finalSink), "restart lost released rows")
    val batch = graft.engine.QueriesR11.eventsEwma(spark, sfDir)
      .select(col("event_id"), col("m"), col("ewma"),
              unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val batchSet = batch.map(t => (t._1, t._2, t._3)).toSet
    assert(finalSink.subsetOf(batchSet),
      s"sink emitted rows the batch key lacks: " +
        s"${(finalSink -- batchSet).take(3)}")
    // every row safely behind the final watermark (max ts − 1 h, with
    // a second of slack for the ms-grain watermark) must have released
    val wmSafeUs = mxUs - 3600L * 1000000L - 1000000L
    val mustRelease = batch.filter(_._4 <= wmSafeUs)
      .map(t => (t._1, t._2, t._3)).toSet
    assert(mustRelease.nonEmpty, "fixture too small: nothing behind the watermark")
    assert(mustRelease.subsetOf(finalSink),
      s"watermark-passed rows missing from the sink: " +
        s"${(mustRelease -- finalSink).take(3)}")
    // and the split genuinely exercised the restart: new rows came
    // from the second drain
    assert((finalSink -- afterA).nonEmpty, "second drain released nothing")
  }

  test("state cardinality gates: each stateful sink's store holds exactly its documented row count") {
    // The sinks' 100 TB posture rests on bounded state per key ("one
    // tuple per live user", "32 doubles per user", "one row per
    // (user, type)", "completed funnels self-clean"). Execute the
    // claim instead of trusting the comment: drain each sink and read
    // the state store's final numRowsTotal off the query progress —
    // a state leak (e.g. a variant that forgets to remove() or keys
    // state on the wrong column) fails here long before it OOMs a
    // resident deployment.
    import graft.engine.Tables
    val base = java.nio.file.Files.createTempDirectory("graft_sbound").toString
    val inDir = s"$base/input"
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "events.parquet"),
      java.nio.file.Paths.get(inDir, "events.parquet"))
    val ev = Tables.events(spark, sfDir)
    val nUsers = ev.select("user_id").distinct().count()
    val nUserType = ev.select("user_id", "event_type").distinct().count()
    // TTL eviction expectation, from first principles: the bounded
    // drain's flush batch runs at watermark = max event ms − 1 h; a
    // TTL sink evicts every user whose (last event ms + 24 h) the
    // watermark passed. Survivors carry their state out of the drain.
    val lastMsByUser = ev.groupBy("user_id")
      .agg((max(unix_micros(col("ts"))) / lit(1000L)).cast("long").as("ms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wmMs = lastMsByUser.values.max - 3600000L
    val ttlSurvivors = lastMsByUser.filter {
      case (_, ms) => ms + 24L * 3600000L >= wmMs }.keySet
    val doneUsers = graft.engine.QueriesR2.eventsFunnel(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0)).toSet
    def finalStateRows(name: String): Long = {
      val df = Stream.queries(spark, inDir)(name)
      val q = df.writeStream.format("parquet")
        .option("path", s"$base/$name")
        .option("checkpointLocation", s"$base/cp/$name")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val p = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      assert(p.isDefined, s"$name reported no stateOperators progress")
      p.get.stateOperators.map(_.numRowsTotal).sum
    }
    // one state row per ever-seen user: the per-user machines
    for (name <- Seq("ewma", "ewma_ordered", "transitions",
                     "transitions_ordered", "cep", "cep_ordered",
                     "paths", "paths_ordered", "twap_spans",
                     "twap_spans_ordered", "funnel", "funnel_ordered")) {
      val rows = finalStateRows(name)
      assert(rows == nUsers,
        s"$name state holds $rows rows, want one per user ($nUsers)")
    }
    // dedup keys on (user_id, event_type): one row per distinct pair
    val dedupRows = finalStateRows("dedup")
    assert(dedupRows == nUserType,
      s"dedup state holds $dedupRows rows, want $nUserType")
    // cep_ttl: idle users (last event + 24 h behind the final
    // watermark) evict on the flush batch — the eviction the TTL
    // exists for, visible as state rows < users
    val cepTtlRows = finalStateRows("cep_ttl")
    assert(cepTtlRows == ttlSurvivors.size,
      s"cep_ttl state holds $cepTtlRows rows, want " +
        s"${ttlSurvivors.size} TTL survivors of $nUsers users")
    // cep_ordered_ttl: a user still holding buffered rows is by
    // construction inside the watermark lag, hence never idle — the
    // survivor set is exactly cep_ttl's
    val cepOrdTtlRows = finalStateRows("cep_ordered_ttl")
    assert(cepOrdTtlRows == ttlSurvivors.size,
      s"cep_ordered_ttl state holds $cepOrdTtlRows rows, want " +
        s"${ttlSurvivors.size} TTL survivors of $nUsers users")
    // funnel_ttl: completion REMOVES state, idleness evicts the rest
    // past the TTL — survivors are incomplete AND recently active
    val ttlRows = finalStateRows("funnel_ttl")
    val wantFunnel = (ttlSurvivors -- doneUsers).size
    assert(ttlRows == wantFunnel,
      s"funnel_ttl state holds $ttlRows rows, want $wantFunnel " +
        s"(incomplete ∩ TTL-surviving of $nUsers users)")
    // funnel_ordered_ttl: the EPISODIC machine leaves the store only
    // by idle eviction (a completed user's reset machine rides the
    // same TTL; a buffered user is never idle) — so the survivor set
    // is exactly cep_ordered_ttl's.
    val ordTtlFunRows = finalStateRows("funnel_ordered_ttl")
    assert(ordTtlFunRows == ttlSurvivors.size,
      s"funnel_ordered_ttl state holds $ordTtlFunRows rows, want " +
        s"${ttlSurvivors.size} TTL survivors of $nUsers users")
  }

  test("TTL funnel re-emits on a fresh post-completion funnel; NoTimeout emits once") {
    // The documented divergence between the two funnel variants
    // (r9 advice): completion REMOVES the TTL funnel's state, so a
    // later fresh signup→click→purchase emits a second hit — the
    // resident-mode reading (users can convert twice; a forever
    // tombstone would rebuild the unbounded state TTL evicts). The
    // NoTimeout funnel's done-flag emits once per user forever.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val ttlOut = in.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .as[(Long, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        Stream.funnelStepTtlTs(30L * 60000))
    val in2 = MemoryStream[(Long, String, Timestamp, Long)]
    val plainOut = in2.toDF().toDF("user_id", "event_type", "ts", "event_id")
      .as[(Long, String, Timestamp, Long)]
      .map(r => (r._1, r._2,
        Math.floorDiv(r._3.getTime, 1000L) * 1000000L +
          r._3.getNanos / 1000L, r._4))
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        Stream.funnelStep)
    val q1 = ttlOut.writeStream.format("memory").queryName("fttl_re")
      .outputMode(OutputMode.Append()).start()
    val q2 = plainOut.writeStream.format("memory").queryName("fplain_re")
      .outputMode(OutputMode.Append()).start()
    // conversion 1, all within the TTL
    val c1 = Seq((7L, "signup", ts("2024-01-01 10:00:00"), 1L),
                 (7L, "click", ts("2024-01-01 10:05:00"), 2L),
                 (7L, "purchase", ts("2024-01-01 10:10:00"), 3L))
    // conversion 2: a fresh funnel 20 minutes later, within a new TTL
    val c2 = Seq((7L, "signup", ts("2024-01-01 10:30:00"), 4L),
                 (7L, "click", ts("2024-01-01 10:35:00"), 5L),
                 (7L, "purchase", ts("2024-01-01 10:40:00"), 6L))
    for (batch <- Seq(c1, c2)) {
      in.addData(batch); in2.addData(batch)
      q1.processAllAvailable(); q2.processAllAvailable()
    }
    q1.stop(); q2.stop()
    val ttlHits = spark.table("fttl_re")
      .filter($"user_id" === 7L).count()
    val plainHits = spark.table("fplain_re")
      .filter($"user_id" === 7L).count()
    assert(ttlHits == 2L,
      s"TTL funnel emitted $ttlHits hits for a twice-converting user " +
        "(want 2: completion removes state, a fresh funnel re-emits)")
    assert(plainHits == 1L,
      s"NoTimeout funnel emitted $plainHits hits (want 1: the " +
        "done-flag is once-per-user forever)")
  }

  test("stream-stream interval join matches events to orders within the window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ev = MemoryStream[(Long, Long, Timestamp)] // (event_id, user, ts)
    val or = MemoryStream[(Long, Long, Timestamp)] // (order_id, user, ts)
    val left = ev.toDF().toDF("event_id", "user_id", "e_ts")
      .withWatermark("e_ts", "10 minutes")
    val right = or.toDF().toDF("order_id", "o_user", "o_ts")
      .withWatermark("o_ts", "10 minutes")
    // event joins orders placed in the hour BEFORE the event — both
    // sides need watermarks + the time-bound predicate so Spark can
    // bound the join state (the stream-stream join contract, §7.5)
    val joined = left.join(right,
      col("user_id") === col("o_user") &&
      col("o_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR") &&
      col("o_ts") <= col("e_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    or.addData((100L, 1L, ts("2024-01-01 10:00:00")),
               (101L, 1L, ts("2024-01-01 08:00:00")), // too old for 10:30
               (102L, 2L, ts("2024-01-01 10:15:00")))
    ev.addData((1L, 1L, ts("2024-01-01 10:30:00")),
               (2L, 2L, ts("2024-01-01 10:20:00")),
               (3L, 3L, ts("2024-01-01 10:00:00"))) // no order for user 3
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out")
      .select("event_id", "order_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 102L)))
  }

  test("stream-stream LEFT OUTER join releases null-extended rows on watermark") {
    // The outer-join streaming contract: an unmatched left row may
    // only emit (null-extended) once the watermark proves no future
    // right row can still match it — emitting earlier would be wrong
    // (a match could arrive), never emitting would drop it. Spark
    // gates the release on BOTH watermarks passing the join window.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val pu = MemoryStream[(Long, Long, Timestamp)] // (purchase_id, user, ts)
    val cl = MemoryStream[(Long, Long, Timestamp)] // (click_id, user, ts)
    val left = pu.toDF().toDF("purchase_id", "user_id", "p_ts")
      .withWatermark("p_ts", "10 minutes")
    val right = cl.toDF().toDF("click_id", "c_user", "c_ts")
      .withWatermark("c_ts", "10 minutes")
    val joined = left.join(right,
      col("user_id") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("c_ts") <= col("p_ts"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssoj_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 purchase has a qualifying click; user 2 has none
    cl.addData((500L, 1L, ts("2024-01-01 09:30:00")))
    pu.addData((10L, 1L, ts("2024-01-01 10:00:00")),
               (11L, 2L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    val afterB1 = spark.table("ssoj_out")
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    // the matched row emits promptly; the unmatched one must be HELD
    // (its match window is still open)
    assert(afterB1 == Set(10L),
      s"unmatched row released before the watermark closed it: $afterB1")
    // batch 2: advance BOTH watermarks far past 10:05 + 1h
    cl.addData((501L, 9L, ts("2024-01-01 14:00:00")))
    pu.addData((12L, 9L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    // outer releases ride the NEXT state-eviction pass; nudge once
    cl.addData((502L, 9L, ts("2024-01-01 14:30:00")))
    pu.addData((13L, 9L, ts("2024-01-01 14:30:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssoj_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(rows(10L) == 500L)
    assert(rows.contains(11L) && rows(11L) == -1L,
      s"unmatched purchase never released as a null-extended row: $rows")
  }

  test("streaming dropDuplicates keeps first event per (user, type)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val dedup = in.toDF().toDF("user_id", "event_type", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates(Seq("user_id", "event_type"))
    val q = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "click", ts("2024-01-01 10:00:00")),
               (1L, "click", ts("2024-01-01 10:05:00")),
               (1L, "view", ts("2024-01-01 10:06:00")))
    q.processAllAvailable()
    in.addData((1L, "click", ts("2024-01-01 10:10:00")),
               (2L, "click", ts("2024-01-01 10:11:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dd_out")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 3)
    assert(rows.toSet == Set((1L, "click"), (1L, "view"), (2L, "click")))
  }

  test("events_watermark_late streamed: stream drops ⊆ batch drops; injected late rows dropped") {
    // VERDICT r12 #7: the registry key's semantics re-executed through
    // Structured Streaming OVER THE REAL FIXTURE. The fixture itself
    // is ts-monotone in arrival (event_id) order, so the pristine
    // stream must emit every row the batch key keeps; a final batch
    // of injected hours-late rows must be dropped by BOTH executions.
    // Containment direction: the streaming watermark (prior-batch max
    // − 10 min) lags the batch emulation's per-row running max, so
    // anything streaming drops the batch twin must drop too.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val maxTs = fixture.map(_._3.getTime).max
    val lastEid = fixture.map(_._1).max
    // hours-late stragglers, arriving AFTER the whole fixture
    val late = Seq(
      (lastEid + 1, 1L, new Timestamp(maxTs - 6L * 3600 * 1000)),
      (lastEid + 2, 2L, new Timestamp(maxTs - 12L * 3600 * 1000)))
    val in = MemoryStream[(Long, Long, Timestamp)]
    val deduped = in.toDF().toDF("event_id", "user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("event_id", "ts"))
    val q = deduped.writeStream.format("memory").queryName("wml_out")
      .outputMode(OutputMode.Append()).start()
    fixture.grouped(250).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    in.addData(late); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wml_out").select("event_id")
      .collect().map(_.getLong(0)).toSet
    // batch emulation over the SAME augmented arrival sequence
    val augmented = (fixture ++ late).toSeq
      .toDF("event_id", "user_id", "ts")
    val w = org.apache.spark.sql.expressions.Window.orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val batchKept = augmented.withColumn("wm", max("ts").over(w))
      .filter(col("ts") >= col("wm") - expr("INTERVAL 10 MINUTES"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val all = augmented.select("event_id").collect().map(_.getLong(0)).toSet
    val streamDropped = all -- streamed
    val batchDropped = all -- batchKept
    assert(late.map(_._1).toSet.subsetOf(streamDropped),
      "injected late rows must be dropped by the stream")
    assert(streamDropped.subsetOf(batchDropped),
      s"stream dropped rows the batch twin keeps: ${streamDropped -- batchDropped}")
    assert(batchKept.subsetOf(streamed),
      "stream must emit every row the batch key keeps")
    // the pristine fixture equals the registry key exactly
    val keyRows = SparkEntry.queries("events_watermark_late")(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert((streamed -- late.map(_._1).toSet) == keyRows,
      "pristine-fixture stream result must equal the batch registry key")
    spark.sql("DROP TABLE IF EXISTS wml_out")
  }

  test("events_stateful_dedup streamed: ts-order arrival equals the batch registry key") {
    // The registry key keeps the first event per (user_id, event_type)
    // by (ts, event_id); a stream fed in exactly that order through
    // dropDuplicates must keep the identical row set.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                 r.getTimestamp(3)))
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val deduped = in.toDF()
      .toDF("event_id", "user_id", "event_type", "ts")
      .dropDuplicates(Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("sd_out")
      .outputMode(OutputMode.Append()).start()
    fixture.grouped(250).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sd_out").select("event_id")
      .collect().map(_.getLong(0)).toSet
    val keyRows = SparkEntry.queries("events_stateful_dedup")(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == keyRows,
      s"stream/batch diverge: extra=${streamed -- keyRows} missing=${keyRows -- streamed}")
    spark.sql("DROP TABLE IF EXISTS sd_out")
  }

  test("file readStream over the events fixture equals the batch result") {
    // readStream needs a directory: stage the fixture file into one,
    // stream it through the same tumbling-window aggregation as the
    // batch key, and require identical results (streaming ≡ batch for
    // a bounded input with a final watermark-free complete pass).
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val streamed = graft.engine.Tables.repairTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val q = streamed.writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fs_out")
      .select(col("window.start").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = graft.engine.QueriesEvents.eventsTumbling(spark, sfDir)
      .select(col("wstart").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("AvailableNow + foreachBatch: bounded drain writes each microbatch exactly once") {
    // Trigger.AvailableNow is the batch-backfill entry point (drain
    // everything present, then stop on its own); foreachBatch is the
    // arbitrary-sink escape hatch. Together: the reprocessing recipe.
    val dir = java.nio.file.Files.createTempDirectory("graft_an_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "orders.parquet"),
      dir.resolve("orders.parquet"))
    val schema = spark.read.parquet(dir.toString).schema
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.schema(schema).parquet(dir.toString)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.put(id, batch.count()); ()
      }
      .start()
    q.awaitTermination(60000) // AvailableNow self-terminates
    assert(!q.isActive, "AvailableNow query did not self-terminate")
    assert(seen.size() == 1, s"expected exactly one microbatch, got $seen")
    assert(seen.values().iterator().next() == 3L) // F/O/P status rows
  }

  test("resident ProcessingTime trigger: micro-batches advance the checkpoint as files arrive") {
    // the documented §7.5 upgrade path — "swap the trigger and it is a
    // resident streaming job" — executed: the dedup query runs under
    // Trigger.ProcessingTime against a GROWING input directory; a
    // second file arriving mid-run must be picked up by a LATER
    // micro-batch (checkpoint commit id advances, sink grows) with the
    // query still resident afterward.
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_stream_pt").toString
    val inDir = s"$out/input"
    new java.io.File(inDir).mkdirs()
    // split the fixture by user parity so the second file is
    // guaranteed to contain first-seen (user, type) pairs for dedup
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def stage(parity: Int, name: String): Unit = {
      val tmp = s"$out/half$parity"
      raw.filter(col("user_id") % 2 === parity)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(inDir, name))
    }
    stage(0, "batch0.parquet")
    val q = Stream.queries(spark, inDir)("dedup").writeStream
      .format("parquet")
      .option("path", s"$out/dedup")
      .option("checkpointLocation", s"$out/cp")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def committedBatch: Int = new java.io.File(s"$out/cp/commits")
        .list().filterNot(_.startsWith(".")).map(_.toInt).max
      q.processAllAvailable()
      val c1 = spark.read.parquet(s"$out/dedup").count()
      val b1 = committedBatch
      assert(c1 > 0, "first micro-batch wrote no rows")
      stage(1, "batch1.parquet")
      q.processAllAvailable()
      val c2 = spark.read.parquet(s"$out/dedup").count()
      val b2 = committedBatch
      assert(b2 > b1, s"checkpoint did not advance: batch $b1 -> $b2")
      assert(c2 > c1, s"late-arriving file not processed: $c1 -> $c2 rows")
      assert(q.isActive, "resident query terminated on its own")
    } finally q.stop()
  }

  test("graft.Stream entry point: AvailableNow drain writes every sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_t").toString
    val counts = Stream.runAll(spark, sfDir, out)
    assert(counts.keySet ==
      Set("tumbling", "sliding", "sessions", "dedup", "attribution",
          "attribution_outer", "funnel", "funnel_ttl", "funnel_ordered",
          "funnel_ordered_ttl", "ewma", "ewma_ordered", "ohlc",
          "transitions", "transitions_ordered", "cep", "cep_ttl",
          "cep_ordered", "cep_ordered_ttl", "twap_spans",
          "twap_spans_ordered", "paths", "paths_ordered",
          "ewma_ordered_pt", "lake_dedup",
          "ingest_docs", "ingest_rejects", "ingest_filtered",
          "ingest_vecs", "ingest_vrejects", "ingest_vfiltered",
          "ingest_knn", "ingest_forgotten", "ingest_docs_postforget"))
    // the near-dup ingest partitions the staged corpus (IngestSpec
    // proves the semantics; here just that the drain wired it up)
    assert(counts("ingest_docs") > 0 && counts("ingest_filtered") > 0 &&
           counts("ingest_docs") + counts("ingest_rejects") +
             counts("ingest_filtered") >= 500,
      s"docs ingest lost documents: $counts")
    // the GDPR step ran against the live tables: named ids purged
    // (the sharp assertions — no-table-names-them, re-delivery no-op,
    // copycat batch cannot match the forgotten — are requires inside
    // the drain); the post-forget corpus = pre-forget − forgotten +
    // whatever copycats the re-ingest accepted (≥ 0)
    assert(counts("ingest_forgotten") > 0,
      s"forget request list was empty at this sf: $counts")
    assert(counts("ingest_docs_postforget") >=
             counts("ingest_docs") - counts("ingest_forgotten") &&
           counts("ingest_docs_postforget") <= counts("ingest_docs"),
      s"post-forget corpus count out of band: $counts")
    assert(counts("ingest_vecs") > 0 && counts("ingest_vfiltered") > 0 &&
           counts("ingest_vecs") + counts("ingest_vrejects") +
             counts("ingest_vfiltered") >= 500,
      s"embedding ingest lost vectors: $counts")
    // the transactional lake ingest must hold exactly the dedup
    // sink's rows — same stream, exactly-once commits
    val lakeRows = graft.engine.LakeTable.read(spark, s"$out/lake_dedup")
      .collect().map(_.toSeq).toSet
    val dedupRows = spark.read.parquet(s"$out/dedup").collect()
      .map(_.toSeq).toSet
    assert(lakeRows == dedupRows,
      s"lake ingest diverged from the dedup sink: " +
        s"lake-only=${(lakeRows -- dedupRows).take(3)}, " +
        s"sink-only=${(dedupRows -- lakeRows).take(3)}")
    // the CEP sink replays per-user events in (ts, event_id) order
    // with one-tuple state — a bounded drain must equal the batch
    // pattern key row-for-row
    val batchCep = graft.engine.QueriesR13.eventsCepPattern(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val sinkCep = spark.read.parquet(s"$out/cep").collect()
      .map(_.toSeq).toSet
    assert(sinkCep == batchCep,
      s"cep sink diverged from batch: " +
        s"sink-only=${(sinkCep -- batchCep).take(3)}, " +
        s"batch-only=${(batchCep -- sinkCep).take(3)}")
    // on a bounded single-batch drain no event-time timeout fires, so
    // the TTL cep sink must equal the NoTimeout cep sink row-for-row
    val ttlCep = spark.read.parquet(s"$out/cep_ttl").collect()
      .map(_.toSeq).toSet
    val plainCep = spark.read.parquet(s"$out/cep").collect()
      .map(_.toSeq).toSet
    assert(ttlCep == plainCep,
      s"cep_ttl diverged from cep on a bounded drain: " +
        s"ttl-only=${(ttlCep -- plainCep).take(3)}, " +
        s"plain-only=${(plainCep -- ttlCep).take(3)}")
    // on a bounded single-batch drain no event-time timeout fires, so
    // the TTL funnel must equal the NoTimeout funnel row-for-row
    val plainFunnel = spark.read.parquet(s"$out/funnel").collect()
      .map(_.toSeq).toSet
    val ttlFunnel = spark.read.parquet(s"$out/funnel_ttl").collect()
      .map(_.toSeq).toSet
    assert(ttlFunnel == plainFunnel,
      s"funnel_ttl diverged from funnel on a bounded drain: " +
        s"ttl-only=${(ttlFunnel -- plainFunnel).take(3)}, " +
        s"plain-only=${(plainFunnel -- ttlFunnel).take(3)}")
    // OHLC sink ≡ batch events_ohlc on every CLOSED day: the struct
    // min/max partials are associative, so arrival order cannot change
    // a bar; the only legitimate difference is watermark holdback of
    // the trailing window(s). Derive the expected closed set from the
    // batch key + the final watermark (max ts − 1 h).
    val evAll = graft.engine.Tables.events(spark, sfDir)
    val wmRow = evAll.agg(max(col("ts")).as("mx")).collect()(0)
    val wm = wmRow.getAs[java.sql.Timestamp]("mx")
      .toLocalDateTime.minusHours(1)
    def keyOf(r: org.apache.spark.sql.Row): (String, java.sql.Date) =
      (r.getString(0), r.getAs[java.sql.Date]("day"))
    val batchBars = graft.engine.QueriesR12.eventsOhlc(spark, sfDir)
      .collect()
    val closed = batchBars.filter { r =>
      val dayEnd = r.getAs[java.sql.Date]("day").toLocalDate
        .plusDays(1).atStartOfDay()
      !dayEnd.isAfter(wm)
    }.map(r => keyOf(r) -> r.toSeq).toMap
    val sinkBars = spark.read.parquet(s"$out/ohlc").collect()
      .map(r => keyOf(r) -> r.toSeq).toMap
    assert(closed.keySet.subsetOf(sinkBars.keySet),
      s"watermark-closed bars missing from the sink: " +
        s"${(closed.keySet -- sinkBars.keySet).take(3)}")
    for ((k, row) <- sinkBars) {
      assert(closed.contains(k) ||
             batchBars.exists(b => keyOf(b) == k),
        s"sink emitted a bar the batch key does not have: $k")
      val expected = batchBars.find(b => keyOf(b) == k).get.toSeq
      assert(row == expected,
        s"OHLC bar $k diverged: sink=$row batch=$expected")
    }
    // the EWMA state machine replays per-user events in (ts, event_id)
    // order with the batch key's exact arithmetic — a bounded drain
    // must equal the batch result row-for-row
    val batchEwma = graft.engine.QueriesR11.eventsEwma(spark, sfDir)
      .select("event_id", "m", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sinkEwma = spark.read.parquet(s"$out/ewma")
      .select("event_id", "m", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sinkEwma == batchEwma,
      s"ewma sink diverged from batch: sink-only=${(sinkEwma -- batchEwma).take(3)}, " +
        s"batch-only=${(batchEwma -- sinkEwma).take(3)}")
    // the ordered variant emits only watermark-released rows on a
    // bounded drain (trailing lag held back, like the windowed
    // sinks) — but every row it DOES emit must match the batch
    // recurrence exactly
    val ordEwma = spark.read.parquet(s"$out/ewma_ordered")
      .select("event_id", "m", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ordEwma.subsetOf(batchEwma),
      s"ewma_ordered emitted rows the batch key does not have: " +
        s"${(ordEwma -- batchEwma).take(3)}")
    // the transition log replays per-user events in (ts, event_id)
    // order with one-triple state — aggregating the sink's pairs must
    // reproduce the batch Markov key's counts (and thus its matrix)
    val batchTrans = graft.engine.QueriesR12
      .eventsMarkovTransitions(spark, sfDir)
      .select("cur", "nxt", "n").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sinkTrans = spark.read.parquet(s"$out/transitions")
      .groupBy("cur", "nxt").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(sinkTrans == batchTrans,
      s"transition sink counts diverged from batch: " +
        s"sink-only=${(sinkTrans.toSet -- batchTrans.toSet).take(3)}, " +
        s"batch-only=${(batchTrans.toSet -- sinkTrans.toSet).take(3)}")
    // the ordered variant's released prefix must be a subset of the
    // complete transition log (row-level, same semantics)
    val plainTransRows = spark.read.parquet(s"$out/transitions")
      .collect().map(_.toSeq).toSet
    val ordTransRows = spark.read.parquet(s"$out/transitions_ordered")
      .collect().map(_.toSeq).toSet
    assert(ordTransRows.subsetOf(plainTransRows),
      s"transitions_ordered emitted rows the complete log lacks: " +
        s"${(ordTransRows -- plainTransRows).take(3)}")
    // every ordered variant's released prefix ⊆ its complete log,
    // and non-empty (30 days of data against a 1 h lag: almost
    // everything is watermark-released on the drain's flush batch)
    for ((ord, plain) <- Seq("cep_ordered" -> "cep",
                             "paths_ordered" -> "paths",
                             "twap_spans_ordered" -> "twap_spans",
                             "funnel_ordered" -> "funnel")) {
      val ordRows = spark.read.parquet(s"$out/$ord")
        .collect().map(_.toSeq).toSet
      val plainRows = spark.read.parquet(s"$out/$plain")
        .collect().map(_.toSeq).toSet
      assert(ordRows.nonEmpty, s"$ord released nothing on the drain")
      assert(ordRows.subsetOf(plainRows),
        s"$ord emitted rows the complete $plain log lacks: " +
          s"${(ordRows -- plainRows).take(3)}")
    }
    // the TTL-composed ordered CEP emits exactly what the ordered CEP
    // does on a bounded drain — eviction removes state, never rows
    val ordTtlCep = spark.read.parquet(s"$out/cep_ordered_ttl")
      .collect().map(_.toSeq).toSet
    val ordCep = spark.read.parquet(s"$out/cep_ordered")
      .collect().map(_.toSeq).toSet
    assert(ordTtlCep == ordCep,
      s"cep_ordered_ttl diverged from cep_ordered on a bounded drain: " +
        s"ttl-only=${(ordTtlCep -- ordCep).take(3)}, " +
        s"ord-only=${(ordCep -- ordTtlCep).take(3)}")
    // the EPISODIC composition on the funnel: every once-per-user hit
    // is an episodic FIRST episode (identical row — the two folds
    // agree until the first completion), and the fixture genuinely
    // holds re-converting users, so the episodic log is a strict
    // superset (62 vs 15 at sf0.001; runAll pins the exact episodic
    // count against a plain-Scala fold reference)
    val ordTtlFun = spark.read.parquet(s"$out/funnel_ordered_ttl")
      .collect().map(_.toSeq).toSet
    val ordFun = spark.read.parquet(s"$out/funnel_ordered")
      .collect().map(_.toSeq).toSet
    assert(ordFun.subsetOf(ordTtlFun),
      s"funnel_ordered hits missing from the episodic log: " +
        s"${(ordFun -- ordTtlFun).take(3)}")
    assert(ordTtlFun.size > ordFun.size,
      s"episodic funnel found no re-conversions (${ordTtlFun.size}) — " +
        "fixture regressed or episodes are being dropped")
    // the TWAP span log replays per-user events with one-pair state;
    // rolling its spans up with the batch key's own arithmetic must
    // reproduce events_twap_daily exactly
    def twapRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
                 r.getLong(3), r.getDouble(4))).toSet
    val batchTwap = twapRows(
      graft.engine.QueriesR14.eventsTwapDaily(spark, sfDir))
    val sinkTwap = twapRows(spark.read.parquet(s"$out/twap_spans")
      .withColumn("wv", round(col("value") * col("dur_ms"), 6)
        .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_spans"), sum("dur_ms").as("total_ms"),
           sum("wv").as("swv"))
      .select(col("user_id"), col("day"), col("n_spans"),
              col("total_ms"),
              round(col("swv").cast("double") / col("total_ms"), 6)
                .as("twap")))
    assert(sinkTwap == batchTwap,
      s"twap span rollup diverged from batch: " +
        s"sink-only=${(sinkTwap -- batchTwap).take(3)}, " +
        s"batch-only=${(batchTwap -- sinkTwap).take(3)}")
    // the path log replays per-user events with two-type state;
    // rolling its trigrams up with the batch key's ranking must
    // reproduce the events_user_paths top-25 row-for-row
    val batchPaths = graft.engine.QueriesR14
      .eventsUserPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3), r.getInt(4))).toSeq
    val sinkPaths = spark.read.parquet(s"$out/paths")
      .groupBy("step1", "step2", "step3").count()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("count").desc, col("step1"), col("step2"), col("step3"))))
      .filter(col("rank") <= 25).orderBy("rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3), r.getInt(4))).toSeq
    assert(sinkPaths == batchPaths,
      s"path sink rollup diverged from batch key")
    // outer ⊇ inner: every matched pair must also reach the outer sink
    // (its null-extension rows are EXTRA, gated by the watermark)
    assert(counts("attribution_outer") >= counts("attribution"),
      s"outer sink smaller than inner: $counts")
    // the stream-stream interval join is an INNER join: matched rows
    // emit when both sides are seen, so a bounded drain must equal the
    // batch spelling of the same join pair-for-pair
    val evB = graft.engine.Tables.events(spark, sfDir)
    val cB = evB.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("c_ts"))
    val pB = evB.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts").as("p_ts"))
    val batchPairs = pB.join(cB,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sinkPairs = spark.read.parquet(s"$out/attribution")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sinkPairs == batchPairs,
      s"interval-join sink diverged from batch: sink=${sinkPairs.size} batch=${batchPairs.size}")
    // dedup emits one row per (user_id, event_type) with no watermark
    // holdback. Streaming dropDuplicates keeps the first-ARRIVED row
    // (microbatch/partition-order dependent) while the batch key keeps
    // the first by (ts, event_id) — so row CONTENTS may legitimately
    // differ; the guaranteed equivalence is the KEY SET, which is what
    // is asserted here (and the count follows from it).
    val sinkKeys = spark.read.parquet(s"$out/dedup")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchKeys = graft.engine.QueriesEvents
      .eventsStatefulDedup(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sinkKeys == batchKeys,
      s"dedup key set diverged: sink-only=${sinkKeys -- batchKeys}, " +
        s"batch-only=${batchKeys -- sinkKeys}")
    assert(counts("dedup") == batchKeys.size)
    // the funnel state machine replays each user's events in (ts,
    // event_id) order, so a single bounded drain must reproduce the
    // batch events_funnel key row-for-row on COMPLETED funnels
    // (stage 3); incomplete funnels stay in state and emit nothing
    val batchFunnel = graft.engine.QueriesR2.eventsFunnel(spark, sfDir)
      .filter(col("stage") === 3)
      .select("user_id", "t_signup", "t_click", "t_purchase").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getTimestamp(3))).toSet
    val sinkFunnel = spark.read.parquet(s"$out/funnel")
      .select("user_id", "t_signup", "t_click", "t_purchase").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getTimestamp(3))).toSet
    assert(sinkFunnel == batchFunnel,
      s"funnel sink diverged from batch: sink=${sinkFunnel.size} " +
        s"batch=${batchFunnel.size}")
    // windowed sinks hold back trailing windows; they must still have
    // emitted the bulk of the bounded input
    assert(counts("tumbling") > 0 && counts("sessions") > 0, counts.toString)
  }

  test("flatMapGroupsWithState: custom running-max state per user") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val updates = in.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Double]) =>
          val prev = state.getOption.getOrElse(Double.NegativeInfinity)
          val mx = math.max(prev, rows.map(_._2).max)
          state.update(mx)
          Iterator((user, mx))
      }
    val q = updates.toDF("user_id", "running_max")
      .writeStream.format("memory").queryName("fmgs_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, 5.0), (1L, 3.0), (2L, 1.0))
    q.processAllAvailable()
    in.addData((1L, 4.0), (2L, 9.0))   // state must persist across batches
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fmgs_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1L, 5.0), (2L, 1.0), (2L, 9.0)))
  }

  test("flatMapGroupsWithState: event-time TTL evicts idle users' state") {
    // The resident-deployment upgrade path the round-4 addendum
    // documents: per-user funnel state must not grow with the user
    // population — idle users are EVICTED when the event-time
    // watermark passes their last activity + TTL. The timeout branch
    // (hasTimedOut) emits a final record and removes the state, so
    // resident state is bounded by ACTIVE users only.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val ttlMs = 30 * 60 * 1000L
    val updates = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, _) = state.get
            state.remove()
            Iterator((user, n, true)) // the eviction record
          } else {
            val evs = rows.toSeq
            val (n0, last0) = state.getOption.getOrElse((0L, 0L))
            val last = math.max(last0, evs.map(_._2.getTime).max)
            state.update((n0 + evs.size, last))
            state.setTimeoutTimestamp(last + ttlMs)
            Iterator.empty
          }
      }
    val q = updates.toDF("user_id", "n_events", "evicted")
      .writeStream.format("memory").queryName("ttl_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: users 1 and 2 active around 10:00; TTLs land ~10:35
    in.addData((1L, ts("2024-01-01 10:00:00")),
               (1L, ts("2024-01-01 10:05:00")),
               (2L, ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    // batch 2: user 2 stays active at 11:30 (resets their TTL to
    // 12:00); watermark advances to 11:20 — past user 1's 10:35
    in.addData((2L, ts("2024-01-01 11:30:00")))
    q.processAllAvailable()
    // batch 3: unrelated user 3 triggers the batch in which the 11:20
    // watermark is live — user 1 must time out; user 2 must not
    in.addData((3L, ts("2024-01-01 11:40:00")))
    q.processAllAvailable()
    q.stop()
    val evicted = spark.table("ttl_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(evicted == Set((1L, 2L, true)),
      s"expected exactly user 1 evicted with 2 counted events: $evicted")
  }

  test("native session_window groups events by 30-min gaps") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sess = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, ts("2024-01-01 10:00:00")),
               (1L, ts("2024-01-01 10:10:00")),   // same session
               (1L, ts("2024-01-01 11:30:00")))   // new session
    q.processAllAvailable()
    in.addData((1L, ts("2024-01-01 20:00:00")))   // close both via watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out")
      .select(col("session_window.start").cast("string"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("2024-01-01 10:00:00") == 2L)
    assert(rows("2024-01-01 11:30:00") == 1L)
  }

  test("CDC stage(): crash mid-write leaves nothing visible; re-run restages the full version") {
    // The r12 medium advice pinned executable: a writer that dies
    // between the scratch write and the publish rename must leave the
    // version (a) invisible to the stream glob and (b) NOT marked
    // done, so the re-run stages every row. We simulate the corpse a
    // crashed stage() leaves: a half-written dot-prefixed scratch dir.
    import spark.implicits._
    import graft.engine.LakeTable
    val work = java.nio.file.Files
      .createTempDirectory("graft_cdc_crash").toString
    val feedRoot = s"$work/feed"
    val stagingDir = s"$work/staging"
    LakeTable.append(
      Seq((1L, "x", "insert"), (2L, "y", "insert"))
        .toDF("key", "status", "change_type"), feedRoot)
    // the corpse: partial scratch for version 0, never published
    val scratch = new java.io.File(stagingDir, ".stage-v0000000000")
    scratch.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(scratch, "part-00000.parquet").toPath,
      "torn".getBytes("UTF-8"))
    // invisible: the version glob matches nothing
    assert(new java.io.File(stagingDir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).isEmpty)
    // the re-run wipes the corpse and stages the WHOLE version
    val staged = CdcStream.stage(spark, feedRoot, stagingDir)
    assert(staged == Seq(0L), s"restage saw $staged")
    val vDir = new java.io.File(stagingDir, "v0000000000")
    assert(vDir.isDirectory, "version must be published as a directory")
    assert(spark.read.parquet(vDir.toString).count() == 2,
      "restaged version must carry every committed row")
    assert(!scratch.exists(), "corpse must be gone after publish")
    // idempotent: a second stage() call sees the version as done
    assert(CdcStream.stage(spark, feedRoot, stagingDir).isEmpty)
  }

  test("lake CDC feed -> streaming IVM: second drain processes exactly the post-checkpoint commits") {
    import spark.implicits._
    import graft.engine.{LakeTable, QueriesR16}
    val work = java.nio.file.Files
      .createTempDirectory("graft_cdc_ivm").toString
    val feedRoot = s"$work/feed"
    val viewRoot = s"$work/view"
    def dec(rows: Seq[(Long, String, Double)]) =
      rows.toDF("key", "status", "p")
        .select($"key", $"status",
          $"p".cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 2)).as("price"))
    val v0 = dec(Seq((1L, "x", 10.00), (2L, "x", 5.00),
                     (3L, "x", 7.00), (4L, "y", 1.00)))
    // v0 -> v1: delete key 2, reprice key 3, insert key 5 — the
    // LakeTableSpec IVM fixture, consumed through streaming this time
    val v1 = dec(Seq((1L, "x", 10.00), (3L, "x", 6.00),
                     (4L, "y", 1.00), (5L, "x", 2.50)))
    // feed commit 0: the bootstrap — v0 itself as inserts
    LakeTable.append(
      v0.withColumn("change_type", lit("insert")), feedRoot)
    val (view1, rows1) = CdcStream.drainIvm(spark, feedRoot, work, viewRoot)
    assert(rows1 == 4L, s"first drain saw $rows1 rows, wanted v0's 4")
    val got1 = view1.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got1 == Seq(("x", 3L, 22.00), ("y", 1L, 1.00)), s"got $got1")
    // retention: prune the consumed version's staged files (keep the
    // dir as the done-marker) — the stream checkpoint already recorded
    // them, so the next drain must neither re-stage nor re-process
    assert(CdcStream.pruneStaging(s"$work/staging", 0L) == Seq(0L))
    assert(CdcStream.stage(spark, feedRoot, s"$work/staging").isEmpty,
      "pruned version must still read as staged (idempotence marker)")
    assert(CdcStream.pruneStaging(s"$work/staging", 0L).isEmpty,
      "second prune of the same version must be a no-op")
    // feed commit 1: the v0 -> v1 CDC delta
    val feedB = QueriesR16.ivmSumFeed(v0, v1)
    LakeTable.append(feedB, feedRoot)
    val nB = feedB.count()
    val (view2, rows2) = CdcStream.drainIvm(spark, feedRoot, work, viewRoot)
    // EXACTLY the post-checkpoint commit — not a reprocess of commit 0
    assert(rows2 == nB,
      s"second drain saw $rows2 rows, wanted exactly feed B's $nB")
    // streamed IVM state equals the batch ivmSumRefresh result
    val streamed = view2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val batch = QueriesR16.ivmSumRefresh(v0, v1)
      .select(col("status"), col("n"), col("sum_price"), col("avg_price"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(streamed == batch,
      s"streamed view $streamed != batch refresh $batch")
    // exactly-once: re-delivering the last microbatch is a no-op
    // (same token, view version unchanged)
    val vBefore = LakeTable.latestVersion(spark, viewRoot).get
    val replay = LakeTable.read(spark, feedRoot)
    assert(LakeTable.rewriteTxn(replay, viewRoot, "cdc_ivm", 1L).isEmpty)
    assert(LakeTable.latestVersion(spark, viewRoot).get == vBefore)
  }

  // ---- r13 verdict #5: streaming twins for the rest of the H-family ----

  /** Stages the events fixture into `<out>/input` and drains ONE named
    * Stream sink into parquet; returns the sink read back with its
    * own schema. */
  private def drainOne(name: String, out: String) = {
    val inDir = s"$out/input"
    new java.io.File(inDir).mkdirs()
    val tgt = java.nio.file.Paths.get(inDir, "events.parquet")
    if (!java.nio.file.Files.exists(tgt))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sfDir, "events.parquet"), tgt)
    val df = Stream.queries(spark, inDir)(name)
    val q = df.writeStream.format("parquet")
      .option("path", s"$out/$name")
      .option("checkpointLocation", s"$out/checkpoints/$name")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(df.schema).parquet(s"$out/$name")
  }

  test("events_sliding streamed: watermark-closed windows equal the batch registry key") {
    val out = java.nio.file.Files.createTempDirectory("graft_sliding_t").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("wstart").cast("string"), col("event_type"),
              col("cnt"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getDouble(3)))
    val sink = rows(drainOne("sliding", out)).toSet
    val batchDf = SparkEntry.queries("events_sliding")(spark, sfDir)
    val batch = rows(batchDf).toSet
    // every sink window must match its batch twin EXACTLY (count and
    // 4dp sum), and every window the final watermark closed
    // (wend < max ts − 10 min) must have emitted
    assert(sink.subsetOf(batch),
      s"sink emitted windows the batch key does not have: " +
        s"${(sink -- batch).take(3)}")
    val wm = graft.engine.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
      .toLocalDateTime.minusMinutes(10)
    val closed = rows(batchDf.filter(
      (col("wstart") + expr("INTERVAL 1 HOUR")).cast("timestamp") <
        lit(java.sql.Timestamp.valueOf(wm)))).toSet
    assert(closed.nonEmpty, "fixture too small: no closed sliding window")
    assert(closed.subsetOf(sink),
      s"watermark-closed windows missing from the sink: " +
        s"${(closed -- sink).take(3)}")
  }

  test("events_session streamed: native session_window drain equals the batch gaps-and-islands key") {
    // Batch s_end = last event's ts; native session_window end =
    // last event's ts + gap. Map the batch key by +30 min and the
    // two spellings must agree session-for-session: same start, same
    // event count, same (shifted) end. Closed sessions (window end
    // < final watermark = max ts − 30 min) must all have emitted.
    val out = java.nio.file.Files.createTempDirectory("graft_session_t").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("s_start").cast("string"),
              col("s_end").cast("string"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getLong(3)))
    val sink = rows(drainOne("sessions", out)).toSet
    val batchDf = SparkEntry.queries("events_session")(spark, sfDir)
      .select(col("user_id"), col("s_start"),
              (col("s_end") + expr("INTERVAL 30 MINUTES")).as("s_end"),
              col("n_events"))
    val batch = rows(batchDf).toSet
    assert(sink.subsetOf(batch),
      s"sink emitted sessions the batch key does not have: " +
        s"${(sink -- batch).take(3)}")
    val wm = graft.engine.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
      .toLocalDateTime.minusMinutes(30)
    val closed = rows(batchDf.filter(
      col("s_end").cast("timestamp") <
        lit(java.sql.Timestamp.valueOf(wm)))).toSet
    assert(closed.nonEmpty, "fixture too small: no closed session")
    assert(closed.subsetOf(sink),
      s"watermark-closed sessions missing from the sink: " +
        s"${(closed -- sink).take(3)}")
  }

  test("stateful funnel: kill-and-restart on the checkpoint is exactly-once into the parquet sink") {
    // The checkpoint contract a resident deployment lives on: drain
    // half the feed, stop (the "kill" — AvailableNow terminates the
    // query; the checkpoint holds committed offsets + funnel state),
    // restart with nothing new (must re-emit NOTHING — re-delivery
    // protection), then restart with the second half (must resume
    // the state machines mid-funnel, not reprocess the first half).
    // Final sink ≡ the batch events_funnel key's completed funnels.
    import graft.engine.Tables
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_t").toString
    val inDir = s"$base/input"
    new java.io.File(inDir).mkdirs()
    val evAll = Tables.events(spark, sfDir)
    // cut at the MEDIAN completed-funnel purchase time so roughly
    // half the funnels complete in each drain — a midpoint-of-ts cut
    // left every completion in the first half on this fixture
    val purchUs = SparkEntry.queries("events_funnel")(spark, sfDir)
      .filter(col("stage") === 3)
      .select(unix_micros(col("t_purchase")))
      .collect().map(_.getLong(0)).sorted
    assert(purchUs.length >= 2, "fixture has too few completed funnels")
    val cutUs = purchUs(purchUs.length / 2) - 1
    // per-user cross-batch (ts, …) order holds because the cut is on
    // ts: every file-A event precedes every file-B event in time
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageOnePart(half, inDir, s"events-$name")
    def drainFunnel(): Set[Seq[Any]] = {
      val df = Stream.queries(spark, inDir)("funnel")
      val q = df.writeStream.format("parquet")
        .option("path", s"$base/funnel")
        .option("checkpointLocation", s"$base/checkpoints/funnel")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.schema(df.schema).parquet(s"$base/funnel")
        .collect().map(_.toSeq).toSet
    }
    stage(evAll.filter(unix_micros(col("ts")) <= cutUs), "a")
    val afterA = drainFunnel()
    val afterNoop = drainFunnel()    // restart, nothing new
    assert(afterNoop == afterA,
      s"restart with no new data re-emitted rows: " +
        s"${(afterNoop -- afterA).take(3)}")
    stage(evAll.filter(unix_micros(col("ts")) > cutUs), "b")
    val finalSink = drainFunnel()
    assert(afterA.subsetOf(finalSink),
      "restart lost rows the first drain had committed")
    val batch = SparkEntry.queries("events_funnel")(spark, sfDir)
      .filter(col("stage") === 3)
      .select("user_id", "t_signup", "t_click", "t_purchase")
      .collect().map(_.toSeq).toSet
    assert(finalSink == batch,
      s"kill-and-restart drain diverged from batch: " +
        s"sink-only=${(finalSink -- batch).take(3)}, " +
        s"batch-only=${(batch -- finalSink).take(3)}")
    // and the split genuinely exercised the restart path: at least
    // one funnel completed only in the second drain
    assert((finalSink -- afterA).nonEmpty,
      "fixture cut left no funnel spanning the restart; move the cut")
  }
}
