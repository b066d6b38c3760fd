package graft

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}

/** Model-based property test for the buffer-on-watermark recipe: every
  * ordered step function, driven over RANDOM microbatch schedules —
  * random arrival disorder (bounded and unbounded), random batch
  * sizes, the resulting Spark watermark progression, and genuinely
  * late rows — must release exactly what the plain in-order machine
  * produces over the rows a real Spark pipeline would have admitted.
  *
  * This generalizes StreamingSpec's hand-written disorder tests to
  * hundreds of schedules, with no streaming-query overhead: the steps
  * run against [[TestGroupState]] (Spark's public harness for exactly
  * this), so one seed costs microseconds.
  *
  * The admission model mirrors the real operator stack: a row
  * delivered in batch b reaches the step only if its event time is
  * newer than the fold frontier the state carried OUT of batch b−1
  * (which the steps pin to the watermark; Spark's stateful operator
  * drops below-watermark input upstream with the same boundary — see
  * wmAdmit's doc note). Every invocation may fold, so released rows
  * must also never exceed the invoking watermark, and nothing may
  * ever release twice — both asserted per batch.
  */
class OrderedRecipePropertySpec extends SparkTestBase {

  private val lagMs = 600000L                  // 10 min, as the sinks use
  private val baseUs = 1704067200000000L      // 2024-01-01 00:00 UTC

  private def tsOf(us: Long): Timestamp = {
    val sec = Math.floorDiv(us, 1000000L)
    val t = new Timestamp(sec * 1000L)
    t.setNanos(((us - sec * 1000000L) * 1000L).toInt)
    t
  }

  /** One synthetic event; each machine projects the fields it uses. */
  private case class Ev(eid: Long, us: Long, typ: String, value: Double)

  /** A random schedule: batches in arrival order plus the watermark
    * (ms) Spark would run each batch with (max event time seen in
    * EARLIER batches minus the lag), and a final high-watermark flush
    * batch that releases everything. */
  private case class Schedule(batches: Seq[Seq[Ev]], wms: Seq[Long])

  private def genSchedule(rnd: scala.util.Random): Schedule = {
    val n = 20 + rnd.nextInt(30)
    val spanUs = 2L * 86400 * 1000000L         // 2 days, crosses midnight
    val types = Seq("signup", "click", "purchase", "error", "view")
    val events = (1 to n).map { i =>
      Ev(i.toLong, baseUs + rnd.between(0L, spanUs),
         types(rnd.nextInt(types.length)),
         math.floor(rnd.nextDouble() * 1e4) / 1e2)
    }
    // arrival order: bounded displacement (disorder inside the lag,
    // mostly admitted) or a full shuffle (many true stragglers)
    val arrival =
      if (rnd.nextBoolean())
        events.sortBy(e => e.us + rnd.between(-lagMs * 500L, lagMs * 500L))
      else rnd.shuffle(events)
    val batches = scala.collection.mutable.ArrayBuffer[Seq[Ev]]()
    var rest = arrival
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(7)
      batches += rest.take(k)
      rest = rest.drop(k)
    }
    batches += Seq.empty                       // the final flush batch
    var seenMaxMs = 0L
    val wms = batches.map { b =>
      val wm = math.max(0L, seenMaxMs - lagMs)
      seenMaxMs = math.max(seenMaxMs,
        (b.map(_.us / 1000L) :+ seenMaxMs).max)
      wm
    }.toSeq
    // flush: one watermark safely past every event
    Schedule(batches.toSeq,
      wms.init :+ (events.map(_.us / 1000L).max + lagMs + 1000L))
  }

  /** The admission model: which events a real run would fold (rows
    * newer than the frontier carried out of the previous batch).
    * The frontier sits one µs below the watermark — Spark's late
    * filter ADMITS rows at the watermark, and wmAdmit's strict
    * release keeps exactly that boundary (r14 ADVICE #1). */
  private def admitted(s: Schedule): Seq[Ev] = {
    var frontierUs = Long.MinValue
    val kept = scala.collection.mutable.ArrayBuffer[Ev]()
    s.batches.zip(s.wms).foreach { case (rows, wm) =>
      kept ++= rows.filter(_.us > frontierUs)
      frontierUs = math.max(frontierUs, wm * 1000L - 1)
    }
    kept.toSeq
  }

  /** Drives an ordered step across the schedule's invocations,
    * asserting per batch that nothing releases beyond the watermark;
    * returns everything released, in release order. */
  private def drive[S, R, O](s: Schedule, uid: Long,
      toRow: Ev => R, usOf: O => Option[Long],
      step: (Long, Iterator[R], GroupState[S]) => Iterator[O]): Seq[O] = {
    var st: Optional[S] = Optional.empty()
    val out = scala.collection.mutable.ArrayBuffer[O]()
    s.batches.zip(s.wms).foreach { case (rows, wm) =>
      val g = TestGroupState.create[S](st,
        GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wm), false)
      val released = step(uid, rows.map(toRow).iterator, g).toSeq
      released.flatMap(usOf(_)).foreach { us =>
        assert(us <= wm * 1000L,
          s"released an event at $us µs past the wm ${wm}ms")
      }
      out ++= released
      st = if (g.isRemoved) Optional.empty()
           else g.getOption.map(Optional.of[S](_)).getOrElse(st)
    }
    out.toSeq
  }

  /** The plain machine over the admitted rows — the batch-equivalent
    * reference (its sinks are drain-tested against the oracle-checked
    * batch keys). One NoTimeout invocation; the plain steps sort. */
  private def plainRun[S, R, O](rows: Seq[R], uid: Long,
      step: (Long, Iterator[R], GroupState[S]) => Iterator[O]): Seq[O] = {
    val g = TestGroupState.create[S](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    step(uid, rows.iterator, g).toSeq
  }

  private def asBag[O](xs: Seq[O]): Map[String, Int] =
    xs.groupBy(_.toString).map { case (k, v) => k -> v.size }

  private def checkSeed(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val s = genSchedule(rnd)
    val kept = admitted(s)
    val uid = 7L

    // EWMA
    val ewmaGot = drive[Stream.EwmaOrdState,
        (Long, Long, Timestamp, Double), Stream.EwmaPoint](
      s, uid, e => (e.eid, uid, tsOf(e.us), e.value),
      p => Some(p.us), Stream.ewmaStepOrdered)
    val ewmaWant = plainRun[Stream.EwmaState,
        (Long, Long, Long, Double), Stream.EwmaPoint](
      kept.map(e => (e.eid, uid, e.us, e.value)), uid, Stream.ewmaStep)
    assert(asBag(ewmaGot) == asBag(ewmaWant),
      s"seed=$seed ewma: got ${ewmaGot.size} want ${ewmaWant.size}; " +
        s"diff=${(ewmaWant.toSet -- ewmaGot.toSet).take(2)}")

    // transitions
    val transGot = drive[Stream.TransOrdState,
        (Long, String, Timestamp, Long), Stream.TransRow](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      r => Some(r.us), Stream.transStepOrdered)
    val transWant = plainRun[Stream.TransState,
        (Long, String, Long, Long), Stream.TransRow](
      kept.map(e => (uid, e.typ, e.us, e.eid)), uid, Stream.transStep)
    assert(asBag(transGot) == asBag(transWant), s"seed=$seed transitions")

    // CEP (24 h span)
    val span = 86400000000L
    val cepGot = drive[Stream.CepOrdState,
        (Long, String, Timestamp, Long), Stream.CepHit](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      h => Some(h.t_purchase), Stream.cepStepOrdered(span))
    val cepWant = plainRun[Stream.CepState,
        (Long, String, Long, Long), Stream.CepHit](
      kept.map(e => (uid, e.typ, e.us, e.eid)), uid, Stream.cepStep(span))
    assert(asBag(cepGot) == asBag(cepWant), s"seed=$seed cep")

    // CEP ordered+TTL with an effectively-infinite TTL ≡ ordered
    val cepTtlGot = drive[Stream.CepOrdTtlState,
        (Long, String, Timestamp, Long), Stream.CepHit](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      h => Some(h.t_purchase),
      Stream.cepStepOrderedTtl(span, Long.MaxValue / 4))
    assert(asBag(cepTtlGot) == asBag(cepGot), s"seed=$seed cep_ttl-inf")

    // paths
    val pathGot = drive[Stream.PathOrdState,
        (Long, String, Timestamp, Long), Stream.PathRow](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      r => Some(r.us), Stream.pathStepOrdered)
    val pathWant = plainRun[Stream.Path2State,
        (String, Long, Long), Stream.PathRow](
      kept.map(e => (e.typ, e.us, e.eid)), uid, Stream.pathStep)
    assert(asBag(pathGot) == asBag(pathWant), s"seed=$seed paths")

    // funnel (stage machine with the (ts, stage-rank, event_id) sort)
    val funGot = drive[Stream.FunnelOrdState,
        (Long, String, Timestamp, Long), Stream.FunnelHit](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      h => Some(h.t_purchase), Stream.funnelStepOrdered)
    val funWant = plainRun[Stream.FunnelState,
        (Long, String, Long, Long), Stream.FunnelHit](
      kept.map(e => (uid, e.typ, e.us, e.eid)), uid, Stream.funnelStep)
    assert(asBag(funGot) == asBag(funWant), s"seed=$seed funnel: " +
      s"got=$funGot want=$funWant")

    // funnel ordered+TTL with an effectively-infinite TTL ≡ the
    // EPISODIC fold over the admitted sequence (multi-conversion
    // semantics — a completion starts the next episode, so this is
    // a superset of funnel_ordered's once-per-user hits and the
    // chunking must not move, add, or drop an episode)
    val funTtlGot = drive[Stream.FunnelOrdTtlState,
        (Long, String, Timestamp, Long), Stream.FunnelHit](
      s, uid, e => (uid, e.typ, tsOf(e.us), e.eid),
      h => Some(h.t_purchase),
      Stream.funnelStepOrderedTtl(Long.MaxValue / 4))
    val funTtlWant = Stream.funnelFoldEpisodic(uid)(
      Stream.FunnelState(None, None, None),
      kept.map(e => (e.typ, e.us, e.eid))
        .sortBy(r => (r._2, Seq("signup", "click", "purchase")
          .indexOf(r._1) match { case -1 => 3; case i => i }, r._3)))._1
    assert(asBag(funTtlGot) == asBag(funTtlWant),
      s"seed=$seed funnel_ttl-episodic: got=$funTtlGot want=$funTtlWant")
    assert(funWant.toSet.subsetOf(funTtlGot.toSet),
      s"seed=$seed episodic lost the first conversion")

    // TWAP spans (2-day span exercises the same-day-only rule)
    val spanGot = drive[Stream.SpanOrdState,
        (Long, Long, Timestamp, Double), Stream.SpanRow](
      s, uid, e => (uid, e.eid, tsOf(e.us), e.value),
      _ => None, Stream.spanStepOrdered)
    val spanWant = plainRun[Stream.SpanState,
        (Long, Long, Double), Stream.SpanRow](
      kept.map(e => (e.eid, e.us, e.value)), uid, Stream.spanStep)
    assert(asBag(spanGot) == asBag(spanWant), s"seed=$seed twap")
  }

  test("property: every ordered machine over random disordered schedules equals the plain in-order machine on admitted rows") {
    (1 to 60).foreach(checkSeed)
  }
}
