package graft

import org.apache.spark.sql.functions._

import graft.engine.{QueriesR14, Tables}

/** Behavior pins for the round-9 wave-7 keys — full driver-side
  * re-derivations at sf0.001 (the graph and TWAP algebra) plus the
  * structural invariants the DuckDB hash match can't express.
  */
class QueriesR14Spec extends SparkTestBase {

  test("graph_jaccard_neighbors equals a driver-side recompute") {
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sup"), col("o_custkey").as("cust"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      (a, na) <- nbrs.toSeq
      (b, nb) <- nbrs.toSeq if a < b
      common = (na & nb).size if common > 0
      union = na.size + nb.size - common if common * 5 >= union
    } yield (a, b) -> (common.toLong,
      BigDecimal(common.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val got = QueriesR14.graphJaccardNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("events_user_paths: exactly 25 ranked rows, counts tie to trigrams") {
    val out = QueriesR14.eventsUserPaths(spark, sfDir).collect()
    assert(out.length == 25)
    assert(out.map(_.getInt(4)).toSeq == (1 to 25))
    val ns = out.map(_.getLong(3))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "counts descend with rank")
    // total trigrams across ALL 125 possible paths = Σ max(0, c_u - 2)
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val totalTri = perUser.map(c => math.max(0L, c - 2)).sum
    assert(ns.sum <= totalTri)
  }

  test("exactGlobalRank/exactNtile equal the window spelling on ties") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    import graft.engine.Ops
    // heavy ties (metric = i % 7) + n = 100 ≡ 1 (mod 3): exercises
    // both the tie ordering and the uneven-tile remainder arithmetic
    val df = (0 until 100).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "metric")
    val viaWindow = df
      .withColumn("rnk", row_number().over(W.orderBy("metric", "id")))
      .withColumn("tile", ntile(3).over(W.orderBy("metric", "id")))
      .select("id", "rnk", "tile").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getInt(2)))
      .toMap
    val ranked = Ops.exactGlobalRank(df, Seq(col("metric"), col("id")))
    val gotRnk = ranked.select("id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotTile = Ops.exactNtile(ranked, 3, "tile")
      .select("id", "tile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotRnk == viaWindow.view.mapValues(_._1).toMap)
    assert(gotTile == viaWindow.view.mapValues(_._2).toMap)
  }

  test("orders_rfm_segments: balanced terciles, segment composition") {
    val out = QueriesR14.ordersRfmSegments(spark, sfDir).collect()
    val n = out.length
    assert(n > 0)
    for ((idx, tag) <- Seq(4 -> "r", 5 -> "f", 6 -> "m")) {
      val sizes = out.groupBy(_.getInt(idx)).view.mapValues(_.size)
      assert(sizes.keySet == Set(1, 2, 3), s"$tag tiles present")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$tag terciles balanced (ntile contract)")
    }
    assert(out.forall(r => r.getInt(7) ==
      r.getInt(4) * 100 + r.getInt(5) * 10 + r.getInt(6)))
  }

  test("exactGroupRank equals the per-group window spelling") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    import graft.engine.Ops
    val df = (0 until 90).map(i =>
      (i.toLong, s"g${i % 4}", (i % 5).toLong)).toDF("id", "grp", "metric")
    val viaWindow = df.withColumn("rnk", row_number().over(
        W.partitionBy("grp").orderBy("metric", "id")))
      .withColumn("n", count(lit(1)).over(W.partitionBy("grp")))
      .select("id", "rnk", "n").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap
    val got = Ops.exactGroupRank(df, Seq("grp"),
        Seq(col("metric"), col("id")))
      .select("id", "rnk", "n_total").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == viaWindow)
  }

  test("events_anomaly_mad matches a driver-side replay") {
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (typ, evs) =>
      val med = median(evs.map(_._3).toSeq)
      val mad = median(evs.map(e => math.abs(e._3 - med)).toSeq)
      evs.filter(e => math.abs(e._3 - med) > 4.4478 * mad)
        .map(e => e._1 -> (typ,
          BigDecimal(math.abs(e._3 - med))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = QueriesR14.eventsAnomalyMad(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(5))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("emb_maxsim_topk: rank structure and token-evidence bounds") {
    val out = QueriesR14.embMaxsimTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.nonEmpty)
    val nDocs = Tables.embeddings(spark, sfDir)
      .select(expr("vec_id div 5").as("doc")).distinct().count()
    out.groupBy(_._1).foreach { case (qdoc, rows) =>
      val expectRows = math.min(5L, nDocs - 1) // corpus excludes queries
      assert(rows.length <= 5 && rows.length == expectRows.toInt ||
             rows.length == 5)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"maxsim not non-increasing for query $qdoc")
      // Σ of per-token maxima: each of the 5 query tokens contributes
      // a cosine in [-1, 1] (6 dp-rounded)
      rows.foreach(r => assert(r._3 >= -5.000005 && r._3 <= 5.000005))
      assert(!rows.exists(_._2 == qdoc), "a query never scores itself")
    }
  }

  test("exactPrefixSum equals the window cumsum on ties") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    import graft.engine.Ops
    val df = (0 until 120).map(i =>
      (i.toLong, (i % 9).toLong, if (i % 3 == 0) -1L else 1L))
      .toDF("id", "key", "delta")
    val viaWindow = df.withColumn("ps", sum("delta").over(
        W.orderBy("key", "id")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select("id", "ps").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ops.exactPrefixSum(df, Nil,
        Seq(col("key"), col("id")), "delta")
      .select("id", "prefix_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == viaWindow)
  }

  test("events_rolling_wau matches a driver-side window replay") {
    val du = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)),
                 r.getLong(1)))
    val expected = du.flatMap { case (day, uid) =>
      (0 to 6).map(k => (day.plusDays(k), uid, day)) }
      .groupBy(_._1).map { case (wend, rows) =>
        wend.toString -> (rows.map(_._2).distinct.length.toLong,
                          rows.map(_._3).distinct.length.toLong)
      }
    val got = QueriesR14.eventsRollingWau(spark, sfDir).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("join_pit_scd2: every fact row matches exactly one version") {
    val out = QueriesR14.joinPitScd2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nFacts = Tables.lineitem(spark, sfDir).count()
    // the version ranges partition [orderdate, ∞) and every TPC-H
    // lineitem ships on/after its order date, so the PIT lookup must
    // be a total exactly-once assignment: any double-match inflates
    // the sum, any gap deflates it
    assert(out.map(_._3).sum == nFacts,
      s"PIT join not exactly-once: ${out.map(_._3).sum} vs $nFacts")
    // the late-arriving-dimension cells exist: items that shipped
    // under the PRE-flip status of an order that later flipped
    assert(out.exists { case (pit, rf, _) => pit != "R" && rf == "R" })
    assert(out.exists { case (pit, _, _) => pit == "R" })
  }

  test("events_changepoint matches a driver-side CUSUM replay") {
    def r(v: BigDecimal, sc: Int) =
      v.setScale(sc, BigDecimal.RoundingMode.HALF_UP)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
              to_date(col("ts")).cast("string").as("day"), col("value"))
      .collect().map(x => (x.getString(0), x.getString(1),
                           x.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (typ, evs) =>
      val daily = evs.groupBy(_._2).toSeq.map { case (day, vs) =>
        val sum9 = vs.map(v => r(BigDecimal(v._3), 9)).sum
        day -> r(BigDecimal(sum9.toDouble / vs.size), 6)
      }.sortBy(_._1)
      val g = r(BigDecimal(
        daily.map(_._2).sum.toDouble / daily.size), 9)
      val cs = daily.scanLeft(BigDecimal(0)) {
        case (acc, (_, m)) => acc + r(m - g, 9) }.tail
      val (bestDay, bestS) = daily.map(_._1).zip(cs)
        .sortBy { case (day, s) => (-s.abs, day) }.head
      typ -> (bestDay, r(bestS, 6).toDouble,
              if (bestS > 0) "above" else "below")
    }
    val got = QueriesR14.eventsChangepoint(spark, sfDir).collect()
      .map(x => x.getString(0) -> (x.getDate(1).toString,
        x.getDouble(2), x.getString(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("events_ab_test: one-row readout, honest null result") {
    val out = QueriesR14.eventsAbTest(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out(0)
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == nUsers,
      "arms partition the exposed users")
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
    // assignment ⊥ behavior on fixtures: the readout must be a null
    // result, not a fixture-tuned win
    if (!r.isNullAt(7))
      assert(math.abs(r.getDouble(7)) < 1.96, s"spurious significance")
    assert(r.getInt(8) == 0)
  }

  test("docs_keyphrase_rake matches a driver-side replay") {
    val stop = Set("the", "of", "and", "to", "in", "a", "is", "for")
    def r(v: Double, sc: Int) =
      BigDecimal(v).setScale(sc, BigDecimal.RoundingMode.HALF_UP)
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap { row =>
        val id = row.getLong(0)
        val toks = row.getString(1).split(" ", -1)
        // maximal stopword-free runs
        val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
        var cur = List.empty[String]
        toks.foreach { t =>
          if (stop(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
          else cur ::= t
        }
        if (cur.nonEmpty) runs += cur.reverse
        val occ = runs.flatMap(p => p.map(w => (w, p.length)))
        val ws = occ.groupBy(_._1).map { case (w, os) =>
          w -> r(os.map(_._2).sum.toDouble / os.size, 9)
        }
        val scored = runs.map(p =>
          (p.mkString(" "), r(p.map(ws).sum.toDouble, 6).toDouble))
        scored.groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
          .sortBy { case (ph, sc) => (-sc, ph) }.take(3).zipWithIndex
          .map { case ((ph, sc), i) => (id, ph, sc, i + 1) }
      }.toSet
    val got = QueriesR14.docsKeyphraseRake(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2),
                 x.getInt(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("events_hll_daily: curves inside the HLL envelope, reach monotone") {
    val got = QueriesR14.eventsHllDaily(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byDay = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    got.foreach { case (day, daily, cum) =>
      val exactDaily = byDay(day).size
      val exactCum = days.takeWhile(_ <= day)
        .flatMap(byDay(_)).toSet.size
      assert(math.abs(daily - exactDaily) <= math.max(3, exactDaily / 20),
        s"$day daily $daily vs exact $exactDaily")
      assert(math.abs(cum - exactCum) <= math.max(3, exactCum / 20),
        s"$day cum $cum vs exact $exactCum")
    }
    val cums = got.sortBy(_._1).map(_._3)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "merged reach must be monotone (register-wise max)")
  }

  test("events_hll_rolling7: rolling reach inside the HLL envelope") {
    val got = graft.engine.QueriesR15.eventsHllRolling7(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byDay = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    got.foreach { case (day, est, merged) =>
      // exact trailing-7-day distinct users over active days in range
      val window = days.filter(d2 =>
        d2 <= day && java.time.LocalDate.parse(d2)
          .isAfter(java.time.LocalDate.parse(day).minusDays(7)))
      assert(merged == window.size,
        s"$day merged $merged sketch days, expected ${window.size}")
      val exact = window.flatMap(byDay(_)).toSet.size
      assert(math.abs(est - exact) <= math.max(3, exact / 20),
        s"$day rolling est $est vs exact $exact")
    }
  }

  test("events_peak_concurrency matches a driver-side sweep") {
    val sess = graft.engine.Ops.sessionize(
        Tables.events(spark, sfDir), "user_id", "ts", "event_id",
        "30 minutes")
      .groupBy("user_id", "session_id")
      .agg(min(unix_micros(col("ts"))).as("s"),
           max(unix_micros(col("ts"))).as("e"))
      .collect()
      .map(r => (r.getLong(0) * 1000000L + r.getLong(1),
                 r.getLong(2), r.getLong(3)))
    val eps = sess.flatMap { case (sid, s, e) =>
      Seq((s, 1L, sid), (e, -1L, sid)) }
      .sortBy { case (us, d, sid) => (us, -d, sid) }
    var conc = 0L
    val swept = eps.map { case (us, d, _) => conc += d; (us, conc) }
    val expected = swept.groupBy(_._1 / 86400000000L).map {
      case (day, points) =>
        val peak = points.map(_._2).max
        day -> (peak, points.filter(_._2 == peak).map(_._1).min)
    }
    val got = QueriesR14.eventsPeakConcurrency(spark, sfDir).collect()
      .map(r => (r.getDate(0), r.getLong(1),
                 r.getTimestamp(2).toInstant.toEpochMilli * 1000 +
                   r.getTimestamp(2).getNanos / 1000 % 1000))
      .map { case (day, peak, us) =>
        us / 86400000000L -> (peak, us) }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("docs_bm25_topk matches a driver-side replay") {
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val terms = Seq("hash", "join", "spark")
    val nDocs = texts.length
    val avgdl = texts.map(_._2.length.toDouble).sum / nDocs
    val tf = texts.map { case (id, ts) =>
      id -> terms.map(t => t -> ts.count(_ == t)).filter(_._2 > 0).toMap
    }.toMap
    val df = terms.map(t => t -> tf.values.count(_.contains(t))).toMap
    def r(v: Double, s: Int) =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val scored = tf.toSeq.filter(_._2.nonEmpty).map { case (id, m) =>
      val dl = texts.find(_._1 == id).get._2.length
      val sc = m.map { case (t, f) =>
        r(math.log(1 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
          ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 9)
      }.sum
      (id, m.size.toLong, r(sc.toDouble, 6).toDouble)
    }
    val expected = scored.sortBy(x => (-x._3, x._1)).take(10)
      .zipWithIndex.map { case ((id, n, sc), i) => (id, n, sc, i + 1) }
    val got = QueriesR14.docsBm25Topk(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
                 x.getInt(3))).toSeq
    assert(got == expected)
  }

  test("orders_cohort_ltv: LTV curves accumulate, totals tie out") {
    val out = QueriesR14.ordersCohortLtv(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
                 r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    assert(out.map(_._3).sum == Tables.orders(spark, sfDir).count(),
      "every order lands in exactly one (cohort, offset) cell")
    out.groupBy(_._1).foreach { case (cohort, rows) =>
      val seq = rows.sortBy(_._2)
      assert(seq.head._2 == 0, s"cohort $cohort misses its own month")
      // the LTV curve is the exact running sum of period revenue
      val run = seq.scanLeft(0.0)((acc, r) => acc + r._5).tail
      seq.map(_._6).zip(run).foreach { case (cum, exp) =>
        assert(math.abs(cum - exp) < 1e-6) }
      assert(seq.forall(r => r._4 <= r._3), "actives bounded by orders")
      assert(seq.forall(r => r._5 > 0))
    }
  }

  test("emb_sign_hamming_topk equals an integer driver recompute") {
    // pure integers past the quantizer — the driver replay is exact,
    // no float-accumulation caveats anywhere
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val sigs = vecs.map { case (id, e) =>
      id -> e.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > 0) acc | (1L << i) else acc
      }
    }.toMap
    val qs = sigs.keys.filter(_ % 10 == 0)
    val cs = sigs.keys.filter(_ % 10 != 0).toSeq
    val expected = qs.flatMap { q =>
      cs.map(c => (java.lang.Long.bitCount(sigs(q) ^ sigs(c)), c))
        .sorted.take(10).zipWithIndex
        .map { case ((h, c), i) => (q, c) -> (h, i + 1) }
    }.toMap
    val got = QueriesR14.embSignHammingTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("merge_upsert_delete: tombstoned keys vanish, audit consistent") {
    val out = QueriesR14.mergeUpsertDelete(spark, sfDir).collect()
    val keys = out.map(_.getLong(0)).toSet
    val targetKeys = Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    // matched tombstones delete, everything else survives the merge
    assert(targetKeys.filter(_ % 97 == 0).forall(k => !keys.contains(k)))
    assert(targetKeys.filter(_ % 97 != 0).forall(keys.contains))
    val byAction = out.groupBy(_.getString(3)).view.mapValues(_.length)
    assert(byAction.keySet == Set("keep", "update", "insert"))
    out.filter(_.getString(3) == "insert")
      .foreach(r => assert(r.getLong(0) > 100000000L,
        "inserts arrive only under offset keys"))
    assert(out.filter(_.getString(3) == "update")
      .forall(_.getString(1) == "R"))
  }

  test("events_twap_daily matches a driver-side replay") {
    // micros end-to-end: 999/1000 fixture stamps carry sub-ms digits,
    // so a getTime-based (ms) replay would truncate per-event instead
    // of per-span and silently diverge
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
              unix_micros(col("ts")).as("us"), col("event_id"),
              col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getDouble(4)))
    val expected = rows.groupBy(r => (r._1, r._2)).flatMap {
      case ((uid, day), evs) =>
        val seq = evs.sortBy(e => (e._3, e._4))
        val spans = seq.zip(seq.tail).map { case (cur, nxt) =>
          val durMs = (nxt._3 - cur._3) / 1000L
          (durMs, BigDecimal(cur._5 * durMs)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
        if (spans.isEmpty) None
        else {
          val totalMs = spans.map(_._1).sum
          val swv = spans.map(_._2).sum
          Some((uid, day) -> (spans.size.toLong, totalMs,
            BigDecimal(swv.toDouble / totalMs)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
    }
    val got = QueriesR14.eventsTwapDaily(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
