package graft

import org.apache.spark.sql.functions._

import graft.engine.{Cms, Tables}

/** THE error-envelope gate for the 7 no-oracle registry keys
  * (VERDICT r12 "Next round" #5): every key the driver records as
  * `no_oracle` is exercised HERE, through its registry entry, at
  * sf0.01, against the exact answer computed with stock Spark — so a
  * future sketch regression fails one named suite instead of hiding
  * behind the missing DuckDB hash. The envelopes below are the ones
  * each sketch declares (and that the scattered unit suites —
  * CmsSpec / QskSpec / ThetaSpec / QueriesR14Spec — prove at the
  * sketch level):
  *
  *  - HLL (4 keys): relative error < 5% (2^14 registers → σ≈0.8%;
  *    5% ≈ 6σ), absolute floor 3 for tiny per-day groups.
  *  - KLL-style quantiles: rank error ≤ 3% at K=4096; carried counts
  *    exact.
  *  - CMS heavy hitters: one-sided — est ≥ exact, est ≤ exact + 3εN.
  *  - Theta set overlap: union/intersection/cardinalities within 5%
  *    (exact below K=4096, so sf0.01's customer sets may hit the
  *    exact path — equality is inside the envelope either way).
  */
class SketchBoundSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def run(key: String) = SparkEntry.queries(key)(spark, sf01)

  private def relOk(est: Double, exact: Double, rel: Double = 0.05,
                    absFloor: Double = 3.0): Boolean =
    math.abs(est - exact) <= math.max(absFloor, rel * exact)

  test("distinct_approx: estimate within 5% of exact") {
    val est = run("distinct_approx").collect()(0).getLong(0).toDouble
    val exact = Tables.lineitem(spark, sf01)
      .agg(countDistinct("l_partkey")).collect()(0).getLong(0).toDouble
    assert(relOk(est, exact), s"est=$est exact=$exact")
  }

  test("agg_distinct_hll: per-group estimate within 5% of exact") {
    val est = run("agg_distinct_hll").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf01)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, s"group sets differ: $est vs $exact")
    exact.foreach { case (g, ex) =>
      assert(relOk(est(g).toDouble, ex.toDouble),
        s"group $g est=${est(g)} exact=$ex")
    }
  }

  test("agg_quantile_sketch: counts exact, rank error <= 3% per probe") {
    val got = run("agg_quantile_sketch").collect()
    val exactByGroup = Tables.lineitem(spark, sf01)
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.map(_.getString(0)).toSet == exactByGroup.keySet)
    got.foreach { r =>
      val g = r.getString(0)
      val xs = exactByGroup(g)
      assert(r.getLong(1) == xs.length.toLong,
        s"group $g carried count ${r.getLong(1)} != exact ${xs.length}")
      def rankOf(x: Double): Double = xs.count(_ <= x).toDouble / xs.length
      for ((q, i) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
        val e = r.getDouble(i)
        assert(math.abs(rankOf(e) - q) <= 0.03,
          s"group $g q=$q est=$e rank=${rankOf(e)}")
      }
    }
  }

  test("agg_heavy_hitters: exact top-5 carried; CMS est in [exact, exact + 3 eps N]") {
    val got = run("agg_heavy_hitters").collect()
    assert(got.length == 5)
    val exactTop = Tables.lineitem(spark, sf01)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == exactTop.toSeq,
      "exact_cnt column must carry the true top-5")
    val n = got.head.getLong(3)
    val cap = (3 * Cms.Epsilon * n).toLong
    got.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated ${r.getLong(0)}: $est < $exact")
      assert(est <= exact + cap,
        s"key ${r.getLong(0)} est=$est exceeds exact+$cap")
    }
  }

  test("agg_set_overlap: theta estimates within 5% of exact set algebra") {
    val r = run("agg_set_overlap").collect()(0)
    val o = Tables.orders(spark, sf01)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr").isin(1999, 2000)).collect()
      .map(x => (x.getLong(0), x.getInt(1)))
    val a = o.collect { case (c, 1999) => c }.toSet
    val b = o.collect { case (c, 2000) => c }.toSet
    val checks = Seq(
      ("n_1999", r.getDouble(0), a.size), ("n_2000", r.getDouble(1), b.size),
      ("n_union", r.getDouble(2), (a | b).size),
      ("n_overlap", r.getDouble(3), (a & b).size))
    checks.foreach { case (name, est, exact) =>
      assert(relOk(est, exact.toDouble), s"$name est=$est exact=$exact")
    }
  }

  test("events_hll_daily: daily and cumulative reach inside the HLL envelope") {
    val got = run("events_hll_daily").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf01)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    got.foreach { case (day, daily, cum) =>
      val exactDaily = byDay(day).size
      val exactCum = days.takeWhile(_ <= day).flatMap(byDay(_)).toSet.size
      assert(relOk(daily.toDouble, exactDaily.toDouble),
        s"$day daily $daily vs exact $exactDaily")
      assert(relOk(cum.toDouble, exactCum.toDouble),
        s"$day cum $cum vs exact $exactCum")
    }
    val cums = got.sortBy(_._1).map(_._3)
    assert(cums.zip(cums.tail).forall { case (x, y) => x <= y },
      "cumulative reach must be monotone")
  }

  test("events_hll_rolling7: trailing-7-day reach inside the HLL envelope") {
    val got = run("events_hll_rolling7").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf01)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    got.foreach { case (day, est, merged) =>
      val window = days.filter(d2 =>
        d2 <= day && java.time.LocalDate.parse(d2)
          .isAfter(java.time.LocalDate.parse(day).minusDays(7)))
      assert(merged == window.size,
        s"$day merged $merged sketch-days, expected ${window.size}")
      val exact = window.flatMap(byDay(_)).toSet.size
      assert(relOk(est.toDouble, exact.toDouble),
        s"$day rolling est $est vs exact $exact")
    }
  }
}
