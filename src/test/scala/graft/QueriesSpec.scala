package graft

import org.apache.spark.sql.Row

/** Self-oracle integration test (SURVEY.md §5.3-2): every declared
  * query key runs at sf0.001, returns rows, and is byte-identical
  * across different shuffle-partition counts — the local tripwire for
  * the §2.3 determinism rules before the driver's DuckDB pass.
  */
class QueriesSpec extends SparkTestBase {

  test("every declared key has oracle SQL or a documented exemption") {
    // sketch values are engine-specific
    val noOracle = Set("distinct_approx", "agg_distinct_hll",
                       "agg_quantile_sketch", "agg_heavy_hitters",
                       "agg_set_overlap", "events_hll_daily",
                       "events_hll_rolling7")
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- noOracle
    assert(missing.isEmpty, s"keys without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all keys return rows and are partition-count deterministic") {
    SparkEntry.queries.foreach { case (name, fn) =>
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val r2: Array[Row] = fn(spark, sfDir).collect()
      assert(r2.nonEmpty, s"$name returned no rows at sf0.001")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val r7 = fn(spark, sfDir).collect()
      assert(r2.length == r7.length,
        s"$name row count differs across partition counts")
      r2.zip(r7).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i differs: $a vs $b")
      }
      spark.conf.set("spark.sql.shuffle.partitions", "2")
    }
  }

  test("distinct_approx within 5% of exact") {
    val approx = graft.engine.QueriesRel2.distinctApprox(spark, sfDir)
      .collect()(0).getLong(0).toDouble
    val exact = graft.engine.QueriesCore.distinctExact(spark, sfDir)
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("agg_distinct_hll within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = graft.engine.QueriesExtra.aggDistinctHll(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.engine.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.05,
        s"event_type=$k approx=$ap exact=$ex")
    }
  }

  test("hll sketches merge associatively and match the one-shot sketch") {
    import org.apache.spark.sql.functions._
    graft.engine.Hll.register(spark)
    val ev = graft.engine.Tables.events(spark, sfDir)
    // sharded sketch-then-merge must equal the unsharded sketch exactly
    // (bytewise-max merge is order-free) — proven via identical estimates
    val merged = ev
      .withColumn("shard", pmod(col("event_id"), lit(7)))
      .groupBy("shard").agg(expr("hll_sketch(user_id)").as("sk"))
      .agg(expr("hll_estimate(hll_merge(sk))")).collect()(0).getLong(0)
    val oneShot = ev
      .agg(expr("hll_estimate(hll_sketch(user_id))")).collect()(0).getLong(0)
    assert(merged == oneShot, s"merged=$merged oneShot=$oneShot")
  }

  test("hll bound and merge hold on lineitem too (non-events fixture)") {
    // Twin of the two events-based HLL proofs over a table the driver
    // has never regenerated incompatibly — the sketch family's
    // evidence must not single-point on the most environment-sensitive
    // fixture (round-7 postmortem: the events ts flip took the HLL
    // tests dark along with the data).
    import org.apache.spark.sql.functions._
    graft.engine.Hll.register(spark)
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val approx = li.groupBy("l_returnflag")
      .agg(expr("hll_estimate(hll_sketch(l_partkey))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k).toDouble - ex) / ex < 0.05,
        s"l_returnflag=$k approx=${approx(k)} exact=$ex")
    }
    val merged = li
      .withColumn("shard", pmod(col("l_orderkey"), lit(7)))
      .groupBy("shard").agg(expr("hll_sketch(l_partkey)").as("sk"))
      .agg(expr("hll_estimate(hll_merge(sk))")).collect()(0).getLong(0)
    val oneShot = li
      .agg(expr("hll_estimate(hll_sketch(l_partkey))")).collect()(0).getLong(0)
    assert(merged == oneShot, s"merged=$merged oneShot=$oneShot")
  }

  test("PQ codes are 8 per vector, each in 0..15; self-query ranks first") {
    val rows = SparkEntry.queries("emb_pq_adc")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val codes = r.getAs[String]("code_str").split("-")
      assert(codes.length == 8, s"expected 8 subspace codes: $r")
      codes.foreach(c => assert(c.toInt >= 0 && c.toInt <= 15, s"code out of range: $r"))
    }
    // the query vector's own ADC distance is pure quantization error —
    // it must be the global minimum (rank 1 of the top-10)
    assert(rows.head.getAs[Long]("vec_id") == 0L,
      s"query vector not nearest to itself: ${rows.head}")
  }

  test("SCD-2 invariants: exactly one current row per key, versions dense") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("merge_upsert_scd2")(spark, sfDir)
    val perKey = df.groupBy("key").agg(
      sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
      max("version").as("vmax"), count(lit(1)).as("n"))
    assert(perKey.filter(col("n_cur") =!= 1).count() == 0,
      "a key without exactly one current row")
    // versions are dense 1..n: max(version) == row count per key
    assert(perKey.filter(col("vmax") =!= col("n")).count() == 0,
      "version gap detected")
  }

  test("IVF-PQ results come only from the query's probed cells") {
    val rows = SparkEntry.queries("emb_ivf_pq")(spark, sfDir).collect()
    assert(rows.length == 10)
    val cells = rows.map(_.getAs[Long]("cell_id")).toSet
    assert(cells.size <= 4, s"results from more than nprobe=4 cells: $cells")
    // self-query: vector 0 is its own nearest code under ADC
    assert(rows.head.getAs[Long]("vec_id") == 0L,
      s"query vector not ranked first: ${rows.head}")
  }

  test("LM cross-entropy is positive and bounded by ln(N+V)") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("docs_lm_score")(spark, sfDir)
    val bad = df.filter(col("cross_entropy") <= 0.0 ||
                        col("cross_entropy") > 20.0).count()
    assert(bad == 0, s"$bad docs with out-of-range cross-entropy")
  }
}
