package graft

import org.apache.spark.sql.functions._

import graft.engine.{Qsk, Tables}

/** The quantile sketch's three contracts: (1) canonical bytes — any
  * merge tree and any partitioning produce the identical sketch;
  * (2) rank-error bound vs exact percentiles on real data large enough
  * to force sampling (sf0.01, level > 0); (3) the carried count is
  * exact. */
class QskSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("merge of sharded sketches is byte-identical to the one-shot sketch") {
    Qsk.register(spark)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v"),
              expr("xxhash64(l_orderkey, l_linenumber, l_quantity)").as("k"))
    val oneShot = li.agg(expr("qsk_sketch(v, k)")).collect()(0)
      .getAs[Array[Byte]](0)
    for (shards <- Seq(2, 5, 16)) {
      val merged = li.withColumn("shard", pmod(col("k"), lit(shards)))
        .groupBy("shard").agg(expr("qsk_sketch(v, k)").as("sk"))
        .agg(expr("qsk_merge(sk)")).collect()(0).getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(oneShot, merged),
        s"sketch bytes diverge at $shards shards")
    }
  }

  test("rank error within 3% of exact at 2 and 7 shuffle partitions (sampling active)") {
    Qsk.register(spark)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq(2, 7)) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val est = graft.engine.QueriesR8.aggQuantileSketch(spark, sf01)
          .collect().map(r => r.getString(0) ->
            (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
        val rows = Tables.lineitem(spark, sf01)
          .select("l_returnflag", "l_extendedprice").collect()
          .map(r => (r.getString(0), r.getDouble(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        // groups are ~20k rows: K=4096 forces level >= 3 (real sampling)
        assert(rows.values.exists(_.length > Qsk.K), "no group exceeds K")
        for ((g, (p50, p90, p99)) <- est) {
          val vs = rows(g)
          def rankOf(x: Double): Double =
            vs.count(_ <= x).toDouble / vs.length
          for ((q, e) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99))
            assert(math.abs(rankOf(e) - q) <= 0.03,
              s"group $g q=$q est=$e rank=${rankOf(e)} parts=$parts")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("carried count is exact and empty sketches yield null quantiles") {
    Qsk.register(spark)
    import spark.implicits._
    val got = graft.engine.QueriesR8.aggQuantileSketch(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"carried counts diverge: $got vs $want")
    val empty = Seq.empty[(Double, Long)].toDF("v", "k")
      .agg(expr("qsk_quantile(qsk_sketch(v, k), 0.5)")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("heavy exact duplication keeps the sketch sane (weighted collapse)") {
    // The pre-weights failure mode: > K copies of one (rowKey, value)
    // pair share one row hash, so shrinking raised the level past the
    // pair's trailing-zero count and dropped the ENTIRE retained set —
    // qsk_quantile returned null while qsk_count reported every row.
    // With weighted collapse, K bounds DISTINCT pairs: the degenerate
    // input keeps level 0 and every quantile is exact.
    Qsk.register(spark)
    // 100k copies of value 7 under ONE key, plus 300k copies of value
    // 11 — a two-value weighted median probe (25% / 75% mass).
    val df = spark.range(0, 400000).selectExpr(
      "CASE WHEN id % 4 = 0 THEN 7.0D ELSE 11.0D END AS v",
      "CASE WHEN id % 4 = 0 THEN 1L ELSE 2L END AS k")
    val r = df.agg(
      expr("qsk_quantile(qsk_sketch(v, k), 0.10D)").as("p10"),
      expr("qsk_quantile(qsk_sketch(v, k), 0.25D)").as("p25"),
      expr("qsk_quantile(qsk_sketch(v, k), 0.90D)").as("p90"),
      expr("qsk_count(qsk_sketch(v, k))").as("n")).collect()(0)
    assert(r.getDouble(0) == 7.0, s"p10 should be the light value: $r")
    assert(r.getDouble(1) == 7.0, s"p25 is the boundary order stat: $r")
    assert(r.getDouble(2) == 11.0, s"p90 should be the heavy value: $r")
    assert(r.getLong(3) == 400000L, s"carried count wrong: $r")
    // single repeated pair: quantile is that value, never null
    val one = spark.range(0, 50000).selectExpr("42.5D AS v", "9L AS k")
      .agg(expr("qsk_quantile(qsk_sketch(v, k), 0.5D)")).collect()(0)
    assert(one.getDouble(0) == 42.5, s"degenerate input lost its value: $one")
  }

  test("foreign blobs are rejected with a format error, not a misparse") {
    // a v1-era layout had no marker: its first int was the level —
    // loading any such blob (or random bytes) must fail loudly
    val stale = Array.fill[Byte](40)(0)
    val e = intercept[IllegalArgumentException](graft.engine.Qsk.deserialize(stale))
    assert(e.getMessage.contains("format marker"), e.getMessage)
    val short = Array[Byte](1, 2)
    val e2 = intercept[IllegalArgumentException](graft.engine.Qsk.count(short))
    assert(e2.getMessage.contains("too short"), e2.getMessage)
  }
}
