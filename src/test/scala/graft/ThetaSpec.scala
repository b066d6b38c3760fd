package graft

import org.apache.spark.sql.functions._

import graft.engine.Theta

/** The theta sketch's four contracts: (1) canonical bytes — the
  * bottom-K signature is a pure function of the key set, so any merge
  * tree / partitioning yields the identical blob; (2) estimates within
  * the declared KMV bound when sampling is active (both sets past K);
  * (3) EXACT distinct/union/intersect when the signatures hold the
  * whole sets; (4) foreign blobs rejected by the format marker.
  */
class ThetaSpec extends SparkTestBase {

  test("merge of sharded sketches is byte-identical to the one-shot sketch") {
    Theta.register(spark)
    // 200k distinct keys — far past K=4096, so the bottom-K boundary
    // is exercised, not just the exact small-set mode
    val keys = spark.range(0, 200000).selectExpr("xxhash64(id) AS k")
    val oneShot = keys.agg(expr("theta_sketch(k)")).collect()(0)
      .getAs[Array[Byte]](0)
    for (shards <- Seq(2, 7, 16)) {
      val merged = keys.withColumn("shard", pmod(col("k"), lit(shards)))
        .groupBy("shard").agg(expr("theta_sketch(k)").as("sk"))
        .agg(expr("theta_merge(sk)")).collect()(0).getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(oneShot, merged),
        s"sketch bytes diverge at $shards shards")
    }
    // and at different shuffle-partition counts (the §2.3 gate)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq("2", "7")) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val b = keys.repartition(parts.toInt)
          .agg(expr("theta_sketch(k)")).collect()(0).getAs[Array[Byte]](0)
        assert(java.util.Arrays.equals(oneShot, b),
          s"sketch bytes diverge at $parts shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("overlap estimates within 5% of exact while sampling (sets >> K)") {
    Theta.register(spark)
    // A = [0, 150k), B = [100k, 250k): union 250k, intersection 50k —
    // both sets 36x past K, so every number is an ESTIMATE
    val a = spark.range(0, 150000).selectExpr("xxhash64(id) AS k")
      .agg(expr("theta_sketch(k)").as("sa"))
    val b = spark.range(100000, 250000).selectExpr("xxhash64(id) AS k")
      .agg(expr("theta_sketch(k)").as("sb"))
    val r = a.crossJoin(b).select(
      expr("theta_distinct(sa)"), expr("theta_distinct(sb)"),
      expr("theta_union_est(sa, sb)"), expr("theta_intersect_est(sa, sb)"),
      expr("theta_count(sa)")).collect()(0)
    def relErr(est: Double, exact: Double) = math.abs(est - exact) / exact
    assert(relErr(r.getDouble(0), 150000) < 0.05, s"|A| est ${r.getDouble(0)}")
    assert(relErr(r.getDouble(1), 150000) < 0.05, s"|B| est ${r.getDouble(1)}")
    assert(relErr(r.getDouble(2), 250000) < 0.05,
      s"|A∪B| est ${r.getDouble(2)}")
    assert(relErr(r.getDouble(3), 50000) < 0.05,
      s"|A∩B| est ${r.getDouble(3)}")
    assert(r.getLong(4) == 150000L, s"carried count ${r.getLong(4)}")
  }

  test("small sets are exact, not estimated") {
    Theta.register(spark)
    val a = spark.range(0, 1000).selectExpr("xxhash64(id) AS k")
      .agg(expr("theta_sketch(k)").as("sa"))
    val b = spark.range(500, 1500).selectExpr("xxhash64(id) AS k")
      .agg(expr("theta_sketch(k)").as("sb"))
    val r = a.crossJoin(b).select(
      expr("theta_distinct(sa)"), expr("theta_union_est(sa, sb)"),
      expr("theta_intersect_est(sa, sb)")).collect()(0)
    assert(r.getDouble(0) == 1000.0, s"|A| should be exact: $r")
    assert(r.getDouble(1) == 1500.0, s"|A∪B| should be exact: $r")
    assert(r.getDouble(2) == 500.0, s"|A∩B| should be exact: $r")
  }

  test("foreign blobs are rejected with a format error, not a misparse") {
    val stale = Array.fill[Byte](64)(0)
    val e = intercept[IllegalArgumentException](Theta.count(stale))
    assert(e.getMessage.contains("not a theta v1 sketch"), e.getMessage)
  }
}
