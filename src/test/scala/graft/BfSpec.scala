package graft

import org.apache.spark.sql.functions._

import graft.engine.{Bf, Tables}

/** The Bloom filter's three contracts: (1) canonical bytes — bitwise
  * OR commutes, so any merge tree / partitioning yields the identical
  * blob; (2) membership — NO false negatives ever, and the prefilter
  * actually prunes (passes < population, passes ≥ true members);
  * (3) the carried count is exact.
  */
class BfSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("merge of sharded filters is byte-identical to the one-shot filter") {
    Bf.register(spark)
    val keys = Tables.orders(spark, sfDir)
      .select(expr("xxhash64(o_custkey)").as("k"))
    val oneShot = keys.agg(expr("bf_sketch(k)")).collect()(0)
      .getAs[Array[Byte]](0)
    for (shards <- Seq(2, 5, 16)) {
      val merged = keys.withColumn("shard", pmod(col("k"), lit(shards)))
        .groupBy("shard").agg(expr("bf_sketch(k)").as("sk"))
        .agg(expr("bf_merge(sk)")).collect()(0).getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(oneShot, merged),
        s"filter bytes diverge at $shards shards")
    }
  }

  test("no false negatives, and the prefilter prunes the probe side") {
    Bf.register(spark)
    val dim = Tables.orders(spark, sf01)
      .filter(col("o_orderdate") >= lit("2001-06-01").cast("date"))
      .select(col("o_custkey"))
    val bloom = dim.agg(expr("bf_sketch(xxhash64(o_custkey))").as("bf"))
    // (2a) every inserted key must probe true
    val misses = dim.crossJoin(broadcast(bloom))
      .filter(!expr("bf_contains(bf, xxhash64(o_custkey))")).count()
    assert(misses == 0L, s"$misses false negatives — Bloom contract broken")
    // (2b) the prefilter prunes: passes < population, passes >= members
    val cust = Tables.customer(spark, sf01)
    val total = cust.count()
    val members = cust.join(dim, col("c_custkey") === col("o_custkey"),
                            "left_semi").count()
    val passed = cust.crossJoin(broadcast(bloom))
      .filter(expr("bf_contains(bf, xxhash64(c_custkey))")).count()
    assert(passed >= members, s"prefilter dropped true members")
    assert(passed < total,
      s"prefilter passed all $total customers — no pruning")
  }

  test("carried count is exact; empty filter rejects everything") {
    Bf.register(spark)
    import spark.implicits._
    val n = Tables.orders(spark, sfDir).count()
    val cnt = Tables.orders(spark, sfDir)
      .agg(expr("bf_count(bf_sketch(xxhash64(o_orderkey)))")).collect()(0)
      .getLong(0)
    assert(cnt == n, s"carried count $cnt != $n")
    val empty = Seq.empty[Long].toDF("k")
      .agg(expr("bf_sketch(k)").as("bf"))
      .select(expr("bf_contains(bf, 42L)")).collect()(0)
    assert(!empty.getBoolean(0), "empty filter claimed membership")
  }

  test("foreign blobs are rejected with a format error, not a misparse") {
    // wrong length AND wrong marker (an unmarked v0-era blob)
    val stale = Array.fill[Byte](8 + graft.engine.Bf.MBits / 8)(0)
    val e = intercept[IllegalArgumentException](
      graft.engine.Bf.contains(stale, 1L))
    assert(e.getMessage.contains("not a bf v1 sketch"), e.getMessage)
  }
}
