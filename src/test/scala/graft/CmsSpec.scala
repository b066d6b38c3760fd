package graft

import org.apache.spark.sql.functions._

import graft.engine.{Cms, Tables}

/** The count-min sketch's three contracts: (1) canonical bytes — any
  * merge tree and any partitioning produce the identical sketch (sums
  * commute); (2) the one-sided frequency bound exact ≤ est ≤
  * exact + εN holds for EVERY distinct key, not just the probed
  * top-5; (3) the carried count is exact.
  */
class CmsSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("merge of sharded sketches is byte-identical to the one-shot sketch") {
    Cms.register(spark)
    val li = Tables.lineitem(spark, sfDir)
      .select(expr("xxhash64(l_partkey)").as("k"))
    val oneShot = li.agg(expr("cms_sketch(k)")).collect()(0)
      .getAs[Array[Byte]](0)
    for (shards <- Seq(2, 5, 16)) {
      val merged = li.withColumn("shard", pmod(col("k"), lit(shards)))
        .groupBy("shard").agg(expr("cms_sketch(k)").as("sk"))
        .agg(expr("cms_merge(sk)")).collect()(0).getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(oneShot, merged),
        s"sketch bytes diverge at $shards shards")
    }
  }

  test("every key's estimate is within [exact, exact + eps*N] at 2 and 7 partitions") {
    Cms.register(spark)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq(2, 7)) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val li = Tables.lineitem(spark, sf01)
        val msk = li
          .withColumn("shard", pmod(col("l_orderkey"), lit(16)))
          .groupBy("shard")
          .agg(expr("cms_sketch(xxhash64(l_partkey))").as("sk"))
          .agg(expr("cms_merge(sk)").as("msk"))
        val checked = li.groupBy("l_partkey")
          .agg(count(lit(1)).as("exact"))
          .crossJoin(broadcast(msk))
          .select(col("l_partkey"), col("exact"),
                  expr("cms_estimate(msk, xxhash64(l_partkey))").as("est"),
                  expr("cms_count(msk)").as("n"))
          .collect()
        assert(checked.length > 1000, "fixture too small to be meaningful")
        val n = checked.head.getLong(3)
        // ε = e/W is the w.h.p. bound per key; over ~2000 keys allow
        // 3εN before declaring the sketch broken
        val cap = (3 * Cms.Epsilon * n).toLong
        checked.foreach { r =>
          val (exact, est) = (r.getLong(1), r.getLong(2))
          assert(est >= exact,
            s"CMS UNDERestimated key ${r.getLong(0)}: $est < $exact")
          assert(est <= exact + cap,
            s"key ${r.getLong(0)} est=$est exact=$exact exceeds +$cap")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("carried count is exact; empty sketch estimates zero") {
    Cms.register(spark)
    import spark.implicits._
    val row = graft.engine.QueriesR9.aggHeavyHitters(spark, sfDir).collect()(0)
    val total = Tables.lineitem(spark, sfDir).count()
    assert(row.getLong(3) == total,
      s"carried count ${row.getLong(3)} != $total")
    val empty = Seq.empty[Long].toDF("k")
      .agg(expr("cms_estimate(cms_sketch(k), 42L)")).collect()(0)
    assert(empty.getLong(0) == 0L)
  }

  test("foreign blobs are rejected with a format error, not a misparse") {
    val stale = Array.fill[Byte](8 + 8 * graft.engine.Cms.D * graft.engine.Cms.W)(0)
    val e = intercept[IllegalArgumentException](
      graft.engine.Cms.estimate(stale, 1L))
    assert(e.getMessage.contains("not a cms v1 sketch"), e.getMessage)
  }
}
