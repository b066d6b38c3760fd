package graft

import org.apache.spark.sql.Row

/** Self-oracle integration test (SURVEY.md §5.3-2): every declared
  * query key runs at sf0.001, returns rows, and is byte-identical
  * across different shuffle-partition counts — the local tripwire for
  * the §2.3 determinism rules before the driver's DuckDB pass.
  */
class QueriesSpec extends SparkTestBase {

  test("every declared key has oracle SQL or a documented exemption") {
    val noOracle = Set("distinct_approx") // sketch values are engine-specific
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
}
