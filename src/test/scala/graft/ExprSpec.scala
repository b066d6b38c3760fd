package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.engine.{Exprs, TopK, Udfs}

/** Randomized checks (SURVEY.md §5.3-3) for the custom Catalyst pieces
  * against small Scala reference implementations. Seeded Random keeps
  * runs reproducible (the scalatestplus-scalacheck bridge is not in the
  * offline dependency cache, so generators are hand-rolled).
  */
class ExprSpec extends SparkTestBase {

  private def refCosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference on random vectors (eval + codegen)") {
    Exprs.register(spark)
    import spark.implicits._
    val rnd = new Random(42)
    val cases = Seq.fill(30) {
      (Array.fill(16)(rnd.nextFloat() * 2 - 1),
       Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val got = cases.toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      val want = refCosine(a, b)
      assert(math.abs(g - want) < 1e-12, s"got=$g want=$want")
    }
  }

  test("nfc_normalize composes, passes through NFC text, and keeps nulls") {
    Exprs.register(spark)
    import spark.implicits._
    // decomposed e + combining acute (2 codepoints) -> composed \u00e9 (1)
    val rows = Seq(Some("Cafe\u0301"), Some("plain ascii"), None, Some(""))
    val got = rows.toDF("t")
      .select(expr("nfc_normalize(t)").as("n"),
              length(expr("nfc_normalize(t)")).as("l"))
      .collect()
    assert(got(0).getString(0) == "Caf\u00e9" && got(0).getInt(1) == 4)
    assert(got(1).getString(0) == "plain ascii")
    assert(got(2).isNullAt(0))
    assert(got(3).getString(0) == "")
  }

  test("hamming_dist matches the bit_count(xor) formulation on random signatures") {
    Exprs.register(spark)
    import spark.implicits._
    val rnd = new Random(7)
    val cases = Seq.fill(40)(
      (Array.fill(4)(rnd.nextLong()), Array.fill(4)(rnd.nextLong())))
    val got = cases.toDF("a", "b")
      .selectExpr(
        "hamming_dist(a, b) AS h",
        """CAST(bit_count(a[0] ^ b[0]) + bit_count(a[1] ^ b[1]) +
          |bit_count(a[2] ^ b[2]) + bit_count(a[3] ^ b[3]) AS INT)
          |AS ref""".stripMargin)
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // identical signatures → distance 0
    val z = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 2L, 3L, 4L))).toDF("a", "b")
      .selectExpr("hamming_dist(a, b)").collect()(0).getInt(0)
    assert(z == 0)
    // wrong input type fails at ANALYSIS, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0f), Array(1.0f))).toDF("a", "b")
        .selectExpr("hamming_dist(a, b)").collect()
    }
  }

  test("zorder2 matches a bit-by-bit reference (eval + codegen) and nests quadrants") {
    Exprs.register(spark)
    import spark.implicits._
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new Random(7)
    val cases = Seq.fill(50)((rnd.nextLong() & 0xFFFFL,
                              rnd.nextLong() & 0xFFFFL)) ++
      Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (1L, 0L), (0L, 1L),
          // bits above 15 must be ignored
          (0x1FFFFL, 0L), (0L, 0x7FFF0000L))
    val got = cases.toDF("x", "y")
      .select(expr("zorder2(x, y)")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == ref(x & 0xFFFFL, y & 0xFFFFL),
        s"zorder2($x, $y) = $z != ${ref(x & 0xFFFFL, y & 0xFFFFL)}")
    }
    // the clustering property the layout relies on: points sharing
    // their high bits in BOTH dims share the code's high bits (same
    // quadrant => contiguous code range)
    val inQuad = for (x <- 256L to 259L; y <- 512L to 515L) yield ref(x, y)
    val outQuad = ref(1024L, 512L)
    assert(inQuad.max - inQuad.min < 64, "quadrant not contiguous")
    assert(math.abs(outQuad - inQuad.min) > 1000, "distinct quadrant too close")
  }

  test("topk_by_score matches sort-take reference") {
    TopK.register(spark)
    import spark.implicits._
    val rnd = new Random(7)
    for (_ <- 1 to 10) {
      val rows = Seq.tabulate(60) { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(20) / 10.0, i.toLong)
      }
      val got = rows.toDF("g", "score", "id").repartition(3)
        .groupBy("g").agg(expr("topk_by_score(score, id, 3)").as("t"))
        .select(col("g"), posexplode(col("t")))
        .select(col("g"), col("col.score"), col("col.id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }
          .take(3).map { case (s, id) => (g, s, id) }
      }.toSet
      assert(got == want)
    }
  }

  test("haversine UDF: zero distance and known quarter-meridian") {
    assert(Udfs.haversineKm(10.0, 20.0, 10.0, 20.0) == 0.0)
    val quarter = Udfs.haversineKm(0.0, 0.0, 90.0, 0.0)
    assert(math.abs(quarter - 6371.0 * math.Pi / 2) < 1e-6)
  }

  test("geomean Aggregator matches exp(avg(ln)) reference") {
    import spark.implicits._
    val rnd = new Random(11)
    for (_ <- 1 to 10) {
      val xs = Seq.fill(25)(rnd.nextDouble() * 999.9 + 0.1)
      val got = xs.toDF("x").repartition(3).agg(Udfs.geomean(col("x")))
        .collect()(0).getDouble(0)
      val want = math.exp(xs.map(math.log).sum / xs.size)
      assert(math.abs(got - want) / want < 1e-9)
    }
  }

  test("IVF ANN recall vs brute-force knn is usable (>= 40% at k=3)") {
    val brute = graft.engine.Ops
      .knnBruteForce(graft.engine.Tables.embeddings(spark, sfDir),
                     "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.engine.QueriesExtra.embAnnIvf(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // 16 coarse cells over 500 random vectors: a loose-but-real floor;
    // the point is the operator contract, measured not assumed.
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("MinHash-LSH near-dup finds exactly the high-Jaccard pairs (brute force)") {
    val got = graft.engine.QueriesDocs.docsDedupNear(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .map { case (id, toks) =>
        (id, toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty)
    val want = (for {
      (id1, s1) <- docs; (id2, s2) <- docs if id1 < id2
      inter = (s1 & s2).size
      if inter > 0 && inter.toDouble / (s1.size + s2.size - inter) >= 0.8
    } yield (id1, id2)).toSet
    assert(got == want)
  }
}
