package graft

import org.apache.spark.sql.functions._

import graft.engine.Ops

/** Edge cases for the hand-rolled kernels (the paths a DuckDB oracle
  * over fixture data never exercises).
  */
class OpsEdgeSpec extends SparkTestBase {

  test("knnBruteForce: k larger than candidate count, exact ties") {
    import spark.implicits._
    // three identical vectors → all pairwise cosines are exactly 1.0;
    // ties must break by ascending neighbor id, k=5 > 2 candidates
    val v = Array(1.0f, 2.0f, 3.0f)
    val df = Seq((10L, v), (11L, v), (12L, v)).toDF("vec_id", "embedding")
    val got = Ops.knnBruteForce(df, "vec_id", "embedding", k = 5)
      .orderBy("vec_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getInt(3)))
    assert(got.toSeq == Seq(
      (10L, 11L, 1.0, 1), (10L, 12L, 1.0, 2),
      (11L, 10L, 1.0, 1), (11L, 12L, 1.0, 2),
      (12L, 10L, 1.0, 1), (12L, 11L, 1.0, 2)))
  }

  test("cosinePairs: single row emits nothing; orthogonal below threshold") {
    import spark.implicits._
    val one = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Ops.cosinePairs(one, "vec_id", "embedding", 0.0).count() == 0)
    val ortho = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Ops.cosinePairs(ortho, "vec_id", "embedding", 0.5).count() == 0)
    assert(Ops.cosinePairs(ortho, "vec_id", "embedding", 0.0).count() == 1)
  }

  test("knnBruteForce: multi-block chunked path equals single-block result") {
    import spark.implicits._
    // 24 deterministic pseudo-random vectors; tiny maxBlockBytes forces
    // the toLocalIterator block-chunked path (several broadcasts + the
    // exact top-k merge), which must be indistinguishable from one block
    val rows = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("vec_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
    val single = canon(Ops.knnBruteForce(df, "vec_id", "embedding", k = 3))
    val chunked = canon(Ops.knnBruteForce(df, "vec_id", "embedding", k = 3,
      maxBlockBytes = 500L)) // ~6 rows per block → 4+ blocks
    assert(chunked == single)
  }

  test("cosinePairs: multi-block chunked path emits each pair exactly once") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 17 + j * 5) % 11 - 5).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val single = canon(Ops.cosinePairs(df, "vec_id", "embedding", -1.0))
    assert(single.size == 20 * 19 / 2) // threshold −1 keeps all pairs
    val chunked = canon(Ops.cosinePairs(df, "vec_id", "embedding", -1.0,
      maxBlockBytes = 400L))
    assert(chunked == single)
  }

  test("minhashNearDup: identical short docs found; sub-shingle docs dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g"),   // 7 tokens → shingles exist
      (2L, "a b c d e f g"),   // exact duplicate → J = 1.0
      (3L, "x y z"),           // < 5 tokens → no shingles, never a pair
      (4L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = Ops.minhashNearDup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("sessionize: single event per key is its own session") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 10:00:00", 100L))
      .toDF("user_id", "ts_s", "event_id")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id")
    val got = Ops.sessionize(df, "user_id", "ts", "event_id", "30 MINUTES")
      .select("user_id", "session_id").collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
  }

  test("quantizeInt8: dequantization error bounded by scale/2 per coordinate") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 0.0f)),
      (2L, Array(100.0f, -50.0f, 25.0f, 12.5f))
    ).toDF("vec_id", "embedding")
    val rows = Ops.quantizeInt8(df, "vec_id", "embedding")
      .select("vec_id", "scale", "q")
      .collect()
    val orig = Map(1L -> Array(0.5, -0.25, 0.125, 0.0),
                   2L -> Array(100.0, -50.0, 25.0, 12.5))
    rows.foreach { r =>
      val id = r.getLong(0); val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      q.zip(orig(id)).foreach { case (qi, x) =>
        assert(math.abs(qi) <= 127, s"clipped q $qi")
        assert(math.abs(qi * scale - x) <= scale / 2 + 1e-12,
          s"vec $id: dequant error |$qi×$scale − $x| > scale/2")
      }
    }
  }

  test("connectedComponents: chain propagates to the component min across hops") {
    import spark.implicits._
    // path 10-11-12-13-14 (diameter 4) + separate pair (20,21) + (30,31)
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
                    (20L, 21L), (30L, 31L)).toDF("id1", "id2")
    val got = Ops.connectedComponents(pairs, "id1", "id2", maxIter = 8)
      .orderBy("n").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(
      (10L, 10L), (11L, 10L), (12L, 10L), (13L, 10L), (14L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L), (31L, 30L)))
  }

  test("connectedComponents: empty pair graph returns empty labels, no crash") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val got = Ops.connectedComponents(pairs, "id1", "id2")
    assert(got.columns.toSeq == Seq("n", "label"))
    assert(got.count() == 0)
  }

  test("hamming_dist fails loudly on signature length mismatch") {
    import spark.implicits._
    graft.engine.Exprs.register(spark)
    val df = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.selectExpr("hamming_dist(a, b)").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("differ in length"))))
  }

  test("gapFill: single-timestamp key yields one row; gaps zero-filled") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), // single day
      (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:00"),
      (2L, "2024-01-04 00:00:00")  // 3-day gap, duplicate day
    ).toDF("k", "ts_s").selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS day")
    val got = Ops.gapFill(df, "k", "day", "1 DAY", "n")
      .orderBy("k", "day")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", 1L),
      (2L, "2024-01-01 00:00:00.0", 2L),
      (2L, "2024-01-02 00:00:00.0", 0L),
      (2L, "2024-01-03 00:00:00.0", 0L),
      (2L, "2024-01-04 00:00:00.0", 1L)))
  }

  test("stratifiedSample: stratum smaller than n keeps all rows, rn dense") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("s", "k")
    val got = Ops.stratifiedSample(df, "s", "k", n = 5)
      .orderBy("s", "rn").collect()
      .map(r => (r.getString(0), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 1), ("a", 2), ("b", 1)))
  }

  test("property: connectedComponents equals union-find on random graphs at 2 and 7 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (_ <- 1 to 5) {
        val nNodes = 2 + rnd.nextInt(30)
        val edges = Seq.fill(rnd.nextInt(40))(
          (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
          .filter { case (a, b) => a != b }
        if (edges.nonEmpty) {
          // 20-line union-find reference
          val parent = Array.tabulate(nNodes)(identity)
          def find(x: Int): Int = {
            var r = x; while (parent(r) != r) r = parent(r); r
          }
          edges.foreach { case (a, b) =>
            val (ra, rb) = (find(a.toInt), find(b.toInt))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
          val want = present.groupBy(n => find(n.toInt)).values
            .flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
          for (parts <- Seq("2", "7")) {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val got = Ops.connectedComponents(
                edges.toDF("a", "b"), "a", "b")
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(got == want,
              s"parts=$parts edges=$edges\ngot=$got\nwant=$want")
          }
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  test("property: asofJoin equals per-row brute-force scan at 2 and 7 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (_ <- 1 to 5) {
        val nKeys = 1 + rnd.nextInt(4)
        val left = (0 until (1 + rnd.nextInt(25))).map(i =>
          (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        // duplicate (key, time) right rows on purpose: the tie rule
        // (max value at equal time) must hold under any partitioning
        val right = Seq.fill(rnd.nextInt(25))(
          (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong,
           rnd.nextInt(100).toLong))
        val want = left.map { case (id, k, t) =>
          val c = right.filter(r => r._1 == k && r._2 <= t)
          val m = if (c.isEmpty) null
            else { val mt = c.map(_._2).max
                   java.lang.Long.valueOf(c.filter(_._2 == mt).map(_._3).max) }
          (id, k, t, m)
        }.toSet
        for (parts <- Seq("2", "7")) {
          spark.conf.set("spark.sql.shuffle.partitions", parts)
          val got = Ops.asofJoin(
              left.toDF("id", "k", "t"), "id", "k", "t",
              right.toDF("k", "t", "v"), "k", "t", "v", "matched")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
            .toSet
          assert(got == want,
            s"parts=$parts left=$left right=$right\ngot=$got\nwant=$want")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  test("property: rangeJoinBinned equals the filtered cross product on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 5) {
      val left = (0 until (1 + rnd.nextInt(20))).map(i =>
        (i.toLong, rnd.nextInt(200).toLong))
      val right = (0 until (1 + rnd.nextInt(20))).map(i =>
        (i.toLong + 1000, rnd.nextInt(200).toLong))
      val radius = rnd.nextInt(10).toLong
      val binWidth = radius + 1 + rnd.nextInt(10)
      val want = (for {
        (lid, lv) <- left
        (rid, rv) <- right
        if math.abs(lv - rv) <= radius
      } yield (lid, rid)).toSet
      val got = Ops.rangeJoinBinned(
          left.toDF("lid", "lv"), "lv",
          right.toDF("rid", "rv"), "rv", radius, binWidth)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // each qualifying pair exactly once (no dup from neighbor bins)
      assert(got.length == got.toSet.size, s"duplicate pairs: ${got.toSeq}")
      assert(got.toSet == want,
        s"radius=$radius bin=$binWidth\ngot=${got.toSet}\nwant=$want")
    }
  }

  test("kmeansCodebook: identical codebook at 2 and 7 partitions; recovers orthogonal clusters") {
    import spark.implicits._
    // 3 orthogonal clusters in 8 dims; ids placed so that the md5-order
    // seed pick (computed here with the same rule) lands one seed per
    // cluster — Lloyd then provably separates them within 3 iterations.
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md5.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (1L to 12L).sortBy(i => (h(i), i))
    val rnd = new scala.util.Random(3)
    def point(cluster: Int): Array[Float] = {
      val v = Array.fill(8)(rnd.nextFloat() * 0.05f)
      v(cluster) = 1.0f; v
    }
    // first three md5-ordered ids → clusters 0,1,2; rest round-robin
    val data = ids.zipWithIndex.map { case (id, i) =>
      val c = i % 3
      (id, c, point(c))
    }
    val df = data.map { case (id, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val want = data.map { case (id, c, _) => id -> c }.toMap
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val books = Seq("2", "7").map { parts =>
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        Ops.kmeansCodebook(df, "vec_id", "embedding", k = 3, iters = 3)
          .orderBy("cid").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
      }
      assert(books(0).toSeq == books(1).toSeq,
        s"codebook differs across partitionings:\n${books(0).toSeq}\n${books(1).toSeq}")
      // assignment under the trained codebook == the true clusters
      // (up to centroid naming): same-cluster points share a cell,
      // different clusters never do
      graft.engine.Exprs.register(spark)
      val cb = Ops.kmeansCodebook(df, "vec_id", "embedding", 3, 3)
      val cells = df.crossJoin(broadcast(cb))
        .select(col("vec_id"),
                round(expr("cosine_sim(embedding, cemb)"), 6).as("cs"),
                col("cid"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("cs").desc, col("cid"))))
        .filter(col("rn") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val byCell = cells.groupBy(_._2).values.map(_.keySet).toSet
      val byCluster = want.groupBy(_._2).values.map(_.keySet).toSet
      assert(byCell == byCluster, s"cells=$byCell clusters=$byCluster")
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  test("minhash hot-bucket cap bounds a degenerate bucket's pair count") {
    import spark.implicits._
    // 400 IDENTICAL documents: every band bucket holds all 400 ids, so
    // an uncapped LSH would verify C(400,2) = 79,800 pairs. With
    // maxBucket = 8 every bucket keeps the same deterministic 8-member
    // hash-order sample (the score ignores the band), so the verified
    // output is exactly C(8,2) = 28 pairs — bounded, not linear in the
    // bucket's true size.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 400L).map(i => (i, text)).toDF("doc_id", "text")
    val capped = Ops.minhashNearDup(docs, "doc_id", "text", maxBucket = 8)
      .collect()
    assert(capped.length == 28, s"expected C(8,2)=28 pairs, got ${capped.length}")
    assert(capped.forall(_.getDouble(2) == 1.0))
    // the kept ids are one consistent 8-element sample
    val ids = capped.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.size == 8, s"kept-member set not bucket-consistent: $ids")
    // determinism: a second run keeps the identical sample
    val again = Ops.minhashNearDup(docs, "doc_id", "text", maxBucket = 8)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(again == ids)
    // healthy buckets are untouched: near-dup pairs on distinct docs
    // are identical with and without the cap
    val mixed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tomorrow"),
      (3L, "completely different words forming an unrelated document text here now")
    ).toDF("doc_id", "text")
    val withCap = Ops.minhashNearDup(mixed, "doc_id", "text", maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val noCap = Ops.minhashNearDup(mixed, "doc_id", "text", maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withCap == noCap)
  }

  test("exactDedup groups by content, keeps min id") {
    import spark.implicits._
    val df = Seq((5L, "same"), (3L, "same"), (9L, "other"))
      .toDF("doc_id", "text")
    val got = Ops.exactDedup(df, "doc_id", "text")
      .orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 2L), (9L, 1L)))
  }

  test("pqEncode: codes identical at 2 and 7 partitions, in range, codebook-exact for codebook members") {
    import org.apache.spark.sql.functions._
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      def codesAt(parts: Int): Map[(Long, Int), Int] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        Ops.pqEncode(emb.repartition(parts), "vec_id", "embedding")
          .collect()
          .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
      }
      val c2 = codesAt(2)
      val c7 = codesAt(7)
      assert(c2 == c7, "PQ codes differ across partitionings")
      assert(c2.values.forall(c => c >= 0 && c < 16), "code out of range")
      val nVec = emb.count()
      assert(c2.size == nVec * 8, s"expected ${nVec * 8} codes, got ${c2.size}")
      val cb = Ops.pqCodebook(emb, "vec_id", "embedding")
        .select(col("cid")).distinct().collect().map(_.getInt(0)).toSet
      assert(cb == (0 until 16).toSet, s"codebook ids not dense: $cb")
      // every codebook member must encode to ITSELF in every subspace:
      // its subvector distance to its own centroid is exactly 0, ties
      // break toward the lowest cid, and the random-float fixture has
      // no duplicate subvectors. Re-derive the member→cid map by the
      // same rule (md5-least 16, rank order) and check the codes.
      val members = emb
        .withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy("h", "vec_id").limit(16)
        .select(col("vec_id"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("h", "vec_id")) - 1).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1))
      members.foreach { case (vid, cid) =>
        (0 until 8).foreach { m =>
          assert(c2((vid, m)) == cid,
            s"codebook member $vid (cid $cid) encoded to ${c2((vid, m))} in subspace $m")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  test("incremental near-dup ≡ full-batch pairs restricted to the split") {
    // The consistency invariant behind docs_dedup_incremental's design:
    // probing a persisted base index with only the delta hashed must
    // find EXACTLY the pairs the full-corpus recompute finds, minus
    // base-base pairs. Derive the expected set from minhashNearDup on
    // the whole corpus and compare classified rows.
    import org.apache.spark.sql.functions._
    val d = sfDir
    val docs = graft.engine.Tables.documents(spark, d)
    val isDelta = col("doc_id") % 3 === 0
    val baseBands = graft.engine.Ops.lshBandIndex(
      graft.engine.Ops.shingles(docs.filter(!isDelta), "doc_id", "text", 5),
      "doc_id")
    val incr = graft.engine.Ops.minhashNearDupIncremental(
        baseBands, docs.filter(!isDelta), docs.filter(isDelta),
        "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val full = graft.engine.Ops.minhashNearDup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.flatMap { case (id1, id2) =>
      val (d1, d2) = (id1 % 3 == 0, id2 % 3 == 0)
      if (d1 && d2) Some((id2, id1, "delta")) // id1 < id2: newer matches older
      else if (d1) Some((id1, id2, "base"))
      else if (d2) Some((id2, id1, "base"))
      else None // base-base: invisible to an incremental pass
    }
    assert(incr == expected,
      s"incremental diverged from restricted batch: " +
        s"incr-only=${(incr -- expected).take(3)} " +
        s"batch-only=${(expected -- incr).take(3)}")
    assert(incr.exists(_._3 == "base") && incr.exists(_._3 == "delta"),
      "fixture must exercise BOTH match sources for this test to mean anything")
  }

  test("exactNtile: fewer rows than tiles matches window ntile") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    // n = 2 < tiles = 3: ntile gives tiles 1 and 2, no tile 3 —
    // the q=0/remainder arithmetic must reproduce that exactly
    val df = Seq((1L, 5L), (2L, 3L)).toDF("id", "metric")
    val expected = df.withColumn("tile",
        ntile(3).over(W.orderBy("metric", "id")))
      .select("id", "tile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ops.exactNtile(
        Ops.exactGlobalRank(df, Seq(col("metric"), col("id"))),
        3, "tile")
      .select("id", "tile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected && got.values.toSet == Set(1, 2))
  }

  test("exactGroupRank: single-row groups and a group per slice") {
    import spark.implicits._
    // more groups than shuffle partitions, one row each: every rank
    // is 1 and every n_total is 1 regardless of slice assignment
    val df = (0 until 100).map(i => (i.toLong, s"g$i"))
      .toDF("id", "grp")
    val got = Ops.exactGroupRank(df, Seq("grp"), Seq(col("id")))
      .select("grp", "rnk", "n_total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 100)
    assert(got.forall { case (_, rnk, n) => rnk == 1L && n == 1L })
  }

  test("exactPrefixSum: all-negative deltas and a single row") {
    import spark.implicits._
    val one = Seq((1L, 7L)).toDF("id", "v")
    val g1 = Ops.exactPrefixSum(one, Nil, Seq(col("id")), "v")
      .select("prefix_sum").collect().map(_.getLong(0))
    assert(g1.toSeq == Seq(7L))
    val neg = (1 to 6).map(i => (i.toLong, -2L)).toDF("id", "v")
    val g2 = Ops.exactPrefixSum(neg, Nil, Seq(col("id")), "v")
      .orderBy("id").select("prefix_sum").collect().map(_.getLong(0))
    assert(g2.toSeq == Seq(-2L, -4L, -6L, -8L, -10L, -12L))
  }
}
