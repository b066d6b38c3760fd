package graft

import org.apache.spark.sql.functions._

import graft.engine.{Ops, QueriesR13, Tables}

/** Behavior pins for the round-9 wave-3 model-in-the-loop keys —
  * the properties the DuckDB hash match can't express (convergence,
  * kernel equivalence, structural invariants).
  */
class QueriesR13Spec extends SparkTestBase {

  test("knnCross: neighbors come only from the corpus, exact ties by id") {
    import spark.implicits._
    val v = Array(1.0f, 0.0f)
    val q = Seq((100L, v)).toDF("vec_id", "embedding")
    val c = Seq((1L, v), (2L, v), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Ops.knnCross(q, c, "vec_id", "embedding", k = 2)
      .orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getInt(3)))
    // identical vectors tie at cos 1.0 → ascending id; the orthogonal
    // corpus row never makes top-2; the query itself is not a result
    assert(got.toSeq == Seq((100L, 1L, 1.0, 1), (100L, 2L, 1.0, 2)))
  }

  test("knnCross matches knnBruteForce restricted to cross pairs") {
    // on the real fixture: self-kNN over the full set, keeping only
    // (holdout → labeled) edges re-ranked, must equal knnCross —
    // the two kernels share one total order
    val e = Tables.embeddings(spark, sfDir)
    val unl = col("vec_id") % 5 === 0
    val cross = Ops.knnCross(e.filter(unl), e.filter(!unl),
                             "vec_id", "embedding", k = 3)
      .select("vec_id", "neighbor_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaSelf = Ops.knnBruteForce(e, "vec_id", "embedding", k = 50)
      .filter(col("vec_id") % 5 === 0 && col("neighbor_id") % 5 =!= 0)
      .withColumn("rk2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rk2") <= 3)
      .select("vec_id", "neighbor_id", "rk2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cross == viaSelf)
  }

  test("knnCross: multi-block cogroup path equals single-block result") {
    import spark.implicits._
    // disjoint query/corpus ids; tiny maxBlockBytes forces the
    // corpus-blocked cogroup + per-query window merge, which must be
    // indistinguishable from the broadcast fast path
    val corpus = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (100 until 110).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 17 + j * 5) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("vec_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
    val single = canon(Ops.knnCross(query, corpus, "vec_id", "embedding", 3))
    val chunked = canon(Ops.knnCross(query, corpus, "vec_id", "embedding", 3,
      maxBlockBytes = 500L)) // ~6 corpus rows per block → 4+ blocks
    assert(single.size == 10 * 3)
    assert(chunked == single)
  }

  test("knnBruteForce: multi-block self-join cogroup path equals single-block top-5") {
    // VERDICT r12 #4: the b×nB block-pair cogroup (the actual 100 TB
    // self-join path) was only reached above 256 MB; force it with a
    // tiny maxBlockBytes on the sf0.001 embeddings and require exact
    // equality with the broadcast fast path — scores, ranks, and tie
    // resolution (cos DESC, neighbor_id ASC) included.
    val e = graft.engine.Tables.embeddings(spark, sfDir)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("vec_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
    val single = canon(Ops.knnBruteForce(e, "vec_id", "embedding", 5))
    val chunked = canon(Ops.knnBruteForce(e, "vec_id", "embedding", 5,
      maxBlockBytes = 2000L)) // few rows per block → many block pairs
    assert(single.nonEmpty && single.size == e.count() * 5)
    assert(chunked == single)
  }

  test("emb_knn_classify: one prediction per held-out id, bounded votes") {
    val out = QueriesR13.embKnnClassify(spark, sfDir).collect()
    val e = Tables.embeddings(spark, sfDir)
    val nHold = e.filter(col("vec_id") % 5 === 0).count()
    assert(out.length == nHold)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val labels = e.select("label").distinct().collect()
      .map(_.getInt(0)).toSet
    out.foreach { r =>
      assert(labels.contains(r.getInt(2)), "pred label outside domain")
      val w = r.getDouble(3)
      assert(w > -10.0 && w <= 10.0, s"vote weight $w outside k-bound")
    }
  }

  test("knn outlier score: an isolated vector is the strict minimum") {
    import spark.implicits._
    // 12 near-identical vectors around e1 (tiny deterministic jitter
    // keeps ties off) + one orthogonal singleton; with k=10 every
    // cluster member's 10th neighbor is still in-cluster (sim ≈ 1)
    // while the singleton's 10th neighbor is cross-cluster (sim ≈ 0)
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(4)(j =>
        if (j == 0) 100.0f else (i * (j + 1) % 3).toFloat))
    } :+ (99L, Array(0.0f, 0.0f, 0.0f, 100.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val scored = Ops.knnBruteForce(df, "vec_id", "embedding", k = 10)
      .filter(col("rk") === 10)
      .select(col("vec_id"), col("cos_sim").as("knn10_sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scored.size == 13, "one score per vector")
    val (outlier, cluster) = (scored(99L), (scored - 99L).values)
    assert(cluster.forall(outlier < _),
      s"outlier $outlier not strictly below cluster min ${cluster.min}")
    assert(outlier < 0.1 && cluster.min > 0.9)
  }

  test("emb_knn_eval: confusion identities tie out against classify") {
    val pred = QueriesR13.embKnnClassify(spark, sfDir).collect()
    val eval = QueriesR13.embKnnEval(spark, sfDir).collect()
    val n = pred.length
    // the confusion decomposes the holdout exactly, on both axes
    assert(eval.map(_.getLong(1)).sum == n, "support sums to holdout")
    assert(eval.map(_.getLong(2)).sum == n, "predictions sum to holdout")
    assert(eval.map(_.getLong(3)).sum ==
      pred.map(_.getInt(4).toLong).sum, "tp sums to correct count")
    eval.foreach { r =>
      val (tp, p, rc) = (r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]))
      assert(tp <= r.getLong(1) && tp <= r.getLong(2))
      (p ++ rc).foreach(v => assert(v >= 0.0 && v <= 1.0))
      // F1 is the harmonic mean: bounded by its two inputs
      Option(r.get(6)).map(_.asInstanceOf[Double]).foreach { f1 =>
        assert(f1 <= math.max(p.get, rc.get) + 1e-9)
        assert(f1 >= math.min(p.get, rc.get) - 1e-9)
      }
    }
  }

  test("basket_assoc_rules: lift symmetry and ratio identities") {
    val rules = QueriesR13.basketAssocRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rules.nonEmpty)
    rules.foreach { case ((a, b), (n, sup, conf, lift)) =>
      // the mirrored rule exists with the same pair support and lift
      val (mn, _, _, mlift) = rules((b, a))
      assert(mn == n, "pair support is direction-independent")
      assert(math.abs(mlift - lift) <= 2e-6, "lift is symmetric")
      assert(n > 0 && sup > 0 && conf > 0 && conf <= 1.0 && lift > 0)
      // confidence ≥ support: conf divides by the antecedent count,
      // support by all baskets (a superset)
      assert(conf >= sup - 1e-9)
    }
  }

  test("docs_phrase_search matches a driver-side scan of the corpus") {
    val got = QueriesR13.docsPhraseSearch(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        val hits = (0 until toks.length - 1)
          .filter(i => toks(i) == "hash" && toks(i + 1) == "join")
        if (hits.isEmpty) None
        else Some(r.getLong(0) -> (hits.size.toLong, hits.min.toLong))
      }.toMap
    assert(got == expected)
  }

  test("events_attribution: models conserve the attributed revenue") {
    val out = QueriesR13.eventsAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
    val byModel = out.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    // first/last both sum round(value, 6) over the identical purchase
    // set — exactly equal; linear differs only by per-touch rounding
    assert(math.abs(byModel("first_touch") - byModel("last_touch")) < 1e-9)
    assert(math.abs(byModel("linear") - byModel("first_touch")) < 0.05)
    assert(out.map(_._1._2).toSet.subsetOf(Set("view", "click")))
    assert(out.forall(_._2 > 0))
  }

  test("cepMatch: negation blocks, most-recent start wins, span bounds") {
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: error blocks the first purchase; second matches
      (1L, 1L, t(0), "signup"), (1L, 2L, t(1), "error"),
      (1L, 3L, t(2), "purchase"),
      (1L, 4L, t(3), "signup"), (1L, 5L, t(4), "click"),
      (1L, 6L, t(5), "purchase"),
      // user 2: purchase beyond the 24 h span — no match
      (2L, 7L, t(0), "signup"), (2L, 8L, t(25 * 60), "purchase"),
      // user 3: purchase before any signup; later purchase takes the
      // MOST RECENT of two signups
      (3L, 9L, t(0), "purchase"), (3L, 10L, t(1), "signup"),
      (3L, 11L, t(2), "signup"), (3L, 12L, t(3), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Ops.cepMatch(ev, "user_id", "event_id", "ts", "event_type",
                           "signup", "purchase", "error", 86400000000L)
      .orderBy("user_id", "end_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq((1L, 4L, 6L, 1L), (3L, 11L, 12L, 0L)))
  }

  test("cepMatch: seeded random streams match a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val types = Vector("signup", "error", "purchase", "click", "view")
    val span = 5L * 60000000L // 5 min in micros
    val ev = (0 until 400).map { i =>
      (rnd.nextInt(12).toLong, i.toLong,
       new java.sql.Timestamp(rnd.nextInt(900) * 1000L),
       types(rnd.nextInt(types.size)))
    }
    // brute force: per user, (ts, id)-sorted replay tracking last
    // signup / last error positions
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val seq = rows.sortBy(r => (r._3.getTime, r._2))
      var lastS = -1; var lastE = -1
      seq.zipWithIndex.flatMap { case ((_, eid, ts, typ), pos) =>
        val hit =
          if (typ == "purchase" && lastS >= 0 && lastE < lastS &&
              (ts.getTime - seq(lastS)._3.getTime) * 1000L <= span)
            Some((uid, seq(lastS)._2, eid, (pos - lastS - 1).toLong))
          else None
        if (typ == "signup") lastS = pos
        if (typ == "error") lastE = pos
        hit
      }
    }.toSet
    val got = Ops.cepMatch(
        ev.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_id", "ts", "event_type",
        "signup", "purchase", "error", span)
      .select("user_id", "start_id", "end_id", "n_between").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "degenerate seed: no matches to compare")
    assert(got == expected,
      s"diverged: spark-only=${(got -- expected).take(3)}, " +
        s"ref-only=${(expected -- got).take(3)}")
  }

  test("docs_quality_logreg: GD converges to the base rate on " +
       "label-independent fixtures") {
    val out = QueriesR13.docsQualityLogreg(spark, sfDir)
    val agg = out.agg(avg("p_quality"), avg("label_en"),
                      min("p_quality"), max("p_quality")).head()
    val (meanP, baseRate) = (agg.getDouble(0), agg.getDouble(1))
    // lang ⊥ text in the synthetic corpus, so the trained model's mean
    // score must sit at the pseudo-label base rate (the honest optimum),
    // not at the σ(0) = 0.5 start — i.e. training actually moved
    assert(math.abs(meanP - baseRate) < 0.02,
      s"mean p $meanP vs base rate $baseRate: not converged")
    assert(math.abs(meanP - 0.5) > 0.01, "weights never left the origin")
    // scores vary with the features (the model is not intercept-only)
    assert(agg.getDouble(3) - agg.getDouble(2) > 1e-4)
    out.collect().foreach { r =>
      val p = r.getDouble(2)
      assert(p > 0.0 && p < 1.0)
      assert(r.getInt(3) == (if (p >= 0.5) 1 else 0))
    }
  }
}
