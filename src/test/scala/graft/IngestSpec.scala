package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Ingest, LakeTable}

/** The streaming training-data ingest (graft.engine.Ingest): corpus
  * growth across microbatches with the persisted-band-index dedup,
  * exactly-once lake commits, restart idempotence, an independently
  * recomputed audit log, and the partial-commit re-delivery case the
  * design's anti-join determinism exists for. */
class IngestSpec extends SparkTestBase {

  private def docs(): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def idsOf(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def rowsOf(spark0: org.apache.spark.sql.SparkSession,
                     root: String): Set[Seq[Any]] =
    Ingest.readOrEmpty(spark0, root,
        new org.apache.spark.sql.types.StructType().add("doc_id", "long"))
      .collect().map(_.toSeq).toSet

  /** Independent word-5-shingle Jaccard, plain Scala — same
    * definition as Ops.shingles + jaccardVerify, none of the code. */
  private def jac(a: String, b: String): Double = {
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (sh(a), sh(b))
    val i = (sa & sb).size.toDouble
    val u = (sa | sb).size.toDouble
    val j = if (u == 0) 0.0 else i / u
    java.math.BigDecimal.valueOf(j)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("streaming ingest: corpus grows across batches; restart is exactly-once; every reject is audited and true") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val inDir = s"$base/input"
    new java.io.File(inDir).mkdirs()
    val root = s"$base/lake"
    val all = docs()
    def stage(half: DataFrame, name: String): Unit =
      stageOnePart(half, inDir, s"docs-$name")
    stage(all.filter(col("doc_id") < 250), "a")
    val schema = spark.read.parquet(inDir).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Ingest.ingestBatch(b, root, "t_ingest", id); ()
        }
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val docsAfterA = rowsOf(spark, Ingest.docsRoot(root))
    val rejAfterA = rowsOf(spark, Ingest.rejectsRoot(root))
    assert(docsAfterA.nonEmpty, "first batch accepted nothing")
    drain()                                     // restart, no new files
    assert(rowsOf(spark, Ingest.docsRoot(root)) == docsAfterA &&
           rowsOf(spark, Ingest.rejectsRoot(root)) == rejAfterA,
      "empty restart changed the lake")
    stage(all.filter(col("doc_id") >= 250), "b")
    drain()

    val acceptedIds = idsOf(LakeTable.read(spark, Ingest.docsRoot(root)))
    val rejects = LakeTable.read(spark, Ingest.rejectsRoot(root)).collect()
    val rejectedIds = rejects.map(_.getAs[Long]("doc_id")).toSet
    val stagedIds = idsOf(all)
    // partition: every staged doc is accepted XOR rejected
    assert((acceptedIds ++ rejectedIds) == stagedIds,
      s"lost docs: ${(stagedIds -- acceptedIds -- rejectedIds).take(5)}")
    assert((acceptedIds & rejectedIds).isEmpty,
      s"docs both accepted and rejected: ${(acceptedIds & rejectedIds).take(5)}")
    assert(rejectedIds.nonEmpty,
      "fixture produced no rejects — the dedup leg went untested")
    // the band index covers exactly the accepted corpus
    assert(idsOf(LakeTable.read(spark, Ingest.bandsRoot(root))) == acceptedIds,
      "band index out of sync with the accepted corpus")
    // audit truth: recompute every reject pair's Jaccard independently
    val textById = all.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rejects.foreach { r =>
      val (d, m) = (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"))
      val j = jac(textById(d), textById(m))
      assert(j >= 0.8, s"audit pair ($d,$m) is below threshold: $j")
      assert(math.abs(j - r.getAs[Double]("jaccard")) < 1e-9,
        s"audit pair ($d,$m): stored ${r.getAs[Double]("jaccard")} " +
          s"!= recomputed $j")
      r.getAs[String]("match_src") match {
        case "base" => assert(acceptedIds.contains(m),
          s"base match $m of $d is not an accepted doc")
        case "delta" => assert(m < d,
          s"delta match must be the earlier doc: ($d,$m)")
        case other => fail(s"unknown match_src $other")
      }
    }
  }

  test("quality filter stage: filtered docs audit separately, never enter the index, and cannot doom their near-dups") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_f").toString
    val root = s"$base/lake"
    val all = docs()
    val tooShort = Ingest.tooShortRule(100)
    Ingest.ingestBatch(all.filter(col("doc_id") < 250), root, "t", 0L,
      filter = Some(tooShort))
    Ingest.ingestBatch(all.filter(col("doc_id") >= 250), root, "t", 1L,
      filter = Some(tooShort))
    val acceptedIds = idsOf(LakeTable.read(spark, Ingest.docsRoot(root)))
    val rejectedIds = LakeTable.read(spark, Ingest.rejectsRoot(root))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val filtered = LakeTable.read(spark, Ingest.filteredRoot(root))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val filteredIds = filtered.map(_._1).toSet
    val stagedIds = idsOf(all)
    // three-way partition of the staged corpus
    assert(acceptedIds ++ rejectedIds ++ filteredIds == stagedIds,
      s"lost: ${(stagedIds -- acceptedIds -- rejectedIds -- filteredIds).take(5)}")
    assert((acceptedIds & filteredIds).isEmpty &&
           (rejectedIds & filteredIds).isEmpty &&
           (acceptedIds & rejectedIds).isEmpty, "verdicts overlap")
    // the filter verdict is exactly the rule, with its reason
    val wantFiltered = idsOf(all.filter(col("n_chars") < 100))
    assert(filteredIds == wantFiltered && filtered.forall(_._2 == "too_short"),
      s"filter verdicts wrong: got ${filteredIds.size}, want ${wantFiltered.size}")
    // filtered docs never entered the band index
    assert((idsOf(LakeTable.read(spark, Ingest.bandsRoot(root)))
              & filteredIds).isEmpty,
      "a filtered doc's bands entered the index")
    // and they cannot doom others: no reject names a filtered doc as
    // its match
    val matchIds = LakeTable.read(spark, Ingest.rejectsRoot(root))
      .select("match_id").collect().map(_.getLong(0)).toSet
    assert((matchIds & filteredIds).isEmpty,
      "a filtered doc doomed another doc")
    // re-delivery with the filter (docs+bands+rejects landed,
    // filtered lost) replays identically
    val ref = s"$base/ref"
    Ingest.ingestBatch(all.filter(col("doc_id") < 250), ref, "t", 0L,
      filter = Some(tooShort))
    for (sub <- Seq(Ingest.docsRoot _, Ingest.bandsRoot _,
                    Ingest.rejectsRoot _))
      LakeTable.appendTxn(
        LakeTable.read(spark, sub(root)).filter(col("doc_id") >= 250),
        sub(ref), "t", 1L)
    Ingest.ingestBatch(all.filter(col("doc_id") >= 250), ref, "t", 1L,
      filter = Some(tooShort))
    for (sub <- Seq(Ingest.docsRoot _, Ingest.bandsRoot _,
                    Ingest.rejectsRoot _, Ingest.filteredRoot _)) {
      val (r, c) = (rowsOf(spark, sub(root)), rowsOf(spark, sub(ref)))
      assert(r == c, s"filtered re-delivery diverged at ${sub(ref)}")
    }
  }

  test("ingest survives lake maintenance between batches; txn idempotence outlives the pruned log") {
    // The operational composition: a long-running ingest's tables get
    // checkpoint → vacuum → pruneLog → pruneCheckpoints between
    // batches (the documented maintenance order). Later batches must
    // reach identical verdicts, reads must stay exact — and the
    // (appId, batchId) idempotence map must survive the commit-JSON
    // prune (it is folded into the checkpoint), so a pathologically
    // late re-delivery of an already-pruned batch still no-ops
    // instead of double-committing.
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_mx").toString
    val all = docs()
    val halfA = all.filter(col("doc_id") < 250)
    val halfB = all.filter(col("doc_id") >= 250)
    val ref = s"$base/ref"
    Ingest.ingestBatch(halfA, ref, "t", 0L)
    Ingest.ingestBatch(halfB, ref, "t", 1L)
    val mx = s"$base/mx"
    Ingest.ingestBatch(halfA, mx, "t", 0L)
    Ingest.ingestBatch(halfB, mx, "t", 1L)
    // maintenance in the documented order — the v0 commit JSONs go
    // away, so batch 0's txn record now lives ONLY in the checkpoint
    for (sub <- Seq(Ingest.docsRoot(mx), Ingest.bandsRoot(mx),
                    Ingest.rejectsRoot(mx))) {
      LakeTable.checkpoint(spark, sub)
      LakeTable.vacuum(spark, sub,
        LakeTable.latestVersion(spark, sub).get)
      val pruned = LakeTable.pruneLog(spark, sub)
      assert(pruned.nonEmpty, s"$sub: nothing pruned — v0 JSON still " +
        "present, the txn-survival leg is not being exercised")
      LakeTable.pruneCheckpoints(spark, sub)
    }
    // pathologically late re-deliveries of BOTH batches must no-op
    Ingest.ingestBatch(halfA, mx, "t", 0L)
    Ingest.ingestBatch(halfB, mx, "t", 1L)
    for (sub <- Seq(Ingest.docsRoot _, Ingest.bandsRoot _,
                    Ingest.rejectsRoot _)) {
      val (r, c) = (rowsOf(spark, sub(ref)), rowsOf(spark, sub(mx)))
      assert(r == c, s"maintained run diverged at ${sub(mx)}: " +
        s"ref-only=${(r -- c).take(3)}, mx-only=${(c -- r).take(3)}")
    }
    // and ingest proceeds over the maintained tables: a batch of
    // EXACT COPIES of accepted docs (new ids, identical text) must be
    // rejected wholesale — identical text means identical shingles,
    // signatures, and bands, so each copy collides with its original
    // in every band bucket and verifies at Jaccard 1.0
    val acceptedBefore = idsOf(LakeTable.read(spark, Ingest.docsRoot(mx)))
    val copies = LakeTable.read(spark, Ingest.docsRoot(mx))
      .withColumn("doc_id", col("doc_id") + lit(100000L))
    Ingest.ingestBatch(copies, mx, "t", 2L)
    assert(idsOf(LakeTable.read(spark, Ingest.docsRoot(mx))) ==
             acceptedBefore,
      "exact copies of accepted docs entered the corpus")
    val rej2 = LakeTable.read(spark, Ingest.rejectsRoot(mx))
      .filter(col("doc_id") >= 100000L).collect()
    assert(rej2.map(_.getAs[Long]("doc_id")).toSet ==
             acceptedBefore.map(_ + 100000L),
      "some copy went unrejected")
    rej2.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rows) =>
      assert(rows.exists(r => r.getAs[Long]("match_id") == d - 100000L &&
                              r.getAs[Double]("jaccard") == 1.0),
        s"copy $d lacks the Jaccard-1.0 pair with its original")
    }
  }

  test("embedding ingest: frozen codebook, cell-scoped dedup, audited rejects, restart exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("graft_eingest").toString
    val inDir = s"$base/input"
    new java.io.File(inDir).mkdirs()
    val root = s"$base/lake"
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def stage(half: DataFrame, name: String): Unit =
      stageOnePart(half, inDir, s"emb-$name")
    stage(all.filter(col("vec_id") < 250), "a")
    val schema = spark.read.parquet(inDir).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Ingest.ingestEmbBatch(b, root, "t_emb", id); ()
        }
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val vecsAfterA = rowsOf(spark, Ingest.vecsRoot(root))
    val cbAfterA = rowsOf(spark, Ingest.codebookRoot(root))
    assert(vecsAfterA.nonEmpty && cbAfterA.nonEmpty)
    drain()                                     // restart, no new files
    assert(rowsOf(spark, Ingest.vecsRoot(root)) == vecsAfterA,
      "empty restart changed the vector corpus")
    stage(all.filter(col("vec_id") >= 250), "b")
    drain()
    // the codebook never retrains: batch b left it untouched
    assert(rowsOf(spark, Ingest.codebookRoot(root)) == cbAfterA,
      "codebook changed after the first batch — it must be frozen")
    val vecs = LakeTable.read(spark, Ingest.vecsRoot(root)).collect()
    val acceptedIds = vecs.map(_.getAs[Long]("vec_id")).toSet
    val rejects = LakeTable.read(spark, Ingest.vrejectsRoot(root)).collect()
    val rejectedIds = rejects.map(_.getAs[Long]("vec_id")).toSet
    val stagedIds = idsOf(all.select(col("vec_id").as("doc_id")))
    assert((acceptedIds ++ rejectedIds) == stagedIds &&
           (acceptedIds & rejectedIds).isEmpty,
      s"corpus partition broken: lost=" +
        s"${(stagedIds -- acceptedIds -- rejectedIds).take(5)}")
    assert(rejectedIds.nonEmpty,
      "fixture produced no embedding rejects — dedup leg untested")
    // audit truth: recompute every pair's cosine independently
    val embById = all.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    rejects.foreach { r =>
      val (v, m) = (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"))
      val c = cosine(embById(v), embById(m))
      assert(c > 0.45, s"audit pair ($v,$m) below threshold: $c")
      assert(math.abs(c - r.getAs[Double]("cos")) < 1e-9,
        s"audit pair ($v,$m): stored ${r.getAs[Double]("cos")} != $c")
      r.getAs[String]("match_src") match {
        case "base"  => assert(acceptedIds.contains(m))
        case "delta" => assert(m < v)
        case other   => fail(s"unknown match_src $other")
      }
    }
    // accepted cell ids are the frozen-codebook argmax (recompute for
    // a sample against the committed codebook, exact rule)
    val cb = LakeTable.read(spark, Ingest.codebookRoot(root)).collect()
      .map(r => r.getAs[Long]("cid") ->
        r.getSeq[Double](r.fieldIndex("cemb")).toArray)
    def cosMixed(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i).toDouble
        nb += b(i) * b(i); i += 1
      }
      java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    vecs.take(50).foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val best = cb.map { case (cid, ce) =>
        (cosMixed(embById(v), ce), cid) }
        .maxBy { case (c, cid) => (c, -cid) }._2
      assert(r.getAs[Long]("cell_id") == best,
        s"vec $v assigned cell ${r.getAs[Long]("cell_id")}, argmax $best")
    }
  }

  test("embedding quality filter: filtered vectors audit separately, shape no codebook cell, doom no neighbor") {
    val base = java.nio.file.Files.createTempDirectory("graft_eingest_f").toString
    val root = s"$base/lake"
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val lowPrefixMass = Ingest.lowPrefixMassRule(0.2)
    Ingest.ingestEmbBatch(all.filter(col("vec_id") < 250), root, "t", 0L,
      filter = Some(lowPrefixMass))
    Ingest.ingestEmbBatch(all.filter(col("vec_id") >= 250), root, "t", 1L,
      filter = Some(lowPrefixMass))
    val acceptedIds = LakeTable.read(spark, Ingest.vecsRoot(root))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rejectedIds = LakeTable.read(spark, Ingest.vrejectsRoot(root))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val filtered = LakeTable.read(spark, Ingest.vfilteredRoot(root))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val filteredIds = filtered.map(_._1).toSet
    val stagedIds = all.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(acceptedIds ++ rejectedIds ++ filteredIds == stagedIds &&
           (acceptedIds & filteredIds).isEmpty &&
           (rejectedIds & filteredIds).isEmpty,
      "three-way vector partition broken")
    // independent recompute of the rule, in plain Scala (not the
    // rule's own expr string — a typo there must fail here)
    val wantFiltered = all.select("vec_id", "embedding").collect()
      .filter { r =>
        val v = r.getSeq[Float](1).toArray
        math.sqrt(v.take(8).map(x => x.toDouble * x).sum) < 0.2
      }.map(_.getLong(0)).toSet
    assert(filteredIds == wantFiltered &&
           filtered.forall(_._2 == "low_prefix_mass"),
      s"filter verdicts wrong: ${filteredIds.size} vs ${wantFiltered.size}")
    assert(filteredIds.nonEmpty, "rule filtered nothing — leg untested")
    // no reject blames a filtered vector
    val dupOf = LakeTable.read(spark, Ingest.vrejectsRoot(root))
      .select("dup_of").collect().map(_.getLong(0)).toSet
    assert((dupOf & filteredIds).isEmpty, "a filtered vector doomed another")
  }

  test("all-filtered first embedding batch commits no codebook; probe answers empty; the next batch recovers") {
    // The wedge the guard exists for: kmeansCodebook over zero
    // survivors must never commit (an empty frozen codebook would
    // make every later batch skip retraining and crash reading a
    // data-less table, forever). The filter verdicts still audit,
    // the txn mark still advances, a probe answers zero rows instead
    // of throwing, and the first batch WITH survivors trains.
    val base = java.nio.file.Files.createTempDirectory("graft_eingest_w").toString
    val root = s"$base/lake"
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rejectAll: DataFrame => DataFrame =
      d => d.select(col("vec_id"), lit("quarantine").as("reason"))
    val halfA = all.filter(col("vec_id") < 250)
    Ingest.ingestEmbBatch(halfA, root, "t", 0L, filter = Some(rejectAll))
    assert(LakeTable.latestVersion(spark, Ingest.codebookRoot(root)).isEmpty,
      "an all-filtered first batch committed a codebook")
    assert(LakeTable.latestVersion(spark, Ingest.vecsRoot(root)) == Some(0L),
      "the txn mark did not advance")
    assert(LakeTable.read(spark, Ingest.vfilteredRoot(root)).count() ==
             halfA.count(), "filter verdicts not audited")
    val queries = all.limit(2).select(col("vec_id").as("qid"),
                                      col("embedding"))
    assert(Ingest.knnProbe(spark, root, queries, 5).count() == 0,
      "probe over an empty corpus must answer empty, not throw")
    // re-delivery of the all-filtered batch is still a no-op
    Ingest.ingestEmbBatch(halfA, root, "t", 0L, filter = Some(rejectAll))
    assert(LakeTable.read(spark, Ingest.vfilteredRoot(root)).count() ==
             halfA.count(), "re-delivered all-filtered batch double-audited")
    // the first batch with survivors trains and accepts
    Ingest.ingestEmbBatch(all.filter(col("vec_id") >= 250), root, "t", 1L)
    assert(LakeTable.latestVersion(spark, Ingest.codebookRoot(root)).isDefined &&
           LakeTable.read(spark, Ingest.vecsRoot(root)).count() > 0,
      "ingest did not recover after the all-filtered batch")
    assert(Ingest.knnProbe(spark, root, queries, 5).count() > 0)
  }

  test("knnProbe over the ingested corpus: all-cells probe equals exact brute force, tie rule included") {
    // The read half of the ingest→serve loop: with nprobe = every
    // cell, the probe must reproduce the exact cosine top-k over the
    // accepted corpus — recomputed here in plain Scala with the same
    // 6 dp HALF_UP rounding and (score DESC, id ASC) tie rule.
    val base = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val root = s"$base/lake"
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Ingest.ingestEmbBatch(all.filter(col("vec_id") < 250), root, "t", 0L)
    Ingest.ingestEmbBatch(all.filter(col("vec_id") >= 250), root, "t", 1L)
    val corpus = LakeTable.read(spark, Ingest.vecsRoot(root))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val queryIds = Seq(3L, 77L, 205L, 391L, 444L)
    val queries = all.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding"))
    val k = 5
    val got = Ingest.knnProbe(spark, root, queries, k, nprobe = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._4).map(t => (t._2, t._3)).toSeq }
    val qEmb = all.filter(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    queryIds.foreach { qid =>
      val want = corpus.map { case (vid, v) => (vid, cosine(qEmb(qid), v)) }
        .sortBy { case (vid, c) => (-c, vid) }.take(k)
        .map { case (vid, c) => (vid, c) }.toSeq
      assert(got(qid) == want,
        s"probe for $qid diverged:\n got=${got(qid)}\nwant=$want")
    }
  }

  test("embedding ingest partial-commit re-delivery: codebook-only and vecs-without-rejects windows both recompute identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_eingest_rd").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val halfA = all.filter(col("vec_id") < 250)
    val halfB = all.filter(col("vec_id") >= 250)
    val ref = s"$base/ref"
    Ingest.ingestEmbBatch(halfA, ref, "t", 0L)
    Ingest.ingestEmbBatch(halfB, ref, "t", 1L)
    // window 1: batch 0 crashed after the codebook commit, before vecs
    val c1 = s"$base/c1"
    LakeTable.appendTxn(LakeTable.read(spark, Ingest.codebookRoot(ref)),
      Ingest.codebookRoot(c1), "t", 0L)
    Ingest.ingestEmbBatch(halfA, c1, "t", 0L)     // re-delivery
    Ingest.ingestEmbBatch(halfB, c1, "t", 1L)
    // window 2: batch 1 crashed after vecs commit, before rejects
    val c2 = s"$base/c2"
    Ingest.ingestEmbBatch(halfA, c2, "t", 0L)
    val vecsB = LakeTable.read(spark, Ingest.vecsRoot(ref))
      .filter(col("vec_id") >= 250)
    LakeTable.appendTxn(vecsB, Ingest.vecsRoot(c2), "t", 1L)
    Ingest.ingestEmbBatch(halfB, c2, "t", 1L)     // re-delivery
    for (crash <- Seq(c1, c2);
         sub <- Seq(Ingest.vecsRoot _, Ingest.vrejectsRoot _,
                    Ingest.codebookRoot _)) {
      val (r, c) = (rowsOf(spark, sub(ref)), rowsOf(spark, sub(crash)))
      assert(r == c, s"diverged at ${sub(crash)}: " +
        s"ref-only=${(r -- c).take(3)}, crash-only=${(c -- r).take(3)}")
    }
  }

  test("property: planted near-duplicates never both survive, across random corpora and batch splits") {
    // Synthetic corpora (so the dup structure is KNOWN, unlike the
    // fixture): random word-soup documents plus planted near-copies
    // (≤2 of ~40 words perturbed → Jaccard ≥ ~0.85, candidate
    // probability ≈ 1 at 16 bands × 2 rows), ingested over random
    // batch splits. Invariants per seed: the corpus partitions into
    // accepted ∪ rejected; every audit pair really is ≥ threshold
    // (plain-Scala recompute); no planted (original, copy) pair is
    // ever BOTH accepted; the band index covers exactly the accepted
    // set.
    import spark.implicits._
    val vocab = (0 until 50).map(i => s"w$i")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nBase = 40
      val base = (0 until nBase).map { i =>
        val len = 30 + rnd.nextInt(20)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // half the plants are EXACT copies (J = 1.0 — the strong branch
      // is guaranteed to fire), half perturb one word (word-5-shingle
      // Jaccard drops fast: these often land BELOW 0.8 and must then
      // be allowed to survive — the guard below checks the true J)
      val planted = (0 until 8).map { j =>
        val (origId, text) = base(rnd.nextInt(nBase))
        val perturbed =
          if (j % 2 == 0) text
          else {
            val words = text.split(" ").clone()
            words(rnd.nextInt(words.length)) =
              vocab(rnd.nextInt(vocab.size))
            words.mkString(" ")
          }
        (1000L + j, perturbed, origId)
      }
      val corpus = base ++ planted.map(p => (p._1, p._2))
      val df = corpus.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_ingest_prop$seed").toString + "/lake"
      // random split into 3 batches (shuffled, uneven)
      val order = rnd.shuffle(corpus.map(_._1))
      val cut1 = order.size / 3 + rnd.nextInt(5)
      val cut2 = 2 * order.size / 3 + rnd.nextInt(5)
      val parts = Seq(order.take(cut1), order.slice(cut1, cut2),
                      order.drop(cut2)).filter(_.nonEmpty)
      parts.zipWithIndex.foreach { case (ids, b) =>
        // randomly interleave full maintenance passes (every-batch
        // policy, randomly armed): all four invariants below must be
        // blind to WHEN compaction/checkpoint/vacuum/prune ran
        Ingest.ingestBatch(df.filter(col("doc_id").isin(ids: _*)),
          root, "t", b.toLong,
          maintenance = if (rnd.nextBoolean())
            Some(Ingest.IngestMaintenance(everyBatches = 1)) else None)
      }
      val acceptedIds = idsOf(LakeTable.read(spark, Ingest.docsRoot(root)))
      // readOrEmpty: a clean-corpus seed may have zero rejects, which
      // leaves the rejects table with only data-less commits
      val rejects = Ingest.readOrEmpty(spark, Ingest.rejectsRoot(root),
          new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("match_id", "long")
            .add("match_src", "string").add("jaccard", "double"))
        .collect()
      val rejectedIds = rejects.map(_.getAs[Long]("doc_id")).toSet
      val allIds = corpus.map(_._1).toSet
      assert(acceptedIds ++ rejectedIds == allIds &&
             (acceptedIds & rejectedIds).isEmpty,
        s"seed=$seed partition broken")
      assert(idsOf(LakeTable.read(spark, Ingest.bandsRoot(root)))
               == acceptedIds, s"seed=$seed band index out of sync")
      val textById = corpus.toMap
      rejects.foreach { r =>
        val j = jac(textById(r.getAs[Long]("doc_id")),
                    textById(r.getAs[Long]("match_id")))
        assert(j >= 0.8,
          s"seed=$seed audit pair below threshold: $r -> $j")
      }
      val strong = planted.filter { case (_, t, o) =>
        jac(t, textById(o)) >= 0.8 }
      assert(strong.nonEmpty,
        s"seed=$seed planted no true dups — the strong branch is idle")
      strong.foreach { case (copyId, copyText, origId) =>
        assert(!(acceptedIds.contains(copyId) &&
                 acceptedIds.contains(origId)),
          s"seed=$seed planted pair ($origId,$copyId) " +
            s"J=${jac(copyText, textById(origId))} both survived")
      }
    }
  }

  test("partial-commit re-delivery recomputes identical verdicts (docs+bands landed, rejects did not)") {
    // The nastiest crash window: batch 1's docs AND bands committed,
    // the rejects commit and Spark's own checkpoint both lost. The
    // re-delivered batch probes a lake that already contains its own
    // documents — without the anti-join self-exclusion every doc
    // would match itself into the reject pile. Build the reference
    // run and the crashed run side by side and require identical
    // final tables.
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_rd").toString
    val all = docs()
    val halfA = all.filter(col("doc_id") < 250)
    val halfB = all.filter(col("doc_id") >= 250)
    val ref = s"$base/ref"
    val crash = s"$base/crash"
    Ingest.ingestBatch(halfA, ref, "t", 0L)
    Ingest.ingestBatch(halfB, ref, "t", 1L)
    Ingest.ingestBatch(halfA, crash, "t", 0L)
    // simulate the partial commit: steal the REFERENCE run's batch-1
    // docs/bands (what the crashed attempt would have written — the
    // whole point is that verdicts are deterministic) and commit them
    // under batch 1; leave rejects uncommitted
    val docsB = LakeTable.read(spark, Ingest.docsRoot(ref))
      .filter(col("doc_id") >= 250)
    val bandsB = LakeTable.read(spark, Ingest.bandsRoot(ref))
      .filter(col("doc_id") >= 250)
    LakeTable.appendTxn(docsB, Ingest.docsRoot(crash), "t", 1L)
    LakeTable.appendTxn(bandsB, Ingest.bandsRoot(crash), "t", 1L)
    // the re-delivery
    Ingest.ingestBatch(halfB, crash, "t", 1L)
    for (sub <- Seq(Ingest.docsRoot _, Ingest.bandsRoot _,
                    Ingest.rejectsRoot _)) {
      val (r, c) = (rowsOf(spark, sub(ref)), rowsOf(spark, sub(crash)))
      assert(r == c,
        s"re-delivered run diverged at ${sub(crash)}: " +
          s"ref-only=${(r -- c).take(3)}, crash-only=${(c -- r).take(3)}")
    }
  }

  test("snapshot-pinned knnProbe: a probe asOf an earlier vecs version is immune to later ingest") {
    // The read-while-ingesting contract: a serving fleet pins one
    // lake version for a session and answers every query from that
    // consistent corpus while ingest keeps committing. Batch 0 lands
    // half the vectors; the pinned version's probe results must be
    // byte-identical before and after batch 1 doubles the corpus,
    // while the unpinned probe sees the new neighbors.
    val base = java.nio.file.Files.createTempDirectory("graft_knn_asof").toString
    val root = s"$base/lake"
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    Ingest.ingestEmbBatch(all.filter(col("vec_id") < 250), root, "t", 0L)
    val v0 = LakeTable.latestVersion(spark, Ingest.vecsRoot(root)).get
    val q = all.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    def rows(asOf: Option[Long]): Set[Seq[Any]] =
      Ingest.knnProbe(spark, root, q, k = 5, nprobe = 16, asOf = asOf)
        .collect().map(_.toSeq).toSet
    val pinnedBefore = rows(Some(v0))
    assert(pinnedBefore == rows(None),
      "pinned-at-latest probe diverged from the unpinned probe")
    Ingest.ingestEmbBatch(all.filter(col("vec_id") >= 250), root, "t", 1L)
    assert(rows(Some(v0)) == pinnedBefore,
      "a pinned probe changed after a later ingest commit — snapshot broken")
    assert(rows(None) != pinnedBefore,
      "the corpus doubled but the unpinned probe saw nothing new — " +
        "fixture too weak or the probe ignores the new version")
  }

  test("degenerate documents (null/empty/short text) flow through ingest deterministically") {
    // A crawl feed WILL contain null and near-empty text. Contract:
    // no crash; a document with fewer than shingleSize words has no
    // shingles, hence no near-dup definition — it is ACCEPTED and can
    // never match or be matched (length/quality rules are the gate's
    // job, not the dedup's); re-delivery replays identically.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_degen_docs").toString
    val root = s"$base/lake"
    val normal = docs().select("doc_id", "text").filter(col("doc_id") < 50)
    val weird = Seq[(Long, Option[String])](
        (90001L, None),                      // null text
        (90002L, Some("")),                  // empty
        (90003L, Some("just three words")),  // < shingleSize words
        (90004L, Some("just three words"))   // identical twin, also short
      ).toDF("doc_id", "text")
    Ingest.ingestBatch(normal.unionByName(weird), root, "t", 0L)
    val accepted = idsOf(LakeTable.read(spark, Ingest.docsRoot(root)))
    assert(Set(90001L, 90002L, 90003L, 90004L).subsetOf(accepted),
      s"degenerate docs were not accepted: ${accepted.filter(_ >= 90000L)}")
    // no shingles → no band rows → the twins at 90003/90004 did NOT
    // match each other (no near-dup definition below shingleSize)
    val bandIds = idsOf(LakeTable.read(spark, Ingest.bandsRoot(root)))
    assert(bandIds.forall(_ < 90000L),
      s"degenerate docs grew band rows: ${bandIds.filter(_ >= 90000L)}")
    // re-delivery: identical tables
    val before = Seq(Ingest.docsRoot _, Ingest.bandsRoot _,
                     Ingest.rejectsRoot _).map(s => rowsOf(spark, s(root)))
    Ingest.ingestBatch(normal.unionByName(weird), root, "t", 0L)
    assert(Seq(Ingest.docsRoot _, Ingest.bandsRoot _, Ingest.rejectsRoot _)
             .map(s => rowsOf(spark, s(root))) == before,
      "re-delivered degenerate batch changed table content")
  }

  test("degenerate embeddings (null/empty) audit to vfiltered and never enter the corpus or wedge the codebook") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_degen_emb").toString
    val clean = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 100)
    // Leg 1: an ALL-degenerate first batch must not train (or wedge)
    // a codebook — the all-filtered guard extended to degenerates.
    val root1 = s"$base/lake1"
    val degen = Seq[(Long, Option[Array[Float]])](
        (80001L, None),                      // null embedding
        (80002L, Some(Array.empty[Float]))   // zero-length embedding
      ).toDF("vec_id", "embedding")
    Ingest.ingestEmbBatch(degen, root1, "t", 0L)
    assert(LakeTable.latestVersion(spark, Ingest.codebookRoot(root1)).isEmpty,
      "an all-degenerate first batch trained a codebook")
    val aud1 = Ingest.readOrEmpty(spark, Ingest.vfilteredRoot(root1),
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long").add("reason", "string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(aud1 == Set(80001L -> "degenerate_embedding",
                       80002L -> "degenerate_embedding"),
      s"degenerate-only first batch misaudited: $aud1")
    // and the next clean batch recovers: trains, accepts
    Ingest.ingestEmbBatch(clean, root1, "t", 1L)
    assert(LakeTable.read(spark, Ingest.vecsRoot(root1)).count() > 0)
    // Leg 2: degenerates mixed into a LATER batch audit with their
    // reason and never reach vecs.
    val root2 = s"$base/lake2"
    Ingest.ingestEmbBatch(clean, root2, "t", 0L)
    Ingest.ingestEmbBatch(degen, root2, "t", 1L)
    val vecIds = idsOf(LakeTable.read(spark, Ingest.vecsRoot(root2))
      .withColumnRenamed("vec_id", "doc_id"))
    assert(vecIds.forall(_ < 80000L),
      s"degenerate vectors entered the corpus: ${vecIds.filter(_ >= 80000L)}")
    val aud2 = Ingest.readOrEmpty(spark, Ingest.vfilteredRoot(root2),
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long").add("reason", "string"))
      .filter(col("reason") === "degenerate_embedding")
      .collect().map(_.getLong(0)).toSet
    assert(aud2 == Set(80001L, 80002L),
      s"degenerate vectors not audited: $aud2")
  }
}
