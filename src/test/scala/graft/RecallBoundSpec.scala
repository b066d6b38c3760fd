package graft

import org.apache.spark.sql.functions._

import graft.engine.Ops

/** ANN recall floor on CLUSTERED data (VERDICT r13 "Next round" #4).
  *
  * `emb_ivf_recall` measures recall on the random test embeddings —
  * the worst case for IVF (no cluster structure to exploit: ~19% at
  * nprobe=1, ~60% at nprobe=4, per the honest note in Ops.annIvf).
  * Random vectors understate production recall, where embeddings DO
  * cluster (that is why anyone deploys IVF); this suite is the
  * complementary gate: a deterministic label-correlated Gaussian
  * fixture where IVF should shine, with a hard floor asserted on it.
  * A codebook regression (seed pick, Lloyd update, tie rule) or a
  * probe-ranking regression in annIvf drops recall here and fails a
  * NAMED suite instead of shifting an unasserted number.
  *
  * Fixture: 12 well-separated unit-norm cluster centers in 16-d
  * (seeded java.util.Random — same bytes every run), 60 members each
  * drawn as center + N(0, 0.05) noise, renormalized. Same-cluster
  * cosine ≈ 0.99+, cross-cluster ≈ 0 — every vector's exact top-5
  * lives in its own cluster, so an IVF index whose cells track the
  * clusters and whose nprobe=4 probe list covers any k-means split
  * of a true cluster recovers nearly all of them.
  */
class RecallBoundSpec extends SparkTestBase {

  private val nClusters = 12
  private val perCluster = 60
  private val dim = 16
  private val k = 5

  /** Deterministic clustered corpus: (id, label, emb float[16]). */
  private lazy val clustered = {
    val rnd = new java.util.Random(42)
    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(nClusters)(
      normalize(Array.fill(dim)(rnd.nextGaussian())))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val emb = normalize(
        centers(c).map(x => x + 0.05 * rnd.nextGaussian()))
      (c.toLong * perCluster + i, c, emb)
    }
    import spark.implicits._
    rows.toDF("id", "label", "emb").repartition(4)
  }

  /** recall@k of `approx` against exact brute force, averaged over
    * all query vectors (both frames carry vec_id/neighbor_id). */
  private def recallAtK(approx: org.apache.spark.sql.DataFrame,
                        exact: org.apache.spark.sql.DataFrame): Double = {
    val hits = exact.select("vec_id", "neighbor_id")
      .join(approx.select("vec_id", "neighbor_id"),
            Seq("vec_id", "neighbor_id"), "left_semi")
      .count().toDouble
    hits / exact.count().toDouble
  }

  test("annIvf recall@5 >= 0.9 on clustered embeddings at nprobe=4") {
    val exact = Ops.knnBruteForce(clustered, "id", "emb", k)
      .persist()
    assert(exact.count() == nClusters.toLong * perCluster * k)
    val codebook = Ops.kmeansCodebook(clustered, "id", "emb",
      k = nClusters, iters = 3)
    val ivf = Ops.annIvf(clustered, "id", "emb", codebook, k, nprobe = 4)
    val r = recallAtK(ivf, exact)
    assert(r >= 0.9, f"recall@5 on clustered fixture = $r%.3f, floor 0.9 " +
      "— codebook training or probe ranking regressed")
    exact.unpersist()
    ()
  }

  test("annIvf recall is monotone in nprobe and reaches ~exact at all cells") {
    // The recall/cost knob must actually buy recall: probing more
    // cells can only add candidates (the probe list is a top-nprobe
    // prefix of one ranked cell list), so recall@5 must be
    // non-decreasing in nprobe, and probing EVERY cell makes the
    // candidate set the whole corpus — brute-force recall up to 6dp
    // rounding ties at the k boundary (annIvf rounds cosine to 6dp;
    // knnBruteForce ranks at full precision).
    val exact = Ops.knnBruteForce(clustered, "id", "emb", k).persist()
    val codebook = Ops.kmeansCodebook(clustered, "id", "emb",
      k = nClusters, iters = 3).persist()
    val r = Seq(1, 4, nClusters).map { np =>
      np -> recallAtK(
        Ops.annIvf(clustered, "id", "emb", codebook, k, nprobe = np), exact)
    }.toMap
    assert(r(1) <= r(4) && r(4) <= r(nClusters),
      s"recall not monotone in nprobe: $r")
    assert(r(nClusters) >= 0.99,
      f"all-cells probe recall ${r(nClusters)}%.3f < 0.99 — the " +
        "probe-join is dropping candidates it was handed")
    exact.unpersist(); codebook.unpersist()
    ()
  }

  test("knnProbe over an INGESTED clustered corpus: recall@5 >= 0.9 at the nprobe=4 operating point") {
    // The ingest→serve loop's production operating point (VERDICT r14
    // #4): the read path was pinned exact only at all-cells; here the
    // clustered fixture flows through the REAL streaming ingest
    // (Ingest.ingestEmbBatch, 3 batches, frozen batch-0 codebook at
    // k=12) and Ingest.knnProbe answers at nprobe=4 — a codebook or
    // probe regression in the INGEST path (not just Ops.annIvf)
    // now drops a named floor. dupCos=1.0 keeps dedup out of the
    // frame (6dp cosine can never sit strictly above 1.0): the gate
    // under test is recall, and the corpus must stay complete for
    // brute force to be the reference.
    val root = java.nio.file.Files
      .createTempDirectory("graft_recall_ingest").toString
    val vecs = clustered
      .select(col("id").as("vec_id"), col("emb").as("embedding"))
    for (b <- 0L to 2L)
      graft.engine.Ingest.ingestEmbBatch(
        vecs.filter(col("vec_id") % 3 === b), root, "t", b,
        dupCos = 1.0, k = nClusters)
    assert(graft.engine.LakeTable
        .read(spark, graft.engine.Ingest.vecsRoot(root)).count() ==
      nClusters.toLong * perCluster,
      "dupCos=1.0 ingest lost vectors — corpus incomplete, recall floor void")
    val exact = Ops.knnBruteForce(clustered, "id", "emb", k).persist()
    // knnProbe serves the query's own stored vector back at cos 1.0
    // (correct for a served index); ask for k+1 and drop the self
    // match so recall compares k true neighbors against brute force
    // (which excludes self by construction).
    val approx = graft.engine.Ingest.knnProbe(spark, root,
        clustered.select(col("id").as("qid"), col("emb").as("embedding")),
        k = k + 1, nprobe = 4)
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid").as("vec_id"), col("neighbor_id"))
    val r = recallAtK(approx, exact)
    assert(r >= 0.9,
      f"ingested-corpus knnProbe recall@5 = $r%.3f at nprobe=4, floor " +
        "0.9 — the ingest-path codebook or probe ranking regressed")
    exact.unpersist()
    ()
  }

  test("codebook refresh repairs recall on a DRIFTED ingest (floor 0.9 across the refresh)") {
    // VERDICT r15 #1: the frozen batch-0 codebook is the ANN story's
    // last known limitation — under distribution drift recall rots
    // and nothing repaired it. Drift schedule: batch 0 carries ONLY
    // clusters 0..3, so the k=12 batch-0 codebook carves those four
    // clusters into micro-cells; batches 1/2 bring the eight UNSEEN
    // clusters, whose members (near-orthogonal to every frozen
    // centroid) scatter across cells on noise argmax — the
    // recall-rotting SCATTER drift the fit trigger exists for.
    // The drift phase needs intra-cluster noise COMPARABLE to the
    // centroid separation: at noise 0.05 a whole unseen cluster
    // argmaxes into one frozen cell (pile-up — in-cell exact scoring
    // keeps recall) and the floor asserts nothing. At noise 0.3 each
    // member's frozen-centroid ranking is noise-dominated, the
    // cluster SPLITS across cells, and nprobe=4 can no longer cover
    // a true neighborhood — the recall-rotting regime. Same-cluster
    // cosine stays ~0.85 vs cross ~0, so brute-force truth and the
    // post-refresh k-means structure both survive.
    val drifted = {
      val rnd = new java.util.Random(1042)
      def normalize(v: Array[Double]): Array[Float] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => (x / n).toFloat)
      }
      val centers = Array.fill(nClusters)(
        normalize(Array.fill(dim)(rnd.nextGaussian())))
      val rows = for {
        c <- 0 until nClusters
        i <- 0 until perCluster
      } yield {
        val noise = if (c < 4) 0.05 else 0.3
        val emb = normalize(
          centers(c).map(x => x + noise * rnd.nextGaussian()))
        (c.toLong * perCluster + i, c, emb)
      }
      import spark.implicits._
      rows.toDF("id", "label", "emb").repartition(4)
    }
    def driftIngest(maint: Option[graft.engine.Ingest.IngestMaintenance])
        : String = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_recall_drift").toString
      val vecs = drifted
        .select(col("id").as("vec_id"), col("emb").as("embedding"),
                col("label"))
      for (b <- 0L to 2L) {
        val lo = if (b == 0) 0 else (b * 4).toInt
        graft.engine.Ingest.ingestEmbBatch(
          vecs.filter(col("label") >= lo && col("label") < lo + 4)
            .select("vec_id", "embedding"),
          root, "t", b, dupCos = 1.0, k = nClusters,
          maintenance = maint)
      }
      root
    }
    def probeRecall(root: String, exact: org.apache.spark.sql.DataFrame)
        : Double = recallAtK(
      graft.engine.Ingest.knnProbe(spark, root,
          drifted.select(col("id").as("qid"),
                         col("emb").as("embedding")),
          k = k + 1, nprobe = 4)
        .filter(col("neighbor_id") =!= col("qid"))
        .select(col("qid").as("vec_id"), col("neighbor_id")), exact)
    val exact = Ops.knnBruteForce(drifted, "id", "emb", k).persist()
    // Control: the same drift schedule with NO refresh — the trigger
    // must see the drift, and the frozen codebook's recall must
    // actually be broken (else the floor below asserts nothing).
    val frozen = driftIngest(None)
    assert(graft.engine.Ingest.codebookDrifted(spark, frozen,
        skew = 4.0, minFit = 0.7),
      "drift trigger blind to the scattered fixture")
    val rFrozen = probeRecall(frozen, exact)
    assert(rFrozen < 0.9,
      f"frozen-codebook recall $rFrozen%.3f not degraded — drift " +
        "fixture lost its teeth, refresh floor is vacuous")
    // Refresh path: maintenance armed with the fit trigger, due after
    // batch 2 — the REAL production wiring end to end.
    val refreshed = driftIngest(Some(graft.engine.Ingest.IngestMaintenance(
      everyBatches = 3, refreshCodebook = true, refreshSkew = 4.0,
      refreshMinFit = 0.7, clusterBuckets = 4)))
    val cbv = graft.engine.LakeTable.latestVersion(spark,
      graft.engine.Ingest.codebookRoot(refreshed))
    assert(cbv.exists(_ >= 1), s"refresh never committed a codebook: $cbv")
    // cb_ver pairing: the re-clustered corpus references the refreshed
    // codebook version.
    val paired = graft.engine.LakeTable.read(spark,
        graft.engine.Ingest.vecsRoot(refreshed))
      .agg(min("cb_ver"), max("cb_ver")).collect()(0)
    assert(paired.getLong(0) == paired.getLong(1) &&
           cbv.contains(paired.getLong(1)),
      s"cb_ver pairing broken: $paired vs codebook $cbv")
    assert(graft.engine.LakeTable.read(spark,
        graft.engine.Ingest.vecsRoot(refreshed)).count() ==
      nClusters.toLong * perCluster,
      "refresh lost corpus vectors")
    val rRefreshed = probeRecall(refreshed, exact)
    assert(rRefreshed >= 0.9,
      f"post-refresh recall@5 = $rRefreshed%.3f at nprobe=4, floor 0.9 " +
        f"(frozen was $rFrozen%.3f) — retrain or re-cluster regressed")
    // And the trigger disarms once the codebook fits again.
    assert(!graft.engine.Ingest.codebookDrifted(spark, refreshed,
        skew = 4.0, minFit = 0.7),
      "drift trigger still firing after a successful refresh")
    exact.unpersist()
    ()
  }

  test("clustered recall beats the random-vector worst case by a wide margin") {
    // The same pipeline on structureless vectors is the documented
    // worst case (~0.6 at nprobe=4 in emb_ivf_recall). Assert the
    // fixture actually has exploitable structure: exact top-5 is
    // same-cluster for essentially every vector. This is the
    // precondition that makes the 0.9 floor above meaningful.
    val exact = Ops.knnBruteForce(clustered, "id", "emb", k)
    val labeled = exact
      .join(clustered.select(col("id").as("vec_id"),
                             col("label").as("qlab")), "vec_id")
      .join(clustered.select(col("id").as("neighbor_id"),
                             col("label").as("nlab")), "neighbor_id")
    val sameFrac = labeled.agg(
      avg(when(col("qlab") === col("nlab"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(sameFrac >= 0.99,
      f"fixture lost its cluster structure: same-cluster frac = $sameFrac%.3f")
  }
}
