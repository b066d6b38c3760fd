package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming training-data ingest: documents arrive in microbatches,
  * each batch near-dup-checks against the ACCEPTED corpus so far and
  * lands exactly-once in a lake.
  *
  * This is the 100 TB ingestion posture the batch `docs_dedup_*` keys
  * point at, assembled end-to-end:
  *
  *  - The dedup state is NOT in the streaming state store — it is the
  *    persisted LSH band index of the accepted corpus (a lake table,
  *    O(corpus) tiny rows), probed per batch via
  *    [[Ops.minhashNearDupIncremental]]. Batch cost is O(batch) hash
  *    work + an index probe; the corpus is never re-shingled (only
  *    matched candidates pay the verify pass — the semi-join
  *    contract).
  *  - Three lake tables under one root, all committed with the SAME
  *    (appId, batchId) idempotence token ([[LakeTable.appendTxn]]):
  *    `docs` (accepted documents), `bands` (their LSH band index
  *    rows), `rejects` (the audit log: every ≥-threshold pair that
  *    doomed a document — production dedup without a why-was-this
  *    -dropped record is undebuggable).
  *  - Crash consistency by RECOMPUTATION DETERMINISM, not cross-table
  *    atomicity: the three commits are not atomic as a group, but a
  *    re-delivered batch recomputes the exact same accept/reject
  *    verdicts under EVERY partial-commit state, because both base
  *    frames exclude the batch's own doc_ids (anti-join) — a batch
  *    whose docs/bands landed before the crash cannot self-match on
  *    re-delivery. Whichever tables already committed no-op
  *    (appendTxn replays as None); the missing ones commit the
  *    identical content. Single writer per root (one appId), as with
  *    any Structured-Streaming sink.
  *
  * Survivor rule (deterministic): a document is REJECTED iff it has a
  * verified match at `threshold`+ against (a) any accepted corpus
  * document, or (b) any EARLIER-doc_id document in its own batch
  * (docs_dedup_resolve's earlier-wins rule; the earlier partner's own
  * fate does not re-admit the later doc — the standard greedy chain
  * treatment, transitive chains collapse to their earliest member).
  */
object Ingest {

  def docsRoot(root: String): String = s"$root/docs"
  def bandsRoot(root: String): String = s"$root/bands"
  def rejectsRoot(root: String): String = s"$root/rejects"

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("bh", LongType)))

  private def emptyFrame(spark: org.apache.spark.sql.SparkSession,
                         schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Lake read that tolerates a missing table AND a table whose every
    * commit was empty (a rejects table after clean batches has
    * versions but no data directories — LakeTable.read refuses those
    * by design). */
  private[graft] def readOrEmpty(spark: org.apache.spark.sql.SparkSession,
                                 root: String, schema: StructType): DataFrame =
    if (LakeTable.latestVersion(spark, root).isDefined &&
        LakeTable.activeDirs(spark, root).nonEmpty)
      LakeTable.read(spark, root)
    else emptyFrame(spark, schema)

  /** Processes one microbatch: dedup against the accepted corpus +
    * earlier in-batch docs, then commit (docs, bands, rejects) with
    * the (appId, batchId) token. Safe to call again with the same
    * batchId after any partial failure — see the determinism note
    * above. */
  def ingestBatch(batch: DataFrame, root: String, appId: String,
                  batchId: Long, threshold: Double = 0.8,
                  shingleSize: Int = 5, numHashes: Int = 32,
                  rowsPerBand: Int = 2, maxBucket: Int = 256): Unit = {
    val spark = batch.sparkSession
    // Land the batch to a staging parquet and reprocess FROM FILES.
    // Two reasons, both load-bearing: (1) a foreachBatch frame is
    // stream-internal (no inputFiles) — the candidate artifact cache
    // inside minhashNearDupIncremental keys on plan × input-file
    // fingerprints, and an in-memory batch would either be refused
    // (first batch: loud artifactHash require) or, worse, hash
    // identically across DIFFERENT batches once the lake inputs make
    // inputFiles non-empty — a silent cross-batch cache collision;
    // (2) the batch plan executes exactly once (the stage write) —
    // the dedup, both index probes, and all three commits re-read
    // the staged files instead of re-running the stream source. A
    // re-delivery re-stages (overwrite), changing the staging mtime
    // and thus the artifact key: recompute, deterministically, never
    // a stale-cache read. The staging dir is dropped after the
    // commits; a crash before that leaves it for the re-delivery's
    // overwrite (the CdcStream staging pattern).
    val stagingDir = s"$root/staging/batch-$batchId"
    batch.write.mode("overwrite").parquet(stagingDir)
    val delta = spark.read.parquet(stagingDir)
    val batchIds = delta.select("doc_id")
    // Exclude the batch's own ids from BOTH base frames: after a
    // partial commit + re-delivery, the lake may already hold this
    // batch's docs and/or bands, and probing them would self-match
    // every document into the reject pile. With the exclusion, the
    // recompute is identical no matter which commits landed.
    val baseDocs = readOrEmpty(spark, docsRoot(root), delta.schema)
      .join(batchIds, Seq("doc_id"), "left_anti")
    val baseBands = readOrEmpty(spark, bandsRoot(root), bandSchema)
      .join(batchIds, Seq("doc_id"), "left_anti")
    val pairs = Ops.minhashNearDupIncremental(
        baseBands, baseDocs.select("doc_id", "text"),
        delta.select("doc_id", "text"), "doc_id", "text",
        shingleSize, numHashes, rowsPerBand, threshold, maxBucket)
      .select(col("doc_id"), col("match_id"), col("match_src"),
              col("jaccard"))
    val rejects = pairs.localCheckpoint()       // 3 consumers, tiny
    val accepted = delta
      .join(rejects.select("doc_id"), Seq("doc_id"), "left_anti")
    val acceptedBands = Ops.lshBandIndex(
        Ops.shingles(accepted, "doc_id", "text", shingleSize),
        "doc_id", numHashes, rowsPerBand, maxBucket)
      .select("doc_id", "band", "bh")
    LakeTable.appendTxn(accepted, docsRoot(root), appId, batchId)
    LakeTable.appendTxn(acceptedBands, bandsRoot(root), appId, batchId)
    LakeTable.appendTxn(rejects, rejectsRoot(root), appId, batchId)
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)                          // best-effort cleanup
    ()
  }
}
