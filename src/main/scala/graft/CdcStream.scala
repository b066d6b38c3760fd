package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.engine.LakeTable

/** Lake change feed → Structured Streaming → incrementally maintained
  * view (r11 verdict #7): the end-to-end CDC consumption path a
  * lakehouse user expects, built from three public pieces —
  *
  *  1. a LOG-AWARE, IDEMPOTENT stager that materializes each committed
  *     feed version's added rows as immutable files named by version
  *     (exactly `LakeTable.readSince`'s mechanism, one commit at a
  *     time: only committed adds are staged, so uncommitted orphan
  *     directories from crashed writers never leak into the stream);
  *  2. a STOCK FileStreamSource over the staging area with
  *     `Trigger.AvailableNow` — its checkpoint is the consumer's
  *     high-water mark, so a second drain processes exactly the files
  *     staged after the first (= the post-checkpoint commits);
  *  3. a foreachBatch IVM sink folding signed deltas into a per-group
  *     (count, sum) view persisted in a lake table whose commits carry
  *     (appId, batchId) tokens (`LakeTable.rewriteTxn`) — a
  *     re-delivered microbatch after a failure is a no-op, giving
  *     end-to-end exactly-once on top of the source's replay.
  *
  * The feed rows are the engine's CDC shape
  * (key, status, price, change_type ∈ insert / delete /
  * update_preimage / update_postimage); the maintained view equals
  * the batch `ivmSumRefresh` result on (status, n, sum, avg) —
  * StreamingSpec pins both that equality and the second-drain
  * increment. At 100 TB the stager is a metadata walk plus one
  * column-pruned scan per NEW commit; the view rewrite is O(groups).
  */
object CdcStream {

  /** Stages every committed version of the append-only feed table not
    * yet present in `stagingDir`. Each version lands as a DIRECTORY
    * `v<version>/` holding that commit's added rows, written first to
    * a dot-prefixed scratch dir and then moved into place with ONE
    * atomic rename — a version is either fully visible or not at all.
    * "Done" derives from the presence of the final directory, never
    * from individual part files, so a crash mid-write leaves only a
    * dot-prefixed scratch dir (invisible to the stream source and to
    * the done-set) that the re-run wipes and restages from scratch.
    * The previous spelling renamed part files one by one and treated
    * ANY `v<version>-*` part as "version done" — a crash between
    * renames stranded the version half-staged forever, silently
    * dropping committed rows from the stream (r12 advice, medium).
    * Returns the versions staged by THIS call. */
  def stage(spark: SparkSession, feedRoot: String,
            stagingDir: String): Seq[Long] = {
    val staging = new java.io.File(stagingDir)
    staging.mkdirs()
    val done: Set[Long] = staging.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .toSet
    val todo = LakeTable.versions(spark, feedRoot)
      .filterNot(done)
      .filter(v => LakeTable.addedDirs(spark, feedRoot, v).nonEmpty)
    todo.foreach { v =>
      val dirs = LakeTable.addedDirs(spark, feedRoot, v)
      val scratch = new java.io.File(staging, f".stage-v$v%010d")
      if (scratch.exists()) {  // crashed prior attempt: never visible, wipe
        scratch.listFiles().foreach(_.delete())
        scratch.delete()
      }
      spark.read.parquet(dirs.map(d => s"$feedRoot/$d"): _*)
        .write.mode("overwrite").parquet(scratch.toString)
      val target = new java.io.File(staging, f"v$v%010d")
      require(scratch.renameTo(target),
        s"cdc: atomic publish $scratch -> $target failed")
    }
    todo
  }

  /** Retention for the staging area (the 100 TB posture: staged
    * version dirs otherwise accumulate a full copy of the feed).
    * Deletes the DATA FILES of every staged version ≤ `throughVersion`
    * but keeps the empty version directory as the idempotence marker,
    * so a later [[stage]] call still sees the version as done and
    * never re-stages (and thus never re-feeds) pruned rows.
    *
    * Contract: prune only versions the consumer's checkpoint has
    * fully committed (the value returned by the drain that processed
    * them). The FileStreamSource never re-reads files its checkpoint
    * already recorded, so pruning behind the checkpoint is invisible
    * to the stream; pruning AHEAD of it would lose rows — hence the
    * explicit bound, never a blanket sweep. Returns the versions
    * pruned by this call. */
  def pruneStaging(stagingDir: String, throughVersion: Long): Seq[Long] = {
    val staging = new java.io.File(stagingDir)
    if (!staging.exists()) return Seq.empty
    staging.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .filter(_.getName.drop(1).toLong <= throughVersion)
      .filter(_.listFiles().nonEmpty)
      .flatMap { dir =>
        // Report a version as pruned ONLY when every file actually
        // deleted — a dir with a failed delete() still has files, so
        // the next call retries it, and this call must not claim it.
        val allGone = dir.listFiles().map(_.delete()).forall(identity)
        if (allGone) Some(dir.getName.drop(1).toLong) else None
      }.sorted
  }

  private val ViewApp = "cdc_ivm"

  /** One AvailableNow drain: stage new commits, stream them through
    * the checkpointed source, fold each microbatch's signed deltas
    * into the view table. Returns (view read-out, input rows this
    * drain processed). */
  def drainIvm(spark: SparkSession, feedRoot: String,
               workDir: String, viewRoot: String): (DataFrame, Long) = {
    stage(spark, feedRoot, s"$workDir/staging")
    val schema = LakeTable.read(spark, feedRoot).schema
    // glob over the per-version directories stage() publishes
    // atomically; the dot-prefixed scratch dirs never match
    val stream = spark.readStream.schema(schema)
      .parquet(s"$workDir/staging/v*")
    // Row count accumulates INSIDE foreachBatch (driver-side counter;
    // the batch is cached so the count and the view fold share one
    // scan): q.recentProgress is truncated to
    // spark.sql.streaming.numRecentProgressUpdates (default 100)
    // entries, so a drain spanning more microbatches undercounted
    // (r12 advice, low).
    val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        b.persist()
        try {
          rowsSeen.addAndGet(b.count())
          updateView(b, viewRoot, batchId)
        } finally b.unpersist()
        ()
      }
      .option("checkpointLocation", s"$workDir/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (readView(spark, viewRoot), rowsSeen.get())
  }

  /** Signed-delta fold of one CDC microbatch into the (status → n,
    * sum) view: +1/+price for insert and update_postimage, −1/−price
    * for delete and update_preimage (the ivmSumRefresh delta model);
    * the merged view commits with this batch's idempotence token. */
  private def updateView(batch: DataFrame, viewRoot: String,
                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    val zero = lit(0).cast(DecimalType(18, 2))
    val delta = batch.select(col("status"),
        when(col("change_type").isin("insert", "update_postimage"),
             lit(1L)).otherwise(lit(-1L)).as("w"),
        when(col("change_type").isin("insert", "update_postimage"),
             col("price")).otherwise(-col("price")).as("dp"))
      .groupBy("status")
      .agg(sum("w").as("dn"), sum("dp").cast(DecimalType(18, 2)).as("dsum"))
    val merged =
      if (LakeTable.latestVersion(spark, viewRoot).isEmpty)
        delta.select(col("status"), col("dn").as("n"),
                     col("dsum").as("sum_dec"))
      else
        // NULL-SAFE group-key merge (the QueriesR16 r13 rule): a
        // plain USING join would fork a null-status group into two
        // rows, one per side, corrupting the maintained counts
        LakeTable.read(spark, viewRoot)
          .select(col("status").as("sv"), col("n"), col("sum_dec"))
          .join(delta.select(col("status").as("sd"), col("dn"),
                             col("dsum")),
                col("sv") <=> col("sd"), "full_outer")
          .select(coalesce(col("sv"), col("sd")).as("status"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n"),
            (coalesce(col("sum_dec"), zero) + coalesce(col("dsum"), zero))
              .cast(DecimalType(18, 2)).as("sum_dec"))
    LakeTable.rewriteTxn(merged.filter(col("n") > 0).coalesce(1),
      viewRoot, ViewApp, batchId)
  }

  /** The maintained view's read-out, shaped like ivmSumRefresh minus
    * the MIN column (MIN is not feed-maintainable; see
    * QueriesR16.ivmMinMaintain for the deletion-aware path). */
  def readView(spark: SparkSession, viewRoot: String): DataFrame =
    LakeTable.read(spark, viewRoot)
      .select(col("status"), col("n"),
        col("sum_dec").cast("double").as("sum_price"),
        round(col("sum_dec").cast("double") / col("n"), 6)
          .as("avg_price"))
      .orderBy("status")
}
