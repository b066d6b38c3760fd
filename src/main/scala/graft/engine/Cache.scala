package graft.engine

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed artifact materialization — the Spark re-expression
  * of the reference's ONE real computed semantic (pipetree's
  * specific/dependency/parameter hash caching; SURVEY.md §2.1-P6,
  * §4.1): a stage rerun is skipped iff the hash of (computation ×
  * inputs) is unchanged.
  *
  * Hash composition:
  *  - "specific hash"   → the canonicalized logical plan (normalizes
  *    alias ids/ordering, so equivalent plans share a hash);
  *  - "dependency hash" → the leaf input files' (path, length,
  *    modification time) fingerprint, via the Hadoop FS API — works
  *    unchanged against any Hadoop-compatible store (local now,
  *    s3a/hdfs by config, matching pipetree's Local/S3 backends).
  *
  * At 100 TB: artifacts are parquet directories keyed by hash; the
  * existence probe is one FS metadata call, and re-listing leaf files
  * costs one listing per input table — never a data read.
  */
object ArtifactCache {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Stable content hash of a DataFrame's computation + inputs.
    *
    * DELIBERATELY NOT `Dataset.semanticHash`: that hashes the
    * canonicalized tree's `hashCode`, which folds in
    * `Class.hashCode()` of non-case-class nodes (e.g.
    * `ParquetFileFormat` inside `HadoopFsRelation`) — a value that
    * changes every JVM launch. Measured in round 3: one unchanged
    * embeddings input produced SEVEN distinct artifact hashes across
    * one driver session's JVMs, so artifacts were recomputed by every
    * phase instead of reused. The canonicalized plan STRING is
    * JVM-stable (verified: identical across processes while
    * semanticHash differed), so the hash is built from it plus the
    * full schema JSON. Spark truncates long field lists in plan
    * strings (`spark.sql.debug.maxToStringFields`, default 25), which
    * could collide wide plans differing only in truncated regions —
    * the conf is raised around the render so nothing truncates. */
  def artifactHash(df: DataFrame): String = {
    val spark = df.sparkSession
    val key = "spark.sql.debug.maxToStringFields"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "100000")
    // ANALYZED, not `.logical`: for a spark.sql frame the logical plan
    // is the raw parsed tree, and canonicalizing it crashes on any
    // qualified column reference (UnresolvedAttribute.qualifier) — a
    // cached SQL pipeline stage like `SELECT a.x FROM (...) a` hit
    // this. The analyzed plan is fully resolved and its canonicalized
    // string is JVM-stable the same way (exprIds normalized).
    val planPart =
      try df.schema.json + "\n" +
        df.queryExecution.analyzed.canonicalized.toString
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    val conf = spark.sparkContext.hadoopConfiguration
    // A plan with NO file inputs (LocalRelation, range, memory stream)
    // prints only its schema in the canonicalized string — two
    // different in-memory datasets would collide on one hash and the
    // second caller would silently read the first's artifact. Refuse
    // rather than be subtly wrong; such frames have nothing worth
    // caching anyway.
    require(df.inputFiles.nonEmpty,
      "artifactHash requires file-backed inputs (the plan string does " +
        "not capture in-memory data); use materializeKeyed with an " +
        "explicit content hash instead")
    val inputPart = df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.mkString("\n")
    // Semantics-bearing session confs the plan string does NOT capture:
    // year()/date_trunc()/to_timestamp() results depend on the session
    // time zone, and ANSI mode changes cast/overflow behavior. Without
    // these, one run from a non-UTC session would poison a shared
    // artifact (e.g. the year(l_shipdate)-partitioned DPP layout) for
    // every UTC consumer. Folding them in makes a differently-configured
    // session create a DIFFERENT artifact instead of corrupting this one.
    val confPart = Seq("spark.sql.session.timeZone", "spark.sql.ansi.enabled")
      .map(k => s"$k=${spark.conf.getOption(k).getOrElse("")}")
      .mkString("\n")
    md5hex(planPart + "\n--confs--\n" + confPart +
      "\n--inputs--\n" + inputPart)
  }

  /** Returns the cached artifact if one exists for this computation's
    * hash; otherwise computes, writes, and reads back. The read-back
    * (rather than returning `df`) makes downstream consumers scan the
    * materialized parquet — identical behavior on hit and miss.
    * Writes land in a scratch dir and are renamed into place: a
    * concurrent run racing on the same hash either wins the rename or
    * discards its scratch copy — readers never see a half-written
    * artifact directory. */
  def materialize(df: DataFrame, cacheRoot: String, name: String): DataFrame =
    materializeKeyed(df.sparkSession, cacheRoot, name, artifactHash(df))(df)

  // ------------------------------------------------------------------
  // Fast HIT path (round-19 optimization, guide §1/§5: the bench split
  // showed artifact-consumer keys spending 0.6–1.3 s of DRIVER time
  // per call just re-deriving the content hash — every call rebuilt
  // the full producing frame (eager analysis of the wide LSH/minhash
  // plans ≈ 0.4 s), walked `inputFiles` (≈ 0.2 s), and re-rendered the
  // canonical plan string, only to find the same artifact dir as last
  // time. The §P6 doc always CLAIMED "re-listing leaf files costs one
  // listing per input table — never a data read"; this memo makes the
  // code match the claim.)
  //
  // The memo stores METADATA ONLY — (observed input-listing
  // fingerprint, semantics-bearing conf fingerprint, resolved artifact
  // dir) — never rows. Every call re-verifies freshness from the
  // filesystem: it re-lists the producing frame's input directories
  // (plus their parents, so an added/removed partition subdirectory is
  // seen via the parent listing and its mtime) and compares against
  // the recorded fingerprint. ANY difference — file added, removed,
  // resized, touched, directory restructured — or a changed
  // semantics-bearing conf, or a vanished _SUCCESS marker, falls back
  // to the full derivation (rebuild frame → canonical-plan hash →
  // stat), exactly as before. A false MISS only costs speed; a false
  // HIT would need an input mutation invisible to both the direct
  // parent listing (len+mtime of every child) and the grandparent
  // listing+mtime — not a thing on the local/posix and
  // Hadoop-compatible stores this engine targets.
  // ------------------------------------------------------------------
  private case class HitMemo(inputDirs: Seq[String], listingFp: String,
                             confFp: String, dir: String)
  private val hitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, HitMemo]()

  private[engine] def confFp(spark: SparkSession): String =
    Seq("spark.sql.session.timeZone", "spark.sql.ansi.enabled")
      .map(k => s"$k=${spark.conf.getOption(k).getOrElse("")}")
      .mkString("\n")

  /** Session confs that change what a parquet FOOTER infers as — the
    * key every schema memo must carry (r19 ADVICE: Tables keyed only
    * on nanosAsLong; LakeTable on nothing). One shared list so the
    * memos cannot drift apart. */
  private[engine] def parquetInferConfFp(spark: SparkSession): String =
    Seq("spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.binaryAsString",
        "spark.sql.parquet.int96AsTimestamp",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.caseSensitive")
      .map(k => s"$k=${spark.conf.getOption(k).getOrElse("")}")
      .mkString("\n")

  /** Directories whose listings fingerprint the inputs: every leaf
    * file's parent and grandparent, PLUS every ancestor up to the
    * common root of the leaf set (r19 ADVICE: parent+grandparent
    * alone misses a partition branch added ≥3 levels above a leaf —
    * e.g. a new `y=2021/` under a `y=/m=/d=` table whose leaves sit
    * three deep; the table root's own listing is what sees it). The
    * walk stops at the COMMON ancestor, never the filesystem root, so
    * unrelated trees (artifact cache vs. data dir) don't drag `/`
    * into the watch set; inputs that share no meaningful root (< 2
    * path components in common) contribute only their parent +
    * grandparent, exactly the old behavior. */
  private[engine] def watchDirs(files: Seq[String]): Seq[String] = {
    val parents = files.map(f => new Path(f).getParent).filter(_ != null)
    val base = parents ++ parents.map(_.getParent).filter(_ != null)
    val comps = parents.distinct.map(_.toString.split('/').toSeq)
    val ancestors =
      if (comps.size < 2) Nil
      else {
        val common = comps.reduce((a, b) =>
          a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1))
        // "file:", "" and the first real component: require ≥ 2 real
        // components (e.g. /root/testdata) before walking anything
        val minDepth = common.size
        if (common.count(_.nonEmpty) < 2) Nil
        else parents.flatMap { p =>
          val buf = scala.collection.mutable.ListBuffer[Path]()
          var cur = p.getParent
          while (cur != null &&
                 cur.toString.split('/').length >= minDepth) {
            buf += cur
            cur = cur.getParent
          }
          buf
        }
      }
    (base ++ ancestors).map(_.toString).distinct.sorted
  }

  /** One FS listing per watched directory: every child's (name,
    * length, mtime, isDir). Missing dir renders as "absent" —
    * compares unequal to any live listing, forcing the full path.
    *
    * Two deliberate exclusions, both LRU-clock artifacts of this very
    * cache (an artifact dir is often the INPUT of another artifact —
    * phash pairs read the phash table; incremental-dedup candidates
    * read the band index — and a fingerprint that sees the upstream
    * read's own bookkeeping would self-invalidate every call):
    *  - `_SUCCESS` fingerprints by PRESENCE only: it is a zero-length
    *    commit marker whose mtime [[materializeKeyed]] repurposes as
    *    the LRU touch; its existence matters (half-written artifact
    *    detection), its mtime is cache metadata, and the data content
    *    it guards is covered by the sibling part-files' entries.
    *  - the directory's own mtime is folded in only via the child
    *    list: posix updates it on entry create/delete, which the
    *    sorted child list already captures, while `setTimes` on a
    *    child does not touch it. */
  private[engine] def listingFp(spark: SparkSession, dirs: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.map { ds =>
      val p = new Path(ds)
      val fs = p.getFileSystem(conf)
      try {
        val kids = fs.listStatus(p).map { st =>
          val n = st.getPath.getName
          if (n == "_SUCCESS" || n == "._SUCCESS.crc") s"$n:present"
          else s"$n:${st.getLen}:${st.getModificationTime}:${st.isDirectory}"
        }.sorted.mkString(",")
        s"$ds[$kids]"
      } catch { case _: Exception => s"$ds@absent" }
    }.mkString("\n")
  }

  /** [[materialize]] with the producing frame passed BY NAME and an
    * in-JVM memoized hit path: after one full derivation for a given
    * (cacheRoot, name, inputsKey), later calls skip rebuilding the
    * producing frame entirely when the re-listed input fingerprint and
    * confs are unchanged and the artifact's _SUCCESS still exists.
    *
    * `inputsKey` must uniquely determine the producing pipeline GIVEN
    * the artifact name within this JVM (callers pass the data
    * directory); two call sites sharing (name, inputsKey) but building
    * different plans would already be a name-collision hazard in the
    * slow path's artifact naming discipline. */
  def materializeLazy(spark: SparkSession, cacheRoot: String, name: String,
                      inputsKey: String)(produce: => DataFrame): DataFrame =
    materializeLazyCore(spark, cacheRoot, name, inputsKey,
                        artifactHash, produce)

  /** [[materializeLazy]] for producing frames whose PLAN hash is not
    * stable or not sufficient — typed mapPartitions pipelines embed
    * JVM-specific lambda identities (the [[materializeKeyed]] caveat),
    * so callers supply the hash themselves (input-frame hash + a
    * driver-side LOGIC TAG probing the closure's code path, the
    * doc_phashes posture). `hash` is only evaluated on a memo miss. */
  def materializeLazyKeyed(spark: SparkSession, cacheRoot: String,
                           name: String, inputsKey: String,
                           partitionBy: Seq[String] = Nil,
                           writerOptions: Map[String, String] = Map.empty)(
                           hash: => String)(
                           produce: => DataFrame): DataFrame =
    materializeLazyCore(spark, cacheRoot, name, inputsKey,
                        _ => hash, produce, partitionBy, writerOptions)

  /** First stack frame outside this file — folds the CALL SITE into
    * the memo key, so two call sites that (wrongly or deliberately)
    * share (name, inputsKey) but build different plans can never
    * serve each other's memoized artifact dir: each site derives
    * fully once — where the content hash keeps them distinct — and
    * hits only its own entry thereafter (r19 ADVICE on the
    * hit path's missing hash check). ~µs per call, in-JVM only. */
  private[engine] def callerTag(): String = {
    val tr = new Throwable().getStackTrace
    tr.find(e => e.getFileName != null && e.getFileName != "Cache.scala" &&
                 e.getFileName != "LakeTable.scala")
      .map(e => s"${e.getFileName}:${e.getLineNumber}")
      .getOrElse("unknown")
  }

  /** The hit memos assume a bounded set of (root, name, inputs) per
    * JVM; a long-lived driver cycling through unbounded roots (every
    * asOf dir set, say) would otherwise accumulate entries forever
    * (r19 ADVICE). The cap is far above any real session's working
    * set, so eviction is a full reset — entries are metadata-only and
    * rebuild on the next call. */
  private[engine] val MemoCap = 8192
  private[engine] def capMemo(m: java.util.concurrent.ConcurrentHashMap[_, _])
      : Unit =
    if (m.size > MemoCap) m.clear()

  private def materializeLazyCore(spark: SparkSession, cacheRoot: String,
                                  name: String, inputsKey: String,
                                  hashOf: DataFrame => String,
                                  produce: => DataFrame,
                                  partitionBy: Seq[String] = Nil,
                                  writerOptions: Map[String, String] =
                                    Map.empty): DataFrame = {
    val key = s"$cacheRoot|$name|$inputsKey|${callerTag()}"
    val cf = confFp(spark)
    val m = hitMemo.get(key)
    if (m != null && m.confFp == cf &&
        listingFp(spark, m.inputDirs) == m.listingFp) {
      val dir = new Path(m.dir)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val success = new Path(dir, "_SUCCESS")
      if (fs.exists(success)) {
        if (isLocalFs(dir))
          try fs.setTimes(success, System.currentTimeMillis(), -1)
          catch { case _: Exception => () }
        return spark.read.parquet(m.dir)
      }
    }
    val df = produce
    val hash = hashOf(df)
    // Fingerprint the inputs BEFORE serving/computing: if a writer
    // lands between this snapshot and a later hit check, the compare
    // fails and the full path re-runs — stale-open races only ever
    // cause recomputation, never a stale serve.
    val dirs = watchDirs(df.inputFiles.toSeq)
    val fp = listingFp(spark, dirs)
    val out = materializeKeyed(spark, cacheRoot, name, hash,
                               partitionBy, writerOptions)(df)
    // A frame with NO file inputs (checkpoint-backed training loops,
    // LocalRelations) has an empty watch set — a memo would then hit
    // forever with no freshness check. Such callers keep the full
    // per-call derivation.
    if (dirs.nonEmpty) {
      capMemo(hitMemo)
      hitMemo.put(key, HitMemo(dirs, fp, cf, s"$cacheRoot/$name-$hash"))
    }
    out
  }

  /** Test seam: drops every memoized hit so a suite can simulate a
    * fresh JVM (the memo is in-process state; producing CODE cannot
    * change under a live memo, so only tests need this). */
  private[graft] def clearHitMemo(): Unit = hitMemo.clear()

  /** Hex digest of raw bytes — the public face of [[md5hex]] for
    * logic-tag probes (a fixture encoder's output on a fixed probe
    * image, folded into a keyed artifact's hash so editing the codec
    * regenerates the artifact instead of serving stale blobs). */
  def bytesTag(bs: Array[Byte]*): String = {
    val md = MessageDigest.getInstance("MD5")
    bs.foreach(md.update)
    md.digest().map("%02x".format(_)).mkString
  }

  /** `materialize` with a caller-supplied content hash, for artifacts
    * whose PRODUCING frame has no stable hash — e.g. an iteratively
    * trained model whose plan is checkpoint-backed (LogicalRDD ids
    * change every run). The caller hashes the artifact's INPUTS +
    * parameters instead; `compute` is only evaluated on a miss.
    * IMPORTANT: the input hash cannot see the producing CODE — callers
    * version the artifact name (…_v1) and bump it whenever the
    * producing algorithm changes, or stale results survive. */
  def materializeKeyed(spark: SparkSession, cacheRoot: String, name: String,
                       hash: String, partitionBy: Seq[String] = Nil,
                       writerOptions: Map[String, String] = Map.empty)(
                       compute: => DataFrame): DataFrame = {
    val dir = new Path(s"$cacheRoot/$name-$hash")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new Path(dir, "_SUCCESS")
    if (fs.exists(success)) {
      // LRU touch: _SUCCESS's mtime records last USE, so the age sweep
      // below only collects artifacts nothing has read in 7 days.
      // Hashes changed by new inputs/code orphan the old dirs forever —
      // without this, the cache root grows monotonically across rounds.
      // Local-FS only, matching the sweep's own guard (see sweepStale).
      if (isLocalFs(dir))
        try fs.setTimes(success, System.currentTimeMillis(), -1)
        catch { case _: Exception => () }
    } else {
      sweepStale(fs, new Path(cacheRoot))
      val scratch = new Path(
        s"$cacheRoot/.inflight-$name-$hash-${System.nanoTime()}")
      // writerOptions reach the parquet writer (e.g. parquet.block.size
      // for a row-group-sized layout artifact). They are NOT part of
      // the hash: callers that vary options must version the name.
      val w = compute.write.mode("overwrite").options(writerOptions)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(scratch.toString)
      // Self-heal: an artifact dir WITHOUT _SUCCESS is a corpse from a
      // killed run — serving its partial part-files would be silently
      // wrong forever. Remove it before installing the fresh copy.
      if (fs.exists(dir) && !fs.exists(success)) fs.delete(dir, true)
      // Install unless a concurrent winner appeared. Checking exists(dir)
      // (not just _SUCCESS) also avoids the local-FS rename fallback that
      // would "succeed" by nesting scratch INSIDE an existing dir. The
      // remaining TOCTOU window can only nest a dot-prefixed dir that
      // parquet readers ignore and the next call's heal branch removes.
      if (fs.exists(dir) || !fs.rename(scratch, dir))
        fs.delete(scratch, true)
    }
    spark.read.parquet(dir.toString)
  }

  private def isLocalFs(p: Path): Boolean = {
    val scheme = p.toUri.getScheme
    scheme == null || scheme == "file"
  }

  /** Best-effort GC, run only on the (already expensive) miss path:
    * `.inflight-*` scratch dirs older than 6 h (crashed computes, lost
    * rename races) and completed artifacts whose _SUCCESS hasn't been
    * touched in 7 days (orphans from superseded input/code hashes —
    * hits refresh the mtime, so anything this old is unreachable by
    * any live hash or genuinely unused).
    *
    * The age sweep is LOCAL-FS ONLY: object stores (s3a) treat
    * `setTimes` as a no-op, so the LRU touch never lands there and the
    * sweep would collect artifacts that are read hourly. Shared-store
    * deployments expire the cache with storage lifecycle rules
    * instead. (A 7-days-unused artifact being lazily scanned by a
    * concurrent local JVM at the moment of deletion is the accepted
    * residual race — the reader retries from a cache miss.) */
  private def sweepStale(fs: org.apache.hadoop.fs.FileSystem,
                         root: Path): Unit =
    try {
      if (fs.exists(root)) {
        val now = System.currentTimeMillis()
        val inflightCutoff = now - 6L * 3600 * 1000
        val artifactCutoff = now - 7L * 24 * 3600 * 1000
        val local = isLocalFs(root)
        fs.listStatus(root).foreach { st =>
          val name = st.getPath.getName
          try {
            if (name.startsWith(".inflight-")) {
              if (st.getModificationTime < inflightCutoff)
                fs.delete(st.getPath, true)
            } else if (local && st.isDirectory) {
              val succ = new Path(st.getPath, "_SUCCESS")
              if (fs.exists(succ) &&
                  fs.getFileStatus(succ).getModificationTime < artifactCutoff)
                fs.delete(st.getPath, true)
            }
          } catch { case _: Exception => () }
        }
      }
    } catch { case _: Exception => () }

  /** True iff `materialize` would skip recomputation. */
  def isCached(df: DataFrame, cacheRoot: String, name: String): Boolean = {
    val hash = artifactHash(df)
    val dir = new Path(s"$cacheRoot/$name-$hash/_SUCCESS")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.exists(dir)
  }
}

/** Engine-internal artifacts routed through [[ArtifactCache]] — P6
  * (content-hash stale-skip) applied to the engine's own hot spots.
  */
object Artifacts {
  /** Default artifact root. Per-hash subdirectories make concurrent
    * runs collide only on identical (plan × inputs), where the atomic
    * rename in `materialize` resolves the race. Overridable via the
    * `graft.cache.root` system property or `GRAFT_CACHE_ROOT` env var
    * (cold benchmarking isolates itself with a fresh root instead of
    * wiping the shared one; a deployment points it at its artifact
    * store). */
  def cacheRoot: String =
    sys.props.get("graft.cache.root")
      .orElse(sys.env.get("GRAFT_CACHE_ROOT"))
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_artifact_cache")

  /** The verified near-dup pair list (id1, id2, jaccard) for the
    * documents table — the shared upstream of docs_dedup_near /
    * _resolve / _cc, which would otherwise each re-run the full
    * shingle→minhash→LSH→verify pipeline. First consumer pays the
    * compute and writes the artifact; later consumers (same inputs,
    * same pipeline) scan ~25 parquet rows. At 100 TB this is exactly
    * the artifact a dedup pass would persist between pipeline stages:
    * the pair list is tiny relative to the corpus, and the content
    * hash re-runs the pipeline iff the corpus or the pipeline
    * changed. */
  def nearDupPairs(s: org.apache.spark.sql.SparkSession,
                   dataDir: String): DataFrame =
    ArtifactCache.materializeLazy(s, cacheRoot, "neardup_pairs", dataDir)(
      Ops.minhashNearDup(Tables.documents(s, dataDir), "doc_id", "text"))

  /** The LSH band index (band, bh, doc_id) of the BASE corpus slice
    * (doc_id ≢ 0 mod 3) — the persisted half of incremental dedup:
    * built once per corpus fingerprint, then every delta batch probes
    * it without re-hashing the base (docs_dedup_incremental). At
    * 100 TB this is the index a daily-ingest dedup keeps warm;
    * O(corpus) rows but 24 bytes each, hash-partitioned on the
    * (band, bh) probe key. */
  def baseBandIndex(s: org.apache.spark.sql.SparkSession,
                    dataDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ArtifactCache.materializeLazy(s, cacheRoot, "neardup_base_bands_v1",
      dataDir)(
      Ops.lshBandIndex(
        Ops.shingles(
          Tables.documents(s, dataDir).filter(!(col("doc_id") % 3 === 0)),
          "doc_id", "text", 5),
        "doc_id"))
  }

  /** The pruned tf-idf posting index (doc_id, term, wt) for the
    * documents table — the materialized INVERTED INDEX. The
    * sparse-similarity key consumes it four ways (norms, capped
    * candidate index, both re-score sides); without the artifact each
    * consumer re-tokenizes the corpus (measured: the tokenize+tf pass
    * dominates the key at 2.2 s of its 2.2–4 s total). At 100 TB this
    * is exactly the index artifact an IR pipeline persists between
    * build and query: corpus-scale but heavily pruned, rebuilt iff
    * the corpus or the derivation changed (content hash). */
  def sparsePostings(s: org.apache.spark.sql.SparkSession,
                     dataDir: String): DataFrame =
    ArtifactCache.materializeLazy(s, cacheRoot, "sparse_postings_v1",
      dataDir)(
      QueriesR11.sparseSimWeights(s, dataDir))

  /** The trained IVF codebook (Ops.kmeansCodebook) for the embeddings
    * table — a model artifact: trained once per (input fingerprint ×
    * hyperparameters), then reused by every index/probe/eval key
    * (emb_ann_ivf, emb_ivf_recall). Keyed via `materializeKeyed` on
    * the INPUT's hash because the trained frame itself is
    * checkpoint-backed (no stable plan hash). This is exactly how a
    * 100 TB deployment treats a codebook: a tiny persisted artifact,
    * retrained only when the corpus or the hyperparameters change. */
  def ivfCodebook(s: org.apache.spark.sql.SparkSession, dataDir: String,
                  k: Int = 16, iters: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, dataDir).select("vec_id", "embedding")
    ArtifactCache.materializeKeyed(
      s, cacheRoot, s"ivf_codebook_v1_k${k}_i$iters",
      ArtifactCache.artifactHash(e))(
      Ops.kmeansCodebook(e, "vec_id", "embedding", k, iters))
  }

  /** The IVF codebook trained on the BASE corpus slice only
    * (vec_id ≢ 0 mod 7) — the incremental-ingest story's frozen
    * model (emb_ann_incremental): delta vectors are assigned to
    * these cells WITHOUT retraining, exactly how a production index
    * absorbs a daily batch (retrains are scheduled, not per-ingest).
    * Same materializeKeyed posture as ivfCodebook. */
  def ivfCodebookBase(s: org.apache.spark.sql.SparkSession,
                      dataDir: String, k: Int = 16,
                      iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(s, dataDir)
      .filter(!(col("vec_id") % 7 === 0))
      .select("vec_id", "embedding")
    ArtifactCache.materializeKeyed(
      s, cacheRoot, s"ivf_codebook_base7_v1_k${k}_i$iters",
      ArtifactCache.artifactHash(e))(
      Ops.kmeansCodebook(e, "vec_id", "embedding", k, iters))
  }

  /** Exact top-5 cosine neighbors for the embeddings table — the
    * ground-truth artifact: `emb_knn_bruteforce` serves it directly and
    * `emb_ivf_recall` reads its top-3 prefix (a bounded top-k under a
    * fixed order rule is prefix-closed, so the k=5 list's first 3 rows
    * ARE the k=3 result). Keyed on the input: the kernel streams
    * driver-broadcast blocks, so its own plan has no stable hash. */
  def knnTop5(s: org.apache.spark.sql.SparkSession,
              dataDir: String): DataFrame = {
    val e = Tables.embeddings(s, dataDir).select("vec_id", "embedding")
    ArtifactCache.materializeKeyed(s, cacheRoot, "knn_top5_v1",
      ArtifactCache.artifactHash(e))(
      Ops.knnBruteForce(e, "vec_id", "embedding", k = 5))
  }

  /** The PQ index (Ops.pqEncode: 8 subspaces × 16 centroids → 8
    * four-bit codes per vector) for the embeddings table — the
    * compressed-store artifact an ADC search scans instead of the
    * floats. Keyed on the input fingerprint like the codebook: encode
    * once per corpus, reuse across every query. */
  def pqCodes(s: org.apache.spark.sql.SparkSession,
              dataDir: String): DataFrame = {
    val e = Tables.embeddings(s, dataDir).select("vec_id", "embedding")
    ArtifactCache.materializeKeyed(s, cacheRoot, "pq_codes_v1_m8_k16",
      ArtifactCache.artifactHash(e))(
      Ops.pqEncode(e, "vec_id", "embedding"))
  }

  /** The IVF ANN result (k=3, nprobe=4, trained 16×3 codebook) —
    * shared by `emb_ann_ivf` and `emb_ivf_recall`. Name carries the
    * hyperparameters; hash carries the corpus fingerprint. */
  def annIvfTop3(s: org.apache.spark.sql.SparkSession,
                 dataDir: String): DataFrame = {
    val e = Tables.embeddings(s, dataDir).select("vec_id", "embedding")
    ArtifactCache.materializeKeyed(s, cacheRoot, "ann_ivf_v1_k3_np4_c16i3",
      ArtifactCache.artifactHash(e))(
      Ops.annIvf(e, "vec_id", "embedding", ivfCodebook(s, dataDir),
                 k = 3, nprobe = 4))
  }
}
