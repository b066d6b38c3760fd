package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Commit-log statistics → Catalyst (r17 verdict #2).
  *
  * A lake read is `spark.read.parquet(<root>/dirA, <root>/dirB, …)`,
  * so its [[LogicalRelation]] reports only `sizeInBytes` (from file
  * lengths) and NO row count — Catalyst's cost-based join reorder
  * needs `rowCount` on every joined relation, so join ORDER on lake
  * tables previously rested entirely on AQE's runtime correction. At
  * 100× scale a bad initial order materializes a huge first shuffle
  * before AQE can help.
  *
  * The commit log already knows the answer: every commit records the
  * footer row count of each directory it adds
  * ([[LakeTable.Commit.rowCounts]]). [[LakeRelationStats]] — an
  * injected optimizer rule that runs in the operator-optimization
  * batch, BEFORE Join Reorder — recognizes a relation whose root
  * paths are all data directories of one lake table (parent carries
  * `_graft_log`) and attaches a synthetic EXTERNAL [[CatalogTable]]
  * whose [[CatalogStatistics]] carry the summed logged row counts;
  * `LogicalRelation.computeStats` then surfaces them whenever CBO or
  * plan-stats is enabled. Per-directory counts are immutable once
  * committed (directories are UUID-named and never rewritten in
  * place), so they are cached process-wide; a directory the log
  * never counted (pre-r18 commits) declines the lake path — partial
  * statistics would MISLEAD the reorder rather than inform it.
  *
  * RAW parquet relations (and legacy lake logs) fall back to direct
  * footer counting when the file set is small (≤ [[rawFooterCap]]
  * files — plan-time driver IO must stay bounded; lake tables carry
  * counts in the log precisely so scale never hits this path),
  * cached by a (path, length, mtime) fingerprint: this is what lets
  * a MIXED join (lake table ⋈ ad-hoc parquet directory) reorder —
  * CBO needs rowCount on every joined item. Failure mode throughout:
  * no statistics, Spark behaves exactly as before.
  *
  * Deployment: rides [[GraftExtensions]] (the conf-driven path); a
  * session also needs `spark.sql.cbo.enabled=true` and
  * `spark.sql.cbo.joinReorder.enabled=true` for the reorder itself —
  * stats reporting alone is harmless without them.
  */
object LakeStats {

  // "<root>/<dir>" → logged row count (None = this log never counted
  // the dir; negative caching is safe — counts are write-once)
  private val dirRows =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Long]]()
  // root → does it carry a commit log at all (one FS probe per root)
  private val lakeRoot =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  // (path, length, mtime)-fingerprint of a RAW parquet file set →
  // footer row count; the fingerprint sees in-place overwrites, so a
  // stale entry can only describe a file set that no longer exists
  private val rawRows =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Long]]()

  /** Raw (non-lake) parquet relations above this many files never get
    * footer-counted: plan-time driver IO must stay bounded. Lake
    * tables carry their counts in the commit log precisely so scale
    * does not hit this path. */
  private val rawFooterCap = 1024

  /** Test hook: drop the process-wide caches. */
  private[graft] def clearCache(): Unit = {
    dirRows.clear(); lakeRoot.clear(); rawRows.clear()
  }

  private def isLakeRoot(spark: SparkSession, root: Path): Boolean =
    lakeRoot.computeIfAbsent(root.toString, _ => {
      try root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new Path(root, "_graft_log"))
      catch { case scala.util.control.NonFatal(_) => false }
    }).booleanValue()

  /** Summed logged row count for a relation reading `dirs` of `root`,
    * or None when any directory lacks a logged count. */
  private def rowsFor(spark: SparkSession, root: Path,
                      dirs: Seq[String]): Option[Long] = {
    val missing = dirs.filter(d => !dirRows.containsKey(s"$root/$d"))
    if (missing.nonEmpty) {
      val st = LakeTable.replayState(spark, root.toString, None)
      // cache a verdict ONLY for directories the replayed log KNOWS:
      // a dir probed before its commit is visible (in-flight writer)
      // must not be negative-cached forever — its count arrives with
      // the very commit that adds it. A known dir without a count is
      // a legacy commit: that None is permanent and safely cached.
      missing.foreach { d =>
        if (st.rowCounts.contains(d) || st.active.contains(d))
          dirRows.put(s"$root/$d", st.rowCounts.get(d))
      }
    }
    val counts = dirs.map(d => Option(dirRows.get(s"$root/$d")).flatten)
    if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }

  /** Row count for a RAW parquet relation — the mixed-join fallback
    * (a lake ⋈ raw-directory join needs counts on BOTH sides before
    * CBO will reorder it). Footer reads, driver-side, at most
    * [[rawFooterCap]] files; cached by a (path, length, mtime)
    * fingerprint so an in-place overwrite invalidates naturally. A
    * stale hit could anyway only mis-ESTIMATE — statistics never
    * decide correctness. */
  private def rawRowsFor(spark: SparkSession,
                         fs: HadoopFsRelation): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
    if (!fs.fileFormat.isInstanceOf[
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      return None
    val files = fs.location match {
      case pa: PartitioningAwareFileIndex => pa.allFiles()
      case _ => return None
    }
    if (files.isEmpty || files.size > rawFooterCap) return None
    val key = files.map(f =>
        s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString("|")
    Option(rawRows.computeIfAbsent(key, _ => {
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        Some(files.map { f =>
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, conf))
          try in.getRecordCount finally in.close()
        }.sum)
      } catch { case scala.util.control.NonFatal(_) => None }
    })).flatten
  }

  private[engine] def statsFor(spark: SparkSession,
                               lr: LogicalRelation): Option[CatalogTable] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths
        if (roots.isEmpty) return None
        val parents = roots.map(_.getParent).distinct
        val lakeRows =
          if (parents.size == 1 && parents.head != null &&
              isLakeRoot(spark, parents.head))
            rowsFor(spark, parents.head, roots.map(_.getName))
          else None
        val rows = lakeRows.orElse(rawRowsFor(spark, fs))
        rows.map { n =>
          CatalogTable(
            identifier = TableIdentifier(
              "graft_lake_" + java.lang.Long.toHexString(
                roots.head.toString.hashCode.toLong & 0xffffffffL)),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty,
            schema = lr.schema,
            stats = Some(CatalogStatistics(
              sizeInBytes = BigInt(fs.sizeInBytes),
              rowCount = Some(BigInt(n)))))
        }
      case _ => None
    }

  /** The injected rule: attach logged statistics to bare lake-table
    * relations. Idempotent (a relation with a catalogTable — ours or
    * a real one — is left alone), active-session-scoped, and a no-op
    * for every non-lake relation. */
  final class LakeRelationStats extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      // rowCount only reaches plan statistics under CBO/plan-stats
      // (CatalogStatistics.toPlanStats gates on them) — skip all work
      // otherwise, so non-CBO sessions never pay a probe or footer
      if (!(conf.cboEnabled || conf.planStatsEnabled)) return plan
      SparkSession.getActiveSession match {
        case None => plan
        case Some(spark) => plan.transformUp {
          case lr: LogicalRelation if lr.catalogTable.isEmpty =>
            statsFor(spark, lr) match {
              case Some(ct) => lr.copy(catalogTable = Some(ct))
              case None => lr
            }
        }
      }
    }
  }
}
