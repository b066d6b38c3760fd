package graft.engine

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON pipeline DAG loader + runner — the Spark re-expression of the
  * reference's config-declared pipelines (SURVEY.md §2.1-P10:
  * config.py/pipeline.py stage DAGs) and its arbiter semantics
  * (§2.1-P8): stages run in declaration order, each result registered
  * as a temp view for downstream SQL stages; `"cache": true` routes
  * the stage through ArtifactCache, so an unchanged stage is loaded,
  * not recomputed — pipetree's stale-detection on Spark.
  *
  * Config shape:
  * {
  *   "cacheRoot": "/tmp/graft_cache",          // optional
  *   "stages": [
  *     {"name": "base",  "query": "q1_pricing_summary"},
  *     {"name": "top",   "sql": "SELECT * FROM base WHERE sum_qty > 10",
  *      "cache": true}
  *   ]
  * }
  * A stage has exactly one of:
  *  - "query": a declared key from Registry.queries (runs on `sfDir`);
  *  - "sql":   Spark SQL over previously declared stage names.
  */
object PipelineConfig {

  case class Stage(name: String, query: Option[String], sql: Option[String],
                   cache: Boolean)
  case class Pipeline(cacheRoot: Option[String], stages: Seq[Stage])

  def parse(json: String): Pipeline = {
    val root: JsonNode = new ObjectMapper().readTree(json)
    val stages = root.path("stages").elements().asScala.map { n =>
      val q = Option(n.get("query")).map(_.asText())
      val sql = Option(n.get("sql")).map(_.asText())
      require(q.isDefined ^ sql.isDefined,
        s"stage ${n.path("name").asText()} needs exactly one of query|sql")
      Stage(n.path("name").asText(), q, sql,
            Option(n.get("cache")).exists(_.asBoolean()))
    }.toSeq
    require(stages.nonEmpty, "pipeline has no stages")
    // case-INSENSITIVE uniqueness: temp views live in Spark's
    // case-insensitive namespace, so stages "Top" and "top" would
    // silently shadow each other's registered view
    require(stages.map(_.name.toLowerCase).distinct.size == stages.size,
      "duplicate stage names (stage names are case-insensitive: they " +
        "become Spark temp views)")
    Pipeline(Option(root.get("cacheRoot")).map(_.asText()), stages)
  }

  /** One executed (or planned) stage: `cacheHit` is Some(hit) for
    * "cache": true stages — whether the artifact already existed
    * BEFORE this run — and None for uncached ones; `ms` covers stage
    * construction + (for cached stages) materialization; `wave` is
    * the stage's DAG level (see `waves`). */
  case class StageRun(name: String, kind: String, cache: Boolean,
                      cacheHit: Option[Boolean], ms: Long, wave: Int,
                      df: DataFrame)

  /** The stage DAG's levels. A SQL stage depends on every EARLIER
    * stage whose name appears as a whole word in its SQL text (the
    * temp-view reference — declaration order already forbids forward
    * references); query stages read only the base tables and sit at
    * wave 0. A stage's wave = 1 + max(dependency waves). Stages in
    * one wave are mutually independent by construction — the
    * parallel runner's unit of concurrency, and the pipetree DAG
    * surface made explicit. */
  def waves(pipeline: Pipeline): Map[String, Int] = {
    val level = scala.collection.mutable.LinkedHashMap[String, Int]()
    pipeline.stages.foreach { st =>
      val deps = st.sql match {
        case Some(sql) =>
          // case-insensitive match: Spark resolves temp-view names
          // case-insensitively, so 'FROM Pricing' depends on stage
          // "pricing" — a case-sensitive match put such a stage in
          // wave 0 under --parallel, racing its dependency's
          // createOrReplaceTempView
          val words =
            sql.split("[^A-Za-z0-9_]+").map(_.toLowerCase).toSet
          level.keys.filter(k => words.contains(k.toLowerCase)).toSeq
        case None => Seq.empty
      }
      level(st.name) =
        if (deps.isEmpty) 0 else deps.map(level).max + 1
    }
    level.toMap
  }

  private def stageBase(spark: SparkSession, sfDir: String,
                        st: Stage): DataFrame = (st.query, st.sql) match {
    case (Some(q), _) =>
      Registry.queries.getOrElse(q,
        throw new IllegalArgumentException(s"unknown query key: $q"))
        .apply(spark, sfDir)
    case (_, Some(sql)) => spark.sql(sql)
    case _ => throw new IllegalStateException("unreachable")
  }

  private def rootOf(pipeline: Pipeline): String =
    pipeline.cacheRoot.getOrElse(
      System.getProperty("java.io.tmpdir") + "/graft_artifacts")

  private def runStage(spark: SparkSession, sfDir: String,
                       pipeline: Pipeline, st: Stage,
                       wave: Int): StageRun = {
    val t0 = System.nanoTime()
    val base = stageBase(spark, sfDir, st)
    val hit =
      if (st.cache)
        Some(ArtifactCache.isCached(base, rootOf(pipeline), st.name))
      else None
    val df =
      if (st.cache) ArtifactCache.materialize(base, rootOf(pipeline), st.name)
      else base
    df.createOrReplaceTempView(st.name)
    StageRun(st.name, if (st.query.isDefined) "query" else "sql",
             st.cache, hit, (System.nanoTime() - t0) / 1000000L, wave, df)
  }

  /** Runs the pipeline with per-stage instrumentation (the pipetree
    * run-report shape: what ran, what the cache already had, how
    * long each stage took). Sequential, declaration order. */
  def runReport(spark: SparkSession, sfDir: String,
                pipeline: Pipeline): Seq[StageRun] = {
    val lvl = waves(pipeline)
    pipeline.stages.map(st =>
      runStage(spark, sfDir, pipeline, st, lvl(st.name)))
  }

  /** DAG-parallel run: stages execute wave by wave, every stage in a
    * wave concurrently (they are independent by construction — see
    * `waves`). Spark actions are thread-safe; concurrent cache
    * materializations target DISTINCT stage names (same-key races are
    * the scratch-then-rename contract, CacheRaceSpec). Views register
    * as each stage finishes, before the next wave parses its SQL.
    * Results are identical to the sequential runner — parallelism
    * changes wall time, never data (PipelineSpec asserts). */
  def runReportParallel(spark: SparkSession, sfDir: String,
                        pipeline: Pipeline): Seq[StageRun] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val lvl = waves(pipeline)
    val byWave = pipeline.stages.groupBy(st => lvl(st.name)).toSeq.sortBy(_._1)
    val runs = byWave.flatMap { case (w, stages) =>
      Await.result(
        Future.sequence(stages.map(st =>
          Future(runStage(spark, sfDir, pipeline, st, w)))),
        Duration.Inf)
    }
    // report in declaration order, like the sequential runner
    val byName = runs.map(r => r.name -> r).toMap
    pipeline.stages.map(st => byName(st.name))
  }

  /** Runs the pipeline; returns every stage's DataFrame by name. */
  def run(spark: SparkSession, sfDir: String,
          pipeline: Pipeline): Map[String, DataFrame] =
    runReport(spark, sfDir, pipeline).map(r => r.name -> r.df).toMap

  /** DRY RUN — the pipetree `--plan` surface: walks the stage DAG,
    * registers each stage's LAZY view (so downstream SQL resolves),
    * and reports per stage what WOULD run: kind, cache flag, and
    * whether the artifact cache already holds it (content hash over
    * plan × input fingerprints — no data is read to answer). Nothing
    * materializes and no output is written. Caveat: stage
    * CONSTRUCTION itself runs training jobs for driver-iterative
    * keys (logreg / pca_power / bpe_train / connected components) —
    * those keys' plans embed trained literals by design. */
  def plan(spark: SparkSession, sfDir: String,
           pipeline: Pipeline): Seq[StageRun] = {
    val lvl = waves(pipeline)
    pipeline.stages.map { st =>
      val t0 = System.nanoTime()
      val base = stageBase(spark, sfDir, st)
      val hit =
        if (st.cache)
          Some(ArtifactCache.isCached(base, rootOf(pipeline), st.name))
        else None
      // For an already-cached stage, register the ARTIFACT's parquet
      // frame as the view — what runStage registers — so a cached SQL
      // stage downstream of another cached stage hashes the same
      // analyzed plan in the dry run as in the real run (a base-frame
      // view made chained cached stages report false misses). The
      // materialize call on a hit only opens the parquet footer.
      val view =
        if (hit.contains(true))
          ArtifactCache.materialize(base, rootOf(pipeline), st.name)
        else base
      view.createOrReplaceTempView(st.name)
      StageRun(st.name, if (st.query.isDefined) "query" else "sql",
               st.cache, hit, (System.nanoTime() - t0) / 1000000L,
               lvl(st.name), view)
    }
  }

  def runJson(spark: SparkSession, sfDir: String,
              json: String): Map[String, DataFrame] =
    run(spark, sfDir, parse(json))
}
