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
    require(stages.map(_.name).distinct.size == stages.size,
      "duplicate stage names")
    Pipeline(Option(root.get("cacheRoot")).map(_.asText()), stages)
  }

  /** Runs the pipeline; returns every stage's DataFrame by name. */
  def run(spark: SparkSession, sfDir: String,
          pipeline: Pipeline): Map[String, DataFrame] = {
    val results = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    pipeline.stages.foreach { st =>
      val base = (st.query, st.sql) match {
        case (Some(q), _) =>
          Registry.queries.getOrElse(q,
            throw new IllegalArgumentException(s"unknown query key: $q"))
            .apply(spark, sfDir)
        case (_, Some(sql)) => spark.sql(sql)
        case _ => throw new IllegalStateException("unreachable")
      }
      val df =
        if (st.cache) {
          val root = pipeline.cacheRoot.getOrElse(
            System.getProperty("java.io.tmpdir") + "/graft_artifacts")
          ArtifactCache.materialize(base, root, st.name)
        } else base
      df.createOrReplaceTempView(st.name)
      results(st.name) = df
    }
    results.toMap
  }

  def runJson(spark: SparkSession, sfDir: String,
              json: String): Map[String, DataFrame] =
    run(spark, sfDir, parse(json))
}
