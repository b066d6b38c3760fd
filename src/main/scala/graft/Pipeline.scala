package graft

import org.apache.spark.sql.SparkSession

import graft.engine.PipelineConfig

/** CLI entry point for config-declared pipelines — the shell-driveable
  * face of `engine.PipelineConfig` (SURVEY.md §2.1-P10 / §3.1 Entry 1:
  * the reference's `run <config.json>` orchestration surface,
  * re-expressed over the registry + ArtifactCache). `graft.Stream` is
  * the streaming twin; this is the batch-DAG one.
  *
  * Usage: runMain graft.Pipeline <config.json> [sfDir] [outDir]
  *   reads  the JSON stage DAG from <config.json>
  *   runs   each stage in declaration order (query keys against
  *          <sfDir>; SQL stages over earlier stages' temp views;
  *          "cache": true stages through ArtifactCache)
  *   writes <outDir>/<stage>.parquet per stage
  *   prints ONE JSON line {"pipeline_stages":{name:rows,…},"out":dir}
  *
  * An example config lives at tools/example_pipeline.json.
  */
object Pipeline {

  /** Runs a config file's pipeline and writes every stage to parquet;
    * returns stage row counts. Callable from tests and from main. */
  def runFile(spark: SparkSession, configPath: String, sfDir: String,
              outDir: String): Map[String, Long] = {
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val results = PipelineConfig.runJson(spark, sfDir, json)
    results.map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      name -> spark.read.parquet(s"$outDir/$name").count()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: runMain graft.Pipeline <config.json> [sfDir] [outDir]")
    val configPath = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline_out").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = runFile(spark, configPath, sfDir, outDir)
    val js = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${JsonOut.str(k)}:$v" }.mkString("{", ",", "}")
    println(s"""{"pipeline_stages":$js,"out":${JsonOut.str(outDir)}}""")
    spark.stop()
  }
}
