package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: time the basket_assoc_rules sub-frames. */
object ProbeBasket {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionHygiene.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.{ArtifactCache, Artifacts, Tables}
    val items = ArtifactCache.materializeLazy(spark, Artifacts.cacheRoot,
      "basket_items_v1", sfDir)(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
        .join(Tables.part(spark, sfDir).select("p_partkey", "p_brand"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("item"))
        .distinct())
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-28s ${ts.map(_._1).sorted.apply(1)}%7.3f  rows=${ts.head._2}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    time("items.count")(items.count())
    val baskets = items.groupBy("okey").agg(collect_set(col("item")).as("its"))
    time("collect_set noop")(noop(baskets))
    val pairsU = baskets
      .select(explode(expr(
        "flatten(transform(its, x -> transform(" +
        "filter(its, y -> x < y), y -> struct(x AS ante, y AS cons))))"))
        .as("p"))
      .groupBy(col("p.ante").as("ante"), col("p.cons").as("cons"))
      .agg(count(lit(1)).as("pair_n"))
    time("pairsU noop")(noop(pairsU))
    val pairsOld = baskets
      .select(explode(expr(
        "flatten(transform(its, x -> " +
        "transform(its, y -> struct(x AS ante, y AS cons))))")).as("p"))
      .filter(col("p.ante") =!= col("p.cons"))
      .groupBy(col("p.ante").as("ante"), col("p.cons").as("cons"))
      .agg(count(lit(1)).as("pair_n"))
    time("pairsOld noop")(noop(pairsOld))
    time("tot")(items.agg(countDistinct("okey")).count())
    time("cnt noop")(noop(items.groupBy("item").agg(count(lit(1)).as("n_item"))))
    time("full key")(graft.engine.QueriesR13.basketAssocRules(spark, sfDir).count())
    spark.stop()
  }
}
