package graft.engine

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** SURVEY.md §2.2-K: the UDF/UDAF registration surface. Scalar UDFs are
  * row-at-a-time and break codegen/pushdown — they exist to prove the
  * extension point; engine code prefers built-ins or CosineSimilarityExpr.
  */
object Udfs {
  /** Great-circle distance (km). Radians computed as x*(PI/180) to match
    * the common C-library `radians()` arrangement bit-for-bit. */
  def haversineKm(lat1: Double, lon1: Double,
                  lat2: Double, lon2: Double): Double = {
    val rad = Math.PI / 180.0
    val dphi = (lat2 - lat1) * rad
    val dlam = (lon2 - lon1) * rad
    val a = Math.sin(dphi / 2) * Math.sin(dphi / 2) +
      Math.cos(lat1 * rad) * Math.cos(lat2 * rad) *
        Math.sin(dlam / 2) * Math.sin(dlam / 2)
    2 * 6371.0 * Math.asin(Math.sqrt(a))
  }

  val haversineUdf =
    functions.udf(haversineKm(_: Double, _: Double, _: Double, _: Double))

  /** Typed Aggregator: geometric mean via sum-of-logs (numerically the
    * only sane formulation — multiplying raw doubles overflows). */
  class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val geoMeanUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new GeoMean, Encoders.scalaDouble)

  def geomean(c: Column): Column = geoMeanUdaf(c)
}
