package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo (SURVEY.md §2.K K2): geometric mean of the
  * positive inputs. Partial-aggregable (sum-of-logs + count buffer), so it
  * map-side combines like any built-in aggregate — no extra shuffle volume
  * at scale.
  */
case class GeoMeanBuffer(sumLog: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuffer, Double] {
  override def zero: GeoMeanBuffer = GeoMeanBuffer(0.0, 0L)
  override def reduce(b: GeoMeanBuffer, x: Double): GeoMeanBuffer =
    if (x > 0) GeoMeanBuffer(b.sumLog + math.log(x), b.n + 1) else b
  override def merge(a: GeoMeanBuffer, b: GeoMeanBuffer): GeoMeanBuffer =
    GeoMeanBuffer(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoMeanBuffer): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuffer] = Encoders.product[GeoMeanBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
