package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout helpers shared by the clustering query demos and the
  * table-maintenance operator. */
object Layout {

  /** Morton (z-order) value: interleave the low 16 bits of two normalized
    * dimensions — plain bit-op Columns, fully inside whole-stage codegen. */
  def zValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** Normalize a numeric column to the [0, 65535] integer grid given its
    * [lo, hi] range (driver-collected once — two longs, not data). */
  def normTo16Bits(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)).cast("double") / lit(math.max(1L, hi - lo)) * 65535).cast("int")
}
