package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout helpers shared by the clustering query demos and the
  * table-maintenance operator. */
object Layout {

  /** Morton (z-order) value: interleave the low 16 bits of two normalized
    * dimensions — plain bit-op Columns, fully inside whole-stage codegen.
    * Computed as LONG: the b-dimension's bit 15 lands on interleaved bit 31,
    * which in an INT is the sign bit — z-values for the upper half of b's
    * range would go negative and range-partitioning would order the curve
    * discontinuously, silently degrading 2-D clustering. */
  def zValue(a: Column, b: Column): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until 16).map { i =>
      val abit = shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Normalize a numeric column to the [0, 65535] integer grid given its
    * [lo, hi] range (driver-collected once — two longs, not data). */
  def normTo16Bits(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)).cast("double") / lit(math.max(1L, hi - lo)) * 65535).cast("int")
}
