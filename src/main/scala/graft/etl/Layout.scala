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

  /** Grid bits per dimension for [[withHilbertValue]] — 256×256 cells.
    * File-level clustering only needs cell granularity well above the
    * file count (64-4096 files); 8 bits halves the walk depth vs 16 and
    * the demo measured no skipping difference. */
  val HilbertBits = 8

  /** Normalize to the Hilbert grid, [0, 2^HilbertBits - 1]. */
  def normToHilbertGrid(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)).cast("double") / lit(math.max(1L, hi - lo)) *
      ((1 << HilbertBits) - 1)).cast("int")

  /** Hilbert-curve index of two grid-normalized dimensions, appended as
    * `out`. The Hilbert curve never takes the long diagonal jumps Morton
    * interleaving does, so consecutive curve positions stay spatially
    * adjacent — per-file ranges after range-partitioning on the index are
    * a bit tighter on BOTH dimensions than z-order's.
    *
    * Shape: the classic xy→d walk is a per-bit loop whose x/y state is
    * rotated/reflected each level. Each level is ONE chained projection
    * materializing (__hx, __hy, __hd): x and y are referenced several
    * times per level, so a single nested Column would grow ~6× per level
    * (6^bits nodes); as projections the expression stays linear. The
    * rotate/reflect selects are BRANCHLESS (arithmetic on the 0/1 rank
    * bits) — pure long ops inside codegen, no CASE chains. */
  def withHilbertValue(df: org.apache.spark.sql.DataFrame,
                       a: Column, b: Column, out: String): org.apache.spark.sql.DataFrame = {
    val keep = df.columns.map(col).toSeq
    var cur = df.select(keep :+ a.cast("long").as("__hx")
      :+ b.cast("long").as("__hy") :+ lit(0L).as("__hd"): _*)
    var k = HilbertBits - 1
    while (k >= 0) {
      val s = 1L << k
      val x = col("__hx"); val y = col("__hy")
      val rx = shiftrightunsigned(x, k).bitwiseAND(lit(1L))
      val ry = shiftrightunsigned(y, k).bitwiseAND(lit(1L))
      val d = col("__hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // rotate only when ry == 0: reflect (when rx == 1) then swap —
      // expressed as arithmetic selects over the 0/1 rank bits
      val refl = (lit(1L) - rx) * y + rx * (lit(s - 1) - y) // reflected y
      val refly = (lit(1L) - rx) * x + rx * (lit(s - 1) - x) // reflected x
      val nx = ry * x + (lit(1L) - ry) * refl
      val ny = ry * y + (lit(1L) - ry) * refly
      cur = cur.select(keep :+ nx.as("__hx") :+ ny.as("__hy") :+ d.as("__hd"): _*)
      k -= 1
    }
    cur.select(keep :+ col("__hd").as(out): _*)
  }
}
