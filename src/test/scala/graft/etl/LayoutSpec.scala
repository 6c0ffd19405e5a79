package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-level properties of the Morton (z-order) helpers. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: deinterleaving recovers both inputs") {
    val df = Seq.tabulate(256)(i => (i * 37 % 65536, i * 101 % 65536))
      .toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b")))
    // deinterleave: even bits → a, odd bits → b
    val even = (0 until 16).map(i =>
      shiftleft(shiftrightunsigned(col("z"), 2 * i).bitwiseAND(lit(1)), i))
      .reduce(_ bitwiseOR _)
    val odd = (0 until 16).map(i =>
      shiftleft(shiftrightunsigned(col("z"), 2 * i + 1).bitwiseAND(lit(1)), i))
      .reduce(_ bitwiseOR _)
    assert(df.filter(even =!= col("a") || odd =!= col("b")).count() === 0)
  }

  test("zValue locality: halving both coordinates halves the z prefix") {
    // points in the same 2^k × 2^k cell share all z bits above 2k — the
    // property that makes z-ranges map to spatial boxes
    val rows = Seq((1000, 2000), (1001, 2001), (1007, 2007)).toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b")))
      .select(shiftrightunsigned(col("z"), 8).as("cell")) // 2k = 8 → 16×16 cells
      .as[Long].collect().toSeq
    assert(rows.distinct.size === 1)
  }

  test("zValue stays non-negative over the whole 16-bit grid (sign-bit regression)") {
    // b's bit 15 lands on interleaved bit 31 — as an Int that is the sign
    // bit, which made the upper half of b's range order before 0 and broke
    // the curve's monotonicity; as a Long it must stay positive
    val df = Seq((0, 65535), (65535, 65535), (1, 40000)).toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b")))
    assert(df.schema("z").dataType === org.apache.spark.sql.types.LongType)
    assert(df.filter(col("z") < 0).count() === 0)
  }

  test("normTo16Bits maps [lo, hi] onto [0, 65535] monotonically") {
    val df = Seq(0L, 250L, 500L, 750L, 1000L).toDF("v")
      .withColumn("n", Layout.normTo16Bits(col("v"), 0L, 1000L))
      .orderBy("v").select("n").as[Int].collect().toSeq
    assert(df === df.sorted)
    assert(df.head === 0 && df.last === 65535)
    // degenerate range must not divide by zero
    val const = Seq(7L).toDF("v")
      .select(Layout.normTo16Bits(col("v"), 7L, 7L).as("n")).as[Int].head()
    assert(const === 0)
  }
}
