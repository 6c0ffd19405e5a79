package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated algebraic laws for set ops and window frames
  * (SURVEY.md §5.2) — brute-force Scala reference vs the Spark plan on the
  * same generated data, fixed seeds for reproducibility.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val smallInts = Gen.choose(0, 30)

  test("set-op laws: inclusion-exclusion and partition of the left side") {
    for (seed <- Seq(1L, 99L, 2024L)) {
      val a = sample(smallInts, 80, seed)
      val b = sample(smallInts, 60, seed * 7 + 1)
      val da = a.toDF("v"); val db = b.toDF("v")
      val union = da.union(db).distinct().count()
      val intersect = da.intersect(db).count()
      val exceptAB = da.except(db).count()
      // reference values from plain Scala sets
      assert(union === (a.toSet ++ b.toSet).size.toLong)
      assert(intersect === (a.toSet & b.toSet).size.toLong)
      assert(exceptAB === (a.toSet -- b.toSet).size.toLong)
      // |A∪B| = |A|+|B|-|A∩B| over distinct sets
      assert(union === a.toSet.size + b.toSet.size - intersect)
      // EXCEPT ∪ INTERSECT partitions distinct(A)
      assert(exceptAB + intersect === a.toSet.size.toLong)
    }
  }

  test("running-total window: last value per key equals the group sum") {
    val gen = for { k <- Gen.choose(0, 4); v <- Gen.choose(-100, 100) } yield (k, v)
    val rows = sample(gen, 300, 7L).zipWithIndex
      .map { case ((k, v), i) => (k, i.toLong, v.toLong) }
    val df = rows.toDF("k", "ord", "v")
    val w = Window.partitionBy("k").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastRunning = df.withColumn("run", sum("v").over(w))
      .groupBy("k").agg(max_by(col("run"), col("ord")).as("final_run"))
    val groupSums = df.groupBy("k").agg(sum("v").as("total"))
    val mismatches = lastRunning.join(groupSums, "k")
      .filter(col("final_run") =!= col("total")).count()
    assert(mismatches === 0)
  }

  test("rank/row_number agree with a brute-force sort of the same data") {
    val gen = for { k <- Gen.choose(0, 2); v <- Gen.choose(0, 20) } yield (k, v)
    val rows = sample(gen, 150, 11L).zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) }
    val df = rows.toDF("k", "v", "tie")
    // row_number under a TOTAL order (tie column makes it unique)
    val wTotal = Window.partitionBy("k").orderBy(desc("v"), asc("tie"))
    // rank under a PARTIAL order (ties on v share a rank)
    val wTies = Window.partitionBy("k").orderBy(desc("v"))
    val got = df.select(col("k"), col("v"), col("tie"),
        row_number().over(wTotal).as("rn"), rank().over(wTies).as("rk"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)) ->
        (r.getInt(3), r.getInt(4))).toMap
    rows.groupBy(_._1).foreach { case (_, group) =>
      val sorted = group.sortBy { case (_, v, tie) => (-v, tie) }
      sorted.zipWithIndex.foreach { case (row, idx) =>
        val (rn, rk) = got(row)
        assert(rn === idx + 1)
        // rank = 1 + number of rows strictly better on the ordering key
        assert(rk === group.count { case (_, v2, _) => v2 > row._2 } + 1)
      }
    }
  }
}
