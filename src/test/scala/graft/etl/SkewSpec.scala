package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain equi-join. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 7L else i.toLong % 50, i.toLong, s"p$i"))
      .toDF("k", "line_no", "payload")
    val dim = (0 to 49).map(k => (k.toLong, s"dim$k")).toDF("k", "dim_v")

    val plain = fact.join(dim, Seq("k"))
      .select("k", "line_no", "dim_v").orderBy("line_no")
    val salted = Skew.saltedJoin(fact, dim, "k", "line_no", salt = 8)
      .select("k", "line_no", "dim_v").orderBy("line_no")
    assert(salted.collect().toSeq === plain.collect().toSeq)
    assert(salted.count() === 1000)
  }

  test("salt spreads the hot key across partitions") {
    val fact = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "line_no")
    val n = fact.withColumn("_s", pmod(hash(col("line_no")), lit(8)))
      .select("_s").distinct().count()
    assert(n === 8) // all 8 sub-keys materialize
  }
}
