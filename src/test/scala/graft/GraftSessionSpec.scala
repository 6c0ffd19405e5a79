package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftSession must encode the tuned envelope (BASELINE.md). */
class GraftSessionSpec extends AnyFunSuite {
  test("builder applies the reference envelope and our extensions") {
    // inspect the builder's config without starting a second SparkContext
    val spark = SparkSpec.session // shared session stays untouched
    val b = GraftSession.builder(master = "local[2]", shufflePartitions = 8)
    val m = b.getClass.getMethod("options")
    val opts = m.invoke(b).asInstanceOf[scala.collection.mutable.Map[String, String]]
    assert(opts("spark.sql.shuffle.partitions") === "8")
    assert(opts("spark.sql.autoBroadcastJoinThreshold") === "67108864")
    assert(opts("spark.sql.files.maxPartitionBytes") === "67108864")
    assert(opts("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(opts("spark.sql.session.timeZone") === "UTC")
    assert(opts("spark.sql.extensions") === "graft.functions.GraftExtensions")
  }
}
