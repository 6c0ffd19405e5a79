package graft

import org.apache.spark.sql.functions._

/** Loader helpers: ns-timestamp normalization and the widen-if-narrow
  * repartition guard. */
class TablesSpec extends SparkSpec {

  test("spread widens a narrow scan to cluster width") {
    val docs = Tables.documents(spark, sfDir) // one small file → 1 partition
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val widened = Tables.spread(spark, docs)
    assert(widened.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(widened.count() === docs.count())
  }

  test("spread is a no-op on an already-wide DataFrame") {
    val wide = Tables.documents(spark, sfDir).repartition(8)
    assert(Tables.spread(spark, wide).rdd.getNumPartitions === 8)
  }

  test("events.ts normalizes ns-parquet to µs TIMESTAMP_NTZ") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    // values land in the fixture's 2024-01 window, not 1970 (a raw ns-long
    // misread would be ~55 years of drift)
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yr.getInt(0) === 2024 && yr.getInt(1) === 2024)
  }
}
