package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `$sfDir/`. Two type quirks are
  * normalized here so every declared query sees clean types:
  *
  *  - `events.ts` is written as Parquet TIMESTAMP(NANOS, adjustedToUTC=false),
  *    which Spark cannot represent natively (µs precision). We read it with
  *    an explicit BIGINT schema (schema inference is what throws on NANOS —
  *    the scan itself is fine) and floor-divide to microseconds, yielding a
  *    session-UTC-independent TIMESTAMP_NTZ — the same value DuckDB
  *    produces with `CAST(ts AS TIMESTAMP)`. No session conf involved.
  *  - `o_orderdate` / `l_shipdate` are TIMESTAMP(MILLIS, adjustedToUTC=false)
  *    and surface as TIMESTAMP_NTZ on Spark 4 (inferTimestampNTZ) — kept
  *    as-is; DuckDB's naive TIMESTAMP matches exactly.
  *
  * At 100 TB these loaders stay a single vectorized parquet scan — the
  * normalization is one projection, fully codegen'd, no shuffle.
  */
object Tables {
  /** (SparkSession, sfDir) => DataFrame — the driver contract shape. */
  type QFn = (SparkSession, String) => DataFrame

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)   = table(s, d, "region")
  def nation(s: SparkSession, d: String)   = table(s, d, "nation")
  def customer(s: SparkSession, d: String) = table(s, d, "customer")
  def supplier(s: SparkSession, d: String) = table(s, d, "supplier")
  def part(s: SparkSession, d: String)     = table(s, d, "part")
  def orders(s: SparkSession, d: String)   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String)  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Widen a DataFrame to cluster width before a CPU-bound stage — but ONLY
    * if its current scan is narrower (small files read as one partition
    * locally, serializing per-row compute like levenshtein/md5/json-parse
    * onto one core). At real scale the scan is already wide and this is a
    * no-op, so no gratuitous full-table shuffle is introduced.
    *
    * Width is a pure planner probe: the physical plan's declared
    * partitioning when it is known (explicit repartition, bucketing), else
    * an estimate from optimizer statistics (scan bytes / maxPartitionBytes).
    * The previous `df.rdd.getNumPartitions` probe materialized the RDD
    * lineage per call and bypassed AQE's view of the plan. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val width = s.sparkContext.defaultParallelism
    val declared = df.queryExecution.sparkPlan.outputPartitioning.numPartitions
    val estParts: BigInt =
      if (declared > 0) BigInt(declared)
      else df.queryExecution.optimizedPlan.stats.sizeInBytes /
        BigInt(s.sessionState.conf.filesMaxPartitionBytes) + 1
    if (estParts >= width) df else df.repartition(width)
  }

  /** events as stored: `ts` kept as the raw nanosecond BIGINT. For fixtures
    * that need the unconverted value (the sanitize family). */
  def eventsRawNs(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")

  /** events with `ts` normalized from ns-long to µs TIMESTAMP_NTZ.
    *
    * Read with an EXPLICIT schema (ts as BIGINT) instead of setting
    * `spark.sql.legacy.parquet.nanosAsLong` on the shared session: schema
    * inference is what throws PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS),
    * while the scan itself reads the int64 fine — and a session-conf
    * mutation here would leak into every other declared query (it made
    * `meta_import`'s result depend on query order in round 1). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRawNs(spark, dir)
      .withColumn("ts", to_timestamp_ntz(timestamp_micros(expr("ts div 1000"))))
}
