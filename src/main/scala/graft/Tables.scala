package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `$sfDir/`. Type quirks are normalized
  * here so every declared query sees clean types:
  *
  *  - `events.ts` is an int64 whose parquet logical annotation has CHANGED
  *    across driver fixture regenerations: TIMESTAMP(NANOS, utc=false)
  *    through round 6, TIMESTAMP(MICROS, utc=false) from round 7. The unit
  *    is therefore PROBED from the footer ([[eventsTsUnit]]) and the loader
  *    branches — NANOS needs an explicit-BIGINT read + `div 1000` (Spark
  *    cannot represent ns), MICROS/MILLIS read natively as TIMESTAMP_NTZ.
  *    Both branches yield the same µs TIMESTAMP_NTZ DuckDB produces with
  *    `CAST(ts AS TIMESTAMP)`. No session conf involved.
  *  - `o_orderdate` / `l_shipdate` are TIMESTAMP(MILLIS, adjustedToUTC=false)
  *    and surface as TIMESTAMP_NTZ on Spark 4 (inferTimestampNTZ) — kept
  *    as-is; DuckDB's naive TIMESTAMP matches exactly.
  *
  * At 100 TB these loaders stay a single vectorized parquet scan — the
  * normalization is one projection, fully codegen'd, no shuffle — and the
  * footer probe is one driver-side footer read per directory, cached.
  */
object Tables {
  /** (SparkSession, sfDir) => DataFrame — the driver contract shape. */
  type QFn = (SparkSession, String) => DataFrame

  /** Inferred parquet schema per (dir, table), cached like
    * [[eventsTsUnit]]: schema inference re-reads footers on EVERY
    * `spark.read.parquet` call (a driver-side footer read, plus a small
    * inference job once a directory holds many part files) — pure
    * metadata, identical on every call for the immutable test fixtures,
    * and exactly what a production catalog would hand the reader. The
    * DataFrame still scans the parquet files themselves on every
    * action — only the schema lookup is cached, never data or results. */
  private val schemas =
    scala.collection.concurrent.TrieMap.empty[(String, String), org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemas.getOrElseUpdate((dir, name),
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

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

  /** Footer-declared timestamp unit of `events.ts`, probed once per
    * directory and cached: "NANOS" | "MICROS" | "MILLIS", or "INT64" for a
    * plain unannotated int64. The driver regenerates `/root/testdata`
    * between rounds and has already switched the unit once (round 7,
    * NANOS→MICROS — every hard-coded assumption went red), so nothing in
    * the engine may assume a unit. */
  private val tsUnits = scala.collection.concurrent.TrieMap.empty[String, String]

  def eventsTsUnit(dir: String): String = tsUnits.getOrElseUpdate(dir, {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val p = java.nio.file.Paths.get(dir, "events.parquet")
    // `events.parquet` may be a single file (driver fixture) or a Spark
    // output directory of part files (test fixtures) — footer of the first
    // part file wins, the importer's rule.
    val file =
      if (java.nio.file.Files.isDirectory(p))
        graft.catalog.Fs.list(p)
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part files under $p"))
      else p
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val schema = r.getFooter.getFileMetaData.getSchema
      schema.getType(schema.getFieldIndex("ts"))
        .asPrimitiveType().getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit.toString
        case _ => "INT64"
      }
    } finally r.close()
  })

  /** The NANOS-only raw read: schema inference is what throws
    * PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS), while the scan itself reads
    * the int64 fine under an EXPLICIT BIGINT schema — and a session-conf
    * mutation (`spark.sql.legacy.parquet.nanosAsLong`) here would leak into
    * every other declared query (it made `meta_import`'s result depend on
    * query order in round 1). */
  private def eventsNanosLong(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")

  /** events with `ts` as an epoch-MICROSECOND BIGINT regardless of the
    * footer's unit — the raw-value entry point for the sanitize family,
    * which expects the reference's problem shape (an integer epoch column).
    * The MICROS/MILLIS branch derives µs with `timestampdiff` over
    * TIMESTAMP_NTZ values: pure wall-clock arithmetic, no session timezone
    * involved. */
  def eventsRawMicros(spark: SparkSession, dir: String): DataFrame =
    eventsTsUnit(dir) match {
      case "NANOS" =>
        eventsNanosLong(spark, dir).withColumn("ts", expr("ts div 1000"))
      case "INT64" => // unannotated int64: take the stored value as µs
        eventsNanosLong(spark, dir)
      case _ => // MICROS | MILLIS — native NTZ read, then wall-clock diff
        events(spark, dir).withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
    }

  /** events with `ts` normalized to µs TIMESTAMP_NTZ under every footer
    * unit (see the class doc for the branch rationale). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsTsUnit(dir) match {
      case "NANOS" =>
        eventsNanosLong(spark, dir)
          .withColumn("ts", to_timestamp_ntz(timestamp_micros(expr("ts div 1000"))))
      case "INT64" => // unannotated int64: take the stored value as µs
        eventsNanosLong(spark, dir)
          .withColumn("ts", to_timestamp_ntz(timestamp_micros(col("ts"))))
      case _ => // MICROS | MILLIS: Spark 4 reads utc=false footers as NTZ
        table(spark, dir, "events").withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
}
