package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Tables.QFn
import graft.etl.{Compact, Sanitize}

/** ETL declared queries (SURVEY.md §2.B / §2.9). The uint64 fixtures are
  * synthesized in-flight (Spark can't write unsigned parquet, so the
  * decimal(20,0) surrogate is the honest representation — it's exactly what
  * Spark's reader yields for UINT64 parquet).
  */
object Etl {

  /** Fixture shaped like the reference's problem input: a decimal(20,0)
    * `counter` (uint64 surrogate) + a decimal(20,0) epoch-µs `timestamp` +
    * an untouched string, derived deterministically from events. */
  private def uintFixture(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "events") // raw read: ts is ns-long via Tables.events conf
      .select(col("event_id"),
        col("event_id").cast(DecimalType(20, 0)).as("counter"),
        expr("ts div 1000").cast(DecimalType(20, 0)).as("timestamp"),
        col("event_type"))

  /** etl_sanitize_uint64 (non-oracle): rule B1 — unsigned column
    * normalized to DECIMAL(20,0), name rule NOT applied to non-`timestamp`
    * columns. */
  private def etlSanitizeUint64: QFn = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = Tables.table(s, d, "events")
      .select(col("event_id"),
        col("event_id").cast("long").as("counter"),
        col("user_id").cast("long").as("other_ts"),
        col("event_type"))
    Sanitize.sanitize(df, unsignedHints = Set("counter", "other_ts"))
      .orderBy("event_id")
  }

  /** etl_sanitize_ts: rule B2 — decimal(20,0) epoch-µs column named
    * `timestamp` → TIMESTAMP (oracle: DuckDB casts the original ns value). */
  private def etlSanitizeTs: QFn = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Sanitize.sanitize(uintFixture(s, d))
      .select(col("event_id"),
        col("timestamp").cast("timestamp_ntz").as("sanitized_ts"))
      .orderBy("event_id")
  }

  /** etl_sanitize_report (non-oracle): the B4 dry-run changed-column report. */
  private def etlSanitizeReport: QFn = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Sanitize.report(uintFixture(s, d), unsignedHints = Set("counter"))
      .orderBy("column_name")
  }

  /** etl_compact: many-files→one, then verify content equivalence by
    * aggregate checksum over the re-read output (oracle computes the same
    * from the original). */
  private def etlCompact: QFn = (s, d) => {
    val outDir = Files.createTempDirectory(
      Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target")), "compact")
    val stats = Compact.compact(s, Seq(s"$d/lineitem.parquet"),
      outDir.toString, codec = "zstd", overwrite = true)
    s.read.parquet(stats.outPath)
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** etl_pipeline: the reference's three stages composed end-to-end —
    * sanitize (B1-B3) → compact (B6-B9) → metadata-only catalog register
    * (A5-A7) → query the registered snapshot. What a user of the reference
    * runs as three processes (python, python, java) is one plan chain
    * here; the oracle recomputes the same aggregate from the raw input. */
  private def etlPipeline: QFn = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = Files.createTempDirectory(
      Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target")), "pipeline")
    // stage 1+2: sanitize the uint64-shaped fixture, compact to one file
    val stats = graft.etl.Compact.compact(s,
      Seq(s"$d/events.parquet"), base.resolve("out").toString,
      codec = "zstd", overwrite = true, sanitizeFirst = true)
    // stage 3: register the compacted file in the catalog
    val cat = new graft.catalog.GraftCatalog(base.resolve("wh").toString)
    cat.createTable("etl", "events_c", s.read.parquet(stats.outPath).schema)
    cat.registerFiles("etl", "events_c", Seq(Paths.get(stats.outPath)))
    // stage 4: query through the catalog read path
    cat.readTable(s, "etl", "events_c")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** etl_bucket_join: bucketed-write co-location — both join sides are
    * written `bucketBy(8, orderkey)` + sorted, so the merge join consumes
    * the bucket layout directly and the physical plan contains ZERO shuffle
    * exchanges for the join (verified in-plan and reported as `colocated`).
    * This is THE layout strategy for a repeatedly-joined 100 TB fact pair:
    * pay one bucketed write, then every subsequent join is shuffle-free
    * regardless of table size. The aggregate itself is oracle-checked. */
  private def etlBucketJoin: QFn = (s, d) => {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val base = Files.createTempDirectory(
      Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target")), "bucket")
    val salt = base.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "_")
    val ot = s"b_orders_$salt"; val lt = s"b_lineitem_$salt"
    Tables.orders(s, d).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", base.resolve("orders").toString).saveAsTable(ot)
    Tables.lineitem(s, d).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", base.resolve("lineitem").toString).saveAsTable(lt)
    val joined = s.table(ot).hint("merge")
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
    val joinShuffles = {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try joined.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeLike => e }.size
      finally s.conf.set("spark.sql.adaptive.enabled", "true")
    }
    joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .withColumn("colocated", lit(joinShuffles == 0))
      .orderBy("o_orderpriority")
  }

  /** etl_partition_prune: hive-style partitioned layout — events written
    * `partitionBy(event_date)`, then a one-day query. The date predicate
    * becomes a PartitionFilter resolved against directory names at PLANNING
    * time: the scan lists and reads exactly one partition's files, the
    * third physical-layout axis next to bucketing (etl_bucket_join) and
    * manifest file skipping (meta_file_skip). At 100 TB time-partitioned
    * writes are what make time-windowed queries O(window), not O(table).
    * `pruned` is asserted from the executed plan. */
  private def etlPartitionPrune: QFn = (s, d) => {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Files.createTempDirectory(
      Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target")), "prune")
    Tables.events(s, d)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").parquet(base.resolve("part").toString)
    val part = s.read.parquet(base.resolve("part").toString)
    val day = part.agg(min(col("event_date"))).head().getDate(0)
    val q = part.filter(col("event_date") === lit(day))
    val pruned = {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.forall(f => f.partitionFilters.nonEmpty && f.selectedPartitions.partitionCount == 1)
      finally s.conf.set("spark.sql.adaptive.enabled", "true")
    }
    q.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .withColumn("pruned", lit(pruned))
      .orderBy("event_type")
  }

  val queries: Map[String, QFn] = Map(
    "etl_sanitize_uint64" -> etlSanitizeUint64,
    "etl_sanitize_ts"     -> etlSanitizeTs,
    "etl_sanitize_report" -> etlSanitizeReport,
    "etl_compact"         -> etlCompact,
    "etl_pipeline"        -> etlPipeline,
    "etl_bucket_join"     -> etlBucketJoin,
    "etl_partition_prune" -> etlPartitionPrune,
  )

  val oracles: Map[String, String] = Map(
    "etl_sanitize_ts" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS sanitized_ts
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_compact" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "etl_pipeline" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "etl_bucket_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       round(sum(l_quantity), 2) AS sum_qty, true AS colocated
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "etl_partition_prune" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |       true AS pruned
        |FROM events
        |WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
