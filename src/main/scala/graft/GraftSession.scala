package graft

import org.apache.spark.sql.SparkSession

/** Production session factory applying the reference's tuned operating
  * envelope (BASELINE.md; `/root/reference/entrypoint-spark.sh:110-136`)
  * plus our extensions — the one-stop entry point a user of the library
  * starts from:
  *
  *  - AQE on with 64 MB advisory / 16 MB min post-shuffle partitions and
  *    skew-join splitting (`entrypoint-spark.sh:116-121`)
  *  - 64 MB scan splits (`:124`) and broadcast threshold (`:38`, `:130`)
  *  - vectorized parquet + filter pushdown (`:126-127`, Spark defaults)
  *  - UTC session timezone (the sanitize contract normalizes to UTC)
  *  - `graft.functions.GraftExtensions` (native expressions)
  *
  * `shufflePartitions` defaults to the machine's cores for local mode; on
  * a real cluster pass ~2-3× total executor cores — AQE coalesces down,
  * so erring high is safe (`entrypoint-spark.sh:117` fixes 64 for its
  * local[2] envelope for the same reason).
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "67108864")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
