package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared query contract (SURVEY.md §2.9) from the
  * per-family modules under `graft.queries`, `graft.etl`, `graft.catalog`,
  * `graft.sql` and `graft.streaming`. Every oracle-able query has a
  * DuckDB-dialect twin in [[oracleSql]] with identical column names
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary (SURVEY.md §7.1). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.qAggGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Windows.queries ++
    graft.queries.Scalars.queries ++
    graft.queries.Analytics.queries ++
    graft.queries.Extensions.queries ++
    graft.queries.Meta.queries ++
    graft.queries.Etl.queries ++
    graft.streaming.Streaming.queries ++
    graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.Windows.oracles ++
    graft.queries.Scalars.oracles ++
    graft.queries.Analytics.oracles ++
    graft.queries.Extensions.oracles ++
    graft.queries.Meta.oracles ++
    graft.queries.Etl.oracles ++
    graft.streaming.Streaming.oracles ++
    graft.multimodal.Multimodal.oracles
}
