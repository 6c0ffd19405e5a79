package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.catalog.GraftCatalog

/** SQL text entry point + the BI dialect shims the reference carries in its
  * Superset client (SURVEY.md §2.I).
  */
object GraftSql {

  /** Statement rewrite I1: Spark SQL has no `SHOW CREATE VIEW`; the
    * reference intercepts and rewrites before execution
    * (`/root/reference/superset_config.py:19-41`, prefix match at `:24-27`).
    */
  def rewrite(statement: String): String = {
    val t = statement.trim
    if (t.toUpperCase.startsWith("SHOW CREATE VIEW"))
      "SHOW CREATE TABLE" + t.substring("SHOW CREATE VIEW".length)
    else statement
  }

  /** The q_sql_entry surface: full SQL text in, DataFrame out — the same
    * contract the reference serves over HiveServer2 Thrift
    * (`/root/reference/entrypoint-spark.sh:71-73`). */
  def sql(spark: SparkSession, statement: String): DataFrame =
    spark.sql(rewrite(statement))

  /** I2: `SHOW TABLES IN <ns>` rows — (database, tableName, isTemporary),
    * the triple PyHive's patched introspection reads
    * (`/root/reference/pyhive_spark_patch.py:8-13`). */
  def showTables(spark: SparkSession, cat: GraftCatalog, ns: String): DataFrame = {
    import spark.implicits._
    cat.listTables(ns).map(t => (ns, t, false))
      .toDF("namespace", "tableName", "isTemporary")
  }

  /** I3: `SHOW VIEWS IN <ns>` — Spark's native SHOW VIEWS (permanent +
    * temp), shaped as the (namespace, viewName, isTemporary) triple the
    * PyHive patch reads (`/root/reference/pyhive_spark_patch.py:15-19`).
    * Temp views surface with an empty namespace; the shim's schema-scoped
    * call expects the requested one, so it is filled in. */
  def showViews(spark: SparkSession, ns: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, nullif}
    spark.sql(s"SHOW VIEWS IN `$ns`")
      .select(coalesce(nullif(col("namespace"), lit("")), lit(ns)).as("namespace"),
        col("viewName"), col("isTemporary"))
  }

  /** I5: the view-definition probe with the `SKIP_VIEW_DDL` short-circuit
    * (`/root/reference/pyhive_spark_patch.py:5-6,21-35`): when `skipViewDdl`
    * is set the probe returns None WITHOUT issuing any statement — the
    * switch that stops Superset's per-view DDL introspection storm.
    * Otherwise: SHOW CREATE VIEW (rewritten to TABLE, I1), rows joined by
    * newline, None on any failure — the shim's exact flow. */
  def viewDefinition(spark: SparkSession, viewName: String,
                     ns: Option[String] = None,
                     skipViewDdl: Boolean = false): Option[String] =
    if (skipViewDdl || viewName == null || viewName.isEmpty) None
    else {
      val ident = ns.map(n => s"`$n`.`$viewName`").getOrElse(s"`$viewName`")
      scala.util.Try(
        sql(spark, s"SHOW CREATE VIEW $ident")
          .collect().toSeq.flatMap(r => Option(r.getString(0))).mkString("\n")
      ).toOption.filter(_.nonEmpty)
    }

  /** C4: incremental result transfer — one partition collected at a time,
    * never the whole result on the driver — the semantics the reference
    * turns on with `spark.sql.hive.thriftServer.incrementalCollect=true`
    * (`/root/reference/entrypoint-spark.sh:110`). */
  def serveIncremental(df: DataFrame): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** I2-adjacent: `DESCRIBE TABLE` — one row per column, the BI clients'
    * schema-introspection call. Metadata-only (catalog JSON, no scan). */
  def describeTable(spark: SparkSession, cat: GraftCatalog, ns: String,
                    table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val meta = cat.loadTable(ns, table)
    val rows = meta.schema.fields.toSeq.map(f =>
      org.apache.spark.sql.Row(f.name, f.dataType.sql.toLowerCase, f.nullable))
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("col_name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("data_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("nullable",
        org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** I4: `SHOW CREATE TABLE` DDL text (multi-line, newline-joined like the
    * client shim, `/root/reference/pyhive_spark_patch.py:21-35`). */
  def showCreateTable(cat: GraftCatalog, ns: String, table: String): String = {
    val meta = cat.loadTable(ns, table)
    val cols = meta.schema.fields.map { f =>
      val nullable = if (f.nullable) "" else " NOT NULL"
      s"  ${f.name} ${f.dataType.sql}$nullable"
    }.mkString(",\n")
    s"CREATE TABLE $ns.$table (\n$cols\n)\nUSING parquet"
  }
}
