package graft.catalog

import java.nio.file.Paths
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 catalog plugin exposing [[GraftCatalog]] tables to Spark
  * SQL — the integration shape the reference gets from Iceberg's
  * SparkCatalog (`/root/reference/conf/spark-defaults.conf:2-5`: a named
  * catalog + warehouse, resolved by the analyzer). Register per session:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftSparkCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/wh")
  *   spark.sql("SELECT * FROM graft.nyc.region VERSION AS OF 1")
  * }}}
  *
  * Reads resolve the snapshot's file list at ANALYSIS time (metadata-only,
  * like every other read path here) and hand Spark a stock ParquetTable —
  * so pushdown, vectorization and AQE all apply unchanged. `VERSION AS OF`
  * maps to the snapshot id via the time-travel `loadTable` overload.
  * Tables carrying merge-on-read delete debt are refused (materialize
  * first): silently returning rows-with-deleted-data would be worse than
  * an error. DDL surface: CREATE/DROP TABLE and namespaces; ALTER/RENAME
  * are unsupported (the metadata layer is schema-fixed by design,
  * SURVEY.md §1.2).
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var cat: GraftCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val wh = Option(options.get("warehouse")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    cat = new GraftCatalog(wh)
  }

  override def name(): String = catName

  private def nsOf(ident: Identifier): String = ident.namespace.mkString(".")

  // ----------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.mkString(".")
    if (!cat.namespaceExists(ns)) throw new NoSuchNamespaceException(namespace.toSeq)
    cat.listTables(ns).map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    cat.tableExists(nsOf(ident), ident.name)

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <snapshot-id>` time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val ns = nsOf(ident)
    if (!cat.tableExists(ns, ident.name)) throw new NoSuchTableException(ident)
    val meta = cat.loadTable(ns, ident.name)
    require(meta.deleteFilesAsOf(asOf).isEmpty,
      s"$ns.${ident.name} carries merge-on-read delete files; materialize before SQL reads")
    new GraftSqlTable(cat, catName, ns, ident.name, meta.schema,
      meta.filesAsOf(asOf).map(_.path))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables are unpartitioned (SURVEY.md §2.A A4)")
    cat.createTable(nsOf(ident), ident.name, schema)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft schemas are fixed at create (SURVEY.md §1.2)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename is not supported")

  override def dropTable(ident: Identifier): Boolean =
    cat.dropTable(nsOf(ident), ident.name)

  // ------------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    cat.listNamespaces().map(ns => Array(ns)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (cat.namespaceExists(namespace.mkString("."))) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    cat.namespaceExists(namespace.mkString("."))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (cat.namespaceExists(namespace.mkString(".")))
      Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    cat.createNamespace(namespace.mkString("."))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties are not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("drop namespace is not supported")
}

/** One catalog table as Spark SQL sees it: reads delegate to a stock
  * ParquetTable over the snapshot's resolved file list; writes (`INSERT
  * INTO` / `INSERT OVERWRITE`) land parquet under the table's `data/` dir
  * and commit ONE append/overwrite snapshot — atomic exactly like the
  * programmatic [[GraftCatalog]] path, through the V1Write bridge (the
  * same route mature connectors take for driver-coordinated commits).
  * `DELETE FROM … WHERE` commits a copy-on-write overwrite snapshot for
  * any predicate expressible in source filters (the common BI shapes);
  * row-level plans beyond that are refused at analysis. */
private[catalog] class GraftSqlTable(cat: GraftCatalog, catName: String,
                                     ns: String, tbl: String,
                                     tableSchema: StructType,
                                     paths: Seq[String])
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {

  override def name(): String = s"$catName.$ns.$tbl"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    // BATCH_WRITE is what the row-level (MERGE/UPDATE) ReplaceData write
    // uses; plain INSERT still takes the V1Write route below (the planner
    // dispatches on the Write instance, not the capability set).
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  /** SQL `MERGE INTO` / `UPDATE` (and the non-filter-expressible `DELETE`
    * residue): Spark's native analyzer rules (RewriteMergeIntoTable /
    * RewriteUpdateTable / RewriteDeleteFromTable) rewrite the statement
    * into a ReplaceData plan over this GROUP-BASED copy-on-write
    * operation — the same statement surface the reference gets from
    * Iceberg's extensions (`/root/reference/conf/spark-defaults.conf:1`,
    * `entrypoint-spark.sh:85`). The scan side re-reads the current
    * snapshot; the write side delegates the distributed parquet write to
    * Spark's own DSv2 ParquetTable write aimed at a fresh staging dir
    * under the table's `data/`, then commits ONE overwrite snapshot —
    * atomic, time-travel preserving, identical in shape to
    * [[graft.etl.Merge.mergeInto]]. At 100 TB the rewrite cost is
    * O(table) by design (copy-on-write); the O(changed-rows) trade is the
    * merge-on-read path ([[GraftCatalog.commitMergeOnRead]]). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()

        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          GraftSqlTable.this.newScanBuilder(options)

        override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder = {
          val staging = Paths.get(cat.warehouse, ns, tbl, "data",
            s"rowlevel-${System.currentTimeMillis()}")
          val delegate = ParquetTable(s"$catName.$ns.$tbl-rowlevel",
            SparkSession.active, CaseInsensitiveStringMap.empty(),
            Seq(staging.toString), Some(tableSchema), classOf[ParquetFileFormat])
            .newWriteBuilder(writeInfo)
          val dataSchema = writeInfo.schema()
          new WriteBuilder { override def build(): Write = new Write {
            private val inner = delegate.build().toBatch
            override def toBatch: BatchWrite = new BatchWrite {
              override def createBatchWriterFactory(
                  p: PhysicalWriteInfo): DataWriterFactory =
                new RowSuffixProjectingFactory(
                  inner.createBatchWriterFactory(p), dataSchema)
              override def useCommitCoordinator(): Boolean =
                inner.useCommitCoordinator()
              override def commit(messages: Array[WriterCommitMessage]): Unit = {
                // parquet job commit first (files become final in staging),
                // then one atomic catalog snapshot replacing the table
                inner.commit(messages)
                cat.registerFiles(ns, tbl, Seq(staging), operation = "overwrite")
              }
              override def abort(messages: Array[WriterCommitMessage]): Unit =
                inner.abort(messages)
            }
          } }
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(name(), SparkSession.active, options, paths,
      Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)

  import org.apache.spark.sql.sources
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}

  private def filterToColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v)           => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sources.In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case sources.Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case sources.Not(c) => filterToColumn(c).map(not)
    case _ => None
  }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(filterToColumn(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val spark = SparkSession.active
    val cond = filters.flatMap(filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val current =
      if (paths.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
      else spark.read.schema(tableSchema).parquet(paths: _*)
    val dir = Paths.get(cat.warehouse, ns, tbl, "data",
      s"delete-${System.currentTimeMillis()}")
    // SQL DELETE removes only rows where the predicate is TRUE — a row where
    // it evaluates NULL must survive, so the keep-filter is NOT(coalesce(p,
    // false)), not NOT(p) (which is NULL for NULL inputs and would drop them).
    current.filter(not(org.apache.spark.sql.functions.coalesce(cond, lit(false))))
      .write.parquet(dir.toString)
    cat.registerFiles(ns, tbl, Seq(dir), operation = "overwrite")
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwriteMode = false
      override def truncate(): WriteBuilder = { overwriteMode = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val dir = Paths.get(cat.warehouse, ns, tbl, "data",
                s"insert-${System.currentTimeMillis()}")
              data.write.parquet(dir.toString)
              cat.registerFiles(ns, tbl, Seq(dir),
                operation = if (overwriteMode || overwrite) "overwrite" else "append")
            }
          }
      }
    }
}

/** Projects incoming rows down to the declared data schema by taking the
  * TRAILING `schema.length` fields. Needed because Spark's group-based
  * ReplaceData plan prepends an internal `__row_operation` column to the
  * rewritten rows for UPDATE/MERGE, and `ReplaceDataExec.writingTask` only
  * strips it when the operation declared metadata attributes (Iceberg's
  * `_spec_id`/`_partition` case) — with zero metadata attributes the plain
  * writing task hands the writer the raw query row. The data columns are
  * always the suffix (operation column first, no metadata columns here), so
  * a fixed trailing-ordinal projection restores the declared write schema;
  * rows already at the declared width (group-based DELETE) pass through. */
private[catalog] class RowSuffixProjectingFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    dataSchema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private val n = dataSchema.length
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == n) w.write(row)
        else {
          if (proj == null) proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
            dataSchema, (row.numFields - n) until row.numFields)
          proj.project(row)
          w.write(proj)
        }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}
