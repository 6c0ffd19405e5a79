package graft.catalog

import java.nio.file.Paths
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
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
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String = s"$catName.$ns.$tbl"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

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
