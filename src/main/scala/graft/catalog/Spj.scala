package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned joins (SPJ) — the scan side.
  *
  * When every scanned file of a catalog table was written under ONE
  * single-field partition spec (identity or bucket[N]), the scan can tell
  * Spark its data is ALREADY clustered by that transform: it reports
  * [[KeyGroupedPartitioning]] and plans one input partition per partition
  * value, each exposing its key ([[HasPartitionKey]]). Spark's planner
  * (under `spark.sql.sources.v2.bucketing.enabled`) then drops BOTH
  * shuffles of a join between two tables co-partitioned on the join key —
  * the same mechanism Iceberg uses for its storage-partitioned joins
  * (SPARK-37375). At 100 TB this turns the nightly fact-fact join from
  * two full-table exchanges into a metadata handshake.
  *
  * The wrapper delegates all I/O to the stock parquet batch it wraps —
  * vectorized reading, pushdown and column pruning are untouched; only the
  * file→partition packing (by partition value instead of by size) and the
  * reported partitioning differ. Activation is opt-in by session conf, so
  * ordinary scans keep Spark's size-balanced packing. */
private[catalog] object GraftKeyedScan {

  private def confEnabled: Boolean =
    SQLConf.get.getConfString("spark.sql.sources.v2.bucketing.enabled",
      "false").toBoolean

  private val BucketRe = raw"bucket\[(\d+)\]".r

  /** Wrap `inner` if (and only if) key-grouped reporting is sound for
    * `files`: session opted in, a single uniform single-field spec over
    * every file, every file carries its tuple, and the source column
    * survives into the read schema (the partitioning expression must bind
    * to an output attribute). */
  def maybeWrap(inner: Scan, files: Seq[DataFileMeta],
                specForFile: DataFileMeta => Seq[PartitionField],
                specFields: Seq[FieldMeta]): Scan = {
    if (!confEnabled || files.isEmpty) return inner
    val specs = files.map(specForFile)
    val uniform = specs.tail.forall(_ == specs.head)
    if (!uniform || specs.head.size != 1) return inner
    val pf = specs.head.head
    val srcOpt = specFields.find(_.id == pf.sourceId)
    if (srcOpt.isEmpty) return inner
    val src = srcOpt.get
    if (!inner.readSchema().fieldNames.exists(_.equalsIgnoreCase(src.name)))
      return inner
    val canonOf: Map[String, String] = files.flatMap(f =>
      f.partition.flatMap(_.get(pf.name)).map(f.path -> _)).toMap
    if (canonOf.size != files.map(_.path).distinct.size) return inner
    val keyRow: String => Option[InternalRow] = pf.transform match {
      case BucketRe(_) => c => Some(new GenericInternalRow(Array[Any](c.toInt)))
      case "identity" => c =>
        if (c == Partitioning.NullValue)
          Some(new GenericInternalRow(Array[Any](null)))
        else scala.util.Try(new GenericInternalRow(Array[Any](
          Cast(Literal(UTF8String.fromString(c), StringType), src.dataType,
            Some(SQLConf.get.sessionLocalTimeZone), ansiEnabled = true)
            .eval(null)))).toOption
      case _ => _ => None // time transforms: no loss — identity/bucket are
                          // the join-key shapes; others rarely co-partition
    }
    val canons = canonOf.values.toSeq.distinct.sorted
    val keys = canons.map(keyRow)
    if (keys.exists(_.isEmpty)) return inner
    val keyByCanon = canons.zip(keys.map(_.get)).toMap
    val keyExpr = pf.transform match {
      case BucketRe(n) => Expressions.bucket(n.toInt, src.name)
      case _           => Expressions.identity(src.name)
    }
    new GraftKeyedScan(inner, keyExpr, canonOf, keyByCanon)
  }
}

private[catalog] class GraftKeyedScan(
    inner: Scan, keyExpr: org.apache.spark.sql.connector.expressions.Expression,
    canonOf: Map[String, String], keyByCanon: Map[String, InternalRow])
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = s"${inner.description()} (key-grouped)"
  override def toBatch: Batch = this

  private lazy val innerBatch: Batch = inner.toBatch

  /** Repack the delegate's size-balanced partitions into one partition per
    * PARTITION VALUE. Files of one value stay whole (their chunks travel
    * together), which is exactly the clustering contract the reported
    * partitioning promises. */
  override def planInputPartitions(): Array[InputPartition] = {
    val chunks = innerBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected non-file partition from parquet batch: $other")
    }
    val byCanon = chunks.groupBy { c =>
      canonOf.getOrElse(c.filePath.toPath.toUri.getPath,
        throw new IllegalStateException(
          s"scanned file has no recorded partition value: ${c.filePath}"))
    }
    // every known partition value gets a partition — even one whose files
    // produced no chunks — so numPartitions always matches the report
    keyByCanon.keys.toSeq.sorted.zipWithIndex.map { case (canon, i) =>
      new KeyedFilePartition(
        FilePartition(i, byCanon.getOrElse(canon, Array.empty)),
        keyByCanon(canon)): InputPartition
    }.toArray
  }

  override def outputPartitioning(): KeyGroupedPartitioning =
    new KeyGroupedPartitioning(Array(keyExpr), keyByCanon.size)

  override def createReaderFactory(): PartitionReaderFactory =
    UnwrappingReaderFactory(innerBatch.createReaderFactory())
}

/** A [[FilePartition]] plus the partition value its files share. */
private[catalog] class KeyedFilePartition(val filePartition: FilePartition,
                                          key: InternalRow)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] =
    filePartition.preferredLocations()
}

/** Unwraps [[KeyedFilePartition]] before delegating to the stock parquet
  * reader factory (which pattern-matches on FilePartition). */
private[catalog] case class UnwrappingReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.filePartition
    case other                 => other
  }
  override def createReader(p: InputPartition) = inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition) =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}

/** The catalog-provided `bucket` function — what lets Spark's planner
  * recognize two bucket-partitioned scans as co-clustered: the reported
  * `bucket(N, col)` transform resolves through the table catalog's
  * FunctionCatalog to THIS function, and two sides binding to the same
  * canonical function with equal N are compatible (how Iceberg's system
  * bucket function powers its SPJ). The hash MUST equal the write path's
  * ([[Partitioning.valueColumn]]: `pmod(hash(col), N)`, Murmur3 seed 42)
  * or key-grouped execution would be wrong, which is why both delegate to
  * the same Murmur3. */
private[catalog] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(N, col): Murmur3(seed 42) of col, mod N — the write-side hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2,
      s"bucket expects (numBuckets INT, value), got ${inputType.catalogString}")
    require(inputType(0).dataType == IntegerType,
      s"bucket: first argument must be INT, got ${inputType(0).dataType.sql}")
    new GraftBucketBound(inputType(1).dataType)
  }
}

private[catalog] class GraftBucketBound(dt: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // Murmur3Hash over a null child leaves the seed untouched — null rows
    // land in bucket (42 mod N), matching Partitioning.bucketOfNull
    val h: Int =
      if (input.isNullAt(1)) 42
      else Murmur3HashFunction.hash(input.get(1, dt), dt, 42L).toInt
    val m = h % n
    if (m < 0) m + n else m
  }
}
