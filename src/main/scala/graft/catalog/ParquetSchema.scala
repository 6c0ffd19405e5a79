package graft.catalog

import java.nio.file.Path

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Footer-based parquet→Catalyst schema inference, shared by the catalog
  * importer and the compaction driver.
  *
  * Done with Spark's own parquet-to-Catalyst converter rather than
  * `spark.read`: driver-side `spark.read.parquet(...)` inference throws
  * PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) unless a session-wide legacy
  * conf is set, which made round-1 imports order-dependent (the `events`
  * table silently vanished in a fresh session when per-folder error
  * isolation swallowed the throw). Here NANOS maps to BIGINT
  * unconditionally — exactly what Iceberg's `ParquetSchemaUtil.convert`
  * does for types it stores as long
  * (`/root/reference/src/main/java/com/example/ImportParquetFolders.java:128-138`).
  */
object ParquetSchema {

  /** `spark.read.parquet` with a nanos-safe fallback: if inference throws
    * PARQUET_TYPE_ILLEGAL, re-read with the first file's footer schema
    * (first-file-wins, the importer's rule). */
  def read(spark: SparkSession, files: Seq[String]): org.apache.spark.sql.DataFrame =
    try spark.read.parquet(files: _*)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
             e.getCondition == "PARQUET_TYPE_ILLEGAL" =>
        val schema = infer(spark, java.nio.file.Paths.get(files.head))
        spark.read.schema(schema).parquet(files: _*)
    }

  def infer(spark: SparkSession, p: Path): StructType = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val msg = r.getFooter.getFileMetaData.getSchema
      val sqlConf = new org.apache.spark.sql.internal.SQLConf
      // mirror the session's parquet-inference switches, then force nanos
      Seq("spark.sql.parquet.binaryAsString", "spark.sql.parquet.int96AsTimestamp",
          "spark.sql.caseSensitive", "spark.sql.parquet.inferTimestampNTZ.enabled")
        .foreach(k => spark.conf.getOption(k).foreach(v => sqlConf.setConfString(k, v)))
      sqlConf.setConfString("spark.sql.legacy.parquet.nanosAsLong", "true")
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetToSparkSchemaConverter(sqlConf).convert(msg)
    } finally r.close()
  }
}
