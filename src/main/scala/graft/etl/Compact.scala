package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Streaming compaction (SURVEY.md §2.B B6-B9): many Parquet files → one,
  * with optional sanitize, mirroring `/root/reference/aggregate_parquet.py`:
  *
  *  - explicit file-list scan (`:120`)
  *  - out-path resolution: directory ⇒ `<dir>/aggregated.parquet` (`:156-171`)
  *  - overwrite guard (`:116-117`)
  *  - writer: compression codec selectable, ~250k-row row groups
  *    (`:126-133`, `:190-196`)
  *
  * Spark replaces PyArrow's threaded 250k-row batch scanner (`:68-100`)
  * with its task pool; `coalesce(1)` gives the single-file output without a
  * shuffle (it narrows partitions). At 100 TB you would NOT coalesce(1) — a
  * real compaction targets N output files sized to `parquet.block.size`;
  * `compactTo` exposes that as numFiles.
  */
object Compact {

  case class CompactStats(inputFiles: Long, rows: Long, outPath: String)

  /** B8: `--out` dir ⇒ `<dir>/aggregated.parquet`; parquet suffix ⇒ exact. */
  def resolveOut(out: String): String =
    if (out.toLowerCase.endsWith(".parquet") || out.toLowerCase.endsWith(".prq")) out
    else Paths.get(out, "aggregated.parquet").toString

  /** Compaction sized by target output bytes instead of a file count — the
    * real-cluster form: a 100 TB table compacts to ceil(inputBytes/target)
    * files, each near the parquet block size, not to one giant file. */
  def compactToSize(spark: SparkSession, files: Seq[String], out: String,
                    targetBytes: Long = 128L * 1024 * 1024,
                    codec: String = "snappy",
                    overwrite: Boolean = false): CompactStats = {
    val inputBytes = files.map(f => Files.size(Paths.get(f))).sum
    val n = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    compact(spark, files, out, codec, overwrite, sanitizeFirst = false, numFiles = n)
  }

  def compact(spark: SparkSession, files: Seq[String], out: String,
              codec: String = "snappy", overwrite: Boolean = false,
              sanitizeFirst: Boolean = false, numFiles: Int = 1): CompactStats = {
    val target = resolveOut(out)
    if (!overwrite && Files.exists(Paths.get(target)))
      throw new IllegalStateException(
        s"$target exists; pass overwrite=true (aggregate_parquet.py:116-117)")
    // nanos-safe read: TIMESTAMP(NANOS) inputs compact without session conf
    val raw = graft.catalog.ParquetSchema.read(spark, files)
    val df = if (sanitizeFirst) Sanitize.sanitize(raw) else raw
    val rows = df.count()
    df.coalesce(numFiles).write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("compression", codec)
      // ~250k rows/group at the reference's NYC-taxi row width ≈ 128 MB
      .option("parquet.block.size", (128L * 1024 * 1024).toString)
      .parquet(target)
    CompactStats(files.size.toLong, rows, target)
  }
}
