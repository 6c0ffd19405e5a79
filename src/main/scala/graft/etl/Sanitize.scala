package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's sanitize rules (SURVEY.md §2.B, B1-B4), re-expressed as
  * one codegen'd projection (`/root/reference/sanitize_parquet.py:17-71`;
  * batch form `aggregate_parquet.py:20-66`):
  *
  *  1. UINT64 → DECIMAL(20,0) for every top-level unsigned-64 column
  *     (`sanitize_parquet.py:56-61`). Spark's parquet reader already
  *     surfaces UINT64 as DecimalType(20,0), so the rule normalizes any
  *     caller-declared unsigned LongType columns the same way.
  *  2. A column literally named `timestamp` holding epoch MICROSECONDS as
  *     UINT64 or DECIMAL(p>=18,0) → TIMESTAMP, via an int64 hop
  *     (`sanitize_parquet.py:40-54`).
  *
  * Column order, nullability and metadata are preserved field-by-field
  * (`sanitize_parquet.py:29-37`, B3). At 100 TB this is a zero-shuffle
  * map-only rewrite — the same reason the reference streams it in
  * 250k-row batches.
  */
object Sanitize {

  /** Timestamp-rule source test (`sanitize_parquet.py:44-49`): uint64-ish
    * or decimal with scale 0, precision >= 18. */
  private def tsEligible(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.scale == 0 && d.precision >= 18
    case LongType       => true
    case _              => false
  }

  private def uint64Like(name: String, dt: DataType, unsignedHints: Set[String]) =
    dt match {
      case d: DecimalType => d.precision == 20 && d.scale == 0
      case LongType       => unsignedHints.contains(name)
      case _              => false
    }

  /** One changed-column report entry (B4): (name, from, to). */
  case class CastReport(column: String, fromType: String, toType: String)

  /** Compute the target column expressions + report without touching data —
    * the `--dry-run` path (`sanitize_parquet.py:113`, `:126-143`). */
  def plan(df: DataFrame, unsignedHints: Set[String] = Set.empty)
      : (Seq[Column], Seq[CastReport]) = {
    val colsAndReports = df.schema.fields.map { f =>
      if (f.name.toLowerCase == "timestamp" && tsEligible(f.dataType)) {
        // uint64/decimal epoch-µs → int64 hop → timestamp (sanitize_parquet.py:50-54)
        (timestamp_micros(col(f.name).cast(LongType)).as(f.name, f.metadata),
          Some(CastReport(f.name, f.dataType.simpleString, "timestamp")))
      } else if (uint64Like(f.name, f.dataType, unsignedHints) &&
                 f.dataType != DecimalType(20, 0)) {
        (col(f.name).cast(DecimalType(20, 0)).as(f.name, f.metadata),
          Some(CastReport(f.name, f.dataType.simpleString, "decimal(20,0)")))
      } else (col(f.name), None)
    }
    (colsAndReports.map(_._1).toSeq, colsAndReports.flatMap(_._2).toSeq)
  }

  /** Apply the rules (B1-B3). */
  def sanitize(df: DataFrame, unsignedHints: Set[String] = Set.empty): DataFrame = {
    val (cols, _) = plan(df, unsignedHints)
    df.select(cols: _*)
  }

  /** Changed-column report as a DataFrame (B4). */
  def report(df: DataFrame, unsignedHints: Set[String] = Set.empty): DataFrame = {
    val (_, reps) = plan(df, unsignedHints)
    val spark = df.sparkSession
    import spark.implicits._
    reps.map(r => (r.column, r.fromType, r.toType))
      .toDF("column_name", "from_type", "to_type")
  }

  /** Per-file outcome of [[sanitizeTree]] (the reference's per-file result
    * dict, `sanitize_parquet.py:78-102`). */
  case class TreeFileResult(relPath: String, written: Boolean,
                            casts: Seq[CastReport])

  /** B5: mirror-tree sanitize — the reference CLI's main loop
    * (`sanitize_parquet.py:126-143`): walk `inRoot` recursively for
    * `.parquet`/`.prq`, and for each file that the cast rules would CHANGE,
    * write the sanitized copy to `outRoot/<relative path>`; unchanged files
    * are skipped entirely (written=false, no output file). `dryRun` reports
    * without writing (`:113`); an existing destination is refused unless
    * `overwrite` (`:86-87`).
    *
    * Each file is one file in → one file out, like the reference — but the
    * rewrite itself is a distributed Spark job, so a single huge file still
    * parallelizes. For a TABLE-level sanitize at 100 TB use [[sanitize]] on
    * the whole scan and let Spark choose output parallelism; the per-file
    * mirror exists for tree-layout fidelity, not throughput. */
  def sanitizeTree(spark: org.apache.spark.sql.SparkSession,
                   inRoot: String, outRoot: String,
                   dryRun: Boolean = false, overwrite: Boolean = false,
                   codec: String = "snappy",
                   unsignedHints: Set[String] = Set.empty): Seq[TreeFileResult] = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import graft.catalog.Fs
    val in = Paths.get(inRoot)
    require(Files.isDirectory(in), s"input directory not found: $inRoot")
    // a mirror nested inside the source (or vice versa) would make a second
    // invocation walk its own previous output as input — refuse up front
    val inAbs = in.toAbsolutePath.normalize
    val outAbs = Paths.get(outRoot).toAbsolutePath.normalize
    require(!outAbs.startsWith(inAbs) && !inAbs.startsWith(outAbs),
      s"outRoot and inRoot must be disjoint trees: $inAbs vs $outAbs")
    val files: Seq[Path] = Fs.regularFiles(in, Seq(".parquet", ".prq"))
    files.map { src =>
      val rel = in.relativize(src)
      val df = graft.catalog.ParquetSchema.read(spark, Seq(src.toString))
      val (cols, reps) = plan(df, unsignedHints)
      if (reps.isEmpty || dryRun) TreeFileResult(rel.toString, written = false, reps)
      else {
        val dst = Paths.get(outRoot).resolve(rel)
        if (Files.exists(dst) && !overwrite)
          throw new IllegalStateException(
            s"won't overwrite existing file: $dst (sanitize_parquet.py:86-87)")
        Files.createDirectories(dst.getParent)
        // one file in → one file out: write via a temp dir, move the part
        val tmp = Files.createTempDirectory(dst.getParent, s".${dst.getFileName}")
        df.select(cols: _*).coalesce(1).write.mode("overwrite")
          .option("compression", codec).parquet(tmp.toString)
        val part = Fs.list(tmp)
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
        Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
        Fs.deleteRecursively(tmp)
        TreeFileResult(rel.toString, written = true, reps)
      }
    }
  }
}
