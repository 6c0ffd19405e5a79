package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{GraftCatalog, TableMeta}

/** Table maintenance — Iceberg's `rewriteDataFiles` re-expressed: ONE
  * overwrite snapshot that simultaneously
  *
  *  - compacts small files to a target size (many-small-files is the
  *    classic death of a 100 TB streaming-ingested table: per-file open
  *    cost and scheduler pressure grow linearly with file count),
  *  - pays down merge-on-read delete debt (the rewrite reads through
  *    [[GraftCatalog.readTable]]'s fold, so delete files stop being needed),
  *  - optionally re-clusters: 1 column → range sort (1-D skipping),
  *    2 columns → z-order ([[Layout.zValue]]) or Hilbert
  *    ([[Layout.withHilbertValue]], `curve = "hilbert"`) — both give 2-D
  *    skipping; the Hilbert curve's lack of diagonal jumps keeps per-file
  *    ranges slightly tighter.
  *
  * Readers before/after the commit see consistent snapshots; time travel
  * still reaches every pre-maintenance state. Run it off the hot path —
  * the rewrite is O(table), which is exactly why MoR defers it.
  */
object Maintenance {

  def optimize(spark: SparkSession, cat: GraftCatalog, ns: String, table: String,
               targetFileBytes: Long = 512L * 1024 * 1024,
               clusterBy: Seq[String] = Nil,
               curve: String = "zorder"): TableMeta = {
    require(clusterBy.size <= 2, "clusterBy supports at most 2 columns")
    require(curve == "zorder" || curve == "hilbert",
      s"curve must be zorder or hilbert, got $curve")
    val meta = cat.loadTable(ns, table)
    val currentBytes = meta.filesAsOf(None).map(_.sizeBytes).sum
    val nFiles = math.max(1, math.ceil(currentBytes.toDouble / targetFileBytes).toInt)
    val df = cat.readTable(spark, ns, table) // folds MoR deletes if present
    val clustered = clusterBy match {
      case Nil => df.repartition(nFiles)
      case Seq(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case Seq(a, b) =>
        val st = df.agg(min(a), max(a), min(b), max(b)).head()
        val indexed =
          if (curve == "hilbert") Layout.withHilbertValue(df,
            Layout.normToHilbertGrid(col(a), st.getLong(0), st.getLong(1)),
            Layout.normToHilbertGrid(col(b), st.getLong(2), st.getLong(3)), "__z")
          else df.withColumn("__z", Layout.zValue(
            Layout.normTo16Bits(col(a), st.getLong(0), st.getLong(1)),
            Layout.normTo16Bits(col(b), st.getLong(2), st.getLong(3))))
        indexed.repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions("__z").drop("__z")
    }
    // a partitioned table keeps its layout: the rewrite goes back through
    // the partition-clustered write so every new file carries its tuple
    // (otherwise materialization would silently degrade partition pruning
    // to stats-only until the next partitioned append)
    if (meta.spec.nonEmpty && clusterBy.isEmpty)
      return cat.writePartitioned(spark, ns, table, clustered,
        operation = "overwrite")
    val outDir = Paths.get(cat.warehouse, ns, table, "data",
      s"optimize-${System.currentTimeMillis()}")
    clustered.write.parquet(outDir.toString)
    val parts = graft.catalog.Fs.list(outDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    cat.registerFiles(ns, table, parts, operation = "overwrite")
  }
}
