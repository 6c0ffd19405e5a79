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
    // the rewrite derives from THIS snapshot; the overwrite commit
    // carries it so a racing append folds in instead of being erased
    // (GraftCatalog.commitSnapshot's base validation)
    val base = meta.currentSnapshotId
    val currentBytes = meta.filesAsOf(None).map(_.sizeBytes).sum
    val nFiles = math.max(1, math.ceil(currentBytes.toDouble / targetFileBytes).toInt)
    // folds MoR deletes if present, pinned AS OF the claimed base
    val df = cat.readTable(spark, ns, table, asOf = Some(base))
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
        operation = "overwrite", baseSnapshotId = Some(base))
    val outDir = Paths.get(cat.warehouse, ns, table, "data",
      s"optimize-${graft.catalog.Stamp.next()}")
    clustered.write.parquet(outDir.toString)
    val parts = graft.catalog.Fs.list(outDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    cat.registerFiles(ns, table, parts, operation = "overwrite",
      baseSnapshotId = Some(base))
  }

  /** Collapse near-duplicates that LANDED in the committed table — the
    * maintenance companion the streaming near-dup ingester
    * ([[graft.streaming.Streaming.stNeardupCatalog]]) defers to: within
    * one micro-batch only exact dups collapse, so a near-dup pair
    * arriving together lands twice (and a crash between the data and
    * index commits can leave rows under-indexed, letting a later
    * near-dup land). This pass runs the batch dedup-pipeline chain
    * (banded MinHash → exact-Jaccard-verified edges → star-contraction
    * connected components → min-doc_id keeper;
    * [[graft.queries.Extensions.dedupPipelineFrame]]) over the WHOLE
    * committed table and commits ONE overwrite snapshot holding only the
    * keepers — readers before/after see consistent snapshots, time
    * travel still reaches the pre-maintenance state. When the table has
    * `sigs`/`toks` index side tables, they are rebuilt for the keeper
    * set in step, so the per-batch screen keeps joining a
    * representative-only index. O(table) by design — run it off the hot
    * ingest path (exactly like [[optimize]]); at 100 TB the chain is the
    * same banded/bucketed layout the batch pipeline proves sub-linear. */
  def neardupMaintain(spark: SparkSession, cat: GraftCatalog, ns: String,
                      table: String, sigsTable: Option[String] = None,
                      toksTable: Option[String] = None): TableMeta = {
    import graft.queries.Extensions.{dedupPipelineFrame, docTokenSets, docBandRows}
    // the data rewrite derives from THIS snapshot (pinned read below);
    // each index table claims its own base at its rewrite — a streaming
    // ingester's racing append folds into whichever commit it races
    // (data batch + its sigs/toks rows land or fold consistently), and
    // any racing overwrite refuses loudly
    val base = cat.loadTable(ns, table).currentSnapshotId
    val docs = cat.readTable(spark, ns, table, asOf = Some(base))
    val verdict = dedupPipelineFrame(docs.select("doc_id", "text"),
      verify = Some((7, 10)))
    // one keeper compute feeds the data rewrite and both index rebuilds
    val keepers = docs.join(
      verdict.filter(col("keep")).select("doc_id"), Seq("doc_id"))
      .localCheckpoint()
    val stamp = graft.catalog.Stamp.next()
    def rewrite(t: String, df: org.apache.spark.sql.DataFrame): TableMeta = {
      val tBase = if (t == table) base
                  else cat.loadTable(ns, t).currentSnapshotId
      val dir = Paths.get(cat.warehouse, ns, t, "data", s"maintain-$stamp")
      df.write.parquet(dir.toString)
      cat.registerFiles(ns, t, Seq(dir), operation = "overwrite",
        baseSnapshotId = Some(tBase))
    }
    val meta = rewrite(table, keepers)
    val keeperSets = if (sigsTable.isDefined || toksTable.isDefined)
      docTokenSets(keepers).localCheckpoint() else null
    sigsTable.foreach(t => rewrite(t, docBandRows(keeperSets)))
    toksTable.foreach(t => rewrite(t, keeperSets))
    meta
  }
}
