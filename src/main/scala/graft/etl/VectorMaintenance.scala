package graft.etl

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.catalog.{GraftCatalog, TableMeta}
import graft.operators.IvfPq

/** Maintenance for the persisted ANN index ([[graft.operators.IvfPq]]) —
  * the compaction half of the lifecycle (build = `IvfPq.buildIndex`,
  * grow = `IvfPq.appendCodes` / `st_vec_index_maintain`, probe =
  * `IvfPq.search`, COMPACT = here). Two kinds of debt accumulate on the
  * codes table as the index lives:
  *
  *  - SMALL FILES: every append snapshot writes its own cell-range-
  *    clustered files, so after B appends a probe of one cell reads ~B
  *    files instead of 1 — the manifest still prunes correctly, but the
  *    per-probe file count grows with ingest history, not data volume.
  *  - DELETE DEBT: corpus deletes (opt-outs, takedowns) reach the index
  *    as merge-on-read position-delete tombstones
  *    ([[Merge.deleteWherePos]]); every probe pays a broadcast
  *    anti-join until the files are rewritten.
  *
  * [[compactIndex]] pays both down in ONE linear pass — read the live
  * state (tombstones applied), re-cluster by cell, commit one overwrite
  * snapshot — restoring the ~1-file-per-cell layout and dropping the
  * delete files from the state fold entirely. O(index) = O(N × 8 bytes),
  * run off the hot probe path like [[Maintenance.optimize]]; time travel
  * still reaches every pre-compaction snapshot.
  *
  * Compaction is safe to run CONCURRENTLY with a maintaining stream:
  * [[IvfPq.appendCodesBatch]]'s replay detection scans the full snapshot
  * LOG, so a compaction overwrite landing between a batch's commit and
  * the stream's checkpoint doesn't make a crash-replay double-append.
  * Snapshot EXPIRATION ([[graft.catalog.GraftCatalog]] expire) is the
  * one operation that must NOT run while the stream is mid-replay — it
  * drops the log entries the replay check reads; expire only while the
  * maintaining stream is quiescent (checkpoint caught up). */
object VectorMaintenance {

  /** Rewrite `<table>_ivfpq_codes` into its canonical layout: live rows
    * only (position-delete debt applied by the catalog read),
    * range-clustered by `cell` so each of the ≤ k output files covers a
    * contiguous cell range and the manifest's per-file min/max prunes
    * probes back to ~1 file per probed cell. k is the index's OWN cell
    * count, read back from the committed `_ivfpq_cells` table (the
    * √N-sized layout [[IvfPq.cellsFor]] chose at build time — never a
    * constant). One overwrite snapshot, stamped with `nanoTime` like
    * every other index commit path (a millisecond stamp collides when
    * two compactions land inside 1 ms); returns the new codes-table
    * meta. */
  def compactIndex(spark: SparkSession, cat: GraftCatalog, ns: String,
                   table: String): TableMeta = {
    val t = s"${table}_ivfpq_codes"
    val k = cat.readTable(spark, ns, s"${table}_ivfpq_cells").count().toInt
    val live = cat.readTable(spark, ns, t)
    val dir = Paths.get(cat.warehouse, ns, t, "data",
      s"compact-${System.nanoTime()}")
    live.repartitionByRange(k, col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .write.parquet(dir.toString)
    val meta = cat.registerFiles(ns, t, Seq(dir), operation = "overwrite")
    // the raw re-rank store pays down the same two debts when present:
    // per-batch file accretion (re-cluster to ≤k cell files, restoring
    // augmentation's pruning parity with the codes) and — the RTBF
    // half — raw vectors of TOMBSTONED ids, which no search can surface
    // (the shortlist excludes them) but which a right-to-be-forgotten
    // deployment must physically purge: the semi-join keeps only ids
    // still live in the compacted codes. One linear pass, off the hot
    // probe path like the codes rewrite above.
    val rT = graft.operators.IvfPq.rawTable(table)
    if (cat.tableExists(ns, rT)) {
      val rawDir = Paths.get(cat.warehouse, ns, rT, "data",
        s"compact-${System.nanoTime()}")
      cat.readTable(spark, ns, rT)
        .join(cat.readTable(spark, ns, t).select("vec_id"),
          Seq("vec_id"), "left_semi")
        .repartitionByRange(k, col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.parquet(rawDir.toString)
      cat.registerFilesWithBlooms(spark, ns, rT, Seq(rawDir),
        Seq("vec_id"), operation = "overwrite")
    }
    meta
  }
}
