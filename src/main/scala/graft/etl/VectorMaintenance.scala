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
    cat.registerFiles(ns, t, Seq(dir), operation = "overwrite")
  }
}
