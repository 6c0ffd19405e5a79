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
    * constant). One overwrite snapshot, stamped through the shared
    * collision-safe [[graft.catalog.Stamp]] like every other index
    * commit path; returns the new codes-table meta. */
  /** `interleave`: a DETERMINISTIC race seam for specs — runs after the
    * rewrite derived and wrote its files, immediately before the
    * overwrite commit (the exact window a streaming append races into).
    * Production callers leave the default no-op; the spec lands a real
    * append inside it and proves the base-folded commit keeps every
    * row — the threaded race spec then covers the nondeterministic
    * schedules on top. */
  def compactIndex(spark: SparkSession, cat: GraftCatalog, ns: String,
                   table: String,
                   interleave: () => Unit = () => ()): TableMeta = {
    val t = s"${table}_ivfpq_codes"
    // k = the committed cells-table ROW count — the manifest's per-file
    // footer row counts already carry it exactly (the L19 metadata-only
    // aggregate), so no Spark job scans k rows just to count them
    val k = cat.loadTable(ns, s"${table}_ivfpq_cells")
      .filesAsOf(None).map(_.rowCount).sum.toInt
    // pin the DERIVATION BASE and read AS OF it: the overwrite commit
    // carries the base snapshot id, so a streaming append racing this
    // compaction folds its files into the commit (no row lost whichever
    // side wins) instead of being silently erased by a pre-computed
    // file list landing on a moved log — and a racing non-append
    // refuses loudly (ConcurrentOverwriteException) for the caller to
    // re-derive. Reading AS OF the base (not "current") makes the
    // rewritten rows and the claimed base the same state by
    // construction, however long the rewrite job runs.
    val base = cat.loadTable(ns, t).currentSnapshotId
    // pre-compaction code files (for the raw purge's tombstone diff below)
    val codeFiles = cat.loadTable(ns, t).filesAsOf(Some(base))
    // persisted: the live (tombstone-applied) state feeds THREE passes —
    // the range-boundary sketch, the rewrite shuffle, and the raw purge's
    // except below — and each would otherwise re-read the files and
    // re-fold the delete debt ("one linear pass" must mean one)
    val live = cat.readTable(spark, ns, t, asOf = Some(base)).persist()
    try {
      val dir = Paths.get(cat.warehouse, ns, t, "data",
        s"compact-${graft.catalog.Stamp.next()}")
      live.repartitionByRange(k, col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.parquet(dir.toString)
      interleave()
      val meta = cat.registerFiles(ns, t, Seq(dir), operation = "overwrite",
        baseSnapshotId = Some(base))
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
        // the raw rewrite pins ITS OWN base the same way. The RTBF purge
        // removes exactly the ids the codes table TOMBSTONED — physical
        // rows in the pre-compaction code files minus the live (debt-
        // applied) rows — via an anti-join, NEVER "ids not currently in
        // codes": a concurrent appendCodes that has landed its raw half
        // but not yet its codes half would look exactly like a tombstone
        // to a keep-only-codes-live semi-join, and purging it would trip
        // every later search's sync guard ("raw store fell behind")
        // permanently. Orphan raw rows (a crashed append that never
        // re-ran) survive as the documented harmless superset.
        val doomed = {
          val files = codeFiles.map(_.path)
          if (files.isEmpty) live.select("vec_id").limit(0)
          // SET difference (except, not exceptAll): an id is doomed only
          // if NO live row carries it — a historical duplicate code row
          // must not mark a live id as tombstoned
          else spark.read.parquet(files: _*).select("vec_id")
            .except(live.select("vec_id"))
        }
        val rawBase = cat.loadTable(ns, rT).currentSnapshotId
        val rawDir = Paths.get(cat.warehouse, ns, rT, "data",
          s"compact-${graft.catalog.Stamp.next()}")
        // pinned before the range shuffle (the [[IvfPq.encode]] rationale):
        // the boundary sketch would otherwise re-read the raw store and
        // re-run the anti-join a second time
        cat.readTable(spark, ns, rT, asOf = Some(rawBase))
          .join(doomed, Seq("vec_id"), "left_anti")
          .localCheckpoint(true)
          .repartitionByRange(k, col("cell"))
          .sortWithinPartitions("cell", "vec_id")
          .write.parquet(rawDir.toString)
        cat.registerFilesWithBlooms(spark, ns, rT, Seq(rawDir),
          Seq("vec_id"), operation = "overwrite",
          baseSnapshotId = Some(rawBase))
      }
      meta
    } finally { live.unpersist(); () }
  }
}
