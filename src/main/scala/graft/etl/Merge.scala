package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.catalog.{GraftCatalog, TableMeta}

/** DataFrame-native MERGE / UPDATE / DELETE over the catalog — the
  * DML-equivalent surface the reference enables through Iceberg's session
  * extensions (`/root/reference/conf/spark-defaults.conf:1`;
  * `entrypoint-spark.sh:85`), re-expressed as plan-level joins + an
  * overwrite snapshot (SURVEY.md §7.5):
  *
  *  - MERGE INTO t USING s ON keys WHEN MATCHED UPDATE * WHEN NOT MATCHED
  *    INSERT * ≡ (t ANTI-JOIN s on keys) UNION ALL s
  *  - DELETE WHERE p ≡ keep rows with NOT p
  *
  * Both rewrite the table into fresh parquet under the table's own
  * `data/` dir and commit ONE overwrite snapshot, so readers see the change
  * atomically and time travel still reaches every earlier snapshot. At
  * scale the anti-join broadcasts when the source is small, and Iceberg's
  * real copy-on-write MERGE does exactly this file rewrite (merge-on-read
  * is a different trade we don't need for parity).
  */
object Merge {

  private def rewrite(spark: SparkSession, cat: GraftCatalog, ns: String,
                      table: String, next: DataFrame,
                      base: Long): TableMeta = {
    val outDir = Paths.get(cat.warehouse, ns, table, "data",
      s"rewrite-${graft.catalog.Stamp.next()}")
    next.write.parquet(outDir.toString)
    val parts = graft.catalog.Fs.list(outDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    // the overwrite carries its derivation base: a racing append folds
    // in (no row lost), a racing non-append refuses loudly instead of
    // being silently erased by this pre-computed file list
    cat.registerFiles(ns, table, parts, operation = "overwrite",
      baseSnapshotId = Some(base))
  }

  /** Upsert: source rows replace matched target rows and add unmatched. */
  def mergeInto(spark: SparkSession, cat: GraftCatalog, ns: String,
                table: String, source: DataFrame, keys: Seq[String]): TableMeta = {
    val base = cat.loadTable(ns, table).currentSnapshotId
    val target = cat.readTable(spark, ns, table, asOf = Some(base))
    val merged = target.join(source, keys, "left_anti")
      .unionByName(source.select(target.columns.map(col).toSeq: _*))
    rewrite(spark, cat, ns, table, merged, base)
  }

  /** DELETE WHERE cond — removes only rows where `cond` is TRUE. Rows where
    * it evaluates NULL survive (SQL three-valued logic: `filter(!cond)` alone
    * would silently delete them, and would disagree with [[deleteWhereMor]],
    * whose positive `filter(cond)` already keeps NULL rows). */
  def deleteWhere(spark: SparkSession, cat: GraftCatalog, ns: String,
                  table: String, cond: org.apache.spark.sql.Column): TableMeta = {
    val base = cat.loadTable(ns, table).currentSnapshotId
    val target = cat.readTable(spark, ns, table, asOf = Some(base))
    rewrite(spark, cat, ns, table,
      target.filter(!org.apache.spark.sql.functions.coalesce(cond, org.apache.spark.sql.functions.lit(false))),
      base)
  }

  // ---------------------------------------------------------- merge-on-read

  private def writeAux(cat: GraftCatalog, ns: String, table: String,
                       kind: String, df: DataFrame): java.nio.file.Path = {
    val dir = Paths.get(cat.warehouse, ns, table, "data",
      s"$kind-${graft.catalog.Stamp.next()}")
    df.write.parquet(dir.toString)
    dir
  }

  /** Merge-on-read DELETE WHERE: writes ONLY the key values of the doomed
    * rows as an equality-delete file and commits one "delete" snapshot.
    * Write cost O(deleted rows); no data file is touched. Readers apply the
    * delete as a broadcast anti-join until the table is [[materialize]]d —
    * the copy-on-write [[deleteWhere]] makes the opposite trade (O(table)
    * write, zero read overhead). Iceberg v2's equality-delete semantics. */
  def deleteWhereMor(spark: SparkSession, cat: GraftCatalog, ns: String,
                     table: String, cond: org.apache.spark.sql.Column,
                     keys: Seq[String]): TableMeta = {
    // derive AND commit against one pinned snapshot: the key set is a
    // function of rows read at `base`, so the commit carries it — a
    // racing overwrite (whose rewrite may have changed the rows `cond`
    // selected) refuses instead of landing a stale-value delete
    val base = cat.loadTable(ns, table).currentSnapshotId
    val doomed = cat.readTable(spark, ns, table, asOf = Some(base))
      .filter(cond).select(keys.map(col): _*).distinct()
    val delDir = writeAux(cat, ns, table, "delete", doomed)
    cat.commitMergeOnRead(ns, table, keys, Seq(delDir),
      baseSnapshotId = Some(base))
  }

  /** Merge-on-read upsert: ONE atomic snapshot carrying (a) an equality
    * delete of every source key — wiping stale versions of matched rows
    * from earlier files — and (b) the full source as a new data file. Cost
    * is O(source), never O(table).
    *
    * Deliberately commits WITHOUT a derivation base: unlike
    * [[deleteWhereMor]]/[[deleteWherePos]], no tuple here is derived from
    * target ROWS (the delete keys and data come from the source; only the
    * column list comes from the target's schema), so a racing overwrite
    * invalidates nothing — the equality delete still kills every earlier
    * version of each key, compacted files included, and the upsert's
    * last-writer-wins is the contract. Refusing on a racing compaction
    * would cost availability for no correctness. */
  def mergeIntoMor(spark: SparkSession, cat: GraftCatalog, ns: String,
                   table: String, source: DataFrame, keys: Seq[String]): TableMeta = {
    val target = cat.readTable(spark, ns, table)
    val delDir = writeAux(cat, ns, table, "delete", source.select(keys.map(col): _*).distinct())
    val dataDir = writeAux(cat, ns, table, "merge",
      source.select(target.columns.map(col).toSeq: _*))
    cat.commitMergeOnRead(ns, table, keys, Seq(delDir), Seq(dataDir))
  }

  /** Merge-on-read DELETE WHERE, POSITION-delete shape (Iceberg v2's other
    * delete encoding): scan with row positions, filter, and write only the
    * `(file_path, pos)` tuples of the doomed rows. Compared to
    * [[deleteWhereMor]] this copies NO key values (two slim columns however
    * wide the table is) and needs no identity columns at all — the physical
    * position is the identity. Stacked position deletes compose: the scan
    * applies existing debt first, so already-deleted positions are never
    * re-emitted, and the surviving rows keep their ORIGINAL file positions
    * through the anti-join. An overwrite (compaction/materialize) replaces
    * the file set, after which prior delete files simply stop participating
    * in the state fold — positions can never dangle. */
  def deleteWherePos(spark: SparkSession, cat: GraftCatalog, ns: String,
                     table: String, cond: org.apache.spark.sql.Column): TableMeta = {
    import graft.catalog.GraftCatalog.{PosFileCol, PosIdxCol}
    // the tuples name PHYSICAL files read at `base` — a racing overwrite
    // (compaction/materialize/CoW DML) would orphan every tuple and the
    // delete would silently no-op (row resurrection); the commit carries
    // the base so that race refuses loudly instead
    val base = cat.loadTable(ns, table).currentSnapshotId
    val doomed = cat.readTableWithPositions(spark, ns, table,
        asOf = Some(base)).filter(cond)
      .select(col(PosFileCol).as("file_path"), col(PosIdxCol).as("pos"))
    val delDir = writeAux(cat, ns, table, "posdelete", doomed)
    cat.commitPositionDeletes(ns, table, Seq(delDir),
      baseSnapshotId = Some(base))
  }

  /** Pay down merge-on-read debt: materialize the current state into fresh
    * parquet and commit one overwrite snapshot. Subsequent reads take the
    * single-scan fast path again; earlier snapshots stay time-travelable. */
  def materialize(spark: SparkSession, cat: GraftCatalog, ns: String,
                  table: String): TableMeta = {
    val base = cat.loadTable(ns, table).currentSnapshotId
    rewrite(spark, cat, ns, table,
      cat.readTable(spark, ns, table, asOf = Some(base)), base)
  }
}
