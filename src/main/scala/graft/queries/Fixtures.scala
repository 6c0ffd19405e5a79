package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

import graft.catalog.Fs

/** Warehouse CLONING for bench fixtures that the measured operator
  * MUTATES (compaction, rebuild, maintenance): the pristine committed
  * state is built ONCE per (JVM, sfDir) — the zorderFixture /
  * vecRebuildFx convention — and each run receives a byte-identical
  * private copy to mutate, so repeated bench iterations measure the
  * OPERATOR (the thing the query declares) instead of re-paying the
  * fixture's train/encode/commit tax, while staying scenario-identical:
  * same snapshots, same file stats, same tombstones, same answers.
  *
  * A straight file copy is not enough, because two layers of the
  * catalog record ABSOLUTE paths:
  *
  *  - every metadata JSON's `addedFiles[].path` / `deletes[].path` /
  *    `bloomPath` entries — rewritten with a plain prefix replace (the
  *    warehouse prefix can't occur inside any other JSON value: stamps
  *    and table names never contain the temp-dir prefix);
  *  - every bloom SIDECAR keys its rows by the data file's canonical
  *    path INSIDE the sidecar parquet ([[graft.catalog.BloomIndex]]) —
  *    each sidecar is re-written with the prefix replaced (one tiny
  *    single-partition job over ≤files rows per sidecar; the sort-by-
  *    (file, column) layout the lookup's pushdown relies on is
  *    restored). A missed rewrite would not corrupt results — lookups
  *    are conservative (no sidecar row ⇒ file kept) — but it would
  *    silently disable the pruning the fixture exists to exercise, so
  *    the clone rewrites rather than relying on that.
  */
object Fixtures {

  /** Copy the warehouse tree at `src` into `dst` and re-point every
    * recorded absolute path from `src`'s prefix to `dst`'s. */
  def cloneWarehouse(s: SparkSession, src: Path, dst: Path): Unit = {
    val srcAbs = src.toAbsolutePath.toString
    val dstAbs = dst.toAbsolutePath.toString
    Fs.walk(src).foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t)
      }
    }
    Fs.regularFiles(dst, Seq(".json", ".text")).foreach { j =>
      val txt = Files.readString(j)
      if (txt.contains(srcAbs))
        Files.writeString(j, txt.replace(srcAbs, dstAbs))
    }
    val sidecars = Fs.walk(dst).filter(p => Files.isDirectory(p) &&
      p.getFileName.toString.startsWith("bloom-"))
    sidecars.foreach { bd =>
      val tmp = bd.resolveSibling(bd.getFileName.toString + ".rewrite")
      s.read.parquet(bd.toString)
        .withColumn("file",
          expr(s"replace(file, '$srcAbs/', '$dstAbs/')"))
        .repartition(1).sortWithinPartitions("file", "column")
        .write.parquet(tmp.toString)
      Fs.deleteRecursively(bd)
      Files.move(tmp, bd)
      ()
    }
  }
}
