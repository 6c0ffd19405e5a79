package graft.catalog

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Closed-stream filesystem helpers. `Files.walk`/`Files.list` return
  * lazy streams backed by an open directory descriptor; iterating without
  * closing leaks the FD until GC, which exhausts the process limit on
  * large trees. Every caller in graft goes through these, which drain the
  * stream to a strict Seq inside a `Using` block so the descriptor closes
  * deterministically. */
object Fs {
  /** Direct children of `dir`, sorted. Closes the directory stream. */
  def list(dir: Path): Seq[Path] =
    Using.resource(Files.list(dir))(_.iterator.asScala.toSeq.sortBy(_.toString))

  /** `dir` and everything under it, sorted. Closes the walk stream.
    * Strict: holds every path on the driver — right for warehouse trees
    * (file counts bounded by snapshot metadata). For landing zones that
    * may hold millions of entries, use [[walkForeach]] instead. */
  def walk(dir: Path): Seq[Path] =
    Using.resource(Files.walk(dir))(_.iterator.asScala.toSeq.sortBy(_.toString))

  /** Streaming walk: processes entries inside the `Using` block without
    * materializing the tree (encounter order, not sorted) — O(depth)
    * memory for arbitrarily large trees, FD still closed
    * deterministically. */
  def walkForeach[T](dir: Path)(f: Iterator[Path] => T): T =
    Using.resource(Files.walk(dir))(st => f(st.iterator.asScala))

  /** Delete `dir` and everything under it (children before parents). */
  def deleteRecursively(dir: Path): Unit =
    walk(dir).reverse.foreach(Files.deleteIfExists(_))

  /** Regular files under `root` (recursive) whose lower-cased name ends
    * with one of `suffixes`, sorted for deterministic processing order. */
  def regularFiles(root: Path, suffixes: Seq[String]): Seq[Path] =
    walk(root).filter { p =>
      val n = p.getFileName.toString.toLowerCase
      Files.isRegularFile(p) && suffixes.exists(n.endsWith)
    }
}
