package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row-level CDC changelog (SURVEY L76): per-snapshot-kind emission and
  * the replay law — applying the changelog to empty state reproduces the
  * live table, multiset-exactly. The declared query (meta_changelog)
  * pins the MoR kinds row-for-row against DuckDB; this spec covers the
  * overwrite diff and the composition law the oracle can't see. */
class ChangelogSpec extends SparkSpec {

  private def freshCat(): GraftCatalog = {
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "chg_spec")
    new GraftCatalog(base.resolve("wh").toString)
  }

  private def writeRows(df: org.apache.spark.sql.DataFrame): java.nio.file.Path = {
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "chg_rows")
    df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("p").toString)
    dir.resolve("p")
  }

  test("overwrite emits the file-set diff as delete+insert pairs; untouched files emit nothing") {
    import spark.implicits._
    val cat = freshCat()
    cat.createNamespace("c")
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b = Seq((3L, "c")).toDF("id", "v")
    cat.createTable("c", "t", a.schema)
    cat.registerFiles("c", "t", Seq(writeRows(a)))           // s1: +2
    cat.registerFiles("c", "t", Seq(writeRows(b)))           // s2: +1
    // copy-on-write delete of id=1 rewrites ONLY the file holding it
    graft.etl.Merge.deleteWhere(spark, cat, "c", "t", col("id") === 1L)
    val last = cat.snapshots("c", "t").map(_.id).max
    val chg = cat.readChangelog(spark, "c", "t", 2L, last)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    // the rewrite emits all pre-image rows as deletes and the surviving
    // post-image rows as inserts (CoW changelog semantics)
    assert(chg.count(_._3 == "delete") >= 1 && chg.exists(c =>
      c._1 == 1L && c._3 == "delete"), s"missing the deleted row: ${chg.toSeq}")
    assert(!chg.exists(c => c._1 == 1L && c._3 == "insert"),
      "a copy-on-write-deleted row resurfaced as an insert")
  }

  test("replay law: inserts minus deletes over the full history == the live table, multiset-exactly") {
    import spark.implicits._
    val cat = freshCat()
    cat.createNamespace("c")
    val rows = (1L to 12L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("c", "t", rows.schema)
    cat.registerFiles("c", "t", Seq(writeRows(rows)))
    graft.etl.Merge.deleteWherePos(spark, cat, "c", "t", col("id") % 4 === 0)
    graft.etl.Merge.deleteWhereMor(spark, cat, "c", "t", col("id") === 1L,
      Seq("id"))
    graft.etl.Merge.mergeIntoMor(spark, cat, "c", "t",
      Seq((2L, "v2-new"), (99L, "v99")).toDF("id", "v"), Seq("id"))
    graft.etl.Merge.deleteWhere(spark, cat, "c", "t", col("id") === 3L)
    val last = cat.snapshots("c", "t").map(_.id).max
    val chg = cat.readChangelog(spark, "c", "t", 0L, last)
    // multiset replay: +1 per insert, -1 per delete, per full row value
    val net = chg.groupBy("id", "v")
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("n"))
      .filter(col("n") =!= 0L)
    val live = cat.readTable(spark, "c", "t")
      .groupBy("id", "v").agg(count(lit(1)).as("n"))
    assert(net.exceptAll(live).isEmpty && live.exceptAll(net).isEmpty,
      "changelog does not replay to the live table")
    // ordinals are dense and snapshot-ordered
    val ords = chg.select("_change_ordinal").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ords.head == 1L &&
      ords.toSeq == (ords.head to ords.last).toSeq)
  }

  test("one-commit position upsert: tuples into prior files emit deletes, same-snapshot adds emit inserts") {
    import spark.implicits._
    import graft.catalog.GraftCatalog.{PosFileCol, PosIdxCol}
    val cat = freshCat()
    cat.createNamespace("c")
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("c", "t", rows.schema)
    cat.registerFiles("c", "t", Seq(writeRows(rows)))
    val base = cat.snapshots("c", "t").map(_.id).max
    // the documented legal shape: ONE commit that position-deletes the
    // old version of id=1 and adds its replacement file
    val doomed = cat.readTableWithPositions(spark, "c", "t")
      .filter(col("id") === 1L)
      .select(col(PosFileCol).as("file_path"), col(PosIdxCol).as("pos"))
    val delDir = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "chg_del")
    doomed.coalesce(1).write.mode("overwrite")
      .parquet(delDir.resolve("d").toString)
    cat.commitPositionDeletes("c", "t",
      Seq(delDir.resolve("d")), Seq(writeRows(Seq((1L, "a2")).toDF("id", "v"))))
    val last = cat.snapshots("c", "t").map(_.id).max
    val chg = cat.readChangelog(spark, "c", "t", base, last)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(chg === Set((1L, "a", "delete"), (1L, "a2", "insert")),
      s"position-upsert changelog wrong: $chg")
    // and the table itself agrees
    assert(cat.readTable(spark, "c", "t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a2"), (2L, "b")))
  }

  test("staged WAP snapshots never leak into the changelog; published ones do") {
    import spark.implicits._
    val cat = freshCat()
    cat.createNamespace("c")
    val rows = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("c", "t", rows.schema)
    cat.registerFiles("c", "t", Seq(writeRows(rows)))
    val stagedId = cat.stageAppend("c", "t",
      Seq(writeRows(Seq((2L, "b")).toDF("id", "v"))))
    val last = cat.snapshots("c", "t").map(_.id).max
    val preTypes = cat.readChangelog(spark, "c", "t", 0L, math.max(last, stagedId))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(preTypes === Set(1L), "an unpublished staged append leaked")
    cat.publishSnapshot("c", "t", stagedId)
    val post = cat.readChangelog(spark, "c", "t", 0L, stagedId)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(post === Set(1L, 2L))
  }

  test("a base snapshot folded away by expiration refuses instead of double-counting") {
    import spark.implicits._
    val cat = freshCat()
    cat.createNamespace("c")
    val rows = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("c", "t", rows.schema)
    cat.registerFiles("c", "t", Seq(writeRows(rows)))                 // s1
    cat.registerFiles("c", "t", Seq(writeRows(Seq((2L, "b")).toDF("id", "v")))) // s2
    cat.registerFiles("c", "t", Seq(writeRows(Seq((3L, "c")).toDF("id", "v")))) // s3
    cat.expireSnapshots("c", "t", keepLast = 1)
    val last = cat.snapshots("c", "t").map(_.id).max
    // a consumer who had processed through the (now expired) snapshot 1
    // must be refused — the boundary checkpoint would replay rows 1-2
    // as fresh inserts
    val refused =
      try { cat.readChangelog(spark, "c", "t", 1L, last); false }
      catch { case _: IllegalArgumentException => true }
    assert(refused, "changelog over an expired base must refuse")
    // a FRESH consumer still gets a correct folded-from-empty replay
    val fresh = cat.readChangelog(spark, "c", "t", 0L, last)
    val net = fresh.groupBy("id", "v")
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("n")).filter(col("n") =!= 0L)
    val live = cat.readTable(spark, "c", "t")
      .groupBy("id", "v").agg(count(lit(1)).as("n"))
    assert(net.exceptAll(live).isEmpty && live.exceptAll(net).isEmpty)
  }

  test("empty range yields an empty frame with the changelog schema") {
    import spark.implicits._
    val cat = freshCat()
    cat.createNamespace("c")
    val rows = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("c", "t", rows.schema)
    cat.registerFiles("c", "t", Seq(writeRows(rows)))
    val chg = cat.readChangelog(spark, "c", "t", 1L, 1L)
    assert(chg.count() === 0L)
    assert(chg.columns.toSeq === Seq("id", "v", "_change_type", "_change_ordinal"))
  }
}
