package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.functions._

/** MERGE / DELETE as overwrite snapshots (SURVEY.md §7.5): atomicity of the
  * file-set swap, source-wins matching, and time travel across DML.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def setup() = {
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "merge_spec")
    val dataDir = base.resolve("in"); Files.createDirectories(dataDir)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
      .coalesce(1).write.parquet(dataDir.resolve("t").toString)
    val cat = new GraftCatalog(base.resolve("wh").toString)
    cat.importFolders(spark, dataDir.toString)
    cat
  }

  test("mergeInto: matched rows take source values, unmatched source inserts") {
    val cat = setup()
    val source = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "score")
    Merge.mergeInto(spark, cat, "nyc", "t", source, Seq("id"))
    val rows = cat.readTable(spark, "nyc", "t")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "b2", 22.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
    // time travel reaches the pre-merge state
    assert(cat.readTable(spark, "nyc", "t", asOf = Some(1L)).count() === 3)
    assert(cat.snapshots("nyc", "t").map(_.operation) === Seq("append", "overwrite"))
  }

  test("deleteWhere removes exactly the matching rows in one snapshot") {
    val cat = setup()
    Merge.deleteWhere(spark, cat, "nyc", "t", col("score") >= 20.0)
    val rows = cat.readTable(spark, "nyc", "t")
      .select("id").as[Long].collect().toSeq
    assert(rows === Seq(1L))
    assert(cat.readTable(spark, "nyc", "t", asOf = Some(1L)).count() === 3)
  }

  test("overwrite resets the file set; later appends accumulate on top of it") {
    val cat = setup()
    Merge.deleteWhere(spark, cat, "nyc", "t", col("id") === 1L) // snapshot 2
    val f2 = cat.files("nyc", "t")
    // append snapshot-2's own files again as snapshot 3 ⇒ doubles post-DML state
    cat.registerFiles("nyc", "t", f2.map(f => Paths.get(f.path)))
    assert(cat.readTable(spark, "nyc", "t").count() === 4) // 2 rows × 2
    assert(cat.readTable(spark, "nyc", "t", asOf = Some(2L)).count() === 2)
    assert(cat.readTable(spark, "nyc", "t", asOf = Some(1L)).count() === 3)
  }
}
