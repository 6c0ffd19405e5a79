package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.functions._

/** Maintenance.optimize: compaction, MoR-debt payoff, clustering, and
  * time travel across the maintenance commit. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): GraftCatalog = {
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "maint")
    val dataDir = base.resolve("in"); Files.createDirectories(dataDir)
    // 8 tiny files of 64 rows each
    (1 to 512).map(i => (i.toLong, (i % 97).toLong, i * 1.5))
      .toDF("id", "grp", "score")
      .repartition(8).write.parquet(dataDir.resolve("t").toString)
    val cat = new GraftCatalog(base.resolve("wh").toString)
    cat.importFolders(spark, dataDir.toString)
    cat
  }

  test("optimize compacts small files and preserves every row") {
    val cat = setup()
    assert(cat.files("nyc", "t").size === 8)
    val before = cat.readTable(spark, "nyc", "t")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    Maintenance.optimize(spark, cat, "nyc", "t", targetFileBytes = Long.MaxValue)
    assert(cat.files("nyc", "t").size === 1)
    val after = cat.readTable(spark, "nyc", "t")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(after === before)
    assert(cat.snapshots("nyc", "t").last.operation === "overwrite")
    assert(cat.readTable(spark, "nyc", "t", asOf = Some(1L)).count() === 512)
  }

  test("optimize pays down merge-on-read debt in the same pass") {
    val cat = setup()
    Merge.deleteWhereMor(spark, cat, "nyc", "t", col("id") <= 12L, Seq("id"))
    assert(cat.loadTable("nyc", "t").deleteFilesAsOf(None).nonEmpty)
    Maintenance.optimize(spark, cat, "nyc", "t", targetFileBytes = Long.MaxValue)
    assert(cat.loadTable("nyc", "t").deleteFilesAsOf(None).isEmpty)
    assert(cat.readTable(spark, "nyc", "t").count() === 500)
  }

  test("clusterBy one column narrows per-file ranges; skipping improves") {
    val cat = setup()
    // force ~4 output files, range-clustered on id
    val bytes = cat.files("nyc", "t").map(_.sizeBytes).sum
    Maintenance.optimize(spark, cat, "nyc", "t",
      targetFileBytes = bytes / 4, clusterBy = Seq("id"))
    val files = cat.files("nyc", "t")
    assert(files.size >= 3)
    // a narrow id predicate must keep fewer files than exist
    val kept = cat.filesForScan("nyc", "t", "id", 1, 64)
    assert(kept.size < files.size)
    assert(cat.readTableWhere(spark, "nyc", "t", "id", 1, 64)
      .filter(col("id") <= 64).count() === 64)
  }

  test("clusterBy two columns z-orders: both dimensions skip") {
    val cat = setup()
    val bytes = cat.files("nyc", "t").map(_.sizeBytes).sum
    Maintenance.optimize(spark, cat, "nyc", "t",
      targetFileBytes = bytes / 8, clusterBy = Seq("id", "grp"))
    val total = cat.files("nyc", "t").size
    val keptId = cat.filesForScan("nyc", "t", "id", 1, 100).size
    val keptGrp = cat.filesForScan("nyc", "t", "grp", 0, 20).size
    assert(total >= 6)
    assert(keptId < total)
    assert(keptGrp < total)
  }
}
