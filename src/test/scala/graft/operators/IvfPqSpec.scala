package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The IVF+PQ index operator behind q_vec_knn_ivfpq: deterministic
  * coarse training, the range-clustered inverted-list file layout (and
  * the manifest file skipping it exists for), and the catalog
  * commit + rehydrate roundtrip for both model halves. */
class IvfPqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def freshCat() = {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfpqspec")
    new graft.catalog.GraftCatalog(base.resolve("wh").toString)
  }

  test("coarse training is deterministic and shapes kCells centroids") {
    val sample = ProductQuantizer.sampleRows(emb).map(_._2).toSeq
    val a = IvfPq.trainCoarse(sample)
    val b = IvfPq.trainCoarse(sample)
    assert(a === b)
    assert(a.size === IvfPq.kCells)
    assert(a.forall(_.size === sample.head.size))
  }

  test("buildIndex commits cells+books+codes; rehydration is exact") {
    val cat = freshCat()
    val sample = ProductQuantizer.sampleRows(emb).map(_._2).toSeq
    IvfPq.buildIndex(spark, cat, "vec", "emb", emb)
    assert(IvfPq.loadCells(spark, cat, "vec", "emb") ===
      IvfPq.trainCoarse(sample))
    assert(IvfPq.loadModel(spark, cat, "vec", "emb").cbooks ===
      ProductQuantizer.train(sample).cbooks)
    // every vector is indexed exactly once, with a valid cell id
    val codes = cat.readTable(spark, "vec", "emb_ivfpq_codes")
    assert(codes.count() === emb.count())
    assert(codes.filter(col("cell") < 1 || col("cell") > IvfPq.kCells)
      .count() === 0)
    // the stored cell column IS the assignment expression's output
    val cents = IvfPq.loadCells(spark, cat, "vec", "emb")
    val mismatch = codes.join(emb, "vec_id")
      .filter(IvfPq.cellOf(cents, col("embedding")) =!= col("cell"))
      .count()
    assert(mismatch === 0)
  }

  test("range-clustered layout: manifest stats prune files per probed cell") {
    val cat = freshCat()
    IvfPq.buildIndex(spark, cat, "vec", "emb", emb)
    val total = cat.loadTable("vec", "emb_ivfpq_codes").filesAsOf(None).size
    assert(total > 1, "clustered index must span multiple files for pruning")
    // each single-cell probe keeps a strict subset of the files — the
    // inverted-list fetch is file-level, which is the whole point of the
    // repartitionByRange(cell) layout
    (1L to IvfPq.kCells.toLong).foreach { c =>
      val kept = cat.filesForScan("vec", "emb_ivfpq_codes", "cell",
        c.toDouble, c.toDouble)
      assert(kept.size < total, s"cell $c kept all $total files")
      assert(kept.nonEmpty || cat.readTable(spark, "vec", "emb_ivfpq_codes")
        .filter(col("cell") === c).isEmpty)
    }
    // and the pruned read returns exactly the cell's rows
    val probed = IvfPq.probedCodes(spark, cat, "vec", "emb", Seq(1L, 3L))
    val expect = cat.readTable(spark, "vec", "emb_ivfpq_codes")
      .filter(col("cell").isin(1L, 3L))
    assert(probed.count() === expect.count())
  }
}
