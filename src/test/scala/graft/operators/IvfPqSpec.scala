package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The IVF+PQ index operator behind q_vec_knn_ivfpq: √N-sized
  * deterministic coarse training, the range-clustered inverted-list
  * file layout (and the manifest file skipping it exists for), and the
  * catalog commit + rehydrate roundtrip for both model halves. */
class IvfPqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def freshCat() = {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfpqspec")
    new graft.catalog.GraftCatalog(base.resolve("wh").toString)
  }

  test("cell count is sized from the corpus: k = max(8, ceil(sqrt(N)))") {
    assert(IvfPq.cellsFor(4) === 8)     // floor dominates tiny corpora
    assert(IvfPq.cellsFor(64) === 8)
    assert(IvfPq.cellsFor(500) === 23)
    assert(IvfPq.cellsFor(2000) === 45)
    assert(IvfPq.cellsFor(1000000000L) === 31623)
    // probe policy holds the FRACTION (~k/4), with a floor of 4
    assert(IvfPq.probeCount(8) === 4)
    assert(IvfPq.probeCount(23) === 6)
    assert(IvfPq.probeCount(45) === 12)
  }

  test("coarse training is deterministic and shapes k centroids") {
    val k = IvfPq.cellsFor(emb.count())
    val sample = ProductQuantizer
      .sampleRows(emb, IvfPq.coarseSampleSize(k)).map(_._2).toSeq
    val a = IvfPq.trainCoarse(sample, k)
    val b = IvfPq.trainCoarse(sample, k)
    assert(a === b)
    assert(a.size === k)
    assert(a.forall(_.size === sample.head.size))
  }

  test("buildIndex commits cells+books+codes; rehydration is exact") {
    val cat = freshCat()
    val k = IvfPq.cellsFor(emb.count())
    val sample = ProductQuantizer
      .sampleRows(emb, IvfPq.coarseSampleSize(k)).map(_._2).toSeq
    IvfPq.buildIndex(spark, cat, "vec", "emb", emb)
    // k is persisted AS the cells table's row count — a later session
    // recovers it from the catalog, never from a constant
    val cents = IvfPq.loadCells(spark, cat, "vec", "emb")
    assert(cents.size === k)
    assert(cents === IvfPq.trainCoarse(sample, k))
    assert(IvfPq.loadModel(spark, cat, "vec", "emb").cbooks ===
      ProductQuantizer.train(sample.take(100)).cbooks)
    // every vector is indexed exactly once, with a valid cell id
    val codes = cat.readTable(spark, "vec", "emb_ivfpq_codes")
    assert(codes.count() === emb.count())
    assert(codes.filter(col("cell") < 1 || col("cell") > k).count() === 0)
    // the stored cell column IS the assignment expression's output
    val mismatch = codes.join(emb, "vec_id")
      .filter(IvfPq.cellOf(cents, col("embedding")) =!= col("cell"))
      .count()
    assert(mismatch === 0)
  }

  test("zero-norm embeddings fail the encode scan loudly") {
    import spark.implicits._
    val k = IvfPq.cellsFor(emb.count())
    val sample = ProductQuantizer
      .sampleRows(emb, IvfPq.coarseSampleSize(k)).map(_._2).toSeq
    val cents = IvfPq.trainCoarse(sample, k)
    val dim = sample.head.size
    val degenerate = Seq((99999L, Seq.fill(dim)(0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      degenerate.select(IvfPq.cellOf(cents, col("embedding"))).collect()
    }
    assert(e.getMessage.contains("zero-norm"),
      s"expected the zero-norm guard to fire, got: ${e.getMessage}")
  }

  test("range-clustered layout: manifest stats prune files per probed cell") {
    val cat = freshCat()
    IvfPq.buildIndex(spark, cat, "vec", "emb", emb)
    val k = IvfPq.loadCells(spark, cat, "vec", "emb").size
    val total = cat.loadTable("vec", "emb_ivfpq_codes").filesAsOf(None).size
    assert(total > 1, "clustered index must span multiple files for pruning")
    // each single-cell probe keeps a strict subset of the files — the
    // inverted-list fetch is file-level, which is the whole point of the
    // repartitionByRange(cell) layout
    (1L to k.toLong).foreach { c =>
      val kept = cat.filesForScan("vec", "emb_ivfpq_codes", "cell",
        c.toDouble, c.toDouble)
      assert(kept.size < total, s"cell $c kept all $total files")
      assert(kept.nonEmpty || cat.readTable(spark, "vec", "emb_ivfpq_codes")
        .filter(col("cell") === c).isEmpty)
    }
    // the pruned read returns exactly the probed cells' rows, in ONE
    // scan whose kept files stay a strict subset however many cells
    // the √N-sized index probes
    val probed = IvfPq.probedCodes(spark, cat, "vec", "emb", Seq(1L, 3L))
    val expect = cat.readTable(spark, "vec", "emb_ivfpq_codes")
      .filter(col("cell").isin(1L, 3L))
    assert(probed.count() === expect.count())
  }
}
