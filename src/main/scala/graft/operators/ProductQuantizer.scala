package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, TableMeta}

/** Product quantization for ANN search (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011; FAISS's
  * `IndexPQ`): the embedding space splits into M subspaces, each with its
  * own K-centroid codebook, so a vector compresses to M codes. With
  * K = 16 a code is 4 bits and the whole M = 16 code word PACKS INTO ONE
  * BIGINT (8 bytes — a 32× compression of the 64-dim float fixture
  * vectors), so the persisted index is a two-column `(vec_id, codes)`
  * table whose scan cost is independent of the embedding width.
  *
  * Everything here is deterministic end to end — sample in vec_id order,
  * per-subspace Lloyd with argmin ties to the lowest cell, empty cells
  * keeping their previous centroid, per-row double arithmetic — so
  * index builds and query results are byte-identical across local[4]
  * and local[32] and can be oracle-pinned.
  *
  * Scale shape (the reason this module exists as an OPERATOR and not a
  * per-query scaffold): training touches a driver-side sample only; the
  * corpus pays exactly ONE encode scan at index-build time; a query
  * scans the 8-byte codes column (never the raw vectors), scores each
  * row as M table lookups against a driver-built LUT, and takes a
  * CONSTANT-size shortlist with TakeOrdered — the raw vectors are read
  * again only for the shortlist's exact re-rank, via a broadcast
  * semi-join of shortlist ids. At 100 TB that is a 32×-smaller index
  * scan plus a constant-row vector fetch, the standard PQ deployment
  * trade. */
object ProductQuantizer {

  /** M subspaces × K centroids; K = 16 keeps a code in 4 bits so the
    * packed word is exactly 64 bits = one BIGINT. */
  val M = 16
  val K = 16

  /** Default exact-re-rank shortlist: a CONSTANT multiple of the final
    * k = 10 (not a corpus fraction — a Θ(N) shortlist is the scale
    * killer the compressed scan exists to avoid). Measured on the
    * sf0.1 fixture (RANDOM vectors — PQ's structureless worst case,
    * where the 8-byte code correlates weakly with true cosine): 10×k
    * read 8/10 recall, 16×k 9/10, 32×k exactly 10/10; the 48×k default
    * keeps margin over that edge for fixture regeneration. Real
    * clustered corpora take far smaller constants. Override via
    * `-Dgraft.pq.shortlist=` (fixture/benchmark experiments only;
    * Try-parsed so a malformed value degrades to the default). */
  def shortlistK: Int = sys.props.get("graft.pq.shortlist")
    .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(480)

  /** Per-subspace codebooks. `cbooks(m)(k)` is the k-th centroid of
    * subspace m (a `sub`-dim float vector). */
  final case class Model(dim: Int, cbooks: Seq[Seq[Seq[Float]]]) {
    require(dim % M == 0,
      s"embedding dim $dim not divisible by M=$M subspaces — " +
        "a regenerated fixture with an incompatible width must fail " +
        "loudly, not silently drop trailing components")
    val sub: Int = dim / M
  }

  private def l2(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
    }
    acc
  }

  private def dotd(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  private def subvec(v: Seq[Float], m: Int, sub: Int): Seq[Float] =
    v.slice(m * sub, (m + 1) * sub)

  /** Train the M codebooks on a driver-side sample (the honest 100 TB
    * protocol — quantizer training fits on one machine; the corpus only
    * ever pays encode scans). Bounded Lloyd: 5 iterations, seeds = the
    * first K sample subvectors, ties to the lowest cell. */
  def train(sample: Seq[Seq[Float]]): Model = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.size
    // fail BEFORE Lloyd runs: a fixture regen shipping an incompatible
    // width must not silently drop trailing components
    require(dim % M == 0,
      s"embedding dim $dim not divisible by M=$M subspaces")
    val sub = dim / M
    val cbooks = (0 until M).map { m =>
      val svs = sample.map(v => subvec(v, m, sub))
      // seeds cycle a small sample so every cell exists even when the
      // sample has fewer than K vectors
      var cents = Seq.tabulate(K)(i => svs(i % svs.size))
      for (_ <- 1 to 5) {
        val assign = svs.map(v =>
          cents.zipWithIndex.minBy { case (c, i) => (l2(c, v), i) }._2)
        cents = (0 until K).map { ki =>
          val mem = svs.zip(assign).collect { case (v, a) if a == ki => v }
          if (mem.isEmpty) cents(ki)
          else mem.head.indices
            .map(p => (mem.map(_(p).toDouble).sum / mem.size).toFloat)
        }
      }
      cents
    }
    Model(dim, cbooks)
  }

  /** Encode an embedding column to the packed 64-bit code word:
    * subspace m's 4-bit code occupies bits [4m, 4m+4).
    *
    * `s` is the OWNING session of the frame being encoded (the
    * [[graft.operators.IvfPq.cellOf]] threading rule): when it carries
    * GraftExtensions the encode runs as the native [[graft.functions
    * .PqEncodeF]] — one tight M×K×sub double loop per row. The
    * composable fallback below is statically unrolled over the M
    * subspaces, but each subspace's argmin evaluates K
    * zip_with/aggregate lambda closures in the INTERPRETER (HOFs never
    * enter whole-stage codegen) — the index-build tax the native path
    * removes. Both paths are bit-identical (same L2 fold order, ties to
    * the lowest code — PqEncodeSpec pins per-row word equality), so
    * every committed index and oracle is unchanged. */
  def packedCodes(s: SparkSession, model: Model, emb: Column): Column = {
    val cbLit = typedLit(model.cbooks)
    if (s.catalog.functionExists("graft_pq_encode"))
      return call_function("graft_pq_encode", cbLit, emb)
    (0 until M).map { m =>
      val sv = slice(emb, m * model.sub + 1, model.sub)
      val dists = transform(element_at(cbLit, m + 1), c =>
        aggregate(zip_with(sv, c,
            (x, y) => ((x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double")))),
          lit(0.0), (acc, v) => acc + v))
      // array_position is 1-based and returns the FIRST (lowest) match
      shiftleft((array_position(dists, array_min(dists)) - 1).cast("long"), 4 * m)
    }.reduce(_ + _)
  }

  /** Asymmetric-distance scoring of a packed-codes column against a
    * probe vector: the per-(subspace, centroid) probe dot products and
    * centroid norms form driver-side lookup tables, so the per-row
    * approximate cosine is M shift-mask-lookup terms — never a
    * dim-float dot product, and never a touch of the raw vectors.
    *
    * `s` is the OWNING session of the codes frame (the [[graft.operators
    * .IvfPq.cellOf]] threading rule): when it carries GraftExtensions the
    * scoring runs as the native [[graft.functions.PqScoreF]] — ONE
    * 16-iteration primitive-array loop per row instead of the 100+-node
    * nested-`element_at` tree below. Both paths are bit-identical
    * (same fold order, same operation tree — PqScoreSpec asserts
    * per-row Double equality), so every PQ-family oracle is unchanged. */
  def approxCosine(s: SparkSession, model: Model, probe: Seq[Float],
                   codes: Column): Column = {
    val lut = model.cbooks.zipWithIndex.map { case (cb, m) =>
      cb.map(c => dotd(subvec(probe, m, model.sub), c)) }
    val cn2 = model.cbooks.map(_.map(c => dotd(c, c)))
    val qnorm = math.sqrt(dotd(probe, probe))
    val lutLit = typedLit(lut)
    val cn2Lit = typedLit(cn2)
    if (s.catalog.functionExists("graft_pq_score"))
      return call_function("graft_pq_score", codes, lutLit, cn2Lit, lit(qnorm))
    def codeSum(tbl: Column): Column = (0 until M).map { m =>
      val code = shiftright(codes, 4 * m).bitwiseAND(lit(15L)).cast("int")
      element_at(element_at(tbl, m + 1), code + lit(1))
    }.reduce(_ + _)
    codeSum(lutLit) / (lit(qnorm) * sqrt(codeSum(cn2Lit)))
  }

  /** The deterministic training sample: the 100 smallest vec_ids. ONE
    * driver action serves training AND the probe row (the probe is the
    * first sample row), mirroring [[graft.queries.Extensions]]'s IVF
    * protocol. */
  def sampleRows(emb: DataFrame, n: Int = 100): Array[(Long, Seq[Float])] =
    emb.orderBy("vec_id").limit(n).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Build and COMMIT the PQ index through the catalog — the persisted
    * form the per-query encode scan only simulates: two side tables in
    * the `docs_neardup_sigs` pattern,
    *
    *  - `<table>_pq_codes(vec_id BIGINT, codes BIGINT)` — the corpus
    *    encoded once (the only corpus-sized job here), 8 bytes/vector,
    *  - `<table>_pq_books(m INT, k INT, centroid ARRAY<FLOAT>)` — the
    *    M×K trained codebooks (a fixed few KB), so a later query session
    *    rebuilds the scoring LUT WITHOUT retraining or touching vectors.
    *
    * Readers get snapshot semantics from the catalog like every other
    * registered table (time travel included). Returns the codes-table
    * meta. */
  def buildIndex(spark: SparkSession, cat: GraftCatalog, ns: String,
                 table: String, emb: DataFrame): TableMeta = {
    import spark.implicits._
    val model = train(sampleRows(emb).map(_._2).toSeq)
    val codes = emb.select(col("vec_id"),
      packedCodes(emb.sparkSession, model, col("embedding")).as("codes"))
    val stamp = graft.catalog.Stamp.next()
    def commit(t: String, df: DataFrame): TableMeta = {
      val dir = Paths.get(cat.warehouse, ns, t, "data", s"pq-$stamp")
      df.write.parquet(dir.toString)
      if (!cat.tableExists(ns, t)) cat.createTable(ns, t, df.schema)
      cat.registerFiles(ns, t, Seq(dir), operation = "overwrite")
    }
    val books = model.cbooks.zipWithIndex.flatMap { case (cb, m) =>
      cb.zipWithIndex.map { case (c, k) => (m, k, c) }
    }.toDF("m", "k", "centroid")
    commit(s"${table}_pq_books", books)
    commit(s"${table}_pq_codes", codes)
  }

  /** Rehydrate the model from the committed codebooks table — M×K rows,
    * a bounded driver fetch (the LUT build is driver-side by design). */
  def loadModel(spark: SparkSession, cat: GraftCatalog, ns: String,
                table: String): Model = {
    val rows = cat.readTable(spark, ns, s"${table}_pq_books")
      .orderBy("m", "k").collect()
    val cbooks = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (_, rs) => rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toSeq
    }
    Model(cbooks.head.head.size * M, cbooks)
  }
}
