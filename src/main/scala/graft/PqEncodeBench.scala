package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** Micro-benchmark for the PQ ENCODE hot loop (the index-build scan):
  * times packing every embedding to its 64-bit codes word under (a) the
  * native [[graft.functions.PqEncodeF]] loop and (b) the composable
  * per-subspace zip_with/aggregate argmin chain it replaces — M×K×sub
  * interpreted lambda closures per row, paid by every index build,
  * rebuild, and streaming maintenance batch. Both paths are
  * word-identical (PqEncodeSpec), so this isolates evaluation cost.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=100
  *      sbt "runMain graft.PqEncodeBench" */
object PqEncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val model = ProductQuantizer.train(
      ProductQuantizer.sampleRows(emb).map(_._2).toSeq)
    val scaled = emb.crossJoin(spark.range(0, mult).toDF("rep")).drop("rep")
      .cache()
    val n = scaled.count()

    // the chain packedCodes falls back to without the extension —
    // constructed here directly so ONE session measures both paths
    val cbLit = typedLit(model.cbooks)
    val chain = (0 until ProductQuantizer.M).map { m =>
      val sv = slice(col("embedding"), m * model.sub + 1, model.sub)
      val dists = transform(element_at(cbLit, m + 1), c =>
        aggregate(zip_with(sv, c,
            (x, y) => ((x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double")))),
          lit(0.0), (acc, v) => acc + v))
      shiftleft((array_position(dists, array_min(dists)) - 1).cast("long"),
        4 * m)
    }.reduce(_ + _)
    val native = ProductQuantizer.packedCodes(spark, model, col("embedding"))

    // checksum mod a prime — a raw sum of 2^63-scale code words
    // overflows the ANSI Long sum
    def encode(codes: org.apache.spark.sql.Column): Long = scaled
      .select((codes % lit(1000003L)).as("codes"))
      .agg(sum("codes")).head().getLong(0)

    def median3(codes: org.apache.spark.sql.Column): (Double, Long) = {
      var check = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        check = encode(codes)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.sorted.apply(1), check)
    }
    encode(native); encode(chain) // JIT + codegen-cache warmup
    val (tn, cn) = median3(native)
    val (tc, cc) = median3(chain)
    require(cn == cc, s"paths disagree: native checksum $cn vs chain $cc")
    println(f"""{"bench":"pq_encode","rows":$n,"path":"native","sec":$tn%.3f}""")
    println(f"""{"bench":"pq_encode","rows":$n,"path":"chain","sec":$tc%.3f,""" +
      f""""speedup":${tc / tn}%.2f}""")
    spark.stop()
  }
}
