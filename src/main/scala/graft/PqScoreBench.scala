package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** Micro-benchmark for the PQ asymmetric-scoring hot loop (the round-12
  * verdict's stretch item): times the probe-side shortlist scan —
  * score every packed codes word, TakeOrdered the constant shortlist —
  * under (a) the native [[graft.functions.PqScoreF]] flat-LUT loop and
  * (b) the composable nested-`element_at` chain it replaces, over a
  * ×REP replication of the fixture's committed-codes shape. Both paths
  * are bit-identical (PqScoreSpec), so this isolates pure evaluation
  * cost: the chain pays ~100 expression nodes and 32 generic
  * bounds-checked `ArrayData` lookups per row; the native loop pays one
  * virtual call and 32 primitive-array reads.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=250
  *      sbt "runMain graft.PqScoreBench"
  * Prints one JSON line per path with median-of-5 seconds. */
object PqScoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "250").toInt
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
    val sample = ProductQuantizer.sampleRows(emb)
    val model = ProductQuantizer.train(sample.map(_._2).toSeq)
    val probe = sample.head._2

    // memoized ×MULT codes table — ONE encode scan ever (the scored
    // artifact is the 8-byte codes column; replicating the CODES, not
    // the vectors, matches the committed-index scan being measured)
    val dir = Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target"))
      .resolve(s"pqscore${mult}x_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_"))
    if (!Files.exists(dir)) {
      val span = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      emb.withColumn("codes",
          ProductQuantizer.packedCodes(spark, model, col("embedding")))
        .select(col("vec_id"), col("codes"))
        .crossJoin(spark.range(0, mult).toDF("rep"))
        .withColumn("vec_id", col("vec_id") + col("rep") * lit(span))
        .drop("rep")
        .write.parquet(dir.toString)
    }
    val codes = spark.read.parquet(dir.toString)
    val n = codes.count() // also warms the page cache

    // the chain approxCosine falls back to without the extension —
    // constructed here directly so ONE session measures both paths
    def dotd(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val lut = model.cbooks.zipWithIndex.map { case (cb, m) =>
      cb.map(c => dotd(probe.slice(m * model.sub, (m + 1) * model.sub), c)) }
    val cn2 = model.cbooks.map(_.map(c => dotd(c, c)))
    val qnorm = math.sqrt(dotd(probe, probe))
    def codeSum(tbl: org.apache.spark.sql.Column) =
      (0 until ProductQuantizer.M).map { m =>
        val code = shiftright(col("codes"), 4 * m).bitwiseAND(lit(15L)).cast("int")
        element_at(element_at(tbl, m + 1), code + lit(1))
      }.reduce(_ + _)
    val chain = codeSum(typedLit(lut)) /
      (lit(qnorm) * sqrt(codeSum(typedLit(cn2))))
    val native = ProductQuantizer.approxCosine(spark, model, probe, col("codes"))

    def shortlist(score: org.apache.spark.sql.Column): Long = codes
      .withColumn("approx", score)
      .orderBy(desc("approx"), asc("vec_id"))
      .limit(ProductQuantizer.shortlistK)
      .select("vec_id").collect().map(_.getLong(0)).sum

    def median5(score: org.apache.spark.sql.Column): (Double, Long) = {
      var check = 0L
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        check = shortlist(score)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.sorted.apply(2), check)
    }
    median5(native); median5(chain) // JIT + codegen-cache warmup
    val (tn, cn) = median5(native)
    val (tc, cc) = median5(chain)
    require(cn == cc, s"paths disagree: native shortlist $cn vs chain $cc")
    println(f"""{"bench":"pq_score","rows":$n,"path":"native","sec":$tn%.3f}""")
    println(f"""{"bench":"pq_score","rows":$n,"path":"chain","sec":$tc%.3f,""" +
      f""""speedup":${tc / tn}%.2f}""")
    spark.stop()
  }
}
