package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfPq

/** Micro-benchmark for the batch-augmentation cell-ranking hot loop:
  * times per-row top-nProbe cell ranking — every batch row ranks the k
  * centroid literals and keeps the probed prefix — under (a) the native
  * [[graft.functions.ProbeCellsF]] primitive loop and (b) the
  * composable zip_with/array_sort/slice chain it replaces in
  * [[IvfPq.augmentTop1]]. Both paths rank identically (ProbeCellsSpec),
  * so this isolates evaluation cost: the chain pays k×dim interpreted
  * lambda closures plus a k-struct sort per row; the native loop pays
  * k×dim primitive multiplies plus one index sort.
  *
  * k defaults to 708 — the measured ×1000 tier's ⌈√N⌉ — because the
  * interpreted tax scales with k, and k scales with the corpus: this is
  * the number that decides whether streaming augmentation keeps up at
  * index scale.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=10
  *      SPARK_GRAFT_K_CELLS=708 sbt "runMain graft.ProbeCellsBench" */
object ProbeCellsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val kCells = sys.env.getOrElse("SPARK_GRAFT_K_CELLS", "708").toInt
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
    // k real, distinct vectors as centroids (cycled if the fixture is
    // smaller than k) — centroid VALUES don't affect ranking cost, k does
    val vecs = emb.orderBy("vec_id").limit(kCells)
      .select("embedding").collect().map(_.getSeq[Float](0))
    val cents: Seq[Seq[Float]] =
      Seq.tabulate(kCells)(i => vecs(i % vecs.length))
    val nProbe = IvfPq.probeCount(kCells)
    val batch = emb.crossJoin(spark.range(0, mult).toDF("rep")).drop("rep")
      .cache()
    val rows = batch.count()

    // the chain rankedCells falls back to without the extension —
    // constructed here directly so ONE session measures both paths
    def centNorm(c: Seq[Float]): Double =
      math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
    val dotE = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("graft_dot", a, b)
    val e = col("embedding")
    val simStructArr = zip_with(typedLit(cents),
      zip_with(typedLit(cents.map(centNorm)),
        sequence(lit(1L), lit(kCells.toLong)),
        (nm, i) => struct(nm.as("n"), i.as("i"))),
      (c, ni) => struct(
        (dotE(e, c) / (sqrt(dotE(e, e)) * ni("n"))).as("sim"),
        ni("i").as("cell")))
    val chain = transform(slice(array_sort(simStructArr, (l, r) =>
      when(l("sim") > r("sim"), -1).when(l("sim") < r("sim"), 1)
        .otherwise(when(l("cell") < r("cell"), -1)
          .when(l("cell") > r("cell"), 1).otherwise(0)).cast("int")),
      1, nProbe), c => c("cell"))
    val native = IvfPq.rankedCells(spark, cents, e, nProbe)

    def run(ranked: org.apache.spark.sql.Column): Long = batch
      .select(explode(ranked).as("cell")).agg(sum("cell")).head().getLong(0)

    def median3(ranked: org.apache.spark.sql.Column): (Double, Long) = {
      var check = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        check = run(ranked)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.sorted.apply(1), check)
    }
    run(native); run(chain) // JIT + codegen-cache warmup
    val (tn, cn) = median3(native)
    val (tc, cc) = median3(chain)
    require(cn == cc, s"paths disagree: native checksum $cn vs chain $cc")
    println(f"""{"bench":"probe_cells","rows":$rows,"k":$kCells,""" +
      f""""n_probe":$nProbe,"path":"native","sec":$tn%.3f}""")
    println(f"""{"bench":"probe_cells","rows":$rows,"k":$kCells,""" +
      f""""n_probe":$nProbe,"path":"chain","sec":$tc%.3f,""" +
      f""""speedup":${tc / tn}%.2f}""")
    spark.stop()
  }
}
