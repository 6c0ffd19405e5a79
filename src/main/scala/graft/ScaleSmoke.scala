package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scaling smoke for the graph/dedup operators (BASELINE.md scaling
  * table). Builds a documents corpus `SCALE_MULT`× the base sfDir with
  * FRESH doc_ids (each original doc becomes an exact-dup clique of
  * `SCALE_MULT` copies — the shape a dedup pipeline exists for; file-level
  * replication would instead duplicate doc_ids and collapse under
  * groupBy), then times the four operators whose cost is graph-shaped on
  * both corpora and reports the ratio plus the star-contraction round
  * counts. The scale claims under test:
  *
  *  - q_dedup_pipeline / q_dedup_cluster_star: star edges per
  *    bucket/block keep edge counts linear in docs even as dup cliques
  *    grow ×MULT, and contraction rounds stay flat (components get WIDER,
  *    not deeper).
  *  - q_dedup_incremental: O(batch) anti-join — time grows ~linearly in
  *    the batch, never in pairs.
  *  - q_neardup_incremental: batch-vs-corpus band collisions + per-edge
  *    Jaccard — cost tracks batch + collisions, never corpus × batch.
  *  - q_neardup_simhash: the histogram join is O(2^b) — duplicating every
  *    doc multiplies counts on EXISTING histogram rows, so time should be
  *    near-FLAT at ×MULT.
  *  - q_dedup_pipeline_verified: the Jaccard gate is per-edge work on the
  *    candidate set — edges grow linearly with the dup cliques (star
  *    edges), so verify cost must track edges, never pairs.
  *  - q_pack_sequences / q_mix_temperature / q_decontaminate (curation
  *    tier): the sharded prefix sum, the prefilter+rank trim, and the
  *    broadcast shingle join are all ~linear scans — wall must grow
  *    sub-quadratically (≈×MULT at worst) with the corpus.
  *
  * Prints one JSON line per operator:
  * `{"query":…,"base_sec":…,"scaled_sec":…,"ratio":…,"rounds_base":N,
  *   "rounds_scaled":N}` (rounds only for the CC-backed pair).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
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

    // the fixture key includes the SOURCE dir, not just the multiplier —
    // otherwise switching SPARK_GRAFT_SF_DIR would silently reuse a
    // corpus scaled from a different base and skew the reported ratios
    val srcTag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val scaledDir = Paths.get(sys.props.getOrElse("graft.tmp", "/root/repo/target"))
      .resolve(s"scale${mult}x_$srcTag")
    val scaledDocs = scaledDir.resolve("documents.parquet")
    if (!Files.exists(scaledDocs)) {
      val docs = Tables.documents(spark, sfDir)
      val span = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until mult)
        .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * span)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(scaledDocs.toString)
    }

    val targets = Seq("q_dedup_pipeline", "q_dedup_pipeline_verified",
      "q_dedup_cluster_star", "q_dedup_incremental", "q_neardup_incremental",
      "q_neardup_simhash",
      "q_neardup_simhash_k", "q_pack_sequences", "q_mix_temperature",
      "q_decontaminate")
    val ccBacked = Set("q_dedup_pipeline", "q_dedup_cluster_star")

    def time(name: String, dir: String): (Double, Int) = {
      var best = Double.MaxValue
      var rounds = 0
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        rounds = graft.operators.ConnectedComponents.lastRounds
      }
      (best, rounds)
    }

    // warm up the JVM on the base corpus before any timed run
    SparkEntry.queries(targets.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    targets.foreach { q =>
      val (tb, rb) = time(q, sfDir)
      val (ts, rs) = time(q, scaledDir.toString)
      val rounds = if (ccBacked(q))
        s""","rounds_base":$rb,"rounds_scaled":$rs""" else ""
      println(f"""{"query":"$q","mult":$mult,"base_sec":$tb%.2f,""" +
        f""""scaled_sec":$ts%.2f,"ratio":${ts / tb}%.2f$rounds}""")
    }
    spark.stop()
  }
}
