package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an ARBITRARY undirected edge list — the
  * general-graph companion to the closed-form interval clustering in
  * `queries/Extensions.clusterLabels` (which is exact only because its
  * pair generator is 1-dimensional). Blocking graphs that are NOT
  * interval-structured — MinHash band co-membership, embedding cells,
  * url/domain keys — need real transitive closure, and at 100 TB the
  * scalable shape is the alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): O(log²) rounds, each round two narrow shuffles
  * (groupBy-min + join), state bounded by the edge list — never a
  * driver-side graph, never an O(diameter) propagation.
  *
  *  - large-star: every node links its LARGER neighbors to the smallest
  *    node it can see (its min neighbor or itself) — long chains collapse
  *    toward minima without ever growing a node's degree unboundedly.
  *  - small-star: every node links its smaller-or-equal neighbors to that
  *    same min — stars centered on non-minima re-root onto minima.
  *
  * Each round re-canonicalizes to the symmetric self-loop-free closure;
  * convergence = the canonical (lo, hi) pair set is unchanged, checked
  * with one anti-join per round. `localCheckpoint` cuts the lineage so
  * the plan does not grow exponentially with rounds (at cluster scale use
  * reliable checkpointing instead).
  */
object ConnectedComponents {

  /** Rounds the most recent [[label]] call took to converge — a scaling
    * diagnostic (the O(log²) claim is only credible if round counts stay
    * flat as the graph grows; graft.ScaleSmoke asserts exactly that). */
  @volatile private[graft] var lastRounds: Int = 0

  /** Label every node with its component id (= the smallest node id in
    * its component). `nodes`: single numeric-id column; `edges`: two
    * numeric columns (undirected, duplicates/self-loops tolerated).
    * Isolated nodes label themselves.
    *
    * Driver-loop economy (measured at sf0.1, where per-round JOB overhead
    * dominates the tiny shuffles): convergence is tracked by a single-job
    * (count, xxhash64-xor) signature; only when the signature repeats does
    * the EXACT canonical-set anti-join run to confirm — the digest can
    * suggest convergence but never declare it. (Batching two contractions
    * per checkpoint was measured SLOWER — deeper lineage per job and one
    * wasted contraction after the fixed point.) */
  def label(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val idCol = nodes.columns.head
    val e0 = edges
      .select(col(edges.columns(0)).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    // LAZY checkpoints: the signature job right after each contraction is
    // the materializing action, so every round schedules ONE job instead
    // of two (eager checkpoint + agg) — at local/sf0.1 scale the per-job
    // scheduling floor dominates these tiny shuffles. Later rounds still
    // read the materialized checkpoint, never the lineage.
    var cur = symmetric(e0).localCheckpoint(eager = false)
    def sig(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent, overflow-free (ANSI-safe) set digest
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var curSig = sig(cur)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = symmetric(smallStar(largeStar(cur))).localCheckpoint(eager = false)
      val nextSig = sig(next)
      if (nextSig == curSig)
        // exact check: canonical pair sets equal ⇔ truly converged
        converged = canonical(next).except(canonical(cur)).isEmpty
      cur = next
      curSig = nextSig
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    lastRounds = round
    // at convergence the graph is a union of stars centered on component
    // minima, so each node's min visible id IS its component
    val lbl = cur.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("node"),
        least(col("src"), col("mn")).as("component"))
    nodes.select(col(idCol).cast("long").as("node"))
      .join(lbl, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** (v, m) for every neighbor v > u, where m = min(N(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    e.join(mins, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
  }

  /** (v, m) for every neighbor v ≤ u plus (u, m) itself. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    e.join(mins, "src")
      .where(col("dst") <= col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
  }

  /** Symmetric, self-loop-free, deduplicated closure. */
  private def symmetric(e: DataFrame): DataFrame = {
    val clean = e.where(col("src") =!= col("dst"))
    clean.union(clean.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Undirected canonical form (lo, hi) for convergence comparison. */
  private def canonical(e: DataFrame): DataFrame =
    e.select(least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi")).distinct()
}
