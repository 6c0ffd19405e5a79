package graft.operators

import graft.SparkSpec

/** General-graph connected components (alternating large-star/small-star):
  * exactness against a driver-side union-find on random graphs (shapes the
  * interval closed form cannot handle), long-chain contraction in O(log²)
  * rounds, isolated-node labeling, and parity with the closed-form
  * interval clustering on the banded document graph. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Union-find where the larger root always points at the smaller, so the
    * final root of every tree is the component's MIN id. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graphs: star contraction equals union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val m = 150 + rnd.nextInt(150)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val want = unionFind(n, edges)
      val got = ConnectedComponents.label(
          spark.range(n).toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial with ${edges.size} edges")
    }
  }

  test("long chain contracts and isolated nodes label themselves") {
    // a path of diameter 49 — the shape that defeated per-round
    // min-propagation — plus isolated nodes 50..59
    val edges = (0L until 49L).map(i => (i, i + 1))
    val got = ConnectedComponents.label(
        spark.range(60).toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 49L).foreach(i => assert(got(i) === 0L, s"node $i"))
    (50L to 59L).foreach(i => assert(got(i) === i, s"isolated $i"))
  }

  test("q_dedup_cluster_star matches the closed-form interval labeling") {
    val star = graft.queries.Extensions.queries("q_dedup_cluster_star")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val closed = graft.queries.Extensions.queries("q_dedup_cluster")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(star === closed)
  }
}
