package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Algebraic invariants over the relational core (SURVEY.md §2.D-§2.F).
  * Exact values are covered by the DuckDB differential gate; these pin the
  * laws that stay true at any scale factor.
  */
class RelationalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_agg_approx_pct: sketch median within 1% of exact in every group") {
    val rows = run("q_agg_approx_pct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"${r.getString(0)}: approx ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
  }

  test("outer-join law: |full| = |left| + |right| - |inner| on raw tables") {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val cond = col("c_custkey") === col("o_custkey")
    val inner = c.join(o, cond).count()
    val left = c.join(o, cond, "left").count()
    val right = c.join(o, cond, "right").count()
    val full = c.join(o, cond, "full").count()
    assert(full === left + right - inner)
    assert(left >= inner && right >= inner)
  }

  test("salted join is semantically invisible: same rows as the plain join") {
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("rev"))
    val salted = run("q_join_skew_salted")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("semi + anti partition the left side (same bounded right side)") {
    // q_join_anti bounds its orders side to recent dates so the result
    // is non-empty at every SF; the partition law holds against a semi
    // join over the SAME bounded side
    val customers = Tables.customer(spark, sfDir).count()
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01")))
    val boundedSemi = Tables.customer(spark, sfDir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(boundedSemi + run("q_join_anti").count() === customers)
  }

  test("right/anti/except fixtures are non-vacuous: each returns rows") {
    // a 0-row result would make the DuckDB hash oracle pass `0 ≡ 0`,
    // unable to distinguish a working operator from a broken-empty one
    assert(run("q_join_right").count() > 0)
    assert(run("q_join_anti").count() > 0)
    assert(run("q_except").count() > 0)
  }

  test("rollup/cube/grouping-sets cardinalities nest correctly") {
    val plain = run("q_agg_groupby").count()
    val rollup = run("q_agg_rollup").count()
    val cube = run("q_agg_cube").count()
    assert(rollup > plain)  // adds subtotal levels
    assert(cube >= rollup)  // adds the remaining key subsets
  }

  test("top-k per group emits at most 3 rows per group and global topk is sorted") {
    val perGroup = run("q_topk_per_group")
      .groupBy("o_orderpriority").count()
    assert(perGroup.filter(col("count") > 3).count() === 0)
    val prices = run("q_limit_topk")
      .select(col("o_totalprice").cast("double")).collect().map(_.getDouble(0))
    assert(prices.length === 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("as-of join: matched signup is the latest one at-or-before the event") {
    val asof = run("q_join_asof")
    assert(asof.filter(col("signup_ts") > col("ts")).count() === 0)
    // one row per purchase event that has any eligible signup
    assert(asof.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
  }

  test("dedup-latest keeps exactly one row per user, the newest") {
    val d = run("q_dedup_latest")
    assert(d.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    val latest = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(max("ts").as("max_ts"))
    assert(d.join(latest, "user_id").filter(col("ts") =!= col("max_ts")).count() === 0)
  }
}
