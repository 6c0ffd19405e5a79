package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants over the analytic SQL surface (SURVEY.md §2.M). Exact values
  * are covered by the DuckDB differential gate; these pin the laws that
  * stay true at any scale factor.
  */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_subquery_scalar matches its manual decorrelation") {
    val c = Tables.customer(spark, sfDir)
    val nationAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg(round(avg(col("c_acctbal")), 4).as("nation_avg"))
    val expected = c.join(nationAvg, col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg")).count()
    assert(run("q_subquery_scalar").count() === expected)
    assert(expected > 0)
  }

  test("q_subquery_notin complements the IN side exactly (no NULL keys present)") {
    val inSide = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val total = Tables.customer(spark, sfDir).count()
    assert(run("q_subquery_notin").count() === total - inSide)
  }

  test("q_win_named: shared frame laws — first row offset 0, ranks start at 1") {
    val rows = run("q_win_named")
    assert(rows.count() === Tables.events(spark, sfDir).count())
    // both functions ride the SAME named frame: the rank-1 row of every
    // user is its own first_value, so its offset is exactly 0
    assert(rows.filter(col("rk") === 1 && col("cents_vs_first") =!= 0L)
      .count() === 0)
    assert(rows.groupBy("user_id").agg(min("rk").as("m"))
      .filter(col("m") =!= 1).count() === 0)
  }

  test("q_agg_filter matches the CASE-scaffolded equivalent") {
    val o = Tables.orders(spark, sfDir)
    val expected = o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_big"),
        coalesce(sum(when(col("o_orderstatus") === "F",
          expr("cast(round(o_totalprice * 100) as bigint)"))), lit(0L))
          .as("cents_fulfilled"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = run("q_agg_filter").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("q_subquery_exists matches its manual semi+anti join composition") {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    // thresholds live inside every fixture's price distribution so BOTH
    // branches fire (the anti side must exclude someone, or the law is
    // vacuous on the NOT EXISTS half)
    val existsSide = c
      .join(o.filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
    val expected = existsSide
      .join(o.filter(col("o_orderstatus") === "F" &&
          col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(run("q_subquery_exists").count() === expected)
    assert(expected > 0)
    assert(existsSide.count() > expected,
      "fixture must make the NOT EXISTS branch exclude someone")
  }

  test("q_win_range_interval: one row per event, frame always includes the row itself") {
    val rows = run("q_win_range_interval")
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
    assert(rows.count() === ev.count())
    // RANGE ... CURRENT ROW: the rolling sum can never be below the
    // event's own contribution
    assert(rows.join(ev, "event_id")
      .filter(col("roll_cents") < col("cents")).count() === 0)
  }

  test("q_cte_multi: priority shares sum to 1 within each month") {
    val bad = run("q_cte_multi")
      .groupBy("mo").agg(sum("share").as("s"))
      .filter(abs(col("s") - 1.0) > 0.01)
    assert(bad.count() === 0)
  }

  test("q_lateral_explode: at most five positional tokens per doc, none empty") {
    val rows = run("q_lateral_explode")
    assert(rows.filter(col("pos") < 0 || col("pos") > 4).count() === 0)
    assert(rows.filter(col("tok") === "").count() === 0)
    assert(rows.groupBy("doc_id").count().filter(col("count") > 5).count() === 0)
    assert(rows.count() > 0)
  }

  test("q_agg_stats: moment identities hold per group") {
    run("q_agg_stats").collect().foreach { r =>
      val (corr, covar, sd, variance, slope) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.abs(corr) <= 1.0)
      assert(sd >= 0 && variance >= 0)
      // regr_slope = covar_samp / var_samp (pop/samp ratio cancels)
      assert(math.abs(slope - covar / variance) < 0.01,
        s"slope $slope vs covar/var ${covar / variance}")
    }
  }

  test("q_agg_unpivot: long form preserves the wide totals") {
    val long = run("q_agg_unpivot")
    val nations = long.select("nationkey").distinct().count()
    assert(long.count() === 2 * nations)
    val custTotal = long.filter(col("metric") === "customers")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(custTotal === Tables.customer(spark, sfDir).count())
  }

  test("q_sample_stratified: kept fractions track the per-language rates") {
    val kept = run("q_sample_stratified")
      .groupBy("lang").agg(sum("n_docs").as("kept"))
    val totals = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("total"))
    kept.join(totals, "lang").collect().foreach { r =>
      val lang = r.getString(0)
      val frac = r.getLong(1).toDouble / r.getLong(2)
      val rate = lang match { case "en" => 0.5; case "de" => 0.2; case _ => 0.1 }
      // md5 draw is uniform; loose binomial bound that holds even for the
      // ~50-doc strata at sf0.001
      assert(math.abs(frac - rate) < 0.25, s"$lang kept $frac vs rate $rate")
    }
  }

  test("q_agg_listagg: sorted member lists, counts consistent") {
    run("q_agg_listagg").collect().foreach { r =>
      val members = r.getString(1).split(",")
      assert(members.length === r.getLong(2))
      assert(members.sorted.toSeq === members.toSeq, "members must be sorted")
    }
  }

  test("q_agg_histogram: buckets partition the orders, bounds inside bucket") {
    val h = run("q_agg_histogram")
    assert(h.agg(sum("n_orders")).collect()(0).getLong(0) ===
      Tables.orders(spark, sfDir).count())
    assert(h.filter(col("lo") > col("hi")).count() === 0)
    assert(h.filter(col("lo") < col("bucket") * 50000 ||
      col("hi") >= (col("bucket") + 1) * 50000).count() === 0)
  }

  test("q_sql_params: bound parameters behave exactly like inline literals") {
    val bound = run("q_sql_params")
    val inline = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("bal"))
    assert(bound.count() === inline.count())
    assert(bound.exceptAll(inline).count() === 0)
  }

  test("q_json_variant: deciles partition the events, bounds stay inside") {
    val v = run("q_json_variant")
    assert(v.agg(sum("n")).collect()(0).getLong(0) ===
      Tables.events(spark, sfDir).count())
    assert(v.filter(col("k_min") < col("decile") * 10 ||
      col("k_max") >= (col("decile") + 1) * 10).count() === 0)
  }

  test("q_ts_resample: contiguous hourly grid, forward fill total, gaps empty") {
    val rows = run("q_ts_resample")
    assert(rows.filter(col("v_ff").isNull).count() === 0,
      "grid starts at each user's first active hour — no leading nulls")
    assert(rows.filter(col("is_gap") && col("n_events") =!= 0).count() === 0)
    val spans = rows.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("hr").as("mn"), max("hr").as("mx"))
      .withColumn("expected",
        (unix_timestamp(col("mx")) - unix_timestamp(col("mn"))) / 3600 + 1)
    assert(spans.filter(col("n") =!= col("expected")).count() === 0,
      "every hour between first and last activity is present exactly once")
  }
}
