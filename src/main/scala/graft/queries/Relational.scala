package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.QFn

/** Relational core of the declared contract (SURVEY.md §2.C/§2.D/§2.E/§2.F).
  *
  * The reference delegates this entire surface to Spark SQL over its Iceberg
  * catalog (`/root/reference/entrypoint-spark.sh:73`, broadcast/AQE tuning at
  * `:116-131`); we re-declare it as DataFrame plans so Catalyst owns the
  * physical strategy.
  *
  * Determinism discipline (SURVEY.md §5.3): every query ends in a total
  * order; double aggregates are rounded; integer aggregates are cast to
  * BIGINT on the DuckDB side.
  *
  * Scale notes (100 TB): dimension joins (region/nation/customer/supplier)
  * are explicitly `broadcast()`-hinted — at production scale the fact side
  * never shuffles for those. Fact-fact joins (lineitem⋈orders) shuffle on
  * the join key, which AQE re-plans at runtime (skew split + partition
  * coalescing, same switches the reference sets).
  */
object Relational {

  // ---------------------------------------------------------------- scans
  private def qScanProject: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
      // the oracle compare needs a TOTAL order (SURVEY.md §5.3)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  private def qFilterPred: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 30 &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_shipdate") >= to_timestamp_ntz(lit("1996-01-01")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

  private def qFilterInNull: QFn = (s, d) =>
    Tables.customer(s, d)
      .withColumn("bal",
        when(col("c_acctbal") < 0, lit(null)).otherwise(round(col("c_acctbal"), 2)))
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
        (col("bal").isNull || col("bal") > 100))
      .select("c_custkey", "c_mktsegment", "bal")
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- joins
  private def qJoinInner: QFn = (s, d) =>
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** TPC-H Q5-shaped 5-way join: two broadcast dims + one fact-fact shuffle. */
  private def qJoinMultiway: QFn = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
              col("o_orderdate") <  to_timestamp_ntz(lit("1998-01-01")))
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private def qJoinLeft: QFn = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** Customers with no RECENT order. The orders side is date-bounded so
    * the result is non-empty at every SF — the fixture gives every
    * customer SOME order, so an unbounded version returns 0 rows and its
    * oracle check degenerates to `0 ≡ 0` (a broken right join that
    * always returns empty would pass). */
  private def qJoinRight: QFn = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01")))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
      .filter(col("o_orderkey").isNull)
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Full outer of per-nation supplier vs customer counts (asymmetric sides). */
  private def qJoinFull: QFn = (s, d) => {
    val sc = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_suppliers"))
    val cc = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_customers"))
    sc.join(cc, col("sk") === col("ck"), "full")
      .select(coalesce(col("sk"), col("ck")).as("nationkey"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"))
      .orderBy("nationkey")
  }

  private def qJoinSemi: QFn = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Anti-join against the same date-bounded orders side as
    * [[qJoinRight]] (non-vacuous at every SF for the same reason). */
  private def qJoinAnti: QFn = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01"))),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private def qJoinCross: QFn = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** Theta (non-equi) join: nation pairs within a region. */
  private def qJoinTheta: QFn = (s, d) => {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("k1"),
      col("n_name").as("nation_a"), col("n_regionkey").as("rk1"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("k2"),
      col("n_name").as("nation_b"), col("n_regionkey").as("rk2"))
    n1.join(n2, col("rk1") === col("rk2") && col("k1") < col("k2"))
      .select("nation_a", "nation_b")
      .orderBy("nation_a", "nation_b")
  }

  /** Range join: line items shipped within 60 days of their order date. */
  private def qJoinRange: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy("mo")

  /** As-of join: each purchase matched to the latest signup at-or-before it,
    * per user. Expressed as UNION + one window pass — each row carries the
    * running last signup time for its user, so state is linear in the input
    * and a hot user costs O(their events), where the obvious
    * join-every-earlier-signup-then-max shape is O(purchases ×
    * signups-per-user): quadratic on exactly the skewed keys that dominate
    * at 100 TB. One shuffle (the window partition), no join at all.
    * Ties: a signup at the same µs as a purchase qualifies (>= in the
    * oracle's ASOF), so signups sort before purchases within a timestamp.
    * DuckDB oracle uses its native ASOF JOIN (largest s.ts <= p.ts). */
  private def qJoinAsof: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("kind"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        lit(0).as("kind"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signups.unionByName(purchases)
      .withColumn("signup_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("signup_ts").isNotNull) // inner ASOF
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_skew_salted (§2.D D3's static face): the fact⋈dim join run
    * through [[graft.etl.Skew.saltedJoin]] — the shape for a key too hot
    * for AQE's runtime split (one key holding a double-digit share of a
    * 100 TB fact): the fact side scatters into 8 deterministic sub-keys,
    * the dim side replicates 8×, and the hot partition becomes 8 even
    * ones. Salting is semantically invisible, so the oracle is the PLAIN
    * join — the hash match proves the mitigation changes only the
    * partitioning, never the result. */
  private def qJoinSkewSalted: QFn = (s, d) => {
    val o = Tables.orders(s, d).withColumnRenamed("o_custkey", "k")
    val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "k")
      .select("k", "c_mktsegment")
    graft.etl.Skew.saltedJoin(o, c, "k", "o_orderkey", salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("c_mktsegment")
  }

  // ----------------------------------------------------------- aggregates
  private def qAggGlobal: QFn = (s, d) =>
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")), 2).as("sum_qty"),
      round(avg(col("l_extendedprice")), 4).as("avg_price"),
      round(min(col("l_extendedprice")), 2).as("min_price"),
      round(max(col("l_extendedprice")), 2).as("max_price"))

  /** TPC-H Q1-shaped pricing summary — the flagship query (SURVEY.md §7.1). */
  def qAggGroupby: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** BI-shaped cross-tab: pivot with explicit key values (explicit so the
    * output schema is static — at scale an inferred pivot would scan once
    * just to discover columns). */
  private def qAggPivot: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy("l_linestatus")

  /** Boolean/conditional aggregates: every/any/count_if per group. */
  private def qAggBool: QFn = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
        count_if(col("o_orderstatus") === "F").as("n_finished"))
      .orderBy("o_orderpriority")

  private def qAggDistinct: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(col("l_partkey")).as("n_part"))
      .orderBy("l_returnflag")

  private def qAggHaving: QFn = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
      .where(col("n_cust") >= 5)
      .orderBy("c_nationkey")

  private def qAggRollup: QFn = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_rows"))
      .select(coalesce(col("r_name"), lit("ALL")).as("grp_region"),
        coalesce(col("n_name"), lit("ALL")).as("grp_nation"),
        col("n_rows"))
      .orderBy("grp_region", "grp_nation")

  private def qAggCube: QFn = (s, d) =>
    Tables.customer(s, d)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("grp_segment"),
        coalesce(col("c_nationkey"), lit(-1)).as("grp_nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy("grp_segment", "grp_nation")

  private def qAggGroupingSets: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS grp_flag,
        |       coalesce(l_linestatus, 'ALL') AS grp_status,
        |       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY grp_flag, grp_status""".stripMargin)
  }

  private def qAggPercentile: QFn = (s, d) =>
    // exact percentile buffers every value per group — widen the narrow
    // scan so the map-side buffer build parallelizes, and ask for BOTH
    // percentiles from ONE buffer (two separate percentile() aggs would
    // each collect the full group)
    Tables.spread(s, Tables.lineitem(s, d))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("median_price"),
        round(element_at(col("ps"), 2), 4).as("p90_price"))
      .orderBy("l_returnflag")

  /** Approximate distinct (HLL) — non-oracle; exact twin is q_agg_distinct. */
  private def qAggApprox: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  /** Approximate percentile (QuantileSummaries sketch) — non-oracle like
    * the HLL twin, but the EXACT percentile is computed in the same query
    * and a within-1% gate column makes the driver's rows>0 check a real
    * quality signal. At 100 TB the sketch is the only viable shape: a
    * constant-size mergeable summary per partition instead of buffering
    * every value per group. */
  private def qAggApproxPct: QFn = (s, d) =>
    Tables.spread(s, Tables.lineitem(s, d))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_approx"),
        expr("percentile(l_extendedprice, 0.5D)").as("p50_exact"))
      .select(col("l_returnflag"),
        round(col("p50_approx"), 4).as("p50_approx"),
        round(col("p50_exact"), 4).as("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") <= 0.01)
          .as("within_1pct"))
      .orderBy("l_returnflag")

  // --------------------------------------------------------------- set ops
  private def qUnion: QFn = (s, d) =>
    Tables.customer(s, d).select(col("c_custkey").as("id"), col("c_name").as("name"))
      .unionAll(Tables.supplier(s, d).select(col("s_suppkey").as("id"), col("s_name").as("name")))
      .orderBy("id", "name")

  private def qIntersect: QFn = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** Customers ordering late but never early. EXCEPT over a column
    * where the two sides genuinely diverge at every SF — the old
    * customer-nations-minus-supplier-nations shape was empty everywhere
    * (every nation has suppliers), making its oracle pass vacuous. */
  private def qExcept: QFn = (s, d) => {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01")))
      .select(col("o_custkey").as("custkey"))
      .except(o.filter(col("o_orderdate") < to_timestamp_ntz(lit("1996-01-01")))
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  // ------------------------------------------------------- sort / limit
  private def qSortMulti: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .orderBy(asc_nulls_first("l_returnflag"), desc("l_quantity"),
        asc("l_orderkey"), asc("l_linenumber"))

  private def qLimitTopk: QFn = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)

  // ------------------------------------------------------------- contract
  val queries: Map[String, QFn] = Map(
    "q_scan_project"      -> qScanProject,
    "q_filter_pred"       -> qFilterPred,
    "q_filter_in_null"    -> qFilterInNull,
    "q_join_inner"        -> qJoinInner,
    "q_join_multiway"     -> qJoinMultiway,
    "q_join_left"         -> qJoinLeft,
    "q_join_right"        -> qJoinRight,
    "q_join_full"         -> qJoinFull,
    "q_join_semi"         -> qJoinSemi,
    "q_join_anti"         -> qJoinAnti,
    "q_join_cross"        -> qJoinCross,
    "q_join_theta"        -> qJoinTheta,
    "q_join_range"        -> qJoinRange,
    "q_join_asof"         -> qJoinAsof,
    "q_join_skew_salted"  -> qJoinSkewSalted,
    "q_agg_global"        -> qAggGlobal,
    "q_agg_groupby"       -> qAggGroupby,
    "q_agg_pivot"         -> qAggPivot,
    "q_agg_bool"          -> qAggBool,
    "q_agg_distinct"      -> qAggDistinct,
    "q_agg_having"        -> qAggHaving,
    "q_agg_rollup"        -> qAggRollup,
    "q_agg_cube"          -> qAggCube,
    "q_agg_grouping_sets" -> qAggGroupingSets,
    "q_agg_percentile"    -> qAggPercentile,
    "q_agg_approx"        -> qAggApprox,
    "q_agg_approx_pct"    -> qAggApproxPct,
    "q_union"             -> qUnion,
    "q_intersect"         -> qIntersect,
    "q_except"            -> qExcept,
    "q_sort_multi"        -> qSortMulti,
    "q_limit_topk"        -> qLimitTopk,
  )

  /** Observed HLL counts per scale factor. approx_count_distinct IS
    * deterministic for fixed data: HLL register updates are a max —
    * commutative and idempotent — so partition layout cannot change the
    * estimate (verified identical across local[4]/local[32] at every
    * SF). The cross-ENGINE value still differs (DuckDB's HLL is a
    * different sketch), so the oracle is an observed-values pin, like
    * the zorder skip counts. approx_percentile stays non-oracle: its
    * QuantileSummaries merge is partition-order-dependent (measured
    * 52877.09 vs 52874.26 at sf0.1 between local[4] and local[32]) —
    * its within-1%-of-exact gate is the honest check. */
  private val approxObserved: Map[String, Seq[(String, Long)]] = Map(
    "sf0.001" -> Seq("A" -> 195L, "N" -> 195L, "R" -> 195L),
    "sf0.01"  -> Seq("A" -> 1947L, "N" -> 1947L, "R" -> 1947L),
    "sf0.1"   -> Seq("A" -> 19459L, "N" -> 19522L, "R" -> 19522L),
    "sf1"     -> Seq("A" -> 192709L, "N" -> 192709L, "R" -> 192709L))

  private def approxOracle: Map[String, String] = {
    val tag = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.sfdir", "/root/testdata/sf0.01"))
      .getFileName.toString
    approxObserved.get(tag).map { rows =>
      "q_agg_approx" -> ("SELECT * FROM (VALUES\n" + rows.map {
        case (f, n) => s"  ('$f', CAST($n AS BIGINT))"
      }.mkString(",\n") +
        ")\n  t(l_returnflag, approx_parts)\nORDER BY l_returnflag")
    }.toMap
  }

  def oracles: Map[String, String] = approxOracle ++ Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,
    "q_filter_in_null" ->
      """SELECT c_custkey, c_mktsegment,
        |       CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |  AND (c_acctbal < 0 OR round(c_acctbal, 2) > 100)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_multiway" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_name
        |FROM (SELECT * FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey IS NULL
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(sk, ck) AS nationkey,
        |       coalesce(n_suppliers, 0) AS n_suppliers,
        |       coalesce(n_customers, 0) AS n_customers
        |FROM (SELECT s_nationkey AS sk, CAST(count(*) AS BIGINT) AS n_suppliers
        |      FROM supplier GROUP BY 1) s
        |FULL JOIN (SELECT c_nationkey AS ck, CAST(count(*) AS BIGINT) AS n_customers
        |           FROM customer GROUP BY 1) c
        |ON sk = ck
        |ORDER BY nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY nation_a, nation_b""".stripMargin,
    "q_join_range" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo, count(*) AS n_items
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,
    // the PLAIN join: salting must be semantically invisible
    "q_join_skew_salted" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_global" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(min(l_extendedprice), 2) AS min_price,
        |       round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem""".stripMargin,
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_bool" ->
      """SELECT o_orderpriority,
        |       bool_and(o_totalprice > 1000) AS all_over_1k,
        |       bool_or(o_totalprice > 400000) AS any_over_400k,
        |       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_having" ->
      """SELECT c_nationkey, count(*) AS n_cust FROM customer
        |GROUP BY c_nationkey HAVING count(*) >= 5 ORDER BY c_nationkey""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS grp_region,
        |       coalesce(n_name, 'ALL') AS grp_nation, count(*) AS n_rows
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY grp_region, grp_nation""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS grp_segment,
        |       coalesce(c_nationkey, -1) AS grp_nation,
        |       count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |GROUP BY CUBE (c_mktsegment, c_nationkey)
        |ORDER BY grp_segment, grp_nation""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS grp_flag,
        |       coalesce(l_linestatus, 'ALL') AS grp_status,
        |       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY grp_flag, grp_status""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_union" ->
      """SELECT id, name FROM (
        |  SELECT c_custkey AS id, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, s_name AS name FROM supplier)
        |ORDER BY id, name""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |ORDER BY custkey""".stripMargin,
    "q_sort_multi" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC NULLS FIRST, l_quantity DESC,
        |         l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "q_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
  )
}
