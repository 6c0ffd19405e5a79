package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.QFn

/** Analytic SQL surface the reference serves through its delegated Spark
  * SQL endpoint but that no declared query exercised yet (SURVEY.md §2.M):
  * correlated/NOT-IN subqueries, multi-CTE reuse, lateral explode,
  * statistical aggregates, unpivot, stratified sampling, and time-series
  * resampling with gap fill. The reference's BI path
  * (`/root/reference/entrypoint-spark.sh:71-73`) accepts arbitrary
  * Superset-generated SQL, which routinely contains every one of these
  * shapes — they are contract surface, not extras.
  *
  * Scale notes (100 TB):
  *  - Subqueries are declared as SQL text and DECORRELATED by Catalyst into
  *    keyed aggregate+join plans — no per-row re-execution, no cartesian
  *    (PlanSpec pins both).
  *  - The NOT IN form exercises Spark's null-aware anti join: the single
  *    build side is broadcast, the probe side streams.
  *  - Resampling generates each key's hour grid from its OWN span
  *    (`sequence` + `explode`, partition-local after one keyed agg), so
  *    grid size is O(active span), never O(global span × keys); the
  *    forward-fill window partitions by key — no global sort.
  */
object Analytics {

  /** Temp views for the SQL-text queries, prefixed to avoid colliding with
    * other declared queries sharing the Verify/Bench session. */
  private def view(s: SparkSession, d: String, t: String): String = {
    val name = s"an_$t"
    Tables.table(s, d, t).createOrReplaceTempView(name)
    name
  }

  /** q_subquery_scalar: correlated scalar aggregate subquery — customers
    * above their own nation's mean balance. Catalyst decorrelates to a
    * per-nation aggregate joined back on the correlation key. The mean is
    * ROUNDED to 4 decimals before the comparison (in both engines):
    * boundary membership against a raw double avg would depend on float
    * summation order, which differs across engines and partition layouts
    * — the repo's rounded-comparison-key convention (round-9 advice). */
  private def qSubqueryScalar: QFn = (s, d) => {
    val c = view(s, d, "customer")
    s.sql(
      s"""SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
         |FROM $c c
         |WHERE c_acctbal > round((SELECT avg(c2.c_acctbal) FROM $c c2
         |                         WHERE c2.c_nationkey = c.c_nationkey), 4)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** q_subquery_notin: NOT IN subquery — null-aware anti-join semantics
    * (one NULL in the subquery result empties the output; o_custkey is
    * nullable by schema, so Spark must plan the null-aware variant). */
  private def qSubqueryNotin: QFn = (s, d) => {
    val c = view(s, d, "customer")
    val o = view(s, d, "orders")
    s.sql(
      s"""SELECT c_custkey, c_name FROM $c
         |WHERE c_custkey NOT IN
         |  (SELECT o_custkey FROM $o WHERE o_totalprice > 400000)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** q_cte_multi: one CTE referenced twice (directly and through a second
    * CTE) — monthly revenue by priority with each priority's share of its
    * month. */
  private def qCteMulti: QFn = (s, d) => {
    val o = view(s, d, "orders")
    s.sql(
      s"""WITH mo AS (
         |  SELECT date_trunc('month', o_orderdate) AS mo,
         |         o_orderpriority AS prio,
         |         sum(o_totalprice) AS rev, count(*) AS n_orders
         |  FROM $o GROUP BY 1, 2),
         |tot AS (SELECT mo, sum(rev) AS mo_rev FROM mo GROUP BY 1)
         |SELECT mo.mo, mo.prio, round(mo.rev, 2) AS rev, mo.n_orders,
         |       round(mo.rev / tot.mo_rev, 4) AS share
         |FROM mo JOIN tot ON mo.mo = tot.mo
         |ORDER BY mo, prio""".stripMargin)
  }

  /** q_lateral_explode: positional lateral expansion — first five
    * whitespace tokens of each document with their positions. The
    * `Generate` runs map-side; the only exchange is the declared sort. */
  private def qLateralExplode: QFn = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("pos") < 5 && col("tok") =!= "")
      .orderBy("doc_id", "pos")

  /** q_agg_stats: statistical aggregates — correlation, sample
    * covariance/variance/stddev, regression slope — of quantity vs
    * extended price per return flag. All mergeable partial aggregates
    * (map-side combine), exactly like sum/count at scale. */
  private def qAggStats: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope_pq"))
      .orderBy("l_returnflag")

  /** q_agg_unpivot: wide→long reshape of per-nation supplier/customer
    * counts (the inverse of q_agg_pivot). Map-side only after the two
    * keyed aggregates. */
  private def qAggUnpivot: QFn = (s, d) => {
    val sc = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("suppliers"))
    val cc = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("customers"))
    sc.join(cc, Seq("nationkey"), "full")
      .select(col("nationkey"),
        coalesce(col("suppliers"), lit(0L)).as("suppliers"),
        coalesce(col("customers"), lit(0L)).as("customers"))
      .unpivot(Array(col("nationkey")),
        Array(col("suppliers"), col("customers")), "metric", "n")
      .orderBy("nationkey", "metric")
  }

  /** q_sample_stratified: per-stratum sampling rates (en 50%, de 20%,
    * rest 10%) over the same deterministic md5 draw as q_sample_split —
    * the "rebalance a multilingual corpus" shape. Map-side draw + one
    * keyed agg. */
  private def qSampleStratified: QFn = (s, d) => {
    val draw = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)") % 100
    Tables.documents(s, d)
      .withColumn("draw", draw)
      .withColumn("rate",
        when(col("lang") === "en", 50)
          .when(col("lang") === "de", 20).otherwise(10))
      .filter(col("draw") < col("rate"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang", "source")
  }

  /** q_ts_resample: hourly resample of per-user event values with gap fill
    * and forward fill (last observation carried forward). Each user's hour
    * grid spans their OWN first..last active hour. The resampled value is
    * a SUM (not avg): inputs carry two decimals, so the hourly sum stays
    * on the two-decimal grid and `round(_, 2)` never sits on a half-way
    * boundary — an avg of two such values lands exactly on .xx5, where
    * the engines' tie-break conventions differ. */
  private def qTsResample: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n_events"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("is_gap", col("v").isNull)
      .select(col("user_id"), col("hr"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ff"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("is_gap"))
      .orderBy("user_id", "hr")
  }

  /** q_agg_listagg: ordered string aggregation (LISTAGG/STRING_AGG — the
    * BI "show me the members" cell). Deterministic via array_sort before
    * the join: collect_list order is partition-dependent, the sorted
    * array is not. Bounded output: one row per region. */
  private def qAggListagg: QFn = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
        .as("nations"), count(lit(1)).as("n_nations"))
      .orderBy("r_name")

  /** q_agg_histogram: fixed-width value histogram of order totals — the
    * distribution profile every corpus/feature analysis starts with.
    * Integer bucket ids from floor-division keep both engines exact;
    * per-bucket min/max round-trip the bucket bounds. Map-side bucket
    * assignment + one keyed agg. */
  private def qAggHistogram: QFn = (s, d) =>
    Tables.orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("bucket")

  /** q_sql_params: named-parameter SQL (`:seg`, `:minbal`) — the bind
    * path every BI client uses; parameters reach Catalyst as literals, so
    * pushdown/pruning work exactly as with inline constants. */
  private def qSqlParams: QFn = (s, d) => {
    val c = view(s, d, "customer")
    s.sql(
      s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
         |FROM $c WHERE c_mktsegment = :seg AND c_acctbal > :minbal
         |ORDER BY c_custkey""".stripMargin,
      Map("seg" -> "BUILDING", "minbal" -> Int.box(5000)))
  }

  /** q_json_variant: the Spark 4 VARIANT path over semi-structured props
    * (`parse_json` → `variant_get`) — the modern replacement for
    * string-path JSON extraction (q_json_funcs covers the classic form);
    * deciles of the extracted int keep the result integral. */
  private def qJsonVariant: QFn = (s, d) =>
    Tables.events(s, d)
      .select(expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy(floor(col("k") / 10).cast("long").as("decile"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("decile")

  /** q_subquery_exists (M13): correlated EXISTS + NOT EXISTS in one
    * predicate — customers with at least one >150k order and no
    * fulfilled >250k order. Catalyst plans the pair as a left-semi and a
    * left-anti join on the correlation key (no null-aware complication,
    * unlike NOT IN — the three-valued-logic contrast q_subquery_notin
    * pins); both subquery scans carry their price filters pushed down.
    * Thresholds sit INSIDE every fixture's price distribution so BOTH
    * branches fire at every SF — the old 300k/500k pair made the
    * NOT EXISTS side vacuous everywhere (no order tops 500k at any SF)
    * and the whole result empty at sf1, the 0≡0 oracle-strength hole
    * the round-13 verdict flagged on the join family. */
  private def qSubqueryExists: QFn = (s, d) => {
    val c = view(s, d, "customer")
    val o = view(s, d, "orders")
    s.sql(
      s"""SELECT c_custkey, c_name FROM $c c
         |WHERE EXISTS (SELECT 1 FROM $o o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > 150000)
         |  AND NOT EXISTS (SELECT 1 FROM $o o2
         |                  WHERE o2.o_custkey = c.c_custkey
         |                    AND o2.o_orderstatus = 'F'
         |                    AND o2.o_totalprice > 250000)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** q_win_range_interval (M14): a TIME-based RANGE window frame — each
    * event's rolling 1-hour per-user sum (`RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING AND CURRENT ROW`), the continuous-time sliding aggregate
    * BI tools emit for "last hour" tiles (q_window_sliding covers the
    * discretized bucket form). The frame is defined by the ORDER BY
    * VALUE, so tied timestamps all enter the frame together — no
    * tie-order hazard — and the summed quantity is integer CENTS
    * (`round(value*100)`), so the rolling sum is exact in both engines
    * regardless of accumulation order. One user-keyed shuffle. */
  private def qWinRangeInterval: QFn = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("an_events_ri")
    s.sql(
      """SELECT event_id, user_id, ts,
        |       sum(cast(round(value * 100) as bigint)) OVER (
        |         PARTITION BY user_id ORDER BY ts
        |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        |       ) AS roll_cents
        |FROM an_events_ri ORDER BY event_id""".stripMargin)
  }

  /** q_agg_filter (M15): per-aggregate FILTER clauses + GROUP BY ALL —
    * the modern-SQL aggregate surface BI generators emit (conditional
    * counts without CASE scaffolding, grouping keys inferred from the
    * projection). Money sums as integer CENTS so no float accumulation
    * order can split the engines. */
  private def qAggFilter: QFn = (s, d) => {
    val o = view(s, d, "orders")
    s.sql(
      s"""SELECT o_orderpriority,
         |       count(*) AS n_orders,
         |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
         |       coalesce(sum(cast(round(o_totalprice * 100) as bigint))
         |                FILTER (WHERE o_orderstatus = 'F'), 0) AS cents_fulfilled
         |FROM $o GROUP BY ALL ORDER BY o_orderpriority""".stripMargin)
  }

  /** q_win_named (M16): the `WINDOW` clause — one named frame shared by
    * several window functions, the de-duplicated form BI generators and
    * hand-written analytics both emit. Ordering key (ts, event_id) is a
    * total order and the offset quantity is integer cents, so rank and
    * first_value are layout-independent in both engines. */
  private def qWinNamed: QFn = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("an_events_wn")
    s.sql(
      """SELECT event_id, user_id,
        |       rank() OVER w AS rk,
        |       cast(round(value * 100) as bigint)
        |         - first_value(cast(round(value * 100) as bigint)) OVER w
        |         AS cents_vs_first
        |FROM an_events_wn
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin)
  }

  val queries: Map[String, QFn] = Map(
    "q_win_named"         -> qWinNamed,
    "q_agg_filter"        -> qAggFilter,
    "q_subquery_exists"   -> qSubqueryExists,
    "q_win_range_interval" -> qWinRangeInterval,
    "q_subquery_scalar"   -> qSubqueryScalar,
    "q_subquery_notin"    -> qSubqueryNotin,
    "q_cte_multi"         -> qCteMulti,
    "q_lateral_explode"   -> qLateralExplode,
    "q_agg_stats"         -> qAggStats,
    "q_agg_unpivot"       -> qAggUnpivot,
    "q_sample_stratified" -> qSampleStratified,
    "q_ts_resample"       -> qTsResample,
    "q_agg_listagg"       -> qAggListagg,
    "q_agg_histogram"     -> qAggHistogram,
    "q_sql_params"        -> qSqlParams,
    "q_json_variant"      -> qJsonVariant,
  )

  def oracles: Map[String, String] = Map(
    "q_win_named" ->
      """SELECT event_id, user_id,
        |       CAST(rank() OVER w AS INT) AS rk,
        |       CAST(round(value * 100) AS BIGINT)
        |         - first_value(CAST(round(value * 100) AS BIGINT)) OVER w
        |         AS cents_vs_first
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_agg_filter" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_orders,
        |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                     FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
        |         AS cents_fulfilled
        |FROM orders GROUP BY ALL ORDER BY o_orderpriority""".stripMargin,
    "q_subquery_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F'
        |                    AND o2.o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q_win_range_interval" ->
      """SELECT event_id, user_id, ts,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |         PARTITION BY user_id ORDER BY ts
        |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        |       ) AS BIGINT) AS roll_cents
        |FROM events ORDER BY event_id""".stripMargin,
    "q_sql_params" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        |FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,
    "q_json_variant" ->
      """SELECT CAST(floor(k / 10) AS BIGINT) AS decile, count(*) AS n,
        |       min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY decile""".stripMargin,
    "q_agg_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |       CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |       count(*) AS n_orders,
        |       round(min(o_totalprice), 2) AS lo,
        |       round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
        |FROM customer c
        |WHERE c_acctbal > round((SELECT avg(c2.c_acctbal) FROM customer c2
        |                         WHERE c2.c_nationkey = c.c_nationkey), 4)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_notin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_cte_multi" ->
      """WITH mo AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
        |         o_orderpriority AS prio,
        |         sum(o_totalprice) AS rev, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT mo, sum(rev) AS mo_rev FROM mo GROUP BY 1)
        |SELECT mo.mo, mo.prio, round(mo.rev, 2) AS rev, mo.n_orders,
        |       round(mo.rev / tot.mo_rev, 4) AS share
        |FROM mo JOIN tot ON mo.mo = tot.mo
        |ORDER BY mo.mo, mo.prio""".stripMargin,
    "q_lateral_explode" ->
      """SELECT doc_id, i - 1 AS pos, toks[i] AS tok
        |FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |      FROM documents)
        |CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS i)
        |WHERE i <= len(toks) AND toks[i] <> ''
        |ORDER BY doc_id, pos""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |       round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_unpivot" ->
      """WITH wide AS (
        |  SELECT coalesce(sk, ck) AS nationkey,
        |         coalesce(suppliers, 0) AS suppliers,
        |         coalesce(customers, 0) AS customers
        |  FROM (SELECT s_nationkey AS sk, CAST(count(*) AS BIGINT) AS suppliers
        |        FROM supplier GROUP BY 1) s
        |  FULL JOIN (SELECT c_nationkey AS ck, CAST(count(*) AS BIGINT) AS customers
        |             FROM customer GROUP BY 1) c ON sk = ck)
        |SELECT nationkey, 'suppliers' AS metric, suppliers AS n FROM wide
        |UNION ALL
        |SELECT nationkey, 'customers' AS metric, customers AS n FROM wide
        |ORDER BY nationkey, metric""".stripMargin,
    "q_sample_stratified" ->
      """WITH drawn AS (
        |  SELECT lang, source, n_chars,
        |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |           % 100 AS draw,
        |         CASE WHEN lang = 'en' THEN 50
        |              WHEN lang = 'de' THEN 20 ELSE 10 END AS rate
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM drawn WHERE draw < rate
        |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    "q_ts_resample" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |         round(sum(value), 2) AS v, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
        |  FROM (SELECT user_id, min(hr) AS mn, max(hr) AS mx
        |        FROM hourly GROUP BY 1))
        |SELECT g.user_id, CAST(g.hr AS TIMESTAMP) AS hr,
        |       last_value(h.v IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff,
        |       coalesce(h.n, 0) AS n_events,
        |       h.v IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
  )
}
