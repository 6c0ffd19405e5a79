package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.QFn

/** Window functions (SURVEY.md §2.F) and batch time-series windows (§2.H).
  *
  * The reference serves these through its Spark SQL Thrift surface
  * (`/root/reference/entrypoint-spark.sh:73`); Superset time-grain charts
  * are the H1-H4 shapes. All orderings inside window specs include a unique
  * tiebreak column so `row_number`/`ntile` are deterministic (SURVEY §5.3.1).
  *
  * Scale: every window here partitions by a grouping key (segment / user /
  * custkey), so state is bounded per key and the sort is a per-partition
  * sort after one hash shuffle — no global sort except the final ORDER BY,
  * which at 100 TB would be the consumer's LIMIT/pagination problem.
  */
object Windows {

  private def qWinRank: QFn = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), round(col("c_acctbal"), 2).as("bal"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 10)
      .orderBy("c_mktsegment", "rn")
  }

  private def qWinLagLead: QFn = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy("event_id")
  }

  private def qWinFrameRows: QFn = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 4).as("mov_avg3"))
      .orderBy("event_id")
  }

  /** RANGE frame running total: peers (equal o_orderdate) share the value. */
  private def qWinRunning: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(asc("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy("o_orderkey")
  }

  /** Distribution windows partitioned by segment — an unpartitioned
    * ntile/percent_rank forces every row into ONE task, which is the
    * classic 100 TB window failure; per-segment distribution scales and
    * exercises the same builtins. */
  private def qWinNtile: QFn = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(asc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  private def qTopkPerGroup: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  // ------------------------------------------------- batch time-series (H)

  private def qWindowTumbling: QFn = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("n_events"), col("sum_value"))
      .orderBy("w_start")

  /** Sliding 1h window every 30min — each event lands in 2 windows. */
  private def qWindowSliding: QFn = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("n_events"))
      .orderBy("w_start")

  /** Session windows with a 30-minute gap, per user (works in batch). */
  private def qWindowSession: QFn = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"), col("n_events"))
      .orderBy("user_id", "s_start")

  /** Latest event per user — streaming-shaped dedup in batch form. */
  /** first/last/nth analytic values over a frame pinned to the whole
    * partition (last_value needs unbounded following to be well-defined). */
  private def qWinFirstLast: QFn = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy("user_id", "event_id")
  }

  private def qDedupLatest: QFn = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts")
      .orderBy("user_id")
  }

  val queries: Map[String, QFn] = Map(
    "q_win_rank"        -> qWinRank,
    "q_win_lag_lead"    -> qWinLagLead,
    "q_win_frame_rows"  -> qWinFrameRows,
    "q_win_running"     -> qWinRunning,
    "q_win_ntile"       -> qWinNtile,
    "q_topk_per_group"  -> qTopkPerGroup,
    "q_window_tumbling" -> qWindowTumbling,
    "q_window_sliding"  -> qWindowSliding,
    "q_window_session"  -> qWindowSession,
    "q_win_firstlast"   -> qWinFirstLast,
    "q_dedup_latest"    -> qDedupLatest,
  )

  val oracles: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT c_mktsegment, c_custkey, bal, rnk, drnk, rn FROM (
        |  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal,
        |         CAST(rank() OVER w AS INTEGER) AS rnk,
        |         CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |         CAST(row_number() OVER w AS INTEGER) AS rn
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC))
        |WHERE rn <= 10 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT event_id, user_id, value,
        |       lag(value, 1) OVER w AS prev_value,
        |       lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_win_frame_rows" ->
      """SELECT event_id, user_id, round(avg(value) OVER w, 4) AS mov_avg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_orderkey, o_custkey, round(sum(o_totalprice) OVER w, 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_firstlast" ->
      """SELECT user_id, event_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type,
        |       nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_sliding" ->
      """SELECT make_timestamp((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT)
        |         - k.k) * 1800 * 1000000) AS w_start,
        |       count(*) AS n_events
        |FROM events, (VALUES (0), (1)) k(k)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                 >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sessions AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
    "q_dedup_latest" ->
      """SELECT user_id, event_id, ts FROM (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
  )
}
