package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import graft.Tables
import graft.Tables.QFn

/** Scalar function families (SURVEY.md §2.G) — string, date/time, math,
  * conditional, cast, array, map, JSON. All served by the reference's
  * delegated SQL surface (`/root/reference/entrypoint-spark.sh:73`) and
  * emitted freely by Superset's chart builder.
  *
  * Everything here is a single codegen'd projection over one scan — at
  * 100 TB these are the cheap queries; the only cost is the final global
  * sort, which the oracle contract requires (SURVEY §5.3.1).
  */
object Scalars {

  private def qStrFuncs: QFn = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 8).as("name_snip"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_brand"), "#", "-").as("brand_dash"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        col("p_name").like("%green%").as("is_green"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(split(col("p_type"), " ")).as("n_type_words"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
      .orderBy("p_partkey")

  private def qDateFuncs: QFn = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"),
        to_date(col("o_orderdate")).as("as_date"))
      .orderBy("o_orderkey")

  private def qMathFuncs: QFn = (s, d) =>
    // expression-heavy over a narrow scan: widen before computing
    Tables.spread(s, Tables.lineitem(s, d))
      .select(col("l_orderkey"), col("l_linenumber"),
        // prices carry 2 decimals, so rounding at 3 never hits a decimal
        // halfway point (where Spark/DuckDB double-rounding can diverge)
        round(col("l_extendedprice"), 3).as("price_r3"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(exp(col("l_discount")), 6).as("disc_exp"),
        (col("l_partkey") % 7).as("part_mod7"))
      // total order: the key pair is non-unique in the synthetic lineitem
      .orderBy("l_orderkey", "l_linenumber", "price_r3", "disc_dev", "qty_sq",
        "part_mod7")

  private def qCaseCoalesce: QFn = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
        when(col("o_orderpriority").isNull, "none")
          .otherwise(col("o_orderpriority")).as("prio"))
      .orderBy("o_orderkey")

  private def qCastTypes: QFn = (s, d) =>
    Tables.spread(s, Tables.lineitem(s, d))
      .select(col("l_orderkey"), col("l_linenumber"),
        // exercise the decimal cast, but ship it as a string: the driver's
        // hash canonicalization treats Spark decimals and DuckDB decimals
        // differently (round-1 RED), while the rendered text is identical
        col("l_quantity").cast(DecimalType(12, 2)).cast("string").as("qty_dec"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_linenumber").cast(LongType).as("line_big"),
        col("l_linenumber").cast("double").as("line_dbl"),
        col("l_orderkey").cast("string").as("key_str"))
      .orderBy("l_orderkey", "l_linenumber", "qty_dec", "ship_date")

  private def qArrayFuncs: QFn = (s, d) =>
    // `+ 0.0` after each round: a tiny negative float rounds to -0.0, and
    // the engines disagree on keeping the sign (seen at sf0.1: Spark 0.0
    // vs DuckDB -0.0 hashing differently); IEEE -0.0 + 0.0 = +0.0 in both
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 4) + 0.0).as("first_val"),
        (round(element_at(col("embedding"), 3).cast("double"), 4) + 0.0).as("third_val"),
        size(slice(col("embedding"), 1, 8)).as("slice_len"),
        (round(array_max(col("embedding")).cast("double"), 4) + 0.0).as("max_val"),
        (round(array_min(col("embedding")).cast("double"), 4) + 0.0).as("min_val"))
      .orderBy("vec_id")

  /** Map construction + lookup (no map column ships in the data — same as
    * the reference, where maps only pass through ParquetSchemaUtil). */
  private def qMapFuncs: QFn = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        element_at(map(col("event_type"), col("value")), col("event_type")).as("mv"),
        size(map_keys(map(col("event_type"), col("value")))).as("nk"),
        element_at(expr("str_to_map('a:1,b:2', ',', ':')"), "b").as("m2"))
      .orderBy("event_id")

  private def qJsonFuncs: QFn = (s, d) =>
    // json parsing is the rare CPU-bound scalar op — widen the narrow scan
    Tables.spread(s, Tables.events(s, d))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_struct"))
      .orderBy("event_id")

  val queries: Map[String, QFn] = Map(
    "q_str_funcs"     -> qStrFuncs,
    "q_date_funcs"    -> qDateFuncs,
    "q_math_funcs"    -> qMathFuncs,
    "q_case_coalesce" -> qCaseCoalesce,
    "q_cast_types"    -> qCastTypes,
    "q_array_funcs"   -> qArrayFuncs,
    "q_map_funcs"     -> qMapFuncs,
    "q_json_funcs"    -> qJsonFuncs,
  )

  val oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_up,
        |       lower(p_type) AS type_lo,
        |       substring(p_name, 1, 8) AS name_snip,
        |       CAST(length(p_name) AS INTEGER) AS name_len,
        |       regexp_replace(p_brand, '#', '-', 'g') AS brand_dash,
        |       p_brand || '/' || p_type AS brand_type,
        |       p_name LIKE '%green%' AS is_green,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_type_words,
        |       trim('  ' || p_brand || '  ') AS brand_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(month(o_orderdate) AS INTEGER) AS mo,
        |       CAST(day(o_orderdate) AS INTEGER) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |       CAST(o_orderdate AS DATE) AS as_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice, 3) AS price_r3,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       round(abs(l_discount - 0.05), 4) AS disc_dev,
        |       round(pow(l_quantity, 2), 4) AS qty_sq,
        |       round(sqrt(l_extendedprice), 6) AS price_sqrt,
        |       round(ln(l_extendedprice), 6) AS price_ln,
        |       round(exp(l_discount), 6) AS disc_exp,
        |       l_partkey % 7 AS part_mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_r3, disc_dev, qty_sq, part_mod7""".stripMargin,
    "q_case_coalesce" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 200000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS size_class,
        |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |       CASE WHEN o_orderpriority IS NULL THEN 'none'
        |            ELSE o_orderpriority END AS prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_dec,
        |       CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(l_linenumber AS BIGINT) AS line_big,
        |       CAST(l_linenumber AS DOUBLE) AS line_dbl,
        |       CAST(l_orderkey AS VARCHAR) AS key_str
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_dec, ship_date""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INTEGER) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
        |       round(CAST(embedding[3] AS DOUBLE), 4) + 0.0 AS third_val,
        |       CAST(len(embedding[1:8]) AS INTEGER) AS slice_len,
        |       round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS max_val,
        |       round(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0 AS min_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id, value AS mv, 1 AS nk, '2' AS m2
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS BIGINT) AS k_val,
        |       CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS INTEGER) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
