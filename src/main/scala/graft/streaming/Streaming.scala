package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.Tables.QFn

/** Structured Streaming surface (SURVEY.md §2.H H5/H6). The reference has
  * no streaming runtime — these carry the declared contract's
  * streaming-shaped ops natively: event-time watermarking with late-data
  * drop, and stateful streaming dedup. Non-oracle (DuckDB has no streaming
  * semantics); inputs are fixed literals so results are deterministic.
  *
  * Scale: both are keyed stateful operators — state lives in the state
  * store partitioned by group key, and the watermark bounds state size,
  * which is exactly what makes them viable on an unbounded 100 TB/day
  * stream.
  */
object Streaming {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  /** st_watermark: 10-minute tumbling counts with a 5-minute watermark.
    * A late event is only DROPPED once the watermark has passed its
    * window's END (append-mode finalization) — an event merely below the
    * watermark but inside a still-open window is accepted. The batches
    * below stage exactly that: the 00:03 event arrives when the watermark
    * is 00:20 ≥ its window end 00:10, so the finalized 00:00 window stays
    * at 2. */
  def stWatermark: QFn = (s, _) => {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
      .select(col("window.start").as("w_start"), col("k"), col("count").as("n"))
    val q = counts.writeStream
      .format("memory").queryName("st_watermark_sink").outputMode("append").start()
    try {
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b")) // watermark → 00:06
      q.processAllAvailable()
      input.addData((ts(25), "b")) // watermark → 00:20; finalizes w[00:00] and w[00:10]
      q.processAllAvailable()
      input.addData((ts(3), "a"), // LATE: w end 00:10 < watermark 00:20 ⇒ dropped
        (ts(40), "c")) // watermark → 00:35; finalizes w[00:20]
      q.processAllAvailable()
    } finally q.stop()
    s.table("st_watermark_sink").orderBy("w_start", "k")
  }

  /** st_dedup: dropDuplicatesWithinWatermark on event ids — duplicates in
    * later micro-batches (within the watermark) are suppressed. */
  def stDedup: QFn = (s, _) => {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = input.toDF().toDF("ts", "event_id", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .format("memory").queryName("st_dedup_sink").outputMode("append").start()
    try {
      input.addData((ts(1), 1L, "first"), (ts(2), 2L, "first"))
      q.processAllAvailable()
      input.addData((ts(3), 1L, "dup-dropped"), (ts(4), 3L, "first"))
      q.processAllAvailable()
    } finally q.stop()
    s.table("st_dedup_sink").select("event_id", "payload").orderBy("event_id")
  }

  val queries: Map[String, QFn] = Map(
    "st_watermark" -> stWatermark,
    "st_dedup"     -> stDedup,
  )
}
