package graft.streaming

import graft.SparkSpec

/** Structured-Streaming semantics (SURVEY.md §2.H H5/H6): watermark
  * late-data drop and stateful dedup, driven through MemoryStream exactly
  * as the declared contract runs them.
  */
class StreamingSpec extends SparkSpec {

  test("st_watermark: late event below the watermark is dropped") {
    val rows = Streaming.stWatermark(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2)))
    // The 00:03 "a" arrives after the watermark passed 00:06 ⇒ the
    // finalized 00:00 window still counts 2, not 3.
    assert(rows.toSeq === Seq(
      ("2024-01-01T00:00:00Z", "a", 2L),
      ("2024-01-01T00:10:00Z", "b", 1L),
      ("2024-01-01T00:20:00Z", "b", 1L)))
  }

  test("st_dedup: duplicate event id in a later micro-batch is suppressed") {
    val rows = Streaming.stDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "first"), (2L, "first"), (3L, "first")))
  }
}
