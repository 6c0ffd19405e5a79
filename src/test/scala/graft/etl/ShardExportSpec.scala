package graft.etl

import graft.SparkSpec

/** etl_shard_export (SURVEY L42): deterministic training-shard export —
  * one clustered partitioned write, one catalog snapshot, one file per
  * shard, shard membership a pure function of doc_id. */
class ShardExportSpec extends SparkSpec {

  test("etl_shard_export: 8 shards, one file each, all docs accounted for") {
    val rows = graft.queries.Etl.queries("etl_shard_export")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 7L))
    // every document lands in exactly one shard
    val total = rows.map(_.getLong(1)).sum
    assert(total === graft.Tables.documents(spark, sfDir).count())
    // the manifest census invariant: exactly one data file per shard
    assert(rows.forall(_.getBoolean(4)))
    // shard assignment is deterministic: a second export agrees per shard
    val again = graft.queries.Etl.queries("etl_shard_export")(spark, sfDir)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq)
  }

  test("etl_jsonl_export: same membership as the parquet export, bytes stable") {
    val jsonl = graft.queries.Etl.queries("etl_jsonl_export")(spark, sfDir)
      .collect()
    assert(jsonl.map(_.getLong(0)).toSeq === (0L to 7L))
    assert(jsonl.map(_.getLong(1)).sum ===
      graft.Tables.documents(spark, sfDir).count())
    assert(jsonl.forall(_.getBoolean(3)), "one text file per shard dir")
    // the md5 draw is shared with etl_shard_export: per-shard doc counts
    // must agree between the two formats
    val parquet = graft.queries.Etl.queries("etl_shard_export")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    jsonl.foreach(r => assert(parquet(r.getLong(0)) === r.getLong(1)))
    // serialized bytes are stable: a re-export reproduces every checksum
    val again = graft.queries.Etl.queries("etl_jsonl_export")(spark, sfDir)
      .collect()
    assert(jsonl.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }
}
