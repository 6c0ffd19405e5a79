package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.QFn

/** Multimodal column plumbing (builder mandate): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs. The decode step
  * is a clearly-marked deterministic STUB (no media libs in this
  * container); everything Spark-side — schema, batch iteration shape,
  * partition-parallel decode, metadata struct — is real.
  *
  * In PySpark this is `mapInPandas` over Arrow batches; the JVM-native
  * analog used here is `mapPartitions` over a typed Dataset: one decoder
  * instance per partition, streaming through rows without materializing the
  * partition — the exact batch shape a real image decoder (per-partition
  * model/codec init, row-at-a-time decode) needs at 100 TB.
  */
object Multimodal {

  /** A decoded asset's metadata. A real decoder fills width/height/codec
    * from the byte stream; the stub derives them deterministically. */
  case class AssetMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       codec: String)

  // not `private`: Catalyst's generated deserializer needs public access
  case class RawAsset(doc_id: Long, payload: Array[Byte])

  /** STUB decoder — stands in for e.g. an image header parse. Deterministic
    * pure function of the bytes so results are oracle-checkable. */
  private def decodeStub(a: RawAsset): AssetMeta = {
    val n = a.payload.length
    AssetMeta(a.doc_id, n, 64 + n % 640, 64 + n % 480, "stub/raw")
  }

  /** Attach a binary payload column (here: utf8 text bytes standing in for
    * media bytes) and decode per-partition. */
  def decodeAssets(docs: DataFrame): Dataset[AssetMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[RawAsset]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec tables, model, …)
        it.map(decodeStub)
      }
  }

  /** q_multimodal_meta: binary ingest → per-partition decode → metadata
    * struct, oracle-checkable because the stub is pure arithmetic on
    * octet_length. */
  def qMultimodalMeta: QFn = (s, d) =>
    decodeAssets(Tables.documents(s, d)).toDF().orderBy("doc_id")

  val queries: Map[String, QFn] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(64 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST(64 + octet_length(encode(text)) % 480 AS INTEGER) AS height,
        |       'stub/raw' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
