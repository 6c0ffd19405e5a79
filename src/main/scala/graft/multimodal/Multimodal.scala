package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.QFn

/** Multimodal column plumbing (builder mandate): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs. IMAGES decode
  * for REAL — javax.imageio ships in the JDK, so [[qMultimodalDecode]]
  * runs an actual PNG header parse through the partition pipeline — and
  * so does AUDIO ([[qMultimodalAudio]] — javax.sound.sampled parses the
  * WAV container and the decoded PCM stream is checksummed end to end)
  * and the MULTI-FRAME video shape ([[qMultimodalVideo]] — animated GIF
  * through ImageIO's write-sequence/read APIs, the in-JDK frame-sequence
  * container; TRUE video codecs — H.264 etc. — genuinely aren't in this
  * container, and [[qMultimodalFrames]] keeps the clearly-marked
  * deterministic stub for that sampling arithmetic). Everything
  * Spark-side — schema, batch iteration shape, partition-parallel decode,
  * metadata struct — is real in every path.
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

  /** Resized asset: fit into a 224×224 box preserving aspect ratio — the
    * standard vision-model preprocessing shape. */
  case class ResizedMeta(doc_id: Long, width: Int, height: Int,
                         out_w: Int, out_h: Int)

  /** STUB resize — a real impl rescales pixels; the geometry arithmetic
    * (the part Spark sees) is the real thing. */
  private def resizeStub(m: AssetMeta, box: Int): ResizedMeta = {
    val scale = math.min(box.toDouble / m.width, box.toDouble / m.height)
    ResizedMeta(m.doc_id, m.width, m.height,
      math.floor(m.width * scale).toInt, math.floor(m.height * scale).toInt)
  }

  /** q_multimodal_resize: decode → per-partition resize, chained through
    * typed Datasets so both stages stay in one partition-local pipeline
    * (no shuffle between decode and transform — the property that matters
    * when each stage holds a codec or model instance at 100 TB). */
  def qMultimodalResize: QFn = (s, d) => {
    import s.implicits._
    decodeAssets(Tables.documents(s, d))
      .mapPartitions(_.map(resizeStub(_, 224)))
      .toDF().orderBy("doc_id")
  }

  /** A REAL decode's output: what the byte stream itself says. No
    * n_bytes column — the PNG encoder's exact byte count is an
    * implementation detail of the codec, not a property the oracle can
    * state; width/height/format ARE. */
  case class DecodedMeta(doc_id: Long, width: Int, height: Int, codec: String)

  /** REAL image decode: ImageIO header parse — reader discovery by byte
    * signature, then width/height/format from the stream WITHOUT a full
    * pixel decode (the production header-sniff shape: corpus triage
    * reads dimensions from millions of images without rasterizing
    * them). Fails loudly when no installed codec claims the bytes —
    * silently stubbing would report fake dimensions as real. */
  def decodeImage(a: RawAsset): DecodedMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(a.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"no installed codec claims doc ${a.doc_id}'s payload")
      val r = readers.next()
      try {
        r.setInput(iis)
        DecodedMeta(a.doc_id, r.getWidth(0), r.getHeight(0),
          r.getFormatName.toLowerCase)
      } finally r.dispose()
    } finally iis.close()
  }

  /** q_multimodal_decode: the REAL decode path end to end — each doc_id
    * deterministically renders a tiny RGB image (width = id%13+1,
    * height = id%7+1), encodes it to actual PNG bytes (javax.imageio,
    * in-JDK), and the second partition-local stage decodes those bytes
    * back with [[decodeImage]]. The oracle states the invariant that
    * makes a real decoder oracle-checkable: DECODED dimensions equal
    * ENCODED ones, a pure function of doc_id — while the payload bytes
    * themselves stay an internal codec detail (never compared, so the
    * query is robust to PNG-encoder variation). Both stages ride ONE
    * partition-local pipeline: no shuffle between encode and decode,
    * the property that matters when each stage holds a codec instance
    * at 100 TB. */
  def qMultimodalDecode: QFn = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // per-partition encoder init would go here (codec tables)
        it.map { id =>
          val w = (id % 13 + 1).toInt
          val h = (id % 7 + 1).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { // deterministic pixel fill
              img.setRGB(x, y, ((id + x * 31 + y * 17) % 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          RawAsset(id, bos.toByteArray)
        }
      }
      .mapPartitions(_.map(decodeImage))
      .toDF().orderBy("doc_id")
  }

  /** A REAL audio decode's output: the container header's format facts
    * plus a checksum over the decoded PCM samples themselves — header
    * AND payload round-trip, not just metadata. */
  case class AudioMeta(doc_id: Long, n_frames: Int, sample_rate: Int,
                       channels: Int, bits: Int, duration_ms: Int,
                       pcm_sum: Long)

  /** REAL audio decode: javax.sound.sampled parses the RIFF/WAVE
    * container (in-JDK, headless-safe — no mixer is touched), yields
    * the format facts, and the sample stream is read back in full for
    * the checksum. Fails loudly on any non-PCM-signed/-little-endian
    * payload — silently mis-summing big-endian bytes would report a
    * wrong checksum as real. */
  def decodeAudio(a: RawAsset): AudioMeta = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(a.payload))
    try {
      val f = ais.getFormat
      require(f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          !f.isBigEndian && f.getSampleSizeInBits == 16 &&
          f.getChannels == 1,
        s"doc ${a.doc_id}: unsupported audio shape $f")
      val framesL = ais.getFrameLength
      require(framesL >= 0 && framesL <= Int.MaxValue / 2,
        s"doc ${a.doc_id}: frame count $framesL out of decodable range")
      val frames = framesL.toInt
      val bytes = ais.readAllBytes()
      require(bytes.length == frames * 2,
        s"doc ${a.doc_id}: torn PCM stream (${bytes.length} bytes, " +
          s"$frames frames)")
      var sum = 0L
      var i = 0
      while (i < frames) {
        val lo = bytes(2 * i) & 0xFF
        val hi = bytes(2 * i + 1)
        sum += (((hi & 0xFF) << 8) | lo).toShort
        i += 1
      }
      // Long millisecond arithmetic: frames * 1000 overflows Int for any
      // clip past ~2.1M frames (~4.5 min at 8 kHz) — a valid WAV, not an
      // edge case
      AudioMeta(a.doc_id, frames, f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits,
        (frames.toLong * 1000L / f.getSampleRate.toLong).toInt, sum)
    } finally ais.close()
  }

  /** q_multimodal_audio: the REAL audio path end to end — each doc_id
    * deterministically synthesizes (id%5+1)·160 signed-16-bit mono PCM
    * frames at 8 kHz, wraps them in an actual WAV container
    * (AudioSystem.write), and the second partition-local stage decodes
    * the container back with [[decodeAudio]]. The oracle states what
    * makes a real codec oracle-checkable: frame count, format facts,
    * duration, AND the sum of the decoded samples — all pure functions
    * of doc_id (the WAV bytes in between stay codec-internal). Same
    * single partition-local pipeline shape as q_multimodal_decode. */
  def qMultimodalAudio: QFn = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // per-partition encoder init would go here (codec tables)
        it.map { id =>
          val frames = (id % 5 + 1).toInt * 160
          val pcm = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            val v = ((id * 31 + i.toLong * 7) % 20001 - 10000).toShort
            pcm(2 * i) = (v & 0xFF).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          RawAsset(id, bos.toByteArray)
        }
      }
      .mapPartitions(_.map(decodeAudio))
      .toDF().orderBy("doc_id")
  }

  /** A REAL multi-frame decode's output: frame count and dimensions
    * from the container itself. No pixel checksum — GIF is palettized,
    * so the encoder's color quantization is codec-internal (unlike the
    * audio path's lossless PCM, where the sample sum IS oracle-able). */
  case class VideoMeta(doc_id: Long, n_frames: Int, width: Int,
                       height: Int, codec: String)

  /** REAL multi-frame decode: the ImageIO GIF reader parses the
    * container, counts frames (`getNumImages(true)` walks the actual
    * image blocks) and reads per-frame dimensions. Fails loudly when
    * no codec claims the bytes. */
  def decodeVideo(a: RawAsset): VideoMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(a.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"no installed codec claims doc ${a.doc_id}'s payload")
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        require(n > 0, s"doc ${a.doc_id}: empty container")
        VideoMeta(a.doc_id, n, r.getWidth(0), r.getHeight(0),
          // ROOT locale: default-locale lowercasing is a dotless-i
          // hazard ("GIF" -> "gİf"-adjacent corruption under tr_TR)
          r.getFormatName.toLowerCase(java.util.Locale.ROOT))
      } finally r.dispose()
    } finally iis.close()
  }

  /** q_multimodal_video: the REAL multi-frame (video-shaped) path end
    * to end — each doc_id renders (id%4+1) deterministic frames of
    * (id%13+1)×(id%7+1) pixels, encodes them into ONE animated-GIF
    * container (ImageIO's write-sequence API — the in-JDK multi-frame
    * codec; true video codecs don't ship in this container, and the
    * frame-sequence-in-one-binary-payload shape is identical), and the
    * second partition-local stage decodes the container back. Oracle:
    * frame count and dimensions as pure functions of doc_id — the
    * container's byte layout and GIF's palette quantization stay
    * codec-internal. */
  def qMultimodalVideo: QFn = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // per-partition encoder init (the codec-instance-per-partition
        // shape): ONE registry lookup + writer, reused across rows via
        // setOutput — not one per document
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val rows = it.map { id =>
          val w = (id % 13 + 1).toInt
          val h = (id % 7 + 1).toInt
          val n = (id % 4 + 1).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < n) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  img.setRGB(x, y,
                    ((id + f * 97 + x * 31 + y * 17) % 0xFFFFFF).toInt)
                  x += 1
                }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally ios.close() // the shared writer outlives the row
          RawAsset(id, bos.toByteArray)
        }
        // the shared writer outlives every row but NOT the partition:
        // dispose its native/codec state once the iterator drains,
        // otherwise each query leaks one writer per partition
        new Iterator[RawAsset] {
          private var disposed = false
          override def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h && !disposed) { disposed = true; writer.dispose() }
            h
          }
          override def next(): RawAsset = rows.next()
        }
      }
      .mapPartitions(_.map(decodeVideo))
      .toDF().orderBy("doc_id")
  }

  /** One sampled frame of a video-ish asset. */
  case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Int)

  /** q_multimodal_frames: UDTF-shaped frame sampling — each asset expands
    * to (n_bytes % 4 + 1) frames at 40 ms spacing via flatMap, the
    * one-to-many generator shape a real video sampler has. */
  def qMultimodalFrames: QFn = (s, d) => {
    import s.implicits._
    decodeAssets(Tables.documents(s, d))
      .flatMap { m =>
        val n = m.n_bytes % 4 + 1
        (0 until n).map(i => Frame(m.doc_id, i, i * 40))
      }
      .toDF().orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, QFn] = Map(
    "q_multimodal_meta"   -> qMultimodalMeta,
    "q_multimodal_resize" -> qMultimodalResize,
    "q_multimodal_frames" -> qMultimodalFrames,
    "q_multimodal_decode" -> qMultimodalDecode,
    "q_multimodal_audio"  -> qMultimodalAudio,
    "q_multimodal_video"  -> qMultimodalVideo,
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(64 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST(64 + octet_length(encode(text)) % 480 AS INTEGER) AS height,
        |       'stub/raw' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         64 + octet_length(encode(text)) % 640 AS width,
        |         64 + octet_length(encode(text)) % 480 AS height
        |  FROM documents)
        |SELECT doc_id, CAST(width AS INTEGER) AS width,
        |       CAST(height AS INTEGER) AS height,
        |       CAST(floor(width * least(224.0 / width, 224.0 / height))
        |            AS INTEGER) AS out_w,
        |       CAST(floor(height * least(224.0 / width, 224.0 / height))
        |            AS INTEGER) AS out_h
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) % 4 + 1 AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
        |       CAST(f.i * 40 AS INTEGER) AS ts_ms
        |FROM m, LATERAL unnest(range(0, n_frames)) AS f(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // the REAL decode's oracle: decoded dims == encoded dims, a pure
    // function of doc_id; the PNG bytes in between are codec-internal
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(doc_id % 13 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 7 + 1 AS INTEGER) AS height,
        |       'png' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the REAL audio decode's oracle: header facts AND the decoded PCM
    // sample sum, all pure functions of doc_id — a torn container, a
    // sample-rate lie, or one flipped byte in the stream breaks it
    "q_multimodal_audio" ->
      """WITH m AS (SELECT doc_id, (doc_id % 5 + 1) * 160 AS frames
        |           FROM documents),
        |s AS (SELECT m.doc_id, m.frames,
        |             sum((m.doc_id * 31 + t.i * 7) % 20001 - 10000)
        |               AS pcm_sum
        |      FROM m JOIN range(0, 800) t(i) ON t.i < m.frames
        |      GROUP BY m.doc_id, m.frames)
        |SELECT doc_id, CAST(frames AS INTEGER) AS n_frames,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(16 AS INTEGER) AS bits,
        |       CAST(frames // 8 AS INTEGER) AS duration_ms,
        |       CAST(pcm_sum AS BIGINT) AS pcm_sum
        |FROM s ORDER BY doc_id""".stripMargin,
    // the REAL multi-frame decode's oracle: container-parsed frame
    // count and dimensions, pure functions of doc_id
    "q_multimodal_video" ->
      """SELECT doc_id,
        |       CAST(doc_id % 4 + 1 AS INTEGER) AS n_frames,
        |       CAST(doc_id % 13 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 7 + 1 AS INTEGER) AS height,
        |       'gif' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
