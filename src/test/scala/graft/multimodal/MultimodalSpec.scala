package graft.multimodal

import graft.SparkSpec

/** The REAL image-decode path (q_multimodal_decode): javax.imageio is
  * in-JDK, so the container CAN decode images — dimensions and format
  * must come from the actual byte stream, and undecodable bytes must
  * fail loudly (a silent stub would report fake dimensions as real). */
class MultimodalSpec extends SparkSpec {

  test("decodeImage reads real dimensions from real PNG bytes") {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Multimodal.decodeImage(Multimodal.RawAsset(7L, bos.toByteArray))
    assert(got === Multimodal.DecodedMeta(7L, 5, 3, "png"))
  }

  test("decodeImage fails loudly on bytes no codec claims") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Multimodal.RawAsset(1L,
        "definitely not an image".getBytes("UTF-8")))
    }
    assert(e.getMessage.contains("no installed codec"))
  }

  test("decodeAudio round-trips real WAV bytes: header facts and the exact PCM sample sum") {
    val samples = Array[Short](100, -200, 300, -400)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeAudio(Multimodal.RawAsset(9L, bos.toByteArray))
    assert(got === Multimodal.AudioMeta(9L, 4, 8000, 1, 16, 0, -200L))
  }

  test("decodeAudio fails loudly on a non-audio container") {
    intercept[Exception] {
      Multimodal.decodeAudio(Multimodal.RawAsset(1L,
        "definitely not audio".getBytes("UTF-8")))
    }
  }

  test("decodeVideo counts real frames in a real animated-GIF container") {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      (0 until 3).foreach { _ =>
        w.writeToSequence(new javax.imageio.IIOImage(
          new java.awt.image.BufferedImage(4, 2,
            java.awt.image.BufferedImage.TYPE_INT_RGB), null, null), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    val got = Multimodal.decodeVideo(Multimodal.RawAsset(5L, bos.toByteArray))
    assert(got === Multimodal.VideoMeta(5L, 3, 4, 2, "gif"))
  }

  test("q_multimodal_decode: decoded dims equal encoded dims for every doc") {
    val rows = Multimodal.queries("q_multimodal_decode")(spark, sfDir)
      .collect()
    assert(rows.length === graft.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % 13 + 1).toInt)
      assert(r.getInt(2) === (id % 7 + 1).toInt)
      assert(r.getString(3) === "png")
    }
  }
}
