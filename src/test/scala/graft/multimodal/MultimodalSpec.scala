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
