package graft.pipeline

import graft.SparkSpec

/** Perceptual-hash contracts: the hash survives the PNG encode/decode
  * round trip, is invariant to uniform brightness shift (the pHash
  * selling point — only the DC coefficient moves), separates the
  * patterned classes, and the banded near-dup join recovers exactly
  * the class structure.
  */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  private def png(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = math.min(255, math.max(0, f(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("hash equals the direct formula hash after the PNG round trip") {
    val viaPng = Multimodal.phash64(png((x, y) => Multimodal.patternGray(7L, x, y)))
    assert(viaPng.isDefined, "64x64 PNG must decode and hash")
    // second encode of the same pixels → same bytes-independent hash
    val again = Multimodal.phash64(png((x, y) => Multimodal.patternGray(7L, x, y)))
    assert(viaPng == again)
  }

  test("uniform brightness shift leaves the hash unchanged (DC-only)") {
    val base = Multimodal.phash64(png((x, y) => Multimodal.patternGray(4L, x, y) / 2)).get
    val brighter = Multimodal.phash64(png((x, y) => Multimodal.patternGray(4L, x, y) / 2 + 30)).get
    assert(base == brighter, "adding a constant moves only the DC coefficient")
  }

  test("undecodable and wrong-size payloads hash to None") {
    assert(Multimodal.phash64(Array[Byte](1, 2, 3)).isEmpty)
    val small = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(small, "png", bos)
    assert(Multimodal.phash64(bos.toByteArray).isEmpty)
  }

  test("near-dup join recovers the class structure exactly") {
    val ids = (0L until 36L).toDF("doc_id") // 4 per class
    val assets = Multimodal.patternedAssets(spark, ids, "doc_id")
    val pairs = Multimodal.imageNearDups(spark, assets, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 36L; b <- 0L until 36L
      if a < b && a % Multimodal.phashClasses == b % Multimodal.phashClasses
    } yield (a, b)).toSet
    assert(pairs == expected,
      s"missing=${expected.diff(pairs).size} spurious=${pairs.diff(expected).size}")
  }

  test("phash frame drops non-image assets") {
    val docs = (0L until 12L).toDF("doc_id")
    val mixed = Multimodal.syntheticAssets(spark, docs, "doc_id") // ⅓ image w/ fake payloads
    val fps = Multimodal.imagePhashes(spark, mixed)
    // synthetic sha-hex payloads are not decodable PNGs → nothing hashes
    assert(fps.count() == 0)
  }
}
