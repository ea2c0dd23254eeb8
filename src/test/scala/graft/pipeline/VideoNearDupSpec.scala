package graft.pipeline

import graft.SparkSpec

/** Video near-dup contracts: the GVID parser validates layout, frame
  * sampling picks the right frames, and the frame-wise banded match
  * recovers the class structure exactly.
  */
class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("GVID parser: round trip, magic/size validation") {
    val ids = Seq(5L).toDF("doc_id")
    val asset = Multimodal.videoAssets(spark, ids, "doc_id").collect().head
    val frames = Multimodal.parseGvid(asset.data)
    assert(frames.isDefined && frames.get.length == Multimodal.videoFrames)
    assert(frames.get.head(0)(0) == Multimodal.patternGray(
      Multimodal.videoVirtualId(5L, 0), 0, 0), "pixel(0,0) of frame 0")
    assert(Multimodal.parseGvid("JUNK".getBytes ++ asset.data.drop(4)).isEmpty)
    assert(Multimodal.parseGvid(asset.data.take(100)).isEmpty)
  }

  test("frame hashes: every 2nd frame, equal to the still-image hash of the same pixels") {
    val ids = Seq(3L).toDF("doc_id")
    val assets = Multimodal.videoAssets(spark, ids, "doc_id")
    val rows = Multimodal.videoFrameHashes(spark, assets, everyN = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(0, 2, 4, 6), s"sampled frames: ${rows.keySet}")
    // the frame hash must equal phash64 of a PNG of the same pixels
    val vid = Multimodal.videoVirtualId(3L, 2)
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = Multimodal.patternGray(vid, x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(rows(2) == Multimodal.phash64(bos.toByteArray).get,
      "video frame hash must equal the image pHash of identical pixels")
  }

  test("near-dup join recovers the 6 video classes exactly") {
    val ids = (0L until 24L).toDF("doc_id") // 4 per class
    val assets = Multimodal.videoAssets(spark, ids, "doc_id")
    val pairs = Multimodal.videoNearDups(spark, assets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 24L; b <- 0L until 24L if a < b && a % 6 == b % 6
    } yield (a, b)).toSet
    assert(pairs == expected,
      s"missing=${expected.diff(pairs).size} spurious=${pairs.diff(expected).size}")
  }

  test("non-video assets yield no frame hashes") {
    val docs = (0L until 9L).toDF("doc_id")
    val images = Multimodal.patternedAssets(spark, docs, "doc_id")
    assert(Multimodal.videoFrameHashes(spark, images).count() == 0)
  }
}
