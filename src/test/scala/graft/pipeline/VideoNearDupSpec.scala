package graft.pipeline

import graft.SparkSpec

/** Video near-dup contracts: the RIFF/AVI parser round-trips both
  * codecs (lossless DIB and real MJPEG), frame sampling picks the
  * right frames, and the frame-wise banded match recovers the class
  * structure exactly — on the lossless fixture bit-for-bit, on the
  * MJPEG fixture through real JPEG encode/decode noise.
  */
class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("AVI/DIB parser: lossless round trip, header/size validation") {
    val ids = Seq(5L).toDF("doc_id")
    val asset = Multimodal.videoAssets(spark, ids, "doc_id").collect().head
    val parsed = Multimodal.parseAvi(asset.data)
    assert(parsed.isDefined)
    val (w, h, frames) = parsed.get
    assert(w == 64 && h == 64 && frames.length == Multimodal.videoFrames)
    // DIB is lossless: every decoded pixel equals the generator formula
    for (f <- 0 until Multimodal.videoFrames; y <- 0 until 64; x <- 0 until 64)
      assert(frames(f)(y)(x) == Multimodal.patternGray(
        Multimodal.videoVirtualId(5L, f), x, y),
        s"pixel ($x,$y) of frame $f")
    assert(Multimodal.parseAvi("JUNK".getBytes ++ asset.data.drop(4)).isEmpty,
      "bad RIFF magic rejected")
    assert(Multimodal.parseAvi(asset.data.take(100)).isEmpty,
      "truncated tree rejected")
  }

  test("AVI/MJPEG parser: real JPEG frames decode with bounded loss") {
    val ids = Seq(7L).toDF("doc_id")
    val asset = Multimodal.videoAssets(spark, ids, "doc_id", mjpeg = true)
      .collect().head
    // the payload's frames are REAL JPEGs (SOI marker inside the chunks)
    val parsed = Multimodal.parseAvi(asset.data)
    assert(parsed.isDefined && parsed.get._3.length == Multimodal.videoFrames)
    val frames = parsed.get._3
    // lossy but close: mean absolute error under 8 gray levels per frame
    for (f <- 0 until Multimodal.videoFrames) {
      var err = 0L
      for (y <- 0 until 64; x <- 0 until 64)
        err += math.abs(frames(f)(y)(x) - Multimodal.patternGray(
          Multimodal.videoVirtualId(7L, f), x, y))
      assert(err / (64 * 64) < 8, s"frame $f MAE ${err / (64 * 64)}")
    }
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

  test("near-dup join survives MJPEG encode/decode noise") {
    val ids = (0L until 24L).toDF("doc_id")
    val assets = Multimodal.videoAssets(spark, ids, "doc_id", mjpeg = true)
    val pairs = Multimodal.videoNearDups(spark, assets, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 24L; b <- 0L until 24L if a < b && a % 6 == b % 6
    } yield (a, b)).toSet
    assert(expected.subsetOf(pairs),
      s"missing within-class pairs: ${expected.diff(pairs).size}")
  }

  test("parseAvi: random truncations and byte flips never throw") {
    val ids = Seq(3L).toDF("doc_id")
    val bases = Seq(
      Multimodal.videoAssets(spark, ids, "doc_id").collect().head.data,
      Multimodal.videoAssets(spark, ids, "doc_id", mjpeg = true).collect().head.data)
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val base = bases(rnd.nextInt(2))
      val cut = rnd.nextInt(base.length + 1)
      val arr = base.take(cut)
      if (arr.nonEmpty)
        (0 until 3).foreach(_ => arr(rnd.nextInt(arr.length)) = rnd.nextInt(256).toByte)
      // must return cleanly — Some on survivable damage, None otherwise
      Multimodal.parseAvi(arr)
    }
    // and intact bases still parse fully
    bases.foreach(b => assert(Multimodal.parseAvi(b).exists(_._3.length == 8)))
  }

  test("non-video assets yield no frame hashes") {
    val docs = (0L until 9L).toDF("doc_id")
    val images = Multimodal.patternedAssets(spark, docs, "doc_id")
    assert(Multimodal.videoFrameHashes(spark, images).count() == 0)
  }
}
