package graft.pipeline

import graft.SparkSpec

/** Audio-fingerprint contracts: the integer DFT finds the right bin on
  * a known sine, the WAV round trip preserves the landmarks, and the
  * match join recovers the tone classes exactly.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def wav(sample: Int => Short, n: Int = Multimodal.audioFrames * 256): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(t => bb.putShort(sample(t)))
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("a pure k-cycle sine peaks at bin k in every frame") {
    // 3 cycles per 256-sample frame
    val data = wav(t => (math.sin(2 * math.Pi * 3 * t / 256.0) * 8000).toShort)
    val peaks = Multimodal.framePeaks(data).get
    assert(peaks.forall(_._2 == 3), s"expected bin 3 everywhere: $peaks")
  }

  test("too-short and undecodable payloads yield no landmarks") {
    assert(Multimodal.framePeaks(Array[Byte](9, 9, 9)).isEmpty)
    assert(Multimodal.framePeaks(wav(_ => 0, n = 100)).isEmpty)
  }

  test("tone classes land on their designed distinct bins") {
    val ids = (0L until 6L).toDF("doc_id")
    val peaks = Multimodal.audioPeaks(spark, Multimodal.toneAssets(spark, ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(peaks.length == 6 * Multimodal.audioFrames)
    val byClass = peaks.groupBy(_._1).view.mapValues(_.map(_._3).distinct.toSeq).toMap
    assert(byClass == Map(0L -> Seq(8), 1L -> Seq(5), 2L -> Seq(4),
      3L -> Seq(3), 4L -> Seq(2), 5L -> Seq(1)), s"got $byClass")
  }

  test("match join recovers the class structure exactly") {
    val ids = (0L until 24L).toDF("doc_id") // 4 per class
    val assets = Multimodal.toneAssets(spark, ids, "doc_id")
    val pairs = Multimodal.audioMatches(spark, assets, minFrames = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 24L; b <- 0L until 24L
      if a < b && a % 6 == b % 6
    } yield (a, b)).toSet
    assert(pairs == expected,
      s"missing=${expected.diff(pairs).size} spurious=${pairs.diff(expected).size}")
  }

  test("non-audio assets are dropped") {
    val docs = (0L until 9L).toDF("doc_id")
    val images = Multimodal.patternedAssets(spark, docs, "doc_id")
    assert(Multimodal.audioPeaks(spark, images).count() == 0)
  }
}
