package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The real decode path must recover ground truth from actual payload
  * bytes (not trust metadata): pixel dimensions and mean color from real
  * PNGs via ImageIO, PCM duration and amplitude stats from real WAVs via
  * javax.sound — and fall back to the marked fake exactly where no JDK
  * codec exists (video) or the payload is corrupt.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val decoded = {
    val ids = (0L to 29L).toDF("id")
    Multimodal.realDecode(spark, Multimodal.realAssets(spark, ids, "id"))
      .collect().map(d => d.asset_id -> d).toMap
  }

  test("real PNG decode recovers pixel dimensions and solid color") {
    (0L to 29L by 3).foreach { id =>
      val d = decoded(id)
      assert(d.modality == "image")
      assert(d.width == (16 + (id % 48)).toInt, s"width of asset $id")
      assert(d.height == (16 + (id % 32)).toInt, s"height of asset $id")
      // solid-color image: mean RGB equals the pixel color exactly
      val rgb = ((id * 2654435761L) & 0xFFFFFF).toInt
      val expected = Seq((rgb >> 16 & 0xFF) / 255f, (rgb >> 8 & 0xFF) / 255f,
        (rgb & 0xFF) / 255f)
      expected.zip(d.feature.take(3)).foreach { case (e, got) =>
        assert(math.abs(e - got) < 1e-4, s"mean color of asset $id")
      }
      // single luminance bin holds every pixel of a solid image
      assert(d.feature.drop(3).count(_ > 0.99f) == 1)
    }
  }

  test("real WAV decode recovers PCM duration and sine amplitude stats") {
    (1L to 29L by 3).foreach { id =>
      val d = decoded(id)
      assert(d.modality == "audio")
      val expectMs = (100 + (id % 400)).toInt
      assert(math.abs(d.duration_ms - expectMs) <= 1, s"duration of asset $id")
      // sine at amplitude 0.5: mean |s| = 2A/pi ~ 0.318, RMS = A/sqrt(2) ~ 0.354
      assert(math.abs(d.feature(0) - 0.318f) < 0.02, s"mean|s| of asset $id")
      assert(math.abs(d.feature(1) - 0.354f) < 0.02, s"rms of asset $id")
    }
  }

  test("real MJPEG AVI decode recovers container dims and frame count") {
    (2L to 29L by 3).foreach { id =>
      val d = decoded(id)
      assert(d.modality == "video")
      assert(d.width == 32 && d.height == 32, s"strf dims of asset $id")
      assert(d.feature(0) == 4f, s"frame count of asset $id")
      assert(d.duration_ms == 160L) // 4 frames at nominal 25 fps
      assert(d.feature.length == 16)
    }
  }

  test("corrupt image payloads fall back instead of failing the batch") {
    val junk = Seq(Multimodal.Asset(99L, "image",
      Array.tabulate[Byte](64)(_.toByte), "png", 10, 10, 0L)).toDS()
    val out = Multimodal.realDecode(spark, junk).collect()
    assert(out.length == 1)
    assert(out.head.width == 10) // fake echoes metadata
  }

  test("resize plan computes aspect-preserving targets from decoded dims") {
    val df = Multimodal.realDecode(spark,
      Multimodal.realAssets(spark, (0L to 29L).toDF("id"), "id"))
      .toDF().where(col("modality") === "image")
    val planned = Multimodal.resizePlan(df, maxSide = 8)
    planned.collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(math.max(tw, th) <= 9) // ceil can add at most 1 over the bound
      assert(tw <= w && th <= h)
    }
  }
}
