package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step is a DETERMINISTIC FAKE (this container has no image/
  * audio codecs — clearly marked below); everything around it — the asset
  * schema, the batched mapPartitions plumbing, partitioning, and the
  * feature/ resize/frame-sample operators — is real and tested. Swapping
  * `fakeDecode` for a JNI/javacv decoder changes one function.
  *
  * Scale notes: decode runs as `mapPartitions` over batches so a real
  * decoder amortizes per-batch init (model load, codec context) exactly
  * like a pandas_udf batch would; binary payloads never pass through a
  * shuffle — decode is a map-side operator.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // image | audio | video
      data: Array[Byte],
      format: String,
      meta_width: Int,
      meta_height: Int,
      meta_duration_ms: Long,
  )

  final case class DecodedFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature: Array[Float], // embedding-shaped decode output
  )

  /** Synthesize an asset table from any id column — payload bytes are a
    * deterministic function of the id (stand-in for real blobs).
    * Metadata uses a Knuth multiplicative hash (engine-portable integer
    * arithmetic, so external oracles can reproduce it; the id is reduced
    * mod 1e5 first to keep the product inside a signed 64-bit range).
    */
  def syntheticAssets(spark: SparkSession, df: DataFrame, idCol: String): Dataset[Asset] = {
    import spark.implicits._
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col(idCol) % 3 + 1).cast("int"))
    val fmt = element_at(array(lit("png"), lit("wav"), lit("mp4")),
      (col(idCol) % 3 + 1).cast("int"))
    def kmix(offset: Int): Column =
      (pmod(col(idCol), lit(100000L)) + offset) * lit(2654435761L)
    df.select(
      col(idCol).cast("long").as("asset_id"),
      modality.as("modality"),
      // payload: sha2 of the id, repeated — opaque deterministic bytes
      to_binary(repeat(sha2(col(idCol).cast("string"), 256), 4), lit("hex")).as("data"),
      fmt.as("format"),
      (pmod(kmix(0), lit(1920)) + 32).cast("int").as("meta_width"),
      (pmod(kmix(1), lit(1080)) + 32).cast("int").as("meta_height"),
      pmod(kmix(2), lit(600000L)).as("meta_duration_ms"),
    ).as[Asset]
  }

  /** >>> STUB — deterministic fake decode. A real build replaces this one
    * function with an actual codec call; the batch shape, schema, and
    * partition behavior stay identical. <<<
    */
  private def fakeDecode(batch: Seq[Asset]): Seq[DecodedFeatures] =
    batch.map { a =>
      val h = java.util.Arrays.hashCode(a.data)
      DecodedFeatures(
        asset_id = a.asset_id,
        modality = a.modality,
        n_bytes = a.data.length.toLong,
        width = a.meta_width,
        height = a.meta_height,
        duration_ms = a.meta_duration_ms,
        feature = Array.tabulate(16)(i =>
          (((h * 31 + i * 2654435761L) & 0xFFFF).toFloat / 65535.0f)),
      )
    }

  /** Batched decode: groups each partition's rows into `batchSize` chunks
    * (the pandas_udf batch analogue) and runs the decode per chunk.
    */
  def decode(spark: SparkSession, assets: Dataset[Asset], batchSize: Int = 64): Dataset[DecodedFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => fakeDecode(b))
    }
  }

  /** Resize metadata transform: pure column math, no payload touch. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sample plan for video assets: one row per sampled frame index
    * at `everyMs` intervals — a generator expression, no UDF.
    */
  def frameSamplePlan(decoded: DataFrame, everyMs: Long): DataFrame =
    decoded.where(col("modality") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ms"))
}
