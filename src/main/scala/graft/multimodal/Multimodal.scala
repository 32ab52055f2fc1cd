package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata structs, and
  * decode/feature-extract/resize/frame-sample run as *batched*
  * per-partition operations — the Scala analogue of `mapInPandas`: a
  * whole Arrow-sized batch of payloads crosses into the decode kernel at
  * once, never one JVM call per row.
  *
  * The actual codec is STUBBED (this container ships no image/audio
  * libraries): `decodeBatch` is a deterministic fake that "decodes" a
  * payload into its byte histogram. Everything around it — the media
  * schema, the binary column, the batch loop shape, the partitioning —
  * is real and is what matters at scale: payload bytes never shuffle
  * (feature extraction is a narrow map), and metadata-only operations
  * (resize planning, frame sampling) touch only the struct column, so
  * Parquet column pruning skips the heavy binary column entirely.
  */
object Multimodal {

  /** A decoded row: payload reduced to fixed-width features. */
  final case class MediaFeatures(
      media_id: Long, n_bytes: Int,
      bin0: Int, bin1: Int, bin2: Int, bin3: Int,
      mean_byte: Double)

  /** STUB decode kernel — deterministic fake standing in for a real
    * vectorized decoder (libjpeg/ffmpeg/…). Takes a whole batch, returns
    * a whole batch; a real implementation would hand `batch` to native
    * code in one call.
    */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val hist = new Array[Int](4)
      var sum = 0L
      bytes.foreach { b =>
        val u = b & 0xff
        hist(u / 64) += 1
        sum += u
      }
      MediaFeatures(id, bytes.length, hist(0), hist(1), hist(2), hist(3),
        if (bytes.isEmpty) 0.0
        else math.rint(sum.toDouble / bytes.length * 1e6) / 1e6)
    }

  /** `mm_decode_features`: batched per-partition decode of a binary
    * payload column into fixed-width features. Batch size bounds peak
    * memory per task regardless of payload sizes.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 128): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }

  /** `mm_resize_meta`: metadata-only resize planning — compute target
    * dimensions that fit a bound while preserving aspect ratio. Touches
    * only the metadata struct: the binary column is pruned at scan.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      // clamp the long side to the bound (never upscale), scale the short
      // side by the same ratio: aspect preserved in both orientations
      when(col("meta.width") >= col("meta.height"),
        least(col("meta.width"), lit(maxSide)))
        .otherwise(floor(col("meta.width") * least(col("meta.height"), lit(maxSide)) /
          greatest(col("meta.height"), lit(1))))
        .cast("int").as("target_w"),
      when(col("meta.height") > col("meta.width"),
        least(col("meta.height"), lit(maxSide)))
        .otherwise(floor(col("meta.height") * least(col("meta.width"), lit(maxSide)) /
          greatest(col("meta.width"), lit(1))))
        .cast("int").as("target_h"))

  /** `mm_frame_sample`: uniform frame sampling for "video" rows —
    * metadata-only, emits (media_id, frame_idx) via a generator, payload
    * untouched. `stride` frames apart, at most `maxFrames` per video.
    */
  def frameSample(media: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    media.select(
      col("media_id"),
      explode(
        when(col("meta.n_frames") > 0,
          slice(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)), 1, maxFrames))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
}
