package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata.
  * Images/audio/video ride through the pipeline as `binary` columns;
  * only the (stubbed) codec at the edge knows the format. */
case class MediaRecord(media_id: Long, media_type: String,
                       payload: Array[Byte], n_bytes: Long)

/** Decoded/feature form of a record. */
case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, channels: Int,
                         checksum: Long, mean_byte: Double)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The Spark-side contract is real and tested — binary schema, typed
  * Dataset encoders, partition-preserving mapPartitions (the Scala
  * analog of a Pandas-UDF `mapInPandas` batch loop), deterministic
  * output — while the codec itself is a STUB: this container has no
  * image/audio libraries, so `decodeStub` derives a fake-but-
  * deterministic header (width/height from the first payload bytes)
  * where a real implementation would call the decoder. Swap
  * [[decodeStub]] for a JNI/javacpp codec without touching any
  * plumbing.
  */
object Multimodal {

  /** Wrap any (id, string) frame as media records — the test harness
    * treats document text bytes as an opaque payload. */
  def fromText(df: DataFrame, id: String, text: String,
               mediaType: String = "image/fake"): DataFrame =
    df.select(col(id).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(text), "UTF-8").as("payload"),
      octet_length(col(text)).cast("long").as("n_bytes"))

  /** STUB codec: a real decoder would parse the container format
    * here. The fake reads "header" bytes 0 and 1 for dimensions and
    * scans the payload once for byte statistics — deterministic, so
    * the pipeline around it is fully testable. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
    val b1 = if (r.payload.length > 1) r.payload(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.media_type, r.n_bytes,
      width = 1 + b0 % 64, height = 1 + b1 % 64, channels = 3,
      checksum = sum % 997,
      mean_byte = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length)
  }

  /** Batched decode/feature-extract over partitions — each partition
    * streams through the codec without materializing more than one
    * record; the unit a real implementation would hand to a
    * vectorized decoder in batches. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling stub: every `stride`-th byte stands in for a
    * decoded video frame; shape (media_id, frame_idx, frame_byte).
    * A real sampler would emit (media_id, frame_idx, frame_payload). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.indices.by(stride).zipWithIndex.map { case (off, idx) =>
        (r.media_id, idx, r.payload(off) & 0xff)
      }
    }.toDF("media_id", "frame_idx", "frame_byte")
  }
}
