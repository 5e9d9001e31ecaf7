package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata, per the training-data-pipeline requirements.
  *
  * The Spark-side plumbing — schema, batched per-partition processing, the
  * feature-row contract — is real and tested. The actual media *decode* is
  * STUBBED (no image/audio codecs ship in this container): `decodeStub`
  * derives deterministic pseudo-metadata from the bytes. Swap `decodeStub`
  * for a real decoder (e.g. javax.imageio / ffmpeg JNI) on a cluster with
  * the codec libs installed; nothing else changes.
  */
object BinaryFeatures {

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** STUB decode: deterministic fake metadata from raw bytes. A real
    * decoder returns genuine width/height/frame-count here.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += (bytes(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = id,
      byte_len = len,
      width = len % 640,
      height = len % 480,
      n_frames = len % 7,
      // floor(x*1000+0.5): identical half-up semantics in SQL and JVM
      mean_byte = if (len == 0) 0.0
        else math.floor(sum.toDouble / len * 1000 + 0.5) / 1000)
  }

  /** Batched feature extraction over (id, payload) binary rows — the
    * Scala analogue of a pandas-UDF `mapInPandas` stage: per-partition
    * batching, columnar-friendly output schema, no driver involvement.
    */
  def extract(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Frame-sampling stub: every k-th "frame" index of a video payload —
    * exercises the one→many explode shape real frame extraction has.
    */
  def sampleFrames(media: Dataset[(Long, Array[Byte])], everyK: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { case (id, bytes) =>
      val f = decodeStub(id, bytes)
      (0 until f.n_frames by math.max(1, everyK)).map(fi => (id, fi, f.byte_len))
    }.toDF("doc_id", "frame_idx", "byte_len")
  }
}
