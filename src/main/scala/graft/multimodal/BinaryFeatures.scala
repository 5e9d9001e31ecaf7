package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata, per the training-data-pipeline requirements.
  *
  * The Spark-side plumbing — schema, batched per-partition processing, the
  * feature-row contract — is real and tested. Image decode is REAL for the
  * formats the JDK ships codecs for (PNG/JPEG/GIF/BMP via `javax.imageio`,
  * no external deps); payloads no reader recognizes fall back to
  * `decodeStub`, the clearly-marked deterministic fake for codec-less
  * media (audio/video in this container).
  */
object BinaryFeatures {

  final case class MediaFeatures(
      doc_id: Long,
      kind: String, // "image" when really decoded, "stub" otherwise
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** STUB decode: deterministic fake metadata from raw bytes. Only used
    * when no JDK image reader accepts the payload.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += (bytes(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = id,
      kind = "stub",
      byte_len = len,
      width = len % 640,
      height = len % 480,
      n_frames = len % 7,
      // floor(x*1000+0.5): identical half-up semantics in SQL and JVM
      mean_byte = if (len == 0) 0.0
        else math.floor(sum.toDouble / len * 1000 + 0.5) / 1000)
  }

  /** Real decode via `javax.imageio` (headless-safe): genuine
    * width/height and mean of raster band 0 (= gray level for grayscale,
    * red channel otherwise). Falls back to [[decodeStub]] when no reader
    * claims the bytes.
    */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) decodeStub(id, bytes)
    else {
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      MediaFeatures(
        doc_id = id,
        kind = "image",
        byte_len = bytes.length,
        width = w,
        height = h,
        n_frames = 1,
        mean_byte = math.floor(sum.toDouble / (w.toLong * h) * 1000 + 0.5) / 1000)
    }
  }

  /** Deterministic single-color grayscale PNG — the test/bench fixture
    * generator (pure JDK, headless).
    */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic nearest-neighbor image resize: decode, sample the
    * source raster at floor-scaled coordinates, re-encode as PNG. Manual
    * raster sampling (not Graphics2D) so the result is bit-exact across
    * JVMs/render pipelines. Non-image payloads pass through unchanged.
    */
  def resizeNearest(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) bytes
    else {
      val out = new java.awt.image.BufferedImage(
        newW, newH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val src = img.getRaster
      val dst = out.getRaster
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * img.getHeight / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * img.getWidth / newW).toInt
          dst.setSample(x, y, 0, src.getSample(sx, sy, 0))
          x += 1
        }
        y += 1
      }
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Batched feature extraction over (id, payload) binary rows — the
    * Scala analogue of a pandas-UDF `mapInPandas` stage: per-partition
    * batching, columnar-friendly output schema, no driver involvement.
    */
  def extract(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) => decode(id, bytes) })
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
