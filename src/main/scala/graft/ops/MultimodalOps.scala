package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extraction runs as a
  * partition-batched transform (the Scala analog of `mapInPandas` — one
  * heavyweight codec init per partition, rows streamed through it).
  *
  * Two codecs:
  *  - [[RealCodec]] — a genuine pure-JVM binary decoder for WAV (RIFF/PCM)
  *    and 24-bit BMP containers: magic validation, little-endian header
  *    walk, payload extraction. No libraries needed, so the decode step is
  *    REAL for these formats (oracle-checked end-to-end in q_media_decode).
  *  - [[FakeCodec]] — declared stub standing in for formats whose decoders
  *    need native libraries this environment lacks (JPEG/MP4/...); the
  *    Spark-side contract (schema, batching, partition init) is identical,
  *    so swapping in a real one is a one-function change.
  */
object MultimodalOps {

  final case class MediaMeta(mediaType: String, widthPx: Int, heightPx: Int,
                             sampleRateHz: Int)
  final case class MediaRow(doc_id: Long, meta: MediaMeta, content: Array[Byte])
  final case class MediaFeatures(doc_id: Long, mediaType: String, nBytes: Int,
                                 byteMean: Double, byteMax: Int, frameCount: Int)

  /** STUB codec — replace with a real decoder (e.g. javax.imageio / ffmpeg
    * bindings) when available. Deterministic function of the bytes.
    */
  object FakeCodec {
    /** Simulates expensive per-partition codec initialization. */
    def init(): FakeCodec.type = this
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val mean = if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      val mx = if (bytes.isEmpty) 0 else bytes.map(_ & 0xff).max
      // "frame count": a decode-shaped derived quantity
      val frames = row.meta.mediaType match {
        case "video" => math.max(1, bytes.length / 4)
        case "audio" => math.max(1, bytes.length / 2)
        case _ => 1
      }
      MediaFeatures(row.doc_id, row.meta.mediaType, bytes.length, mean, mx, frames)
    }
  }

  /** Synthesize a deterministic media table from `documents` (content =
    * md5 bytes of the text — a stand-in for real blobs with the same schema).
    */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        struct(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mediaType"),
          (pmod(col("doc_id"), lit(64)) * 16).cast("int").as("widthPx"),
          (pmod(col("doc_id"), lit(48)) * 16).cast("int").as("heightPx"),
          lit(16000).as("sampleRateHz")).as("meta"),
        unhex(md5(col("text"))).as("content"))
      .as[MediaRow]
  }

  /** Partition-batched feature extraction: codec initialized once per
    * partition, rows streamed — never a per-row init, never a driver
    * collect. Output is a columnar-friendly flat schema.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = FakeCodec.init() // heavyweight init, once per partition
      rows.map(codec.decode)
    }
  }

  // ---- REAL codec: WAV (RIFF/PCM) + BMP, pure-JVM binary parsing ----------
  // No image/audio libraries exist in this environment, but these two
  // container formats need none — so the decode step is genuinely real for
  // them (magic validation, little-endian header walk, payload extraction),
  // and the FakeCodec remains only for formats that would need native libs.

  final case class DecodedMedia(doc_id: Long, media_type: String,
                                dim1: Int, dim2: Int, payload_units: Long,
                                duration_micros: Long)

  object RealCodec {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
        ((b(o + 3) & 0xff) << 24)

    /** None = corrupt/unknown container (caller counts, warn-and-continue). */
    def decode(docId: Long, bytes: Array[Byte]): Option[DecodedMedia] = {
      if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
        val channels = le16(bytes, 22)
        val sampleRate = le32(bytes, 24)
        val bitsPerSample = le16(bytes, 34)
        val dataSize = le32(bytes, 40)
        if (sampleRate <= 0 || channels <= 0 || bitsPerSample <= 0) None
        else {
          val nSamples = dataSize / (channels * bitsPerSample / 8)
          Some(DecodedMedia(docId, "audio", sampleRate, channels,
            nSamples.toLong, nSamples.toLong * 1000000L / sampleRate))
        }
      } else if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
        val width = le32(bytes, 18)
        val height = le32(bytes, 22)
        val bpp = le16(bytes, 28)
        if (width <= 0 || height <= 0 || bpp != 24) None
        else Some(DecodedMedia(docId, "image", width, height,
          width.toLong * height, 0L))
      } else None
    }
  }

  /** Deterministic REAL media blobs: even doc_id → PCM WAV, odd → 24-bit
    * BMP, parameters derived from doc_id so an external oracle can recompute
    * the expected decode output analytically.
    */
  object MediaGen {
    def wav(id: Long): Array[Byte] = {
      val channels = 1 + (id % 2).toInt
      val sampleRate = 8000 + (id % 3).toInt * 4000
      val nSamples = 50 + (id % 50).toInt
      val dataSize = nSamples * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2); bb.putShort((channels * 2).toShort)
      bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(dataSize)
      var i = 0
      while (i < nSamples * channels) {
        bb.putShort((((id * 31 + i) * 2654435761L) & 0xffffL).toShort); i += 1
      }
      bb.array()
    }

    def bmp(id: Long): Array[Byte] = {
      val width = 1 + (id % 8).toInt
      val height = 1 + (id % 5).toInt
      val rowBytes = (width * 3 + 3) / 4 * 4
      val dataSize = rowBytes * height
      val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + dataSize)
      bb.putInt(0); bb.putInt(54)
      bb.putInt(40); bb.putInt(width); bb.putInt(height)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(dataSize)
      bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      var i = 0
      while (i < dataSize) { bb.put((((id + i) * 131) & 0xff).toByte); i += 1 }
      bb.array()
    }
  }

  /** Real-blob table: (doc_id, content) with genuine WAV/BMP bytes. */
  def realMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map(id => (id, if (id % 2 == 0) MediaGen.wav(id) else MediaGen.bmp(id)))
      .toDF("doc_id", "content")
  }

  /** Real decode, partition-batched; corrupt blobs dropped (counted by the
    * caller via the row-count delta, same warn-and-continue policy as the
    * WAL source).
    */
  def decodeReal(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => RealCodec.decode(id, bytes) })
  }

  /** End-to-end: synthesize → extract → per-type stats (the query surface). */
  def mediaFeatureStats(spark: SparkSession, sfDir: String): DataFrame = {
    extractFeatures(syntheticMediaTable(spark, sfDir))
      .groupBy("mediaType")
      .agg(count(lit(1)).as("n"),
        round(avg(col("byteMean")), 4).as("avg_byte_mean"),
        max(col("byteMax")).as("max_byte"),
        sum(col("frameCount")).as("total_frames"))
      .orderBy("mediaType")
  }
}
