package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extraction runs as a
  * partition-batched transform (the Scala analog of `mapInPandas` — one
  * heavyweight codec init per partition, rows streamed through it).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[FakeCodec.decode]] produces deterministic per-byte
  * features. The Spark-side contract — schema, batching, partition-level
  * init, output shape — is real and tested, so swapping in a real codec is a
  * one-function change.
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
