package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row (the "decode" output schema). */
case class MediaMeta(doc_id: Long, n_bytes: Long, fmt: String,
                     width: Long, height: Long, n_frames: Long,
                     thumb_w: Long, thumb_h: Long)

/** Multimodal-column plumbing — beyond-reference track (builder brief).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column
  * with typed metadata. The fixture set has no real media, so the
  * `media` table is derived from `documents` (content = UTF-8 bytes of
  * the text) and the decode step is a clearly-marked DETERMINISTIC
  * STUB: real deployments swap [[decodeStub]] for an actual
  * image/audio decoder (the container has no media libs). What is
  * real and tested here is the Spark-side plumbing: binary column
  * schema, a partition-wise decode via `mapPartitions` (the Scala
  * analogue of `mapInPandas` — per-partition batch iteration, one
  * decoder instance per partition, zero driver involvement), and the
  * frame-sampling explode.
  *
  * Scale design: decode is map-only over the scan — linear, no
  * shuffle; binary payloads stay columnar (parquet binary) and are
  * never collected. Frame sampling is a generator (explode) — row
  * count multiplies by frames/[[SampleEvery]], still shuffle-free.
  */
object Multimodal {

  /** Frame-sampling stride. */
  val SampleEvery = 4

  /** The media table: doc_id + opaque binary payload. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("content"))

  /** STUB decoder — deterministic fake metadata from the bytes alone
    * (md5 nibble → format, size arithmetic → dimensions). Replace the
    * body with a real decoder (javax.imageio / ffmpeg bindings) in a
    * deployment; the signature (bytes → MediaMeta) is the contract. */
  def decodeStub(md: java.security.MessageDigest, docId: Long,
                 content: Array[Byte]): MediaMeta = {
    val nibble0 = (md.digest(content)(0) >> 4) & 0xf
    val n = content.length.toLong
    val w = 16 + n % 640
    val h = 16 + (n * 7) % 480
    MediaMeta(
      doc_id   = docId,
      n_bytes  = n,
      fmt      = (nibble0 % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      },
      width    = w,
      height   = h,
      n_frames = 1 + n / 256,
      // resize stub: half-resolution thumbnail dims (a real decoder
      // would emit resampled bytes; the metadata contract is the same)
      thumb_w  = w / 2,
      thumb_h  = h / 2)
  }

  /** x12: partition-wise decode: one decoder per partition, batch
    * iteration — the mapInPandas shape in Scala. */
  def mediaMeta(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(documents)
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // decoder initialized ONCE per partition and reused per row
        // (MessageDigest.digest resets its state after each call)
        val md = java.security.MessageDigest.getInstance("MD5")
        iter.map { case (id, bytes) => decodeStub(md, id, bytes) }
      }
  }

  /** x13: sample every [[SampleEvery]]-th frame of each media item;
    * frame_fp stands in for the extracted frame feature. */
  def frameSample(spark: SparkSession, documents: DataFrame): DataFrame =
    mediaMeta(spark, documents).toDF()
      .select(col("doc_id"), col("fmt"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(SampleEvery.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("fmt"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_fp"))
}
