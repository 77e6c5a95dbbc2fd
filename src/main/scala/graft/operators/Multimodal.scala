package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): media as opaque binary
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration (mapPartitions ≈ the JVM analogue of mapInPandas batches),
  * feature schema. The codec itself is a STUB: this container has no
  * image/audio libraries, so `decodePayload` derives deterministic fake
  * features from the bytes where a real JNI/library decode would run.
  * Swapping in a real decoder changes only that one function; the
  * distributed plumbing is unchanged.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * materialization); decode is a narrow per-partition transform (no
  * shuffle); feature aggregation downstream is a normal hash agg.
  */
object Multimodal {

  case class MediaItem(
      media_id: Long,
      media_type: String,      // "image" | "audio" | "video" | "text"
      payload: Array[Byte],
      source: String,
      n_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      source: String,
      n_bytes: Long,
      width: Int,              // stub-decoded "dimensions"
      height: Int,
      duration_ms: Long,
      checksum: Long)

  /** Build a media frame from the documents table: payload = utf-8 bytes
    * (stands in for image/audio blobs with the same column shape). */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        // deterministic type assignment for test coverage of all branches
        element_at(
          array(lit("image"), lit("audio"), lit("video"), lit("text")),
          (col("doc_id") % 4 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"),
        col("n_chars").as("n_bytes"))
      .as[MediaItem]
  }

  /** STUB decode: where a real codec (libjpeg/ffmpeg/...) would parse the
    * payload, derive deterministic pseudo-features from the bytes. The
    * signature and per-partition batch shape are the real contract. */
  private[operators] def decodePayload(item: MediaItem): MediaFeatures = {
    val bytes = item.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    // ??? real decode goes here — stubbed deterministically:
    val width = (math.abs(sum) % 1920).toInt + 1
    val height = (math.abs(sum / 7) % 1080).toInt + 1
    val durationMs = if (item.media_type == "video" || item.media_type == "audio")
      math.abs(sum / 13) % 600000 else 0L
    MediaFeatures(item.media_id, item.media_type, item.source,
      item.n_bytes, width, height, durationMs, sum)
  }

  /** Per-partition feature extraction — one decoder init per partition
    * (the expensive-codec pattern), then streaming batch iteration. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // a real implementation initializes the codec once per partition here
      it.map(decodePayload)
    }
  }

  /** Frame sampling for video payloads: k deterministic offsets per item —
    * explode stays a narrow transform (no shuffle). */
  def sampleFrames(items: Dataset[MediaItem], k: Int): DataFrame = {
    items.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"), col("n_bytes"),
        posexplode(sequence(lit(0), lit(k - 1))).as(Seq("frame_idx", "off")))
      .select(col("media_id"), col("frame_idx"),
        (col("off") * (col("n_bytes") / k)).cast("long").as("byte_offset"))
  }
}
