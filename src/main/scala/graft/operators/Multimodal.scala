package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode/feature-extraction scaffolding.
  *
  * The Spark-side mechanics here are real and tested — schema, partitioning,
  * batched iterator shape — while the actual media decode is STUBBED with a
  * deterministic fake (`fakeDecode`): the container has no image/audio
  * libraries. Swapping in a real decoder is a one-function change; everything
  * around it (the `mapPartitions` batching, the feature schema, the
  * repartition-by-size guard) is production shape.
  */
object Multimodal {

  case class MediaRow(id: Long, blob: Array[Byte], mime: String)
  case class MediaFeatures(id: Long, byte_len: Int, mime: String,
                           width: Int, height: Int, feature: Array[Float])

  /** Typed metadata over an opaque blob column — cheap, no decode, stays in
    * codegen: length + SHA-256 for dedup joins + a mime guess from magic
    * bytes (here: prefix heuristic over the synthetic payloads).
    */
  def attachMeta(df: DataFrame, blob: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(blob)))
      .withColumn("sha", sha2(col(blob), 256))
      .withColumn("mime",
        when(substring(col(blob), 1, 2) === lit("{\"".getBytes), "application/json")
          .otherwise("application/octet-stream"))

  /** STUB decode: a deterministic fake standing in for e.g. libjpeg — maps
    * bytes to a fixed-shape "image" and an 8-dim feature vector derived from
    * byte histograms. Replace the body with a real decoder in production;
    * signature and batch shape stay identical.
    */
  private[graft] def fakeDecode(row: MediaRow): MediaFeatures = {
    val len = row.blob.length
    val hist = new Array[Float](8)
    var i = 0
    while (i < len) { hist((row.blob(i) & 0xff) % 8) += 1.0f; i += 1 }
    if (len > 0) { var j = 0; while (j < 8) { hist(j) /= len.toFloat; j += 1 } }
    MediaFeatures(row.id, len, row.mime, width = 64, height = 64, feature = hist)
  }

  /** Batched decode+featurize over partitions. The iterator is processed
    * lazily (no partition materialization); `partitions` controls the
    * decode parallelism independently of upstream layout — at 100 TB you
    * repartition so each task holds a bounded number of blobs, not bytes.
    */
  def decodeFeatures(media: Dataset[MediaRow], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("id"))
      .mapPartitions(_.map(fakeDecode))
  }

  /** Frame-sampling plumbing for video-like payloads: emit every k-th chunk
    * of the blob as its own row (id, frame_no, frame_bytes) — the explode
    * pattern a real frame sampler would follow, with deterministic chunking
    * standing in for codec frame boundaries.
    */
  def sampleFrames(media: Dataset[MediaRow], chunkBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.blob.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (row.id, idx, chunk) }
    }.toDF("id", "frame_no", "frame_bytes")
  }
}
