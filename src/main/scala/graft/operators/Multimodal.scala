package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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

  /** Perceptual average-hash (aHash) over an 8×8 "decoded" grayscale tile —
    * the image near-dup fingerprint (pHash family). The decode step is the
    * declared stub boundary: luminance i = the code point sampled at
    * position 1 + i·stride of the payload (stride = (len−1) div 63, the
    * deterministic "resize to 64 samples"); a real pipeline swaps in
    * decode+resize and everything downstream — mean threshold, bit pack,
    * band blocking, Hamming join — is unchanged.
    *
    * Shape: relational at the sample boundary (explode 64 index rows per
    * payload, window-mean, bit-pack by aggregation) — NOT nested HOF
    * lambdas, where the 64-element mean expression would inline into the
    * per-bit lambda and re-derive the whole sample array per bit (the
    * O(len²·k) trap documented in CLAUDE.md). One doc-keyed window shuffle;
    * the bit-pack groupBy reuses the same partitioning.
    *
    * All arithmetic is integer (codepoints, floor-div mean, bit shifts), so
    * a SQL engine replays the hash bit-identically. The 64-bit hash is
    * returned as two 32-bit halves (h0 bits 0–31, h1 bits 32–63): packing
    * 64 bits into one BIGINT would overflow the sign bit, which DuckDB
    * RAISES on rather than wrapping.
    */
  def aHash64(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val base = df
      .select(col(idCol).as("ah_id"), textCol.as("ah_txt"))
      .where(length(col("ah_txt")) >= 64)
      .withColumn("ah_stride", expr("greatest(1, (length(ah_txt) - 1) div 63)"))
    val px = base
      .withColumn("i", explode(sequence(lit(0), lit(63))))
      .select(col("ah_id"), col("i"),
        ascii(col("ah_txt").substr(lit(1) + col("i") * col("ah_stride"), lit(1)))
          .cast("long").as("p"))
    val w = Window.partitionBy("ah_id")
    px
      .withColumn("mean", floor(sum("p").over(w) / 64).cast("long"))
      .withColumn("bit",
        when(col("p") > col("mean"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(i % 32 AS INT))"))
          .otherwise(lit(0L)))
      .groupBy(col("ah_id").as("id"))
      .agg(sum(when(col("i") < 32, col("bit")).otherwise(lit(0L))).as("h0"),
        sum(when(col("i") >= 32, col("bit")).otherwise(lit(0L))).as("h1"))
  }

  /** Near-dup pairs over aHash fingerprints: exact-collapse FIRST (identical
    * hashes → one representative, min id — the 20 %-dup corpus makes any
    * band tier quadratic otherwise, the DupSkewProbe rule), then 8 bands of
    * 8 bits block the candidates (pigeonhole: a pair within Hamming ≤ 7
    * agrees on ≥ 1 band, so the ≤ 6 cut below loses nothing), exact Hamming
    * filter on the survivors. Shuffle keys are (band_id, band_value) —
    * bounded buckets, never all-pairs.
    */
  def aHashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val reps = hashes.groupBy("h0", "h1").agg(min("id").as("rep"))
      .localCheckpoint(false) // both join sides share the scan; see qDocSimhashPairs
    val bands = reps
      .withColumn("j", explode(sequence(lit(0), lit(7))))
      .withColumn("band",
        expr("IF(j < 4, shiftright(h0, CAST(8*j AS INT)) & 255, " +
             "shiftright(h1, CAST(8*(j-4) AS INT)) & 255)"))
    val a = bands.select(col("j"), col("band"), col("rep").as("doc_a"),
      col("h0").as("h0a"), col("h1").as("h1a"))
    val b = bands.select(col("j"), col("band"), col("rep").as("doc_b"),
      col("h0").as("h0b"), col("h1").as("h1b"))
    a.join(b, Seq("j", "band"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "h0a", "h1a", "h0b", "h1b").distinct()
      .withColumn("hamming",
        (bit_count(expr("h0a ^ h0b")) + bit_count(expr("h1a ^ h1b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Audio constellation fingerprints (Shazam-family landmark hashing,
    * Wang 2003): the payload "decodes" to a sample stream (stub: one
    * codepoint per position), frames of 32 samples each contribute their
    * PEAK (argmax, lowest index on ties — via the integer key
    * p·32 + (31−j) so no second pass), and consecutive-frame peak pairs
    * hash to `((peak·128 + next_peak)·1024 + pos·32 + next_pos)` — the
    * landmark the inverted index is keyed on. The in-frame peak POSITIONS
    * ride the hash (r11): value-only pairs span only ~95² distinct
    * landmarks over printable text, so posting lists grow linearly with
    * the corpus and the snippet⋈index join quietly goes quadratic
    * (DocScaleProbe 10x measured 28x wall); positions widen the space
    * ×32² ≈ 9.4M, which keeps per-landmark postings ~flat as the corpus
    * grows — exactly the frequency×frequency×Δt landmark sizing the Wang
    * 2003 design uses. All integer arithmetic; a SQL engine replays every
    * hash.
    *
    * Relational shape: ONE explode to sample rows (i → frame i div 32,
    * offset i mod 32), a (id, frame)-keyed aggregation for peaks, a lead
    * window on the same id partitioning for the pair hash — corpus-sized
    * rows, keys are always (id) or (id, frame), never all-pairs.
    *
    * PER-PAYLOAD FRAME CAP (r12, the r11 "What's wrong #2" fix): each
    * payload contributes at most `maxFrames` frames via a per-payload
    * stride k = ⌈nf / maxFrames⌉ (frames 0, k, 2k, … — the
    * [[sampleFrames]] everyK discipline applied before fingerprinting;
    * real audio systems bound landmarks per track, Wang 2003 §2). k = 1
    * for every payload under the cap, so output is IDENTICAL there —
    * sf-corpus docs run ~9 frames. Without the cap, 0.5 % giant docs
    * (~560 frames of degenerate filler whose every frame peaks on the
    * same character) collapse the landmark VALUE component and
    * concentrate postings on the position-only subspace — the
    * corpus-shape analog of the exact-dup quadratic: DocScaleProbe 10×
    * SKEW measured 65 s vs 3.6 s plain (r11). The cap bounds any one
    * payload's postings at maxFrames − 1 landmarks. Trade, stated
    * honestly: a snippet clipped from a STRIDED (giant) track
    * fingerprints at stride 1 and no longer shares landmark hashes with
    * its source — snippet recall on over-cap tracks is surrendered, by
    * the same subsampling trade production landmark caps make. Frame
    * indices stay TRUE indices (f = ordinal·k), so offset-coherence
    * deltas remain meaningful.
    */
  def audioFingerprints(df: DataFrame, idCol: String, textCol: Column,
                        maxFrames: Int = 64): DataFrame = {
    require(maxFrames >= 2, s"audioFingerprints: need >= 2 frames for a pair")
    val base = df.select(col(idCol).as("af_id"), textCol.as("af_txt"))
      .where(length(col("af_txt")) >= 64) // need >= 2 full frames for a pair
      .withColumn("af_nf", expr("length(af_txt) div 32"))
      .withColumn("af_k", expr(s"(af_nf + ${maxFrames - 1}) div $maxFrames"))
    // pk_key = peak·32 + (31 − offset): max() picks the peak value with the
    // LOWEST offset on ties in one pass, and both peak and offset unpack
    // from the winning key. Only KEPT frames' samples explode: j ranges
    // over ⌈nf/k⌉·32 sample slots, frame = (j div 32)·k, i = frame·32 +
    // j mod 32 — skipped frames never materialize rows.
    val peaks = base
      .withColumn("j", explode(sequence(lit(0),
        expr("((af_nf + af_k - 1) div af_k) * 32 - 1"))))
      .select(col("af_id"),
        (expr("j div 32") * col("af_k")).as("f"),
        (ascii(col("af_txt").substr(
            expr("(j div 32) * af_k * 32 + j % 32") + 1, lit(1))).cast("long") * 32 +
          (lit(31) - col("j") % 32)).as("pk_key"))
      .groupBy("af_id", "f")
      .agg(expr("CAST(max(pk_key) AS BIGINT)").as("mk"))
    peaks
      .withColumn("nmk",
        lead("mk", 1).over(Window.partitionBy("af_id").orderBy("f")))
      .where(col("nmk").isNotNull)
      .select(col("af_id").as("id"), col("f"),
        ((expr("mk div 32") * 128 + expr("nmk div 32")) * 1024 +
          (lit(31) - expr("mk % 32")) * 32 +
          (lit(31) - expr("nmk % 32"))).as("fhash"))
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
