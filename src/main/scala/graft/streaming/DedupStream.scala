package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Text

/** Streaming document deduplication — the continuous-ingest form of the
  * batch dedup tiers (§2.38 exact / §2.41b simhash near-dup): a training
  * corpus assembled from a live feed wants duplicates dropped AT INGEST,
  * not in a nightly batch rewrite.
  *
  * Two tiers, same semantics as their batch twins:
  *  - exact: first arrival of a normalization key survives, later arrivals
  *    drop — `dropDuplicatesWithinWatermark`, the built-in watermark-bounded
  *    state idiom (no custom state code).
  *  - near-dup: simhash-bucket blocking + in-bucket Hamming check in
  *    per-key state (`flatMapGroupsWithState`), the streaming form of the
  *    q_doc_simhash_pairs block join.
  *
  * Scale: both shuffle on the dedup key (norm-key hash / simhash bucket),
  * so state and work distribute across executors; per-key state is bounded
  * by the watermark (exact) or the event-time timeout (near-dup) — state
  * tracks the RETENTION WINDOW, not stream lifetime. A duplicate arriving
  * after retention passes survives — the explicit trade every
  * watermark-bounded streaming dedup makes; the batch tiers remain the
  * exhaustive backstop.
  *
  * Why simhash and not MinHash banding for the streaming near-dup tier:
  * banding routes each document to MULTIPLE buckets (one per band), and a
  * survive/suppress decision must be consistent across all of them — the
  * survivor registered in every band's state only if NO band found a
  * candidate. That cross-key coordination is cyclic within one stateful
  * stage (each bucket's state depends on decisions other buckets are
  * making in the same batch), so it needs a second feedback pass the
  * engine doesn't offer. SimHash blocks on ONE key per document, so the
  * in-bucket decision is locally complete — the streaming-friendly tier
  * by construction. MinHash+LSH stays a batch tier (q_doc_minhash_lsh).
  */
object DedupStream {

  case class Doc(docId: Long, text: String, tsNs: Long)
  case class BucketDoc(docId: Long, text: String, tsNs: Long,
                       simhash: Long, bucket: Long)
  case class BucketState(hashes: Seq[Long], lastNs: Long)

  /** Exact streaming dedup on the batch tier's normalization key (first 8
    * words — Text/QueriesText's exactDupGroups key): first occurrence in
    * the retention window survives. Emits the surviving rows.
    */
  def dedupExact(docs: Dataset[Doc], retentionMs: Long): DataFrame =
    docs.toDF()
      .withColumn("event_time",
        timestamp_micros(expr("tsNs div 1000")))
      .withColumn("norm_key",
        concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
      .withWatermark("event_time", s"$retentionMs milliseconds")
      .dropDuplicatesWithinWatermark("norm_key")

  /** Near-dup streaming dedup: documents simhash into buckets (top bits);
    * within a bucket, a document survives only if no PRIOR surviving
    * document of the retention window is within `maxHamming` of its
    * fingerprint. State per bucket = surviving fingerprints, flushed by
    * event-time timeout once the watermark passes the bucket's last
    * activity + retention.
    *
    * Same blocking recall contract as the batch tier: a near-dup pair in
    * DIFFERENT buckets is missed (simhash blocking trades recall for never
    * joining the corpus against itself); within-bucket decisions depend on
    * arrival order per bucket, which the shuffle preserves per key.
    */
  def dedupSimhash(docs: Dataset[Doc], maxHamming: Int,
                   retentionMs: Long): Dataset[BucketDoc] = {
    import docs.sparkSession.implicits._
    val streaming = docs.isStreaming

    def update(bucket: Long, rows: Iterator[BucketDoc],
               state: GroupState[BucketState]): Iterator[BucketDoc] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = rows.toSeq.sortBy(d => (d.tsNs, d.docId))
      var st = state.getOption.getOrElse(BucketState(Vector.empty, 0L))
      val out = Seq.newBuilder[BucketDoc]
      for (d <- sorted) {
        val dup = st.hashes.exists(h =>
          java.lang.Long.bitCount(h ^ d.simhash) <= maxHamming)
        if (!dup) {
          out += d
          st = BucketState(st.hashes :+ d.simhash, math.max(st.lastNs, d.tsNs))
        } else st = st.copy(lastNs = math.max(st.lastNs, d.tsNs))
      }
      state.update(st)
      if (streaming) state.setTimeoutTimestamp(
        math.max(st.lastNs / 1000000L + retentionMs,
          state.getCurrentWatermarkMs() + 1L))
      out.result().iterator
    }

    val withSig = Text.simhash(
        docs.toDF()
          .withColumn("event_time",
            timestamp_micros(expr("tsNs div 1000"))),
        split(col("text"), " "), 30)
      .withWatermark("event_time", s"${2 * retentionMs} milliseconds")
      // keep the watermarked column in scope — the event-time timeout
      // requires a watermark in the child plan (SessionStream contract);
      // the BucketDoc encoder resolves by name and ignores it
      .select(col("docId"), col("text"), col("tsNs"), col("simhash"),
        shiftright(col("simhash"), 20).as("bucket"), col("event_time"))
      .as[BucketDoc]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    withSig.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(update)
  }
}
