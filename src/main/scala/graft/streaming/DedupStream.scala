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
  * MinHash banding routes each document to MULTIPLE buckets (one per
  * band), so — unlike simhash's single blocking key — a survive/suppress
  * decision is not locally complete in one bucket. The r5 note argued the
  * coordination is cyclic IF buckets must register only survivors; the
  * cycle disappears by matching the batch tier's actual candidate
  * semantics (q_doc_minhash_lsh): a pair is a candidate when the docs
  * share ANY band bucket, regardless of whether the earlier doc itself
  * survived. Then each bucket's verdict ("some PRIOR ARRIVAL here
  * verifies against me") is independent of other buckets' decisions, and
  * a second, transient per-doc stage ANDs the per-band verdicts — see
  * `dedupMinhashLsh`.
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

  case class BandRow(docId: Long, text: String, tsNs: Long,
                     sh: Seq[String], band: Int, bandHash: Long)
  case class BandVerdict(docId: Long, text: String, tsNs: Long,
                         band: Int, dup: Boolean)
  /** Per-bucket state: (docId, tsNs, distinct shingles) of every arrival in
    * the retention window — ARRIVALS, not survivors (see `dedupMinhashLsh`).
    * Shingle sets are what exact-Jaccard verification needs; state size is
    * bucket arrivals x document shingles, bounded by the retention window.
    */
  case class BandBucketState(docs: Seq[(Long, Long, Seq[String])], lastNs: Long)

  /** Streaming MinHash+LSH near-dup tier — the streaming form of
    * q_doc_minhash_lsh, with the SAME candidate + verification semantics:
    * a document drops iff some EARLIER-ARRIVED document (a) shares at least
    * one of its `bands` LSH band buckets and (b) verifies at true shingle
    * Jaccard >= `threshold`.
    *
    * Two chained stateful stages (Spark supports multiple stateful
    * operators in append mode):
    *  1. per (band, band_hash) bucket: `flatMapGroupsWithState` holds every
    *     arrival's shingle set for the retention window and emits one
    *     verdict row per (doc, band) — "a prior arrival in this bucket
    *     verifies against me". Registering ARRIVALS (not survivors) is what
    *     makes the verdict locally complete per bucket; it exactly mirrors
    *     the batch tier, whose candidate pairs are drawn from the full
    *     banded corpus, not from survivors.
    *  2. per docId: AND the `bands` verdicts. All of a document's band rows
    *     are derived from one input row, so they land in the same
    *     micro-batch and the group completes immediately — the stage holds
    *     NO cross-batch state (nothing is ever stored), it is just the
    *     only per-key-complete-group operator available on a stream.
    *
    * Scale: stage 1 shuffles on (band, band_hash) — bucket sizes, not
    * corpus size, bound the verification work, the same contract as the
    * batch tier's band join; stage 2 shuffles one row per (doc, band).
    * Suppression is arrival-order-dependent per bucket (ties broken by
    * (tsNs, docId)), the streaming analog of the batch tier's doc_a <
    * doc_b orientation.
    */
  def dedupMinhashLsh(docs: Dataset[Doc], threshold: Double,
                      retentionMs: Long, bands: Int = 4,
                      rowsPerBand: Int = 4): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val streaming = docs.isStreaming
    // Spark's static checker rejects ANY stateful op downstream of
    // flatMapGroupsWithState (a stage-1 output older than the global
    // watermark would be dropped as late by a watermark-filtering
    // downstream operator). Stage 2 here holds no state and applies no
    // watermark filter (NoTimeout — FlatMapGroupsWithStateExec only
    // late-filters under event-time timeout), and its inputs carry their
    // producing row's own event time, so the flagged scenario cannot
    // occur. The opt-out is session-global, so the CALLER makes that
    // call, not this library.
    if (streaming) require(docs.sparkSession.conf
        .get("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
        .equalsIgnoreCase("false"),
      "dedupMinhashLsh chains two stateful stages; set " +
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false " +
        "(stage 2 is stateless-in-effect — see scaladoc)")

    def bucketUpdate(key: (Int, Long), rows: Iterator[BandRow],
                     state: GroupState[BandBucketState]): Iterator[BandVerdict] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = rows.toSeq.sortBy(r => (r.tsNs, r.docId))
      var st = state.getOption.getOrElse(BandBucketState(Vector.empty, 0L))
      val out = Seq.newBuilder[BandVerdict]
      for (r <- sorted) {
        val mySh = r.sh.toSet
        val dup = st.docs.exists { case (_, _, sh) =>
          val inter = sh.count(mySh.contains)
          val uni = sh.size + mySh.size - inter
          uni > 0 && inter.toDouble / uni >= threshold
        }
        out += BandVerdict(r.docId, r.text, r.tsNs, r.band, dup)
        st = BandBucketState(st.docs :+ ((r.docId, r.tsNs, r.sh)),
          math.max(st.lastNs, r.tsNs))
      }
      state.update(st)
      if (streaming) state.setTimeoutTimestamp(
        math.max(st.lastNs / 1000000L + retentionMs,
          state.getCurrentWatermarkMs() + 1L))
      out.result().iterator
    }

    // stage-2 combiner: stateless in effect — the group is always complete
    // within the micro-batch (all band rows of a doc share its event time),
    // so no state is ever written and no timeout is needed
    def combine(docId: Long, rows: Iterator[BandVerdict],
                state: GroupState[Boolean]): Iterator[Doc] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rs = rows.toSeq
      if (rs.isEmpty || rs.exists(_.dup)) Iterator.empty
      else Iterator.single(Doc(rs.head.docId, rs.head.text, rs.head.tsNs))
    }

    val withSh = docs.toDF()
      .withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
      .withColumn("sh", Text.shingles(col("text"), 2))
    val banded = Text.lshBands(
        Text.minhashSignature(withSh, col("sh"), bands * rowsPerBand,
          Text.polyHash),
        bands, rowsPerBand)
      .withWatermark("event_time", s"${2 * retentionMs} milliseconds")
      .select(col("docId"), col("text"), col("tsNs"), col("sh"),
        col("band"), col("band_hash").as("bandHash"), col("event_time"))
      .as[BandRow]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(r => (r.band, r.bandHash))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(bucketUpdate)
      .groupByKey(_.docId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(combine)
  }
}
