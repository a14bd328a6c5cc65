package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming track assembly — the Structured Streaming form of flightdb's
  * consolidator + AddTrackFragment (fgae/addtrackfragment.go): point
  * fragments arrive continuously, are grouped by airframe key, glued into
  * sessions ("tracks") while gaps stay under the max-gap rule
  * (track.go:25 kExtensionMaxGap), and emitted when a gap closes them.
  *
  * `flatMapGroupsWithState` is the one place imperative state is the right
  * Spark idiom: per-key state is partitioned by the shuffle, checkpointed by
  * the engine, and bounded (one open session per key), so this scales to any
  * key cardinality a cluster can shuffle.
  */
object SessionStream {

  case class Point(userId: Long, tsNs: Long, value: Double)

  case class OpenSession(userId: Long, startNs: Long, endNs: Long,
                         nPoints: Long, valueSum: Double)

  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, value_sum: Double)

  /** Glue points into gap-bounded sessions; emits a session once a point
    * arrives more than `maxGapNs` after its end (deterministic given arrival
    * order per key — matching the reference's fragment-gluing which also
    * trusts per-airframe arrival).
    *
    * CAVEAT (cross-key lateness): the watermark is GLOBAL, so a fast key
    * advancing event time bounds how late a slow key's points may arrive —
    * anything older than (max observed event time - watermark delay) is
    * dropped by the engine before it reaches this operator. The delay is set
    * to 2x the gap (one gap of slack beyond the flush rule) so per-key
    * in-order streams whose keys drift by less than a gap match batch
    * results exactly; keys lagging the global front by more than 2x gap can
    * lose points that the batch operator would keep. The ms-truncated
    * timeout may also flush up to ~1 ms before the exact ns gap boundary.
    *
    * Keys that go quiet are flushed by an EVENT-time timeout: once the
    * stream's watermark passes a session's end + gap, the final open session
    * is emitted and its state removed — so state size tracks ACTIVE keys,
    * not total key cardinality over the stream's lifetime, and the flush
    * rule is the same event-time gap rule the batch operator applies.
    * (Processing-time timeouts would also bound state, but they make the
    * engine schedule batches forever — `processAllAvailable` never settles —
    * and tie semantics to wall-clock.)
    */
  def sessionize(points: Dataset[Point], maxGapNs: Long): Dataset[ClosedSession] = {
    import points.sparkSession.implicits._
    val maxGapMs = math.max(maxGapNs / 1000000L, 1L)
    val streaming = points.isStreaming
    // An upstream stage (e.g. dropDuplicatesWithinWatermark dedup) may have
    // defined the watermark already — redefining it downstream is an
    // analysis error, and any advancing watermark drives our timeouts fine.
    // Contract for such callers: keep the watermarked column in the input
    // Dataset (event-time timeout needs it in scope).
    val hasWatermark = points.queryExecution.logical.find {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => true
      case _ => false
    }.isDefined

    def close(s: OpenSession): ClosedSession =
      ClosedSession(s.userId, s.startNs / 1000, s.endNs / 1000, s.nPoints, s.valueSum)

    def update(userId: Long, rows: Iterator[Point],
               state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).toSeq
        state.remove()
        return out.iterator
      }
      val sorted = rows.toSeq.sortBy(p => (p.tsNs, p.value))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      for (p <- sorted) {
        open match {
          case Some(s) if p.tsNs - s.endNs <= maxGapNs =>
            open = Some(s.copy(endNs = math.max(s.endNs, p.tsNs),
              nPoints = s.nPoints + 1, valueSum = s.valueSum + p.value))
          case Some(s) =>
            closed += close(s)
            open = Some(OpenSession(userId, p.tsNs, p.tsNs, 1L, p.value))
          case None =>
            open = Some(OpenSession(userId, p.tsNs, p.tsNs, 1L, p.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // flush when event time passes the gap rule (timeout timestamps must
        // stay ahead of the current watermark); batch runs have no timeouts
        if (streaming) state.setTimeoutTimestamp(
          math.max(s.endNs / 1000000L + maxGapMs, state.getCurrentWatermarkMs() + 1L))
      }
      closed.result().iterator
    }

    val src =
      if (!streaming || hasWatermark) points
      else points
        .withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
        // 2x gap: one gap for the flush rule, one gap of cross-key slack
        // (see caveat above)
        .withWatermark("event_time", s"${2 * maxGapMs} milliseconds")
        .as[Point]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(update)
  }

  /** Batch entry point used by specs: run the same logic over a bounded
    * Dataset via the streaming engine with a memory sink.
    */
  def sessionizeBatchEquivalent(spark: SparkSession, dir: String,
                                maxGapNs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    val pts = graft.Tables.events(spark, dir)
      .select(col("user_id").as("userId"), col("ts").as("tsNs"), col("value"))
      .as[Point]
    sessionize(pts, maxGapNs)
  }
}
