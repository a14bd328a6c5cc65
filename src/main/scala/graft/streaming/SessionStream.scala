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
    * arrives more than `maxGapNs` after its end (processing-time-free,
    * deterministic given arrival order per key — matching the reference's
    * fragment-gluing which also trusts per-airframe arrival).
    */
  def sessionize(points: Dataset[Point], maxGapNs: Long): Dataset[ClosedSession] = {
    import points.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Point],
               state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(p => (p.tsNs, p.value))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      for (p <- sorted) {
        open match {
          case Some(s) if p.tsNs - s.endNs <= maxGapNs =>
            open = Some(s.copy(endNs = math.max(s.endNs, p.tsNs),
              nPoints = s.nPoints + 1, valueSum = s.valueSum + p.value))
          case Some(s) =>
            closed += ClosedSession(s.userId, s.startNs / 1000, s.endNs / 1000,
              s.nPoints, s.valueSum)
            open = Some(OpenSession(userId, p.tsNs, p.tsNs, 1L, p.value))
          case None =>
            open = Some(OpenSession(userId, p.tsNs, p.tsNs, 1L, p.value))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    points.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
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
