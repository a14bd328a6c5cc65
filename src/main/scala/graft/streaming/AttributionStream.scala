package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupState

/** Streaming last-touch attribution — the incremental form of the batch
  * `q_attribution` window (§2.16f): per user, the latest click/view is
  * two scalars of keyed state; every purchase event emits its attributed
  * channel immediately instead of waiting for the nightly window pass.
  *
  * Semantics contract (the batch-twin spec's claim): with per-key
  * in-ts-order arrival, emitted rows equal the batch IGNORE-NULLS running
  * window exactly — a purchase attributes to the latest touch with
  * touchTs <= purchaseTs within the lookback, ties resolved by arrival
  * (the batch side's (ts, event_id) order). Out-of-order rows within one
  * micro-batch are repaired by sorting; across batches the watermark
  * discipline is the caller's (the [[SessionStream]] contract). State is
  * TWO scalars per user — bounded by key cardinality, not stream length.
  */
object AttributionStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, eventType: String)

  case class Touch(tsNs: Long, channel: String)

  case class Attributed(userId: Long, purchaseTsNs: Long, channel: String)

  /** Append-semantics attributed purchases via flatMapGroupsWithState. */
  def attribute(events: Dataset[Ev], lookbackNs: Long,
                touchTypes: Set[String] = Set("click", "view"))
      : Dataset[Attributed] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[Touch]): Iterator[Attributed] = {
      var touch = state.getOption.getOrElse(Touch(Long.MinValue, ""))
      val out = Seq.newBuilder[Attributed]
      rows.toSeq.sortBy(e => (e.tsNs, e.eventId)).foreach { e =>
        if (touchTypes(e.eventType)) {
          // >= : a later-ordered touch at the same ts wins, matching the
          // batch window's last-value-by-(ts, event_id) rule
          if (e.tsNs >= touch.tsNs) touch = Touch(e.tsNs, e.eventType)
        } else if (e.eventType == "purchase") {
          val attributed =
            if (touch.tsNs == Long.MinValue || e.tsNs - touch.tsNs > lookbackNs)
              "none"
            else touch.channel
          out += Attributed(userId, e.tsNs, attributed)
        }
      }
      if (touch.tsNs != Long.MinValue) state.update(touch)
      out.result().iterator
    }

    events.groupByKey(_.userId)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(update _)
  }
}
