package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupState

/** Streaming integer EWMA — the incremental form of the §2.82 catalog query:
  * per-key smoothed state s ← (v + 3·s) div 4 advanced as events arrive, so
  * the smoothed signal is continuously current instead of a nightly batch.
  *
  * The fold is order-sensitive, so the parity contract matches
  * [[FunnelStream]]: rows within a micro-batch are repaired by sorting on
  * (tsNs, eventId); across batches, per-key in-order arrival is the
  * caller's watermark discipline. Because each step is an INTEGER
  * recurrence, replaying the same ordered events gives bit-identical state
  * on any engine — the same property that makes the batch twin
  * oracle-checkable. State is three scalars per key, bounded by key
  * cardinality, not stream length.
  */
object EwmaStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, cents: Long)

  case class Smooth(ewma: Long, n: Long, lastTs: Long)

  /** Current (userId, n events seen, ewma cents) per key, Update-mode. */
  def ewma(events: Dataset[Ev]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._

    def step(s: Smooth, e: Ev): Smooth =
      if (s.n == 0L) Smooth(e.cents, 1L, e.tsNs)
      else Smooth((e.cents + 3L * s.ewma) / 4L, s.n + 1L, e.tsNs)

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[Smooth]): (Long, Long, Long) = {
      val init = state.getOption.getOrElse(Smooth(0L, 0L, Long.MinValue))
      val next = rows.toSeq.sortBy(e => (e.tsNs, e.eventId))
        .foldLeft(init)(step)
      state.update(next)
      (userId, next.n, next.ewma)
    }

    events.groupByKey(_.userId).mapGroupsWithState(update _)
  }
}
