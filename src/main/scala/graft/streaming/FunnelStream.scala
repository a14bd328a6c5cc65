package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupState

/** Streaming funnel progression — the incremental form of
  * [[graft.operators.Behavior.funnel]]: each user's greedy step frontier
  * (t_first, t_prev, step) is per-key state, advanced as events arrive, so
  * the "how many users reached step i" report is continuously current
  * instead of a nightly batch.
  *
  * The greedy chain only ever consumes the EARLIEST qualifying event per
  * step, so per-key in-ts-order arrival reproduces the batch result
  * exactly (the batch-twin spec's claim); out-of-order arrival within a
  * micro-batch is repaired by sorting the batch's rows, across batches it
  * is the caller's watermark discipline (same contract as
  * [[SessionStream.sessionize]]). State is three scalars per user —
  * bounded by key cardinality, not stream length.
  */
object FunnelStream {

  case class Ev(userId: Long, tsNs: Long, eventType: String)

  case class Frontier(tFirst: Long, tPrev: Long, step: Int)

  /** Current (userId, step reached) per user, Update-mode semantics. */
  def funnelProgress(events: Dataset[Ev], steps: Seq[String],
                     windowNs: Long): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty)

    def advance(f: Frontier, e: Ev): Frontier =
      if (f.step == 0) {
        if (e.eventType == steps.head) Frontier(e.tsNs, e.tsNs, 1) else f
      } else if (f.step < steps.size &&
                 e.eventType == steps(f.step) &&
                 e.tsNs > f.tPrev &&
                 e.tsNs - f.tFirst <= windowNs) {
        Frontier(f.tFirst, e.tsNs, f.step + 1)
      } else f

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[Frontier]): (Long, Int) = {
      val init = state.getOption.getOrElse(Frontier(0L, 0L, 0))
      val next = rows.toSeq.sortBy(e => (e.tsNs, e.eventType))
        .foldLeft(init)(advance)
      state.update(next)
      (userId, next.step)
    }

    events.groupByKey(_.userId).mapGroupsWithState(update _)
  }
}
