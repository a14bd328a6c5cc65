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

  case class Hw(l: Long, b: Long, n: Long, lastTs: Long)

  /** Streaming Holt-Winters — the incremental form of the §2.92 catalog
    * query: per-key (level, trend) advanced per observation with the SAME
    * shift-floored integer recurrence as `TimeSeries.holtWintersFold`
    *   l' = (x + 3(l+b)) >> 2 ; b' = ((l' − l) + 3b) >> 2
    * so stream state equals the batch fold over the same ordered series
    * bit-for-bit (spec-asserted). Order/parity contract identical to
    * [[ewma]]; state is four scalars per key. Emits (key, n, level, trend)
    * in Update mode — the one-step forecast is level + trend.
    */
  def holtWinters(points: Dataset[Ev]): Dataset[(Long, Long, Long, Long)] = {
    import points.sparkSession.implicits._

    def step(s: Hw, e: Ev): Hw =
      if (s.n == 0L) Hw(e.cents, 0L, 1L, e.tsNs)
      else {
        val nl = (e.cents + 3L * (s.l + s.b)) >> 2
        val nb = ((nl - s.l) + 3L * s.b) >> 2
        Hw(nl, nb, s.n + 1L, e.tsNs)
      }

    def update(key: Long, rows: Iterator[Ev],
               state: GroupState[Hw]): (Long, Long, Long, Long) = {
      val init = state.getOption.getOrElse(Hw(0L, 0L, 0L, Long.MinValue))
      val next = rows.toSeq.sortBy(e => (e.tsNs, e.eventId))
        .foldLeft(init)(step)
      state.update(next)
      (key, next.n, next.l, next.b)
    }

    points.groupByKey(_.userId).mapGroupsWithState(update _)
  }

  case class Cusum(sp: Long, sn: Long, alarmUp: Long, alarmDn: Long,
                   maxSp: Long, maxSn: Long, n: Long)

  /** Streaming two-sided CUSUM — the incremental form of the §2.94 catalog
    * detector: per-key s⁺/s⁻ advanced per observation against a GIVEN
    * baseline (`target`, with slack = target div 100 and alarm threshold
    * h = target div 10 — the batch query's parameters), first-crossing
    * observation indices latched. The monitoring use: target comes from
    * the batch calibration run; the stream flags drift continuously
    * instead of at the next nightly batch. Same integer recurrence as the
    * batch fold, so stream state replays bit-identically (spec-asserted
    * across micro-batch slicings); state is seven scalars per key.
    */
  /** The ONE cusum recurrence — shared by [[cusum]] and [[cusumKeyed]]
    * (ADVICE r12: a duplicated step would let the batch-matched
    * recurrence drift between the two forms). slack = target div 100,
    * alarm threshold h = target div 10 — the batch lane's parameters.
    */
  private def cusumStep(target: Long)(s: Cusum, cents: Long): Cusum = {
    val slack = target / 100L
    val h = target / 10L
    val sp = math.max(0L, s.sp + (cents - target - slack))
    val sn = math.max(0L, s.sn + (target - slack - cents))
    Cusum(sp, sn,
      if (s.alarmUp > 0L) s.alarmUp else if (sp > h) s.n + 1L else 0L,
      if (s.alarmDn > 0L) s.alarmDn else if (sn > h) s.n + 1L else 0L,
      math.max(s.maxSp, sp), math.max(s.maxSn, sn), s.n + 1L)
  }

  def cusum(points: Dataset[Ev], target: Long)
      : Dataset[(Long, Long, Long, Long, Long, Long)] = {
    import points.sparkSession.implicits._
    val step = cusumStep(target) _

    def update(key: Long, rows: Iterator[Ev],
               state: GroupState[Cusum]): (Long, Long, Long, Long, Long, Long) = {
      val init = state.getOption.getOrElse(Cusum(0L, 0L, 0L, 0L, 0L, 0L, 0L))
      val next = rows.toSeq.sortBy(e => (e.tsNs, e.eventId))
        .foldLeft(init)((s, e) => step(s, e.cents))
      state.update(next)
      (key, next.n, next.alarmUp, next.alarmDn, next.maxSp, next.maxSn)
    }

    points.groupByKey(_.userId).mapGroupsWithState(update _)
  }

  /** A keyed observation whose stream key is the NATURAL STRING key
    * (priority, event type, …). `mapGroupsWithState` keys need not be
    * integers (r13 verdict item 5) — keying on the domain value directly
    * removes the dense-index mint and with it the driver round-trip that
    * collected the key domain to build a label frame.
    */
  case class KEv(key: String, tsNs: Long, eventId: Long, cents: Long)

  /** Per-KEY-target CUSUM (r12, the §2.94 batch lane's actual shape —
    * each priority monitors against its own first-year baseline): same
    * recurrence as [[cusum]] with target/slack/h resolved per key from
    * the broadcast-closure map (the calibration MODEL — a bounded driver
    * scalar per monitored key, the precedented stats-head pattern). Keys
    * absent from `targets` are dropped — a monitored key without a
    * calibrated baseline has no defined detector (the batch lane can't
    * produce such a row either). Keys are the natural strings; no dense
    * index exists to collect.
    */
  def cusumKeyed(points: Dataset[KEv], targets: Map[String, Long])
      : Dataset[(String, Long, Long, Long, Long, Long)] = {
    import points.sparkSession.implicits._

    def update(key: String, rows: Iterator[KEv],
               state: GroupState[Cusum]): Iterator[(String, Long, Long, Long, Long, Long)] =
      targets.get(key) match {
        case None => Iterator.empty
        case Some(t) =>
          val init = state.getOption.getOrElse(Cusum(0L, 0L, 0L, 0L, 0L, 0L, 0L))
          val next = rows.toSeq.sortBy(e => (e.tsNs, e.eventId))
            .foldLeft(init)((s, e) => cusumStep(t)(s, e.cents))
          state.update(next)
          Iterator.single(
            (key, next.n, next.alarmUp, next.alarmDn, next.maxSp, next.maxSn))
      }

    points.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(update _)
  }
}
