package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frequency sketching — the incremental companion of the §2.63
  * count-min lane: heavy hitters maintained continuously per key with
  * BOUNDED state, instead of a nightly batch over the full stream.
  */
object SketchStream {

  case class Tok(key: String, tsNs: Long, eventId: Long, token: String)

  case class MgState(counters: Map[String, Long], n: Long)

  /** Streaming Misra-Gries heavy hitters (Misra & Gries 1982): at most `k`
    * counters per stream key; a new token either increments its counter,
    * claims a free slot, or decrements EVERY counter (dropping zeros) —
    * the classic guarantee follows: any token with true frequency
    * > n/(k+1) is present, and a reported count underestimates truth by
    * at most n/(k+1). The step is deterministic given ordered input, so
    * the parity contract matches [[EwmaStream]]: rows inside a
    * micro-batch are repaired by sorting on (tsNs, eventId); per-key
    * in-order arrival across batches is the caller's watermark
    * discipline. Replaying the same ordered tokens yields IDENTICAL
    * counter maps on any slicing (spec-asserted), which is what makes
    * the batch fold the oracle. State: ≤ k counters + 1 scalar per key —
    * bounded by policy, not stream length.
    *
    * Emits, per key per micro-batch, the current counters as
    * (key, n_seen, token, count) rows ordered by (count desc, token) —
    * Update-mode semantics; the last emission per key is current.
    */
  def heavyHitters(toks: Dataset[Tok], k: Int)
      : Dataset[(String, Long, String, Long)] = {
    import toks.sparkSession.implicits._
    require(k >= 1)

    def step(s: MgState, t: String): MgState =
      if (s.counters.contains(t))
        MgState(s.counters.updated(t, s.counters(t) + 1L), s.n + 1L)
      else if (s.counters.size < k)
        MgState(s.counters.updated(t, 1L), s.n + 1L)
      else
        MgState(s.counters.map { case (w, c) => (w, c - 1L) }
          .filter(_._2 > 0L), s.n + 1L)

    def update(key: String, rows: Iterator[Tok], state: GroupState[MgState])
        : Iterator[(String, Long, String, Long)] = {
      val init = state.getOption.getOrElse(MgState(Map.empty, 0L))
      val next = rows.toSeq.sortBy(r => (r.tsNs, r.eventId))
        .foldLeft(init)((s, r) => step(s, r.token))
      state.update(next)
      next.counters.toSeq.sortBy { case (w, c) => (-c, w) }
        .map { case (w, c) => (key, next.n, w, c) }.iterator
    }

    toks.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update _)
  }

  /** The batch twin: one sequential fold over the SAME (tsNs, eventId)-
    * ordered tokens — what the spec compares stream state against, and
    * the deterministic replay any engine can run.
    */
  def misraGriesFold(tokens: Seq[String], k: Int): MgState =
    tokens.foldLeft(MgState(Map.empty, 0L)) { (s, t) =>
      if (s.counters.contains(t))
        MgState(s.counters.updated(t, s.counters(t) + 1L), s.n + 1L)
      else if (s.counters.size < k)
        MgState(s.counters.updated(t, 1L), s.n + 1L)
      else
        MgState(s.counters.map { case (w, c) => (w, c - 1L) }
          .filter(_._2 > 0L), s.n + 1L)
    }

  case class QTok(key: String, hash: Long, value: Double)

  case class QState(pairs: Vector[(Long, Double)], nSeen: Long)

  /** Streaming mergeable bottom-k quantile sketch — the incremental form
    * of §2.65b (`Sketch.quantileSketch`): per key, the k smallest DISTINCT
    * (hash, value) pairs. Unlike the order-sensitive recurrences above,
    * this state is a COMMUTATIVE IDEMPOTENT monoid (set-union then
    * bottom-k), so arrival order and micro-batch slicing provably cannot
    * change it — the spec streams a fully SHUFFLED arrival and still
    * matches the batch aggregate bit-for-bit. Emits (key, n_sketch, p50)
    * with the batch lane's rank-selection quantile (pure index
    * arithmetic; the sampled double passes through untouched). The
    * emitted n_seen is the MONOTONE ingestion counter (the sketch size
    * saturates at k, so "latest row per key" must key on n_seen).
    */
  def quantileSketch(toks: Dataset[QTok], k: Int)
      : Dataset[(String, Long, Int, Double)] = {
    import toks.sparkSession.implicits._
    require(k >= 1)

    def update(key: String, rows: Iterator[QTok], state: GroupState[QState])
        : (String, Long, Int, Double) = {
      val init = state.getOption.getOrElse(QState(Vector.empty, 0L))
      val incoming = rows.toSeq
      val merged = (init.pairs ++ incoming.map(r => (r.hash, r.value)))
        .distinct.sorted.take(k)
      val next = QState(merged, init.nSeen + incoming.size)
      state.update(next)
      val vals = merged.map(_._2).sorted
      val p50 = vals((vals.size - 1) / 2)
      (key, next.nSeen, merged.size, p50)
    }

    toks.groupByKey(_.key).mapGroupsWithState(update _)
  }
}
