package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGate

/** The driver-gating harness itself: staging round-trip fidelity, the
  * data-scaled state-partition rule, conf restoration, and the
  * one-file-per-batch foreachBatch contract. The per-operator semantics
  * are covered by each gated lane's oracle; these tests pin the HARNESS
  * behaviors those lanes rely on.
  */
class StreamGateSpec extends AnyFunSuite with SparkFixture {

  test("partition rule: floor 8, scales 1 per 100k rows, capped at session") {
    assert(StreamGate.partitionsFor(100L, 32L) == 8L)
    assert(StreamGate.partitionsFor(900000L, 32L) == 9L)
    assert(StreamGate.partitionsFor(10000000L, 32L) == 32L)
    // a session configured BELOW the floor is never raised (local tests
    // run at 4 partitions; the gate must not widen them)
    assert(StreamGate.partitionsFor(100L, 4L) == 4L)
  }

  test("run() round-trips the staged rows and restores the session conf") {
    val partsKey = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(partsKey)
    val staged = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    val out = StreamGate.run(spark, staged, "append")(src =>
      src.select(col("id"), col("v")))
    assert(spark.conf.get(partsKey) == before, "conf not restored")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 100L).map(i => (i, i * 2)).toSet)
  }

  test("runForeach: one file per micro-batch, no rows lost") {
    val staged = spark.range(120).select(col("id"))
    // foreachBatch runs on the stream-execution thread — atomics give the
    // cross-thread read-back an explicit happens-before (ADVICE r12)
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val rows = new java.util.concurrent.atomic.AtomicLong
    StreamGate.runForeach(spark, staged, nFiles = 3) { (b, _) =>
      batches.incrementAndGet()
      rows.addAndGet(b.count())
    }
    assert(batches.get == 3, s"expected 3 file-batches, got ${batches.get}")
    assert(rows.get == 120L)
  }

  test("runOrdered: one file per batch IN PARTS ORDER, state carried across batches") {
    import spark.implicits._
    def mk(tag: String, ks: Seq[String], tsH: Long) =
      ks.map(k => (k, tag, tsH * 3600000000000L)).toDF("k", "tag", "tsNs")
    // b recurs in part 1 and a in part 2 — cross-batch first-wins proves
    // both the mtime file order AND that dedup state survived the batch
    // boundary (the single-batch harness can't exercise either). Event
    // times sit past the 100 h delay (hour 10010+) so the watermark
    // visibly advances across batches — exercising the r14 advancement
    // assert — while staying BELOW every event time (delay ≥ span + the
    // head start), so nothing evicts and nothing is late.
    val parts = Seq(
      mk("p0", Seq("a", "b"), 10010),
      mk("p1", Seq("b", "c"), 10020),
      mk("p2", Seq("a", "d"), 10021))
    val out = StreamGate.runOrdered(spark, parts, "append") { src =>
      src.withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
        .withWatermark("event_time", "100 hours")
        .dropDuplicatesWithinWatermark("k")
        .select(col("k"), col("tag"))
    }
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("a" -> "p0", "b" -> "p0", "c" -> "p1", "d" -> "p2"),
      s"got $got")
  }

  test("runOrdered: a watermark that never advances fails LOUDLY (and the opt-out works)") {
    import spark.implicits._
    // every event time within the delay of epoch ⇒ max-seen − delay ≤ 0
    // keeps the watermark pinned at the initial value for the whole run —
    // the advancement assert must fire (the multi-batch contract claims
    // cross-batch watermark movement; a lane whose clock can't move it
    // must SAY so via expectWatermarkAdvance = false, not pass silently)
    def mk(ks: Seq[String], tsH: Long) =
      ks.map(k => (k, tsH * 3600000000000L)).toDF("k", "tsNs")
    val parts = Seq(mk(Seq("a", "b"), 10), mk(Seq("c"), 20))
    def run(expectAdvance: Boolean) =
      StreamGate.runOrdered(spark, parts, "append", expectAdvance) { src =>
        src.withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
          .withWatermark("event_time", "100 hours")
          .dropDuplicatesWithinWatermark("k")
          .select(col("k"))
      }
    val ex = intercept[IllegalArgumentException](run(expectAdvance = true))
    assert(ex.getMessage.contains("watermark never advanced"))
    // the documented opt-out for legitimately-pinned clocks still gates
    val got = run(expectAdvance = false).collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b", "c"))
  }

  test("runOrderedMulti: one file per SOURCE per batch, nothing lost") {
    val a = Seq(spark.range(0, 5).toDF("id"), spark.range(5, 10).toDF("id"))
    val b = Seq(spark.range(100, 104).toDF("id"),
      spark.range(104, 108).toDF("id"))
    // the internal data-batch assert (== the union of per-source
    // non-empty file indices, here {0,1} = 2) fires inside the harness;
    // this test pins completeness
    val out = StreamGate.runOrderedMulti(spark, Seq(a, b), "append") {
      case Seq(x, y) => x.unionByName(y)
      case other     => fail(s"expected 2 sources, got ${other.size}")
    }
    val got = out.collect().map(_.getLong(0)).toSet
    assert(got == ((0L until 10L) ++ (100L until 108L)).toSet, s"got $got")
  }

  test("runOrderedMulti: MISALIGNED empty slices across sources don't trip the batch assert") {
    // source A is empty at index 1, source B at index 2 — a data batch
    // still runs at every index (some source contributes rows), so the
    // expected count is the UNION of non-empty index sets (3), not the
    // per-source max of non-empty counts (2) — ADVICE r13: a time gap
    // emptying one side's slice must not fail the harness spuriously
    val a = Seq(spark.range(0, 3).toDF("id"),
      spark.range(0, 0).toDF("id"),
      spark.range(3, 6).toDF("id"))
    val b = Seq(spark.range(100, 103).toDF("id"),
      spark.range(103, 106).toDF("id"),
      spark.range(0, 0).toDF("id"))
    val out = StreamGate.runOrderedMulti(spark, Seq(a, b), "append") {
      case Seq(x, y) => x.unionByName(y)
      case other     => fail(s"expected 2 sources, got ${other.size}")
    }
    val got = out.collect().map(_.getLong(0)).toSet
    assert(got == ((0L until 6L) ++ (100L until 106L)).toSet, s"got $got")
  }

  test("splitByTime: empty input degrades to empty slices; non-Long ts column is rejected") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("k", "tsNs")
    val slices = StreamGate.splitByTime(empty, "tsNs", 4)
    assert(slices.size == 4 && slices.forall(_.count() == 0L))
    val wrongType = Seq(("a", 1.5)).toDF("k", "tsNs")
    val ex = intercept[IllegalArgumentException](
      StreamGate.splitByTime(wrongType, "tsNs", 2))
    assert(ex.getMessage.contains("LongType"))
  }
}
