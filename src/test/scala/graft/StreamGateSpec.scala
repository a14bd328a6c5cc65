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

  test("partition rule: floor 4, scales 1 per 100k rows, capped at session") {
    // floor 8 → 4 in r15 after a same-JVM interleaved A/B (GateFloorProbe:
    // parts=4 beat 8 on every gated lane — each state partition is a
    // store instance paying per-batch setup + commit)
    assert(StreamGate.partitionsFor(100L, 32L) == 4L)
    assert(StreamGate.partitionsFor(900000L, 32L) == 9L)
    assert(StreamGate.partitionsFor(10000000L, 32L) == 32L)
    // a session configured BELOW the floor is never raised (local tests
    // run at 4 partitions; the gate must not widen them)
    assert(StreamGate.partitionsFor(100L, 2L) == 2L)
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

  test("runSliced == runOrdered: one-pass staging is pure harness (same slices, same result)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // 60 in-order events, 17 keys: no key repeats WITHIN a 15-id time
    // slice (15 < 17), every key repeats ACROSS slices — so first-wins
    // dedup is fully deterministic and ORDER-SENSITIVE: equal outputs
    // prove equal slice membership and equal batch order between the
    // filter-form and one-pass staging paths.
    val df = (0 until 60).map { i =>
      (s"k${i % 17}", s"tag$i", (10000L + i) * 3600000000000L)
    }.toDF("k", "tag", "tsNs")
    def op(src: DataFrame): DataFrame =
      src.withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
        .withWatermark("event_time", "200 hours")
        .dropDuplicatesWithinWatermark("k")
        .select(col("k"), col("tag"))
    val viaParts = StreamGate.runOrdered(spark,
      StreamGate.splitByTime(df, "tsNs", 4), "append")(op)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val viaSlices = StreamGate.runSliced(spark,
      StreamGate.sliceByTime(df, "tsNs", 4), "append")(op)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val want = (0 until 17).map(k => s"k$k" -> s"tag$k").toMap
    assert(viaParts == want, s"filter-form staging drifted: $viaParts")
    assert(viaSlices == want, s"one-pass staging drifted: $viaSlices")
  }

  test("Slices.append stages as the LAST batch; empty time-gap slices stage as empty files") {
    import spark.implicits._
    // span 10 h over 4 slices leaves slices 1 and 2 empty (time gap) —
    // the empty-template copy path must still stage aligned empty files
    // and the harness's batch assert must count only the non-empty ones.
    // The appended frame arrives LAST: its recurring key must LOSE
    // first-wins, its fresh key must land.
    val h = 3600000000000L
    val df = Seq(("a", "base", 10000L * h), ("b", "base", 10001L * h),
      ("c", "base", 10010L * h)).toDF("k", "tag", "tsNs")
    val late = Seq(("a", "late", 10020L * h), ("z", "late", 10020L * h))
      .toDF("k", "tag", "tsNs")
    val out = StreamGate.runSliced(spark,
      StreamGate.sliceByTime(df, "tsNs", 4).append(late), "append") { src =>
        src.withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
          .withWatermark("event_time", "200 hours")
          .dropDuplicatesWithinWatermark("k")
          .select(col("k"), col("tag"))
      }.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("a" -> "base", "b" -> "base", "c" -> "base",
      "z" -> "late"), s"got $out")
  }

  test("runSlicedMulti: misaligned empty slices across sources, nothing lost") {
    import spark.implicits._
    val h = 3600000000000L
    // source A: slices {0, 2} non-empty (middle time gap); source B: two
    // real slices + an appended EMPTY slice 2 — union of non-empty
    // indices = {0, 1, 2} (asserted inside the harness); file queues
    // stay index-aligned because empty files still stage
    val a = (Seq(("a0", 0L * h), ("a1", 20L * h), ("a2", 21L * h)))
      .toDF("k", "tsNs")
    val bEmpty = Seq.empty[(String, Long)].toDF("k", "tsNs")
    val b = Seq(("b0", 100L * h), ("b1", 104L * h)).toDF("k", "tsNs")
    val out = StreamGate.runSlicedMulti(spark, Seq(
      StreamGate.sliceByTime(a, "tsNs", 3),
      StreamGate.sliceByTime(b, "tsNs", 2).append(bEmpty)), "append") {
        case Seq(x, y) => x.unionByName(y)
        case other     => fail(s"expected 2 sources, got ${other.size}")
      }
    val got = out.collect().map(_.getString(0)).toSet
    assert(got == Set("a0", "a1", "a2", "b0", "b1"), s"got $got")
  }

  test("sliceByTime: empty input degrades to empty slices; non-Long ts column is rejected") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("k", "tsNs")
    val sl = StreamGate.sliceByTime(empty, "tsNs", 4)
    assert(sl.n == 4 && sl.tagged.count() == 0L)
    // staging an all-empty Slices still yields 4 aligned empty batch
    // files and zero data batches — the whole run is the no-data batch
    val out = StreamGate.runSliced(spark, sl, "append")(src => src)
    assert(out.count() == 0L)
    val wrongType = Seq(("a", 1.5)).toDF("k", "tsNs")
    val ex = intercept[IllegalArgumentException](
      StreamGate.sliceByTime(wrongType, "tsNs", 2))
    assert(ex.getMessage.contains("LongType"))
  }
}
