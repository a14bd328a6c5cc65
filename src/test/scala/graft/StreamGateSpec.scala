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
    var batches = 0
    var rows = 0L
    StreamGate.runForeach(spark, staged, nFiles = 3) { (b, _) =>
      batches += 1
      rows += b.count()
    }
    assert(batches == 3, s"expected 3 file-batches, got $batches")
    assert(rows == 120L)
  }
}
