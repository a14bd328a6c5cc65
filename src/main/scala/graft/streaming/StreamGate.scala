package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The driver-gating harness for streaming surfaces (the q_session_stream
  * shape, r12 — factored out once the pattern generalized): stage a batch
  * frame as ONE parquet file, re-read it with `readStream`, run the
  * caller-built streaming transform through the REAL micro-batch engine
  * into a memory sink under `Trigger.AvailableNow`, and hand back the
  * sink's final table frozen as a batch frame. The result is
  * row/schema/hash-checkable by the DuckDB oracle gate exactly like any
  * relational lane — the streaming engine itself (state store, watermark
  * bookkeeping, output-mode semantics) is inside the checked path.
  *
  * Determinism contract: ONE staged file ⇒ ONE data micro-batch, so
  *  - no row is ever late (rows are filtered against the PREVIOUS batch's
  *    watermark, which is the initial watermark for batch 1);
  *  - every keyed group sees ALL its rows in a single invocation, and the
  *    graft streaming operators sort each group on (tsNs, eventId) before
  *    folding, so arbitrary arrival/partition order inside the batch
  *    cannot reach an order-sensitive recurrence;
  *  - after the data batch the engine runs the no-data batch
  *    (`noDataMicroBatches` default), where watermark-gated operators
  *    (session_window, dropDuplicatesWithinWatermark eviction, event-time
  *    timeouts) finalize against the advanced watermark.
  * Production topologies stream MANY batches, where completeness is
  * governed by the watermark-delay vs arrival-skew trade (the
  * StreamJoinSpec late-data precedent) — single-file staging is the
  * determinism harness, not the production topology.
  *
  * The staging write + stream run repeat per call: build-cost visibility,
  * the PairIndex convention — the engine's cost stays in the bench number
  * instead of hiding in a cache.
  */
object StreamGate {

  private val seq = new AtomicInteger

  /** State-partition sizing rule: one state partition per ~100k staged
    * rows, floor 8, never above the session's configured parallelism.
    * See the sizing rationale at the runMulti call site.
    */
  private[graft] def partitionsFor(stagedRows: Long, sessionParts: Long): Long =
    math.min(sessionParts, math.max(8L, stagedRows / 100000L))

  /** Stage `staged` as one parquet file, then run `build(readStream(...))`
    * to a memory sink in `mode` ("append" | "update" | "complete") and
    * return the sink's rows frozen via localCheckpoint.
    */
  def run(s: SparkSession, staged: DataFrame, mode: String)
         (build: DataFrame => DataFrame): DataFrame =
    runMulti(s, Seq(staged), mode) { case Seq(src) => build(src) }

  /** foreachBatch form (ingest-maintenance loops, §2.86b): stage `staged`
    * as `nFiles` parquet files and stream them back ONE FILE PER
    * MICRO-BATCH (`maxFilesPerTrigger=1` under AvailableNow), invoking
    * `onBatch` per batch — the caller folds its own state (e.g. an MV
    * summary) across batches. File-to-batch assignment order is not
    * contractual; callers must fold with order-independent (semilattice /
    * commutative-monoid) state — which is exactly the property the §2.86b
    * maintenance loop exists to demonstrate.
    */
  def runForeach(s: SparkSession, staged: DataFrame, nFiles: Int)
                (onBatch: (DataFrame, Long) => Unit): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_gate")
    try {
      val inDir = s"$base/in"
      staged.repartition(nFiles).write.parquet(inDir)
      val src = s.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      // same data-scaled partition rule as runMulti (the caller's per-batch
      // aggregates pay one exchange per micro-batch)
      val stagedRows = s.read.parquet(inDir).count()
      val partsKey = "spark.sql.shuffle.partitions"
      val prevParts = s.conf.get(partsKey)
      s.conf.set(partsKey, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS",
        partitionsFor(stagedRows, prevParts.toLong).toString))
      try {
        val q = src.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch(onBatch)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      } finally s.conf.set(partsKey, prevParts)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base.toString))
  }

  /** Multi-source form (stream-stream joins): each input stages to its own
    * dir and arrives as its own single-batch `readStream` source.
    */
  def runMulti(s: SparkSession, staged: Seq[DataFrame], mode: String)
              (build: Seq[DataFrame] => DataFrame): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_gate")
    try {
      val srcs = staged.zipWithIndex.map { case (df, i) =>
        val inDir = s"$base/in$i"
        df.coalesce(1).write.parquet(inDir)
        s.readStream.schema(df.schema).parquet(inDir)
      }
      val qn = s"stream_gate_${seq.incrementAndGet()}"
      // State-partition sizing: every shuffle partition of every stateful
      // operator is a state-store INSTANCE paying per-batch setup + commit
      // + maintenance, and at gate-sized corpora that floor dominates the
      // run (same-JVM A/B at sf0.1: q_stream_join 7.98 s at 32 partitions
      // vs 2.96 s at 8; the whole 4-lane engine family 17.6 → 8.9 s). Size
      // with the data — one state partition per ~100k staged rows, floor 8
      // — so the 10M-row scale probes keep full parallelism while the
      // small-corpus gates stop paying 32 stores' fixed cost. The staged
      // row count is read from the just-written single parquet file
      // (footer metadata count — no data scan). Never raised above the
      // session's configured parallelism; SPARK_GRAFT_STREAM_PARTS
      // overrides for experiments. The micro-batch planner reads the
      // session conf asynchronously after start(), so the restore waits
      // for termination, not just for start() to return.
      val stagedRows = staged.indices.map { i =>
        s.read.parquet(s"$base/in$i").count()
      }.sum
      val partsKey = "spark.sql.shuffle.partitions"
      val prevParts = s.conf.get(partsKey)
      val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS",
        partitionsFor(stagedRows, prevParts.toLong).toString)
      s.conf.set(partsKey, parts)
      try {
        val q = build(srcs).writeStream.format("memory").queryName(qn)
          .outputMode(mode).option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      } finally s.conf.set(partsKey, prevParts)
      val out = s.table(qn).localCheckpoint()
      s.catalog.dropTempView(qn)
      out
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base.toString))
  }
}
