package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming state-floor curve (r14, the r13 verdict's item 6): the r13
  * 10× probe showed multi-batch gate wall ≈ per-batch engine floor ×
  * batch count at 4 batches; this probe records the CURVE — the same
  * replicated corpus pushed through `StreamGate.runOrdered` at 1/4/8/16
  * micro-batches — so "the floor is per-batch, not per-row" is a
  * measured table instead of an inference from one point.
  *
  * Two state-store families, chosen to bracket the per-batch cost:
  *  - `ewma` — mapGroupsWithState, state = 3 scalars/user, update mode
  *    (the cheapest keyed-state shape);
  *  - `dedup` — dropDuplicatesWithinWatermark on a wide key with an
  *    event-time watermark (watermark bookkeeping + eviction scan per
  *    batch on top of the keyed store).
  * Per batch the engine pays: source file listing + one task wave per
  * state partition (store load/commit/maintenance) + the no-data batch
  * at the end. The corpus is FIXED across rows of the table, so the
  * wall delta between batch counts is pure per-batch floor.
  *
  * Usage: `sbt "runMain graft.tools.StreamFloorProbe [factor]"` (default
  * 100 ⇒ ~10M rows from the sf0.1 events table).
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val src = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_sfloor").toString
    val monthNs = 31L * 86400L * 1000000000L
    src.crossJoin(spark.range(factor).toDF("rep"))
      .select(
        (col("event_id") * factor + col("rep")).as("event_id"),
        (col("ts") + col("rep") % 4 * monthNs).as("ts"),
        (col("user_id") + col("rep") * 1500).as("user_id"),
        col("value"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")
    val n = ev.count()
    println(s"[sfloor] replicated events: $n rows at $out")

    val staged = ev.select(col("user_id").as("userId"), col("ts").as("tsNs"),
      col("event_id").as("eventId"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sfloor] $name%-16s $sec%8.2f s   ${n / sec / 1e6}%6.2f M rows/s   ($rows output rows)")
    }

    // one FAMILY per invocation (args(1) = "ewma" | "dedup"): the r14
    // first cut interleaved them and the 170 s 10M-entry dedup commit's
    // GC pressure contaminated the following ewma row (52.9 s vs 43-47 s
    // for its neighbors) — the same-JVM contamination rule, inside one
    // probe
    val family = if (args.length > 1) args(1) else "ewma"
    for (b <- Seq(1, 4, 8, 16)) {
      // event-time-contiguous slices: cross-batch in-order arrival, the
      // ordered lanes' staging discipline
      val parts = graft.streaming.StreamGate.splitByTime(staged, "tsNs", b)
      if (family == "ewma") time(s"ewma b=$b") {
        graft.streaming.StreamGate.runOrdered(spark, parts, "update") { s =>
          graft.streaming.EwmaStream.ewma(
              s.as[graft.streaming.EwmaStream.Ev])
            .toDF("user_id", "n", "ewma")
        }.count()
      }
      if (family == "dedup") time(s"dedup b=$b") {
        // real-epoch event times: the span-covering delay keeps the
        // watermark below every event time (nothing evicts, nothing
        // late) while still advancing visibly batch-over-batch — the
        // default advancement assert holds
        graft.streaming.StreamGate.runOrdered(spark, parts, "append") { s =>
          s.withColumn("event_time", timestamp_micros(expr("tsNs div 1000")))
            .withWatermark("event_time", "200 days")
            .dropDuplicatesWithinWatermark("userId", "eventId")
            .select(col("userId"), col("eventId"))
        }.count()
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
