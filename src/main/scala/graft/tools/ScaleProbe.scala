package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicates the events table `factor`x (shifted keys and
  * times so cardinalities grow too), writes it to a temp parquet, and times
  * the core operators on it. Evidence for the 100 TB question: do the
  * shuffles/windows scale linearly in rows, and what is the per-core
  * throughput?  Usage: `sbt "runMain graft.tools.ScaleProbe [factor]"`.
  */
object ScaleProbe {
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

    val src = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val monthNs = 31L * 86400L * 1000000000L
    src.crossJoin(spark.range(factor).toDF("rep"))
      .select(
        (col("event_id") * factor + col("rep")).as("event_id"),
        (col("ts") + col("rep") % 4 * monthNs).as("ts"), // 4x time span
        (col("user_id") + col("rep") * 1500).as("user_id"), // factor x keys
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val n = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[scale] replicated events: $n rows at $out")

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-22s $sec%8.2f s   ${n / sec / 1e6}%6.1f M input rows/s   ($rows output rows)")
    }

    val q = graft.Queries.queries
    time("q_time_bucket") { q("q_time_bucket")(spark, out).count() }
    time("q_session_gap") { q("q_session_gap")(spark, out).count() }
    // r12: the driver-gated streaming sessionization lane — staging write
    // + micro-batch engine + watermarked session_window state at scale.
    // State is user-keyed and the watermark bounds its lifetime; the wall
    // here is the honest cost of pushing the full replicated event log
    // through the streaming engine in one AvailableNow run.
    time("q_session_stream") { q("q_session_stream")(spark, out).count() }
    // r12: the other heavy engine lanes. q_stream_join in one AvailableNow
    // batch buffers BOTH full sides in the join state stores (the watermark
    // only advances after the data batch) — the deliberate worst case for
    // state; production topologies stream many batches where the watermark
    // continuously evicts, keeping state O(rate x interval). q_ewma_stream
    // is the mapGroupsWithState control: state is 3 scalars/user.
    time("q_stream_join") { q("q_stream_join")(spark, out).count() }
    time("q_ewma_stream") { q("q_ewma_stream")(spark, out).count() }
    time("q_asof_join") { q("q_asof_join")(spark, out).count() }
    time("q_asof_table") { q("q_asof_table")(spark, out).count() }
    time("q_asof_native") { q("q_asof_native")(spark, out).count() }
    time("q_kinematics") { q("q_kinematics")(spark, out).count() }
    time("q_geo_polygon") { q("q_geo_polygon")(spark, out).count() }
    time("q_condense") { q("q_condense")(spark, out).count() }
    time("q_interval_overlap") { q("q_interval_overlap")(spark, out).count() }
    // r8-continuation lanes. Replication raises per-slot/per-cell DENSITY
    // (factor x users, only 4x time span), so proximity pairs and
    // co-occurrence pair OUTPUT grow ~quadratically in density — that's
    // corpus physics, not plan failure; the audit is that runtime tracks
    // the pair OUTPUT (density-local cell work / Σ|basket|²), not the
    // slot-global all-pairs a naive join would pay. trailing_24h is the
    // linear control: one RANGE-frame window pass, runtime ~ input rows.
    time("q_trailing_24h") { q("q_trailing_24h")(spark, out).count() }
    time("q_proximity_pairs") { q("q_proximity_pairs")(spark, out).count() }
    time("q_cooccur") { q("q_cooccur")(spark, out).count() }
    spark.stop()
  }
}
