package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the one-pass staging swap (r15, the r14 verdict's
  * item 5): the ordered streaming gates' staging wrote ONE filtered scan
  * of the frozen frame PER SLICE (N write jobs for N batches);
  * `StreamGate.runSliced` writes every slice in a single
  * `partitionBy(slice)` job. This probe alternates the two staging paths
  * over the SAME lane shapes in ONE JVM (the same-JVM comparison rule —
  * bench numbers across JVMs spread ±50%), 3 rounds each, interleaved
  * A/B/A/B so neither path owns the warm-up.
  *
  * Families (args(0), default "ewma"):
  *  - `ewma`  — the q_ewma_stream shape (sliceByTime, update mode);
  *  - `join`  — the q_stream_join shape (two sources, runSlicedMulti vs
  *              runOrderedMulti) — the bench's top ENGINE lane.
  * args(1) = sf dir (default /root/testdata/sf0.1).
  */
object StageAbProbe {
  def main(args: Array[String]): Unit = {
    val family = if (args.nonEmpty) args(0) else "ewma"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stageab] $name%-18s $sec%8.2f s   ($rows output rows)")
      sec
    }

    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    def rec(k: String, s: Double): Unit = walls(k) = s :: walls.getOrElse(k, Nil)

    if (family == "ewma") {
      val staged = graft.Tables.events(spark, dir).select(
        col("user_id").as("userId"), col("ts").as("tsNs"),
        col("event_id").as("eventId"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .localCheckpoint()
      def op(src: DataFrame): DataFrame =
        graft.streaming.EwmaStream.ewma(
          src.as[graft.streaming.EwmaStream.Ev]).toDF("user_id", "n", "ewma")
      for (r <- 1 to 3; b <- Seq(4, 8)) {
        rec(s"parts b=$b", time(s"parts  b=$b r$r") {
          graft.streaming.StreamGate.runOrdered(spark,
            graft.streaming.StreamGate.splitByTime(staged, "tsNs", b),
            "update")(op).count()
        })
        rec(s"sliced b=$b", time(s"sliced b=$b r$r") {
          graft.streaming.StreamGate.runSliced(spark,
            graft.streaming.StreamGate.sliceByTime(staged, "tsNs", b),
            "update")(op).count()
        })
      }
    }

    if (family == "join") {
      val ev = graft.Tables.events(spark, dir).localCheckpoint()
      def side(typ: String, p: String): DataFrame = ev
        .where(col("event_type") === typ)
        .select(col("user_id").as(s"${p}u"), col("event_id").as(s"${p}id"),
          expr("ts div 1000").as(s"${p}us"))
      def op(srcs: Seq[DataFrame]): DataFrame = srcs match {
        case Seq(v, c) =>
          val vS = v.withColumn("vts", timestamp_micros(col("vus")))
            .withWatermark("vts", "1 hour")
          val cS = c.withColumn("cts", timestamp_micros(col("cus")))
            .withWatermark("cts", "1 hour")
          vS.join(cS,
            col("vu") === col("cu") && col("cts") >= col("vts") &&
              col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
            .select(col("vu"), col("vid"), col("cid"))
        case other => sys.error(s"expected 2 sources, got ${other.size}")
      }
      val pair = Seq(side("view", "v") -> "vus", side("click", "c") -> "cus")
      for (r <- 1 to 3) {
        rec("parts join", time(s"parts  join r$r") {
          graft.streaming.StreamGate.runOrderedMulti(spark,
            pair.map { case (df, c) =>
              graft.streaming.StreamGate.splitByTime(df, c, 4) }, "append")(op)
            .count()
        })
        rec("sliced join", time(s"sliced join r$r") {
          graft.streaming.StreamGate.runSlicedMulti(spark,
            pair.map { case (df, c) =>
              graft.streaming.StreamGate.sliceByTime(df, c, 4) }, "append")(op)
            .count()
        })
      }
    }

    walls.toSeq.sortBy(_._1).foreach { case (k, ws) =>
      println(f"[stageab] $k%-12s min=${ws.min}%6.2f s  med=${ws.sorted.apply(ws.size / 2)}%6.2f s")
    }
    spark.stop()
  }
}
