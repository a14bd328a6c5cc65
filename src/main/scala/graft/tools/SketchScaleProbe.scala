package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Sketch, Text}

/** Sketch scale probe: replicates events `factor`x with GROWING distinct
  * user cardinality (shifted user ids per replica), then compares the
  * exchange economics of exact `countDistinct` vs the native KMV
  * aggregate at the same grouping. The 100 TB claim under test: exact
  * distinct shuffles EVERY distinct key (payload grows with nd), while
  * the KMV exchange is O(groups·k) — flat as the corpus and its
  * cardinality grow. Also reports estimate accuracy at each scale, and
  * the rollup lane (week estimates from merged day sketches vs from raw
  * events). Usage: `sbt "runMain graft.tools.SketchScaleProbe [factor]"`.
  */
object SketchScaleProbe {
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
    val out = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    src.crossJoin(spark.range(factor).toDF("rep"))
      .select(
        (col("event_id") * factor + col("rep")).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * 1500).as("user_id"), // nd grows with factor
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")
    val n = ev.count()
    println(s"[sketch] replicated events: $n rows, factor $factor")

    val dayNs = 86400000000000L
    val k = 64
    val h = Text.polyHash(concat(col("user_id").cast("string"), lit("#kmv")))
    val base = ev.select(expr(s"ts div $dayNs").as("day"), h.as("_h"), col("user_id"))

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sketch] $name%-24s $sec%8.2f s   ($rows rows)")
    }

    time("exact countDistinct") {
      base.groupBy("day").agg(countDistinct(col("user_id")).as("nd")).count()
    }
    time("native KMV k=64") {
      base.groupBy("day").agg(Sketch.kmvAgg(col("_h"), k).as("sk")).count()
    }

    // accuracy at this scale
    val acc = base.groupBy("day")
      .agg(Sketch.kmvAgg(col("_h"), k).as("sk"),
        countDistinct(col("user_id")).as("exact"))
      .select(Sketch.kmvEstimate("sk", k, Text.PolyP).as("est"), col("exact"))
      .agg(avg(abs(col("est") - col("exact")) / col("exact")).as("mre"),
        max(abs(col("est") - col("exact")) / col("exact")).as("maxre"))
      .head()
    println(f"[sketch] KMV k=$k mean rel err ${acc.getDouble(0)}%.4f  max ${acc.getDouble(1)}%.4f")

    // rollup reuse: week estimates from persisted day sketches vs raw rescan
    val days = base.groupBy("day").agg(Sketch.kmvAgg(col("_h"), k).as("sk"))
    days.write.mode("overwrite").parquet(s"$out/day_sk.parquet")
    val daysP = spark.read.parquet(s"$out/day_sk.parquet")
    time("week rollup from sketches") {
      daysP.select(expr("day div 7").as("week"), explode(col("sk")).as("_h"))
        .groupBy("week").agg(Sketch.kmvAgg(col("_h"), k).as("sk")).count()
    }
    time("week exact from raw") {
      base.select(expr("day div 7").as("week"), col("user_id"))
        .groupBy("week").agg(countDistinct(col("user_id")).as("nd")).count()
    }

    // HLL lane: the fixed-grid member — m=64 register rows per group
    // after map-side combine, whatever the cardinality; estimate quality
    // alongside (no linear-counting branch, so small groups read low by
    // design — at probe scale every register saturates).
    time("HLL registers m=64") {
      Sketch.hllRegisters(base.select(col("day"), col("_h").as("_h0")),
        col("day"), col("_h0"), 6, 26).count()
    }
    val hllAcc = Sketch.hllEstimate(
        Sketch.hllRegisters(base.select(col("day"), col("_h").as("_h0")),
          col("day"), col("_h0"), 6, 26), 6, 26, Sketch.hllNumScaled(6, 26))
      .withColumnRenamed("_g", "day")
      .join(base.groupBy("day").agg(countDistinct(col("user_id")).as("exact")), "day")
      .agg(avg(abs(col("est_nd") - col("exact")) / col("exact")).as("mre"),
        max(abs(col("est_nd") - col("exact")) / col("exact")).as("maxre"))
      .head()
    println(f"[sketch] HLL m=64 mean rel err ${hllAcc.getDouble(0)}%.4f  max ${hllAcc.getDouble(1)}%.4f")

    // bottom-k quantile sketch lane: same exchange claim for the RANK
    // member — the window form sorts every row of a group through one
    // reducer per group; the bottom-k aggregate's partials carry ≤ k
    // pairs/group. Accuracy = rank-selected p90 vs the exact p90.
    val hq = Text.polyHash(concat(col("event_id").cast("string"), lit("#qsk")))
    val qbase = ev.select(expr(s"ts div $dayNs").as("day"), hq.as("_h"),
      col("value"), col("event_id"))
    time("exact p90 (window sort)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("day").orderBy(col("value").asc, col("event_id").asc)
      qbase.withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("day")))
        .groupBy("day")
        .agg(max(when(col("rn") === expr("(nn - 1) * 9 div 10 + 1"),
          col("value"))).as("p90")).count()
    }
    time("bottom-k sketch k=128") {
      qbase.groupBy("day")
        .agg(Sketch.quantileSketch(col("_h"), col("value"), 128).as("sk"))
        .select(Sketch.sketchQuantile("sk", 9, 10).as("p90")).count()
    }
    val qacc = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("day").orderBy(col("value").asc, col("event_id").asc)
      val exact = qbase.withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("day")))
        .groupBy("day")
        .agg(max(when(col("rn") === expr("(nn - 1) * 9 div 10 + 1"),
          col("value"))).as("exact_p90"))
      qbase.groupBy("day")
        .agg(Sketch.quantileSketch(col("_h"), col("value"), 128).as("sk"))
        .select(col("day"), Sketch.sketchQuantile("sk", 9, 10).as("p90"))
        .join(exact, "day")
        .agg(avg(abs(col("p90") - col("exact_p90"))
          / greatest(abs(col("exact_p90")), lit(1e-9))).as("mre"))
        .head().getDouble(0)
    }
    println(f"[sketch] bottom-k k=128 p90 mean rel err $qacc%.4f")
    spark.stop()
  }
}
