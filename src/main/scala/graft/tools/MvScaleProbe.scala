package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MvRegistry

/** MV-rewrite scale probe: replicates lineitem `factor`× (shifted order
  * keys, same grouping-key space — the realistic shape: facts grow, the
  * group cardinality doesn't), builds the (returnflag, linestatus,
  * shipdate) summary once, and times the same rollup served from the base
  * scan vs through MvRewriteRule. The ratio IS the MV value proposition:
  * serving cost is summary-sized, so it stays flat as the fact table grows
  * — at 100 TB the base lane becomes a full-table scan per dashboard
  * refresh while the MV lane reads a few MB. Also prints the one-off
  * summary build cost (the amortized maintenance side; incremental
  * per-batch upkeep is MvStreamSpec's mergeSummaries loop).
  * Usage: `sbt "runMain graft.tools.MvScaleProbe [factor]"`.
  */
object MvScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_mv_scale").toString
    src.crossJoin(spark.range(factor).toDF("rep"))
      .select((col("l_orderkey") * factor + col("rep")).as("l_orderkey"),
        col("l_quantity"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/fact")
    val fact = spark.read.parquet(s"$out/fact")
    val n = fact.count()
    println(s"[mv-scale] replicated lineitem: $n rows at $out")

    val group = Seq("l_returnflag", "l_linestatus", "l_shipdate")
    val t0 = System.nanoTime()
    MvRegistry.buildSummary(fact, group, Seq("l_quantity"))
      .write.mode("overwrite").parquet(s"$out/summary")
    val summary = spark.read.parquet(s"$out/summary")
    println(f"[mv-scale] summary build: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"${summary.count()} groups (${n / math.max(1, summary.count())}x compression)")

    def time(name: String)(f: => Long): Double = {
      f // warmup
      val runs = Seq.fill(3) {
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      val best = runs.min
      println(f"[mv-scale] $name%-18s $best%8.3f s")
      best
    }

    def rollup() = fact.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("cnt"),
        max("l_quantity").as("mx")).count()

    MvRegistry.clear()
    val base = time("base scan")(rollup())
    val id = MvRegistry.register(fact, group, Seq("l_quantity"), summary)
    val served = time("MV-served")(rollup())
    MvRegistry.unregister(id)
    println(f"[mv-scale] speedup ${base / served}%.1fx at factor $factor")
    spark.stop()
  }
}
