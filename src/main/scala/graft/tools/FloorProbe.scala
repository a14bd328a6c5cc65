package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the fixed per-action scheduler floor of this local[32] setup
  * (the r8-verdict ask): a warmed no-op count on a 1-row frame and a
  * warmed 32-partition shuffle count — the irreducible cost every catalog
  * action pays before any plan work. ~half the 194-query best-lane total
  * is this floor (1-3 actions per query), which is why per-query bench
  * deltas under ~0.2 s are noise, not plan signal (see PLANS.md r9).
  *
  * Usage: `sbt "runMain graft.tools.FloorProbe"`.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val one = spark.range(1).toDF("x")
    one.count() // warm the session
    for (kind <- Seq("noop-1row", s"shuffle-${cpus}p")) {
      val df = if (kind == "noop-1row") one
               else spark.range(100).toDF("x").groupBy("x").count()
      df.count() // warm this plan's codegen
      val times = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e6
      }
      println(f"[floor] $kind%-12s min=${times.min}%6.1f ms " +
        f"median=${times.sorted.apply(5)}%6.1f ms")
    }
    spark.stop()
  }
}
