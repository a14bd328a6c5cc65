package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes a composed/iterative lane's wall time into Spark JOB COUNT ×
  * the measured per-action scheduler floor (FloorProbe's ~166 ms on this
  * box) — the r9-verdict item-9 accounting: a multi-round lane whose
  * per-round plans are linear can still cost seconds purely in action
  * floors, and that tail is adjudicated, not a plan defect. Prints jobs,
  * wall, and wall/jobs per query.
  *
  * Usage: `sbt "runMain graft.tools.JobCountProbe q_entity_clusters ..."`
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q_entity_clusters")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })

    for (name <- names) {
      spark.catalog.clearCache()
      graft.Queries.queries(name)(spark, sfDir).count() // warm (plan+JIT)
      jobs.set(0)
      val t0 = System.nanoTime()
      graft.Queries.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val j = jobs.get()
      println(f"[jobcount] $name%-24s wall=$wall%6.2f s  jobs=$j%4d  " +
        f"wall/job=${wall * 1000 / math.max(1, j)}%6.0f ms")
    }
    spark.stop()
  }
}
