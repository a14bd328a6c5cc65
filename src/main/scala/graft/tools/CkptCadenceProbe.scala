package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B of the round-checkpoint cadence on the iterative graph
  * family (r13, the r12 brief item 3 — `Graph.RoundCkptConf`): runs each
  * lane at cadence 1 / 2 / 1 / 2 (interleaved ABAB so JVM drift shows up
  * as A≠A, the same-JVM discipline) measuring wall + job count per run.
  * Lanes read the cadence from session conf, so this drives the exact
  * catalog plans the bench times. Results are recorded in PLANS.md;
  * default stays whatever the numbers say.
  *
  * Usage: `sbt "runMain graft.tools.CkptCadenceProbe [query...]"`
  * (default: the four family representatives).
  */
object CkptCadenceProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_textrank", "q_query_expand", "q_lpa_communities", "q_kcore")
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
      // result-stability guard: cadence must not change the output
      val base = graft.Queries.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.mkString("|").hashCode
      for (cad <- Seq(1, 2, 1, 2)) {
        spark.conf.set(graft.operators.Graph.RoundCkptConf, cad.toString)
        jobs.set(0)
        val t0 = System.nanoTime()
        val rows = graft.Queries.queries(name)(spark, sfDir)
          .collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val h = rows.map(_.toString).sorted.mkString("|").hashCode
        require(h == base, s"$name: cadence $cad CHANGED THE RESULT")
        println(f"[cadence] $name%-20s ckptEvery=$cad  wall=$wall%6.2f s  " +
          f"jobs=${jobs.get()}%4d")
      }
      spark.conf.set(graft.operators.Graph.RoundCkptConf, "1")
    }
    spark.stop()
  }
}
