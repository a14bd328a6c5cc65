package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timer for perf iteration: warm once, then best-of-N, same
  * session config as Bench. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Time q_doc_ngram_jaccard ..."`
  */
object Time {
  def main(args: Array[String]): Unit = {
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
    val names = if (args.nonEmpty) args.toSeq else graft.Queries.all.map(_.name)
    for (name <- names) {
      spark.catalog.clearCache()
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.Queries.queries(name)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (warm, rows) = once()
      val best = math.min(once()._1, once()._1)
      println(f"TIME $name%-24s warm=$warm%7.3f best=$best%7.3f rows=$rows")
    }
    spark.stop()
  }
}
