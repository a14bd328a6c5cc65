package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps formatted physical plans for the catalog so scan
  * pruning (PushedFilters/ReadSchema), join strategies (broadcast vs
  * shuffle), and WholeStageCodegen coverage can be reviewed. Run:
  * `sbt "runMain graft.tools.Explain q_agg_pricing q_join_broadcast ..."`
  * (no args = all queries).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else graft.Queries.all.map(_.name)
    for (n <- names) {
      println(s"\n================ $n ================")
      try {
        val df = graft.Queries.queries(n)(spark, dir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
