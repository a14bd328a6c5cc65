package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Text

/** Stage-level timing of the composed dedup pipeline (scratch). */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"MICRO $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s  n=$n")
    }
    val d = graft.Tables.documents(spark, sfDir)
    t("scan only")(d.count())
    val exactDrop = Text.exactDupGroups(d, "doc_id",
        concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
      .select(explode(col("members")).as("doc_id"), col("keeper"))
      .where(col("doc_id") =!= col("keeper"))
      .select("doc_id")
    t("exactDrop")(exactDrop.count())
    val nearDrop = Text.jaccardPairs(d, "doc_id", Text.shingles(col("text"), 2), 0.8)
      .select(col("doc_b").as("doc_id"))
    t("nearDrop (jaccardPairs)")(nearDrop.count())
    t("union+distinct+antijoin+agg") {
      d.join(exactDrop.union(nearDrop).distinct(), Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept")).count()
    }
    t("pipeline op end-to-end")(graft.Queries.queries("q_dedup_pipeline")(spark, sfDir).count())
    spark.stop()
  }
}
