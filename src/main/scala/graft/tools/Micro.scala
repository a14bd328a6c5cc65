package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Text

/** Scratch microbenchmarks for expression-level costs (not in the catalog). */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"MICRO $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s  n=$n")
    }
    val d = graft.Tables.documentsSpread(spark, sfDir)
    t("scan only")(d.count())
    t("split words")(d.select(explode(split(col("text"), " "))).count())
    t("shingles n=2")(d.select(explode(Text.shingles(col("text"), 2))).count())
    val noDistinct = {
      val words = split(col("text"), " ")
      transform(sequence(lit(0), size(words) - 2),
        i => array_join(slice(words, i + 1, lit(2)), " "))
    }
    t("shingles noDistinct")(d.select(explode(noDistinct)).count())
    t("polyHash words")(d.select(explode(transform(split(col("text"), " "), w => Text.polyHash(w)))).count())
    val sh = d.select(col("doc_id").as("doc"), explode(Text.shingles(col("text"), 2)).as("sh"))
    t("sh groupBy count")(sh.groupBy("sh").count().count())
    t("sh sort+mid")(sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .sort(col("df"), col("sh")).withColumn("rank", monotonically_increasing_id()).count())
    spark.stop()
  }
}
