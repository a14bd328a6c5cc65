package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the relational vs rowwise-native repetition rollup
  * (the ProfilePtjAb pattern: alternate forms in one session so JVM/GC
  * noise hits both, report per-rep medians).
  */
object ProfileRepetition {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val docs = graft.Tables.documents(spark, dir)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rel = scala.collection.mutable.ArrayBuffer.empty[Double]
    val row = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to reps) {
      rel += time(graft.operators.Text
        .repetitionSignals(docs, "doc_id", col("text"), 2).count())
      row += time(graft.operators.Text
        .repetitionSignalsRowwise(docs, "doc_id", col("text"), 2).count())
      println(f"[rep-ab] rep $r: relational ${rel.last}%6.2f s   rowwise ${row.last}%6.2f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[rep-ab] MEDIAN relational ${med(rel.toSeq)}%6.2f s   rowwise ${med(row.toSeq)}%6.2f s")
    spark.stop()
  }
}
