package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for q_containment's `kept` derivation (r16,
  * the r15 verdict's item 7): the two pair sides `a`/`b` both derive
  * from `kept = reps ⋈ dfCut` — unfrozen, each side re-runs the df
  * rollup + semi-join over the frozen `reps` blocks. The r15 A/B called
  * freezing it a wash-to-worse; the driver then showed the lane as a
  * 0.63x "regression" with no code change. Re-measure on a calibrated
  * box: `live` (unfrozen kept) vs `frozen` (lazy localCheckpoint on
  * kept).
  */
object ContainAbProbe {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Text

    def variant(freezeKept: Boolean): DataFrame = {
      val reps = graft.Tables.documentsSpread(spark, dir)
        .groupBy(col("text")).agg(min("doc_id").as("id"))
        .withColumn("sh", array_distinct(
          transform(Text.shingles(col("text"), 3), Text.polyHash(_))))
        .where(size(col("sh")) > 0)
        .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
          explode(col("sh")).as("h"))
        .localCheckpoint()
      val dfCut = reps.groupBy("h").agg(count(lit(1)).as("df"))
        .where(col("df") <= 64).select("h")
      val kept0 = reps.join(dfCut, "h")
      val kept = if (freezeKept) kept0.localCheckpoint(false) else kept0
      val a = kept.select(col("h"), col("id").as("doc_a"), col("n_sh").as("na"))
      val b = kept.select(col("h"), col("id").as("doc_b"), col("n_sh").as("nb"))
      a.join(b, Seq("h"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("n_shared"))
        .withColumn("cont_pm",
          floor(col("n_shared") * 1000 / least(col("na"), col("nb"))).cast("long"))
        .where(col("cont_pm") >= 700)
        .select("doc_a", "doc_b", "n_shared", "cont_pm")
    }

    // warm both shapes
    variant(false).count(); variant(true).count()
    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to 3; fz <- Seq(false, true)) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = variant(fz).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val k = if (fz) "frozen" else "live"
      println(f"[containab] r$r $k%-7s $sec%7.3f s  rows=$n")
      walls(k) = sec :: walls.getOrElse(k, Nil)
    }
    println("[containab] ==== summary (min/med over 3) ====")
    walls.toSeq.sortBy(_._1).foreach { case (k, ws) =>
      println(f"[containab] $k%-7s min=${ws.min}%7.3f  med=${ws.sorted.apply(ws.size / 2)}%7.3f")
    }
    spark.stop()
  }
}
