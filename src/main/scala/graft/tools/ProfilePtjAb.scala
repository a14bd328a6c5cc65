package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Text

/** Same-JVM A/B of the PTJ length-class machinery on the sf0.1 corpus —
  * settles the r4 "q_doc_ngram_jaccard 3.26 → 4.24 s" question: is the
  * adaptive-class commit paying real overhead on the benign corpus, or was
  * the delta JVM noise?
  *
  * Facts this prints: (a) whether the corpus trips the gate (sf0.1: lmax 98
  * vs median 51 → single-group, classes DON'T engage); (b) interleaved
  * repeat timings of auto (= gate, single-group here), forced-single and
  * forced-classes in ONE JVM, so run-to-run variance and the class overhead
  * are separated. Alternating order de-confounds JIT/GC drift.
  *
  * Usage: `sbt "runMain graft.tools.ProfilePtjAb [reps]"` (default 4).
  */
object ProfilePtjAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
    def run(classes: Option[Boolean]): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Text.jaccardPairs(docs, "doc_id", Text.shingles(col("text"), 2),
        0.8, classes = classes).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val variants = Seq("auto" -> None, "single" -> Some(false), "classes" -> Some(true))
    // warmup one full pass of each variant (plan + codegen + JIT)
    variants.foreach { case (_, c) => run(c) }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (name, c) <- variants) {
      val (sec, rows) = run(c)
      times(name) :+= sec
      println(f"[ptj-ab] rep $r $name%-8s $sec%7.3f s  ($rows pairs)")
    }
    for ((name, _) <- variants) {
      val ts = times(name)
      println(f"[ptj-ab] $name%-8s min=${ts.min}%6.3f med=${ts.sorted.apply(ts.size / 2)}%6.3f max=${ts.max}%6.3f")
    }
    val ratio = times("classes").min / times("single").min
    println(f"[ptj-ab] forced-class / forced-single (min-over-reps) = $ratio%.3f")
    spark.stop()
  }
}
