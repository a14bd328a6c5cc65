package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-skew probe: the one sketch-tier scale scenario the rotation/
  * rep-disjoint probes can't produce — a corpus where a large fraction is
  * ONE exact-duplicate class. Every copy computes the same minhash
  * signature, so every copy lands in the same LSH bucket in every band
  * (same story for simhash), and the in-bucket self-join is quadratic in
  * the class size: candidates ~ (0.2n)² while the corpus grows as n.
  * No bucketing scheme fixes this — identical inputs are *supposed* to
  * collide — so the scale-safe pipeline ORDER is the fix: collapse exact
  * duplicates first (one hash-groupBy shuffle, the §2.38 tier), then run
  * the sketch tier over class REPRESENTATIVES only. This is why
  * q_dedup_pipeline runs its tiers exact → near-dup, and the probe
  * demonstrates it's load-bearing, not stylistic.
  *
  * Two lanes per factor over the sf0.1 corpus replicated rep-disjoint
  * (DocScaleProbe's construction) with 20% of docs rewritten to one
  * constant text:
  *  - direct:    q_doc_minhash_lsh straight over the skewed corpus —
  *               time/pairs grow ~quadratically with factor
  *  - collapsed: exact-collapse (min doc_id per text) INCLUDED in the
  *               lane time, then q_doc_minhash_lsh over representatives —
  *               stays ~linear
  *
  * Usage: `sbt "runMain graft.tools.DupSkewProbe [factor...]"`
  * (default factors 2 4 8 — the doubling ratio exposes the exponent).
  */
object DupSkewProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2, 4, 8)
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

    val dupText = (0 until 40).map(i => s"dupclass$i").mkString(" ")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val q = graft.Queries.queries("q_doc_minhash_lsh")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (factor <- factors) {
      val out = java.nio.file.Files.createTempDirectory("graft_dupskew").toString
      // rep-disjoint replication, then 20% of doc ids collapse onto the
      // constant text — the dup class spans replicas (no rep suffix on it)
      docs.crossJoin(spark.range(factor).toDF("rep"))
        .repartition(cpus.toInt * 2)
        .select(
          (col("doc_id") * factor + col("rep")).as("doc_id"),
          when((col("doc_id") * factor + col("rep")) % 5 === 0, lit(dupText))
            .otherwise(array_join(transform(split(col("text"), " "),
              w => concat(w, lit("_"), col("rep"))), " ")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val n = spark.read.parquet(s"$out/documents.parquet").count()

      val (directPairs, directS) = timed { q(spark, out).count() }

      // collapsed lane: the exact tier's hash-groupBy (kept text-exact here
      // so the sketch tier's input is a strict representative set) is PART
      // of the measured cost — the claim is pipeline order, not free lunch
      val repDir = s"$out/reps"
      val ((classes, reps), collapseS) = timed {
        val r = spark.read.parquet(s"$out/documents.parquet")
          .groupBy("text")
          .agg(min(col("doc_id")).as("doc_id"),
            first(col("lang")).as("lang"), first(col("source")).as("source"),
            first(col("n_chars")).as("n_chars"))
          .select("doc_id", "text", "lang", "source", "n_chars")
        r.write.mode("overwrite").parquet(s"$repDir/documents.parquet")
        val reps = spark.read.parquet(s"$repDir/documents.parquet").count()
        (n - reps, reps)
      }
      val (collapsedPairs, sketchS) = timed { q(spark, repDir).count() }

      println(f"[dupskew] factor=$factor%-3d n=$n%7d dupclass=${n / 5}%7d | " +
        f"direct ${directS}%7.2f s (${directPairs}%9d pairs) | " +
        f"collapsed ${collapseS + sketchS}%7.2f s = collapse ${collapseS}%5.2f + sketch ${sketchS}%5.2f " +
        f"(${collapsedPairs}%6d rep pairs, $classes dups collapsed)")

      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
    spark.stop()
  }
}
