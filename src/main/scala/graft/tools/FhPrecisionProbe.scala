package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Feature-hash dedup HARVEST-QUALITY probe (r13, verdict item 1's
  * "done" evidence): precision/recall of q_feature_hash_dup's pair set
  * against the EXACT word-count-vector truth — every pair (a, b) with
  * cos²·10⁴ ≥ 9000 on the un-hashed word vectors, computed all-pairs.
  *
  * Truth is driver-side on purpose: at sf0.1 it is 5k docs × ~50-word
  * maps (~12.5 M pair dots, a few seconds in one JVM) — a measurement
  * harness, not a production path (the lane itself stays blocked +
  * distributed). After the r13 exact-verify rebuild, every emitted pair
  * satisfies the truth criterion by construction, so precision must be
  * 1.0 and the probe's job is to report RECALL (pairs the (b1, b2)
  * blocking misses) plus the candidate/accept volumes.
  *
  * Usage: `sbt "runMain graft.tools.FhPrecisionProbe [sfDir]"`.
  */
object FhPrecisionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vecs = docs.map { case (id, t) =>
      val m = t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w -> ws.length.toLong }
      (id, m, m.values.map(c => c * c).sum)
    }.sortBy(_._1)
    val truth = scala.collection.mutable.Set[(Long, Long)]()
    for (i <- vecs.indices; j <- i + 1 until vecs.length) {
      val (ia, ma, na) = vecs(i); val (ib, mb, nb) = vecs(j)
      val (small, big) = if (ma.size <= mb.size) (ma, mb) else (mb, ma)
      val dot = small.iterator.map { case (w, c) => c * big.getOrElse(w, 0L) }.sum
      if (na > 0 && nb > 0 && dot * dot * 10000L / (na * nb) >= 9000L)
        truth += ((ia, ib))
    }
    val got = graft.Queries.queries("q_feature_hash_dup")(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tp = got.count(truth.contains)
    println(s"docs=${vecs.length} truth_pairs=${truth.size} " +
      s"harvest_pairs=${got.size} true_positives=$tp " +
      f"precision=${if (got.isEmpty) 1.0 else tp.toDouble / got.size}%.3f " +
      f"recall=${if (truth.isEmpty) 1.0 else tp.toDouble / truth.size}%.3f")
    val missed = truth.toSeq.filterNot(got.contains).sorted.take(10)
    if (missed.nonEmpty) println(s"missed (blocking recall losses): $missed")
    spark.stop()
  }
}
