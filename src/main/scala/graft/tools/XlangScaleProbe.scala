package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Candidate-growth probe for the rebuilt §2.42c blocked pair mining (the
  * r9 verdict's done-criterion: "a DocScaleProbe lane showing near-linear
  * candidate growth"). Replicates the sf0.1 embeddings by per-replica
  * coordinate ROTATION (the DocScaleProbe discipline: a permutation
  * preserves norms and within-replica inner products exactly, so true
  * pairs grow linearly while cross-replica cosines decorrelate) and, per
  * factor, measures:
  *
  *   - `cells` — `pairCells` sizing (∝ n at ~44 vectors/cell);
  *   - candidate pairs from [[Similarity.pairCandidates]] at the catalog's
  *     fixed 16-probe depth — the number that must grow LINEARLY
  *     (candidates/vector ≈ nProbe·targetBucket, constant across factors);
  *   - verified cross-lingual pairs at the catalog threshold (linear:
  *     replicas keep their internal pair structure);
  *   - wall time per stage.
  *
  * Usage: `sbt "runMain graft.tools.XlangScaleProbe [factors...]"`
  * (default factors 1 2 4 8; sf0.1 base = 2000 vectors).
  */
object XlangScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
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

    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val langs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("lang"))

    for (factor <- factors) {
      val e = base.crossJoin(spark.range(factor).toDF("rep"))
        .repartition(cpus.toInt)
        .select((col("vec_id") * factor + col("rep")).as("vec_id"),
          expr("transform(sequence(0, 63), i -> embedding[int((i + rep) % 64)])")
            .cast("array<float>").as("embedding"))
        .localCheckpoint()
      val lg = langs.crossJoin(spark.range(factor).toDF("rep"))
        .select((col("doc_id") * factor + col("rep")).as("vec_id"), col("lang"))
        .localCheckpoint()
      val n = e.count()
      val cells = Similarity.pairCells(n)
      val nProbe = math.min(16, cells)

      var t0 = System.nanoTime()
      val model = Similarity.ivfTrainDispatch(e, "embedding", cells)
      val trainS = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val nCand = Similarity.pairCandidates(e, "vec_id", "embedding",
        model, nProbe).count()
      val candS = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val pairs = Similarity.cosineDupPairsIvf(e, "vec_id", "embedding",
          0.3, 3, model, nProbe, corpusN = n)
      val nPairs = pairs
        .join(lg.toDF("id_a", "lang_a"), "id_a")
        .join(lg.toDF("id_b", "lang_b"), "id_b")
        .where(col("lang_a") =!= col("lang_b"))
        .count()
      val mineS = (System.nanoTime() - t0) / 1e9

      println(f"[xlangscale] factor=$factor%2d n=$n%7d cells=$cells%5d " +
        f"nprobe=$nProbe cand=$nCand%9d cand/vec=${nCand.toDouble / n}%7.1f " +
        f"xpairs=$nPairs%8d  train=$trainS%6.2fs cand=$candS%6.2fs mine=$mineS%6.2fs")
    }
    println("[xlangscale] linear regime: cand/vec must stay ~flat across factors " +
      "(nProbe x targetBucket), xpairs ~ factor x base")
    spark.stop()
  }
}
