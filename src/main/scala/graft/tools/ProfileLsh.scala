package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Stage-level timing of the embedding-LSH near-dup pipeline (scratch). */
object ProfileLsh {
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
    val e = graft.Tables.embeddings(spark, sfDir)
    val n = e.count()
    val planes = Similarity.autoPlanes(n, targetBucket = 32)
    println(s"n=$n planes=$planes")
    t("scan only")(e.count())
    // isolate expression costs — DISTINCT plane per dot (else CSE collapses)
    def planeLit(p: Int) = array((0 until 64).map(i =>
      lit(Similarity.lshPlaneConsts(p / 6, p % 6, 64)(i).toFloat)): _*)
    t("72 dots, array(lit..)")(e.select((0 until 72).map(i =>
      Similarity.dot(col("embedding"), planeLit(i)).as(s"d$i")): _*).count())
    def planeTyped(p: Int) = typedlit(
      Similarity.lshPlaneConsts(p / 6, p % 6, 64).map(_.toFloat).toSeq)
    t("72 dots, typedlit")(e.select((0 until 72).map(i =>
      Similarity.dot(col("embedding"), planeTyped(i)).as(s"d$i")): _*).count())
    t("72 signs ORed into 12 buckets")(e.select((0 until 12).map(tb =>
      (0 until planes).map(p =>
        when(Similarity.dot(col("embedding"), planeLit(tb * 6 + p)) >= 0,
          lit(1L << p)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as(s"b$tb")): _*).count())
    val buckets = Similarity.multiTableBuckets(
        e.select(col("vec_id").as("_id"), col("embedding").as("_v")),
        "_v", planes, 12, 64)
      .select(col("_id"), col("bucket"))
    t("sketch (buckets)")(buckets.count())
    // two-step: bucket columns in a codegen'd project, THEN explode refs
    val cols = e.select(col("vec_id") +: (0 until 12).map(tb =>
      ((0 until planes).map(p =>
        when(Similarity.dot(col("embedding"), planeLit(tb * 6 + p)) >= 0,
          lit(1L << p)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)) + lit(tb.toLong << 32)).as(s"b$tb")): _*)
    val buckets2 = cols.select(col("vec_id"),
      explode(array((0 until 12).map(tb => col(s"b$tb")): _*)).as("bucket"))
    t("sketch two-step")(buckets2.count())
    val collisions = buckets.toDF("id_a", "bucket")
      .join(buckets.toDF("id_b", "bucket"), Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    t("collision join")(collisions.count())
    val withNorm = e.select(col("vec_id"), col("embedding"))
      .withColumn("_norm", Similarity.l2norm(col("embedding")))
    val vecA = withNorm.toDF("id_a", "vec_a", "norm_a")
    val vecB = withNorm.toDF("id_b", "vec_b", "norm_b")
    val verified = collisions
      .join(broadcast(vecA), Seq("id_a"))
      .join(broadcast(vecB), Seq("id_b"))
      .withColumn("cos",
        round(Similarity.dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")), 3))
      .where(col("cos") >= 0.4)
    t("verify (attach+cos+filter)")(verified.count())
    t("full (dedup)")(verified.dropDuplicates("id_a", "id_b").count())
    t("op end-to-end")(Similarity.cosineDupPairsLsh(
      e, "vec_id", "embedding", 0.4, 3, planes, 12, 64, corpusN = n).count())
    spark.stop()
  }
}
