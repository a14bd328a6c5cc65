package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** High-dim ADC probe: per-row expression ADC costs m·dsub = dim
  * multiplies, the table path costs m lookups after an amortized
  * per-(query, cell) table build — the ratio is dim/m, invisible at
  * dim 64 (graft's test embeddings) and decisive at production dims.
  * This probe synthesizes a dim-1024 corpus (16 rotated tiles of the
  * sf0.1 embeddings — rotation keeps each tile's scale, tiling keeps
  * the distribution non-degenerate), replicates it `factor`x, builds
  * ONE shared compressed index, and times the two search paths on the
  * same query batch.
  *
  * Usage: `sbt "runMain graft.tools.PqDimProbe [factor] [nQueries]"`
  * (default 50x -> 100k vectors, 100 queries).
  */
object PqDimProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 50
    val nQ = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 1024; val m = 8; val ks = 256
    val out = java.nio.file.Files.createTempDirectory("graft_pqdim").toString
    graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).toDF("rep"))
      .repartition(cpus.toInt * 2)
      .select((col("vec_id") * factor + col("rep")).as("vec_id"),
        expr("""transform(sequence(0, 1023), i ->
                  embedding[int((i + (i DIV 64) * 7 + rep) % 64)])""")
          .cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val n = e.count()
    println(s"[pqdim] corpus: $n vectors, dim $dim, m=$m ks=$ks " +
      s"(per-row ADC: expr ${dim} mults vs table $m lookups)")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqdim] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val model = timed("ivfTrainDriver (64 cells)") {
      Similarity.ivfTrainDriver(e, "embedding", 64)
    }
    val codebooks = timed("pqTrain") {
      Similarity.pqTrain(e, "embedding", model, m, ks, corpusN = n)
    }
    val encoded = timed("pqEncode (materialize once)") {
      Similarity.pqEncode(
          Similarity.ivfAssign(
            e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
            "n_vec", model),
          "n_vec", "cell", model, codebooks, m, ks)
        .select("n_id", "cell", "codes").localCheckpoint()
    }
    val q = e.where(col("vec_id") < nQ)
    // warm both paths once (codegen/JIT), then time
    for (pass <- Seq("warm", "timed")) {
      val exprN = timed(s"expr-ADC search ($pass)") {
        Similarity.knnIvfPqSearch(encoded, e, q, "vec_id", "embedding",
          5, 16, m, ks, 6, model, codebooks).count()
      }
      val tabN = timed(s"table-ADC search ($pass)") {
        Similarity.knnIvfPqSearchTabulated(encoded, e, q, "vec_id",
          "embedding", 5, 16, m, ks, 6, model, codebooks).count()
      }
      if (pass == "timed")
        println(s"[pqdim] result rows: expr=$exprN table=$tabN")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
