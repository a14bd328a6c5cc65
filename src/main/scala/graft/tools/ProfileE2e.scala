package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the e2e pipeline queries (scratch). */
object ProfileE2e {
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
    import graft.operators.{Pii, Sampling, Text}
    val d = graft.Tables.documents(spark, sfDir)
    t("scan only")(d.count())
    // exact replica of QueriesText.piiDocs
    val id = col("doc_id")
    def n(c: org.apache.spark.sql.Column) = c.cast("string")
    val ptext = concat(
      col("text"),
      when(id % 7 === 0, concat(lit(" contact u"), n(id), lit("@ex"),
        n(id % 10), lit(".example.com"))).otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" call "), n(id % 900 + 100), lit("-"),
        n((id * 3) % 900 + 100), lit("-"), n((id * 7) % 9000 + 1000)))
        .otherwise(lit("")),
      when(id % 13 === 0, concat(lit(" from 10."), n(id % 256), lit("."),
        n((id * 3) % 256), lit("."), n((id * 5) % 256))).otherwise(lit("")),
      when(id % 17 === 0, concat(lit(" id "), n(id % 900 + 100), lit("-"),
        n(id % 90 + 10), lit("-"), n((id * 11) % 9000 + 1000)))
        .otherwise(lit("")))
    val pii = d.withColumn("ptext", ptext)
    def stages(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame) = {
      val scrubbed = Pii.redact(pii, col("ptext"))
        .select(col("doc_id"), col("source"), col("redacted"))
        .localCheckpoint()
      val q = Text.qualityMetrics(scrubbed, col("redacted"), Seq("the", "a"))
      val gated = q.withColumn("_sw", round(col("stopword_ratio"), 4))
        .withColumn("_s", Text.repetitionStats(col("redacted"), 2))
        .withColumn("f_short", (col("n_words") < 20).cast("int"))
        .withColumn("f_stopword", (col("_sw") > 0.12).cast("int"))
        .withColumn("f_top_gram",
          (when(col("_s.n_grams") === 0, lit(1.0))
            .otherwise(Text.fracTrunc4(col("_s.top_gram_n"), col("_s.n_grams")))
            >= 0.1).cast("int"))
        .withColumn("f_dup_gram",
          (when(col("_s.n_grams") === 0, lit(1.0))
            .otherwise(Text.fracTrunc4(col("_s.dup_n"), col("_s.n_grams")))
            >= 0.15).cast("int"))
        .withColumn("keep",
          (col("f_short") + col("f_stopword") + col("f_top_gram") +
            col("f_dup_gram") === 0).cast("int"))
        .where(col("keep") === 1)
        .select(col("doc_id"), col("source"), col("redacted"), col("n_words"))
        .localCheckpoint()
      val normKey = concat_ws(" ", slice(split(col("redacted"), " "), 1, 8))
      val drop = Text.exactDupGroups(gated, "doc_id", normKey)
        .select(explode(col("members")).as("doc_id"), col("keeper"))
        .where(col("doc_id") =!= col("keeper"))
        .select("doc_id")
      val ded = gated.join(broadcast(drop), Seq("doc_id"), "left_anti")
      (scrubbed, gated, ded)
    }
    // time each checkpoint action separately
    locally {
      val t0 = System.nanoTime()
      val scrubbed = Pii.redact(pii, col("ptext"))
        .select(col("doc_id"), col("source"), col("redacted"))
        .localCheckpoint()
      println(f"MICRO scrub checkpoint (cold)               ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      val t1 = System.nanoTime()
      val q = Text.qualityMetrics(scrubbed, col("redacted"), Seq("the", "a"))
      val gated = q.withColumn("_sw", round(col("stopword_ratio"), 4))
        .withColumn("_s", Text.repetitionStats(col("redacted"), 2))
        .withColumn("f_short", (col("n_words") < 20).cast("int"))
        .withColumn("f_stopword", (col("_sw") > 0.12).cast("int"))
        .withColumn("f_top_gram",
          (when(col("_s.n_grams") === 0, lit(1.0))
            .otherwise(Text.fracTrunc4(col("_s.top_gram_n"), col("_s.n_grams")))
            >= 0.1).cast("int"))
        .withColumn("f_dup_gram",
          (when(col("_s.n_grams") === 0, lit(1.0))
            .otherwise(Text.fracTrunc4(col("_s.dup_n"), col("_s.n_grams")))
            >= 0.15).cast("int"))
        .withColumn("keep",
          (col("f_short") + col("f_stopword") + col("f_top_gram") +
            col("f_dup_gram") === 0).cast("int"))
        .where(col("keep") === 1)
        .select(col("doc_id"), col("source"), col("redacted"), col("n_words"))
        .localCheckpoint()
      println(f"MICRO gate checkpoint (cold)                ${(System.nanoTime() - t1) / 1e9}%7.3f s")
      val t2 = System.nanoTime()
      val normKey = concat_ws(" ", slice(split(col("redacted"), " "), 1, 8))
      val drop = Text.exactDupGroups(gated, "doc_id", normKey)
        .select(explode(col("members")).as("doc_id"), col("keeper"))
        .where(col("doc_id") =!= col("keeper"))
        .select("doc_id")
      val ded = gated.join(broadcast(drop), Seq("doc_id"), "left_anti")
      val nOut = Sampling.splitByHash(ded, col("doc_id"), "s1",
          Seq(("train", 900), ("val", 950), ("test", 1000)))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words").cast("long")).as("n_toks")).count()
      println(f"MICRO dedup+split+agg (cold)                ${(System.nanoTime() - t2) / 1e9}%7.3f s  n=$nOut")
    }
    t("q_pipeline_e2e end-to-end")(
      graft.Queries.queries("q_pipeline_e2e")(spark, sfDir).count())
    t("q_pipeline_audit end-to-end")(
      graft.Queries.queries("q_pipeline_audit")(spark, sfDir).count())
    spark.stop()
  }
}
