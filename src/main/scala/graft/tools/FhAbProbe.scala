package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the q_feature_hash_dup tier pipeline
  * (r16, the r15 verdict's item 6: 21 tier-checkpoint jobs, 8-vs-32-core
  * scaling ratio 0.72 — job-floor bound, not data bound). Variants:
  *
  *  - `live`    — the catalog lane as-is (two EAGER localCheckpoints: the
  *                hashed blocking tier `v` and the exact word tier `w`,
  *                each a dedicated materialization job).
  *  - `lazy`    — same plan shape, `v`/`w` checkpoints LAZY
  *                (localCheckpoint(false)): the RDDs materialize inside
  *                the first consuming job instead of their own jobs.
  *  - `sharedwc`— one (doc, word, count) aggregate feeds BOTH tiers: the
  *                word tier rolls it up directly, the hashed tier derives
  *                buckets as pmod(polyHash(word)) over the aggregate
  *                (bucket counts = sum of word counts — identical b1/b2
  *                ranking), saving a second corpus explode + first-level
  *                exchange. The q_collocations rule says this can LOSE
  *                when distinct-(doc,word) ≈ exploded rows — measured,
  *                not assumed.
  *
  * All variants return identical rows (asserted once per run).
  */
object FhAbProbe {
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })

    val d = graft.Tables.documentsSpread(spark, dir)
    val dim = math.max(64L,
      graft.Tables.documents(spark, dir).count() / 44L)

    // ---- variant bodies ------------------------------------------------
    def pairTail(v: DataFrame, w: DataFrame, members: DataFrame): DataFrame = {
      val cand = v.select(col("doc_id").as("_ra"), col("b1"), col("b2"))
        .join(v.select(col("doc_id").as("_rb"), col("b1").as("_b1b"),
            col("b2").as("_b2b")),
          col("b1") === col("_b1b") && col("b2") === col("_b2b") &&
            col("_ra") < col("_rb"))
        .select(col("_ra"), col("_rb"))
      val repPairs = cand
        .join(w.select(col("doc_id").as("_ra"), col("wtf").as("_ma"),
          col("wnorm2").as("_na")), "_ra")
        .join(w.select(col("doc_id").as("_rb"), col("wtf").as("_mb"),
          col("wnorm2").as("_nb")), "_rb")
        .withColumn("dot", Text.sparseDot(col("_ma"), col("_mb")))
        .withColumn("cos2_x10k", expr("dot * dot * 10000L div (_na * _nb)"))
        .where(col("cos2_x10k") >= 9000L)
        .select(col("_ra"), col("_rb"), col("dot"), col("cos2_x10k"))
      val cross = repPairs
        .join(members.toDF("_ra", "da"), "_ra")
        .join(members.toDF("_rb", "db"), "_rb")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("dot"), col("cos2_x10k"))
      val intra = members.toDF("_r", "da")
        .join(members.toDF("_r", "db"), "_r")
        .where(col("da") < col("db"))
        .join(w.select(col("doc_id").as("_r"), col("wnorm2")), "_r")
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("wnorm2").as("dot"), lit(10000L).as("cos2_x10k"))
      cross.unionByName(intra)
    }

    def collapse(): (DataFrame, DataFrame) = {
      val grp = d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_members"))
        .localCheckpoint(false)
      val members = d.select(col("doc_id"), col("text"))
        .join(grp.select(col("text"), col("rep_id")), "text")
        .select(col("rep_id"), col("doc_id"))
        .localCheckpoint(false)
      (grp.select(col("rep_id").as("doc_id"), col("text")), members)
    }

    def variantLazy(): DataFrame = {
      val (reps, members) = collapse()
      val v = Text.hashedTfSparse(reps, "doc_id", col("text"), dim)
        .select(col("doc_id"), col("b1"), col("b2"))
        .localCheckpoint(false)
      val w = Text.wordTfSparse(reps, "doc_id", col("text"))
        .localCheckpoint(false)
      pairTail(v, w, members)
    }

    def variantSharedWc(): DataFrame = {
      val (reps, members) = collapse()
      val wc = reps.select(col("doc_id"),
          explode(split(col("text"), " ")).as("_w"))
        .where(col("_w") =!= "")
        .groupBy(col("doc_id"), col("_w")).agg(count(lit(1)).as("_c"))
        .localCheckpoint(false)
      val w = wc.groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("_w"), col("_c"))))
            .as("wtf"),
          sum(col("_c") * col("_c")).as("wnorm2"))
        .localCheckpoint(false)
      val v = wc
        .withColumn("_bk", pmod(Text.polyHash(col("_w")), lit(dim)))
        .groupBy(col("doc_id"), col("_bk")).agg(sum(col("_c")).as("_c"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct((-col("_c")).as("nc"),
          col("_bk").as("bk")))).as("_rk"))
        .select(col("doc_id"),
          col("_rk").getItem(0).getField("bk").as("b1"),
          coalesce(expr("get(_rk, 1).bk"), lit(-1L)).as("b2"))
        .localCheckpoint(false)
      pairTail(v, w, members)
    }

    def run(name: String)(f: => DataFrame): (Long, Double, Int) = {
      spark.catalog.clearCache()
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = f.count()
      ((n, (System.nanoTime() - t0) / 1e9, jobs.get()))
    }

    // result equality once (cheap cardinality + checksum compare)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("doc_a") * 31 + col("doc_b") +
        col("dot") * 7 + col("cos2_x10k"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val sLive = sig(graft.Queries.queries("q_feature_hash_dup")(spark, dir))
    val sLazy = sig(variantLazy())
    val sWc = sig(variantSharedWc())
    println(s"[fhab] sig live=$sLive lazy=$sLazy sharedwc=$sWc " +
      s"equal=${sLive == sLazy && sLive == sWc}")

    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to 3) {
      for ((name, f) <- Seq[(String, () => DataFrame)](
        "live" -> (() => graft.Queries.queries("q_feature_hash_dup")(spark, dir)),
        "lazy" -> (() => variantLazy()),
        "sharedwc" -> (() => variantSharedWc()))) {
        val (n, sec, j) = run(name)(f())
        println(f"[fhab] r$r $name%-9s $sec%7.3f s  jobs=$j%3d  rows=$n")
        walls(name) = sec :: walls.getOrElse(name, Nil)
      }
    }
    println("[fhab] ==== summary (min/med over 3) ====")
    walls.toSeq.sortBy(_._1).foreach { case (k, ws) =>
      println(f"[fhab] $k%-9s min=${ws.min}%7.3f  med=${ws.sorted.apply(ws.size / 2)}%7.3f")
    }
    spark.stop()
  }
}
