package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Connected-components scale probe for the star-contraction fallback:
  * an adversarial CHAIN of `n` nodes (diameter n−1) where min-label
  * propagation needs O(n) rounds — at n = 200k that is 200k shuffle
  * rounds, i.e. never finishes — while large-star/small-star alternation
  * is diameter-independent (O(log² n) alternations). Also runs a
  * clique-ish dup graph (the near-dup shape) to show min-label's 3-5
  * round fast path is the right default there.
  *
  * Usage: `sbt "runMain graft.tools.GraphScaleProbe [chainN]"`
  * (default 200000).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val chainN = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graph] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // shuffled ids so the chain isn't label-sorted by construction
    val perm = spark.range(chainN)
      .select(col("id"),
        graft.operators.Sampling.sampleHash(col("id").cast("string"), "gp")
          .as("h"))
      .withColumn("nid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("id"))) - 1)
      .select(col("id"), col("nid"))
    val chain = perm.as("a")
      .join(perm.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.nid").as("a"), col("b.nid").as("b"))
      .repartition(cpus.toInt).localCheckpoint()
    println(s"[graph] chain: $chainN nodes, diameter ${chainN - 1}")

    val comp = timed(s"star-contraction fallback (maxIter=1 min-label)") {
      Graph.connectedComponents(chain, "a", "b", maxIter = 1)
        .agg(countDistinct(col("comp")), count(lit(1))).head()
    }
    println(s"[graph] components=${comp.getLong(0)} nodes=${comp.getLong(1)}" +
      " (expect 1 component, all nodes)")

    // clique-ish dup graph: 20k cliques of 8 — min-label's home turf
    val cliques = spark.range(20000L * 8)
      .select((col("id") / 8).cast("long").as("g"), col("id"))
      .groupBy("g").agg(collect_list(col("id")).as("m"))
      .select(explode(expr(
        "transform(sequence(1, size(m) - 1), i -> struct(m[0] as a, m[i] as b))"))
        .as("e"))
      .select(col("e.a"), col("e.b"))
      .repartition(cpus.toInt).localCheckpoint()
    val c2 = timed("min-label fast path (20k cliques of 8)") {
      Graph.connectedComponents(cliques, "a", "b")
        .agg(countDistinct(col("comp"))).head().getLong(0)
    }
    println(s"[graph] clique components=$c2 (expect 20000)")
    spark.stop()
  }
}
