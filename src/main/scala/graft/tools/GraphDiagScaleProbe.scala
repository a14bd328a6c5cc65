package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scale probe for the r9 graph DIAGNOSTICS (r9-verdict item 8): HyperBall
  * register growth, modularity aggregates, and the blast-radius BFS
  * frontier, on a synthetic HUB-SKEW graph at increasing size — the shape
  * that breaks naive per-node state designs (one node's ball covers a
  * large graph fraction while everyone else's stays tiny).
  *
  * Graph at factor f: N = 40000·f nodes as 8-cliques (the near-dup
  * component shape; 28 intra-edges per clique → |E| ≈ 3.5·N) plus ONE HUB
  * (node 0) wired to every 50th node — hub degree N/50 grows with the
  * graph, so any per-round cost that secretly scales with max-degree²
  * shows as superlinear wall time.
  *
  * Evidence printed per factor:
  *   - hyperball: per-round REGISTER-ROW count — the sparse (node,
  *     bucket, reg) state whose bound is n·2^p; rows must grow ~linearly
  *     in n and saturate (merges idempotent), never blow up with hub
  *     degree — plus wall time;
  *   - modularity aggregates (the q_modularity tail after LPA labels:
  *     intra-edge rollup + degree mass + community rollup) with
  *     hash-bucket pseudo-labels standing in for LPA's (the aggregates,
  *     not the trainer, are what must scale);
  *   - blast radius: hopDistance from every 41st node, frontier size per
  *     hop (the hub makes hop-2 cover ~half the cliques — the honest
  *     worst case) and wall time.
  *
  * Usage: `sbt "runMain graft.tools.GraphDiagScaleProbe [factors...]"`
  * (default 1 10).
  */
object GraphDiagScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graphdiag] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (f <- factors) {
      val n = 40000L * f
      // 8-cliques over consecutive ids: per group, all 28 pairs
      val cliques = spark.range(n / 8)
        .select(explode(expr(
          """flatten(transform(sequence(0, 6), i ->
             transform(sequence(cast(i as bigint) + 1, 7), j ->
               struct(id * 8 + i AS a, id * 8 + j AS b))))""")).as("e"))
        .select(col("e.a"), col("e.b"))
      val hub = spark.range(n / 50)
        .select(lit(0L).as("a"), (col("id") * 50 + 1).as("b"))
      val edges = cliques.unionByName(hub)
        .repartition(cpus.toInt).localCheckpoint()
      val m = edges.count()
      println(s"[graphdiag] factor=$f n=$n edges=$m hub_degree=${n / 50}")

      // --- HyperBall register growth (catalog params: 4 rounds, p=6) ---
      val regRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      timed(s"hyperball f=$f (4 rounds, p=6)") {
        Graph.hyperBall(edges, "a", "b", 4, 6, 26,
          graft.operators.Sketch.hllNumScaled(6, 26),
          onRound = (r, regs) => regRows += ((r, regs.count()))).count()
      }
      regRows.foreach { case (r, rows) =>
        println(f"[graphdiag]   hyperball round $r: $rows%10d register rows " +
          f"(${rows.toDouble / n}%5.2f rows/node; bound ${1 << 6} = 2^p)")
      }

      // --- modularity aggregate tail (pseudo-labels = clique id) ---
      timed(s"modularity aggregates f=$f") {
        val lb = edges.select(col("a").as("id"))
          .union(edges.select(col("b").as("id"))).distinct()
          .withColumn("lab", expr("id div 8"))
        val w = edges.withColumn("w", lit(1L))
        val wTot = w.agg(sum("w").as("w_tot"))
        val intra = w
          .join(lb.toDF("id_a", "lab_a"), col("a") === col("id_a"))
          .join(lb.toDF("id_b", "lab_b"), col("b") === col("id_b"))
          .where(col("lab_a") === col("lab_b"))
          .groupBy(col("lab_a")).agg(sum("w").as("w_in"))
        val deg = w.select(col("a").as("id"), col("w"))
          .union(w.select(col("b").as("id"), col("w")))
          .groupBy("id").agg(sum("w").as("_dw"))
        val kc = lb.join(deg, "id").groupBy("lab").agg(sum("_dw").as("k_c"))
        kc.join(intra, col("lab") === col("lab_a"), "left")
          .crossJoin(broadcast(wTot))
          .agg(sum(lit(4L) * col("w_tot") * coalesce(col("w_in"), lit(0L))
            - col("k_c") * col("k_c"))).head()
      }

      // --- blast radius under the hub (seeds: every 41st node) ---
      val seeds = spark.range(n).where(col("id") % 41 === 0)
        .select(col("id"))
      val hops = timed(s"blast radius f=$f (3 hops, ${n / 41} seeds)") {
        Graph.hopDistance(edges, "a", "b", seeds, 3, Graph.ckptFor(spark))
          .groupBy("hops").agg(count(lit(1)).as("n"))
          .orderBy("hops").collect()
      }
      hops.foreach(r =>
        println(s"[graphdiag]   blast hop ${r.getLong(0)}: ${r.getLong(1)} nodes"))
    }
    println("[graphdiag] linear regime: hyperball rows/node and per-stage " +
      "times must stay ~flat across factors; blast frontier growth is a " +
      "GRAPH property (the hub), not an operator cost blowup")
    spark.stop()
  }
}
