package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scale probe for the r8 graph diagnostics (the r8-verdict ask): measures
  * the degree-ordered wedge join's Σ outdeg² bound and the k-core peel on
  * a HUB-SKEWED graph at increasing replication, demonstrating
  * sub-quadratic growth where the naive Σ deg² wedge join explodes.
  *
  * Graph shape per replica: one hub of degree `hubDeg` (a head term —
  * naive wedges at the hub alone are C(hubDeg, 2) ≈ hubDeg²/2) + `nCliq`
  * 6-cliques (the triangle-bearing body). Degree-ordering orients every
  * star edge leaf→hub (leaves have degree 1), so the hub's out-degree is
  * ZERO and the star contributes no wedges at all — the Schank/Wagner
  * point, measured instead of argued.
  *
  * Usage: `sbt "runMain graft.tools.TriangleScaleProbe [replicas]"`
  * (default 10; each replica adds hubDeg=20k star edges + 10k cliques).
  */
object TriangleScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val HubDeg = 20000L
    val NCliq = 10000L
    val CliqK = 6L

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    /** The catalog's exact wedge-join shape (qTriangles) over raw edges. */
    def triangles(edges: DataFrame): Long = {
      val deg = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val oriented = edges
        .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"),
          greatest(col("du"), col("dv")).as("ddst"))
        .localCheckpoint()
      val e1 = oriented.select(col("src"), col("dst").as("x"), col("ddst").as("dx"))
      val e2 = oriented.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
      val wedges = e1.join(e2, Seq("src"))
        .where(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")))
      wedges.join(
        oriented.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
        .count()
    }

    def buildEdges(r: Int): DataFrame = {
      // node-id spaces per replica: hub h at base, leaves after, cliques
      // in their own range — replicas are disjoint (linear growth by
      // construction, like DocScaleProbe's rotation rule)
      val base = spark.range(r)
      val perReplica = HubDeg + NCliq * CliqK + 1
      val hub = base.select(explode(expr(
          s"transform(sequence(1, ${HubDeg}L), i -> i)")).as("leaf"),
          col("id").as("rep"))
        .select((col("rep") * perReplica).as("u"),
          (col("rep") * perReplica + col("leaf")).as("v"))
      val cliq = base.select(col("id").as("rep"),
          explode(expr(s"transform(sequence(0, ${NCliq - 1}L), c -> c)")).as("c"))
        .select(col("rep"), col("c"),
          explode(expr(
            s"""flatten(transform(sequence(0, ${CliqK - 2}L),
                 i -> transform(sequence(i + 1, ${CliqK - 1}L),
                   j -> struct(i AS a, j AS b))))""")).as("p"))
        .select(
          (col("rep") * perReplica + lit(HubDeg + 1) + col("c") * CliqK +
            col("p.a")).as("u"),
          (col("rep") * perReplica + lit(HubDeg + 1) + col("c") * CliqK +
            col("p.b")).as("v"))
      hub.unionByName(cliq).repartition(cpus.toInt).localCheckpoint()
    }

    for (r <- Seq(1, reps)) {
      val edges = buildEdges(r)
      val m = edges.count()
      // the two wedge budgets: naive Σ deg² (what a hub explodes) vs the
      // orientation's Σ outdeg² (bounded by m^1.5)
      val deg = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val naive = deg.agg(sum(expr("deg * (deg - 1) div 2"))).head().getLong(0)
      val outd = edges
        .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
        .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("od"))
        .agg(sum(expr("od * (od - 1) div 2"))).head().getLong(0)
      println(s"[tri] r=$r edges=$m naive_wedges=$naive oriented_wedges=$outd " +
        f"(m^1.5=${math.pow(m.toDouble, 1.5)}%.0f)")
      val t = timed(s"r=$r triangle count (degree-ordered)") { triangles(edges) }
      val expect = r * NCliq * CliqK * (CliqK - 1) * (CliqK - 2) / 6
      println(s"[tri] r=$r triangles=$t (expect $expect)")
      val core = timed(s"r=$r k-core peel (k=3, 8 rounds)") {
        Graph.kCorePeel(edges.select(col("u").as("a"), col("v").as("b")),
          "a", "b", 3, 8, Graph.ckptFor(spark)).count()
      }
      println(s"[tri] r=$r 3-core survivors=$core (expect ${r * NCliq * CliqK}" +
        " — cliques survive, star dissolves)")
    }
    spark.stop()
  }
}
