package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for the streaming-gate floor knobs (r15 optimization
  * round): runs REAL catalog lanes repeatedly in one JVM while flipping
  * a StreamGate knob between rounds (interleaved, so no config owns the
  * warm-up — the StageAbProbe discipline).
  *
  * Experiments (args(0)):
  *  - `parts` — state-partition count: graft.streamParts ∈ {8, 4, 2}
  *    (8 was the r14 floor; every partition is a state-store instance
  *    paying per-batch setup + commit).
  *  - `tmp` — gate scratch placement: graft.gateTmpDir ∈
  *    {java.io.tmpdir (disk), /dev/shm (tmpfs)} — staging parquet,
  *    offset/commit logs and state deltas all land there.
  * args(1..) = lane names (default: q_ewma_stream q_dedup_stream
  * q_stream_join). SPARK_GRAFT_SF_DIR picks the corpus.
  */
object GateFloorProbe {
  def main(args: Array[String]): Unit = {
    val exp = if (args.nonEmpty) args(0) else "parts"
    val lanes = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_ewma_stream", "q_dedup_stream", "q_stream_join")
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

    val variants: Seq[(String, () => Unit)] = exp match {
      case "parts" => Seq(
        "parts=8" -> (() => sys.props("graft.streamParts") = "8"),
        "parts=4" -> (() => sys.props("graft.streamParts") = "4"),
        "parts=2" -> (() => sys.props("graft.streamParts") = "2"))
      case "tmp" => Seq(
        "tmp=disk" -> (() => sys.props("graft.gateTmpDir") =
          System.getProperty("java.io.tmpdir")),
        "tmp=shm" -> (() => sys.props("graft.gateTmpDir") = "/dev/shm"))
      case other => sys.error(s"unknown experiment $other")
    }

    val walls = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    // one untimed warm pass per lane (plan + codegen + JIT) under the
    // first variant, then 3 interleaved timed rounds per variant
    variants.head._2()
    lanes.foreach { l => graft.Queries.queries(l)(spark, dir).count() }
    for (r <- 1 to 3; (vn, set) <- variants) {
      set()
      for (l <- lanes) {
        val t0 = System.nanoTime()
        val n = graft.Queries.queries(l)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[gatefloor] r$r $vn%-10s $l%-22s $sec%7.3f s  rows=$n")
        val k = (l, vn)
        walls(k) = sec :: walls.getOrElse(k, Nil)
      }
    }
    println("[gatefloor] ==== summary (min / med over 3 rounds) ====")
    for (l <- lanes; (vn, _) <- variants; ws <- walls.get((l, vn)))
      println(f"[gatefloor] $l%-22s $vn%-10s min=${ws.min}%7.3f  med=${ws.sorted.apply(ws.size / 2)}%7.3f")
    spark.stop()
  }
}
