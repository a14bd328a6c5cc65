package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for a session-conf knob over real catalog lanes (r15):
  * interleaved variant rounds, one untimed warm pass, min/med summary —
  * the GateFloorProbe/StageAbProbe discipline generalized to any
  * runtime-settable SQL conf.
  *
  * args: <confKey=v1,v2[,v3]> <lane> [lane...]
  * e.g. `spark.sql.adaptive.enabled=true,false q_textrank q_kcore`
  */
object ConfAbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ConfAbProbe key=v1,v2 lane [lane...]")
    val Array(key, vals) = args(0).split("=", 2)
    val variants = vals.split(",").toSeq
    val lanes = args.drop(1).toSeq
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

    val walls = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    spark.conf.set(key, variants.head)
    lanes.foreach { l => graft.Queries.queries(l)(spark, dir).count() }
    for (r <- 1 to 3; v <- variants) {
      spark.conf.set(key, v)
      for (l <- lanes) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.Queries.queries(l)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[confab] r$r $key=$v%-6s $l%-22s $sec%7.3f s  rows=$n")
        val k = (l, v)
        walls(k) = sec :: walls.getOrElse(k, Nil)
      }
    }
    println("[confab] ==== summary (min / med over 3 rounds) ====")
    for (l <- lanes; v <- variants; ws <- walls.get((l, v)))
      println(f"[confab] $l%-22s $key=$v%-6s min=${ws.min}%7.3f  med=${ws.sorted.apply(ws.size / 2)}%7.3f")
    spark.stop()
  }
}
