package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch decomposition of q_feed_parse (r15): which envelope family
  * owns the wall, and does freezing the 3-column base (one events scan
  * instead of four) pay? Not in the catalog.
  */
object FeedProbe {
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
    def t(label: String)(f: => Long): Unit = {
      f // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[feedprobe] $label%-28s best=$best%7.3f s")
    }
    val n = graft.Tables.events(spark, dir).count()
    println(s"[feedprobe] events rows = $n")
    t("full lane")(graft.Queries.queries("q_feed_parse")(spark, dir).count())

    // family decomposition (mirrors qFeedParse's raw builders — scratch
    // copy, the lane stays the source of truth)
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions._
    import graft.sources.JsonFeed
    val base = graft.Tables.events(spark, dir).select(col("user_id").as("u"),
      col("event_id").as("e"), expr("ts div 1000000000").as("sec"))
    def i(c: Column): Column = c.cast("string")
    val poison = col("e") % 7 === 0
    val bad = lit("{\"oops\":")
    def swimFlight(uu: Column, ee: Column): Column = concat(
      lit("{\"source\":\"S1\",\"timestamp\":\"t\"," +
        "\"flightIdentification\":{\"computerId\":"), i(uu % 512),
      lit(",\"aircraftIdentification\":\"CS"), i(uu % 50),
      lit("\"},\"enRoute\":{\"position\":{\"positionTime\":\"2016-01-"),
      lpad(i(col("sec") % 27 + 1), 2, "0"), lit("T"),
      lpad(i(expr("(sec div 3600) % 24")), 2, "0"), lit(":"),
      lpad(i(expr("(sec div 60) % 60")), 2, "0"),
      lit(":00Z\",\"position\":{\"location\":{\"pos\":\""),
      i(uu % 90), lit(" "), i(ee % 180),
      lit("\"}},\"altitude\":{\"content\":"), i((ee % 400) * 100),
      lit("},\"actualSpeed\":{\"surveillance\":{\"content\":"), i(uu % 600),
      lit("}}}}}"))
    val swimRaw = base.select(
      when(poison, bad).otherwise(concat(
        lit("{\"ns5:MessageCollection\":{\"message\":"),
        when(col("u") % 2 === 0,
          concat(lit("[{\"flight\":"), swimFlight(col("u"), col("e")),
            lit("},{\"flight\":"),
            swimFlight(col("u") + 1, col("e") + 11), lit("}]")))
          .otherwise(
            concat(lit("{\"flight\":"), swimFlight(col("u"), col("e")),
              lit("}"))),
        lit("}}"))).as("raw"))
    t("swim raw build only")(swimRaw.count())
    t("swim build+parse")(JsonFeed.parseFlights(swimRaw, "raw").count())

    // single-parse swap A/B (interleaved, same JVM): the LIVE
    // two-from_json path vs the variant experiment (try_parse_json once
    // + strict casts). r16 verdict: the variant loses — kept measured.
    def once(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    JsonFeed.parseFlightsVariant(swimRaw, "raw").count() // warm the twin
    val vs = scala.collection.mutable.ListBuffer.empty[Double]
    val ds = scala.collection.mutable.ListBuffer.empty[Double]
    for (r <- 1 to 3) {
      ds += once(JsonFeed.parseFlights(swimRaw, "raw").count())
      vs += once(JsonFeed.parseFlightsVariant(swimRaw, "raw").count())
      println(f"[feedprobe] r$r swim live_double=${ds.last}%7.3f  variant=${vs.last}%7.3f")
    }
    println(f"[feedprobe] swim parse A/B mins: live_double=${ds.min}%7.3f  " +
      f"variant(strict)=${vs.min}%7.3f")
    def ac(uu: Column, ee: Column): Column = concat(
      lit("[\"f"), i(ee), lit("\",\"IC"), i(uu % 512), lit("\","),
      i(uu % 90), lit(","), i(ee % 180), lit(",90,"),
      i((ee % 400) * 100), lit(","), i(uu % 600),
      lit(",\"7012\",\"r\",\"B738\",\"N"), i(uu % 99), lit("\","),
      i(col("sec")), lit(",\"SFO\",\"LAX\",\"FL1\",0,64,\"CS"), i(uu % 50),
      lit("\",\"-\"]"))
    val frRaw = base.where(col("u") % 3 === 0).select(
      when(poison, bad).otherwise(concat(
        lit("{\"full_count\":2,\"version\":4,\"aircraft\":["),
        ac(col("u"), col("e")), lit(","),
        ac(col("u") + 1, col("e") + 11), lit("]}"))).as("raw"))
    t("fr24 build+parse")(JsonFeed.parseFr24List(frRaw, "raw").count())
    spark.stop()
  }
}
