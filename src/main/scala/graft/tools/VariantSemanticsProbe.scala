package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16: empirical semantics probe for the SWIM variant single-parse —
  * enumerates envelope edge shapes (mixed-validity arrays, JSON-null
  * elements, inner type mismatches) and prints, per shape, the row sets
  * from parseFlights (the live two-from_json path) vs
  * parseFlightsVariant (the strict variant experiment). The twin-equality contract (r15 ADVICE medium) is
  * decided from this output, not from guesses about PERMISSIVE/variant
  * cast granularity.
  *
  * Usage: `sbt "runMain graft.tools.VariantSemanticsProbe"`.
  */
object VariantSemanticsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def flight(cs: String, lat: Double, lon: Double): String =
      s"""{"source":"SWIM","timestamp":"2023-01-01T00:00:00Z",
         |"flightIdentification":{"computerId":7,"aircraftIdentification":"$cs"},
         |"enRoute":{"position":{"positionTime":"2023-01-01T00:00:00Z",
         |"position":{"location":{"pos":"$lat $lon"}},
         |"altitude":{"content":1000},
         |"actualSpeed":{"surveillance":{"content":250}}}}}""".stripMargin.replace("\n", "")
    def env(msg: String): String = s"""{"ns5:MessageCollection":{"message":$msg}}"""

    val shapes = Seq(
      "multi-valid" -> env(s"""[{"flight":${flight("AAL1", 1.0, 2.0)}},{"flight":${flight("AAL2", 3.0, 4.0)}}]"""),
      "single-valid" -> env(s"""{"flight":${flight("AAL3", 5.0, 6.0)}}"""),
      "mixed-valid-scalar" -> env(s"""[{"flight":${flight("AAL4", 7.0, 8.0)}}, 5]"""),
      "mixed-valid-null" -> env(s"""[{"flight":${flight("AAL5", 9.0, 10.0)}}, null]"""),
      "mixed-valid-string" -> env(s"""[{"flight":${flight("AAL6", 11.0, 12.0)}}, "oops"]"""),
      "array-all-null" -> env("[null]"),
      "array-all-scalar" -> env("[1, 2]"),
      "inner-type-mismatch-multi" -> env(
        s"""[{"flight":{"source":"X","flightIdentification":{"computerId":"abc","aircraftIdentification":"Z1"},"enRoute":{"position":{"position":{"location":{"pos":"1.5 2.5"}},"positionTime":"2023-01-01T00:00:00Z"}}}}]"""),
      "inner-type-mismatch-single" -> env(
        s"""{"flight":{"source":"X","flightIdentification":{"computerId":"abc","aircraftIdentification":"Z2"},"enRoute":{"position":{"position":{"location":{"pos":"3.5 4.5"}},"positionTime":"2023-01-01T00:00:00Z"}}}}"""),
      "inner-extra-field" -> env(s"""[{"flight":${flight("AAL7", 13.0, 14.0)},"extra":1}]"""),
      "pos-not-string-multi" -> env(
        s"""[{"flight":{"source":"X","enRoute":{"position":{"position":{"location":{"pos":9}}}}}}]"""),
      "garbage" -> "not json at all",
      "truncated" -> """{"oops":""",
      "unrelated" -> """{"unrelated": 1}""",
      "env-scalar" -> """{"ns5:MessageCollection": 7}""",
      "env-empty" -> """{"ns5:MessageCollection":{}}""",
      "msg-scalar" -> env("5"),
      "msg-empty-array" -> env("[]"),
      "msg-flight-null" -> env("""[{"flight":null}]"""),
      "msg-obj-no-flight" -> env("""{"source":"X"}"""))

    for ((name, payload) <- shapes) {
      val raw = Seq(payload).toDF("payload")
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.mkString("|")).toSeq.sorted
      val v = rows(graft.sources.JsonFeed.parseFlights(raw, "payload"))
      val d = rows(graft.sources.JsonFeed.parseFlightsVariant(raw, "payload"))
      val eq = if (v == d) "EQ " else "DIFF"
      println(s"[vprobe] $eq $name live=${v.size} variant=${d.size}")
      if (v != d) {
        v.foreach(r => println(s"[vprobe]   V: $r"))
        d.foreach(r => println(s"[vprobe]   D: $r"))
      }
    }
    spark.stop()
  }
}
