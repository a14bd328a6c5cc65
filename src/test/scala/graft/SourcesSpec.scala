package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SourcesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("day-partitioned parquet sink round-trips and partition-prunes") {
    val out = Files.createTempDirectory("graft_sink").toString
    val ev = Tables.events(spark, sfDir)
    Sinks.writePartitionedByDay(ev, "ts", out)
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    // partition layout exists and pruning cuts files read
    val days = back.select("day").distinct().count()
    assert(days > 1)
    val one = back.where(col("day") === "2024-01-05")
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(!scan.contains("PartitionFilters: []"), "expected partition filters to apply")
  }

  test("CSV ingest quarantines corrupt rows instead of dropping the batch") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      "1,1000,click,2.5\n2,notanumber,view,1.0\n3,3000,error,0.5\n")
    // Spark requires materializing before filtering on only the corrupt
    // column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache-then-split is the
    // documented quarantine pattern.
    val df = Sinks.readTrackpointCsv(spark, dir).cache()
    val good = df.where(col("_corrupt").isNull)
    val bad = df.where(col("_corrupt").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
  }

  test("match-list CSV sink dumps intersection rows with header, ordered") {
    val out = Files.createTempDirectory("graft_matchcsv").toString + "/matches"
    val matches = Queries.queries("q_geo_intersections")(spark, sfDir)
    Sinks.writeMatchListCsv(matches, out, Seq("user_id", "entry_event"),
      singleFile = true)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.toSeq == matches.columns.toSeq) // header preserved order
    assert(back.count() == matches.count())
    // single part file + header row, like the reference's one-response CSV
    val parts = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
    val first = scala.io.Source.fromFile(parts.head)
    try assert(first.getLines().next() == matches.columns.mkString(","))
    finally first.close()
  }
}

class FoiaSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("FOIA CSV ingest fuses date+time and scales altitude") {
    val dir = Files.createTempDirectory("graft_foia").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/dump.csv"),
      "AIRCRAFT_ID,FLIGHT_INDEX,LATITUDE,LONGITUDE,ALTITUDEx100ft," +
        "TRACK_POINT_DATE_UTC,TRACK_POINT_TIME_UTC\n" +
        "VOI902,2015020103105708,37.69849,-122.21049,1,20150201,07:24:04\n" +
        "VOI902,2015020103105708,37.70002,-122.20881,3,20150201,07:24:09\n")
    val df = graft.sources.Sinks.readFoiaCsv(spark, dir)
    val rows = df.select("AIRCRAFT_ID", "altitude_ft", "ts", "lat")
      .as[(String, Double, Long, Double)].collect().sortBy(_._3)
    assert(rows.length == 2)
    assert(rows.head._1 == "VOI902")
    assert(rows.head._2 == 100.0 && rows(1)._2 == 300.0)
    // 2015-02-01T07:24:04Z in nanos
    assert(rows.head._3 == 1422775444L * 1000000000L)
    assert(rows(1)._3 - rows.head._3 == 5L * 1000000000L)
  }
}

class BucketedJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("same-key bucketed tables join with ZERO exchanges") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val agg = ev.groupBy("user_id").agg(count(lit(1)).as("n_u"))
    graft.sources.Sinks.writeBucketed(ev, "user_id", 4, "graft_ev_bkt")
    graft.sources.Sinks.writeBucketed(agg, "user_id", 4, "graft_agg_bkt")
    // disable broadcast so the co-location (not a broadcast) kills the
    // shuffle; BroadcastExchange would hide the point being tested
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_ev_bkt").join(spark.table("graft_agg_bkt"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
      val expected = ev.join(agg, "user_id").select("event_id", "n_u")
        .as[(Long, Long)].collect().toSet
      val got = j.select("event_id", "n_u").as[(Long, Long)].collect().toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS graft_ev_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_agg_bkt")
    }
  }
}

class JsonFeedSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def flight(cs: String, lat: Double, lon: Double): String =
    s"""{"source":"TH","timestamp":"2020-04-16T04:01:14Z",
        "flightIdentification":{"computerId":123,"aircraftIdentification":"$cs"},
        "enRoute":{"position":{"positionTime":"2020-04-16T04:01:14Z",
          "position":{"location":{"pos":"$lat $lon"}},
          "altitude":{"content":11000.0},
          "actualSpeed":{"surveillance":{"content":440.0}}}}}"""
      .replaceAll("\n\\s*", "")

  test("JSON feed parses multi-message, single-message, and drops garbage") {
    val multi = s"""{"ns5:MessageCollection":{"message":[
        {"flight":${flight("SWA1988", 41.5, -122.5)}},
        {"flight":${flight("UAL12", 37.6, -122.4)}}]}}""".replaceAll("\n\\s*", "")
    val single =
      s"""{"ns5:MessageCollection":{"message":{"flight":${flight("AAL3", 40.0, -100.0)}}}}"""
    val raw = Seq(multi, single, "not json at all", """{"unrelated": 1}""")
      .toDF("payload")
    val out = graft.sources.JsonFeed.parseFlights(raw, "payload")
      .select("callsign", "computer_id", "lat", "lon", "alt", "speed")
      .as[(String, Int, Double, Double, Double, Double)].collect().toSet
    assert(out == Set(
      ("SWA1988", 123, 41.5, -122.5, 11000.0, 440.0),
      ("UAL12", 123, 37.6, -122.4, 11000.0, 440.0),
      ("AAL3", 123, 40.0, -100.0, 11000.0, 440.0)))
  }

  test("fr24 compact-array feed parses mixed records and drops poison") {
    // the three record flavors from the reference's fr24.go:159-171 comment
    val scheduled = """["7624382","AC7BF6",37.7370,-122.4019,195,6775,269,"3253","T-KSFO1","CRJ2","N903SW",1441900518,"SFO","BFL","UA5613",0,2176,"",0]"""
    val unscheduled = """["7638091","A8A763",37.6081,-122.3855,197,74,7,"6337","T-MLAT2","B762","N657GT",1441940842,"","","",1,0,"",0]"""
    val anon = """["7624195","",37.6762,-122.5215,275,4143,142,"3347","T-MLAT2","GLF4","",1441900519,"","","",0,2048,"GLF4",0]"""
    val short = """["deadbeef","ABCDEF"]"""                   // truncated row
    val swapped = """["x","y","not-a-lat",1.0,0,0,0,"","","","",0,"","","",0,0,"",0]"""
    val feed =
      s"""{"full_count":5,"version":4,"aircraft":[$scheduled,$unscheduled,$anon,$short,$swapped]}"""
    val raw = Seq(feed, "not json", """{"aircraft": 7}""").toDF("payload")
    val out = graft.sources.JsonFeed.parseFr24List(raw, "payload")
    val rows = out.select("fr_id", "icao_id", "lat", "alt", "on_ground", "registration")
      .as[(String, String, Double, Double, Boolean, String)].collect().toSet
    assert(rows == Set(
      ("7624382", "AC7BF6", 37.737, 6775.0, false, "N903SW"),
      ("7638091", "A8A763", 37.6081, 74.0, true, "N657GT"),
      ("7624195", "", 37.6762, 4143.0, false, "")))
    // epoch lands as a real timestamp
    val t = out.where(col("fr_id") === "7624382")
      .select(col("pos_time").cast("long")).as[Long].head()
    assert(t == 1441900518L)
  }
}

class StoreSpec extends AnyFunSuite with SparkFixture {
  import graft.sources.Store

  test("store round-trips and serves the fquery surface with partition pruning") {
    val path = Files.createTempDirectory("graft_store").toString
    val ev = Tables.events(spark, sfDir)
    val store = Store(spark, path)
    store.persist(ev)

    assert(store.all().count() == ev.count())

    val s = java.time.Instant.parse("2024-01-10T00:00:00Z").getEpochSecond * 1000000000L
    val e = java.time.Instant.parse("2024-01-12T00:00:00Z").getEpochSecond * 1000000000L
    val ranged = store.byTimeRange(s, e)
    val expected = ev.where(col("ts") >= s && col("ts") < e).count()
    assert(ranged.count() == expected)
    assert(ranged.queryExecution.executedPlan.toString.contains("PartitionFilters: ["),
      "time-range lookup must prune day partitions")

    val someUser = ev.select("user_id").head().getLong(0)
    assert(store.byKey(someUser).count() ==
      ev.where(col("user_id") === someUser).count())

    val spec = s"$someUser@${s / 1000000000L}"
    val bySpec = store.byIdSpec(spec, durSec = 2 * 86400)
    assert(bySpec.count() ==
      ev.where(col("user_id") === someUser && col("ts") >= s && col("ts") < e).count())

    assert(store.recent(3).groupBy("user_id").count()
      .agg(max("count")).head().getLong(0) <= 3)
  }
}

/** Watermarked streaming aggregation — the readStream → window → writeStream
  * shape for continuous timeslot rollups (fgae's cron'd summaries).
  */
class StreamingWindowSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("windowed count with watermark emits closed windows only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val counts = input.toDS()
      .toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))

    val query = counts.writeStream
      .format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(0), 1L), (t(1), 2L), (t(2), 3L))
      query.processAllAvailable()
      // watermark hasn't passed the first window yet → nothing emitted
      assert(spark.table("win_counts").count() == 0)
      input.addData((t(30), 4L)) // advances watermark to 10:20
      query.processAllAvailable()
      val rows = spark.table("win_counts").as[(java.sql.Timestamp, Long)].collect()
      assert(rows.toSeq == Seq((t(0), 3L)))
    } finally query.stop()
  }
}
