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

  test("dynamic partition pruning: a filtered dim join prunes fact partitions at runtime") {
    val out = Files.createTempDirectory("graft_dpp").toString
    val ev = Tables.events(spark, sfDir)
    Sinks.writePartitionedByDay(ev, "ts", out)
    val fact = spark.read.parquet(out)
    // dim carries the partition key; only the filtered days should be read.
    // The dim must live in OPAQUE storage: built inline, Catalyst
    // constant-folds `tag = 'keep'` straight into `day = ...` and prunes
    // STATICALLY (verified — the first draft of this test). Round-tripping
    // it through parquet makes the qualifying days unknowable at plan
    // time, which is exactly the case DPP exists for.
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    fact.select("day").distinct()
      .withColumn("tag",
        when(col("day") === "2024-01-05", lit("keep")).otherwise(lit("drop")))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.where(col("tag") === "keep"), "day")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n${plan.take(2000)}")
    assert(joined.count() == fact.where(col("day") === "2024-01-05").count())
  }

  test("incremental day refresh rewrites only the changed partitions") {
    val out = Files.createTempDirectory("graft_refresh").toString
    val ev = Tables.events(spark, sfDir)
    Sinks.writePartitionedByDay(ev, "ts", out)

    def files(day: String): Set[String] = {
      val d = new java.io.File(s"$out/day=$day")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val day5Before = files("2024-01-05")
    val day6Before = files("2024-01-06")
    assert(day5Before.nonEmpty && day6Before.nonEmpty)

    // "corrected" feed for day 6 only: values doubled
    val corrected = ev
      .where(expr("ts div 86400000000000") === expr(
        "cast(to_unix_timestamp(to_timestamp('2024-01-06'), 'yyyy-MM-dd') as long) div 86400"))
      .withColumn("value", col("value") * 2)
    assert(corrected.count() > 0)
    Sinks.refreshDays(corrected, "ts", out)

    // untouched day keeps its exact files; refreshed day has new ones
    assert(files("2024-01-05") == day5Before, "day 5 files must be untouched")
    assert(files("2024-01-06") != day6Before, "day 6 must be rewritten")

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count(), "row count preserved across refresh")
    val sumBefore = ev
      .where(expr("ts div 86400000000000") === expr(
        "cast(to_unix_timestamp(to_timestamp('2024-01-06'), 'yyyy-MM-dd') as long) div 86400"))
      .agg(org.apache.spark.sql.functions.sum("value")).as[Double].head()
    val sumAfter = back.where(col("day") === "2024-01-06")
      .agg(org.apache.spark.sql.functions.sum("value")).as[Double].head()
    assert(math.abs(sumAfter - 2 * sumBefore) < 1e-6)
  }

  test("compaction merges a day's small files; untouched days keep theirs") {
    val out = Files.createTempDirectory("graft_compact").toString + "/tbl"
    val ev = Tables.events(spark, sfDir)
    // ingest shape that leaves many small files per day
    ev.repartition(24)
      .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      .write.partitionBy("day").parquet(out)

    def files(day: String): Set[String] = {
      val d = new java.io.File(s"$out/day=$day")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val before5 = files("2024-01-05"); val before6 = files("2024-01-06")
    assert(before5.size > 3, s"expected many small files, got ${before5.size}")
    val totalBefore = spark.read.parquet(out).count()

    Sinks.compactDays(spark, out, targetRecordsPerFile = 1000000L,
      days = Seq("2024-01-05"))

    val after5 = files("2024-01-05")
    assert(after5.size == 1, s"expected one compacted file, got ${after5.size}")
    assert(files("2024-01-06") == before6, "day 6 files must be byte-identical")
    assert(spark.read.parquet(out).count() == totalBefore)
    // compacted partition content unchanged
    val d5 = spark.read.parquet(out).where(col("day") === "2024-01-05")
    val orig5 = ev.where(expr("ts div 86400000000000") === expr(
      "cast(to_unix_timestamp(to_timestamp('2024-01-05'), 'yyyy-MM-dd') as long) div 86400"))
    assert(d5.count() == orig5.count() && d5.count() > 0)
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

  test("spreadIfNarrow: single-split input gains the exchange; wide input is returned untouched") {
    // r16 (r15 verdict item 4): the parse-lane spread must not force an
    // exchange — or worse, a COALESCE — onto a scan that already arrives
    // with >= defaultParallelism splits
    val p = spark.sparkContext.defaultParallelism
    val narrow = spark.range(100).toDF("x").coalesce(1)
    assert(Tables.spreadIfNarrow(spark, narrow).rdd.getNumPartitions == p)
    val wide = spark.range(1000).toDF("x").repartition(p)
    val out = Tables.spreadIfNarrow(spark, wide)
    assert(out eq wide,
      "an already-wide input must come back as the SAME frame — no Exchange added")
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

  test("JSONL export: stable shards, schema'd read-back, corrupt quarantine") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val docs = (0L until 200L)
      .map(i => (i, s"text body $i", Seq(s"tag${i % 3}")))
      .toDF("doc_id", "text", "tags")
    graft.sources.Sinks.writeJsonl(docs, dir, "doc_id", 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json")).map(_.toPath)
    assert(files.length == 4, "one shard file per hash partition")
    // every line is standalone JSON (the loader contract)
    val lines = files.flatMap(f =>
      java.nio.file.Files.readAllLines(f).toArray(Array.empty[String]))
    assert(lines.length == 200)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    // shard assignment is a pure function of the key: re-export, same layout
    graft.sources.Sinks.writeJsonl(docs, s"$dir/again", "doc_id", 4)
    def shardMap(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName).zipWithIndex
      .flatMap { case (f, i) =>
        java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String])
          .map(l => l -> i) }.toMap
    assert(shardMap(dir).filter(_._1.nonEmpty) ==
      shardMap(s"$dir/again").filter(_._1.nonEmpty))
    // read-back: explicit schema, poison line quarantined not dropped
    Files.writeString(java.nio.file.Paths.get(s"$dir/poison.json"),
      "this is not json\n")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("tags", ArrayType(StringType))))
    // materialize before corrupt-column-only predicates (Spark disallows
    // querying just _corrupt straight off a raw JSON scan)
    val back = graft.sources.Sinks.readJsonl(spark, dir, schema)
      .localCheckpoint()
    assert(back.where(col("_corrupt").isNull).count() == 200)
    assert(back.where(col("_corrupt").isNotNull).count() == 1)
    assert(back.where(col("_corrupt").isNull)
      .agg(sum("doc_id")).head().getLong(0) == (0L until 200L).sum)
  }

  test("Foia.parseTrackpoints handles both documented layouts + poison lines") {
    // classic 13-column layout (row.go:21-33)
    val classic = Seq(
      "VOI902,2015020103105708,20150201065937NCT1024VOI902,NCT,1024,MMGL,OAK,A320,37.69849,-122.21049,1,20150201,07:24:04",
      "garbage line with,too,few", // wrong arity → PERMISSIVE nulls → dropped
      "VOI902,2015020103105708,20150201065937NCT1024VOI902,NCT,1024,MMGL,OAK,A320,not_a_float,-122.2,1,20150201,07:24:09"
    ).toDF("line")
    val got = graft.sources.Foia.parseTrackpoints(classic, "line",
      graft.sources.Foia.headersClassic).collect()
    assert(got.length == 1) // both poison rows dropped, not fatal
    val r = got.head
    assert(r.getAs[String]("callsign") == "VOI902")
    assert(r.getAs[String]("squawk") == "1024")
    assert(r.getAs[Double]("alt_ft") == 100.0)
    assert(r.getAs[String]("user_class") == null) // absent column → null
    // USER_CLASS 14-column layout (row.go:36-42)
    val modern = Seq(
      "VOI902,2015020103105708,20150201065937NCT1024VOI902,NCT,1024,MMGL,OAK,A320,C,37.69849,-122.21049,5,20150201,07:24:04"
    ).toDF("line")
    val got2 = graft.sources.Foia.parseTrackpoints(modern, "line",
      graft.sources.Foia.headersWithUserClass).collect()
    assert(got2.length == 1)
    assert(got2.head.getAs[String]("user_class") == "C")
    assert(got2.head.getAs[Double]("alt_ft") == 500.0)
  }

  test("Foia.parseTrackpoints evaluates from_csv exactly once per row (plan pin)") {
    // r15: the poison drop is fused into a Generate precisely so the
    // keep-predicate can NOT be pushed through the parse Project —
    // a trailing .where re-evaluated from_csv once per predicate
    // reference inside FilterExec (5x per row, no CSE there). Pin the
    // plan property: one from_csv evaluation site after optimization.
    // RDD-backed input (r16): a literal Seq.toDF is a LocalRelation and
    // ConvertToLocalRelation constant-folds the WHOLE parse at
    // optimization time — the pin then counts 0 sites and proves
    // nothing (the r15 red-suite bug; same trap the JsonFeed pin below
    // documents).
    val lines = spark.sparkContext.parallelize(Seq(
      "VOI902,2015020103105708,20150201065937NCT1024VOI902,NCT,1024,MMGL,OAK,A320,37.69849,-122.21049,1,20150201,07:24:04"
    )).toDF("line")
    val df = graft.sources.Foia.parseTrackpoints(lines, "line",
      graft.sources.Foia.headersClassic)
    val plan = df.queryExecution.optimizedPlan.toString
    val n = "from_csv\\(".r.findAllIn(plan).size
    assert(n == 1,
      s"expected exactly one from_csv evaluation site in the optimized " +
        s"plan, found $n — the keep-predicate leaked past the Generate " +
        "barrier and is re-running the parser per reference")
  }

  test("Foia.parseTrackpoints degrades when a dump's headers omit position columns") {
    // the r9 ADVICE fix: a header list without LATITUDE/LONGITUDE/
    // ALTITUDEx100ft must flow through the poison-drop rule (rows with no
    // position are dropped), not throw at plan analysis
    val headers = graft.sources.Foia.headersClassic
      .filterNot(Set("LATITUDE", "LONGITUDE", "ALTITUDEx100ft"))
    val lines = Seq(
      "VOI902,2015020103105708,20150201065937NCT1024VOI902,NCT,1024,MMGL,OAK,A320,20150201,07:24:04"
    ).toDF("line")
    val got = graft.sources.Foia.parseTrackpoints(lines, "line", headers)
    assert(got.columns.contains("lat") && got.columns.contains("alt_ft"))
    assert(got.count() == 0) // positionless rows drop; the batch survives
  }

  test("Foia.flights splits same-callsign flights by FLIGHT_INDEX and sorts tracks") {
    // the row.go:134-144 ambiguity: QXE17 flies twice the same day —
    // flight number identical, FLIGHT_INDEX distinguishes the flights
    val lines = Seq(
      "QXE17,2016051028797150,20160510235032NCT6624QXE17,NCT,6624,EUG,SJC,DH8D,37.34841,-121.91391,3,20160511,00:40:59",
      "QXE17,2016051028797150,20160510235032NCT6624QXE17,NCT,6624,EUG,SJC,DH8D,37.35002,-121.91558,3,20160511,00:41:04",
      "QXE17,2016051028735155,20160510011647NCT4514QXE17,NCT,4514,SJC,RNO,DH8D,37.36278,-121.92703,6,20160510,01:16:47",
      // deliberately out of order: the later point first in the file
      "QXE17,2016051028735155,20160510011647NCT4514QXE17,NCT,4514,SJC,RNO,DH8D,37.3649,-121.92945,9,20160510,01:16:42"
    ).toDF("line")
    val pts = graft.sources.Foia.parseTrackpoints(lines, "line",
      graft.sources.Foia.headersClassic)
    val fl = graft.sources.Foia.flights(pts).collect()
      .map(r => (r.getAs[String]("flight_index"), r)).toMap
    assert(fl.size == 2, "FLIGHT_INDEX must split the two QXE17 flights")
    val f1 = fl("2016051028797150")
    assert(f1.getAs[String]("origin") == "EUG" &&
      f1.getAs[String]("destination") == "SJC")
    assert(f1.getAs[Long]("n_points") == 2L)
    assert(f1.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("FOIA"))
    assert(f1.getAs[String]("data_source") == "FOIA")
    val f2 = fl("2016051028735155")
    // track sorted by timestamp ASCENDING despite shuffled file order
    val ts2 = f2.getAs[scala.collection.Seq[java.sql.Timestamp]]("track_ts")
      .toSeq.map(_.getTime)
    assert(ts2 == ts2.sorted && ts2.length == 2)
    // skeleton comes from the EARLIEST point; FAA foreign key rides along
    assert(f2.getAs[String]("faa_key") == "20160510011647NCT4514QXE17")
    val alts2 = f2.getAs[scala.collection.Seq[Double]]("track_alt_ft").toSeq
    assert(alts2 == Seq(900.0, 600.0)) // 01:16:42 point (alt 9) sorts first
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

  test("parseFlights (live two-from_json) == the variant single-parse twin on every envelope shape") {
    // r15/r16: the variant experiment must reproduce the PERMISSIVE
    // null-out semantics of the live double parse on every shape the
    // feed can carry — including the degenerate envelopes that exercise
    // the cast-failure edges
    val multi = s"""{"ns5:MessageCollection":{"message":[
        {"flight":${flight("SWA1988", 41.5, -122.5)}},
        {"flight":${flight("UAL12", 37.6, -122.4)}}]}}""".replaceAll("\n\\s*", "")
    val single =
      s"""{"ns5:MessageCollection":{"message":{"flight":${flight("AAL3", 40.0, -100.0)}}}}"""
    val shapes = Seq(
      multi, single, "not json at all", """{"oops":""",
      """{"unrelated": 1}""",
      """{"ns5:MessageCollection": 7}""",
      """{"ns5:MessageCollection":{}}""",
      """{"ns5:MessageCollection":{"message":5}}""",
      """{"ns5:MessageCollection":{"message":[]}}""",
      """{"ns5:MessageCollection":{"message":[1, 2]}}""",
      """{"ns5:MessageCollection":{"message":[{"flight":null}]}}""",
      """{"ns5:MessageCollection":{"message":{"flight":{"source":"X"}}}}""",
      // MIXED-validity arrays (r16, the r15 ADVICE gap): a bare
      // ARRAY<STRUCT> variant cast nulls bad ELEMENTS individually and
      // would leak the valid element; the twin PERMISSIVE-nulls the
      // whole record. The strict per-element path must drop the lot —
      // while an explicit JSON null element (a VALID slot for the twin
      // too) must NOT poison its siblings.
      s"""{"ns5:MessageCollection":{"message":[{"flight":${flight("MIX1", 1.0, 2.0)}}, 5]}}""",
      s"""{"ns5:MessageCollection":{"message":[{"flight":${flight("MIX2", 3.0, 4.0)}}, "oops"]}}""",
      s"""{"ns5:MessageCollection":{"message":[{"flight":${flight("KEEP1", 5.0, 6.0)}}, null]}}""",
      """{"ns5:MessageCollection":{"message":[null]}}""")
    val raw = shapes.toDF("payload")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val live = rows(graft.sources.JsonFeed.parseFlights(raw, "payload"))
    val variant = rows(graft.sources.JsonFeed.parseFlightsVariant(raw, "payload"))
    assert(live == variant)
    // the three well-formed flights + KEEP1 (null sibling is benign);
    // MIX1/MIX2 die with their poisoned arrays
    assert(live.size == 4)
    assert(live.exists(_.contains("KEEP1")))
    assert(!live.exists(r => r.contains("MIX1") || r.contains("MIX2")))
  }

  test("parseFlightsVariant tokenizes each payload exactly once (plan pin)") {
    // r15: the variant column is projected separately and referenced by
    // multiple casts — CollapseProject must keep the parse Project intact
    // or every row re-tokenizes per reference (the from_csv FilterExec
    // precedent). RDD-backed input: a literal LocalRelation would fold
    // the whole plan and the pin would count 0 sites.
    val raw = spark.sparkContext.parallelize(Seq(
      s"""{"ns5:MessageCollection":{"message":{"flight":${flight("AAL3", 40.0, -100.0)}}}}"""
    )).toDF("payload")
    val plan = graft.sources.JsonFeed.parseFlightsVariant(raw, "payload")
      .queryExecution.optimizedPlan.toString
    // the optimizer lowers try_parse_json to
    // static_invoke(VariantExpressionEvalUtils.parseJson(...)) — count
    // the lowered form, not the sugar (r15 ADVICE: 'parse_json(' counts
    // 0 sites in the optimized plan and the pin fails spuriously)
    val n = "parseJson\\(".r.findAllIn(plan).size
    assert(n == 1,
      s"expected exactly one parseJson tokenization site in the optimized " +
        s"plan, found $n — the variant parse inlined into its consumers")
    assert(!plan.contains("from_json"),
      "the single-parse path must not fall back to from_json")
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

  test("FlightXML historical-track feed: typed points, trust flag, poison drop") {
    // updateType semantics per fa/types.go:58-66: TA/A = surveillance
    // (trusted), TP = projected, TZ = radar
    val feed = """{"GetHistoricalTrackResult":{"data":[
      {"altitude":85,"altitudeChange":"C","altitudeStatus":"-","groundspeed":265,
       "latitude":37.7,"longitude":-122.4,"timestamp":1441900518,"updateType":"TA"},
      {"altitude":90,"altitudeChange":"C","altitudeStatus":"-","groundspeed":270,
       "latitude":37.8,"longitude":-122.5,"timestamp":1441900578,"updateType":"TP"},
      {"altitude":95,"groundspeed":280,
       "latitude":null,"longitude":-122.6,"timestamp":1441900638,"updateType":"TZ"}
    ]}}""".replaceAll("\n\\s*", "")
    val raw = Seq(feed, "not json", """{"GetHistoricalTrackResult":{}}""").toDF("payload")
    val out = graft.sources.JsonFeed.parseFaTrack(raw, "payload")
    val rows = out.select("lat", "alt", "speed", "update_type", "trusted")
      .as[(Double, Long, Long, String, Boolean)].collect().toSet
    // null-lat point dropped; FlightXML hundreds-of-feet altitude scaled
    assert(rows == Set(
      (37.7, 8500L, 265L, "TA", true),
      (37.8, 9000L, 270L, "TP", false)))
  }

  test("FlightXML FlightInfoEx feed: metadata rows, -1 epochs become null") {
    val feed = """{"FlightInfoExResult":{"next_offset":-1,"flights":[
      {"faFlightID":"UAL1234-1441843891-airline-0309","ident":"UAL1234",
       "aircrafttype":"B739","origin":"KSFO","destination":"KLAX",
       "route":"TRUKN2 BSR","filed_departuretime":1441913400,
       "actualdeparturetime":1441913520,"estimatedarrivaltime":1441918500,
       "actualarrivaltime":-1,"filed_altitude":330,"diverted":""}
    ]}}""".replaceAll("\n\\s*", "")
    val raw = Seq(feed, "garbage").toDF("payload")
    val out = graft.sources.JsonFeed.parseFaFlightInfo(raw, "payload")
    val r = out.head()
    assert(r.getAs[String]("callsign") == "UAL1234")
    assert(r.getAs[String]("origin") == "KSFO")
    assert(r.getAs[java.sql.Timestamp]("actual_departure").toInstant.getEpochSecond
      == 1441913520L)
    assert(r.isNullAt(out.columns.indexOf("actual_arrival"))) // -1 → null
    assert(r.getAs[Long]("filed_altitude") == 330L)
  }

  test("ADS-B Exchange acList feed: millis epoch, MLAT flag, airport extraction") {
    val feed = """{"lastDv":"636407000000000000","acList":[
      {"Icao":"AAA5AE","Call":"UAL1572","Reg":"N78511","Type":"B738",
       "OpIcao":"UAL","Alt":8550,"GAlt":8514,"Spd":268.6,"Vsi":2176,
       "Trak":321.7,"Lat":37.680267,"Long":-122.436842,
       "PosTime":1505618648880.0,"Mlat":false,"Gnd":false,"Rcvr":1,
       "From":"KBOS General Edward Lawrence Logan, Boston, United States",
       "To":"KSFO San Francisco, United States"},
      {"Icao":"","Call":"GLF4","Alt":4143,"Spd":142,"Vsi":0,"Trak":275,
       "Lat":37.6762,"Long":-122.5215,"PosTime":1505618650000.0,"Mlat":true,
       "From":"EGLL Heathrow, London, United Kingdom","To":""},
      {"Icao":"BAD","Call":"NOPOS","PosTime":1505618650000.0}
    ]}""".replaceAll("\n\\s*", "")
    val raw = Seq(feed, "not json").toDF("payload")
    val out = graft.sources.JsonFeed.parseAexList(raw, "payload")
    assert(out.count() == 2) // position-less aircraft dropped
    val ual = out.where(col("callsign") === "UAL1572").head()
    assert(ual.getAs[java.sql.Timestamp]("pos_time").toInstant.getEpochSecond
      == 1505618648L) // float millis truncated to seconds (aex.go:92)
    assert(ual.getAs[String]("msg_type") == "MSG")
    assert(ual.getAs[String]("origin") == "BOS") // "KBOS ..." → "BOS"
    assert(ual.getAs[String]("destination") == "SFO")
    assert(ual.getAs[Long]("alt") == 8550L)
    val glf = out.where(col("callsign") === "GLF4").head()
    assert(glf.getAs[String]("msg_type") == "MLAT")
    assert(glf.getAs[String]("origin") == null) // non-K description → null
    assert(glf.getAs[String]("destination") == null)
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

/** METAR decode (sources.Metar) against the reference's envelope shapes:
  * NOAA dataserver CSV (metar/noaa.go:18 parseNOAA — preamble, header map,
  * empty-altim skip), the hourly archive rule (metar/metar.go Archive.Add:
  * latest report in the hour wins), and raw/ogimet record decoding
  * (metar/ogimet.go:20 OgimetPreParse, :47 OgimetParse). Payloads are
  * synthesized in the reference's documented formats.
  */
class MetarSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.sources.Metar

  // Format per noaa.go's embedded example: preamble lines, "N results",
  // CSV header, then rows. Blob B permutes the column order to prove the
  // decode is header-driven, not positional.
  private val noaaA =
    """No errors
      |No warnings
      |6 ms
      |data source=metars
      |4 results
      |raw_text,station_id,observation_time,latitude,longitude,altim_in_hg,metar_type
      |KSFO 051756Z 28014KT 10SM FEW020 16/08 A3004 RMK AO2,KSFO,2024-01-05T17:56:00Z,37.62,-122.37,30.041338,METAR
      |KSFO 051656Z 28012KT 10SM FEW020 15/08 A3001 RMK AO2,KSFO,2024-01-05T16:56:00Z,37.62,-122.37,30.008858,METAR
      |KSFO 051638Z 28010KT 10SM SCT018 15/08 A2998 RMK AO2,KSFO,2024-01-05T16:38:00Z,37.62,-122.37,29.979,SPECI
      |KSJC 051753Z 30008KT 10SM CLR 17/07,KSJC,2024-01-05T17:53:00Z,37.36,-121.93,,METAR
      |""".stripMargin
  private val noaaB =
    """No errors
      |2 ms
      |data source=metars
      |1 results
      |station_id,observation_time,altim_in_hg,raw_text
      |KOAK,2024-01-05T17:53:00Z,29.920,KOAK 051753Z 29010KT 10SM CLR 16/07 A2992
      |""".stripMargin

  test("NOAA CSV envelope: preamble skip, header-driven columns, altim filter") {
    val blobs = Seq((1L, noaaA), (2L, noaaB)).toDF("feed_id", "payload")
    val reports = Metar.parseNoaaCsv(blobs, "feed_id", "payload")
    val rows = reports.orderBy("observation_time", "station_id")
      .select("station_id", "observation_time", "altim_in_hg").collect()
    // KSJC's empty altim_in_hg row is skipped (reference behavior)
    assert(rows.length === 4)
    assert(rows.map(_.getString(0)).toSeq === Seq("KSFO", "KSFO", "KOAK", "KSFO"))
    assert(rows.last.getDouble(2) === 30.041338)
    // blob B decoded despite permuted columns
    assert(rows.count(_.getString(0) == "KOAK") === 1)
  }

  test("hourly archive keeps the latest report per (station, day, hour)") {
    val blobs = Seq((1L, noaaA)).toDF("feed_id", "payload")
    val arch = Metar.archiveHourly(Metar.parseNoaaCsv(blobs, "feed_id", "payload"))
    val slots = arch.orderBy("hour")
      .select("station_id", "hour", "altim_in_hg").collect()
    assert(slots.length === 2) // hours 16 and 17 for KSFO
    // hour 16 has 16:38 SPECI and 16:56 METAR: 16:56 (later) wins
    assert(slots.head.getInt(1) === 16)
    assert(slots.head.getDouble(2) === 30.008858)
  }

  test("ogimet pre-parse glues continuations, strips comments; parseRaw decodes") {
    val blob =
      """# METAR archive
        |
        |201601070156 METAR KSFO 070156Z 16006KT 10SM -RA FEW019 SCT027 BKN049=
        |201601070256 METAR KSFO 070256Z 17007KT 8SM
        | -RA SCT027 BKN049 A2994=
        |# trailing comment
        |201601070356 METAR KSFO 070356Z
        |""".stripMargin
    val recs = Seq(blob).toDF("payload")
      .select(explode(Metar.ogimetPreParse(col("payload"))).as("raw"))
    // third record never terminates with '=' → dropped, like the reference
    assert(recs.count() === 2)
    val parsed = Metar.parseRaw(recs, col("raw"))
      .orderBy("metar_ts")
      .select("metar_station", "metar_day", "metar_hour", "metar_min",
        "metar_inhg", "metar_ts").collect()
    assert(parsed.map(_.getString(0)).toSeq === Seq("KSFO", "KSFO"))
    assert(parsed.head.getInt(1) === 7 && parsed.head.getInt(2) === 1
      && parsed.head.getInt(3) === 56)
    assert(parsed.head.isNullAt(4)) // first record carries no A-group
    assert(parsed.last.getDouble(4) === 29.94)
    assert(parsed.head.getTimestamp(5).toInstant.toString === "2016-01-07T01:56:00Z")
  }

  test("decoders survive CRLF payloads, envelope drift, and corrupt prefixes") {
    // CRLF: trailing \r must not defeat the '=' terminator or the
    // "N results" preamble anchor (the Go reference's bufio strips \r)
    val crlfNoaa = noaaA.replace("\n", "\r\n")
    val crlfReports = Metar.parseNoaaCsv(
      Seq((1L, crlfNoaa)).toDF("feed_id", "payload"), "feed_id", "payload")
    assert(crlfReports.count() === 3)
    val crlfOgimet = "201601070156 METAR KSFO 070156Z A3004=\r\n".*(2)
    val recs = Seq(crlfOgimet).toDF("payload")
      .select(explode(Metar.ogimetPreParse(col("payload"))).as("raw"))
    assert(recs.count() === 2)

    // envelope drift: a header missing altim_in_hg decodes to zero rows,
    // not an ANSI element_at(0) error; short/garbled data lines drop
    val drifted = noaaA.replace("altim_in_hg", "altim_renamed")
    assert(Metar.parseNoaaCsv(
      Seq((1L, drifted)).toDF("feed_id", "payload"), "feed_id", "payload")
      .count() === 0)
    val garbled = noaaA + "too,short\nKXXX 000000Z,KXXX,not-a-time,0,0,bad-altim,METAR\n"
    assert(Metar.parseNoaaCsv(
      Seq((1L, garbled)).toDF("feed_id", "payload"), "feed_id", "payload")
      .count() === 3) // the two poison lines drop, valid rows survive

    // a 12-digit prefix that isn't a real datetime nulls metar_ts (ANSI
    // would otherwise fail the batch in to_timestamp)
    val badPfx = Metar.parseRaw(
      Seq("201613070156 METAR KSFO 070156Z A3004").toDF("raw"), col("raw"))
    assert(badPfx.where(col("metar_ts").isNotNull).count() === 0)
    assert(badPfx.head().getAs[String]("metar_station") === "KSFO")
  }

  test("parseRaw tolerates junk rows with nulls, never errors") {
    val junk = Seq("-.-.-.-.", "", "totally unrelated text").toDF("raw")
    val parsed = Metar.parseRaw(junk, col("raw"))
    assert(parsed.count() === 3)
    assert(parsed.where(col("metar_station").isNotNull).count() === 0)
    assert(parsed.where(col("metar_inhg").isNotNull).count() === 0)
  }
}

/** Report renderer parity (report/report.go AddRow text+HTML surfaces,
  * listmatches.go header layout, report.go:217 MetadataTable sort order).
  */
class RenderSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.sources.Render

  test("text table renders q_geo_intersections with uppercased header layout") {
    val matches = Queries.queries("q_geo_intersections")(spark, sfDir)
    val txt = Render.textTable(matches, limit = 10)
    val lines = txt.split("\n")
    // header row is the uppercased column list, like ListReporterHeaders
    assert(lines.head.split("\\s+").toSeq === matches.columns.toSeq.map(_.toUpperCase))
    assert(lines.length === math.min(10, matches.count()).toInt + 1)
    // fixed-width: every row's cells start at the same offsets as the header
    val hdrStarts = matches.columns.map(c => lines.head.indexOf(c.toUpperCase))
    assert(hdrStarts.forall(_ >= 0))
  }

  test("HTML table escapes cells; metadata table sorts by key") {
    val df = Seq((1L, "<b>bold</b> & co")).toDF("id", "payload")
    val html = Render.htmlTable(df)
    assert(html.contains("<th>PAYLOAD</th>"))
    assert(html.contains("<td>&lt;b&gt;bold&lt;/b&gt; &amp; co</td>"))
    assert(!html.contains("<b>bold</b>"))

    val counters = Seq(("[B] Eliminated", 3L), ("[A] PreProcessed", 150L))
      .toDF("key", "n")
    assert(Render.metadataTable(counters) ===
      Seq(("[A] PreProcessed", "150"), ("[B] Eliminated", "3")))
  }

  test("Viz.segments projects tracks into page space like basegrid U/V") {
    import graft.operators.Viz
    import org.apache.spark.sql.functions.col
    val g = Viz.Grid(offU = 10.0, offV = 20.0, w = 100.0, h = 50.0,
      minX = 0.0, maxX = 10.0, minY = 0.0, maxY = 100.0)
    // one track of three points; the middle->last leg exits maxY
    val df = Seq(
      (1L, 1L, 101L, 0.0, 0.0), (1L, 2L, 102L, 5.0, 50.0),
      (1L, 3L, 103L, 10.0, 150.0),
      (2L, 1L, 201L, 2.0, 20.0), (2L, 2L, 202L, 4.0, 40.0)
    ).toDF("user_id", "ts", "event_id", "x", "y")
    val segs = Viz.segments(df, "user_id", "ts", "event_id",
        col("x"), col("y"), g, bandSize = 20.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(segs.size === 3) // two legs for user 1, one for user 2
    val s1 = segs((1L, 1L)) // (0,0) -> (5,50)
    assert(s1.getAs[Double]("u1") === 10.0)           // x=0 -> left edge
    assert(s1.getAs[Double]("v1") === 70.0)           // y=0 -> bottom (offV + h)
    assert(s1.getAs[Double]("u2") === 60.0)           // x=5 -> mid
    assert(s1.getAs[Double]("v2") === 45.0)           // y=50 -> mid
    assert(s1.getAs[Int]("band") === 2)               // floor(50/20)
    assert(!s1.getAs[Boolean]("oob"))
    val s2 = segs((1L, 2L)) // second endpoint y=150 > maxY
    assert(s2.getAs[Boolean]("oob"))
    // InvertX mirrors the distance axis (descent grids read toward anchor)
    val inv = Viz.segments(df.where(col("user_id") === 2L), "user_id", "ts",
        "event_id", col("x"), col("y"), g.copy(invertX = true), 20.0)
      .collect().head
    assert(inv.getAs[Double]("u1") === 10.0 + (1.0 - 0.2) * 100.0)
  }

  test("descentSvg renders frame, gridlines, in-bounds segments, caption, key") {
    import graft.operators.Viz
    import org.apache.spark.sql.functions.col
    val g = Viz.Grid(offU = 22.0, offV = 35.0, w = 170.0, h = 100.0,
      minX = 0.0, maxX = 80.0, minY = 0.0, maxY = 100.0)
    val segs = Queries.queries("q_descent_grid")(spark, sfDir)
    val inBounds = segs.where(col("oob").cast("int") === 0).count()
    val svg = Render.descentSvg(segs, g, caption = "descent & profile")
    assert(svg.startsWith("<svg "))
    assert(svg.contains("<rect x=\"22.00\" y=\"35.00\" width=\"170.00\""))
    // 9 vertical gridlines (0..80 step 10) + 6 horizontal (0..100 step 20)
    assert(svg.split("stroke=\"#ccc\"").length - 1 === 9 + 6)
    // one <line> per in-bounds segment plus the 15 gridlines
    assert(svg.split("<line ").length - 1 === inBounds + 15)
    assert(svg.contains("descent &amp; profile")) // caption escaped
    for (c <- Render.BandPalette.take(3)) assert(svg.contains(c))
  }

  test("descentPdf emits a structurally valid one-page vector PDF") {
    import graft.operators.Viz
    import org.apache.spark.sql.functions.col
    val g = Viz.Grid(offU = 22.0, offV = 35.0, w = 170.0, h = 100.0,
      minX = 0.0, maxX = 80.0, minY = 0.0, maxY = 100.0)
    val segs = Queries.queries("q_descent_grid")(spark, sfDir)
    val inBounds = segs.where(col("oob").cast("int") === 0).count()
    val bytes = Render.descentPdf(segs, g, caption = "descent (test)")
    val pdf = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)

    assert(pdf.startsWith("%PDF-1.4\n") && pdf.endsWith("%%EOF\n"))
    // every xref offset points at its "N 0 obj" header
    val xref = pdf.substring(pdf.indexOf("xref\n"))
    val offsets = xref.linesIterator.drop(3).take(5)
      .map(_.split(" ")(0).toInt).toSeq
    offsets.zipWithIndex.foreach { case (off, i) =>
      assert(pdf.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} offset")
    }
    // startxref points at the xref table
    val sx = pdf.substring(pdf.indexOf("startxref\n") + 10).trim
      .linesIterator.next().toInt
    assert(pdf.startsWith("xref", sx))
    // declared stream length matches the actual stream bytes
    val lenDecl = """/Length (\d+)""".r.findFirstMatchIn(pdf).get.group(1).toInt
    val streamBody = pdf.substring(pdf.indexOf("stream\n") + 7,
      pdf.indexOf("endstream"))
    assert(streamBody.length === lenDecl)
    // one m..l S op per in-bounds segment + 15 gridlines
    assert(streamBody.split(" m ").length - 1 === inBounds + 15)
    // caption text and the Helvetica resource are present
    assert(streamBody.contains("(descent \\(test\\)) Tj"))
    assert(pdf.contains("/BaseFont /Helvetica"))
  }
}

/** Additive schema evolution on the parquet layout — the long-lived-table
  * reality a 100 TB store accrues across producer versions.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SparkFixture {

  test("schema evolution: widened appends merge, old rows null-fill, pruning intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // v1 writer: two columns; v2 writer appends a third (the additive
    // evolution a long-lived 100 TB table accrues across producers)
    Seq((1L, "a")).toDF("id", "val1").write.mode("append").parquet(dir)
    Seq((2L, "b", 9L)).toDF("id", "val1", "val2").write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "val1", "val2"))
    val rows = merged.select("id", "val1", "val2")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(9L))))

    // evolution must not cost pruning: a 1-column projection still reads
    // a 1-column schema at the scan
    val formatted = merged.select("id").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("ReadSchema: struct<id:bigint>"), formatted)
  }
}
