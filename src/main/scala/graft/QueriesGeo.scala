package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Group C — spatial restrictors + analysis reports + parsing
  * (SURVEY §2 items 21–34). The 2-D position of an event is
  * (x, y) = (value, props.k): `value` plays latitude/altitude,
  * `props.k` (extracted with a regex both engines share) plays longitude.
  */
object QueriesGeo {

  // Shared coordinate extraction. regexp-based (not JSON) so the DuckDB
  // oracle needs no JSON extension: props is always '{"k": <int>}'.
  private val xCol: Column = col("value")
  private def yCol: Column =
    regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int")
  private val ySql = """CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)"""

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // ---------------------------------------------------------------------------

  /** §2.21 Box restrictor + "altitude band" (event_type) — count + ids. */
  private def qGeoBox(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .where(Geo.inBox(xCol, yCol, 20.0, 60.0, 10.0, 50.0) &&
        col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("value"), yCol.as("k"))

  private val oGeoBox = s"""
    SELECT event_id, user_id, value, $ySql AS k
    FROM events
    WHERE value >= 20.0 AND value <= 60.0
      AND $ySql >= 10 AND $ySql <= 50
      AND event_type <> 'error'"""

  /** §2.22 Convex polygon restrictor via half-plane conjunction. */
  private val polygon = Seq((10.0, 10.0), (80.0, 20.0), (70.0, 80.0), (20.0, 70.0))

  private def qGeoPolygon(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .where(Geo.inConvexPolygon(xCol, yCol.cast("double"), polygon))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_inside"), round(sum("value"), 2).as("value_sum"))

  private val oGeoPolygon = {
    val edges = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.length)
      s"(($x2 - $x1) * (CAST($ySql AS DOUBLE) - $y1) - ($y2 - $y1) * (value - $x1)) >= 0.0"
    }.mkString("\n      AND ")
    s"""
    SELECT event_type, count(*) AS n_inside, round(sum(value), 2) AS value_sum
    FROM events
    WHERE $edges
    GROUP BY event_type"""
  }

  /** §2.23 Closest approach to refpoint (50, 50) per user. */
  private def qClosestApproach(s: SparkSession, dir: String): DataFrame =
    Geo.closestTo(ev(s, dir), "user_id", "event_id",
        Geo.distSq(xCol, yCol.cast("double"), 50.0, 50.0))
      .select(col("user_id"), col("event_id"), round(col("dist_sq"), 4).as("dist_sq"))

  private val oClosestApproach = s"""
    SELECT user_id, event_id, round(d2, 4) AS dist_sq FROM (
      SELECT user_id, event_id,
             (value - 50.0) * (value - 50.0)
               + (CAST($ySql AS DOUBLE) - 50.0) * (CAST($ySql AS DOUBLE) - 50.0) AS d2,
             row_number() OVER (PARTITION BY user_id ORDER BY
               (value - 50.0) * (value - 50.0)
               + (CAST($ySql AS DOUBLE) - 50.0) * (CAST($ySql AS DOUBLE) - 50.0),
               event_id) AS rn
      FROM events) t
    WHERE rn = 1"""

  /** §2.24 Vertical-plane crossing: adjacent events straddling x = 40. */
  private def qLineCrossing(s: SparkSession, dir: String): DataFrame =
    Geo.lineCrossings(ev(s, dir), "user_id", "ts", "event_id", xCol, 40.0)
      .select(col("user_id"), col("event_id"), col("_px").as("x_prev"),
        col("_x").as("x_cur"))

  private val oLineCrossing = """
    SELECT user_id, event_id, x_prev, x_cur FROM (
      SELECT user_id, event_id, value AS x_cur,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x_prev
      FROM events) t
    WHERE x_prev IS NOT NULL AND (x_cur - 40.0) * (x_prev - 40.0) < 0.0"""

  /** §2.25 Waypoint matching: snap-box hit against a literal waypoint dim,
    * first hit per (user, waypoint). Waypoints dim is broadcast.
    */
  private val waypoints = Seq(
    ("ALPHA", 25.0, 25.0, 5.0), ("BRAVO", 50.0, 50.0, 5.0),
    ("CHARLIE", 75.0, 75.0, 5.0), ("DELTA", 40.0, 80.0, 5.0))

  private def qWaypointMatch(s: SparkSession, dir: String): DataFrame = {
    val wpDf = s.createDataFrame(waypoints).toDF("name", "wx", "wy", "snap")
    Geo.waypointMatch(ev(s, dir), "user_id", "ts", xCol, yCol.cast("double"), wpDf)
  }

  private val oWaypointMatch = {
    val vals = waypoints.map { case (n, x, y, sn) => s"('$n', $x, $y, $sn)" }.mkString(", ")
    s"""
    SELECT user_id, name, epoch_us(min(ts)) AS first_us
    FROM events CROSS JOIN (VALUES $vals) AS w(name, wx, wy, snap)
    WHERE abs(value - wx) <= snap AND abs(CAST($ySql AS DOUBLE) - wy) <= snap
    GROUP BY user_id, name"""
  }

  /** §2.26 Restrictor-set combination (All/Any/Not logic,
    * georestrictorset.go:17): (box-A OR polygon-B) AND NOT box-C.
    */
  private def qGeorestrictorSet(s: SparkSession, dir: String): DataFrame = {
    val y = yCol.cast("double")
    val pred = (Geo.inBox(xCol, y, 20.0, 60.0, 10.0, 50.0) ||
      Geo.inConvexPolygon(xCol, y, polygon)) &&
      !Geo.inBox(xCol, y, 30.0, 40.0, 30.0, 40.0)
    ev(s, dir).where(pred)
      .groupBy("user_id").agg(count(lit(1)).as("n_match"))
  }

  private val oGeorestrictorSet = {
    val edges = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.length)
      s"(($x2 - $x1) * (CAST($ySql AS DOUBLE) - $y1) - ($y2 - $y1) * (value - $x1)) >= 0.0"
    }.mkString(" AND ")
    s"""
    SELECT user_id, count(*) AS n_match
    FROM events
    WHERE ((value >= 20.0 AND value <= 60.0 AND $ySql >= 10.0 AND $ySql <= 50.0)
           OR ($edges))
      AND NOT (value >= 30.0 AND value <= 40.0 AND $ySql >= 30.0 AND $ySql <= 40.0)
    GROUP BY user_id"""
  }

  // ---------------------------------------------------------------------------
  // Analysis reports (SURVEY §2 items 27–31)
  // ---------------------------------------------------------------------------

  /** §2.27 Altitude-band histogram (AltitudeBandsReporter): value bands of
    * width 25 per event_type.
    */
  private def qAltBands(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy((floor(col("value") / 25.0) * 25).cast("long").as("band"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  private val oAltBands = """
    SELECT CAST(floor(value / 25.0) * 25 AS BIGINT) AS band, event_type,
           count(*) AS n_events
    FROM events GROUP BY 1, 2"""

  /** §2.29 Train clustering (analysis/trains.go): 30-min buckets where >= 8
    * distinct users were active — "trains" of traffic.
    */
  private def qTrains(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(expr("(ts div 1800000000000) * 1800").as("bucket_s"))
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .where(col("n_users") >= 8)

  private val oTrains = """
    SELECT (epoch_ns(ts) // 1800000000000) * 1800 AS bucket_s,
           count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY 1
    HAVING count(DISTINCT user_id) >= 8"""

  /** §2.30 Approach signature (analysis/approachsignature.go): per user,
    * value quantized to bands of 10 at fixed positions along the series
    * (10th, 20th, 30th event), concatenated to a signature string.
    */
  private def qApproachSignature(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn").isin(10, 20, 30))
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"),
          (floor(col("value") / 10.0) * 10).cast("long").as("band")))),
          x => x.getField("band").cast("string")), "-").as("signature"))
  }

  private val oApproachSignature = """
    SELECT user_id,
           string_agg(CAST(CAST(floor(value / 10.0) * 10 AS BIGINT) AS VARCHAR),
                      '-' ORDER BY rn) AS signature
    FROM (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn IN (10, 20, 30)
    GROUP BY user_id"""

  /** §2.31 Histogram stats (report.go MetadataTable / histogram.Stats):
    * mean / stddev / p50 / p90 per event_type.
    */
  private def qValueStats(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 4).as("mean"),
        round(stddev_samp("value"), 4).as("sd"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))

  private val oValueStats = """
    SELECT event_type, count(*) AS n,
           round(avg(value), 4) AS mean,
           round(stddev_samp(value), 4) AS sd,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type"""

  // ---------------------------------------------------------------------------
  // Identity / parsing (SURVEY §2 items 32–34)
  // ---------------------------------------------------------------------------

  /** §2.32 Callsign classification (callsign.go): regex classes over
    * synthesized callsign strings (deterministic from data): registration
    * (N-prefix), ICAO flight number (3 letters + digits), bare number.
    */
  private def qCallsignParse(s: SparkSession, dir: String): DataFrame = {
    val cs = upper(concat(
      substring(col("event_type"), 1, 3),
      when(col("user_id") % 3 === 0, concat(lit("N"), col("user_id").cast("string")))
        .otherwise(col("user_id").cast("string"))))
    ev(s, dir)
      .withColumn("callsign", cs)
      .withColumn("class",
        when(col("callsign").rlike("^[A-Z]{3}N[0-9]+$"), "registration")
          .when(col("callsign").rlike("^[A-Z]{3}[0-9]+$"), "icao_flight")
          .otherwise("other"))
      .groupBy("class").agg(count(lit(1)).as("n"),
        countDistinct("callsign").as("n_distinct"))
  }

  private val oCallsignParse = """
    SELECT class, count(*) AS n, count(DISTINCT callsign) AS n_distinct
    FROM (
      SELECT CASE
               WHEN regexp_matches(callsign, '^[A-Z]{3}N[0-9]+$') THEN 'registration'
               WHEN regexp_matches(callsign, '^[A-Z]{3}[0-9]+$') THEN 'icao_flight'
               ELSE 'other' END AS class, callsign
      FROM (
        SELECT upper(substr(event_type, 1, 3) ||
                     CASE WHEN user_id % 3 = 0 THEN 'N' || CAST(user_id AS VARCHAR)
                          ELSE CAST(user_id AS VARCHAR) END) AS callsign
        FROM events) t1) t2
    GROUP BY class"""

  /** §2.33 IdSpec parsing (idspec.go: "ident@epoch"): build composite ids,
    * parse them back, filter by the embedded epoch.
    */
  private def qIdspecParse(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("idspec",
        concat(col("event_type"), lit("@"), expr("ts div 1000000000")))
      .withColumn("ident", split(col("idspec"), "@").getItem(0))
      .withColumn("epoch_s", split(col("idspec"), "@").getItem(1).cast("long"))
      .where(col("epoch_s") % 60 === 0)
      .select("event_id", "idspec", "ident", "epoch_s")

  private val oIdspecParse = """
    SELECT event_id, idspec,
           string_split(idspec, '@')[1] AS ident,
           CAST(string_split(idspec, '@')[2] AS BIGINT) AS epoch_s
    FROM (
      SELECT event_id, event_type || '@' ||
             CAST(epoch_ns(ts) // 1000000000 AS VARCHAR) AS idspec
      FROM events) t
    WHERE CAST(string_split(idspec, '@')[2] AS BIGINT) % 60 = 0"""

  /** §2.34 Identity merge (flight.go MergeIdentityFrom): first-non-null
    * coalesce of per-key attributes from two sources (customer enriched
    * with order-derived attributes).
    */
  private def qIdentityMerge(s: SparkSession, dir: String): DataFrame = {
    val orderAgg = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        max("o_orderpriority").as("best_priority"))
    Tables.customer(s, dir)
      .join(orderAgg, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("best_priority"), lit("NONE")).as("best_priority"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
  }

  private val oIdentityMerge = """
    SELECT c_custkey,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(best_priority, 'NONE') AS best_priority,
           coalesce(c_mktsegment, 'UNKNOWN') AS segment
    FROM customer LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders, max(o_orderpriority) AS best_priority
      FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey"""

  /** §2.25b Flown-procedure classification (flightpath.go
    * DetermineFlownProcedure / condensed.go Procedure): the ordered waypoint
    * sequence per series, classified against known procedure patterns.
    */
  private def qProcedure(s: SparkSession, dir: String): DataFrame = {
    val wpDf = s.createDataFrame(waypoints).toDF("name", "wx", "wy", "snap")
    val firstHits = Geo.waypointMatch(ev(s, dir), "user_id", "ts",
      xCol, yCol.cast("double"), wpDf)
    firstHits
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("first_us"), col("name")))),
          x => x.getField("name")), "-").as("path"))
      .withColumn("procedure",
        when(col("path").startsWith("ALPHA-BRAVO"), "SERFR_LIKE")
          .when(col("path").contains("CHARLIE"), "BRIXX_LIKE")
          .otherwise("OTHER"))
  }

  private val oProcedure = {
    val vals = waypoints.map { case (n, x, y, sn) => s"('$n', $x, $y, $sn)" }.mkString(", ")
    s"""
    SELECT user_id, path,
           CASE WHEN path LIKE 'ALPHA-BRAVO%' THEN 'SERFR_LIKE'
                WHEN path LIKE '%CHARLIE%' THEN 'BRIXX_LIKE'
                ELSE 'OTHER' END AS procedure
    FROM (
      SELECT user_id, string_agg(name, '-' ORDER BY first_us, name) AS path
      FROM (
        SELECT user_id, name, epoch_us(min(ts)) AS first_us
        FROM events CROSS JOIN (VALUES $vals) AS w(name, wx, wy, snap)
        WHERE abs(value - wx) <= snap AND abs(CAST($ySql AS DOUBLE) - wy) <= snap
        GROUP BY user_id, name) h
      GROUP BY user_id) t"""
  }

  /** §2.31b METAR day-grid (metar/dayreport.go: one row per UTC day with
    * 24 hourly slots): day x hour matrix of hourly mean value.
    */
  private def qMetarDaygrid(s: SparkSession, dir: String): DataFrame = {
    val day = expr("(ts div 86400000000000) * 86400").as("day_s")
    val hour = expr("(ts div 3600000000000) % 24").as("hour")
    ev(s, dir)
      .groupBy(day, hour)
      .agg(round(avg("value"), 4).as("mean_value"), count(lit(1)).as("n"))
  }

  private val oMetarDaygrid = """
    SELECT (epoch_ns(ts) // 86400000000000) * 86400 AS day_s,
           (epoch_ns(ts) // 3600000000000) % 24 AS hour,
           round(avg(value), 4) AS mean_value, count(*) AS n
    FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------------------

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q_geo_box", qGeoBox, Some(oGeoBox)),
    GraftQuery("q_geo_polygon", qGeoPolygon, Some(oGeoPolygon), headline = true),
    GraftQuery("q_closest_approach", qClosestApproach, Some(oClosestApproach)),
    GraftQuery("q_line_crossing", qLineCrossing, Some(oLineCrossing)),
    GraftQuery("q_waypoint_match", qWaypointMatch, Some(oWaypointMatch), headline = true),
    GraftQuery("q_procedure", qProcedure, Some(oProcedure)),
    GraftQuery("q_metar_daygrid", qMetarDaygrid, Some(oMetarDaygrid)),
    GraftQuery("q_georestrictor_set", qGeorestrictorSet, Some(oGeorestrictorSet)),
    GraftQuery("q_alt_bands", qAltBands, Some(oAltBands)),
    GraftQuery("q_trains", qTrains, Some(oTrains)),
    GraftQuery("q_approach_signature", qApproachSignature, Some(oApproachSignature)),
    GraftQuery("q_value_stats", qValueStats, Some(oValueStats)),
    GraftQuery("q_callsign_parse", qCallsignParse, Some(oCallsignParse)),
    GraftQuery("q_idspec_parse", qIdspecParse, Some(oIdspecParse)),
    GraftQuery("q_identity_merge", qIdentityMerge, Some(oIdentityMerge))
  )
}
