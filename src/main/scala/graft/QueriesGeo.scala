package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Geo, Layout}

/** Group C — spatial restrictors + analysis reports + parsing
  * (SURVEY §2 items 21–34). The 2-D position of an event is
  * (x, y) = (value, props.k): `value` plays latitude/altitude,
  * `props.k` (extracted with a regex both engines share) plays longitude.
  */
object QueriesGeo {

  // Shared coordinate extraction. props is always '{"k": <int>}' so a
  // positional substring beats regexp/JSON parsing by ~20x per row at scale
  // (measured via tools.ScaleProbe) and needs no DuckDB JSON extension;
  // substr is 1-based in both engines.
  private val xCol: Column = col("value")
  private def yCol: Column =
    expr("CAST(substr(props, 7, length(props) - 7) AS INT)")
  private val ySql = "CAST(substr(props, 7, length(props) - 7) AS INT)"

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

  /** §2.30c Straight-line displacement histogram
    * (analysis/straightlinedisplacement.go): for every series that passes
    * waypoint ALPHA and then BRAVO, clip its points to the [first-ALPHA,
    * first-BRAVO] passage window, measure each point's lateral displacement
    * from the ALPHA→BRAVO reference line, and histogram the displacements
    * (bucket width 2.5, 20 buckets — the reference's 0..1000 m / 20-bucket
    * histogram.Histogram). The waypoint-passage span table is tiny →
    * broadcast; the per-point work is pure codegen'd arithmetic.
    */
  private def qStraightline(s: SparkSession, dir: String): DataFrame = {
    val wpDf = s.createDataFrame(waypoints).toDF("name", "wx", "wy", "snap")
    val hits = Geo.waypointMatch(ev(s, dir), "user_id", "ts", xCol,
      yCol.cast("double"), wpDf)
    val span = hits.where(col("name") === "ALPHA")
      .select(col("user_id"), col("first_us").as("t_a"))
      .join(hits.where(col("name") === "BRAVO")
        .select(col("user_id"), col("first_us").as("t_b")), "user_id")
      .where(col("t_a") < col("t_b"))
    val disp = Geo.lineDisplacement(xCol, yCol.cast("double"), 25.0, 25.0, 50.0, 50.0)
    ev(s, dir).join(broadcast(span), "user_id")
      .where(expr("ts div 1000") >= col("t_a") && expr("ts div 1000") <= col("t_b"))
      .withColumn("bucket", floor(disp / 2.5).cast("long"))
      .where(col("bucket") < 20)
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n_points"))
  }

  private val oStraightline = {
    val vals = waypoints.map { case (n, x, y, sn) => s"('$n', $x, $y, $sn)" }.mkString(", ")
    val len = math.sqrt((50.0 - 25.0) * (50.0 - 25.0) + (50.0 - 25.0) * (50.0 - 25.0))
    val disp = s"abs(25.0 * (CAST($ySql AS DOUBLE) - 25.0) - 25.0 * (value - 25.0)) / $len"
    s"""
    WITH hits AS (
      SELECT user_id, name, epoch_us(min(ts)) AS first_us
      FROM events CROSS JOIN (VALUES $vals) AS w(name, wx, wy, snap)
      WHERE abs(value - wx) <= snap AND abs(CAST($ySql AS DOUBLE) - wy) <= snap
      GROUP BY user_id, name),
    span AS (
      SELECT a.user_id, a.first_us AS t_a, b.first_us AS t_b
      FROM hits a JOIN hits b ON a.user_id = b.user_id
      WHERE a.name = 'ALPHA' AND b.name = 'BRAVO' AND a.first_us < b.first_us)
    SELECT e.user_id, CAST(floor(($disp) / 2.5) AS BIGINT) AS bucket,
           count(*) AS n_points
    FROM events e JOIN span s ON e.user_id = s.user_id
    WHERE epoch_us(e.ts) >= s.t_a AND epoch_us(e.ts) <= s.t_b
      AND CAST(floor(($disp) / 2.5) AS BIGINT) < 20
    GROUP BY 1, 2"""
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

  /** §2.16b Historical airspace snapshot (fgae/airspace.go:47
    * LookupHistoricalAirspace + snapshot.go + trackpoint.go:199
    * InterpolateTo): every series' linearly interpolated state at instant T
    * from its bracketing points, keeping series whose bracket spans <= 1
    * day. Two rank windows (last point <= T, first point > T) + one join —
    * the scalable point-in-time reconstruction, no per-key lookups.
    */
  private def qAirspaceSnapshot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tNs = 1705320000L * 1000000000L // 2024-01-15 12:00:00 UTC
    val e = ev(s, dir)
    val wb = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val wa = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val before = e.where(col("ts") <= tNs)
      .withColumn("_rn", row_number().over(wb)).where(col("_rn") === 1)
      .select(col("user_id"), col("ts").as("t1"), col("value").as("v1"))
    val after = e.where(col("ts") > tNs)
      .withColumn("_rn", row_number().over(wa)).where(col("_rn") === 1)
      .select(col("user_id"), col("ts").as("t2"), col("value").as("v2"))
    before.join(after, "user_id")
      .where(col("t2") - col("t1") <= 86400000000000L)
      .withColumn("ratio",
        (lit(tNs) - col("t1")).cast("double") / (col("t2") - col("t1")).cast("double"))
      .select(col("user_id"),
        round(col("v1") + (col("v2") - col("v1")) * col("ratio"), 4).as("value_at_t"),
        expr("t1 div 1000").as("t1_us"), expr("t2 div 1000").as("t2_us"))
  }

  private val oAirspaceSnapshot = """
    WITH before AS (
      SELECT user_id, ts AS t1, value AS v1 FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-15 12:00:00') t WHERE rn = 1),
    after AS (
      SELECT user_id, ts AS t2, value AS v2 FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE ts > TIMESTAMP '2024-01-15 12:00:00') t WHERE rn = 1)
    SELECT b.user_id,
           round(v1 + (v2 - v1) *
             ((1705320000000000000 - epoch_ns(t1)) * 1.0
              / (epoch_ns(t2) - epoch_ns(t1))), 4) AS value_at_t,
           epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us
    FROM before b JOIN after a ON b.user_id = a.user_id
    WHERE epoch_ns(t2) - epoch_ns(t1) <= 86400000000000"""

  /** §2.5b Time-of-day restriction (report/options.go TimeOfDay;
    * report.go:153): only points whose hour-of-day falls in [7, 19),
    * counted per user per hour.
    */
  private def qTimeOfDay(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("hour", expr("(ts div 3600000000000) % 24"))
      .where(col("hour") >= 7 && col("hour") < 19)
      .groupBy("user_id", "hour")
      .agg(count(lit(1)).as("n_events"))

  private val oTimeOfDay = """
    SELECT user_id, (epoch_ns(ts) // 3600000000000) % 24 AS hour,
           count(*) AS n_events
    FROM events
    WHERE (epoch_ns(ts) // 3600000000000) % 24 BETWEEN 7 AND 18
    GROUP BY 1, 2"""

  /** §2.7b Recent-after-waypoint (fquery.go:89 QueryForRecentWaypoint):
    * for users that crossed waypoint BRAVO, their 3 most recent events at
    * or after the first crossing — waypoint join composed with the
    * recent-N window.
    */
  private def qRecentWaypoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val crossings = ev(s, dir)
      .where(abs(xCol - 50.0) <= 5.0 && abs(yCol.cast("double") - 50.0) <= 5.0)
      .groupBy("user_id").agg(min("ts").as("first_cross"))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    ev(s, dir)
      .join(crossings, "user_id")
      .where(col("ts") >= col("first_cross"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("user_id", "event_id", "event_type", "rk")
  }

  private val oRecentWaypoint = s"""
    WITH crossings AS (
      SELECT user_id, min(ts) AS first_cross
      FROM events
      WHERE abs(value - 50.0) <= 5.0 AND abs(CAST($ySql AS DOUBLE) - 50.0) <= 5.0
      GROUP BY user_id)
    SELECT user_id, event_id, event_type, rk FROM (
      SELECT e.user_id, e.event_id, e.event_type,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rk
      FROM events e JOIN crossings c
        ON e.user_id = c.user_id AND e.ts >= c.first_cross) t
    WHERE rk <= 3"""

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

  /** §2.32 Callsign classification + normalization (callsign.go, mirroring
    * callsign_test.go semantics): synthesized callsigns exercise zero
    * padding (lpad 4), letter suffixes (every 5th user), N-registrations
    * (every 3rd user) and junk.
    */
  private def qCallsignParse(s: SparkSession, dir: String): DataFrame = {
    val cs = when(col("user_id") % 3 === 0,
        concat(lit("N"), col("user_id").cast("string"), lit("QA")))
      .when(col("user_id") % 7 === 0, lit("-.-."))
      .otherwise(concat(
        upper(substring(col("event_type"), 1, 3)),
        lpad(col("user_id").cast("string"), 4, "0"),
        when(col("user_id") % 5 === 0, lit("R")).otherwise(lit(""))))
    ev(s, dir)
      .withColumn("callsign", cs)
      .withColumn("class", graft.functions.Identity.callsignClass(col("callsign")))
      .withColumn("norm", graft.functions.Identity.normalizeCallsign(col("callsign")))
      .groupBy("class").agg(count(lit(1)).as("n"),
        countDistinct("callsign").as("n_raw"),
        countDistinct("norm").as("n_norm"))
  }

  private val oCallsignParse = """
    SELECT class, count(*) AS n, count(DISTINCT callsign) AS n_raw,
           count(DISTINCT norm) AS n_norm
    FROM (
      SELECT callsign,
             CASE WHEN regexp_matches(callsign, '^N[0-9][0-9A-Z]*$') THEN 'registration'
                  WHEN regexp_matches(callsign, '^[A-Z]{3}[0-9]+[A-Z]?$') THEN 'icao_flight'
                  WHEN regexp_matches(callsign, '^[0-9]+$') THEN 'bare_number'
                  ELSE 'junk' END AS class,
             CASE WHEN regexp_matches(callsign, '^[A-Z]{3}[0-9]+[A-Z]?$')
                  THEN regexp_extract(callsign, '^([A-Z]{3})', 1) ||
                       CAST(CAST(regexp_extract(callsign, '([0-9]+)', 1) AS BIGINT) AS VARCHAR)
                  ELSE callsign END AS norm
      FROM (
        SELECT CASE WHEN user_id % 3 = 0 THEN 'N' || CAST(user_id AS VARCHAR) || 'QA'
                    WHEN user_id % 7 = 0 THEN '-.-.'
                    ELSE upper(substr(event_type, 1, 3)) ||
                         lpad(CAST(user_id AS VARCHAR), 4, '0') ||
                         CASE WHEN user_id % 5 = 0 THEN 'R' ELSE '' END
               END AS callsign
        FROM events) t1) t2
    GROUP BY class"""

  /** §2.33 IdSpec parsing (idspec.go: "ident@epoch"): build composite ids,
    * parse them back, filter by the embedded epoch.
    */
  private def qIdspecParse(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("idspec",
        graft.functions.Identity.idspec(col("event_type"), expr("ts div 1000000000")))
      .withColumn("ident", graft.functions.Identity.idspecIdent(col("idspec")))
      .withColumn("epoch_s", graft.functions.Identity.idspecEpoch(col("idspec")))
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

  /** §2.26b Restrictor intersection SPANS (intersectabletrack.go:168
    * SatisfiesRestrictor → TrackIntersection{Start,End,I,J}): not just
    * whether a series satisfies a restrictor but the contiguous entry→exit
    * segments inside it — gaps-and-islands over the inside flag, one
    * aggregation per (user, island). Entry/exit points, duration and point
    * count per span (trackintersection.go RowHTML fields).
    */
  private def qGeoIntersections(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inside = Geo.inBox(xCol, yCol.cast("double"), 20.0, 60.0, 10.0, 50.0)
    ev(s, dir)
      .withColumn("_in", when(inside, 1L).otherwise(0L))
      .withColumn("_grp", sum(lit(1L) - col("_in")).over(cum))
      .where(col("_in") === 1L)
      .groupBy("user_id", "_grp")
      .agg(
        min("event_id").as("entry_event"), max("event_id").as("exit_event"),
        count(lit(1)).as("n_points"),
        expr("(max(ts) div 1000) - (min(ts) div 1000)").as("duration_us"),
        round(min_by(col("value"), col("event_id")), 2).as("entry_value"),
        round(max_by(col("value"), col("event_id")), 2).as("exit_value"))
      .where(col("n_points") >= 2)
      .drop("_grp")
  }

  private val oGeoIntersections = s"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value >= 20.0 AND value <= 60.0
                   AND $ySql >= 10 AND $ySql <= 50 THEN 1 ELSE 0 END AS f
      FROM events),
    grouped AS (
      SELECT user_id, ts, event_id, value, f,
             sum(1 - f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged)
    SELECT user_id, min(event_id) AS entry_event, max(event_id) AS exit_event,
           count(*) AS n_points,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
           round(min_by(value, event_id), 2) AS entry_value,
           round(max_by(value, event_id), 2) AS exit_value
    FROM grouped WHERE f = 1
    GROUP BY user_id, grp
    HAVING count(*) >= 2"""

  /** §2.27b Class-B envelope violations (analysis/classb.go
    * ClassBForTrack): a floor value per distance band from the reference
    * point; a point violates when below the floor inside its band; report
    * each series' DEEPEST violation (max below_by), like the reference's
    * `deepest` accumulator.
    */
  private val classBEnvelope = Seq( // (dist_lo, dist_hi, floor)
    (10.0, 25.0, 15.0), (25.0, 40.0, 30.0), (40.0, 60.0, 45.0))

  private def qClassb(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val env = s.createDataFrame(classBEnvelope).toDF("d_lo", "d_hi", "floor")
    val dist = sqrt(Geo.distSq(xCol, yCol.cast("double"), 50.0, 50.0))
    val w = Window.partitionBy("user_id").orderBy(col("below_by").desc, col("event_id"))
    ev(s, dir)
      .withColumn("dist", dist)
      .join(broadcast(env), col("dist") >= col("d_lo") && col("dist") < col("d_hi"))
      .where(col("value") < col("floor"))
      .withColumn("below_by", round(col("floor") - col("value"), 2))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("event_id"), round(col("dist"), 4).as("dist"),
        col("floor"), col("below_by"))
  }

  private val oClassb = {
    val vals = classBEnvelope.map { case (a, b, f) => s"($a, $b, $f)" }.mkString(", ")
    s"""
    SELECT user_id, event_id, round(dist, 4) AS dist, "floor", below_by FROM (
      SELECT user_id, event_id, dist, "floor",
             round("floor" - value, 2) AS below_by,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY round("floor" - value, 2) DESC, event_id) AS rn
      FROM (
        SELECT user_id, event_id, value,
               sqrt((value - 50.0) * (value - 50.0)
                    + (CAST($ySql AS DOUBLE) - 50.0) * (CAST($ySql AS DOUBLE) - 50.0)) AS dist
        FROM events) e
      JOIN (VALUES $vals) AS env(d_lo, d_hi, "floor")
        ON dist >= d_lo AND dist < d_hi
      WHERE value < "floor") t
    WHERE rn = 1"""
  }

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

  /** §2.31c METAR raw-text decode (metar/noaa.go raw_text shape,
    * ogimet.go:47 OgimetParse prefix form): report strings are synthesized
    * deterministically from events columns — three envelope variants
    * (ogimet 12-digit prefix, bare SPECI, bare METAR), every 5th without an
    * altimeter group — then decoded with the REAL operator
    * (sources.Metar.parseRaw) and aggregated per station. DuckDB replays
    * the same synthesis and regex extraction, so the decode path is fully
    * hash-checked; the feed envelopes (NOAA CSV, ogimet line gluing) are
    * spec-tested in MetarSpec on the reference's own shapes.
    */
  private def qMetarParse(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      when(col("user_id") % 3 === 0, lit("201601070156 METAR "))
        .when(col("user_id") % 3 === 1, lit("SPECI "))
        .otherwise(lit("")),
      lit("K"), lpad((col("user_id") % 999).cast("string"), 3, "0"), lit(" "),
      lpad(expr("(ts div 86400000000000) % 27 + 1").cast("string"), 2, "0"),
      lpad(expr("(ts div 3600000000000) % 24").cast("string"), 2, "0"),
      lit("56Z 28011KT 10SM"),
      when(col("user_id") % 5 === 0, lit(""))
        .otherwise(concat(lit(" A"),
          lpad((lit(2880) + col("user_id") % 240).cast("string"), 4, "0"))),
      lit(" RMK AO2"))
    // NOT spread (r15): the qFeedParse single-split fix was A/B'd here
    // and measured WORSE (0.8 s -> 1.07 s) — the regexp decode is too
    // cheap for the added exchange to pay; the spread rule only wins
    // when the starved stage is parse-heavy (from_json/from_csv class)
    graft.sources.Metar.parseRaw(ev(s, dir).select(raw.as("raw")), col("raw"))
      .groupBy("metar_station")
      .agg(count(lit(1)).as("n"),
        count(col("metar_inhg")).as("n_altim"),
        round(avg("metar_inhg"), 4).as("avg_inhg"),
        min("metar_day").as("min_day"),
        max("metar_hour").as("max_hour"),
        count(col("metar_ts")).as("n_ogimet"))
  }

  private val oMetarParse = """
    WITH raw AS (
      SELECT (CASE WHEN user_id % 3 = 0 THEN '201601070156 METAR '
                   WHEN user_id % 3 = 1 THEN 'SPECI '
                   ELSE '' END)
             || 'K' || lpad(CAST(user_id % 999 AS VARCHAR), 3, '0') || ' '
             || lpad(CAST((epoch_ns(ts) // 86400000000000) % 27 + 1 AS VARCHAR), 2, '0')
             || lpad(CAST((epoch_ns(ts) // 3600000000000) % 24 AS VARCHAR), 2, '0')
             || '56Z 28011KT 10SM'
             || (CASE WHEN user_id % 5 = 0 THEN ''
                      ELSE ' A' || lpad(CAST(2880 + user_id % 240 AS VARCHAR), 4, '0') END)
             || ' RMK AO2' AS raw
      FROM events),
    parsed AS (
      SELECT nullif(regexp_extract(
               regexp_replace(regexp_replace(raw, '^[0-9]{12} ', ''),
                              '^(METAR|SPECI) ', ''),
               '^([A-Z][A-Z0-9]{3})[ =]', 1), '') AS station,
             nullif(regexp_extract(
               regexp_replace(regexp_replace(raw, '^[0-9]{12} ', ''),
                              '^(METAR|SPECI) ', ''),
               '\b([0-9]{6})Z\b', 1), '') AS dhm,
             nullif(regexp_extract(regexp_replace(raw, '^[0-9]{12} ', ''),
                                   '\bA([0-9]{4})\b', 1), '') AS alt4,
             nullif(regexp_extract(raw, '^([0-9]{12}) ', 1), '') AS pfx
      FROM raw)
    SELECT station AS metar_station, count(*) AS n,
           count(CAST(alt4 AS INT) / 100.0) AS n_altim,
           round(avg(CAST(alt4 AS INT) / 100.0), 4) AS avg_inhg,
           min(CAST(substr(dhm, 1, 2) AS INT)) AS min_day,
           max(CAST(substr(dhm, 3, 2) AS INT)) AS max_hour,
           count(strptime(pfx, '%Y%m%d%H%M')) AS n_ogimet
    FROM parsed GROUP BY 1"""

  /** §2.37b JSON feed decode DRIVER-GATED, ALL FOUR envelope families
    * (r13 three + the SWIM envelope in r14 — the r13 verdict's item 2;
    * the q_metar_parse synthesis precedent): deterministic per-row feed
    * envelopes are synthesized from events columns —
    * the fr24 compact array-of-arrays (TWO aircraft per envelope, so the
    * positional mixed-type explode is exercised), the ADS-B Exchange
    * acList (float-millis epoch, MLAT flag, KXXX→XXX extraction),
    * FlightXML GetHistoricalTrack (×100 ft altitudes, trusted-position
    * classes), and the SWIM `ns5:MessageCollection` envelope
    * (swim/swim.go Json2Flights) in BOTH documented shapes — `message`
    * as an ARRAY (multi-message) and as a BARE OBJECT (single-message),
    * alternating per row, so the coalesce-of-two-parses path and the
    * "lat lon" pos-string split are both inside the hash — decoded by
    * the REAL operators (sources.JsonFeed.parseFr24List/parseAexList/
    * parseFaTrack/parseFlights), with every 7th envelope replaced by
    * malformed JSON (the poison rule: the parsers must DROP it, never
    * fail). DuckDB replays the identical synthesis and re-parses through
    * its own JSON engine (json_valid + json_extract; the `ns5:`-prefixed
    * keys address portably via `$."ns5:key"` quoting — probed r14,
    * retiring the r13 spec-only adjudication). All synthesized numerics
    * are integers (exact in DOUBLE — the cross-engine float rule),
    * aggregates are integer casts; the SWIM positionTime decode is
    * checked as a non-null COUNT (both engines parse the same ISO
    * string), never a value compare. FlightInfoEx stays spec-tested
    * (JsonFeedSpec) — metadata-only, no point stream to aggregate.
    */
  private def qFeedParse(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.JsonFeed
    // spread the NARROW key base (24 B/row) across all cores BEFORE the
    // JSON build+parse — a small events parquet arrives as ONE split and
    // serialized the whole from_json stage onto a single task (r15
    // FeedProbe: 3.3 s single-task SWIM parse at sf0.1, cores idle). The
    // documentsSpread rule applied to events: shuffle keys, not payloads
    // (the JSON strings are built AFTER the exchange), so the exchange
    // stays ~per-row-constant at any scale while the parse parallelizes.
    // r16: gated on the input's split count — a many-split scan is
    // already wide and must not pay (or be coalesced by) the exchange.
    val base = Tables.spreadIfNarrow(s,
      ev(s, dir).select(col("user_id").as("u"),
        col("event_id").as("e"), expr("ts div 1000000000").as("sec")))
    def i(c: Column): Column = c.cast("string")
    val poison = col("e") % 7 === 0
    val bad = lit("{\"oops\":")
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
    val aexRaw = base.where(col("u") % 3 === 1).select(
      when(poison, bad).otherwise(concat(
        lit("{\"acList\":[{\"Icao\":\"A"), i(col("u") % 512),
        lit("\",\"Call\":\"CS"), i(col("u") % 50),
        lit("\",\"Reg\":\"N"), i(col("u") % 99),
        lit("\",\"Type\":\"B738\",\"OpIcao\":\"UAL\",\"Alt\":"),
        i((col("e") % 400) * 100),
        lit(",\"GAlt\":0,\"Spd\":"), i(col("u") % 600),
        lit(",\"Vsi\":64,\"Trak\":90,\"Lat\":"), i(col("u") % 90),
        lit(",\"Long\":"), i(col("e") % 180),
        lit(",\"PosTime\":"), i(col("sec") * 1000),
        lit(",\"Mlat\":"),
        when(col("u") % 2 === 0, lit("true")).otherwise(lit("false")),
        lit(",\"Gnd\":false,\"From\":\"KSFO San Francisco\"," +
          "\"To\":\"XORD Chicago\"}]}"))).as("raw"))
    val faRaw = base.where(col("u") % 3 === 2).select(
      when(poison, bad).otherwise(concat(
        lit("{\"GetHistoricalTrackResult\":{\"data\":[{\"altitude\":"),
        i(col("e") % 400),
        lit(",\"altitudeChange\":\"C\",\"altitudeStatus\":\"-\"," +
          "\"groundspeed\":"), i(col("u") % 600),
        lit(",\"latitude\":"), i(col("u") % 90),
        lit(",\"longitude\":"), i(col("e") % 180),
        lit(",\"timestamp\":"), i(col("sec")),
        lit(",\"updateType\":\""),
        when(col("u") % 4 === 0, lit("TA")).when(col("u") % 4 === 1, lit("TP"))
          .when(col("u") % 4 === 2, lit("A")).otherwise(lit("TZ")),
        lit("\"}]}}"))).as("raw"))
    def shaped(family: String, n: Column, lat: Column, alt: Column,
               flag: Column, src: DataFrame): DataFrame =
      src.agg(n.as("n"), lat.as("sum_lat"), alt.as("sum_alt"),
          flag.as("n_flag"))
        .select(lit(family).as("family"), col("n"), col("sum_lat"),
          col("sum_alt"), col("n_flag"))
    // SWIM flight fragment: every numeric integer-valued, pos packed as
    // the reference's "lat lon" single string (swim-types.go location.pos)
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
        when(col("u") % 2 === 0, // multi-message: array of two
          concat(lit("[{\"flight\":"), swimFlight(col("u"), col("e")),
            lit("},{\"flight\":"),
            swimFlight(col("u") + 1, col("e") + 11), lit("}]")))
          .otherwise( // single-message: bare object
            concat(lit("{\"flight\":"), swimFlight(col("u"), col("e")),
              lit("}"))),
        lit("}}"))).as("raw"))
    val fr = shaped("fr24", count(lit(1)), sum(col("lat")).cast("long"),
      sum(col("alt")).cast("long"), countDistinct(col("callsign")),
      JsonFeed.parseFr24List(frRaw, "raw"))
    val ax = shaped("aex", count(lit(1)), sum(col("lat")).cast("long"),
      sum(col("alt")), sum((col("msg_type") === "MLAT").cast("long")),
      JsonFeed.parseAexList(aexRaw, "raw"))
    val fa = shaped("fa", count(lit(1)), sum(col("lat")).cast("long"),
      sum(col("alt")), sum(col("trusted").cast("long")),
      JsonFeed.parseFaTrack(faRaw, "raw"))
    val sw = shaped("swim", count(lit(1)), sum(col("lat")).cast("long"),
      sum(col("alt")).cast("long"), count(col("pos_time")),
      JsonFeed.parseFlights(swimRaw, "raw"))
    fr.unionByName(ax).unionByName(fa).unionByName(sw)
  }

  private val oFeedParse = """
    WITH base AS (
      SELECT user_id AS u, event_id AS e,
             epoch_ns(ts) // 1000000000 AS sec
      FROM events),
    fr_raw AS (
      SELECT CASE WHEN e % 7 = 0 THEN '{"oops":'
        ELSE '{"full_count":2,"version":4,"aircraft":['
          || '["f' || e || '","IC' || (u % 512) || '",' || (u % 90) || ','
          || (e % 180) || ',90,' || ((e % 400) * 100) || ',' || (u % 600)
          || ',"7012","r","B738","N' || (u % 99) || '",' || sec
          || ',"SFO","LAX","FL1",0,64,"CS' || (u % 50) || '","-"],'
          || '["f' || (e + 11) || '","IC' || ((u + 1) % 512) || '",'
          || ((u + 1) % 90) || ',' || ((e + 11) % 180) || ',90,'
          || (((e + 11) % 400) * 100) || ',' || ((u + 1) % 600)
          || ',"7012","r","B738","N' || ((u + 1) % 99) || '",' || sec
          || ',"SFO","LAX","FL1",0,64,"CS' || ((u + 1) % 50) || '","-"]]}'
        END AS raw
      FROM base WHERE u % 3 = 0),
    fr_pt AS (
      SELECT CAST(json_extract_string(raw, '$.aircraft[' || ix || '][2]')
                  AS DOUBLE) AS lat,
             CAST(json_extract_string(raw, '$.aircraft[' || ix || '][5]')
                  AS DOUBLE) AS alt,
             json_extract_string(raw, '$.aircraft[' || ix || '][17]')
               AS callsign
      FROM fr_raw CROSS JOIN (VALUES (0), (1)) AS t(ix)
      WHERE json_valid(raw)),
    fr_agg AS (
      SELECT 'fr24' AS family, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lat) AS BIGINT) AS sum_lat,
             CAST(sum(alt) AS BIGINT) AS sum_alt,
             CAST(count(DISTINCT callsign) AS BIGINT) AS n_flag
      FROM fr_pt WHERE lat IS NOT NULL),
    aex_raw AS (
      SELECT CASE WHEN e % 7 = 0 THEN '{"oops":'
        ELSE '{"acList":[{"Icao":"A' || (u % 512) || '","Call":"CS'
          || (u % 50) || '","Reg":"N' || (u % 99)
          || '","Type":"B738","OpIcao":"UAL","Alt":' || ((e % 400) * 100)
          || ',"GAlt":0,"Spd":' || (u % 600)
          || ',"Vsi":64,"Trak":90,"Lat":' || (u % 90)
          || ',"Long":' || (e % 180)
          || ',"PosTime":' || (sec * 1000)
          || ',"Mlat":' || (CASE WHEN u % 2 = 0 THEN 'true' ELSE 'false' END)
          || ',"Gnd":false,"From":"KSFO San Francisco","To":"XORD Chicago"}]}'
        END AS raw
      FROM base WHERE u % 3 = 1),
    aex_pt AS (
      SELECT CAST(json_extract(raw, '$.acList[0].Lat') AS DOUBLE) AS lat,
             CAST(json_extract(raw, '$.acList[0].Alt') AS BIGINT) AS alt,
             CAST(json_extract(raw, '$.acList[0].Mlat') AS BOOLEAN) AS mlat
      FROM aex_raw WHERE json_valid(raw)),
    aex_agg AS (
      SELECT 'aex' AS family, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lat) AS BIGINT) AS sum_lat,
             CAST(sum(alt) AS BIGINT) AS sum_alt,
             CAST(sum(CASE WHEN mlat THEN 1 ELSE 0 END) AS BIGINT) AS n_flag
      FROM aex_pt WHERE lat IS NOT NULL),
    fa_raw AS (
      SELECT CASE WHEN e % 7 = 0 THEN '{"oops":'
        ELSE '{"GetHistoricalTrackResult":{"data":[{"altitude":' || (e % 400)
          || ',"altitudeChange":"C","altitudeStatus":"-","groundspeed":'
          || (u % 600)
          || ',"latitude":' || (u % 90)
          || ',"longitude":' || (e % 180)
          || ',"timestamp":' || sec
          || ',"updateType":"'
          || (CASE WHEN u % 4 = 0 THEN 'TA' WHEN u % 4 = 1 THEN 'TP'
                   WHEN u % 4 = 2 THEN 'A' ELSE 'TZ' END)
          || '"}]}}'
        END AS raw
      FROM base WHERE u % 3 = 2),
    fa_pt AS (
      SELECT CAST(json_extract(raw,
               '$.GetHistoricalTrackResult.data[0].latitude') AS DOUBLE) AS lat,
             CAST(json_extract(raw,
               '$.GetHistoricalTrackResult.data[0].altitude') AS BIGINT)
               * 100 AS alt,
             json_extract_string(raw,
               '$.GetHistoricalTrackResult.data[0].updateType') AS ut
      FROM fa_raw WHERE json_valid(raw)),
    fa_agg AS (
      SELECT 'fa' AS family, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lat) AS BIGINT) AS sum_lat,
             CAST(sum(alt) AS BIGINT) AS sum_alt,
             CAST(sum(CASE WHEN ut IN ('TA', 'A') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_flag
      FROM fa_pt WHERE lat IS NOT NULL),
    swim_fl AS (
      SELECT u, e,
             '{"source":"S1","timestamp":"t","flightIdentification":{"computerId":'
          || (u % 512) || ',"aircraftIdentification":"CS' || (u % 50)
          || '"},"enRoute":{"position":{"positionTime":"2016-01-'
          || lpad(CAST(sec % 27 + 1 AS VARCHAR), 2, '0') || 'T'
          || lpad(CAST((sec // 3600) % 24 AS VARCHAR), 2, '0') || ':'
          || lpad(CAST((sec // 60) % 60 AS VARCHAR), 2, '0')
          || ':00Z","position":{"location":{"pos":"'
          || (u % 90) || ' ' || (e % 180)
          || '"}},"altitude":{"content":' || ((e % 400) * 100)
          || '},"actualSpeed":{"surveillance":{"content":' || (u % 600)
          || '}}}}}' AS f1,
             '{"source":"S1","timestamp":"t","flightIdentification":{"computerId":'
          || ((u + 1) % 512) || ',"aircraftIdentification":"CS'
          || ((u + 1) % 50)
          || '"},"enRoute":{"position":{"positionTime":"2016-01-'
          || lpad(CAST(sec % 27 + 1 AS VARCHAR), 2, '0') || 'T'
          || lpad(CAST((sec // 3600) % 24 AS VARCHAR), 2, '0') || ':'
          || lpad(CAST((sec // 60) % 60 AS VARCHAR), 2, '0')
          || ':00Z","position":{"location":{"pos":"'
          || ((u + 1) % 90) || ' ' || ((e + 11) % 180)
          || '"}},"altitude":{"content":' || (((e + 11) % 400) * 100)
          || '},"actualSpeed":{"surveillance":{"content":' || ((u + 1) % 600)
          || '}}}}}' AS f2
      FROM base),
    swim_raw AS (
      SELECT CASE WHEN e % 7 = 0 THEN '{"oops":'
        WHEN u % 2 = 0 THEN '{"ns5:MessageCollection":{"message":[{"flight":'
          || f1 || '},{"flight":' || f2 || '}]}}'
        ELSE '{"ns5:MessageCollection":{"message":{"flight":' || f1 || '}}}'
        END AS raw,
        u % 2 = 0 AS multi
      FROM swim_fl),
    swim_pt AS (
      -- ns5:-prefixed keys address portably via $."quoted" segments
      -- (probed on DuckDB 1.0, r14); multi shape indexes the message
      -- array, single shape addresses the bare object — the same two
      -- parses the Spark operator coalesces
      SELECT string_split(json_extract_string(raw,
               '$."ns5:MessageCollection".message[' || ix || '].flight'
               || '.enRoute.position.position.location.pos'), ' ') AS pos,
             CAST(json_extract(raw,
               '$."ns5:MessageCollection".message[' || ix || '].flight'
               || '.enRoute.position.altitude.content') AS DOUBLE) AS alt,
             json_extract_string(raw,
               '$."ns5:MessageCollection".message[' || ix || '].flight'
               || '.enRoute.position.positionTime') AS pt
      FROM swim_raw CROSS JOIN (VALUES (0), (1)) AS t(ix)
      WHERE json_valid(raw) AND multi
      UNION ALL
      SELECT string_split(json_extract_string(raw,
               '$."ns5:MessageCollection".message.flight'
               || '.enRoute.position.position.location.pos'), ' ') AS pos,
             CAST(json_extract(raw,
               '$."ns5:MessageCollection".message.flight'
               || '.enRoute.position.altitude.content') AS DOUBLE) AS alt,
             json_extract_string(raw,
               '$."ns5:MessageCollection".message.flight'
               || '.enRoute.position.positionTime') AS pt
      FROM swim_raw WHERE json_valid(raw) AND NOT multi),
    swim_typed AS (
      SELECT CAST(pos[1] AS DOUBLE) AS lat, CAST(pos[2] AS DOUBLE) AS lon,
             alt, try_strptime(pt, '%Y-%m-%dT%H:%M:%SZ') AS pos_time
      FROM swim_pt),
    swim_agg AS (
      SELECT 'swim' AS family, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lat) AS BIGINT) AS sum_lat,
             CAST(sum(alt) AS BIGINT) AS sum_alt,
             CAST(count(pos_time) AS BIGINT) AS n_flag
      FROM swim_typed WHERE lat IS NOT NULL AND lon IS NOT NULL)
    SELECT * FROM fr_agg
    UNION ALL SELECT * FROM aex_agg
    UNION ALL SELECT * FROM fa_agg
    UNION ALL SELECT * FROM swim_agg"""

  /** §2.37c FOIA CSV ingest DRIVER-GATED (r13, 🟡→✅ per the r12 brief —
    * same synthesis precedent): deterministic dump LINES are synthesized
    * from events columns in BOTH documented layouts (classic 13-column
    * and the USER_CLASS 14-column variant — positional column MOTION is
    * the whole point of header-driven parsing), decorated with two
    * poison classes (every 7th line wrong-arity garbage, every 11th a
    * non-numeric LATITUDE — both must DROP, never fail), parsed by the
    * REAL operators (`sources.Foia.parseTrackpoints` under each layout's
    * header list) and grouped to flights (`Foia.flights` — the
    * makeFlight min-struct skeleton + (AIRCRAFT_ID, FLIGHT_INDEX) key).
    * The gate projects the flights' SCALAR columns (the track arrays
    * stay spec-tested in FoiaSpec); DuckDB replays the synthesis and
    * re-parses with its own positional string_split + try_cast /
    * try_strptime, first-row fields via the same (ts, track_index, ...)
    * total order — TRACK_INDEX is zero-padded so string order ==
    * numeric order on both engines.
    */
  private def qFoiaParse(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Foia
    // same single-split starvation fix as qFeedParse: spread the narrow
    // key base before the CSV line build + from_csv stage (r15); r16:
    // gated on the input's split count (see spreadIfNarrow)
    val base = Tables.spreadIfNarrow(s,
      ev(s, dir).select(col("user_id").as("u"),
        col("event_id").as("e"), expr("ts div 1000000000").as("sec")))
    def i(c: Column): Column = c.cast("string")
    def lineFor(ucls: Boolean): Column = concat(
      lit("CS"), i(col("u") % 50), lit(","), i(col("u") % 10), lit(","),
      lpad(i(col("e") % 1000), 4, "0"),
      lit(",ZOA,7012,AP"), i(col("u") % 20), lit(",AL"), i(col("u") % 7),
      lit(",B73"), i(col("u") % 8),
      if (ucls) lit(",C") else lit(""),
      lit(","), when(col("e") % 11 === 0, lit("xx")).otherwise(i(col("u") % 90)),
      lit(","), i(col("e") % 180), lit(","), i(col("e") % 400),
      lit(",201601"), lpad(i(col("sec") % 27 + 1), 2, "0"), lit(","),
      lpad(i(expr("(sec div 3600) % 24")), 2, "0"), lit(":"),
      lpad(i(expr("(sec div 60) % 60")), 2, "0"), lit(":"),
      lpad(i(col("sec") % 60), 2, "0"))
    val poison = col("e") % 7 === 0
    val classic = base.where(col("u") % 2 === 0)
      .select(when(poison, lit("###")).otherwise(lineFor(false)).as("line"))
    val ucls = base.where(col("u") % 2 === 1)
      .select(when(poison, lit("###")).otherwise(lineFor(true)).as("line"))
    val pts = Foia.parseTrackpoints(classic, "line", Foia.headersClassic)
      .unionByName(
        Foia.parseTrackpoints(ucls, "line", Foia.headersWithUserClass))
    Foia.flights(pts).select(col("callsign"), col("flight_index"),
      col("faa_key"), col("origin"), col("destination"), col("equip_type"),
      col("data_source"), col("n_points"))
  }

  private val oFoiaParse = """
    WITH base AS (
      SELECT user_id AS u, event_id AS e,
             epoch_ns(ts) // 1000000000 AS sec
      FROM events),
    lines AS (
      SELECT u % 2 AS layout,
        CASE WHEN e % 7 = 0 THEN '###'
        ELSE 'CS' || (u % 50) || ',' || (u % 10) || ','
          || lpad(CAST(e % 1000 AS VARCHAR), 4, '0')
          || ',ZOA,7012,AP' || (u % 20) || ',AL' || (u % 7)
          || ',B73' || (u % 8)
          || (CASE WHEN u % 2 = 1 THEN ',C' ELSE '' END)
          || ',' || (CASE WHEN e % 11 = 0 THEN 'xx'
                          ELSE CAST(u % 90 AS VARCHAR) END)
          || ',' || (e % 180) || ',' || (e % 400)
          || ',201601' || lpad(CAST(sec % 27 + 1 AS VARCHAR), 2, '0')
          || ',' || lpad(CAST((sec // 3600) % 24 AS VARCHAR), 2, '0')
          || ':' || lpad(CAST((sec // 60) % 60 AS VARCHAR), 2, '0')
          || ':' || lpad(CAST(sec % 60 AS VARCHAR), 2, '0')
        END AS line
      FROM base),
    sp AS (SELECT string_split(line, ',') AS c, layout FROM lines),
    pt AS (
      SELECT c[1] AS callsign, c[2] AS flight_index, c[3] AS track_index,
             c[6] AS origin, c[7] AS destination, c[8] AS equip_type,
             TRY_CAST(c[9 + layout] AS DOUBLE) AS lat,
             TRY_CAST(c[10 + layout] AS DOUBLE) AS lon,
             try_strptime(c[12 + layout] || ' ' || c[13 + layout],
               '%Y%m%d %H:%M:%S') AS ts
      FROM sp),
    ok AS (SELECT * FROM pt
           WHERE callsign IS NOT NULL AND ts IS NOT NULL
             AND lat IS NOT NULL AND lon IS NOT NULL),
    w AS (SELECT *,
            row_number() OVER (PARTITION BY callsign, flight_index
              ORDER BY ts, track_index, origin, destination, equip_type)
              AS rn
          FROM ok),
    g AS (SELECT callsign, flight_index, count(*) AS n_points
          FROM ok GROUP BY 1, 2),
    first AS (SELECT callsign, flight_index, track_index AS faa_key,
                     origin, destination, equip_type
              FROM w WHERE rn = 1)
    SELECT g.callsign, g.flight_index, first.faa_key, first.origin,
           first.destination, first.equip_type, 'FOIA' AS data_source,
           g.n_points
    FROM g JOIN first USING (callsign, flight_index)"""

  // ---------------------------------------------------------------------------

  /** §2.50 (new r6) Descent-grid segments — the reference's fpdf plot
    * layer as DATA (fpdf/descent.go:278 DrawTrackWithDistFunc +
    * fpdf/basegrid.go:38 U/V): per-track consecutive-point segments with
    * x = distance-to-anchor (descent.go:335 DistanceFromOrigin semantics
    * on the synthetic plane), y = `value` in its altitude role, both
    * endpoints linearly projected into the reference's 170-wide letter
    * grid, color band per segment, out-of-bounds flag. Everything up to
    * the SVG bytes is this relational plan; `Render.descentSvg` assembles
    * the bounded page.
    */
  private val DescentGrid = graft.operators.Viz.Grid(
    offU = 22.0, offV = 35.0, w = 170.0, h = 100.0,
    minX = 0.0, maxX = 80.0, minY = 0.0, maxY = 100.0)

  private def qDescentGrid(s: SparkSession, dir: String): DataFrame =
    graft.operators.Viz.segments(ev(s, dir), "user_id", "ts", "event_id",
        sqrt(Geo.distSq(xCol, yCol.cast("double"), 50.0, 50.0)), xCol,
        DescentGrid, bandSize = 20.0)
      .withColumn("oob", col("oob").cast("int"))

  private val oDescentGrid = s"""
    SELECT user_id, rn - 1 AS seg,
           floor(px * 1000.0) / 1000.0 AS x1, floor(py * 1000.0) / 1000.0 AS y1,
           floor(x * 1000.0) / 1000.0 AS x2, floor(y * 1000.0) / 1000.0 AS y2,
           floor((22.0 + ((px - 0.0) / 80.0) * 170.0) * 1000.0) / 1000.0 AS u1,
           floor((35.0 + (100.0 - ((py - 0.0) / 100.0) * 100.0)) * 1000.0) / 1000.0 AS v1,
           floor((22.0 + ((x - 0.0) / 80.0) * 170.0) * 1000.0) / 1000.0 AS u2,
           floor((35.0 + (100.0 - ((y - 0.0) / 100.0) * 100.0)) * 1000.0) / 1000.0 AS v2,
           CAST(floor(y / 20.0) AS INT) AS band,
           CAST(((px - 0.0) / 80.0 < 0.0 OR (px - 0.0) / 80.0 > 1.0
              OR (py - 0.0) / 100.0 < 0.0 OR (py - 0.0) / 100.0 > 1.0
              OR (x - 0.0) / 80.0 < 0.0 OR (x - 0.0) / 80.0 > 1.0
              OR (y - 0.0) / 100.0 < 0.0 OR (y - 0.0) / 100.0 > 1.0)
             AS INT) AS oob
    FROM (
      SELECT user_id, ts, event_id, x, y,
             lag(x) OVER w AS px, lag(y) OVER w AS py,
             row_number() OVER w AS rn
      FROM (
        SELECT user_id, ts, event_id,
               sqrt((value - 50.0) * (value - 50.0)
                 + (CAST($ySql AS DOUBLE) - 50.0)
                   * (CAST($ySql AS DOUBLE) - 50.0)) AS x,
               value AS y
        FROM events) t0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    WHERE px IS NOT NULL"""

  /** §2.31e (new r6) Sideview with the ALONG-PATH projection
    * (fpdf/sideview.go + fpdf/trackprojector.go:53 ProjectAlongPath —
    * "distance travelled"): x = running 2-D path length (cumulative
    * euclidean step, the Track.Dist cumulation), y = altitude role,
    * projected through the same grid arithmetic as q_descent_grid. The
    * running sum is order-defined (sequential per track), so both engines
    * cumulate identically — the q_cumdist precedent in 2-D.
    */
  private val SideviewGrid = graft.operators.Viz.Grid(
    offU = 22.0, offV = 35.0, w = 170.0, h = 100.0,
    minX = 0.0, maxX = 2000.0, minY = 0.0, maxY = 100.0)

  private def qSideviewPath(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withCum = ev(s, dir)
      .withColumn("_sx", xCol).withColumn("_sy", yCol.cast("double"))
      .withColumn("_px", lag(col("_sx"), 1).over(w))
      .withColumn("_py", lag(col("_sy"), 1).over(w))
      .withColumn("_step", when(col("_px").isNull, lit(0.0)).otherwise(
        sqrt((col("_sx") - col("_px")) * (col("_sx") - col("_px")) +
          (col("_sy") - col("_py")) * (col("_sy") - col("_py")))))
      .withColumn("cum", sum(col("_step")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    graft.operators.Viz.segments(withCum, "user_id", "ts", "event_id",
        col("cum"), col("_sx"), SideviewGrid, bandSize = 20.0)
      .withColumn("oob", col("oob").cast("int"))
  }

  private val oSideviewPath = s"""
    SELECT user_id, rn - 1 AS seg,
           floor(pc * 1000.0) / 1000.0 AS x1, floor(pv * 1000.0) / 1000.0 AS y1,
           floor(cum * 1000.0) / 1000.0 AS x2, floor(v * 1000.0) / 1000.0 AS y2,
           floor((22.0 + ((pc - 0.0) / 2000.0) * 170.0) * 1000.0) / 1000.0 AS u1,
           floor((35.0 + (100.0 - ((pv - 0.0) / 100.0) * 100.0)) * 1000.0) / 1000.0 AS v1,
           floor((22.0 + ((cum - 0.0) / 2000.0) * 170.0) * 1000.0) / 1000.0 AS u2,
           floor((35.0 + (100.0 - ((v - 0.0) / 100.0) * 100.0)) * 1000.0) / 1000.0 AS v2,
           CAST(floor(v / 20.0) AS INT) AS band,
           CAST(((pc - 0.0) / 2000.0 < 0.0 OR (pc - 0.0) / 2000.0 > 1.0
              OR (pv - 0.0) / 100.0 < 0.0 OR (pv - 0.0) / 100.0 > 1.0
              OR (cum - 0.0) / 2000.0 < 0.0 OR (cum - 0.0) / 2000.0 > 1.0
              OR (v - 0.0) / 100.0 < 0.0 OR (v - 0.0) / 100.0 > 1.0)
             AS INT) AS oob
    FROM (
      SELECT user_id, ts, event_id, cum, v,
             lag(cum) OVER w AS pc, lag(v) OVER w AS pv,
             row_number() OVER w AS rn
      FROM (
        SELECT user_id, ts, event_id, v,
               sum(step) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
          SELECT user_id, ts, event_id, v,
                 CASE WHEN px IS NULL THEN 0.0 ELSE
                   sqrt((v - px) * (v - px) + (y - py) * (y - py)) END AS step
          FROM (
            SELECT user_id, ts, event_id, value AS v,
                   CAST($ySql AS DOUBLE) AS y,
                   lag(value) OVER w2 AS px,
                   lag(CAST($ySql AS DOUBLE)) OVER w2 AS py
            FROM events
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)) t0) t1) t2
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    WHERE pc IS NOT NULL"""

  // ---------------------------------------------------------------------------
  // §2.31f Vector-PDF page emission DRIVER-GATED (r14, 🟡→✅)
  // ---------------------------------------------------------------------------

  /** SQL for the 2-dp TRUNCATION-formatted string of a double expression:
    * i = floor(e·100) (bit-identical on identical doubles — the Viz.trunc
    * rule), then the string is built with pure integer ops. This is why
    * descentPdf formats by truncation instead of `%.2f`: Java rounds
    * HALF_UP, C/DuckDB printf HALF_EVEN — printf output can never be
    * byte-gated across engines (they disagree at exactly-representable
    * ties), integer-built strings always can.
    */
  private def pdfF2(e: String): String =
    s"(CAST(CAST(floor(($e) * 100) AS BIGINT) // 100 AS VARCHAR) || '.' || " +
      s"lpad(CAST(CAST(floor(($e) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0'))"

  private def pdfF3(e: String): String =
    s"(CAST(CAST(floor(($e) * 1000) AS BIGINT) // 1000 AS VARCHAR) || '.' || " +
      s"lpad(CAST(CAST(floor(($e) * 1000) AS BIGINT) % 1000 AS VARCHAR), 3, '0'))"

  private val PdfPageLimit = 400

  /** §2.31f the lane: the same descent-grid segments as q_descent_grid,
    * in-bounds only, page coordinates TRUNCATED to exact hundredths
    * (floor(u·100)/100 — a double that both engines format identically,
    * and whose equality across engines is already implied by
    * q_descent_grid's 3-dp gate: floor(100x) = floor(floor(1000x)/10)),
    * deterministically ordered, one bounded page — rendered to COMPLETE
    * PDF FILE BYTES by the real emitter (`Render.descentPdf`,
    * fpdf/fpdf.go:403 page composition). Output is one row
    * (n_bytes, pdf); the oracle REBUILDS THE ENTIRE FILE in SQL — every
    * vector op, tick, caption escape, color constant, the content
    * stream's /Length, all five object bodies, and the xref byte
    * offsets — so the byte-level emission contract is hash-checked, not
    * spec-trusted. (All bytes are ASCII by construction, so the string
    * round-trip through parquet is exact.)
    */
  private def qRenderPdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def t2(c: Column): Column = floor(c * 100) / 100
    val segs = graft.operators.Viz.segments(ev(s, dir), "user_id", "ts",
        "event_id", sqrt(Geo.distSq(xCol, yCol.cast("double"), 50.0, 50.0)),
        xCol, DescentGrid, bandSize = 20.0)
      .where(col("oob").cast("int") === 0)
      .select(t2(col("u1")).as("u1"), t2(col("v1")).as("v1"),
        t2(col("u2")).as("u2"), t2(col("v2")).as("v2"),
        col("band").cast("int").as("band"), lit(0).as("oob"))
      .orderBy("u1", "v1", "u2", "v2", "band")
      .limit(PdfPageLimit)
    val bytes = graft.sources.Render.descentPdf(segs, DescentGrid,
      caption = "descent (demo)", limit = PdfPageLimit)
    val pdf = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    Seq((pdf.length.toLong, pdf)).toDF("n_bytes", "pdf")
  }

  /** The §2.31f oracle: DuckDB rebuilds the full PDF byte string. The SQL
    * is ASSEMBLED by this generator (loops over ticks/palette unroll to
    * expressions), but every number is COMPUTED BY DUCKDB — the same
    * double arithmetic as the emitter (mm→pt, the grid projection, the
    * y flip), truncation-formatted with integer ops; the only embedded
    * literals are true input constants (grid geometry, tick values,
    * palette component integers, the caption).
    */
  private val oRenderPdf: String = {
    val mmpt = "(72.0 / 25.4)"
    def px(mm: String) = s"(($mm) * $mmpt)"
    def py(mm: String) = s"((279.0 - ($mm)) * $mmpt)"
    def uG(x: String) = s"(22.0 + (($x - 0.0) / (80.0 - 0.0)) * 170.0)"
    def vG(y: String) = s"(35.0 + (100.0 - (($y - 0.0) / (100.0 - 0.0)) * 100.0))"
    val nl = "chr(10)"
    // n-ary concat() keeps the expression tree SHALLOW — a left-deep ||
    // chain over the whole page blew DuckDB's 128-deep binder recursion
    def cat(parts: String*): String = s"concat(${parts.mkString(", ")})"
    def lineOp(x1: String, y1: String, x2: String, y2: String) =
      cat(pdfF2(px(x1)), "' '", pdfF2(py(y1)), "' m '",
        pdfF2(px(x2)), "' '", pdfF2(py(y2)), "' l S'", nl)
    def textOp(xMm: String, yMm: String, sizeMm: String, escd: String) =
      cat("'BT /F1 '", pdfF2(s"($sizeMm) * $mmpt"), "' Tf '",
        pdfF2(px(xMm)), "' '", pdfF2(py(yMm)),
        "' Td ('", escd, "') Tj ET'", nl)
    // palette component integers (true constants; the float math runs in
    // DuckDB)
    val rgb = graft.sources.Render.BandPalette.map { hex =>
      val v = Integer.parseInt(hex.stripPrefix("#"), 16)
      ((v >> 16) & 255, (v >> 8) & 255, v & 255)
    }
    def rgbStr(c: (Int, Int, Int)) =
      cat(pdfF3(s"${c._1}.0 / 255.0"), "' '",
        pdfF3(s"${c._2}.0 / 255.0"), "' '", pdfF3(s"${c._3}.0 / 255.0"))
    // header + frame + grid color header
    val head = cat(
      pdfF2(s"0.4 * $mmpt"), "' w 0.2 0.2 0.2 RG'", nl,
      pdfF2(px("22.0")), "' '", pdfF2(py("35.0 + 100.0")), "' '",
      pdfF2(s"170.0 * $mmpt"), "' '", pdfF2(s"100.0 * $mmpt"),
      "' re S'", nl,
      pdfF2(s"0.15 * $mmpt"), "' w 0.8 0.8 0.8 RG 0 0 0 rg'", nl)
    // tick loops unrolled (x = 0..80 step 10, y = 0..100 step 20); labels
    // are trunc2 of the integer tick values — input constants
    val xTicks = cat((0 to 80 by 10).map { x =>
      val xe = s"$x.0"
      cat(lineOp(uG(xe), "35.0", uG(xe), "35.0 + 100.0"),
        textOp(s"${uG(xe)} - 3", "35.0 + 100.0 + 4", "3", s"'$x.00'"))
    }: _*)
    val yTicks = cat((0 to 100 by 20).map { y =>
      val ye = s"$y.0"
      cat(lineOp("22.0", vG(ye), "22.0 + 170.0", vG(ye)),
        textOp("22.0 - 12", vG(ye), "3", s"'$y.00'"))
    }: _*)
    // per-segment piece: band color RG + the m/l/S op, aggregated in the
    // page's deterministic order
    val bandCase = "CASE ((band % 6) + 6) % 6 " +
      rgb.zipWithIndex.map { case (c, i) => s"WHEN $i THEN ${rgbStr(c)}" }
        .mkString(" ") + " END"
    val segPiece = cat(
      s"($bandCase)", "' RG'", nl,
      pdfF2(s"u1 * $mmpt"), "' '", pdfF2(s"(279.0 - v1) * $mmpt"),
      "' m '", pdfF2(s"u2 * $mmpt"), "' '",
      pdfF2(s"(279.0 - v2) * $mmpt"), "' l S'", nl)
    // caption (escaped parens — the pdfEsc surface) + color key
    val caption = textOp("22.0", "35.0 - 6", "4", "'descent \\(demo\\)'")
    val key = cat(rgb.zipWithIndex.map { case (c, i) =>
      val kx = s"(22.0 + $i * 14)"
      cat(rgbStr(c), "' rg '", pdfF2(px(kx)), "' '",
        pdfF2(py("(35.0 + 100.0 + 10) + 3")), "' '",
        pdfF2(s"3 * $mmpt"), "' '", pdfF2(s"3 * $mmpt"),
        "' re f 0 0 0 rg'", nl,
        textOp(s"$kx + 4", "(35.0 + 100.0 + 10) + 3", "3", s"'b$i'"))
    }: _*)
    s"""
    WITH raw AS (
      SELECT (22.0 + ((px - 0.0) / 80.0) * 170.0) AS u1r,
             (35.0 + (100.0 - ((py - 0.0) / 100.0) * 100.0)) AS v1r,
             (22.0 + ((x - 0.0) / 80.0) * 170.0) AS u2r,
             (35.0 + (100.0 - ((y - 0.0) / 100.0) * 100.0)) AS v2r,
             CAST(floor(y / 20.0) AS INT) AS band,
             ((px - 0.0) / 80.0 < 0.0 OR (px - 0.0) / 80.0 > 1.0
              OR (py - 0.0) / 100.0 < 0.0 OR (py - 0.0) / 100.0 > 1.0
              OR (x - 0.0) / 80.0 < 0.0 OR (x - 0.0) / 80.0 > 1.0
              OR (y - 0.0) / 100.0 < 0.0 OR (y - 0.0) / 100.0 > 1.0) AS oob
      FROM (
        SELECT user_id, ts, event_id, x, y,
               lag(x) OVER w AS px, lag(y) OVER w AS py
        FROM (
          SELECT user_id, ts, event_id,
                 sqrt((value - 50.0) * (value - 50.0)
                   + (CAST($ySql AS DOUBLE) - 50.0)
                     * (CAST($ySql AS DOUBLE) - 50.0)) AS x,
                 value AS y
          FROM events) t0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      WHERE px IS NOT NULL),
    segs AS (
      -- Viz.segments emits 3-dp-truncated page coords, and the lane
      -- truncates THOSE to 2 dp — the chain floor(100·(floor(1000·r)/1000))
      -- is NOT floor(100·r) (the stored double of k/1000 can sit just
      -- below a hundredth boundary), so the oracle replays the exact
      -- double-trunc chain
      SELECT floor((floor(u1r * 1000) / 1000) * 100) / 100 AS u1,
             floor((floor(v1r * 1000) / 1000) * 100) / 100 AS v1,
             floor((floor(u2r * 1000) / 1000) * 100) / 100 AS u2,
             floor((floor(v2r * 1000) / 1000) * 100) / 100 AS v2,
             band
      FROM raw WHERE NOT oob
      ORDER BY 1, 2, 3, 4, 5 LIMIT $PdfPageLimit),
    segagg AS (
      SELECT coalesce(string_agg($segPiece, ''
               ORDER BY u1, v1, u2, v2, band), '') AS sa
      FROM segs),
    stream AS (
      SELECT ($head || $xTicks || $yTicks ||
              ${pdfF2(s"0.25 * $mmpt")} || ' w' || $nl ||
              sa || $caption || $key) AS s
      FROM segagg),
    o AS (
      SELECT
        '1 0 obj' || $nl || '<< /Type /Catalog /Pages 2 0 R >>'
          || $nl || 'endobj' || $nl AS o1,
        '2 0 obj' || $nl || '<< /Type /Pages /Kids [3 0 R] /Count 1 >>'
          || $nl || 'endobj' || $nl AS o2,
        '3 0 obj' || $nl
          || '<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
          || '/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>'
          || $nl || 'endobj' || $nl AS o3,
        '4 0 obj' || $nl || '<< /Length ' || CAST(strlen(s) AS VARCHAR)
          || ' >>' || $nl || 'stream' || $nl || s || 'endstream'
          || $nl || 'endobj' || $nl AS o4,
        '5 0 obj' || $nl
          || '<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>'
          || $nl || 'endobj' || $nl AS o5
      FROM stream),
    offs AS (
      SELECT o1, o2, o3, o4, o5,
             CAST(9 AS BIGINT) AS f1,
             9 + strlen(o1) AS f2,
             9 + strlen(o1) + strlen(o2) AS f3,
             9 + strlen(o1) + strlen(o2) + strlen(o3) AS f4,
             9 + strlen(o1) + strlen(o2) + strlen(o3) + strlen(o4) AS f5,
             9 + strlen(o1) + strlen(o2) + strlen(o3) + strlen(o4)
               + strlen(o5) AS fx
      FROM o),
    fin AS (
      SELECT '%PDF-1.4' || $nl || o1 || o2 || o3 || o4 || o5
        || 'xref' || $nl || '0 6' || $nl || '0000000000 65535 f ' || $nl
        || lpad(CAST(f1 AS VARCHAR), 10, '0') || ' 00000 n ' || $nl
        || lpad(CAST(f2 AS VARCHAR), 10, '0') || ' 00000 n ' || $nl
        || lpad(CAST(f3 AS VARCHAR), 10, '0') || ' 00000 n ' || $nl
        || lpad(CAST(f4 AS VARCHAR), 10, '0') || ' 00000 n ' || $nl
        || lpad(CAST(f5 AS VARCHAR), 10, '0') || ' 00000 n ' || $nl
        || 'trailer' || $nl || '<< /Size 6 /Root 1 0 R >>' || $nl
        || 'startxref' || $nl || CAST(fx AS VARCHAR) || $nl
        || '%%EOF' || $nl AS pdf
      FROM offs)
    SELECT CAST(strlen(pdf) AS BIGINT) AS n_bytes, pdf FROM fin"""
  }

  // ---------------------------------------------------------------------------
  // §2.69 Z-order layout keys (operators.Layout)
  // ---------------------------------------------------------------------------

  private val ZDay = 86400000000000L
  private def zX: Column = pmod(col("user_id"), lit(256L))
  private def zY: Column = pmod(expr(s"ts div $ZDay"), lit(256L))
  private val zXSql = "user_id % 256"
  private val zYSql = s"(epoch_ns(ts) // $ZDay) % 256"

  /** The Morton interleave as DuckDB SQL — same bit placement as
    * Layout.zorder (bit b of dim d → output bit 2b+d).
    */
  private def duckZ(x: String, y: String, bits: Int): String =
    ((0 until bits).map(b => s"(((($x) >> $b) & 1) << ${2 * b})") ++
     (0 until bits).map(b => s"(((($y) >> $b) & 1) << ${2 * b + 1})"))
      .mkString(" + ")

  /** §2.69 Z-order layout key: the clustering column a 100 TB events
    * table sorts by at write time so parquet row-group stats prune BOTH
    * user and time predicates (a single-column sort only prunes its
    * leading column). Keyed histogram per zkey div 64 block — the
    * "what does the layout look like" inspection query; the write path
    * itself is `repartitionByRange(zkey).sortWithinPartitions(zkey)`
    * (row-group pruning measured by tools.ZorderProbe).
    */
  private def qZorderKey(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(Layout.zorder(Seq(zX, zY), 8).as("zkey"))
      .groupBy(expr("zkey div 64").as("zblock"))
      .agg(count(lit(1)).as("n"), min("zkey").as("zmin"), max("zkey").as("zmax"))

  private val oZorderKey = s"""
    WITH z AS (SELECT ${duckZ(zXSql, zYSql, 8)} AS zkey FROM events)
    SELECT zkey // 64 AS zblock, count(*) AS n,
           min(zkey) AS zmin, max(zkey) AS zmax
    FROM z GROUP BY 1"""

  /** §2.69a Z-range box serving: an axis-aligned (user, day) box is
    * served from the contiguous [z(ll), z(ur)] key range (valid because
    * the Morton key is per-coordinate monotone — Layout.zRangeBound),
    * then refined by the exact predicate. n_zrange / n_box is the
    * looseness of the coarse range — the fraction a zkey-sorted layout
    * would scan vs deliver; sel_permille makes the driver compare it.
    */
  private def qZorderRange(s: SparkSession, dir: String): DataFrame = {
    val (zlo, zhi) = Layout.zRangeBound(Seq(32L, 15L), Seq(96L, 35L), 8)
    val base = ev(s, dir).select(zX.as("xq"), zY.as("yq"),
      Layout.zorder(Seq(zX, zY), 8).as("zkey"))
    base.agg(
      sum(when(col("xq").between(32, 96) && col("yq").between(15, 35), 1L)
        .otherwise(0L)).as("n_box"),
      sum(when(col("zkey").between(zlo, zhi), 1L).otherwise(0L)).as("n_zrange"))
      .select(col("n_box"), col("n_zrange"),
        expr("n_box * 1000 div n_zrange").as("sel_permille"))
  }

  private val oZorderRange: String = {
    val (zlo, zhi) = graft.operators.Layout.zRangeBound(Seq(32L, 15L), Seq(96L, 35L), 8)
    s"""
    WITH z AS (SELECT $zXSql AS xq, $zYSql AS yq,
                 ${duckZ(zXSql, zYSql, 8)} AS zkey FROM events),
    agg AS (SELECT
        CAST(sum(CASE WHEN xq BETWEEN 32 AND 96 AND yq BETWEEN 15 AND 35
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_box,
        CAST(sum(CASE WHEN zkey BETWEEN $zlo AND $zhi
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_zrange
      FROM z)
    SELECT n_box, n_zrange, n_box * 1000 // n_zrange AS sel_permille FROM agg"""
  }

  /** §2.23b Proximity pairs — the airprox/near-miss report (the safety
    * query a trackpoint store is built for): pairs of events from
    * different users in the same 6 h timeslot within 2-D distance 5,
    * rolled up per unordered user pair (n_close + truncated closest
    * squared distance). The Spark plan grid-buckets space into d-sized
    * cells and equi-joins (slot, cell±1) — density-local work instead of
    * the per-slot all-pairs the oracle runs (semantically identical: a
    * pair within d differs by ≤ 1 cell per axis, and each pair is found
    * against exactly one home cell).
    */
  private val ProxSlotNs = 21600000000000L // 6 h
  private val ProxD = 5.0

  private def qProximityPairs(s: SparkSession, dir: String): DataFrame =
    Geo.proximityPairs(ev(s, dir), "user_id", "event_id", xCol, yCol,
      expr(s"ts div $ProxSlotNs"), ProxD)

  private val oProximityPairs = s"""
    WITH e AS (
      SELECT event_id, user_id, value AS x, CAST($ySql AS DOUBLE) AS y,
             epoch_ns(ts) // $ProxSlotNs AS slot
      FROM events),
    p AS (
      SELECT least(a.user_id, b.user_id) AS u1,
             greatest(a.user_id, b.user_id) AS u2,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dsq
      FROM e a JOIN e b
        ON a.slot = b.slot AND a.event_id < b.event_id
           AND a.user_id <> b.user_id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= ${ProxD * ProxD})
    SELECT u1, u2, CAST(count(*) AS BIGINT) AS n_close,
           floor(min(dsq) * 10000.0) / 10000.0 AS min_dsq
    FROM p GROUP BY u1, u2"""

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q_proximity_pairs", qProximityPairs, Some(oProximityPairs)),
    GraftQuery("q_zorder_key", qZorderKey, Some(oZorderKey)),
    GraftQuery("q_zorder_range", qZorderRange, Some(oZorderRange)),
    GraftQuery("q_descent_grid", qDescentGrid, Some(oDescentGrid)),
    GraftQuery("q_render_pdf", qRenderPdf, Some(oRenderPdf)),
    GraftQuery("q_sideview_path", qSideviewPath, Some(oSideviewPath)),
    GraftQuery("q_geo_box", qGeoBox, Some(oGeoBox)),
    GraftQuery("q_time_of_day", qTimeOfDay, Some(oTimeOfDay)),
    GraftQuery("q_airspace_snapshot", qAirspaceSnapshot, Some(oAirspaceSnapshot), headline = true),
    GraftQuery("q_recent_waypoint", qRecentWaypoint, Some(oRecentWaypoint)),
    GraftQuery("q_geo_polygon", qGeoPolygon, Some(oGeoPolygon), headline = true),
    GraftQuery("q_closest_approach", qClosestApproach, Some(oClosestApproach)),
    GraftQuery("q_line_crossing", qLineCrossing, Some(oLineCrossing)),
    GraftQuery("q_waypoint_match", qWaypointMatch, Some(oWaypointMatch), headline = true),
    GraftQuery("q_straightline", qStraightline, Some(oStraightline)),
    GraftQuery("q_procedure", qProcedure, Some(oProcedure)),
    GraftQuery("q_metar_daygrid", qMetarDaygrid, Some(oMetarDaygrid)),
    GraftQuery("q_metar_parse", qMetarParse, Some(oMetarParse)),
    GraftQuery("q_feed_parse", qFeedParse, Some(oFeedParse)),
    GraftQuery("q_foia_parse", qFoiaParse, Some(oFoiaParse)),
    GraftQuery("q_georestrictor_set", qGeorestrictorSet, Some(oGeorestrictorSet)),
    GraftQuery("q_geo_intersections", qGeoIntersections, Some(oGeoIntersections), headline = true),
    GraftQuery("q_classb", qClassb, Some(oClassb)),
    GraftQuery("q_alt_bands", qAltBands, Some(oAltBands)),
    GraftQuery("q_trains", qTrains, Some(oTrains)),
    GraftQuery("q_approach_signature", qApproachSignature, Some(oApproachSignature)),
    GraftQuery("q_value_stats", qValueStats, Some(oValueStats)),
    GraftQuery("q_callsign_parse", qCallsignParse, Some(oCallsignParse)),
    GraftQuery("q_idspec_parse", qIdspecParse, Some(oIdspecParse)),
    GraftQuery("q_identity_merge", qIdentityMerge, Some(oIdentityMerge))
  )
}
