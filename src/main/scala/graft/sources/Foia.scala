package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FOIA batch ingest: FAA archive dumps arrive as gzip'ed CSV whose header
  * row varies across dumps (reference: faadata/row.go:1-159 — rows become
  * header→value maps precisely because positions move; the documented
  * layouts differ by an optional USER_CLASS column), and consecutive rows
  * group into flights keyed by (AIRCRAFT_ID, FLIGHT_INDEX) — the flight
  * NUMBER alone is ambiguous across a day's repeats, row.go:134-148 —
  * each flight getting a timestamp-sorted FOIA track and a skeleton
  * identity from its first row (faadata/faadata.go:17 makeFlight).
  *
  * Spark form: the caller hands the dump's header list (one tiny
  * driver-side read of line 1, exactly the reference's NewRowReader), and
  * every data line parses declaratively with `from_csv` against an
  * all-STRING schema named by those headers — so column MOTION across
  * dumps is handled by construction, not positional guessing. Typed
  * fields project with `try_cast` / null-safe expressions; a poison line
  * (wrong arity, garbage floats, broken date) nulls out or drops instead
  * of failing the batch — the JsonFeed four-family rule. Grouping to
  * flights is one (callsign, flight_index)-keyed aggregation with
  * `sort_array` ordering each track by (ts, lat, lon) — fully
  * distributed, no driver loop over rows (the reference accumulates rows
  * in memory per flight; at 100 TB the shuffle IS that accumulation).
  */
object Foia {

  /** The two documented header layouts (row.go:21-42). Real dumps may
    * carry others; pass the dump's own header line when it differs.
    */
  val headersClassic: Seq[String] = Seq(
    "AIRCRAFT_ID", "FLIGHT_INDEX", "TRACK_INDEX",
    "SOURCE_FACILITY", "BEACON_CODE", "DEP_APRT", "ARR_APRT", "ACFT_TYPE",
    "LATITUDE", "LONGITUDE", "ALTITUDEx100ft",
    "TRACK_POINT_DATE_UTC", "TRACK_POINT_TIME_UTC")

  val headersWithUserClass: Seq[String] = Seq(
    "AIRCRAFT_ID", "FLIGHT_INDEX", "TRACK_INDEX",
    "SOURCE_FACILITY", "BEACON_CODE", "DEP_APRT", "ARR_APRT", "ACFT_TYPE",
    "USER_CLASS", "LATITUDE", "LONGITUDE", "ALTITUDEx100ft",
    "TRACK_POINT_DATE_UTC", "TRACK_POINT_TIME_UTC")

  /** Parse raw CSV lines (header line excluded) into typed trackpoint
    * rows: (callsign, flight_index, track_index, source_facility, squawk,
    * origin, destination, equip_type, user_class, lat, lon, alt_ft, ts).
    * `headers` names the dump's columns; absent optional columns (e.g.
    * USER_CLASS in classic dumps) surface as null. Altitude is the
    * reference's ×100 ft scaling (row.go:116); the timestamp is the UTC
    * parse of DATE + TIME (row.go:117-118). Rows missing a position or a
    * parsable timestamp are dropped (poison rule), mirroring the
    * reference's silent ParseFloat/Parse error drops.
    */
  def parseTrackpoints(raw: DataFrame, lineCol: String,
                       headers: Seq[String]): DataFrame = {
    require(headers.nonEmpty, "Foia.parseTrackpoints: empty header list")
    val schema = StructType(headers.map(StructField(_, StringType)))
    def field(name: String): Column =
      if (headers.contains(name)) col("r").getField(name)
      else lit(null).cast("string")
    // numeric fields route through the same absent-column guard as the
    // string fields (a dump whose header list omits LATITUDE must degrade
    // to the poison-drop rule, not throw at plan analysis), with try_cast
    // keeping the per-row poison semantics for garbage values
    def dbl(name: String): Column =
      if (headers.contains(name)) expr(s"try_cast(r.`$name` AS DOUBLE)")
      else lit(null).cast("double")
    // The poison drop is fused into a Generate (explode of a one-element
    // array under the keep condition; `when` with no otherwise yields
    // NULL and explode drops the row) instead of a trailing `.where`:
    // a Filter predicate referencing the parsed struct gets PUSHED
    // THROUGH the defining Projects and re-evaluates `from_csv` once per
    // reference — the r9 FilterExec-no-CSE trap; the r15 plan audit
    // caught FIVE full parses per row inside the pushed filter, all
    // running on the scan side of the lane's spread exchange. A
    // predicate can't push through a Generate, and the struct the
    // condition references is materialized by its own Project (from_csv
    // is non-cheap, so CollapseProject keeps the stages separate) — one
    // parse per row, zero extra materialization.
    raw.select(from_csv(col(lineCol), schema,
        Map("mode" -> "PERMISSIVE")).as("r"))
      .select(struct(
        field("AIRCRAFT_ID").as("callsign"),
        field("FLIGHT_INDEX").as("flight_index"),
        field("TRACK_INDEX").as("track_index"),
        field("SOURCE_FACILITY").as("source_facility"),
        field("BEACON_CODE").as("squawk"),
        field("DEP_APRT").as("origin"),
        field("ARR_APRT").as("destination"),
        field("ACFT_TYPE").as("equip_type"),
        field("USER_CLASS").as("user_class"),
        dbl("LATITUDE").as("lat"),
        dbl("LONGITUDE").as("lon"),
        (dbl("ALTITUDEx100ft") * 100.0).as("alt_ft"),
        try_to_timestamp(
          concat_ws(" ", field("TRACK_POINT_DATE_UTC"),
            field("TRACK_POINT_TIME_UTC")),
          lit("yyyyMMdd HH:mm:ss")).as("ts")).as("p"))
      .select(explode(when(
        col("p.callsign").isNotNull && col("p.ts").isNotNull &&
          col("p.lat").isNotNull && col("p.lon").isNotNull,
        array(col("p")))).as("p"))
      .select(col("p.*"))
  }

  /** Group trackpoints into FOIA flights — makeFlight semantics
    * (faadata.go:17): key = (callsign, flight_index) per
    * row.FromSameFlightAs (row.go:146: the flight number repeats across a
    * day, FLIGHT_INDEX disambiguates); the track is the points sorted by
    * timestamp ascending; the skeleton identity (origin, destination,
    * equip type, FAA foreign key = TRACK_INDEX) comes from the FIRST
    * point; every flight is tagged FOIA with data_source FOIA. One
    * key-shuffled aggregation; track arrays are per-flight-bounded.
    */
  def flights(points: DataFrame): DataFrame = {
    val pt = struct(col("ts"), col("lat"), col("lon"), col("alt_ft"),
      col("squawk"))
    val first = struct(col("ts"), col("track_index"), col("origin"),
      col("destination"), col("equip_type"))
    points.groupBy(col("callsign"), col("flight_index"))
      .agg(
        sort_array(collect_list(pt)).as("track"),
        min(first).as("_f"),
        count(lit(1)).as("n_points"))
      .select(
        col("callsign"), col("flight_index"),
        col("_f.track_index").as("faa_key"),
        col("_f.origin").as("origin"),
        col("_f.destination").as("destination"),
        col("_f.equip_type").as("equip_type"),
        lit("FOIA").as("data_source"),
        array(lit("FOIA")).as("tags"),
        col("n_points"),
        col("track.ts").as("track_ts"),
        col("track.lat").as("track_lat"),
        col("track.lon").as("track_lon"),
        col("track.alt_ft").as("track_alt_ft"))
  }
}
