package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SWIM-style JSON feed ingestion (reference: swim/swim.go Json2Flights,
  * swim/swim-types.go; the aex/fa/fr24 pollers produce similar per-message
  * JSON). The reference tries TWO incompatible envelope shapes per string —
  * `message` is an array in the common multi-message form and a bare object
  * in the single-message form — then flattens each message's nested
  * flight into points.
  *
  * Spark form: both shapes are parsed declaratively with `from_json` (no
  * UDF, fully parallel over the raw-string table) and coalesced, so one
  * scan handles a mixed feed; messages explode to rows and the nested
  * fields project to a flat typed schema. Malformed strings yield zero rows
  * (PERMISSIVE null-out) rather than failing the batch — at 100 TB a poison
  * message must not kill the pipeline. HTTP polling itself is driver-side
  * I/O plumbing, out of scope; this is the data path it feeds.
  */
object JsonFeed {

  /** One SWIM flight message (simplified to the fields the reference's
    * MessageToFlightSkeleton actually consumes).
    */
  val flightSchema: StructType = StructType.fromDDL(
    """source STRING, timestamp STRING,
       flightIdentification STRUCT<computerId: DOUBLE, aircraftIdentification: STRING>,
       enRoute STRUCT<position: STRUCT<positionTime: STRING,
         position: STRUCT<location: STRUCT<pos: STRING>>,
         altitude: STRUCT<content: DOUBLE>,
         actualSpeed: STRUCT<surveillance: STRUCT<content: DOUBLE>>>>""")

  private def envelope(message: DataType): StructType = StructType(Seq(
    StructField("ns5:MessageCollection", StructType(Seq(
      StructField("message", message))))))

  private val messageStruct = StructType(Seq(StructField("flight", flightSchema)))

  /** Parse a raw JSON-string column into flat flight-point rows:
    * (callsign, computer_id, source, pos_time, lat, lon, alt, speed).
    * Strings may be multi-message, single-message, or garbage (dropped).
    *
    * The two-`from_json` form IS the live path (restored r16): the
    * envelope's `message` is an array in the multi-message form and a
    * bare object in the single-message form, parsed multi-first like the
    * reference — the single parse of a multi string nulls out (array vs
    * object) and vice versa, and `coalesce` SHORT-CIRCUITS in codegen,
    * so only single-form rows (~half the feed) pay the failed multi
    * tokenization: ~1.5 tokenizations/row amortized, not 2. The r15
    * variant single-parse rewrite ([[parseFlightsVariant]]) measured
    * SLOWER once its array semantics were made honest (FeedProbe r16
    * same-JVM interleaved A/Bs: strict variant 3.91 s vs double 3.35 s,
    * and 2.86 vs 2.52 on the per-element form) — the variant binary
    * build plus the strict-array casts cost more than the ~0.5 wasted
    * tokenizations they replace. Malformed strings yield zero rows
    * (PERMISSIVE null-out), never fail the batch.
    */
  def parseFlights(raw: DataFrame, jsonCol: String): DataFrame = {
    val multi = from_json(col(jsonCol), envelope(ArrayType(messageStruct)))
    val single = from_json(col(jsonCol), envelope(messageStruct))
    val msgs = coalesce(
      multi.getField("ns5:MessageCollection").getField("message"),
      array(single.getField("ns5:MessageCollection").getField("message")))
    raw.select(explode(msgs).as("m"))
      .select(col("m.flight").as("f"))
      .where(col("f").isNotNull)
      .select(
        col("f.flightIdentification.aircraftIdentification").as("callsign"),
        col("f.flightIdentification.computerId").cast("int").as("computer_id"),
        col("f.source").as("source"),
        to_timestamp(col("f.enRoute.position.positionTime")).as("pos_time"),
        // get(), not getItem(): ANSI getItem THROWS on out-of-range, so a
        // single-token pos string would kill the batch — the poison rule
        // says drop, never fail (r16 VariantSemanticsProbe crash)
        get(split(col("f.enRoute.position.position.location.pos"), " "),
          lit(0)).cast("double").as("lat"),
        get(split(col("f.enRoute.position.position.location.pos"), " "),
          lit(1)).cast("double").as("lon"),
        col("f.enRoute.position.altitude.content").as("alt"),
        col("f.enRoute.position.actualSpeed.surveillance.content").as("speed"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
  }

  /** The r15 variant single-parse EXPERIMENT — kept as [[parseFlights]]'s
    * semantics twin, NOT the live path (it measured slower, see the
    * [[parseFlights]] scaladoc). `try_parse_json` tokenizes once to a
    * VARIANT, `variant_get` addresses the envelope (the `ns5:` prefixed
    * key parses in the quoted `$['ns5:MessageCollection']` path segment),
    * and the two shapes are `try_variant_get` casts over the parsed
    * binary.
    *
    * STRICT array semantics (r16, the r15 ADVICE item): a bare
    * `ARRAY<STRUCT>` variant cast nulls failing ELEMENTS individually,
    * so a mixed-validity array ([valid, 5]) would leak its valid
    * element — the from_json twin PERMISSIVE-nulls the whole record and
    * the reference's Go unmarshal of []Message fails the whole slice.
    * The whole-array cast stays ONE codegen'd cast; strictness is a
    * cheap zip against the raw `ARRAY<VARIANT>` slices — an element
    * whose cast slot is null yet was NOT a JSON null failed the cast and
    * poisons the WHOLE array. An explicit JSON null element is benign
    * for both engines. The parse and both cast arrays are projected
    * separately (multi-referenced, non-cheap — CollapseProject keeps the
    * barriers) so each evaluates once per row (plan-pinned: one
    * parseJson site). JsonFeedSpec pins row equality with
    * [[parseFlights]] on the full envelope battery.
    */
  private[graft] def parseFlightsVariant(raw: DataFrame, jsonCol: String): DataFrame = {
    val msgDdl = messageStruct.sql // STRUCT<flight: ...> from the schema
    val msg = variant_get(try_parse_json(col(jsonCol)),
      "$['ns5:MessageCollection'].message", "variant")
    val anyBad = exists(
      zip_with(col("arr"), col("rawArr"),
        (m, r) => m.isNull && !is_variant_null(r)),
      x => x)
    val multi = when(!anyBad, col("arr"))
    val single = try_variant_get(col("msg"), "$", msgDdl)
    raw.select(msg.as("msg"))
      .select(col("msg"),
        try_variant_get(col("msg"), "$", s"ARRAY<$msgDdl>").as("arr"),
        try_variant_get(col("msg"), "$", "ARRAY<VARIANT>").as("rawArr"))
      .select(explode(coalesce(multi, array(single))).as("m"))
      .select(col("m.flight").as("f"))
      .where(col("f").isNotNull)
      .select(
        col("f.flightIdentification.aircraftIdentification").as("callsign"),
        col("f.flightIdentification.computerId").cast("int").as("computer_id"),
        col("f.source").as("source"),
        to_timestamp(col("f.enRoute.position.positionTime")).as("pos_time"),
        // get(), not getItem(): same ANSI out-of-range rule as parseFlights
        get(split(col("f.enRoute.position.position.location.pos"), " "),
          lit(0)).cast("double").as("lat"),
        get(split(col("f.enRoute.position.position.location.pos"), " "),
          lit(1)).cast("double").as("lon"),
        col("f.enRoute.position.altitude.content").as("alt"),
        col("f.enRoute.position.actualSpeed.surveillance.content").as("speed"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
  }

  /** fr24-style compact-array feed (reference: fr24/fr24.go:210
    * ParseCurrentList; record layout documented at fr24.go:159-171): the
    * envelope is `{"full_count":N,"version":V,"aircraft":[[...],[...]]}`
    * where each aircraft is a 19-element HETEROGENEOUS array —
    * [id, modeS, lat, lon, track, alt, speed, squawk, radar, equipType,
    * registration, epoch, origin, destination, flightNumber, onGround,
    * verticalSpeed, callsign, _] — strings and numbers mixed positionally.
    *
    * Spark form: `from_json` reads each aircraft as `array<string>` (the
    * parser preserves any scalar token as its text), then positional
    * `get()` + `try_cast` project the typed columns — both null-safe, so a
    * short row, a swapped type, or outright garbage nulls out instead of
    * failing the batch (same poison rule as the SWIM path). One scan, no
    * UDFs, fully parallel over the raw-string table.
    */
  val fr24Envelope: StructType = StructType(Seq(
    StructField("full_count", LongType),
    StructField("version", LongType),
    StructField("aircraft", ArrayType(ArrayType(StringType)))))

  def parseFr24List(raw: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), fr24Envelope)
    def str(i: Int): Column = get(col("a"), lit(i))
    def dbl(i: Int): Column = expr(s"try_cast(get(a, $i) AS DOUBLE)")
    raw.select(explode(parsed.getField("aircraft")).as("a"))
      .select(
        str(0).as("fr_id"),
        str(1).as("icao_id"),
        dbl(2).as("lat"),
        dbl(3).as("lon"),
        dbl(4).as("track"),
        dbl(5).as("alt"),
        dbl(6).as("speed"),
        str(7).as("squawk"),
        str(8).as("radar"),
        str(9).as("equip_type"),
        str(10).as("registration"),
        timestamp_seconds(expr("try_cast(get(a, 11) AS BIGINT)")).as("pos_time"),
        str(12).as("origin"),
        str(13).as("destination"),
        str(14).as("flight_number"),
        (dbl(15) =!= 0.0).as("on_ground"),
        dbl(16).as("vertical_speed"),
        str(17).as("callsign"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
  }

  // ---------------------------------------------------------------------------
  // FlightAware FlightXML (reference fa/fa.go, fa/types.go)
  // ---------------------------------------------------------------------------

  /** FlightXML GetHistoricalTrack envelope (fa/types.go:40):
    * `{"GetHistoricalTrackResult": {"data": [{...TrackStruct}]}}`.
    */
  val faTrackEnvelope: StructType = StructType(Seq(
    StructField("GetHistoricalTrackResult", StructType(Seq(
      StructField("data", ArrayType(StructType.fromDDL(
        """altitude BIGINT, altitudeChange STRING, altitudeStatus STRING,
           groundspeed BIGINT, latitude DOUBLE, longitude DOUBLE,
           timestamp BIGINT, updateType STRING"""))))))))

  /** Decode FlightXML GetHistoricalTrack responses to typed track points.
    * `trusted` mirrors fa/types.go:66 DataCanBeTrusted: only actual
    * surveillance positions ("TA"/"A" — ADS-B) qualify; projected ("TP")
    * and radar ("TZ") points carry the flag false so downstream sanity
    * filters (§2.19) can drop them relationally. FlightXML altitudes are
    * in hundreds of feet. Poison rule as the other feeds: malformed JSON
    * or missing positions null out and are dropped, never fail the batch.
    */
  def parseFaTrack(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(
        from_json(col(jsonCol), faTrackEnvelope)
          .getField("GetHistoricalTrackResult").getField("data")).as("p"))
      .select(
        timestamp_seconds(col("p.timestamp")).as("pos_time"),
        col("p.latitude").as("lat"),
        col("p.longitude").as("lon"),
        (col("p.altitude") * 100).as("alt"),
        col("p.groundspeed").as("speed"),
        col("p.updateType").as("update_type"),
        col("p.updateType").isin("TA", "A").as("trusted"))
      .where(col("lat").isNotNull && col("lon").isNotNull)

  /** FlightXML FlightInfoEx envelope (fa/types.go:5): flight metadata —
    * `{"FlightInfoExResult": {"flights": [{...}], "next_offset": N}}`.
    * Epoch fields of -1/0 (FlightXML's "not yet known") become null
    * timestamps rather than 1970 artifacts.
    */
  val faFlightInfoEnvelope: StructType = StructType(Seq(
    StructField("FlightInfoExResult", StructType(Seq(
      StructField("flights", ArrayType(StructType.fromDDL(
        """faFlightID STRING, ident STRING, aircrafttype STRING,
           origin STRING, destination STRING, route STRING,
           filed_departuretime BIGINT, actualdeparturetime BIGINT,
           estimatedarrivaltime BIGINT, actualarrivaltime BIGINT,
           filed_altitude BIGINT, diverted STRING"""))),
      StructField("next_offset", LongType))))))

  def parseFaFlightInfo(raw: DataFrame, jsonCol: String): DataFrame = {
    def epoch(c: Column): Column =
      when(c > 0, timestamp_seconds(c))
    raw.select(explode(
        from_json(col(jsonCol), faFlightInfoEnvelope)
          .getField("FlightInfoExResult").getField("flights")).as("f"))
      .select(
        col("f.faFlightID").as("fa_flight_id"),
        col("f.ident").as("callsign"),
        col("f.aircrafttype").as("equip_type"),
        col("f.origin").as("origin"),
        col("f.destination").as("destination"),
        col("f.route").as("route"),
        epoch(col("f.filed_departuretime")).as("filed_departure"),
        epoch(col("f.actualdeparturetime")).as("actual_departure"),
        epoch(col("f.estimatedarrivaltime")).as("estimated_arrival"),
        epoch(col("f.actualarrivaltime")).as("actual_arrival"),
        col("f.filed_altitude").as("filed_altitude"))
      .where(col("fa_flight_id").isNotNull)
  }

  // ---------------------------------------------------------------------------
  // ADS-B Exchange VirtualRadar list (reference aex/aex.go:53 LiveQuery,
  // aex/types.go:3 LiveQueryResponse / :8 AExAircraft)
  // ---------------------------------------------------------------------------

  /** The AircraftList.json envelope: `{"acList": [{...AExAircraft}]}` with
    * the fields aex.go:90 ToAircraftData actually consumes.
    */
  val aexEnvelope: StructType = StructType(Seq(
    StructField("acList", ArrayType(StructType.fromDDL(
      """Icao STRING, Call STRING, Reg STRING, Type STRING, OpIcao STRING,
         Alt DOUBLE, GAlt DOUBLE, Spd DOUBLE, Vsi DOUBLE, Trak DOUBLE,
         Lat DOUBLE, Long DOUBLE, PosTime DOUBLE, Mlat BOOLEAN,
         Gnd BOOLEAN, Rcvr DOUBLE, From STRING, To STRING""")))))

  /** Decode an ADS-B Exchange aircraft list to typed rows, mirroring
    * ToAircraftData's projections: PosTime is float epoch MILLIS truncated
    * to seconds (aex.go:92), `msg_type` is "MLAT" when the position was
    * multilaterated and "MSG" (ADS-B) otherwise (aex.go:114), and the
    * origin/destination airport codes extract "KXXX ..." → "XXX"
    * (aex.go:82 toIcaoAirport — non-K descriptions yield null, as the
    * reference yields ""). Numeric fields arrive as JSON doubles and cast
    * to the reference's integer widths.
    */
  def parseAexList(raw: DataFrame, jsonCol: String): DataFrame = {
    def icaoAirport(c: Column): Column = {
      val m = regexp_extract(c, "^K([A-Z]{3})\\s", 1)
      when(m =!= "", m)
    }
    raw.select(explode(
        from_json(col(jsonCol), aexEnvelope).getField("acList")).as("a"))
      .select(
        col("a.Icao").as("icao_id"),
        col("a.Call").as("callsign"),
        col("a.Reg").as("registration"),
        col("a.Type").as("equip_type"),
        col("a.OpIcao").as("op_icao"),
        timestamp_seconds((col("a.PosTime") / 1000.0).cast("long")).as("pos_time"),
        col("a.Lat").as("lat"),
        col("a.Long").as("lon"),
        col("a.Alt").cast("long").as("alt"),
        col("a.Spd").cast("long").as("speed"),
        col("a.Vsi").cast("long").as("vertical_rate"),
        col("a.Trak").cast("long").as("track"),
        when(col("a.Mlat"), "MLAT").otherwise("MSG").as("msg_type"),
        coalesce(col("a.Gnd"), lit(false)).as("on_ground"),
        icaoAirport(col("a.From")).as("origin"),
        icaoAirport(col("a.To")).as("destination"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
  }
}
