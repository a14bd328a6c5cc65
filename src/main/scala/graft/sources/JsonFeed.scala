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
    */
  def parseFlights(raw: DataFrame, jsonCol: String): DataFrame = {
    val multi = from_json(col(jsonCol), envelope(ArrayType(messageStruct)))
    val single = from_json(col(jsonCol), envelope(messageStruct))
    // multi-first like the reference: the single parse of a multi string
    // nulls out (array vs object), and vice versa — coalesce picks whichever
    // shape matched
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
        split(col("f.enRoute.position.position.location.pos"), " ")
          .getItem(0).cast("double").as("lat"),
        split(col("f.enRoute.position.position.location.pos"), " ")
          .getItem(1).cast("double").as("lon"),
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
}
