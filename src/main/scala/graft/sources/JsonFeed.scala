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
}
