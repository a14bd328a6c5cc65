package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identity parsing — flightdb's callsign.go / idspec.go as pure column
  * functions (regex classes + composite-key split), fully codegen'd.
  * Classification and normalization rules mirror callsign_test.go:
  * N761QA→Registration, UAL100→IcaoFlightNumber, 987→BareFlightNumber,
  * VRD010→VRD10 (zero padding stripped), SKW750R→SKW750 (suffix stripped),
  * "-.-.-."→Junk.
  */
object Identity {

  private val RegistrationRe = "^N[0-9][0-9A-Z]*$"
  private val IcaoRe = "^[A-Z]{3}[0-9]+[A-Z]?$"
  private val BareRe = "^[0-9]+$"

  /** Callsign classification (callsign.go CallsignType). */
  def callsignClass(callsign: Column): Column =
    when(callsign.rlike(RegistrationRe), "registration")
      .when(callsign.rlike(IcaoRe), "icao_flight")
      .when(callsign.rlike(BareRe), "bare_number")
      .otherwise("junk")

  /** Normalized form (callsign.go String()): ICAO flight numbers lose zero
    * padding on the number and any single-letter suffix; other classes pass
    * through unchanged.
    */
  def normalizeCallsign(callsign: Column): Column =
    when(callsign.rlike(IcaoRe),
      concat(regexp_extract(callsign, "^([A-Z]{3})", 1),
        regexp_extract(callsign, "([0-9]+)", 1).cast("long").cast("string")))
      .otherwise(callsign)

  /** ICAO carrier prefix of a flight-number callsign (callsign.go
    * IcaoPrefix), null for other classes.
    */
  def icaoPrefix(callsign: Column): Column =
    when(callsign.rlike(IcaoRe), substring(callsign, 1, 3))

  /** IdSpec composite keys (idspec.go: "ident@epoch"). */
  def idspec(ident: Column, epochSec: Column): Column =
    concat(ident, lit("@"), epochSec.cast("string"))

  def idspecIdent(spec: Column): Column = split(spec, "@").getItem(0)
  def idspecEpoch(spec: Column): Column = split(spec, "@").getItem(1).cast("long")
}
