package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identity parsing — flightdb's callsign.go / idspec.go as pure column
  * functions (regex classes + composite-key split), usable in any plan and
  * fully codegen'd.
  */
object Identity {

  /** Callsign classification (callsign.go CallsignType): registration
    * (letters + N-prefix tail number), ICAO flight number (3-letter carrier
    * + digits), bare number, else other.
    */
  def callsignClass(callsign: Column): Column =
    when(callsign.rlike("^[A-Z]{3}N[0-9]+$"), "registration")
      .when(callsign.rlike("^[A-Z]{3}[0-9]+$"), "icao_flight")
      .when(callsign.rlike("^[0-9]+$"), "bare_number")
      .otherwise("other")

  /** ICAO carrier prefix of a flight-number callsign (callsign.go
    * IcaoPrefix), null for other classes.
    */
  def icaoPrefix(callsign: Column): Column =
    when(callsignClass(callsign) === "icao_flight", substring(callsign, 1, 3))

  /** IdSpec composite keys (idspec.go: "ident@epoch"). */
  def idspec(ident: Column, epochSec: Column): Column =
    concat(ident, lit("@"), epochSec.cast("string"))

  def idspecIdent(spec: Column): Column = split(spec, "@").getItem(0)
  def idspecEpoch(spec: Column): Column = split(spec, "@").getItem(1).cast("long")
}
