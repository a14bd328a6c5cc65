package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed domain model — the flightdb data model (trackpoint.go:12 Trackpoint,
  * flight.go:12 Flight, condensed.go:20 CondensedFlight) as case classes with
  * Spark Encoders, for pipelines that want compile-time safety over the
  * generic DataFrame operators.
  */
final case class TrackPoint(
    user_id: Long,      // airframe key (Identity.IcaoId analog)
    ts: Long,           // TimestampUTC as epoch nanos
    event_type: String, // DataSource analog
    value: Double,      // Altitude-channel analog
    event_id: Long)     // stable tiebreaker

/** CondensedFlight analog: the compact per-series summary. */
final case class CondensedSeries(
    user_id: Long,
    start_us: Long,
    end_us: Long,
    n_points: Long,
    tags: Seq[String],
    value_sum: Double)

object Model {

  /** Typed view over the events table. */
  def trackPoints(spark: SparkSession, dir: String): Dataset[TrackPoint] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select("user_id", "ts", "event_type", "value", "event_id")
      .as[TrackPoint]
  }

  /** Flight.Condense (condensed.go:55) with a typed result. */
  def condense(points: Dataset[TrackPoint]): Dataset[CondensedSeries] = {
    import points.sparkSession.implicits._
    points.groupBy("user_id")
      .agg(
        expr("min(ts) div 1000").as("start_us"),
        expr("max(ts) div 1000").as("end_us"),
        count(lit(1)).as("n_points"),
        array_sort(collect_set("event_type")).as("tags"),
        sum("value").as("value_sum"))
      .as[CondensedSeries]
  }
}
