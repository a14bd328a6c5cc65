package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The flightdb query layer (fgae/db.go + fquery.go) over a lake layout:
  * a day-partitioned parquet store with the reference's lookup surface —
  * by time range, by key, by idspec, recent-N.
  *
  * The reference leans on Datastore's Timeslots index
  * (fgae/fquery.go:27 ByTime / ByTimeRange); here day partitions play the
  * timeslot index: every lookup prunes partitions first (visible as
  * PartitionFilters in the scan), then pushes the fine-grained predicate.
  * At 100 TB add `.repartition(col("user_id"))` before write so each
  * partition's files are key-clustered for secondary row-group skipping.
  */
final case class Store(spark: SparkSession, path: String) {

  /** Ingest a batch of points (ts = BIGINT nanos). Mirrors
    * fgae/addtrackfragment.go's persist step, batch-shaped.
    */
  def persist(df: DataFrame, mode: SaveMode = SaveMode.Append): Unit =
    df.withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      .repartition(col("user_id"))
      .write.mode(mode).partitionBy("day").parquet(path)

  def all(): DataFrame = spark.read.parquet(path)

  /** ByTimeRange (fquery.go:34): [startNs, endNs). Day-partition pruning +
    * pushed ts filter.
    */
  def byTimeRange(startNs: Long, endNs: Long): DataFrame =
    all()
      .where(col("day") >= to_date(timestamp_micros(lit(startNs / 1000))) &&
        col("day") <= to_date(timestamp_micros(lit(endNs / 1000))))
      .where(col("ts") >= startNs && col("ts") < endNs)

  /** ByIcaoId analog (fquery.go:50). */
  def byKey(userId: Long): DataFrame = all().where(col("user_id") === userId)

  /** ByIdSpec (idspec.go: "key@epochSec", optional duration): the key's
    * points within [epoch, epoch + durSec).
    */
  def byIdSpec(spec: String, durSec: Long = 3600L): DataFrame = {
    val Array(key, epoch) = spec.split("@")
    val startNs = epoch.toLong * 1000000000L
    byTimeRange(startNs, startNs + durSec * 1000000000L)
      .where(col("user_id") === key.toLong)
  }

  /** QueryForRecent (fquery.go:96): latest n points per key, or of one key. */
  def recent(n: Int): DataFrame =
    graft.operators.TimeSeries.topNPerKey(all(),
      Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc), n)
}
