package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch sources/sinks — the flightdb ingest + export surface re-expressed
  * for a lake layout (bigquery.go's analytic export; foia.go's CSV import).
  */
object Sinks {

  /** Date-partitioned parquet export (bigquery.go analog). Partitioning by
    * day keeps scans partition-prunable; at 100 TB add a second bucket
    * column on the series key for co-located per-key reads.
    */
  def writePartitionedByDay(df: DataFrame, tsNanosCol: String, path: String): Unit =
    df.withColumn("day", to_date(timestamp_micros(expr(s"$tsNanosCol div 1000"))))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Incremental refresh of a day-partitioned table: overwrite ONLY the
    * day partitions present in `df`, leaving every other partition's
    * files untouched (per-write `partitionOverwriteMode=dynamic`; the
    * static default would truncate the whole table). This is the daily
    * backfill/correction shape — at 100 TB the recompute cost tracks the
    * CHANGED days, not the table, and downstream readers see unchanged
    * files (and their caches/row-group stats) for every other day.
    */
  def refreshDays(df: DataFrame, tsNanosCol: String, path: String): Unit =
    df.withColumn("day", to_date(timestamp_micros(expr(s"$tsNanosCol div 1000"))))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)

  /** Small-file compaction (the OPTIMIZE job) for a day-partitioned
    * table: rewrite the selected day partitions with one shuffle task
    * per day and `maxRecordsPerFile` as the split rule, so each day ends
    * up with ceil(rows/target) right-sized files. Every ingest cadence
    * eventually needs this — streaming and incremental refreshes
    * accumulate files whose per-file overhead (footers, open costs, task
    * scheduling) dominates scans long before data size does.
    *
    * `days` empty = whole table. Only the selected partitions are
    * rewritten (dynamic overwrite); everything else keeps its files
    * byte-identical. The read is materialized (`localCheckpoint`) before
    * the overwrite because Spark refuses to overwrite a path its plan
    * still reads; a production table format would instead write new
    * files and swap atomically in metadata — this is the data-plane
    * demo of that job.
    */
  def compactDays(spark: SparkSession, path: String,
                  targetRecordsPerFile: Long, days: Seq[String] = Nil): Unit = {
    val all = spark.read.parquet(path)
    val selected = if (days.isEmpty) all
                   else all.where(col("day").isin(days: _*))
    selected.repartition(col("day")).localCheckpoint()
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", targetRecordsPerFile.toString)
      .partitionBy("day")
      .parquet(path)
  }

  /** Schema'd CSV ingest (app/backend/foia.go analog): explicit schema — no
    * inference pass over 100 TB — permissive mode with a corrupt-record
    * column, so bad rows are quarantined, not dropped.
    */
  val trackpointCsvSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts_us", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("_corrupt", StringType)))

  def readTrackpointCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(trackpointCsvSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** FAA FOIA track-dump ingest (faadata/row.go): header-named CSV whose
    * layout varies by dump, ALTITUDEx100ft scaled to feet, and the split
    * TRACK_POINT_DATE_UTC ("yyyyMMdd") + TRACK_POINT_TIME_UTC ("HH:mm:ss")
    * fused into one timestamp (`ts` in epoch nanos to match the engine's
    * time axis). Header-driven (`header=true`) so extra columns like
    * USER_CLASS pass through untouched — the reference's map-of-header
    * approach, relationally.
    */
  def readFoiaCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .csv(path)
      .withColumn("altitude_ft",
        col("ALTITUDEx100ft").cast(DoubleType) * 100.0)
      .withColumn("ts",
        unix_timestamp(
          concat(col("TRACK_POINT_DATE_UTC"), lit(" "), col("TRACK_POINT_TIME_UTC")),
          "yyyyMMdd HH:mm:ss").cast("long") * 1000000000L)
      .withColumn("lat", col("LATITUDE").cast(DoubleType))
      .withColumn("lon", col("LONGITUDE").cast(DoubleType))

  /** Bucketed catalog sink: hash-bucket by the series key (and sort within
    * buckets) so REPEATED joins/aggregations on that key are exchange-free —
    * the scan itself reports HashPartitioning(key, nBuckets) and the planner
    * drops the shuffle on both sides of a same-bucketing join
    * (spec-asserted: zero Exchange nodes in the joined plan). At 100 TB this
    * is the difference between shuffling the fact table once per query and
    * never: pay one shuffle at write time, amortize it over every read.
    * Pair with `writePartitionedByDay`-style date partitions for pruning +
    * co-location together.
    */
  def writeBucketed(df: DataFrame, key: String, nBuckets: Int,
                    table: String, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
    // explicit path = external table (callers own the artifact location);
    // default stays the session warehouse
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

  /** Match-list CSV export (report/listmatches.go:27 ListReporter +
    * report/csv.go OutputAsCSV): the "flights that matched the report's
    * restrictions, one flat row per match/intersection, as a file a
    * spreadsheet can open" path. Header row on, timestamps rendered as
    * text (CSV has no types), deterministic column order = the caller's
    * select order. `orderCols` sorts the output (the reference emits rows
    * in report iteration order; a distributed sink needs an explicit sort
    * to be reproducible) — pass the match keys. Coalesce to one file only
    * when `singleFile` (the reference streams one HTTP response; at
    * 100 TB leave many parts and let the object store concatenate).
    */
  def writeMatchListCsv(df: DataFrame, path: String, orderCols: Seq[String],
                        singleFile: Boolean = false): Unit = {
    val ordered = if (orderCols.nonEmpty) df.orderBy(orderCols.map(col): _*) else df
    (if (singleFile) ordered.coalesce(1) else ordered)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)
  }

  /** JSONL training-data export — the interchange format every LLM data
    * loader reads (one JSON object per line, shard files, optional
    * shard-size cap). `shardBy` hash-repartitions on a deterministic key
    * so a doc's shard assignment is stable across reruns/retries (the
    * §2.50 membership discipline applied to file layout — rerunning the
    * export after appending docs moves as few docs as the hash does, not
    * all of them the way round-robin would); `maxRecordsPerFile` bounds
    * shard size for loader-side streaming. Nested columns serialize as
    * nested JSON; binary columns should be dropped or base64'd by the
    * caller first (JSON has no bytes type — Spark emits base64 for
    * BinaryType, which is the JSONL convention anyway).
    */
  def writeJsonl(df: DataFrame, path: String, shardBy: String,
                 nShards: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(nShards >= 1)
    val sharded = df.repartition(nShards, col(shardBy))
    val w = sharded.write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else w)
      .json(path)
  }

  /** Read back a JSONL export with an explicit schema (no inference pass
    * — the trackpointCsvSchema rule): malformed lines are quarantined in
    * `_corrupt`, not dropped silently and never fatal.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}
