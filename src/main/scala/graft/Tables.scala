package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * Single chokepoint for scan configuration so every query benefits from
  * column pruning + filter pushdown (verified via `.explain`: PushedFilters /
  * ReadSchema). At 100 TB these would be partitioned/bucketed external tables;
  * the loaders keep that swap localized.
  */
object Tables {
  /** Historically `events.ts` was parquet INT64 TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects — `nanosAsLong` reads it as raw
    * nanosecond longs (exact, no truncation). Current testdata ships
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) instead, which Spark reads as
    * TIMESTAMP_NTZ; [[events]] normalizes either encoding to the same BIGINT
    * nanoseconds so every downstream query is schema-agnostic. The UTC pin
    * makes the NTZ→epoch conversion deterministic (and matches DuckDB's
    * epoch_ns/epoch_us on naive timestamps). Runtime-settable confs.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Memoized row counts of the immutable sf parquet tables — a scalar
  // TABLE STAT (the production shape is the catalog's rowCount), shared so
  // the ~30 lanes sizing index geometry from n (autoCells/autoPlanes/
  // ivf2Geom/fhDimOf) pay ONE count action per (session, dir, table)
  // instead of one ~166 ms scheduler-floor job each (JobCountProbe, r11).
  // Keyed by dir: scale probes' replicated corpora get fresh counts.
  private val countLock = new Object
  private val countCache =
    scala.collection.mutable.Map[(SparkSession, String, String), Long]()
  def countOf(spark: SparkSession, dir: String, name: String): Long =
    countLock.synchronized {
      countCache.getOrElseUpdate((spark, dir, name),
        load(spark, dir, name).count())
    }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** documents spread across all cores BEFORE heavy per-row work (per-char
    * hash folds, shingling, per-bit sign sums — interpreted HOF chains, the
    * priciest per-row code in the engine). A small parquet arrives as one
    * split, which would serialize all of that onto a single task; one linear
    * shuffle of the raw text is negligible next to the downstream per-char
    * work at any scale, and on a real multi-split table the exchange simply
    * rebalances skewed splits.
    */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)

  /** Spread `df` across all cores ONLY when it arrives with fewer
    * partitions than the session's parallelism (r16, the r15 verdict
    * item): an unconditional `repartition(defaultParallelism)` is tuned
    * to the local single-split case — on a cluster where the scan
    * already has ≥ cores splits it forces a full exchange for nothing
    * and can COALESCE a many-split input down to defaultParallelism.
    * The partition count comes from the physical plan (no job runs);
    * when the input is already wide the frame is returned untouched, so
    * the plan carries no Exchange at all (SpreadSpec pins both sides).
    * At the driver's sf scale a small parquet is one split, so sf plans
    * keep the exchange exactly as before.
    */
  def spreadIfNarrow(spark: SparkSession, df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df

  /** events with `ts` as BIGINT nanoseconds since epoch (column name kept),
    * whatever the on-disk timestamp encoding:
    *   - INT64 TIMESTAMP(NANOS) → read as raw longs via `nanosAsLong` (exact);
    *   - TIMESTAMP(MICROS/MILLIS), adjusted-to-UTC or NTZ → epoch micros
    *     ×1000 (exact widening; the cast NTZ→TZ is identity under the UTC
    *     session pin, mirroring DuckDB's epoch_* on naive timestamps).
    * Scan-stage projection only — pushdown/pruning on the other columns is
    * unaffected, and `ts` predicates still prune via the projected column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    configure(spark)
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ =>
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }
}
