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
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; we read it as raw nanosecond longs instead (exact, no
    * truncation) and convert explicitly where needed. Runtime-settable conf.
    */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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

  /** events with `ts` as BIGINT nanoseconds since epoch (column name kept). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    configure(spark)
    load(spark, dir, "events")
  }
}
