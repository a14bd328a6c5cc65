package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) statistics by pure rank selection — the outlier
  * screen that, unlike mean/stddev z-scores, a single corrupt feed value
  * cannot drag (flightdb's sanity filters solve the same problem with
  * fixed physical bounds; MAD learns the bounds per group).
  *
  * Cross-engine discipline: median and MAD are EXACT order statistics
  * selected at integer ranks ((n−1) div 2 + 1 over a (value, tie) total
  * order — the q_quantile_sample rule); the only arithmetic ever applied
  * to a data value is |x − med| and one multiply for the cut, each a
  * single IEEE op in fixed order, so a DuckDB oracle reproduces cuts and
  * flags bit-identically. Interpolating medians or stddev would re-derive
  * doubles and drift.
  */
object Robust {

  /** Per-group (median, MAD): two rank-selection passes (the second over
    * |x − median|). Each pass is one group-partitioned window — run it on
    * the deterministic hash SAMPLE at scale (the q_quantile_sample
    * memory rule: the sort is over the sample, the sample is the knob).
    */
  def madCuts(df: DataFrame, group: String, value: String, tie: String): DataFrame = {
    val wg = Window.partitionBy(col(group))
    val w1 = wg.orderBy(col(value).asc, col(tie).asc)
    val med = df
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(wg))
      .groupBy(col(group))
      .agg(max(when(col("rn") === expr("(n - 1) div 2 + 1"), col(value))).as("med"))
    val dd = df.join(med, group)
      .withColumn("_d", abs(col(value) - col("med")))
    val w2 = wg.orderBy(col("_d").asc, col(tie).asc)
    dd.withColumn("rn", row_number().over(w2))
      .withColumn("n", count(lit(1)).over(wg))
      .groupBy(col(group))
      .agg(min(col("med")).as("med"),
        max(when(col("rn") === expr("(n - 1) div 2 + 1"), col("_d"))).as("mad"))
  }
}
