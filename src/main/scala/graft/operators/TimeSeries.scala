package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Track/time-series operators, re-expressed as declarative Spark plans.
  *
  * The reference (skypies/flightdb) walks one track at a time in Go
  * (track.go: PostProcess, SampleEvery, TrimToTimes, WindowedAverageAt;
  * addtrackfragment.go: fragment gluing). Here each operator is a single
  * window/aggregation pass partitioned by the series key, so on a cluster the
  * work shuffles once by key and scales linearly — no per-series driver loops.
  *
  * All operators take explicit key/time column names so they work over any
  * long-format table (here: `events(user_id, ts, ...)` with ts in ns).
  */
object TimeSeries {

  /** Total order within a series: (time, tieBreaker). A deterministic total
    * order is load-bearing for every window op below (and for the DuckDB
    * oracle hash-compare).
    */
  private def ord(time: String, tie: String): Seq[Column] = Seq(col(time), col(tie))

  /** Sessionization with a max-gap rule — the Spark form of flightdb's track
    * gluing (track.go:25 kExtensionMaxGap = 10 min; PlausibleExtension).
    * A new session starts when the gap to the previous point exceeds
    * `maxGapNanos`. One shuffle (by key), two window passes, no state loops.
    *
    * Adds columns: `session_id` (1-based per key), keeps all input columns.
    */
  def sessionize(df: DataFrame, key: String, time: String, tie: String,
                 maxGapNanos: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
    df.withColumn("_prev_t", lag(col(time), 1).over(w))
      .withColumn("_new", when(col("_prev_t").isNull ||
        col(time) - col("_prev_t") > maxGapNanos, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_t", "_new")
  }

  /** Per-point derived kinematics via lag — flightdb Track.PostProcess
    * (track.go:195): inter-point duration, value delta, and rate of change.
    * `dt_us` BIGINT micros; `rate` = dvalue / seconds.
    */
  def kinematics(df: DataFrame, key: String, time: String, tie: String,
                 value: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
    df.withColumn("_pt", lag(col(time), 1).over(w))
      .withColumn("_pv", lag(col(value), 1).over(w))
      // truncate each side to micros BEFORE subtracting (matches epoch_us
      // semantics; floor(a/k)-floor(b/k) != floor((a-b)/k) in general)
      .withColumn("dt_us", expr(s"($time div 1000) - (_pt div 1000)"))
      .withColumn("dvalue", col(value) - col("_pv"))
      .withColumn("rate", col("dvalue") / (col("dt_us") / lit(1000000.0)))
      .drop("_pt", "_pv")
  }

  /** Cumulative travelled "distance" along a series — flightdb
    * DistanceTravelledKM (track.go:216): running sum of |Δvalue| in time order.
    */
  def cumulativeDistance(df: DataFrame, key: String, time: String, tie: String,
                         value: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_pv", lag(col(value), 1).over(w))
      .withColumn("_step", when(col("_pv").isNull, 0.0).otherwise(abs(col(value) - col("_pv"))))
      .withColumn("cum_dist", sum(col("_step")).over(cum))
      .drop("_pv", "_step")
  }

  /** Keep the first point of each fixed time bucket — flightdb
    * Track.SampleEvery (track.go:604), but expressed so it needs no sequential
    * scan: bucket by `floor(t / step)`, keep min-ordered row per bucket.
    */
  def sampleEvery(df: DataFrame, key: String, time: String, tie: String,
                  stepNanos: Long): DataFrame = {
    val bucket = floor(col(time) / stepNanos).cast("long")
    val w = Window.partitionBy(col(key), bucket).orderBy(ord(time, tie): _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Trailing moving average over the last `nRows` rows (inclusive) —
    * flightdb Track.WindowedAverageAt (track.go:530) in its scalable,
    * rows-window form.
    */
  def trailingAvg(df: DataFrame, key: String, time: String, tie: String,
                  value: String, nRows: Int, out: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    df.withColumn(out, avg(col(value)).over(w))
  }

  /** As-of lookup inside one stream: for every row, the most recent preceding
    * value of rows matching `sourcePred` — the Spark form of flightdb's METAR
    * Lookup (metar/metar.go; flight.go:276 ComputeIndicatedAltitudes).
    *
    * This is the scalable as-of pattern: no per-row subquery or point lookup —
    * one shuffle by key, one ordered window pass with last(ignoreNulls).
    * To as-of join two tables at 100 TB: union them with a side marker and
    * apply this same window (linear, skew-safe with AQE).
    */
  def asOfLast(df: DataFrame, key: String, time: String, tie: String,
               sourcePred: Column, sourceValue: Column, out: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(when(sourcePred, sourceValue), ignoreNulls = true).over(w))
  }

  /** Two-table as-of join — the general form of metar.Archive.Lookup
    * (metar/metar.go): for every left row, the latest right row with the
    * same key and rightTime <= leftTime.
    *
    * Scalable union-window formulation: tag both sides, union, ONE shuffle
    * by key, one ordered window pass carrying the right side's payload
    * forward with last(ignoreNulls), then keep left rows. No per-row
    * lookups, no range join, skew handled by AQE — linear in
    * |left| + |right| at any scale. Right rows sort before left rows at
    * equal timestamps so a right row is visible to a left row at the same
    * instant (lookup semantics: "report at or before t").
    *
    * `payload` columns must exist on the right side; left rows get them as
    * `asof_<name>` (null when no prior right row exists).
    *
    * When the right side can hold several rows at the same (key, rightTime),
    * pass `rightTie` (a right-side column) so "which payload wins" is a
    * deterministic total order, not partition luck.
    */
  def asOfJoinTables(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String], rightTie: Option[String] = None): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
    val lAligned = payload.foldLeft(l)((df, p) => df.withColumn(s"_p_$p", lit(null)))
    // _tie is computed BEFORE the narrowing select so rightTie may be any
    // right-side column, not just key/rightTime/payload
    val r0 = right
      .withColumn("_tie", rightTie.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .select((col(key) +: col(rightTime).as("_t") +: col("_tie") +:
        payload.map(p => col(p).as(s"_p_$p"))): _*)
      .withColumn("_side", lit(0))
    val rAligned = left.columns.foldLeft(r0)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.map(col): _*))
    // right rows (_side=0) sort before left rows at equal t; among equal
    // right rows the tiebreaker decides which payload last() carries forward
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"asof_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w)))
    filled.where(col("_side") === 1)
      .drop("_t" +: "_side" +: "_tie" +: payload.map(p => s"_p_$p"): _*)
  }

  /** Maximal runs where `flagCol` holds — flightdb LevelFlightReporter
    * (analysis/levelflight.go) as gaps-and-islands: run ids via a conditional
    * cumulative sum, then one aggregation per (key, run).
    * Returns one row per run: key, run start tie-id, run length.
    */
  def runLengths(df: DataFrame, key: String, time: String, tie: String,
                 flag: Column, minLen: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord(time, tie): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_f", when(flag, 1L).otherwise(0L))
      .withColumn("_grp", sum(lit(1L) - col("_f")).over(cum))
      .where(col("_f") === 1L)
      .groupBy(col(key), col("_grp"))
      .agg(count(lit(1)).as("run_len"), min(col(tie)).as("run_start"))
      .where(col("run_len") >= minLen)
      .drop("_grp")
  }

  /** Top/most-recent N rows per key (fgae QueryForRecent: Order + Limit),
    * as a rank window — the distributed form of a per-key LIMIT.
    */
  def topNPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column], n: Int,
                 rankName: String = "rk"): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w)).where(col(rankName) <= n)
  }

  /** Interval-overlap join between two interval sets sharing a time axis —
    * flightdb Track.Compare / OverlapsWith (track.go:322).
    *
    * Naive form is a quadratic theta-join; here each interval is exploded to
    * the fixed time buckets it touches, the join is EQUI on bucket (plus
    * cheap predicates), and duplicates from multi-bucket overlaps are removed
    * with a distinct on the pair key. Bucket width should be >= typical
    * interval length so the blow-up factor stays ~2.
    */
  def overlapJoin(a: DataFrame, b: DataFrame, startCol: String, endCol: String,
                  bucketNanos: Long, joinPred: Column): DataFrame = {
    def explodeBuckets(df: DataFrame, side: String): DataFrame =
      df.withColumn(s"_bkt", explode(sequence(
        floor(col(startCol) / bucketNanos).cast("long"),
        floor(col(endCol) / bucketNanos).cast("long"))))
        .withColumnRenamed(startCol, s"${side}_start")
        .withColumnRenamed(endCol, s"${side}_end")
    val ea = explodeBuckets(a, "a")
    val eb = explodeBuckets(b, "b").withColumnRenamed("_bkt", "_bktb")
    ea.join(eb, ea("_bkt") === eb("_bktb") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end") && joinPred)
      .drop("_bkt", "_bktb")
  }

  /** Holt-Winters double-exponential fold (Holt 1957; α = β = 1/4) over a
    * SORTED series array whose elements carry the observation in a `_c`
    * field — returns a struct (l, b, sae, n): final level, final trend, the
    * one-step-ahead backtest Σ|x − (l+b)| from the second observation, and
    * the series length. ALL integer; the smoothing divisions are ARITHMETIC
    * SHIFTS because the trend goes negative and `shiftright`/DuckDB `>>`
    * both FLOOR where Spark `div`/DuckDB `//` both truncate — mixing the
    * families flips results at negative trends. Exposed as an expression
    * builder so the catalog query and property specs share one fold.
    */
  def holtWintersFold(serCol: String): org.apache.spark.sql.Column =
    expr(s"""aggregate($serCol,
        named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                     'sae', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),
        (acc, e) -> CASE WHEN acc.n = 0
          THEN named_struct('l', e._c, 'b', CAST(0 AS BIGINT),
                            'sae', CAST(0 AS BIGINT), 'n', CAST(1 AS BIGINT))
          ELSE named_struct(
            'l', shiftright(e._c + 3 * (acc.l + acc.b), 2),
            'b', shiftright(shiftright(e._c + 3 * (acc.l + acc.b), 2)
                              - acc.l + 3 * acc.b, 2),
            'sae', acc.sae + abs(e._c - (acc.l + acc.b)),
            'n', acc.n + 1) END)""")
}
