package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BottomKPairsAgg, ColumnShim, KmvSketchAgg}

/** Bounded-memory sketches for 100 TB aggregations, in the deterministic
  * cross-engine style: every hash is the polynomial fold ([[Text.polyHash]])
  * so the DuckDB oracle rebuilds identical sketches and the driver
  * hash-compares ESTIMATES, not just row counts.
  *
  *  - KMV distinct-count (Bar-Yossef et al. 2002; the theta-sketch core):
  *    k smallest distinct hash values per group. The native
  *    [[KmvSketchAgg]] partial-aggregates — map tasks carry ≤ k longs per
  *    group and merges fold k+k → k, so the exchange is O(groups · k)
  *    no matter how many distinct keys exist; the relational twin
  *    (distinct + rank) shuffles every distinct key and exists for
  *    bit-equality specs and the oracle's replay.
  *  - Count-min sketch (Cormode & Muthukrishnan 2005): d×w counter grid
  *    over token hashes; point-estimate = min over rows. Counters build
  *    with plain map-side-combined aggregation into d·w cells — state is
  *    the GRID, not the vocabulary — and candidate estimation is a
  *    broadcast join against the grid.
  */
object Sketch {

  /** KMV sketch column (native aggregate): sorted ascending array of the
    * ≤ k smallest distinct values of `hash` in the group.
    */
  def kmvAgg(hash: Column, k: Int): Column =
    ColumnShim.column(
      KmvSketchAgg(ColumnShim.expression(hash), k).toAggregateExpression())

  /** Relational twin of [[kmvAgg]]: distinct hashes, per-group rank, the
    * k smallest collected sorted. Identical output (spec-enforced); kept
    * for oracle-shape reference and A/B.
    */
  def kmvAggTwin(df: DataFrame, group: Column, hash: Column, k: Int): DataFrame = {
    df.select(group.as("_g"), hash.as("_h")).distinct()
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g")).orderBy(col("_h").asc)))
      .where(col("_rn") <= k)
      .groupBy(col("_g"))
      .agg(sort_array(collect_list(col("_h"))).as("sk"))
  }

  /** Distinct-count estimate from a KMV sketch array: exact size while the
    * sketch is unsaturated, else (k−1)·P / h_k — all integer arithmetic
    * (ONE integer division), so both engines compute it bit-identically.
    */
  def kmvEstimate(skName: String, k: Int, hashSpace: Long): Column =
    when(size(col(skName)) < k, size(col(skName)).cast("long"))
      .otherwise(expr(
        s"${(k - 1).toLong} * ${hashSpace}L div greatest(element_at($skName, $k), 1L)"))

  /** Bottom-k quantile sketch column (native [[BottomKPairsAgg]]): the k
    * lexicographically-smallest distinct (hash, value) pairs per group as
    * `array<struct<h,v>>` in (h, v) order — a merge-order-independent
    * coordinated sample of fixed size k (unlike a permille sample, whose
    * memory grows with the group). `hash` must be the deterministic poly
    * hash of the row's unique key so both engines draw the same sample.
    */
  def quantileSketch(hash: Column, value: Column, k: Int): Column =
    ColumnShim.column(
      BottomKPairsAgg(ColumnShim.expression(hash),
        ColumnShim.expression(value), k).toAggregateExpression())

  /** Relational twin of [[quantileSketch]] (oracle shape / bit-equality
    * specs): distinct (hash, value) pairs, per-group (h, v) rank, bottom
    * k collected in (h, v) order.
    */
  def quantileSketchTwin(df: DataFrame, group: Column, hash: Column,
                         value: Column, k: Int): DataFrame = {
    df.select(group.as("_g"), hash.as("_h"), value.as("_v")).distinct()
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g")).orderBy(col("_h").asc, col("_v").asc)))
      .where(col("_rn") <= k)
      .groupBy(col("_g"))
      .agg(array_sort(collect_list(struct(col("_h").as("h"), col("_v").as("v"))))
        .as("sk"))
  }

  /** Rank-selected quantile from a sketch column's sampled values: sort
    * the values, pick rank (n−1)·mult ÷ den + 1 — pure integer index
    * arithmetic, the selected double passes through untouched (the
    * q_quantile_sample discipline; interpolating estimators re-derive
    * doubles and drift cross-engine).
    */
  def sketchQuantile(skName: String, mult: Int, den: Int): Column = {
    val vals = array_sort(expr(s"transform($skName, s -> s.v)"))
    element_at(vals,
      expr(s"CAST((size($skName) - 1) * $mult div $den + 1 AS INT)"))
  }

  /** Count-min counter grid over `token` occurrences: one exploded pass,
    * rows keyed (r, bucket) with bucket_r = polyHash(token # cms·r) mod w —
    * map-side combine collapses to ≤ d·w cells before the exchange.
    */
  def cmsCounters(toks: DataFrame, token: Column, d: Int, w: Int): DataFrame =
    toks.select(posexplode(array((0 until d).map(r =>
        pmod(Text.polyHash(concat(token, lit(s"#cms$r"))), lit(w.toLong))): _*))
      .as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `candidates` (a small DataFrame with column
    * `term`): CMS estimate = min over the d rows of that term's counter
    * (missing cell = 0 — can't happen for terms that occur, the sketch
    * never undercounts). Candidates replicate d ways and broadcast-join
    * the grid.
    */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame, d: Int, w: Int): DataFrame = {
    val probes = candidates
      .select(col("term"), posexplode(array((0 until d).map(r =>
          pmod(Text.polyHash(concat(col("term"), lit(s"#cms$r"))), lit(w.toLong))): _*))
        .as(Seq("r", "bucket")))
    probes.join(counters, Seq("r", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
