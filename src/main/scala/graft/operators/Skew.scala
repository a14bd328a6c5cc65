package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives. First resort at runtime is AQE's skew-join
  * splitting (enabled by default); these are the explicit plan-level tools
  * for when the skew is known ahead of time — a hot airframe/user key at
  * 100 TB would otherwise serialize one reducer.
  */
object Skew {

  /** Salted equi-join: the large side's rows get a deterministic salt in
    * [0, nSalts) derived from `saltSrc` (any high-cardinality column); the
    * small side is replicated across all salts. The shuffle key becomes
    * (key, salt) so a hot key spreads over nSalts reducers. Result set is
    * identical to the unsalted join (spec-enforced).
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     saltSrc: Column, nSalts: Int): DataFrame = {
    val l = large.withColumn("_salt", pmod(hash(saltSrc), lit(nSalts)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. Spark's hash aggregate already does map-side
    * partials; this adds an extra reduce tier for keys so hot that even the
    * merged partials overload one reducer (e.g. count/sum over a
    * power-law key).
    */
  def twoPhaseSum(df: DataFrame, key: String, value: Column, saltSrc: Column,
                  nSalts: Int, out: String): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSrc), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out), sum(col("_pn")).as(s"${out}_n"))

  /** Skew-ADAPTIVE salted join: measure the join key's concentration on
    * the large side first (top-key share, the §2.10e skew-report scalar —
    * ONE bounded driver aggregate, the precedented stats-head pattern),
    * then pick the salt count from it: a key carrying share `s` of the
    * rows serializes `s·parallelism` reducers' worth of work into one,
    * so it needs ~`s·parallelism` salts to spread back out; uniform keys
    * (top share ≈ 1/distinct) pick 1 salt and take the PLAIN join — the
    * salting machinery costs nothing when it isn't needed. This is the
    * jaccardPairs adaptive-gate discipline applied to joins: the decision
    * input is data, the decision itself is a driver scalar, and both
    * arms produce the identical result set (spec-enforced; the salt is
    * plan-level only).
    */
  def autoSaltedJoin(large: DataFrame, small: DataFrame, key: String,
                     saltSrc: Column,
                     maxSalts: Int = 64): (DataFrame, Int) = {
    val par = large.sparkSession.sparkContext.defaultParallelism
    val st = large.groupBy(col(key)).agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")).as("_n"), max(col("_c")).as("_mx")).head
    val n = st.getLong(0)
    val mx = st.getLong(1)
    require(n > 0, "autoSaltedJoin: empty large side")
    val wanted = ((mx.toDouble / n) * par).ceil.toInt
    val nSalts = math.max(1, math.min(maxSalts, wanted))
    if (nSalts <= 1) (large.join(small, Seq(key)), 1)
    else (saltedEquiJoin(large, small, key, saltSrc, nSalts), nSalts)
  }

  /** Bloom-prefiltered anti-join (SURVEY §7 / report NotTags-style drop
    * lists at scale). A plain `left_anti` against a drop list too large to
    * broadcast shuffles BOTH sides — including the ~100% of fact rows that
    * match nothing. Spark's own runtime filters (InjectRuntimeFilter) never
    * apply to anti-joins, so this does the equivalent by hand:
    *
    * 1. build a bloom filter over the drop keys (one small aggregation);
    * 2. rows whose key DEFINITELY isn't dropped (might_contain = false — a
    *    bloom filter has no false negatives) bypass the join entirely, no
    *    shuffle;
    * 3. only the might-contain sliver (true drops + false positives, rate
    *    set by `estimatedItems` sizing) goes through the exact anti-join,
    *    which removes the false positives.
    *
    * Result identical to `large.join(drops, key, "left_anti")`
    * (spec-enforced). The fact side is scanned twice, but columnar scans
    * with the bloom predicate pushed into them are far cheaper at 100 TB
    * than shuffling the full fact table; when `drops` fits a broadcast,
    * skip this and let the broadcast anti-join win.
    */
  def bloomAntiJoin(large: DataFrame, drops: DataFrame, key: String,
                    estimatedItems: Long): DataFrame = {
    import org.apache.spark.sql.graft.BloomShim
    val bloom = BloomShim.buildBloom(drops.select(col(key)), col(key), estimatedItems)
    if (bloom == null) large // empty drop list drops nothing
    else {
      val mc = BloomShim.mightContain(bloom, col(key))
      large.where(!mc)
        .unionByName(large.where(mc).join(drops.select(col(key)), Seq(key), "left_anti"))
    }
  }
}
