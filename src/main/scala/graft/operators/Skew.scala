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
