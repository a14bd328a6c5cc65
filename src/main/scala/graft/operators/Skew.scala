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
}
