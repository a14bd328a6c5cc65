package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty identifiers against a
  * canonical registry without the O(|L|·|R|) cross join — the flightdb
  * identity problem (mistyped callsigns vs the airframe registry) in its
  * general at-scale form.
  *
  * The standard two-stage shape: BLOCKING passes generate candidate pairs
  * (each pass is an equi-join on a cheap key, so it shuffles on that key
  * and never materializes non-candidates), then an edit-distance REFINE
  * runs only on candidates. Multi-pass blocking trades recall for cost
  * explicitly: a single-char corruption can break any one key, so the
  * default keys are the (first-2-chars) and (last-2-chars) prefixes —
  * one deletion/substitution cannot disturb both ends of a ≥4-char
  * identifier, making the two-pass union EXHAUSTIVE for maxDist = 1
  * (single-edit) candidates of length ≥ 4; longer edit budgets want more
  * passes (q-gram keys), same machinery.
  */
object Link {

  /** Union of per-pass blocking joins, deduplicated. Each element of
    * `keys` is (left key expr, right key expr) over `lcol`/`rcol`.
    */
  def blockedCandidates(left: DataFrame, lcol: String,
                        right: DataFrame, rcol: String,
                        keys: Seq[(Column, Column)]): DataFrame =
    keys.map { case (lk, rk) =>
      left.select(col(lcol), lk.as("_bk"))
        .join(right.select(col(rcol), rk.as("_bk")), "_bk")
        .select(lcol, rcol)
    }.reduce(_ unionAll _).distinct()

  /** Blocked fuzzy link: candidates from first-2 + last-2 blocking, then
    * `levenshtein ≤ maxDist` refine (the DP runs per candidate, never per
    * cross pair). Returns (lcol, rcol, dist).
    */
  def fuzzyLink(left: DataFrame, lcol: String,
                right: DataFrame, rcol: String, maxDist: Int): DataFrame = {
    val keys = Seq(
      (substring(col(lcol), 1, 2), substring(col(rcol), 1, 2)),
      (substring(col(lcol), -2, 2), substring(col(rcol), -2, 2)))
    blockedCandidates(left, lcol, right, rcol, keys)
      .withColumn("dist", levenshtein(col(lcol), col(rcol)))
      .where(col("dist") <= maxDist)
  }
}
