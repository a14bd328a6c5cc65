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
    *
    * BLOCKING-KEY SKEW is the failure mode of this whole family: a key
    * value shared by a large fraction of one side turns its block into a
    * near-cross-join (measured: a corpus whose words all end in the same
    * 2-char suffix ran the last-2 pass away at 10x — DocScaleProbe notes
    * it). `maxBlockSize > 0` drops blocks whose RIGHT-side population
    * exceeds the cap — an explicit recall-for-cost cut (candidates in an
    * oversized block are only lost from THAT pass; other passes still
    * surface them), the standard production guard. The cut is a broadcast
    * ANTI-join against the OVERSIZED key set — small by construction
    * (few blocks are hot), so the guard never shuffles the corpus.
    */
  def blockedCandidates(left: DataFrame, lcol: String,
                        right: DataFrame, rcol: String,
                        keys: Seq[(Column, Column)],
                        maxBlockSize: Long = 0L): DataFrame =
    keys.map { case (lk, rk) =>
      val r = right.select(col(rcol), rk.as("_bk"))
      val rCapped =
        if (maxBlockSize <= 0) r
        else r.join(
          broadcast(r.groupBy(col("_bk")).agg(count(lit(1)).as("_bn"))
            .where(col("_bn") > maxBlockSize).select(col("_bk"))),
          Seq("_bk"), "left_anti")
      left.select(col(lcol), lk.as("_bk"))
        .join(rCapped, "_bk")
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
