package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup clustering.
  *
  * Near-dup PAIRS are only half a dedup pipeline: A~B and B~C must
  * collapse to ONE surviving document even when A!~C, which means
  * grouping pairs into connected components and keeping one doc per
  * component (the reference's exact-dedup keep rule — flightdb
  * backend/frags.go dedups by key groups — generalized to the
  * transitive near-dup graph; the Lee et al. 2022 / RefinedWeb
  * pipelines do exactly this clustering over MinHash pair output).
  */
object Graph {

  /** Connected components by iterative min-label propagation: every node
    * starts labeled with its own id; each round a node takes the min of
    * its label and its neighbors' labels; at fixpoint every node carries
    * its component's minimum id. Returns `(id, comp)` for every node that
    * appears in `edges` (callers fold isolated nodes back in with a left
    * join + coalesce — see `q_dedup_components`).
    *
    * Scale shape: each round is one shuffle keyed on the edge dst (the
    * join with current labels + min-aggregate) and one label join — all
    * distributed, nothing driver-side except the per-round convergence
    * count (a scalar action, the precedented driver-stat pattern). Labels
    * and the symmetrized edge list are `localCheckpoint`ed so lineage
    * stays flat across rounds (the iterative-plan trap: without
    * truncation round k re-plans rounds 1..k-1). Round count is
    * O(component diameter): near-dup components are clique-ish (every
    * member shares most shingles with the seed), so 3-5 rounds in
    * practice; `maxIter` guards the adversarial long-chain case, where
    * the right move is the large-star/small-star contraction family
    * (Kiveris et al. 2014, "Connected Components in MapReduce") — O(log
    * n) rounds at higher per-round cost; not needed for dup graphs.
    */
  def connectedComponents(edges: DataFrame, a: String, b: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .localCheckpoint() // reused every round — materialize once
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min("comp").as("ncomp"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp")))
            .as("comp"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.comp") =!= col("o.comp")).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxIter rounds — " +
        "pathological diameter; use a star-contraction variant")
    labels
  }
}
