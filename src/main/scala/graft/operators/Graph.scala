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

  /** Session conf that flips EVERY iterative lane (CC / star-contraction /
    * LPA / k-core / PageRank / hopDistance) from executor-local lineage
    * truncation to reliable `checkpoint()` in one place — production
    * cluster runs set it once (plus `SparkContext.setCheckpointDir`)
    * instead of every caller threading a flag: localCheckpoint blocks die
    * with their executor, and at 100 TB an executor loss mid-iteration
    * aborts the job with no lineage to recompute from.
    */
  val ReliableCkptConf = "spark.graft.reliableCheckpoint"

  private def reliableConf(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableCkptConf, "false").toBoolean

  /** The checkpointer every iterative catalog lane should pass: reliable
    * `checkpoint()` when [[ReliableCkptConf]] is set (eager — a reliable
    * checkpoint without a materializing action recomputes its lineage in
    * the write job), otherwise a LAZY local checkpoint (the plan is
    * truncated either way; the lane's own per-round probe or final action
    * materializes the blocks without paying a second job).
    */
  def ckptFor(spark: org.apache.spark.sql.SparkSession): DataFrame => DataFrame =
    if (spark.conf.get(ReliableCkptConf, "false").toBoolean) df => df.checkpoint()
    else df => df.localCheckpoint(false)

  /** Round-checkpoint CADENCE for the iterative lanes (r13, the r12
    * brief's A/B lever): truncate lineage every N rounds instead of every
    * round. Applies ONLY to the per-round loop checkpoints whose skipping
    * is semantics-free (rank/label/peel values are ckpt-invariant) —
    * NEVER to multi-consumer determinism checkpoints (globalRank's frozen
    * range exchange, shared-frame freezes), whose removal changes
    * RESULTS (the repartitionByRange rule). Read from session conf so a
    * cluster profile can turn it without code churn; default 1 (the
    * long-validated per-round behavior — see PLANS.md cadence A/B).
    */
  val RoundCkptConf = "spark.graft.ckptEvery"

  def roundCadence(spark: org.apache.spark.sql.SparkSession): Int = {
    val n = spark.conf.get(RoundCkptConf, "1").toInt
    require(n >= 1, s"$RoundCkptConf must be >= 1 (got $n)")
    n
  }

  /** Connected components by iterative min-label propagation, with a
    * star-contraction fallback for adversarial diameters: every node
    * starts labeled with its own id; each round a node takes the min of
    * its label and its neighbors' labels; at fixpoint every node carries
    * its component's minimum id. Returns `(id, comp)` for every node that
    * appears in `edges` (callers fold isolated nodes back in with a left
    * join + coalesce — see `q_dedup_components`).
    *
    * Scale shape: each round is one shuffle keyed on the edge dst (the
    * join with current labels + min-aggregate), one label join, and one
    * POINTER-JUMP join (comp ← least(comp, label(comp)) — the hash-to-min
    * doubling of Rastogi et al. 2013): labels chase two hops per round,
    * so rounds are O(log diameter), not O(diameter). All distributed,
    * nothing driver-side except the per-round convergence count (a scalar
    * action, the precedented driver-stat pattern). Near-dup components
    * are clique-ish, so 2-3 rounds in practice; the jump is what keeps
    * moderate chains (canon–dirty–canon bridges) from paying a round per
    * hop. If `maxIter` rounds pass without a fixpoint (adversarial long
    * chains), the computation SWITCHES to large-star/small-star
    * contraction (Kiveris et al. 2014, "Connected Components in
    * MapReduce and Beyond"): O(log² n) rounds at higher per-round cost,
    * diameter-independent — see [[starContractComponents]].
    *
    * Lineage/durability: labels and the symmetrized edge list are
    * checkpointed every round so lineage stays flat (the iterative-plan
    * trap: without truncation round k re-plans rounds 1..k-1). Default is
    * `localCheckpoint` — executor-local blocks, fine for bench/local
    * runs; pass `reliableCheckpoint = true` for production cluster runs
    * (requires `SparkContext.setCheckpointDir`): localCheckpoint blocks
    * die with their executor, and at 100 TB an executor loss mid-iteration
    * would abort the whole job with no lineage to recompute from.
    */
  def connectedComponents(edges: DataFrame, a: String, b: String,
                          maxIter: Int = 25,
                          reliableCheckpoint: Boolean = false): DataFrame = {
    // LAZY local checkpoints: the Catalyst plan is truncated either way
    // (the Dataset wraps its internal RDD), but lazy lets the per-round
    // convergence probe be the job that materializes the blocks — one
    // action per round instead of two (eager ckpt + probe). The reliable
    // path stays eager: RDD.checkpoint without a materializing action
    // recomputes the lineage when the write job runs. The session conf
    // [[ReliableCkptConf]] flips the lane without the caller knowing the
    // parameter exists.
    val ckpt: DataFrame => DataFrame =
      if (reliableCheckpoint || reliableConf(edges)) df => df.checkpoint()
      else df => df.localCheckpoint(false)
    val sym = ckpt(edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst"))))
    // initial labels stay a plain plan — round 1's checkpoint flattens it,
    // and the first probe's job materializes sym alongside
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
    // Convergence probe: per-node labels are NON-INCREASING (least of own
    // and neighbor minima), so the label total strictly decreases while
    // anything changes — one exact DECIMAL(38,0) sum per round (a scalar
    // agg over the new labels) replaces the labels⋈labels change-count
    // join the earlier version paid per round. No round-0 probe: the sum
    // of fresh labels is just Σ id, and round 1 always runs.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prevSum: java.math.BigDecimal = null
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min("comp").as("ncomp"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp")))
            .as("comp"))
      // pointer jump in the SAME plan (no extra action): a label is always
      // some same-component node id, so looking its own label up and taking
      // the least is sound, monotone, and makes labels chase 2 hops/round
      val par = prop.select(col("id").as("_pid"), col("comp").as("_pcomp"))
      val next = ckpt(prop.join(par, prop("comp") === col("_pid"), "left")
        .select(prop("id"),
          least(prop("comp"), coalesce(col("_pcomp"), prop("comp")))
            .as("comp")))
      val newSum = labelSum(next)
      labels = next
      converged = prevSum != null && newSum.compareTo(prevSum) == 0
      prevSum = newSum
      round += 1
    }
    if (converged) labels
    else starContractComponents(sym, ckpt)
  }

  /** Connected components by alternating large-star/small-star contraction
    * (Kiveris et al. 2014): diameter-INDEPENDENT convergence in O(log² n)
    * alternations, the fallback for adversarial chain graphs where
    * min-label propagation needs O(diameter) rounds.
    *
    * Per alternation, with m(u) = min(Γ(u) ∪ {u}):
    *  - large-star: every edge (u, v), v > u rewires to (v, m(u)) — big
    *    neighbors re-hang under u's local minimum;
    *  - small-star: every edge (u, v), v < u rewires to (v, m(u)), plus
    *    (u, m(u)) — u and its small neighbors collapse onto the minimum.
    * Both preserve connectivity (each rewired node stays connected to
    * m(u) through u's neighborhood); the unique fixpoint is a star
    * forest centered on component minima, so the final labels are just
    * m(u) per node. Every step is a groupBy(src) min + an edge join —
    * same linear-shuffle class as the min-label rounds; the edge set is
    * re-symmetrized + distinct'd each alternation (contraction only
    * shrinks it). Convergence probe (the r9-verdict fix — the old
    * except-based equality paid TWO anti-join shuffles per alternation):
    * one map-side-combined scalar aggregate per alternation — (count,
    * Σsrc, Σdst, Σhash) over the distinct edge set, the labelSum-scalar
    * discipline of the min-label path. A differing signature proves
    * inequality exactly (count/sums are exact over a distinct set); only
    * when the signature MATCHES does one except-based check confirm true
    * set equality, so the expensive probe runs once at the fixpoint (plus
    * once per astronomically-unlikely 64-bit hash collision) instead of
    * every round, and correctness never rests on the hash.
    */
  def starContractComponents(symEdges: DataFrame,
                             ckpt: DataFrame => DataFrame,
                             maxIter: Int = 50): DataFrame = {
    val allNodes = ckpt(symEdges.select(col("src").as("id")).distinct())
    def mOf(ed: DataFrame): DataFrame =
      ed.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
        .select(col("src").as("_u"), least(col("_mn"), col("src")).as("_m"))
    def resym(ab: DataFrame): DataFrame =
      ab.where(col("a") =!= col("b"))
        .select(col("a").as("src"), col("b").as("dst"))
        .union(ab.where(col("a") =!= col("b"))
          .select(col("b").as("src"), col("a").as("dst")))
        .distinct()
    // exact-over-distinct edge-set signature: one scalar aggregate (all
    // partial-aggregated map-side); xxhash64 only ADDS discrimination on
    // top of the exact count/sums — equality is still confirmed exactly
    def signature(ed: DataFrame): org.apache.spark.sql.Row =
      ed.agg(count(lit(1)), sum(col("src").cast("decimal(38,0)")),
        sum(col("dst").cast("decimal(38,0)")),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
    var e = ckpt(symEdges.where(col("src") =!= col("dst")).distinct())
    var round = 0
    var converged = e.isEmpty
    var prevSig: org.apache.spark.sql.Row = if (converged) null else signature(e)
    while (!converged && round < maxIter) {
      val ls = e.join(mOf(e), e("src") === col("_u"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("a"), col("_m").as("b"))
      val e1 = ckpt(resym(ls))
      val ss = e1.join(mOf(e1), e1("src") === col("_u"))
        .where(col("dst") < col("src"))
        .select(col("dst").as("a"), col("_m").as("b"))
        .union(mOf(e1).select(col("_u").as("a"), col("_m").as("b")))
      val e2 = ckpt(resym(ss))
      val sig = signature(e2)
      converged = sig == prevSig &&
        e2.except(e).union(e.except(e2)).head(1).isEmpty
      prevSig = sig
      e = e2
      round += 1
    }
    require(converged,
      s"starContractComponents: no fixpoint after $maxIter alternations")
    // star forest: every node's component is min(Γ(u) ∪ {u}); nodes whose
    // edges fully contracted away (self-pair inputs) label themselves
    val labels = mOf(e).select(col("_u").as("id"), col("_m").as("comp"))
    allNodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Weighted PageRank in SCALED-INTEGER arithmetic — the cross-engine-
    * reproducible variant (float PageRank re-associates sums and drifts
    * by ulps across engines; here every operation is exact, so a DuckDB
    * oracle replays all `iters` rounds bit-identically).
    *
    * Ranks live in units of `scale` (default 1e-6); damping is the
    * rational dampNum/dampDen (default 17/20 = 0.85). One round:
    *   contrib(v) = Σ_{u→v} (pr(u) · w_uv) div W_u      (per-edge floor)
    *   pr'(v)     = (scale − scale·d) + (dampNum · contrib(v)) div dampDen
    * Integer sums are order-independent, and the per-edge floor is the
    * deterministic price of exactness (mass leaks ≤ outdeg ulps per node
    * per round — irrelevant at rank scale 1e6).
    *
    * Scale shape: `edges(src, dst, w)` with out-weights joined once;
    * each round is one src-keyed rank join + one dst-keyed sum shuffle,
    * lineage flattened via `ckpt` every round (the [[connectedComponents]]
    * discipline). Driver sees nothing — fixed `iters`, no convergence
    * probe (a data-dependent round count couldn't be replayed by a
    * statically unrolled oracle).
    */
  def pageRankInt(edges: DataFrame, ckpt: DataFrame => DataFrame,
                  iters: Int, scale: Long = 1000000L,
                  dampNum: Long = 17L, dampDen: Long = 20L,
                  // checkpoint cadence: rank values are ckpt-INVARIANT, so
                  // this only trades plan depth (grows linearly per
                  // un-truncated round) against the per-checkpoint job
                  // tail. Measured (JobCountProbe, r11): cadence 2 cut
                  // q_textrank 50 -> 41 jobs with NO wall change — the
                  // floor tail is not checkpoint-dominated — so the
                  // default stays 1 (the long-validated behavior) and the
                  // knob exists for cluster runs where checkpoint I/O is
                  // real.
                  ckptEvery: Int = 1): DataFrame = {
    require(ckptEvery >= 1, s"ckptEvery must be >= 1 (got $ckptEvery): " +
      "0 divides by zero mid-iteration and negatives never checkpoint")
    val nodes = ckpt(edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct())
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("_W"))
    val ew = ckpt(edges.join(outW, "src"))
    val base = scale - dampNum * scale / dampDen
    var ranks = nodes.withColumn("pr", lit(scale))
    for (it <- 0 until iters) {
      val contribs = ew.join(ranks, ew("src") === ranks("id"))
        .select(col("dst"), expr("pr * w div _W").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_s"))
      val next = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(_s, 0L)) div $dampDen")).as("pr"))
      ranks = if (it % ckptEvery == ckptEvery - 1 || it == iters - 1) ckpt(next)
              else next
    }
    ranks
  }

  /** PERSONALIZED PageRank in the same scaled-integer discipline: the
    * restart mass lands only on `seeds` (pr' = base·[v ∈ S] +
    * d·contrib(v)), so rank concentrates in the seeds' graph
    * neighborhood — the query-expansion / related-entities primitive
    * (Haveliwala 2002 topic-sensitive PageRank). Seeds start at `scale`,
    * non-seeds at 0; every round is the [[pageRankInt]] arithmetic with
    * the seed-gated base term, exactly replayable by an unrolled oracle.
    * Same shuffle shape (one src-keyed rank join + one dst-keyed rollup
    * per round, `ckpt`-flattened lineage).
    */
  def pageRankPersonalizedInt(edges: DataFrame, seeds: DataFrame,
                              ckpt: DataFrame => DataFrame, iters: Int,
                              scale: Long = 1000000L,
                              dampNum: Long = 17L, dampDen: Long = 20L,
                              ckptEvery: Int = 1): DataFrame = {
    require(ckptEvery >= 1, s"ckptEvery must be >= 1 (got $ckptEvery)")
    val nodes = ckpt(edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct())
    val seed = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("_seed", lit(1L))
    val marked = ckpt(nodes.join(seed, Seq("id"), "left")
      .select(col("id"), coalesce(col("_seed"), lit(0L)).as("_seed")))
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("_W"))
    val ew = ckpt(edges.join(outW, "src"))
    val base = scale - dampNum * scale / dampDen
    var ranks = marked.select(col("id"), (col("_seed") * scale).as("pr"))
    for (it <- 0 until iters) {
      val contribs = ew.join(ranks, ew("src") === ranks("id"))
        .select(col("dst"), expr("pr * w div _W").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_s"))
      val next = marked.join(contribs, marked("id") === contribs("dst"), "left")
        .select(marked("id"),
          (col("_seed") * base +
            expr(s"($dampNum * coalesce(_s, 0L)) div $dampDen")).as("pr"))
      ranks = if (it % ckptEvery == ckptEvery - 1 || it == iters - 1) ckpt(next)
              else next
    }
    ranks
  }

  /** Fixed-round k-core peel (Matula & Beck 1983 degeneracy peeling, the
    * distributed round form): repeatedly delete every node of degree < k;
    * the fixpoint is the k-core — the maximal subgraph where every member
    * keeps ≥ k neighbors INSIDE the subgraph. Density classes that pair
    * counts can't see fall out directly: a near-dup CHAIN has an empty
    * 2-core while a clique of the same edge count is all core — the
    * diagnostic that picks the §2.55 convergence path and sizes the
    * cluster-collapse work.
    *
    * Round count is FIXED (no convergence probe) so a SQL oracle can
    * statically unroll the peel — the pageRankInt / BPE replayable-trainer
    * discipline; convergence on real data is asserted by spec (peel(R) ==
    * peel(R+1)), and an unconverged R-round peel is still a well-defined
    * (and identically replayed) over-approximation of the core. Returns
    * `(id, core_deg)` — surviving nodes with their within-core degree.
    *
    * Scale shape: each round is one degree rollup (src-keyed,
    * map-side-combinable) and two semi-joins filtering the edge list on
    * its endpoints — all linear in the CURRENT edge count, which only
    * shrinks; lineage is flattened per round via `ckpt` (the
    * connectedComponents contract: localCheckpoint for bench, reliable
    * checkpoint for clusters). The only driver traffic is one edge-count
    * scalar per round, which also powers a semantics-preserving early
    * exit (see the loop comment).
    */
  def kCorePeel(edges: DataFrame, a: String, b: String, k: Int, rounds: Int,
                ckpt: DataFrame => DataFrame, ckptEvery: Int = 1): DataFrame = {
    require(k >= 1 && rounds >= 1 && ckptEvery >= 1)
    val fwd = edges.where(col(a) =!= col(b))
      .select(col(a).as("src"), col(b).as("dst"))
    var e = ckpt(fwd
      .union(edges.where(col(a) =!= col(b))
        .select(col(b).as("src"), col(a).as("dst")))
      .distinct())
    // Early exit on the monotone edge-count probe: a round that removes no
    // edge leaves the degree table — and therefore every later round —
    // identical, so stopping is EXACTLY the fixed-`rounds` result (what the
    // unrolled oracle computes) without paying the dead rounds. The driver
    // sees one edge-count scalar per round (the precedented stat pattern);
    // counts strictly decrease while peeling is active.
    var prevCount = e.count()
    var round = 0
    var fixed = prevCount == 0L
    var eCkpted = true // the initial symmetrized frame is ckpt'd above
    while (round < rounds && !fixed) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("_d"))
        .where(col("_d") >= k).select(col("src").as("_n"))
      val next = e
        .join(keep.select(col("_n").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("_n").as("dst")), Seq("dst"), "left_semi")
      // cadence > 1 pays the per-round count() on an un-truncated plan —
      // the honest trade the cadence A/B measures (PLANS.md)
      val onBoundary = round % ckptEvery == ckptEvery - 1
      e = if (onBoundary) ckpt(next) else next
      eCkpted = onBoundary
      val m = e.count()
      fixed = m == prevCount
      prevCount = m
      round += 1
    }
    // the RETURNED frame is always ckpt'd (ADVICE r13): at ckptEvery > 1
    // the loop can exit — by round cap or early-exit probe — mid-cadence
    // with an un-truncated multi-round plan, which downstream multi-
    // consumer lanes would re-derive per consumer (the same `|| last`
    // guard pageRankInt/labelPropagation apply on their final round)
    if (!eCkpted) e = ckpt(e)
    e.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .where(col("core_deg") >= k)
      .select(col("src").as("id"), col("core_deg"))
  }

  /** Multi-source BFS hop distance — min hops from a SEED SET, bounded at
    * `maxHops` (the quarantine / blast-radius primitive: "everything
    * within h near-dup hops of a flagged doc"). Level-synchronous
    * frontier expansion: each round joins the symmetrized edge list on
    * the CURRENT frontier only (work per round is frontier-degree-sized,
    * not graph-sized) and anti-joins the settled set, so a node is
    * labeled with the FIRST — i.e. minimum — hop count that reaches it.
    * Fixed bounded rounds (no convergence probe; the radius is the
    * caller's policy knob), lineage flattened per round via `ckpt`
    * (localCheckpoint for bench, reliable checkpoint for clusters); an
    * empty frontier short-circuits — identical result, dead rounds
    * unpaid. Returns (id, hops), seeds at 0; unreached nodes absent.
    */
  def hopDistance(edges: DataFrame, a: String, b: String, seeds: DataFrame,
                  maxHops: Int, ckpt: DataFrame => DataFrame): DataFrame = {
    require(maxHops >= 0)
    val sym = edges.where(col(a) =!= col(b))
      .select(col(a).as("s"), col(b).as("d"))
      .union(edges.where(col(a) =!= col(b))
        .select(col(b).as("s"), col(a).as("d")))
    var dist = ckpt(seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("hops", lit(0L)))
    var frontier = dist.select("id")
    var hop = 1
    var drained = false
    while (hop <= maxHops && !drained) {
      val next = ckpt(sym
        .join(frontier.select(col("id").as("s")), Seq("s"), "left_semi")
        .select(col("d").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti"))
      drained = next.isEmpty
      if (!drained) {
        dist = ckpt(dist.unionByName(
          next.withColumn("hops", lit(hop.toLong))))
        frontier = next
      }
      hop += 1
    }
    dist
  }

  /** Weighted label propagation — community detection (Raghavan et al.
    * 2007 LPA), DETERMINIZED so a SQL oracle can replay every round
    * exactly: synchronized updates for a FIXED round count (no
    * convergence probe — the replayable-trainer discipline of
    * pageRankInt/BPE), each node adopting the label with the greatest
    * incident edge-weight sum, ties broken by the smaller label. Unlike
    * [[connectedComponents]] (connectivity — one label per connected
    * blob), LPA splits a connected graph along its weight structure:
    * dense neighborhoods capture their members, weak bridges don't
    * propagate. Labels start as node ids; weights are integers (exact
    * sums, order-independent).
    *
    * Scale: per round, one shuffle keyed on the message dst (join
    * labels on src over the symmetrized edge list + (dst, label) weight
    * rollup) and one argmax window partitioned by dst — partition
    * cardinality = node count, frame = that node's distinct neighbor
    * labels (bounded by degree, never graph-sized). Lineage is
    * checkpointed per round via `ckpt` (same contract as pageRankInt:
    * localCheckpoint for bench, reliable checkpoint for clusters).
    */
  def labelPropagation(edges: DataFrame, ckpt: DataFrame => DataFrame,
                       rounds: Int, ckptEvery: Int = 1): DataFrame = {
    require(ckptEvery >= 1, s"ckptEvery must be >= 1 (got $ckptEvery)")
    import org.apache.spark.sql.expressions.Window
    val sym = ckpt(edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w"))))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    labels = ckpt(labels)
    val wArg = Window.partitionBy(col("_n"))
      .orderBy(col("_s").desc, col("_lab").asc)
    for (it <- 0 until rounds) {
      val votes = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("_n"), col("lab").as("_lab"), col("w"))
        .groupBy(col("_n"), col("_lab")).agg(sum(col("w")).as("_s"))
      val next = votes
        .withColumn("_rn", row_number().over(wArg))
        .where(col("_rn") === 1)
        .select(col("_n").as("id"), col("_lab").as("lab"))
      labels = if (it % ckptEvery == ckptEvery - 1 || it == rounds - 1) ckpt(next)
               else next
    }
    labels
  }

  /** §2.55e HyperBall (Boldi & Vigna 2013): the approximate neighborhood
    * function N(r) = Σ_v |ball(v, r)| of a graph, via per-node HLL
    * registers merged along edges — THE at-scale answer to "how
    * connected is the near-dup graph", where exact BFS ball sets are
    * O(n²) memory on dense components. State per node is ≤ 2^p register
    * rows (sparse (node, bucket, reg) representation — a node touching
    * few hash buckets stores few rows); each round is one edges⋈regs
    * join + a map-side-combined MAX aggregate, so round cost is
    * O(|E|·buckets-touched), linear in edges. Rounds are fixed (the
    * §2.70 replayable-trainer discipline: the oracle must unroll the
    * same count); register max-merge is idempotent, so saturated rounds
    * are harmless. Per-round output: node count and the INTEGER sum of
    * per-node milli-estimates (each est is the [[Sketch.hllEstimate]]
    * fixed IEEE sequence, floored to a BIGINT before the sum — integer
    * addition keeps the cross-engine sum order-free).
    *
    * Radius 0 rows double as an estimator-bias fixpoint: every ball is
    * exactly {v}, so sum_est_milli/n_nodes at r=0 IS the raw HLL
    * single-element estimate both engines must agree on.
    */
  def hyperBall(edges: DataFrame, idA: String, idB: String, rounds: Int,
                p: Int, rhoCap: Int, numScaled: Double,
                // probe hook: called with the register frame after each
                // merge round (GraphDiagScaleProbe measures the sparse
                // state's row growth); null in catalog use — zero extra
                // actions on that path
                onRound: (Int, DataFrame) => Unit = null): DataFrame = {
    val spark = edges.sparkSession
    val ckpt = ckptFor(spark)
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
    val nodes = sym.select(col("src").as("v")).distinct()
    val m = 1L << p
    def summary(r: Int, regs: DataFrame): DataFrame =
      regs.groupBy(col("_g"))
        .agg(sum(expr(s"shiftleft(cast(1 as bigint), cast($rhoCap - reg as int))"))
            .as("_sp"),
          count(lit(1)).as("_nb"))
        .withColumn("_s",
          col("_sp") + (lit(m) - col("_nb")) * lit(1L << rhoCap))
        .select(floor(lit(numScaled) / col("_s").cast("double") * lit(1000.0))
          .cast("long").as("_em"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("_em")).as("sum_est_milli"))
        .select(lit(r.toLong).as("radius"), col("n_nodes"),
          col("sum_est_milli"))
    var regs = ckpt(Sketch.hllRegisters(
      nodes.select(col("v"),
        Text.polyHash(concat(col("v").cast("string"), lit("#hb"))).as("_h0")),
      col("v"), col("_h0"), p, rhoCap))
    var out = summary(0, regs)
    for (t <- 1 to rounds) {
      val fromNbr = sym.join(regs.withColumnRenamed("_g", "dst"), "dst")
        .select(col("src").as("_g"), col("bucket"), col("reg"))
      regs = ckpt(regs.unionByName(fromNbr)
        .groupBy(col("_g"), col("bucket")).agg(max(col("reg")).as("reg")))
      if (onRound != null) onRound(t, regs)
      out = out.unionByName(summary(t, regs))
    }
    out
  }
}
