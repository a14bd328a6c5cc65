package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: deterministic
  * sampling, stratified quotas, token-budget mixing, and benchmark
  * decontamination. All selection is keyed on the cross-engine polynomial
  * hash ([[Text.polyHash]]) of a caller-chosen key — NOT on `rand()` or
  * `df.sample` — so membership is a pure function of the row, independent
  * of partitioning, task retries, and engine (the DuckDB oracle recomputes
  * the identical sample).
  *
  * Scale notes (100 TB):
  *  - [[sampleByHash]] is a pure per-row filter — no shuffle, no state,
  *    survives any repartitioning, and composes with partition pruning
  *    (the filter sits directly over the scan).
  *  - [[stratifiedQuota]] / [[mixByBudget]] rank within a stratum via a
  *    window — one shuffle on the stratum key. A stratum's rows land on
  *    one task, which is exactly right when quotas/budgets are
  *    human-sized (benchmark assembly, eval splits). For quotas that are
  *    themselves huge, take a hash-threshold pre-cut first
  *    (`sampleByHash` at ~2x the target rate) and trim exactly inside
  *    the shrunken stratum — the two-pass form keeps the window input
  *    bounded by the quota, not the corpus.
  *  - [[decontaminate]] broadcasts the BENCHMARK shingle set (benchmark
  *    suites are ~10^4..10^6 shingles — small by construction, vs the
  *    corpus side which never re-shuffles: one explode, a broadcast
  *    semi-ish join that only keeps matching shingles, then a partial
  *    aggregation whose input is bounded by the contamination volume,
  *    not the corpus size).
  */
object Sampling {

  /** The deterministic per-row sampling key: cross-engine polynomial hash
    * of `key#seed`, uniform-ish over [0, PolyP). A different `seed` gives
    * a decorrelated resample of the same corpus.
    */
  def sampleHash(key: Column, seed: String): Column =
    Text.polyHash(concat(key.cast("string"), lit("#" + seed)))

  /** Keep rows whose hash lands under `permille`/1000 — the reproducible
    * `df.sample` replacement (Spark's `sample` draws per-partition, so
    * membership changes under repartitioning; this never does).
    */
  def sampleByHash(df: DataFrame, key: Column, seed: String,
                   permille: Int): DataFrame =
    df.where(sampleHash(key, seed) % 1000 < permille)

  /** Score-weighted (importance) sampling: keep a row when its hash lands
    * under a PER-ROW acceptance threshold `permille` — i.e. row i survives
    * with probability permille_i/1000, deterministically. This is the
    * quality-/length-weighted resampling step (DSIR-family shape: sample
    * documents proportionally to an importance weight) with the same
    * reproducibility contract as [[sampleByHash]]: membership is a pure
    * function of (key, seed, score) — partitioning-, retry- and
    * growth-stable, and the oracle recomputes it exactly. `permille`
    * should be an INTEGER column (cross-engine float comparison at the
    * threshold boundary is not reproducible); values ≤ 0 never sample,
    * ≥ 1000 always sample. Pure per-row filter — no shuffle.
    */
  def sampleByScore(df: DataFrame, key: Column, seed: String,
                    permille: Column): DataFrame =
    df.where(sampleHash(key, seed) % 1000 < permille)

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): EXACTLY k rows
    * weighted by `weight`, without replacement — the fixed-budget
    * complement of [[sampleByScore]]'s Bernoulli thinning (which only hits
    * a target size in expectation). Integer form: with h = the
    * [[Sketch.hllMix]]-avalanched [[sampleHash]] ∈ [0, 2³²) standing in
    * for u = (h+1)/2³² ∈ (0, 1], the priority is q = w·2³² div (h+1)
    * ≈ w/u; the k largest priorities (ties → key) are the sample, τ = the
    * (k+1)-th priority, and each kept row carries the scheme's unbiased
    * subset-sum estimator ŵ = max(w, τ). Note q is ALREADY in weight
    * units (w/u with u ∈ (0,1]), so τ is too — no rescaling. Sum ŵ over
    * any kept subset estimates that subset's true weight total
    * (E[ŵᵢ] = wᵢ under DLT), the property that makes a k-doc sample
    * answer corpus-weight questions. The mix is REQUIRED, not cosmetic:
    * the raw poly hash is affine in sequential keys, which lattices the
    * extreme low-u tail that priority sampling's τ lives in (measured:
    * τ pinned at ~2.4× its uniform value across unrelated seeds before
    * the avalanche; unbiased after).
    *
    * Scale shape: priorities are a scan-stage projection; the k+1 cut is
    * sort+limit → TakeOrderedAndProject (per-partition top-(k+1), no
    * global sort), and τ/rank run on the k+1 survivors (the keywordRank
    * bounded-window precedent). Deterministic, partitioning-/retry-stable,
    * and exactly replayable cross-engine — all divisions floored on
    * positive operands. Weights must be ≥ 1; w·2³² must fit BIGINT
    * (w ≤ ~2.1·10⁹).
    */
  def priorityKSample(df: DataFrame, key: Column, seed: String,
                      weight: Column, k: Int): DataFrame = {
    require(k >= 1)
    val topk1 = df
      .withColumn("_w", weight.cast("long"))
      .withColumn("_h", Sketch.hllMix(sampleHash(key, seed)))
      .withColumn("_q", expr(s"_w * 4294967296L div (_h + 1L)"))
      .orderBy(col("_q").desc, key.asc)
      .limit(k + 1)
    val ranked = Text.rankBounded(topk1, Seq(col("_q").desc, key.asc))
    val tau = ranked.agg(
      max(when(col("rank") === k + 1, col("_q"))).as("_tau"))
    ranked.where(col("rank") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("est_w",
        greatest(col("_w"), coalesce(col("_tau"), lit(0L))))
      .drop("_w", "_h", "_q", "_tau")
  }

  /** Deterministic train/val/test split assignment: the row's hash lands in
    * [0, 1000) and `cuts` carve it into labeled ranges — e.g.
    * `Seq(("train", 900), ("val", 950), ("test", 1000))` (cumulative
    * permille upper bounds, last must be 1000). Reproducible,
    * partitioning-invariant, and growth-stable: a document never migrates
    * between splits when the corpus grows or reshuffles (unlike
    * `randomSplit`, which draws per-partition) — the property that keeps
    * eval splits leakage-free across dataset versions. Pure per-row
    * projection: no shuffle, composes with pushdown.
    */
  def splitByHash(df: DataFrame, key: Column, seed: String,
                  cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 1000 &&
        cuts.map(_._2) == cuts.map(_._2).sorted && cuts.forall(_._2 > 0),
      s"cuts must be ascending cumulative permille ending at 1000: $cuts")
    val h = sampleHash(key, seed) % 1000
    val label = cuts.tail.foldLeft(when(h < cuts.head._2, cuts.head._1)) {
      case (acc, (name, ub)) => acc.when(h < ub, name)
    }
    df.withColumn("split", label)
  }

  /** Exactly `quota` rows per stratum (fewer when the stratum is smaller),
    * chosen deterministically in hash order with the key as tiebreak.
    * `rank` (1-based position in the stratum's hash order) is kept so
    * downstream splits can sub-slice without re-ranking.
    */
  def stratifiedQuota(df: DataFrame, stratum: Column, key: Column,
                      seed: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(sampleHash(key, seed).asc, key.asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= quota)
  }

  /** Token-budget dataset mixing: per `source`, take documents in
    * deterministic hash order until the cumulative `tokens` reaches that
    * source's `budget` (the crossing document is excluded — the kept mix
    * never overshoots). This is the "mix N tokens of web + M of code"
    * assembly step; budgets are normally small driver-side constants per
    * source (a literal CASE), so the whole mix is one window pass.
    */
  def mixByBudget(df: DataFrame, source: Column, key: Column,
                  tokens: Column, budget: Column, seed: String): DataFrame = {
    val w = Window.partitionBy(source)
      .orderBy(sampleHash(key, seed).asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(tokens).over(w))
      .where(col("_cum") <= budget)
      .drop("_cum")
  }

  /** Benchmark decontamination: per corpus document, count the distinct
    * shingle hashes it shares with ANY benchmark document and flag it when
    * the count reaches `minOverlap`. Returns flagged docs only:
    * `(id, n_overlap, overlap_ratio)` where the ratio is n_overlap over
    * the doc's own distinct-shingle count, TRUNCATED to 4 decimals
    * (integer-ratio doubles can land exactly on .5 round boundaries —
    * truncation is bit-identical cross-engine, see Viz.trunc).
    *
    * `shingleHashes` must be a distinct array of hashes per row (e.g.
    * `array_distinct(transform(Text.shingles(col("text"), n), Text.polyHash))`)
    * so the post-join count is a distinct-overlap count without a
    * corpus-wide distinct.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, id: String,
                    shingleHashes: Column, minOverlap: Int,
                    minRatio: Double = 0.0): DataFrame = {
    val b = bench.select(explode(shingleHashes).as("h")).distinct()
    corpus
      .select(col(id), size(shingleHashes).as("_n_sh"),
        explode(shingleHashes).as("h"))
      .join(broadcast(b), "h")
      .groupBy(col(id), col("_n_sh"))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .select(col(id), col("n_overlap"),
        (floor(col("n_overlap") * lit(10000.0) / col("_n_sh")) /
          lit(10000.0)).as("overlap_ratio"))
      // threshold the TRUNCATED ratio so both engines cut the same set
      .where(col("overlap_ratio") >= minRatio)
  }

  /** Span-level decontamination (the Lee et al. 2021 production form of
    * [[decontaminate]]): instead of flagging WHOLE docs, remove only the
    * contaminated SPANS and reassemble each doc's text from its clean
    * remainder — a doc sharing one benchmark paragraph keeps everything
    * else. Corpus docs split into fixed `spanWords`-word spans (the
    * [[Text.dedupSpans]] segmentation); a span is contaminated when ≥
    * `minOverlap` of its distinct word-`shingleN`-gram hashes hit the
    * benchmark set AND the truncated overlap ratio ≥ `minRatio`
    * (alignment-insensitive: the n-gram test fires however the benchmark
    * passage straddles span boundaries). Returns one row per corpus doc:
    * (id, n_spans, n_kept, clean_text) — untouched docs pass through with
    * n_kept = n_spans.
    *
    * Scale shape: benchmark n-gram set broadcasts (eval suites are small
    * by construction); the corpus side is one posexplode + one broadcast
    * join + a partial count keyed (id, pos), then the doc-keyed
    * reassembly shuffle — linear in corpus tokens, no corpus-wide
    * shuffle beyond the final per-doc rollup. Spans shorter than
    * `shingleN` words carry no n-grams and are never flagged.
    */
  def decontaminateSpans(corpus: DataFrame, bench: DataFrame, id: String,
                         text: Column, benchShingleHashes: Column,
                         spanWords: Int, minOverlap: Int,
                         minRatio: Double, shingleN: Int = 3): DataFrame = {
    require(spanWords >= 1, s"decontaminateSpans: spanWords >= 1, got $spanWords")
    val bh = bench.select(explode(benchShingleHashes).as("h")).distinct()
    // one-pass native span builder (the HOF form re-split the text per
    // span position — WordSpansExpr scaladoc)
    val spans = Text.wordSpans(text, spanWords)
    val sp = corpus.select(col(id), posexplode(spans).as(Seq("pos", "span")))
      .withColumn("_sh", array_distinct(
        transform(Text.shingles(col("span"), shingleN), Text.polyHash(_))))
    val contam = sp
      .select(col(id), col("pos"), size(col("_sh")).as("_n"),
        explode(col("_sh")).as("h"))
      .join(broadcast(bh), "h")
      .groupBy(col(id), col("pos"))
      .agg(count(lit(1)).as("_n_ov"), first(col("_n")).as("_n"))
      .where(col("_n_ov") >= minOverlap)
      // threshold the TRUNCATED ratio so both engines cut the same set
      .where(floor(col("_n_ov") * lit(10000.0) / col("_n")) / lit(10000.0)
        >= minRatio)
      .select(col(id), col("pos"), lit(true).as("_contam"))
    sp.join(contam, Seq(id, "pos"), "left")
      .withColumn("_keep", col("_contam").isNull)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"), col("_keep").as("keep"),
                col("span")))),
              s => s("keep")),
            s => s("span")),
          " ").as("clean_text"))
  }

  /** DSIR-family importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): select raw-corpus
    * documents whose hashed-n-gram feature distribution looks like a
    * TARGET corpus. Per token bucket b = polyHash(word) mod `nBuckets`,
    * a Laplace-smoothed bucketed unigram ratio model gives the
    * importance log-weight log2(p_target(b) / p_raw(b)); a document's
    * score is its mean token log-weight, and acceptance is the
    * deterministic [[sampleByScore]] hash threshold at
    * `permille = clamp(500 + score_cb, 0, 1000)` — reproducible,
    * partitioning-/retry-/growth-stable, replayed exactly by the oracle.
    *
    * Cross-engine integer discipline (the surprisal-family rules):
    *  - the log-ratio is kept in WHOLE BITS of the 1024-scaled ratio:
    *    `contrib+10 = bits(max(1, tgt_c·rawT·1024 div (raw_c·tgtT)))`
    *    with bits(x) = length(bin(x))−1 — pure integer, exact on both
    *    engines, ~1-bit resolution shifted 10 bits up so sub-bit ratios
    *    don't all collapse to zero. Overflow bound: the product is ≤
    *    tgtT·rawT·1024 — BIGINT-safe below ~2·10⁸ tokens per side; past
    *    that drop to the difference form (bits(tgt_c)−bits(tgtT)) −
    *    (bits(raw_c)−bits(rawT)), same family, coarser.
    *  - the per-doc mean divides a NON-NEGATIVE numerator: contribs are
    *    ≥ −10, so `(Σ tf·(contrib+10))·100 div n_toks − 1000` keeps both
    *    engines' integer division on the same (nonnegative) operands —
    *    negative `div`/`//` semantics differ across engines and never
    *    enter.
    *
    * Scale shape: explode → per-(doc, bucket) counts (map-side combine
    * absorbs in-doc repetition), bucket model is one nBuckets-row agg
    * (broadcast back), one doc-keyed rollup; acceptance is a pure
    * per-row filter. No corpus-wide window, no all-pairs anything.
    * Returns kept raw-side docs: (id, n_toks, score_cb, permille).
    */
  def dsirResample(df: DataFrame, id: String, text: Column,
                   isTarget: Column, nBuckets: Int,
                   seed: String): DataFrame = {
    require(nBuckets >= 2, s"dsirResample: nBuckets >= 2, got $nBuckets")
    val toks = df.select(col(id), isTarget.as("_t"),
      explode(split(text, " ")).as("_w"))
    val perDoc = toks
      .select(col(id), col("_t"), pmod(Text.polyHash(col("_w")),
        lit(nBuckets.toLong)).as("_bk"))
      .groupBy(col(id), col("_t"), col("_bk"))
      .agg(count(lit(1)).as("_tf"))
    val model = perDoc.groupBy(col("_bk")).agg(
      (sum(when(col("_t"), col("_tf")).otherwise(lit(0L))) + 1L).as("_tgtc"),
      (sum(when(!col("_t"), col("_tf")).otherwise(lit(0L))) + 1L).as("_rawc"))
    val tot = model.agg(sum("_tgtc"), sum("_rawc")).head
    val (tgtT, rawT) = (tot.getLong(0), tot.getLong(1))
    val contrib = model.select(col("_bk"),
      (length(bin(greatest(lit(1L),
        expr(s"_tgtc * ${rawT}L * 1024L div (_rawc * ${tgtT}L)")))) - 1)
        .cast("long").as("_cb10")) // = contrib + 10, always >= 0
    perDoc.where(!col("_t"))
      .join(broadcast(contrib), "_bk")
      .groupBy(col(id))
      .agg(sum(col("_tf")).as("n_toks"),
        sum(col("_tf") * col("_cb10")).as("_s10"))
      .withColumn("score_cb",
        expr("_s10 * 100 div n_toks") - lit(1000L))
      .withColumn("permille",
        greatest(lit(0L), least(lit(1000L), lit(500L) + col("score_cb"))))
      .where(sampleHash(col(id).cast("string"), seed) % 1000 < col("permille"))
      .select(col(id), col("n_toks"), col("score_cb"), col("permille"))
  }
}
