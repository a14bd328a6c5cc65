package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for LLM-training-data pipelines.
  *
  * Everything here is built from codegen'd built-ins (split/transform/
  * filter/aggregate higher-order functions) — no UDFs — so the operators
  * stay inside whole-stage codegen and scale linearly with input bytes.
  */
object Text {

  /** Modulus for the cross-engine polynomial string hash (fits 64-bit
    * arithmetic: acc < 1e9+7, acc*31 + 255 < 2^35).
    */
  val PolyP = 1000000007L

  /** Modulus for combining signature slices into band keys
    * (acc < 9e15 → acc*131 + 2^31 < 2^63).
    */
  val BandP = 9007199254740881L

  /** Character codes of a string as array<long>; empty strings are dropped
    * on BOTH engines (Spark's split keeps a trailing "", DuckDB's
    * string_split('','') yields [''] — filtering makes them agree).
    */
  private def charCodes(s: Column): Column =
    transform(filter(split(s, ""), ch => ch =!= ""), ch => ascii(ch).cast("long"))

  /** Cross-engine deterministic string hash: fold
    * `(acc * 31 + charCode) mod 1e9+7` over the characters. Exactly
    * reproducible in DuckDB via
    * `list_reduce(list_prepend(0, codes), (acc,c) -> (acc*31+c) % 1000000007)`
    * — unlike murmur3 `hash()`, so signature queries hashed this way can be
    * oracle-checked. Murmur3 stays the default for pure-Spark scale paths
    * (native expression, no per-char loop).
    *
    * CONTRACT: ASCII input only. Spark's `split(s, "")` yields UTF-16 code
    * units (surrogate pairs split in two) while DuckDB's `string_split`
    * yields code points, and the engines' `ascii()` differ beyond 0x7F —
    * so on non-ASCII text the two folds diverge. For a multilingual corpus
    * hash explicit bytes on both engines (`encode(s,'utf-8')` / `encode()`)
    * instead of character codes.
    */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.PolyHashExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(s)))

  /** Built-ins-only polyHash (per-char HOF fold) — kept for cross-checking
    * the native expression; the spec suite asserts bit-equality on the
    * corpus. ~50x slower than `polyHash` (lambda interpretation per char).
    */
  def polyHashHof(s: Column): Column =
    aggregate(charCodes(s), lit(0L), (acc, c) => pmod(acc * 31 + c, lit(PolyP)))

  /** Murmur3 token hash as long — the fast default for Spark-only paths. */
  def murmurHash(s: Column): Column = hash(s).cast("long")

  /** Distinct word n-gram shingles of a text column. Texts with fewer than
    * `n` words yield an empty array (unguarded, `sequence(0, size-n)` would
    * produce a descending sequence and `slice(_, 0, n)` errors — SQL array
    * indices are 1-based).
    */
  def shingles(text: Column, n: Int): Column =
    // native one-pass form (byte-span shingles, first-occurrence distinct);
    // shinglesHof is the built-ins twin the spec suite asserts bit-equality
    // against — the HOF chain interpreted a lambda per shingle, ~30 CPU-s
    // per sf0.1 corpus pass
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.WordShinglesExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(text), n))

  /** Built-ins-only shingles — cross-check twin of `shingles`. */
  def shinglesHof(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Native `fold((acc * 131 + v) pmod BandP)` over an array<long> — the
    * segment/band key combiner (see PolyFoldExpr for the HOF-equality
    * contract).
    */
  private[graft] def polyFold(arr: Column, seed: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.PolyFoldExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(arr),
        org.apache.spark.sql.graft.ColumnShim.expression(seed), 131L, BandP))

  /** Exact-duplicate grouping on a normalization of the text
    * (fifoset.go dedupe analog; exact dedup = hash-groupBy, the cheapest
    * dedup tier). Returns one row per duplicate group.
    */
  /** §2.99 RAG passage chunking: overlapping token windows (width W,
    * stride S) per doc — the unit retrieval indexes are built over.
    * Passage count is 1 + ceil(max(0, n − W)/S); the last window may be
    * short so no token is orphaned. Output rows are
    * (id, chunk_id, start_tok, len_tok, chunk_hash) — narrow by design
    * (text rematerializes by (id, start) lookup); the hash is the
    * native codegen polyhash. PER-ROW stateless (a sequence explode +
    * projections, no window/join/aggregate), so the same plan runs
    * unchanged over a stream — StatsSpec asserts batch/stream parity.
    */
  def chunkPassages(df: DataFrame, id: String, text: Column,
                    w: Long, s: Long): DataFrame =
    df.select(col(id), split(text, " ").as("ws"))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          expr(s"(greatest(0L, n_tok - $w) + ${s - 1}) div $s"))))
      .withColumn("start_tok", col("chunk_id") * s + 1)
      .withColumn("len_tok",
        least(lit(w), col("n_tok") - col("start_tok") + 1))
      .select(col(id), col("chunk_id"), col("start_tok"), col("len_tok"),
        polyHash(array_join(
          slice(col("ws"), col("start_tok").cast("int"),
            col("len_tok").cast("int")), " ")).as("chunk_hash"))

  def exactDupGroups(df: DataFrame, id: String, normalized: Column): DataFrame =
    df.withColumn("_norm", normalized)
      .groupBy("_norm")
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_dups"),
        array_sort(collect_list(col(id))).as("members"))
      .where(col("n_dups") > 1)

  /** Exact pairwise n-gram Jaccard >= `minJaccard` via the partition-based
    * set-similarity join (PTJ, Deng et al., "A partition-based method for
    * exact set similarity joins", VLDB'15) — EXACT results at corpus scale
    * without the quadratic cross-join and without an inverted index:
    *
    * 0. Bucket docs into geometric LENGTH CLASSES (ratio 1/t); a
    *    qualifying pair's sizes are within factor 1/t, so it lives in
    *    exactly one two-class group and each group sizes its own `p` from
    *    the group-local lmax — one long doc can't degrade the short tail's
    *    segment selectivity (see the inline length-class comment).
    * 1. Partition the shingle UNIVERSE into `p` parts by `hash(sh) mod p`.
    *    A doc's segment for part i = its (sorted) shingles hashing to i.
    * 2. If J(A,B) >= t then |A Δ B| <= (1-t)/(1+t) * (|A|+|B|) < p, so the
    *    differing shingles touch < p parts — some part's segments are
    *    IDENTICAL. Candidates = pairs agreeing exactly on >= 1 segment
    *    (folded to a 64-bit key; hash collisions only ADD candidates).
    * 3. Candidates (plus the |A| >= t*|B| length filter) are verified with
    *    an exact string-array intersect over the full shingle sets.
    *
    * vs the prefix-filter family (see `jaccardPairsPrefix`): prefix pruning
    * needs RARE tokens to be discriminative and collapses on dense/templated
    * corpora where every token's document frequency is high (measured here:
    * 931-shingle vocab, median df 285 → 1.5M prefix candidates vs 145k
    * partition candidates for 256 true pairs). Segment agreement keys stay
    * selective regardless of token frequencies, need no global vocabulary
    * ranking (no df-count shuffle, no range sort), and the shuffle key is
    * (part, segment-hash) so bucket sizes — not corpus size — bound the
    * pairwise work.
    *
    * EMPTY segments (docs shorter than lmax leave most parts empty) are the
    * one quadratic hazard: every short doc agrees with every other on each
    * both-empty part, so joining them pairs the short tail N² (measured: 10x
    * corpus replication sent the join 33s → 76s purely on both-empty
    * buckets). They are therefore handled ANALYTICALLY, never joined: a pair
    * has at most min(ep_a, ep_b) = p - max(np_a, np_b) both-empty
    * agreements (np = doc's non-empty part count), so "agreements >= p - D"
    * tightens to NON-EMPTY agreements >= max(np_a, np_b) - D — the join
    * runs over non-empty segments only. A qualifying pair can evade that
    * join entirely only when both docs' np <= D (its <= D diff shingles
    * must cover every non-empty part of each doc); those docs — np no
    * larger than D's per-doc ceiling floor(n*(1-t)/t), i.e. shingles
    * concentrated into few parts — form a fallback set F joined exactly
    * (pairwise max(np) <= D filter + verification). F is empty unless
    * hashing concentrates a doc's shingles ~t/(1-t)-fold, so the fallback
    * is a correctness net, not a work path.
    */
  def jaccardPairs(df: DataFrame, id: String, shingleCol: Column,
                   minJaccard: Double, assumeSpread: Boolean = false,
                   // None = adaptive gate (lmax > 4x median engages classes);
                   // Some(b) forces class mode on/off — profiling/A-B hook,
                   // both paths are exact
                   classes: Option[Boolean] = None): DataFrame = {
    val t = minJaccard
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Spread the input BEFORE evaluating the shingle expression (a
    // single-split scan would shingle every doc on one core); persist the
    // per-doc sets — they feed segment generation AND both verify sides.
    // `assumeSpread` skips the repartition when the caller already
    // materialized a spread corpus (the composed dedup pipeline shares one
    // checkpointed base across its tiers — re-shuffling it would be a
    // pure-overhead exchange).
    // FLAT exploded (doc, shingle, hash64) rows — everything downstream is
    // codegen'd relational ops over these. No array<string> columns survive
    // past this point: columnar-caching / deserializing array payloads
    // measured 10x the cost of the actual join work, so sets are
    // represented as rows and set intersection as a counting join.
    // localCheckpoint (row-format materialization) rather than persist():
    // the shingle expression is by far the priciest per-row code here and
    // FOUR consumers need sh (lmax, segments, both verify sides), but the
    // columnar SQL cache measured slower to re-read than recomputing, while
    // checkpointed rows scan at full speed. LAZY (r16): the stats head()
    // below materializes it inside its own job — a dedicated eager job
    // bought nothing (the eager-to-lazy sweep; FhAbProbe's measured
    // job-floor class).
    val sh = (if (assumeSpread) df else df.repartition(par))
      .select(col(id).as("doc"), explode(array_distinct(shingleCol)).as("sh"))
      .withColumn("_h", hash(col("sh")).cast("long"))
      .localCheckpoint(false)
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    // LENGTH CLASSES, engaged adaptively: p sized from a GLOBAL lmax lets
    // one long doc inflate p for the whole short tail — segments degrade
    // toward single-shingle sets and segment agreement toward "shares any
    // shingle" (the inverted-index Σdf² blowup PTJ exists to avoid). The
    // cure is geometric length classes with ratio 1/t:
    // cls = floor(ln n / ln(1/t)). A qualifying pair has sizes within
    // factor 1/t (J >= t forces |B| >= t|A|), so its classes differ by at
    // most 1 — every pair lives in exactly the group g = min(cls_a, cls_b),
    // where group g spans classes {g, g+1}. Each doc joins groups
    // {cls-1, cls} (2x segment duplication) and each group gets its own p
    // from the GROUP lmax: |A Δ B| <= (1-t)/(1+t)*2*lmax_g < p_g for every
    // pair assigned to g.
    //
    // The 2x fan-out is pure overhead when lengths are benign (measured
    // ~30% on the sf corpus, whose 12 dense occupied classes make every doc
    // pay), so classes engage only when the tail is actually damaging:
    // lmax > 4x median means the global p forces the median doc's segments
    // ~4x too fine. Below that, one global group IS the class design (all
    // bulk docs within a few classes) minus the duplication. Both paths are
    // exact — the spec suite pins fast == naive on benign AND skewed
    // corpora. The two driver-side scalars are an aggregate over the
    // per-doc counts (tiny), same cost shape as r3's lmax head().
    val (lmax, lmed) = {
      val r = counts.agg(max("n_sh"), expr("percentile(n_sh, 0.5)")).head
      (if (r.isNullAt(0)) 1L else r.getLong(0),
        if (r.isNullAt(1)) 1.0 else r.getDouble(1))
    }
    val singleGroup = classes match {
      case Some(b) => !b
      case None => lmax.toDouble <= 4.0 * lmed
    }
    def pFor(l: Long): Int = (math.floor((1 - t) / (1 + t) * 2 * l) + 1).toInt.max(1)
    // (grp, doc, n_sh, cls, p_g) memberships. Single-group mode: every doc
    // in group 0 with the global p — the r3 shape. Class mode: a pair's
    // group is min(cls_a, cls_b) — always some member doc's OWN class — so
    // membership in cls-1 is kept only when that class is PRESENT (sparse
    // class layouts skip the 2x).
    val logInvT = math.log(1.0 / t)
    val mem =
      if (singleGroup)
        counts.select(col("doc"), col("n_sh"), lit(0).as("cls"),
          lit(0).as("grp"), lit(pFor(lmax)).as("p_g"))
      else {
        val withCls = counts.withColumn("cls",
          floor(log(col("n_sh").cast("double")) / logInvT).cast("int"))
        val clsPresent = withCls.select(col("cls").as("grp")).distinct()
        val membership = withCls
          .select(col("doc"), col("n_sh"), col("cls"),
            explode(array(col("cls") - 1, col("cls"))).as("grp"))
          .where(col("grp") >= 0)
          .join(broadcast(clsPresent), Seq("grp"), "left_semi")
        // per-group part count; the group list is tiny → broadcast
        val pByGrp = membership.groupBy("grp").agg(max("n_sh").as("lmax_g"))
          .withColumn("p_g",
            (floor(lit((1 - t) / (1 + t)) * 2 * col("lmax_g")) + 1).cast("int"))
          .select("grp", "p_g")
        membership.join(broadcast(pByGrp), Seq("grp"))
      }
    // Segment key: an ORDER-INDEPENDENT combination of the part's shingle
    // hashes — each hash avalanche-mixed with the (part, grp) seed via
    // xxhash64, then (36-bit-masked sum, bit_xor, count) folded through a
    // final xxhash64. Equal shingle sets get equal keys by commutativity
    // (no sort, no collected array); unequal sets collide only with
    // xxhash-level probability, and a collision only ADDS a candidate the
    // exact verification join kills — exactness is unaffected (spec pins
    // fast == naive). This replaced the sorted polynomial fold
    // (collect_list + sort_array per group): that form could not combine
    // map-side — every (doc, shingle) row crossed the exchange and the
    // grouped sorts were the operator's largest CPU block — while a
    // commutative aggregate ships one partial row per group per mapper and
    // needs no explicit repartition guard (the old CPU-heavy final agg had
    // to be force-spread; the final merge of partials is trivial).
    // The 36-bit mask keeps the sum ANSI-safe: 2^36 per term x up to 2^26
    // shingles in one part stays under 2^63 (overflow would THROW under
    // Spark 4's default ANSI mode, not wrap).
    // Only NON-EMPTY segments are materialized and joined —
    // empty-segment agreements are accounted for by the np-based bound
    // below, never enumerated. Shingle rows carry ONLY (grp, p_g) through
    // the segment groupBy; per-(grp, doc) metadata re-attaches afterwards
    // from the small `mem` (in single-group mode the constants attach for
    // free — no join).
    def segKey: Column = xxhash64(
      sum(col("_m").bitwiseAND(lit((1L << 36) - 1))),
      expr("bit_xor(_m)"),
      count(lit(1)))
    val segsNonEmpty = (
      if (singleGroup)
        sh.withColumn("grp", lit(0)).withColumn("p_g", lit(pFor(lmax)))
      else sh.join(mem.select("doc", "grp", "p_g"), Seq("doc")))
      .withColumn("part", pmod(col("_h"), col("p_g")).cast("int"))
      .withColumn("_m", xxhash64(col("_h"), col("part"), col("grp")))
      .groupBy("grp", "doc", "part")
      .agg(segKey.as("seg"))
    val npDf = segsNonEmpty.groupBy("grp", "doc").agg(count(lit(1)).as("np"))
    val docMeta = mem.select("grp", "doc", "n_sh", "cls", "p_g")
      .join(npDf, Seq("grp", "doc")) // (grp, doc, n_sh, cls, p_g, np)
    val segs = segsNonEmpty.select("grp", "doc", "part", "seg")
      .join(docMeta.drop("p_g"), Seq("grp", "doc"))
      // round-robin spread: the tiny upstream exchanges get AQE-coalesced
      // to ~1 partition and every join below is a broadcast (adds no
      // exchange), so without this the self-join + match-count aggregation
      // would run serially
      .repartition(par)
    // A qualifying pair agrees on >= p_g - D(|A|,|B|) segments total; at
    // most p_g - max(np_a, np_b) of those can be both-empty, so it agrees
    // on >= max(np_a, np_b) - D NON-EMPTY segments. Counting matching parts
    // per pair and applying that bound keeps candidate verification
    // proportional to the TRUE pair count (measured here: 145k one-segment
    // candidates -> ~300 surviving the match-count bound for 256 true
    // pairs). The min-class rule assigns each pair to ONE group, so the
    // match-count grouping needs no grp key and no cross-group dedup.
    val dBound = floor(lit((1 - t) / (1 + t)) * (col("n_a") + col("n_b")))
    val sa = segs.toDF("grp", "doc_a", "part", "seg", "n_a", "cls_a", "np_a")
    val sb = segs.toDF("grp", "doc_b", "part", "seg", "n_b", "cls_b", "np_b")
    val candMain = sa.join(sb, Seq("grp", "part", "seg"))
      .where(col("doc_a") < col("doc_b") &&
        col("n_a") >= col("n_b") * t && col("n_b") >= col("n_a") * t &&
        col("grp") === least(col("cls_a"), col("cls_b")))
      .groupBy("doc_a", "doc_b", "n_a", "n_b", "np_a", "np_b")
      .agg(count(lit(1)).as("_nmatch"))
      .where(col("_nmatch") >= greatest(col("np_a"), col("np_b")) - dBound)
      .select("doc_a", "doc_b", "n_a", "n_b")
    // Fallback net: a qualifying pair with ZERO non-empty agreements needs
    // max(np_a, np_b) <= D; since D <= floor(n*(1-t)/t) for every
    // admissible partner of a doc of size n, only docs with np under that
    // per-doc ceiling can participate — and a pair with EITHER doc above
    // its ceiling has max(np) > D, so only both-in-fDocs pairs need a net.
    val fDocs = docMeta
      .where(col("np") <= floor(col("n_sh") * lit((1 - t) / t)))
    // fDocs is NOT guaranteed tiny: docs within ~(1+t)/2 of their group's
    // lmax_g auto-qualify (p_g itself sits below their np ceiling), so a
    // size-heavy top class — e.g. a replicated-giant corpus — lands its
    // whole population here, and pairing it exactly is quadratic WITH
    // wide-doc verification (measured 10x probe with 0.5% giant docs:
    // 55 s vs 13 s benign; ~31k giant pairs x ~3k-shingle verify joins).
    // So REFINE instead of pair: re-segment only fDocs' shingles with a
    // finer p2_g = 2*p_g + 1. The match-count theorem holds for ANY part
    // count — non-empty agreements >= max(np2) - D — and np2 grows with
    // p2 while D stays fixed, so the bound that was vacuous at p_g
    // (np ~ p_g - 1 ~ D) turns selective at 2x the parts. False giant
    // pairs share ~no segments and die here; the exact pairwise join
    // survives only as the residual net for docs whose np2 STILL sits
    // under the ceiling (needs ~t/(1-t)-fold hash concentration twice —
    // empty in every measured corpus).
    val fSh = sh.join(fDocs.select("doc", "grp", "p_g"), Seq("doc"))
    val segs2 = fSh
      .withColumn("part", pmod(col("_h"), col("p_g") * 2 + 1).cast("int"))
      .withColumn("_m", xxhash64(col("_h"), col("part"), col("grp")))
      .groupBy("grp", "doc", "part")
      .agg(segKey.as("seg")) // same commutative key as segsNonEmpty
    val np2Df = segs2.groupBy("grp", "doc").agg(count(lit(1)).as("np2"))
    val fMeta = fDocs.select("grp", "doc", "n_sh", "cls").join(np2Df, Seq("grp", "doc"))
    val fSegs = segs2.join(fMeta, Seq("grp", "doc")).repartition(par)
    val fa = fSegs.toDF("grp", "doc_a", "part", "seg", "n_a", "cls_a", "np2_a")
    val fb = fSegs.toDF("grp", "doc_b", "part", "seg", "n_b", "cls_b", "np2_b")
    val candRefined = fa.join(fb, Seq("grp", "part", "seg"))
      .where(col("doc_a") < col("doc_b") &&
        col("n_a") >= col("n_b") * t && col("n_b") >= col("n_a") * t &&
        col("grp") === least(col("cls_a"), col("cls_b")))
      .groupBy("doc_a", "doc_b", "n_a", "n_b", "np2_a", "np2_b")
      .agg(count(lit(1)).as("_nmatch"))
      .where(col("_nmatch") >= greatest(col("np2_a"), col("np2_b")) - dBound)
      .select("doc_a", "doc_b", "n_a", "n_b")
    val fDocs2 = fMeta.where(col("np2") <= floor(col("n_sh") * lit((1 - t) / t)))
    val candFb = fDocs2.toDF("grp", "doc_a", "n_a", "cls_a", "np2_a")
      .join(fDocs2.toDF("grp", "doc_b", "n_b", "cls_b", "np2_b"), Seq("grp"))
      .where(col("doc_a") < col("doc_b") &&
        col("n_a") >= col("n_b") * t && col("n_b") >= col("n_a") * t &&
        col("grp") === least(col("cls_a"), col("cls_b")) &&
        greatest(col("np2_a"), col("np2_b")) <= floor(
          lit((1 - t) / (1 + t)) * (col("n_a") + col("n_b"))))
      .select("doc_a", "doc_b", "n_a", "n_b")
    val cand = candMain.union(candRefined).union(candFb).distinct()
    // Counting verification: |A ∩ B| = rows surviving the two equi-joins
    // through the exploded table (exact string equality on the shingle, so
    // hash collisions cannot inflate the count). Requires t > 0: pairs with
    // zero overlap produce no rows, which can never reach the threshold.
    cand
      .join(sh.select(col("doc").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .where(col("jaccard") >= t)
      .select("doc_a", "doc_b", "common", "n_a", "n_b", "jaccard")
  }

  /** Exact pairwise n-gram Jaccard >= `minJaccard` via prefix-filtered
    * inverted index (AllPairs/PPJoin, Bayardo et al. WWW'07) — the classic
    * alternative to `jaccardPairs`, kept because its pruning wins when the
    * vocabulary is heavy-tailed (natural text: rare tokens make prefixes
    * selective) while the partition method wins on dense vocabularies:
    *
    * 1. Rank the vocabulary by ascending document frequency (rarest first).
    * 2. Index each doc only by its prefix: the first
    *    |A| - ceil(t * |A|) + 1 shingles in that global order. If
    *    J(A,B) >= t then |A∩B| >= t * max(|A|,|B|), so the prefixes of both
    *    docs must share a shingle — no true pair is lost.
    * 3. Candidate pairs (prefix-join on the rare shingles, plus the
    *    |A| >= t * |B| size filter) are verified with an exact
    *    intersect/union count over the full rank arrays.
    *
    * The shuffle key is the shingle rank; prefixes hold the RAREST shingles
    * so posting lists — and the pair blowup — stay small even when the
    * corpus shares a dense common vocabulary. The vocab ranking window runs
    * over the distinct-shingle aggregate (Heaps'-law small vs the corpus);
    * at extreme vocab sizes swap it for a zipWithIndex rank.
    */
  def jaccardPairsPrefix(df: DataFrame, id: String, shingleCol: Column,
                         minJaccard: Double): DataFrame = {
    val t = minJaccard
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Spread the input BEFORE shingling (a single-split scan would compute
    // every shingle on one core), and persist the exploded shingle set: it
    // feeds the vocab ranking (whose range-sort adds a boundary-sampling
    // pass) AND the doc-ranks join — without the cache the shingling runs
    // 3x per action. LIFECYCLE: both persists here are released when the
    // returned DataFrame's first action completes would be ideal, but Spark
    // has no "unpersist after next action" hook — so the caches are pinned
    // to docRanks' materialization: docRanks is persisted eagerly via a
    // count() below, after which sh can be dropped (docRanks carries
    // everything downstream consumers need). docRanks itself stays cached
    // for the caller's action and is released on session cache-clear
    // (Verify/Bench clear between queries) — the one-persist residue is
    // documented here rather than leaked silently.
    val sh = df.repartition(par)
      .select(col(id).as("doc"), explode(shingleCol).as("sh"))
      .persist()
    // Global rarest-first vocabulary rank. The prefix-filter theorem holds
    // for ANY shared total order, and intersection counts only need rank
    // UNIQUENESS — contiguity is irrelevant. So instead of a row_number()
    // over an unpartitioned window (single-partition sort = a wall at corpus
    // scale), use a range-partitioned sort + monotonically_increasing_id:
    // ids are monotone across the sorted partitions (partition index is the
    // high bits), unique, and the sort stays fully distributed.
    val ranked = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .sort(col("df"), col("sh"))
      .withColumn("rank", monotonically_increasing_id())
      .select("sh", "rank")
    // One compact row per doc (sorted rank array); reused by the prefix
    // index and both sides of the verification join — persist so the
    // shingle explosion + ranking runs once, not four times.
    val docRanks = sh.join(ranked, "sh")
      .groupBy("doc")
      .agg(array_sort(collect_list("rank")).as("ranks"), count(lit(1)).as("n_sh"))
      .withColumn("prefix_len",
        (col("n_sh") - ceil(col("n_sh") * t) + 1).cast("int"))
      .persist()
    // materialize docRanks now so the shingle-explosion cache can be
    // released immediately — without this, repeated invocations in one
    // session accumulate executor storage (sh is the big one: one row per
    // (doc, shingle))
    docRanks.count()
    sh.unpersist()
    val prefix = docRanks
      .select(col("doc"), col("n_sh"),
        posexplode(slice(col("ranks"), lit(1), col("prefix_len"))))
      .withColumnRenamed("col", "rank").withColumnRenamed("pos", "ppos")
    // Candidate pairs via the prefix index, with a positional filter (PPJoin
    // family): every common shingle of (A,B) sits at or after the first
    // matched prefix position in each doc's rank order (a lower-ranked
    // common shingle would itself be a prefix match), so
    // common <= min(|A| - i0, |B| - j0). Prune pairs whose bound can't
    // reach the required overlap ceil(t/(1+t) * (|A|+|B|)).
    val needed = ceil(lit(t / (1.0 + t)) * (col("n_a") + col("n_b")))
    val cand = prefix.toDF("doc_a", "n_a", "ppos_a", "rank")
      .join(prefix.toDF("doc_b", "n_b", "ppos_b", "rank"), Seq("rank"))
      .where(col("doc_a") < col("doc_b") &&
        col("n_a") >= col("n_b") * t && col("n_b") >= col("n_a") * t)
      .groupBy("doc_a", "doc_b")
      .agg(max(col("n_a") - col("ppos_a")).as("rest_a"), // n - i0, i0 = first match
        max(col("n_b") - col("ppos_b")).as("rest_b"),
        first("n_a").as("n_a"), first("n_b").as("n_b"))
      .where(least(col("rest_a"), col("rest_b")) >= needed)
      .select("doc_a", "doc_b")
    cand
      .join(docRanks.select(col("doc").as("doc_a"), col("ranks").as("r_a"),
        col("n_sh").as("n_a")), "doc_a")
      .join(docRanks.select(col("doc").as("doc_b"), col("ranks").as("r_b"),
        col("n_sh").as("n_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("r_a"), col("r_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .where(col("jaccard") >= t)
      .select("doc_a", "doc_b", "common", "n_a", "n_b", "jaccard")
  }

  /** MinHash signatures: k permutations of shingle hashes via
    * (a_i * h + b_i) mod p — the classic Broder construction. Returns the
    * input plus `sig` (array of k minima). `tokenHash` picks the shingle
    * hash: murmur3 (default, fast) or `polyHash` (cross-engine, lets a
    * DuckDB oracle recompute identical signatures).
    */
  /** Modulus of the minhash permutation family: 2^31 - 1, Mersenne prime. */
  val MinhashP = 2147483647L

  /** Deterministic (a_i, b_i) constants for the minhash permutations
    * p_i(h) = (a_i*h + b_i) mod MinhashP, from a seeded xorshift64.
    * LARGE multipliers are load-bearing: with small a (1,3,5..) the linear
    * map preserves locality of the base hash, and locality-clustered inputs
    * (polynomial hashes of shingles sharing prefixes) then correlate the
    * per-permutation minima across documents — LSH candidate precision
    * collapses (observed: 204k candidates for 246 true pairs at sf0.1).
    * Large random a,b form the standard universal family: pairwise-uniform
    * for any input distribution. Exposed so DuckDB oracles embed the SAME
    * constants. No overflow: a,h < 2^31 → a*h < 2^62.
    */
  def minhashPermConsts(k: Int): Seq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    (0 until k).map { _ =>
      val a = java.lang.Math.floorMod(next(), MinhashP - 1) + 1
      val b = java.lang.Math.floorMod(next(), MinhashP)
      (a, b)
    }
  }

  def minhashSignature(df: DataFrame, shingleCol: Column, k: Int,
                       tokenHash: Column => Column = murmurHash): DataFrame =
    // hash each shingle ONCE into an array, then one native pass computes
    // all k permutation minima (the HOF form interpreted a lambda per
    // (shingle x permutation); kept as minhashSignatureHof for the spec
    // suite's bit-equality check)
    df.withColumn("_mh_th", transform(shingleCol, tokenHash))
      .withColumn("sig", org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.MinhashSigExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col("_mh_th")),
          minhashPermConsts(k), MinhashP)))
      .drop("_mh_th")

  /** Built-ins-only minhash signature — cross-check twin of
    * `minhashSignature`.
    */
  def minhashSignatureHof(df: DataFrame, shingleCol: Column, k: Int,
                          tokenHash: Column => Column = murmurHash): DataFrame = {
    val sigs = minhashPermConsts(k).map { case (a, b) =>
      array_min(transform(col("_mh_th"), h => pmod(h * a + b, lit(MinhashP))))
    }
    df.withColumn("_mh_th", transform(shingleCol, tokenHash))
      .withColumn("sig", array(sigs: _*))
      .drop("_mh_th")
  }

  /** LSH banding of a minhash signature: (band index, band hash) keys.
    * Near-dup candidates = pairs sharing any band bucket; shuffle is on the
    * (band, hash) key so bucket sizes — not corpus size — bound the join.
    * The band key is a polynomial fold of the band's slice (seeded with the
    * band index) — engine-independent, so oracles can reproduce it, and a
    * fold over `rows` values costs nothing next to the signature itself.
    */
  def lshBands(df: DataFrame, bands: Int, rows: Int): DataFrame =
    df.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash",
        polyFold(slice(col("sig"), col("band") * rows + 1, lit(rows)),
          col("band").cast("long")))

  /** SimHash: sign-aggregated bit fingerprint of token hashes (Charikar).
    * Texts within small Hamming distance are near-dups. Returned with a
    * bucket key (top bits above bit 16) for block-join candidate
    * generation. `nBits` must not exceed the hash's value range (32 for
    * murmur3's low word; 30 for `polyHash`, whose values are < 1e9+7).
    */
  def simhash(df: DataFrame, tokens: Column, nBits: Int = 32,
              tokenHash: Column => Column = murmurHash): DataFrame =
    // hash once per token, then one native pass does all nBits sign sums
    // (the HOF form interpreted a lambda per (token x bit); kept as
    // simhashHof for the spec suite's bit-equality check)
    df.withColumn("_th", transform(tokens, t => tokenHash(t)))
      .withColumn("simhash", org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.SimhashExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col("_th")), nBits)))
      .withColumn("bucket", shiftright(col("simhash"), 16))
      .drop("_th")

  /** Built-ins-only simhash — cross-check twin of `simhash`. */
  def simhashHof(df: DataFrame, tokens: Column, nBits: Int = 32,
                 tokenHash: Column => Column = murmurHash): DataFrame = {
    val bits = (0 until nBits).map { b =>
      // +1 where bit b of the token hash is set, -1 otherwise; sum over tokens
      when(aggregate(col("_th"), lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    df.withColumn("_th", transform(tokens, t => tokenHash(t)))
      .withColumn("simhash", bits.reduce((a: Column, b: Column) => a.bitwiseOR(b)))
      .withColumn("bucket", shiftright(col("simhash"), 16))
      .drop("_th")
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * k-gram hashes, sliding window of w, keep each window's minimum.
    * Returns `(id, fps)` with the distinct fingerprints sorted ascending.
    * With `crossEngine = true` the k-gram hash is the polynomial fold over
    * char codes (DuckDB-reproducible → oracle-checkable); default murmur3.
    *
    * RELATIONAL shape (r8 rebuild): the hash array posexplodes once
    * (Generate evaluates its producer once per row) and the winnow
    * minimum is a rows-frame window min per doc — the earlier nested-HOF
    * form sliced a multiply-referenced `_h` column inside a lambda, which
    * can inline the producer and re-derive the whole hash array per
    * window, O(len²·k) per doc (the dedupChunksCdc lesson; invisible on
    * 300-char sf docs, fatal on 100 KB real ones). Per-position hashing
    * indexes the STRING attribute (substr — O(k) even when inlined),
    * never a derived array column.
    */
  def winnowFingerprints(df: DataFrame, id: String, text: Column, k: Int,
                         w: Int, crossEngine: Boolean = false): DataFrame = {
    // r12: the cross-engine path hashes every k-gram in ONE native pass
    // (KgramPolyHashExpr) — the HOF's substr(_t, i+1, k) walks the byte
    // stream from 0 to the i-th char boundary, O(len²) per doc once docs
    // leave the 300-char regime (10x SKEW probe: 73.6 s vs a ~13 s linear
    // prediction). kgramPolyHashHof stays as the bit-equality twin.
    val hashArr =
      if (crossEngine) kgramPolyHashNative(col("_t"), k)
      else
        expr(s"transform(sequence(0, greatest(length(_t) - $k, 0)), " +
          s"i -> cast(abs(hash(substr(_t, i + 1, $k))) as bigint))")
    // r14: the winnow itself is native too (WinnowMinsExpr, monotonic
    // deque) — the relational winnowFrom explodes one row per k-gram
    // POSITION (~total corpus chars) through an exchange + per-doc sort,
    // which went ~2x super-linear at the 100x skew probe (148–182 s vs
    // 7.6 s at 10x, same session). One Project, zero shuffles; hashArr
    // is referenced ONCE so the producer cannot re-derive (the
    // multiply-referenced-array rule). winnowFrom stays as the
    // bit-equality twin (GramExprSpec).
    df.select(col(id), text.as("_t"))
      .select(col(id), org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.WinnowMinsExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(hashArr), w))
        .as("fps"))
  }

  /** The winnow pipeline downstream of the per-position hash array —
    * the RELATIONAL bit-equality twin of the native winnow (posexplode →
    * per-doc window min → collect_set), used by the spec suite.
    */
  private def winnowFrom(df: DataFrame, id: String, text: Column,
                         hashArr: Column, w: Int): DataFrame = {
    val wMin = Window.partitionBy(col(id)).orderBy(col("_p").asc)
      .rowsBetween(Window.currentRow, w - 1)
    df.select(col(id), text.as("_t"))
      .select(col(id), posexplode(hashArr).as(Seq("_p", "_hv")))
      .withColumn("_min", min(col("_hv")).over(wMin))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(id))))
      // full windows only; a doc with fewer than w k-grams keeps its one
      // truncated window at position 0 (the slice semantics of the HOF form)
      .where(col("_p") <= col("_n") - w || (col("_n") < w && col("_p") === 0))
      .groupBy(col(id))
      .agg(array_sort(collect_set(col("_min"))).as("fps"))
  }

  /** [[winnowFingerprints]] with the interpreted HOF hash — the
    * bit-equality spec twin (GramExprSpec).
    */
  private[graft] def winnowFingerprintsHofForSpec(df: DataFrame, id: String,
      text: Column, k: Int, w: Int): DataFrame =
    winnowFrom(df, id, text, kgramPolyHashHof("_t", k), w)

  /** NATIVE hash + RELATIONAL winnow — isolates WinnowMinsExpr against
    * the posexplode/window-min twin at arbitrary w (GramExprSpec r14).
    */
  private[graft] def winnowRelationalForSpec(df: DataFrame, id: String,
      text: Column, k: Int, w: Int): DataFrame =
    winnowFrom(df, id, text, kgramPolyHashNative(col("_t"), k), w)

  /** One-pass native k-gram poly hashes (see KgramPolyHashExpr). */
  private[graft] def kgramPolyHashNative(t: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.KgramPolyHashExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(t), k, PolyP))

  /** The interpreted per-position HOF chain the native expression
    * replaced — kept as the bit-equality twin (GramExprSpec): positions
    * 0..max(len−k, 0), each the poly fold over the gram's `ascii` codes.
    * `tName` is the column name the expression string references.
    */
  private[graft] def kgramPolyHashHof(tName: String, k: Int): Column =
    expr(s"transform(sequence(0, greatest(length($tName) - $k, 0)), i -> " +
      s"aggregate(transform(filter(split(substr($tName, i + 1, $k), ''), " +
      s"c -> c <> ''), c -> cast(ascii(c) as bigint)), " +
      s"cast(0 as bigint), (acc, c) -> pmod(acc * 31 + c, ${PolyP}L)))")

  /** Language ID by marker-token counting — the n-gram/stopword heuristic
    * tier of langid. Markers per language are counted over whitespace
    * tokens; highest count wins, 'und' if no marker hits.
    */
  def detectLanguage(tokens: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(tokens, t => ws.map(t === _).reduce(_ || _))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality metrics for filter pipelines: word count, mean word length,
    * stopword ratio, uppercase/punctuation ratios.
    */
  def qualityMetrics(df: DataFrame, text: Column, stopwords: Seq[String]): DataFrame = {
    val words = split(text, " ")
    df.withColumn("n_chars_actual", length(text))
      .withColumn("n_words", size(words))
      .withColumn("mean_word_len",
        (length(text) - (size(words) - 1)).cast("double") / size(words))
      .withColumn("stopword_ratio",
        size(filter(words, w => stopwords.map(w === _).reduce(_ || _))).cast("double")
          / size(words))
  }

  /** Repetition signals for quality filtering (the Gopher-rules family:
    * top-n-gram fraction, duplicate-n-gram fraction): per document, count
    * every word n-gram OCCURRENCE (not distinct — `shingles` dedups, so the
    * gram list is built inline), then roll up the modal gram's share and the
    * share of occurrences belonging to grams seen >= 2 times. Highly
    * repetitive machine-generated text scores near 1; natural text near 0.
    *
    * Shape: one explode + groupBy (id, gram) + per-id rollup — both
    * shuffles keyed on the doc id, linear in corpus token count, zero
    * cross-document work, so the stage partitions like the corpus itself.
    * Fractions are TRUNCATED to 4 decimals (integer-ratio doubles can land
    * exactly on .5 round boundaries — Viz.trunc precedent).
    */
  /** Span-level exact corpus dedup with document reassembly (the
    * deduplicate-training-data family, Lee et al. 2022 arXiv:2107.06499,
    * at fixed-span granularity): chunk every document into consecutive
    * `spanWords`-word spans, keep each distinct span's GLOBAL first
    * occurrence (ordered by (doc id, position) — deterministic and
    * engine-independent), drop every later occurrence anywhere in the
    * corpus, and rebuild each document from its surviving spans in
    * position order. Returns one row per input document:
    * (id, n_spans, n_kept, clean_text) — a fully-duplicated document
    * comes back with n_kept = 0 and an empty clean_text rather than
    * disappearing, so downstream joins see the whole corpus.
    *
    * Shape: one explode, one shuffle keyed on the span text (the
    * first-occurrence window), one shuffle back on the doc id for
    * reassembly — linear in corpus token count, no pairwise work. The
    * span string itself is the grouping key (exact semantics; a 31-bit
    * hash key would over-drop on collisions at ~10^5+ distinct spans).
    * At 100 TB the span-keyed exchange carries (span, id, pos) — the
    * corpus once — and hot spans (boilerplate repeated millions of
    * times) are exactly the rows the window then collapses; AQE skew
    * splitting handles the oversized span partitions.
    */
  def dedupSpans(df: DataFrame, id: String, text: Column,
                 spanWords: Int): DataFrame = {
    require(spanWords >= 1, s"dedupSpans: spanWords must be >= 1, got $spanWords")
    val spans = wordSpans(text, spanWords)
    val w = Window.partitionBy(col("span")).orderBy(col(id).asc, col("pos").asc)
    df.select(col(id), posexplode(spans).as(Seq("pos", "span")))
      .withColumn("_keep", row_number().over(w) === 1)
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

  /** Content-defined chunking (CDC) dedup + reassembly — the SHIFT-ROBUST
    * complement to [[dedupSpans]] (whose fixed word boundaries all move
    * when one word is inserted early in a doc, so nothing downstream
    * dedups). Chunk boundaries cut where the rolling k-char-gram poly
    * hash ≡ 0 (mod `divisor`) — a pure function of LOCAL content (the
    * rsync/LBFS boundary rule, Muthitacharoen et al. 2001), so an
    * insertion only reshapes the chunk it lands in and every later chunk
    * re-aligns and dedups. Expected chunk length ≈ `divisor` chars.
    * Dedup semantics match dedupSpans: each distinct chunk's global first
    * occurrence (by (id, pos)) survives; docs reassemble from surviving
    * chunks by direct concatenation (chunks are raw substrings).
    *
    * Shape: per-row HOF chunking (zero exchange), one shuffle keyed on
    * the chunk text (first-occurrence window; hot boilerplate chunks are
    * exactly the collapsing rows — AQE skew splitting covers them), one
    * doc-keyed rollup. Linear in corpus chars; the k-gram hash column is
    * the winnowFingerprints machinery, so DuckDB replays boundaries,
    * chunks, dedup and reassembly exactly.
    */
  def dedupChunksCdc(df: DataFrame, id: String, text: Column,
                     k: Int, divisor: Int): DataFrame = {
    require(k >= 2, s"dedupChunksCdc: k must be >= 2, got $k")
    require(divisor >= 2, s"dedupChunksCdc: divisor must be >= 2, got $divisor")
    // r14: chunking is ONE native pass per row (CdcChunksExpr — the
    // winnow-native sibling; the relational char-explode form below, kept
    // as dedupChunksCdcRelationalForSpec, moved ~250M (id, pos, code)
    // rows through a per-doc k-lead window at the 100x skew probe,
    // ~200 s of wall for what is per-row work). The cross-doc dedup
    // stays relational — that part genuinely needs the chunk-keyed
    // exchange, and its row count is corpus_chars/divisor, not
    // corpus_chars.
    val base = df.select(col(id), text.as("_t"))
    val chunks = org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.CdcChunksExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col("_t")),
        k, divisor.toLong, PolyP))
    val w = Window.partitionBy(col("chunk")).orderBy(col(id).asc, col("pos").asc)
    base.select(col(id), posexplode(chunks).as(Seq("pos", "chunk")))
      .withColumn("_keep", row_number().over(w) === 1)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                col("_keep").as("keep"), col("chunk")))),
              s => s("keep")),
            s => s("chunk")),
          "").as("clean_text"))
  }

  /** The RELATIONAL chunker — [[dedupChunksCdc]]'s bit-equality twin
    * (GramExprSpec r14): chars explode to rows, k lead() terms build the
    * boundary hash, cuts collect per doc, chunks slice via substr.
    */
  private[graft] def dedupChunksCdcRelationalForSpec(df: DataFrame,
      id: String, text: Column, k: Int, divisor: Int): DataFrame = {
    // The k-gram hashes are computed RELATIONALLY (chars exploded to rows,
    // k leads per row summed with positional powers of 31, one mod at the
    // end — congruent to the stepwise fold, so both engines agree), NOT as
    // nested array HOFs over a shared `_h` column: a downstream lambda
    // doing element_at over a multiply-referenced expensive array column
    // can get the producing expression INLINED per element (measured: the
    // HOF form re-derived the whole hash array per boundary test —
    // O(len²·k) per doc, 745 s of one-task CPU on a 150 KB corpus).
    // Boundary rows survive a scan-stage filter (≈ len/divisor of corpus
    // chars reach the per-doc collect); everything per-doc after that is
    // over the SMALL cuts array (len/divisor entries), where re-evaluation
    // per access is O(cuts) and harmless.
    val pow = Array.iterate(1L, k)(p => (p * 31) % PolyP)
    val base = df.select(col(id), text.as("_t"))
    val chars = base.select(col(id),
      posexplode(charCodes(col("_t"))).as(Seq("_p", "_ch")))
    val wDoc = Window.partitionBy(col(id)).orderBy(col("_p").asc)
    val terms: Column = (0 until k)
      .map(j => lead(col("_ch"), j).over(wDoc) * lit(pow(k - 1 - j)))
      .reduce((a: Column, b: Column) => a + b)
    val cutRows = chars
      .withColumn("_hv", pmod(terms, lit(PolyP)))
      .where(col("_p") > 0 && col("_hv").isNotNull &&
        pmod(col("_hv"), lit(divisor.toLong)) === 0)
      .groupBy(col(id)).agg(array_sort(collect_list(col("_p"))).as("_mid"))
    val w = Window.partitionBy(col("chunk")).orderBy(col(id).asc, col("pos").asc)
    base.join(cutRows, Seq(id), "left")
      .withColumn("_cuts", concat(array(lit(0)),
        coalesce(col("_mid"), array().cast("array<int>")),
        array(length(col("_t")))))
      .select(col(id), posexplode(expr(
        "transform(sequence(0, size(_cuts) - 2), j -> " +
          "substr(_t, element_at(_cuts, j + 1) + 1, " +
          "element_at(_cuts, j + 2) - element_at(_cuts, j + 1)))"))
        .as(Seq("pos", "chunk")))
      .withColumn("_keep", row_number().over(w) === 1)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                col("_keep").as("keep"), col("chunk")))),
              s => s("keep")),
            s => s("chunk")),
          "").as("clean_text"))
  }

  /** Exact-substring dedup — the suffix-array tier of the dedup family
    * (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better", the ExactSubstr tool re-expressed relationally): any
    * `minLen`-char window of text that occurs MORE than once in the corpus
    * is a duplicated substring; every occurrence except the global first
    * (ordered by (doc id, char position)) marks its `minLen` characters as
    * duplicate, overlapping marks union into maximal covered intervals
    * (so a repeated passage of ANY length ≥ minLen is covered end-to-end
    * by its overlapping windows — the maximal-repeat semantics the suffix
    * array gives, without building one), and each document reassembles
    * from its uncovered character ranges. Fixed spans ([[dedupSpans]])
    * miss re-aligned repeats, CDC ([[dedupChunksCdc]]) is probabilistic in
    * where it cuts; this tier is exact: a shared passage dedups wherever
    * it sits, at exact byte boundaries.
    *
    * Shape (the 100 TB argument): positions become rows ONCE
    * (corpus-chars rows, the [[dedupChunksCdc]] machinery); each row's
    * window hash is a k-term lead() sum in ONE per-doc window pass (never
    * the string — the exchange carries (id, pos, int64) at every corpus-
    * sized stage). A gram-hash-keyed window count then keeps only
    * positions whose hash occurs > 1 time — the duplicated-candidate
    * SLIVER (boilerplate + true repeats + rare collisions); only that
    * sliver joins back to the doc table to materialize real `minLen`-char
    * strings for the exact first-occurrence ranking, so string bytes never
    * amplify the corpus-wide shuffle. The prefilter is semantically
    * inert: a duplicated string always has a duplicated hash (no false
    * negatives), collisions only add candidates that the exact string
    * grouping then ranks rn=1 each. Interval union + gap extraction are
    * the classic prev-max-end window over the covered sliver; AQE skew
    * handling covers mega-hot boilerplate grams, and exact-dup-heavy
    * corpora should run exact-collapse-first (DupSkewProbe rule) like
    * every other sketch tier.
    */
  def dedupSubstrings(df: DataFrame, id: String, text: Column,
                      minLen: Int): DataFrame = {
    require(minLen >= 2, s"dedupSubstrings: minLen must be >= 2, got $minLen")
    val base = df.select(col(id), text.as("_t"),
      length(text).cast("long").as("_n"))
    // r14: the per-position window hashes come from ONE native pass
    // (KgramPolyHashExpr — posexplode of its array is a Generate, so the
    // producer evaluates once per row). The r13 form exploded one row per
    // CHARACTER and summed k lead() terms in a per-doc window — a
    // corpus-chars exchange + sort for per-row work, the same shape the
    // 100x skew probe caught in the winnow/CDC lanes. Same polynomial
    // mod p, so the candidate hashes are IDENTICAL; docs shorter than
    // minLen contribute no positions (the native array would emit its
    // one truncated gram — filtered by the length guard), matching the
    // lead-form's null exclusion. Position rows still become rows —
    // the cross-doc hash-keyed count genuinely needs them; only the
    // per-doc sort stage is gone.
    val grams = base.where(col("_n") >= minLen)
      .select(col(id),
        posexplode(kgramPolyHashNative(col("_t"), minLen))
          .as(Seq("_p", "_gh")))
      .select(col(id), col("_p").cast("long").as("_p"), col("_gh"))
    // candidate sliver: positions whose window hash occurs more than once
    val wHash = Window.partitionBy(col("_gh"))
    val cand = grams
      .withColumn("_hc", count(lit(1)).over(wHash))
      .where(col("_hc") > 1)
      .select(col(id), col("_p"))
    // exact pass on the sliver only: materialize the real strings, rank
    val exact = cand.join(base, Seq(id))
      .select(col(id), col("_p"),
        expr(s"substr(_t, cast(_p as int) + 1, $minLen)").as("_gram"))
    val wGram = Window.partitionBy(col("_gram")).orderBy(col(id).asc, col("_p").asc)
    val covered = exact
      .withColumn("_rn", row_number().over(wGram))
      .where(col("_rn") > 1)
      .select(col(id), col("_p").as("_s"), (col("_p") + minLen).as("_e"))
    // union overlapping covers into maximal intervals (prev-max-end trick)
    val wSeq = Window.partitionBy(col(id)).orderBy(col("_s").asc)
    val wPrev = wSeq.rowsBetween(Window.unboundedPreceding, -1)
    val merged = covered
      .withColumn("_ng",
        when(col("_s") > coalesce(max(col("_e")).over(wPrev), lit(-1L)), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("_grp", sum(col("_ng")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(id), col("_grp"))
      .agg(min(col("_s")).as("_ms"), max(col("_e")).as("_me"))
    // kept ranges = gaps between merged intervals + tail + untouched docs
    val wGap = Window.partitionBy(col(id)).orderBy(col("_ms").asc)
    val gaps = merged.select(col(id),
      coalesce(lag(col("_me"), 1).over(wGap), lit(0L)).as("_ks"),
      col("_ms").as("_ke"))
    val tails = merged.groupBy(col(id)).agg(max(col("_me")).as("_ks"))
      .join(base.select(col(id), col("_n")), Seq(id))
      .select(col(id), col("_ks"), col("_n").as("_ke"))
    val untouched = base.join(merged.select(col(id)).distinct(), Seq(id),
        "left_anti")
      .select(col(id), lit(0L).as("_ks"), col("_n").as("_ke"))
    val segs = gaps.unionByName(tails).unionByName(untouched)
      .where(col("_ke") > col("_ks"))
    base.join(segs, Seq(id), "left")
      .select(col(id), col("_n"), col("_ks"),
        when(col("_ks").isNull, lit(null).cast("string"))
          .otherwise(expr("substr(_t, cast(_ks as int) + 1, cast(_ke - _ks as int))"))
          .as("_seg"))
      .groupBy(col(id))
      .agg(
        max(col("_n")).as("n_chars"),
        (max(col("_n")) - coalesce(sum(length(col("_seg")).cast("long")), lit(0L)))
          .as("n_dup_chars"),
        coalesce(
          array_join(
            transform(
              array_sort(collect_list(struct(col("_ks"), col("_seg")))),
              s => s("_seg")),
            ""),
          lit("")).as("clean_text"))
  }

  /** HTML entity table for [[stripHtml]], in APPLICATION order (`&amp;`
    * last, the standard unescape discipline — otherwise `&amp;lt;` would
    * double-decode). Patterns and replacements are in the Java∩RE2 regex
    * subset (the Pii discipline) so DuckDB replays the rewritten text
    * byte-for-byte with regexp_replace(..., 'g').
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML boilerplate stripping — the WARC/HTML → text extraction stage a
    * C4-style web pipeline runs before every other text operator: drop
    * `<script>`/`<style>` blocks (content included), strip all remaining
    * tags, unescape the common entities, collapse whitespace runs, trim.
    * Pure scan-stage regexp projection, zero shuffles, streams at ingest;
    * block patterns use `[^<]*` (not non-greedy dot) so they stay in the
    * shared regex subset and never span into sibling markup.
    */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "<script[^>]*>[^<]*</script>", " "),
      "<style[^>]*>[^<]*</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val unescaped = HtmlEntities.foldLeft(noTags) {
      case (c, (ent, ch)) =>
        regexp_replace(c, ent, java.util.regex.Matcher.quoteReplacement(ch))
    }
    trim(regexp_replace(unescaped, "  *", " "))
  }

  /** Span-level quality filtering (the RefinedWeb/C4 LINE-filtering stage
    * at fixed-span granularity — drop boilerplate/degenerate passages,
    * keep the document): each `spanWords`-word span is scored LOCALLY
    * (truncated stopword ratio, truncated mean word length) and dropped
    * when stopword-heavy or length-degenerate; the doc reassembles from
    * surviving spans. Unlike whole-doc gating, a good document with one
    * navigation-ish passage keeps its content.
    *
    * Scale: the span explode + scoring is pure scan-stage projection —
    * ZERO joins, zero pre-rollup shuffles; the only exchange is the
    * doc-keyed reassembly. Fractions truncate multiply-then-divide so
    * both engines cut the same spans.
    */
  def filterSpansQuality(df: DataFrame, id: String, text: Column,
                         spanWords: Int, stopwords: Seq[String],
                         maxStopRatio: Double,
                         maxMeanWordLen: Double): DataFrame = {
    require(spanWords >= 1, s"filterSpansQuality: spanWords >= 1")
    val spans = wordSpans(text, spanWords)
    val sw = split(col("span"), " ")
    val swr = fracTrunc4(
      size(filter(sw, w => stopwords.map(w === _).reduce(_ || _))), size(sw))
    val meanLen = fracTrunc4(length(col("span")) - (size(sw) - 1), size(sw))
    df.select(col(id), posexplode(spans).as(Seq("pos", "span")))
      .withColumn("_keep", swr <= maxStopRatio && meanLen <= maxMeanWordLen)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                col("_keep").as("keep"), col("span")))),
              s => s("keep")),
            s => s("span")),
          " ").as("clean_text"))
  }

  /** Distributed dense global rank (row_number over a total order) WITHOUT
    * the single-partition global window: range-repartition on the sort key,
    * rank locally per partition, then add each partition's cumulative row
    * offset. rank(x) = |rows before x's partition| + local row_number — the
    * classic two-level composition, exact for any partition boundaries, so
    * the output is independent of the sampled range splits. The driver sees
    * only numPartitions (pid, count) scalars (the precedented bounded-stats
    * pattern); both shuffles are linear and parallel (range exchange, then a
    * pid-hash exchange for the local window — Catalyst can't see that the
    * range exchange already clusters by pid). `order` keys must be a total
    * order (no duplicate keys) for a deterministic result.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
                 rankCol: String = "rank", numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
            else spark.sparkContext.defaultParallelism
    // The range-partitioned frame is FROZEN (lazy checkpoint) before both
    // consumers read it. RangePartitioner boundaries come from a reservoir
    // sample seeded by the RDD id, so every physical INSTANCE of this
    // exchange can pick different boundaries — and exchange reuse, which
    // r5-r8 relied on to guarantee the offsets join and the data side see
    // ONE instance, is an optimization Spark may simply not apply: in
    // q_rank_sum's plan shape (cumsum → broadcast-scalar crossJoin → final
    // agg) the plan duplicated the exchange and the same write action
    // returned five different sums in five runs. Truncating to a single
    // RDD instance makes consistency STRUCTURAL: one instance, one
    // sampling, and recompute-on-block-loss re-fetches the pinned shuffle
    // rather than resampling. Lazy, so no extra action; honors
    // spark.graft.reliableCheckpoint for cluster-grade durability.
    val parts = graft.operators.Graph.ckptFor(spark)(
      df.repartitionByRange(n, order: _*)
        .withColumn("_pid", spark_partition_id()))
    val local = parts.withColumn("_lr",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(order: _*)))
    // Offsets stay RELATIONAL (tiny numParts² self-join, no driver
    // collect); they now provably ride the same frozen partitioning as
    // the data side, and the two-level math is exact for ANY boundaries.
    val counts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    val offs = counts.as("a")
      .join(counts.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid"))
      .agg(coalesce(sum(col("b._n")), lit(0L)).as("_off"))
    local.join(broadcast(offs), "_pid")
      .withColumn(rankCol, (col("_off") + col("_lr")).cast("int"))
      .drop("_pid", "_lr", "_off")
  }

  /** Rank for a PROVABLY BOUNDED frame (a post-sort+limit top-k, a
    * (k+1)-row sample, a fixed seed set): row_number over a CONSTANT-key
    * window. The constant partition key gives the window a clustered
    * distribution (one hash partition) instead of the empty-spec
    * move-everything-to-one-partition plan, so no single-partition
    * warning and none of [[globalRank]]'s exchanges — but it IS a
    * single-task sort, so the caller must guarantee boundedness by
    * construction (the upstream sort+limit). Corpus-sized frames go
    * through [[globalRank]]. Unlike globalRank this adds no plan
    * truncation, so upstream shapes (TakeOrderedAndProject) stay visible
    * to plan audits.
    *
    * The key must be constant-VALUED but not constant-FOLDABLE: Spark 4
    * prunes foldable expressions out of the window partition spec, which
    * turns a `lit(0)` key back into the empty-spec warning plan (found
    * in r9 — 94 warnings across a Verify run all traced here). A
    * `pmod(hash(firstCol), 1)` key is 0 on every row, references an
    * attribute so no optimizer rule folds it, and costs one codegen'd
    * hash per row on a ≤k-row frame.
    */
  def rankBounded(df: DataFrame, order: Seq[Column],
                  rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol,
      row_number().over(Window
        .partitionBy(pmod(hash(col(df.columns.head)), lit(1)))
        .orderBy(order: _*)))

  /** Distributed global cumulative sum over a total order — the classic
    * scan primitive as the [[globalRank]] two-level composition applied to
    * prefix SUMS: range-partition on the order, partition-local running
    * sum (each window bounded by its partition), then add the partition's
    * prefix offset from a numPartitions-scalar broadcast. Exact for any
    * boundary placement BECAUSE the summed column must be integral —
    * integer addition is associative, where a double cumsum would
    * re-associate across the regrouping. A single-partition
    * `Window.orderBy` cumsum is the q_vocab scale-killer class; this is
    * the shape that survives 10⁹ rows.
    */
  def globalCumsum(df: DataFrame, order: Seq[Column], value: Column,
                   outCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
            else spark.sparkContext.defaultParallelism
    // frozen-instance discipline — see globalRank's comment: exchange
    // reuse is NOT guaranteed, and a duplicated range exchange resamples
    // its boundaries, silently desynchronizing offsets from data
    val parts = graft.operators.Graph.ckptFor(spark)(
      df.withColumn("_v", value)
        .repartitionByRange(n, order: _*)
        .withColumn("_pid", spark_partition_id()))
    val local = parts.withColumn("_lc",
      sum(col("_v")).over(Window.partitionBy(col("_pid")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sums = local.groupBy(col("_pid")).agg(sum(col("_v")).as("_s"))
    val offs = sums.as("a")
      .join(sums.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid"))
      .agg(coalesce(sum(col("b._s")), lit(0L)).as("_off"))
    local.join(broadcast(offs), "_pid")
      .withColumn(outCol, col("_off") + col("_lc"))
      .drop("_pid", "_lc", "_off", "_v")
  }

  /** Corpus vocabulary induction (the tokenizer/vocab-build step): per
    * word, document frequency (docs containing it) and collection
    * frequency (total occurrences), cut at `minDf`, ranked by
    * (cf desc, word) — a deterministic total order. Shape: one explode,
    * groupBy (id, word) for the df term, then groupBy word — both
    * shuffles keyed on the word. The rank is [[globalRank]]'s two-level
    * composition, NOT a global window: a minDf=2 vocabulary over real web
    * text is 10⁸-10⁹ rows of typos/URLs, and a single-partition WindowExec
    * sort over that is the one task that never finishes at 100 TB.
    */
  def vocabulary(df: DataFrame, id: String, text: Column,
                 minDf: Int): DataFrame = {
    val v = df.select(col(id), explode(split(text, " ")).as("word"))
      .groupBy(col(id), col("word")).agg(count(lit(1)).as("_c"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum("_c").as("cf"))
      .where(col("df") >= minDf)
    globalRank(v, Seq(col("cf").desc, col("word").asc))
      .select(col("word"), col("df"), col("cf"), col("rank"))
  }

  /** The document's word n-gram array (occurrences, NOT deduped —
    * `shingles` dedups; repetition stats need every occurrence). Native
    * one-pass form (r12): the HOF twin below embeds the split SUBTREE in
    * its transform lambda and re-splits the whole text once per gram
    * position — O(len²) per doc, 13.2 s vs 1.8 s on the 10x SKEW probe's
    * 0.5 % giant docs (WordGramsExpr scaladoc has the full story).
    */
  private[graft] def gramOccurrences(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.WordGramsExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(text), n))

  /** Non-overlapping word spans of `spanWords` words (last span shorter)
    * — the one-pass native form shared by [[dedupSpans]],
    * [[filterSpansQuality]], and `Sampling.decontaminateSpans`
    * (WordSpansExpr scaladoc has the damped-quadratic HOF story;
    * [[wordSpansHof]] is the bit-equality twin).
    */
  def wordSpans(text: Column, spanWords: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.WordSpansExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(text), spanWords))

  /** Built-ins-only span builder — cross-check twin of [[wordSpans]]. */
  private[graft] def wordSpansHof(text: Column, spanWords: Int): Column = {
    val words = split(text, " ")
    val nSpans = ceil(size(words).cast("double") / spanWords).cast("int")
    transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(words, i * spanWords + 1, lit(spanWords)), " "))
  }

  /** Built-ins-only gram occurrences — cross-check twin of
    * [[gramOccurrences]] (bit-equality spec in GramExprSpec).
    */
  private[graft] def gramOccurrencesHof(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Truncated 4-decimal fraction, multiply-then-divide: ONE rounding, the
    * same operation order as the DuckDB oracles (divide-then-multiply
    * double-rounds and can flip the floor by an ulp at integer-ratio
    * boundaries).
    */
  def fracTrunc4(num: Column, den: Column): Column =
    floor(num.cast("double") * lit(10000.0) / den) / lit(10000.0)
  private def fracTrunc(num: Column, den: Column): Column = fracTrunc4(num, den)

  /** The native per-row repetition stats column over `text`'s word
    * n-grams: `struct<n_grams, n_distinct_grams, top_gram_n, dup_n>` —
    * doc-local, zero-exchange (see [[repetitionSignalsRowwise]]).
    */
  def repetitionStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.RepetitionStatsExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(
          gramOccurrences(text, n))))

  def repetitionSignals(df: DataFrame, id: String, text: Column,
                        n: Int): DataFrame = {
    require(n >= 1, s"repetitionSignals: n must be >= 1, got $n")
    val grams = gramOccurrences(text, n)
    df.select(col(id), explode(grams).as("_g"))
      .groupBy(col(id), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col(id)).agg(
        sum("_c").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max("_c").as("top_gram_n"),
        sum(when(col("_c") >= 2, col("_c")).otherwise(lit(0L))).as("_dup"))
      .select(col(id), col("n_grams"), col("n_distinct_grams"),
        col("top_gram_n"),
        fracTrunc(col("top_gram_n"), col("n_grams")).as("top_gram_frac"),
        fracTrunc(col("_dup"), col("n_grams")).as("dup_gram_frac"))
  }

  /** Shuffle-free twin of [[repetitionSignals]]: every statistic is local
    * to one document, so the whole rollup is a per-row native hash count
    * (`RepetitionStatsExpr`, one codegen pass over the gram array) — ZERO
    * exchanges vs the relational form's two; the output never leaves the
    * scan stage. Same output schema and bit-identical values
    * (spec-asserted against both the relational form and the sorted-fold
    * HOF twin), so the catalog oracle is unchanged.
    */
  def repetitionSignalsRowwise(df: DataFrame, id: String, text: Column,
                               n: Int): DataFrame = {
    require(n >= 1, s"repetitionSignalsRowwise: n must be >= 1, got $n")
    df.select(col(id), repetitionStats(text, n).as("_s"))
      .where(col("_s.n_grams") > 0) // docs with < n words: absent, like the
      .select(col(id),              // exploded form (no grams to group)
        col("_s.n_grams").as("n_grams"),
        col("_s.n_distinct_grams").as("n_distinct_grams"),
        col("_s.top_gram_n").as("top_gram_n"),
        fracTrunc(col("_s.top_gram_n"), col("_s.n_grams")).as("top_gram_frac"),
        fracTrunc(col("_s.dup_n"), col("_s.n_grams")).as("dup_gram_frac"))
  }

  /** Keyword relevance ranking (TF·IDF family, rational idf): score every
    * document containing any query term by Σ_t tf(t,d) · (N / df(t)) and
    * return the global top-k. Cross-engine determinism: the double sum is
    * a SORTED sequential fold over the doc's matched terms (term asc — the
    * ivfCentroidsDistributed centroid-mean pattern: shuffle arrival order
    * must not leak into float accumulation), the idf division happens ONCE
    * before the multiply on both engines, and ranks key on the TRUNCATED
    * score (sums of products can land on round-half boundaries; floor is
    * bit-identical — Viz.trunc), ties → doc id.
    *
    * Shape: explode + filter to the term set (tiny IN-list, pushed into
    * the scan stage), tf agg keyed on (doc, term), df agg keyed on term
    * (term-count-sized), broadcast idf join, per-doc fold, then
    * distributed top-k (sort+limit → TakeOrderedAndProject — no global
    * window over the corpus; the rank window runs on k rows).
    */
  def keywordRank(df: DataFrame, id: String, text: Column,
                  terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && k >= 1)
    val n = df.count() // driver scalar (corpus size), precedented
    val tf = df.select(col(id), explode(split(text, " ")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("dfc"))
    val contrib = tf.join(broadcast(dfs), "w")
      .withColumn("_c", (lit(n.toDouble) / col("dfc")) * col("tf"))
    val scored = contrib
      .groupBy(col(id))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("w"), col("_c")))),
          s => s("_c")),
        lit(0.0), (acc, c) => acc + c).as("_raw"))
      .select(col(id),
        (floor(col("_raw") * lit(10000.0)) / lit(10000.0)).as("score"))
    val top = scored.orderBy(col("score").desc, col(id).asc).limit(k)
    // k rows by construction → the constant-key bounded rank (no
    // single-partition warning, no extra exchanges, top-k shape stays
    // visible to plan audits)
    rankBounded(top, Seq(col("score").desc, col(id).asc))
  }

  /** BM25 retrieval ranking (Robertson & Spärck Jones probabilistic
    * family; the query-driven search lane — [[keywordRank]] is the raw
    * tf·idf cousin without saturation or length normalization), kept in
    * EXACT INTEGER arithmetic end-to-end so both engines compute the
    * identical score with zero float-reproducibility surface:
    *
    *  - k1 = 6/5 and b = 3/4 are exact rationals; with A = T div N (the
    *    floor average doc length — a 1-row broadcast stats frame riding
    *    the plan, not a driver scalar), the BM25
    *    term-frequency saturation
    *      tf·(k1+1) / (tf + k1·(1 − b + b·L/A))
    *    multiplies out to 44·A·tf / (20·A·tf + 6·A + 18·L), and the
    *    per-mille-scaled `tfsat = (44·A·tf·1000) div (20·A·tf+6·A+18·L)`
    *    is ONE integer division (≤ 2200) — the single rounding, identical
    *    on both engines.
    *  - idf is the scaled rational `(N·100) div df` (integer): the
    *    whole-bit log2 idf of the surprisal lanes loses ALL resolution on
    *    common terms (idf < 1 bit whenever df > N/2), so the rational
    *    form keeps ranking resolution while staying exact; the
    *    log-shaped damping BM25 wants comes from the tf saturation term,
    *    which is the part a plain tf·idf lacks.
    *  - score = Σ_t idf·tfsat is an INTEGER sum — order-independent, so
    *    no sorted-fold discipline is needed (the float lanes' one
    *    fragility simply doesn't exist here). Bounds: idf ≤ 100·N,
    *    tfsat ≤ 2200 ⇒ per-term ≤ 2.2·10⁵·N — BIGINT-safe past 10¹²
    *    documents.
    *
    * Shape at 100 TB (same skeleton as [[keywordRank]]): explode + an
    * IN-list filter that reaches the scan stage, per-(doc, term) tf agg,
    * term-count-sized df agg broadcast back, one integer rollup per doc,
    * then distributed top-k (sort+limit → TakeOrderedAndProject; the
    * rank window runs on k rows via [[globalRank]]). No global window,
    * no all-pairs term anywhere.
    */
  def bm25Rank(df: DataFrame, id: String, text: Column,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && k >= 1)
    // corpus stats ride the plan as a broadcast 1-row frame (the
    // precedented scalar-frame pattern): N, and A = floor avg doc length.
    // The former driver-side .head cost a second full-corpus scan in its
    // own action before the lane's real job could start.
    val stats = df.agg(count(lit(1)).as("_n"),
      sum(size(split(text, " ")).cast("long")).as("_t"))
      .select(col("_n"), expr("_t div _n").as("_avg"))
    val base = df.select(col(id), size(split(text, " ")).cast("long").as("_len"),
      split(text, " ").as("_ws"))
    val tf = base.select(col(id), col("_len"), explode(col("_ws")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col(id), col("_len"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("dfc"))
    val scored = tf.join(broadcast(dfs), "w")
      .crossJoin(broadcast(stats))
      .withColumn("_idf", expr("_n * 100L div dfc"))
      .withColumn("_tfsat", expr(
        "44L * _avg * tf * 1000L div " +
          "(20L * _avg * tf + 6L * _avg + 18L * _len)"))
      .groupBy(col(id))
      .agg(max(col("_len")).as("n_toks"), // one row per doc in tf; max = the value
        sum(col("_idf") * col("_tfsat")).as("score"))
    val top = scored.orderBy(col("score").desc, col(id).asc).limit(k)
    rankBounded(top, Seq(col("score").desc, col(id).asc))
  }

  /** Feature-hashing vectorizer (Weinberger et al. 2009, the "hashing
    * trick"): each document becomes a dense `dim`-bucket INTEGER
    * term-frequency vector — bucket = polyHash(word) mod dim — plus its
    * nnz and squared L2 norm (an exact integer: Σ c², no float anywhere).
    * The fixed-width integer vector is what makes downstream similarity
    * EXACT: cos²(a,b) = dot²/(‖a‖²·‖b‖²) is a ratio of integers, so a
    * threshold compares cross-multiplied BIGINTs — the one similarity
    * measure in the catalog with literally zero float surface.
    *
    * Shape: explode → (doc, bucket) count (map-side combinable) → one
    * doc-keyed rollup; the dense vector materializes from the ≤ dim
    * (bucket, count) pairs per doc, never from the word list. Returns
    * (id, vec, nnz, norm2, top_bucket) — top_bucket (max count, ties →
    * lowest index) doubles as a blocking key for candidate generation.
    */
  /** SPARSE feature-hashing vectorizer — the scale form of [[hashedTf]]
    * (r11 verdict item 1): the corpus-scaled bucket count (the
    * `pairCells` discipline applied to feature hashing — dim ∝ n keeps
    * blocking-bucket population fixed) makes a DENSE dim-length vector
    * nonsense at 10⁹ docs, so the vector stays what it physically is — a
    * ≤ nnz-entry (bucket → count) map — and the exact-integer dot is a
    * map intersection: O(nnz) per pair, INDEPENDENT of dim. Returns
    * (id, tf map, nnz, norm2, b1, b2) where (b1, b2) are the top-2
    * buckets by (count desc, bucket asc) — the two-bucket blocking key
    * (b2 = -1 for single-bucket docs). No dim cap: dim only appears as a
    * modulus.
    */
  def hashedTfSparse(df: DataFrame, id: String, text: Column,
                     dim: Long): DataFrame = {
    require(dim >= 2, s"hashedTfSparse: dim must be >= 2 (got $dim)")
    df.select(col(id), explode(split(text, " ")).as("_w"))
      .where(col("_w") =!= "")
      .withColumn("_bk", pmod(polyHash(col("_w")), lit(dim)))
      .groupBy(col(id), col("_bk")).agg(count(lit(1)).as("_c"))
      .groupBy(col(id))
      .agg(
        map_from_entries(collect_list(struct(col("_bk"), col("_c")))).as("tf"),
        count(lit(1)).as("nnz"),
        sum(col("_c") * col("_c")).as("norm2"),
        // struct sort is lexicographic by field, so (-count, bucket) asc
        // = (count desc, bucket asc) — the deterministic top-2 ranking
        sort_array(collect_list(struct((-col("_c")).as("nc"),
          col("_bk").as("bk")))).as("_rk"))
      .select(col(id), col("tf"), col("nnz"), col("norm2"),
        col("_rk").getItem(0).getField("bk").as("b1"),
        // get() is null (not an ANSI error) past the end — single-bucket
        // docs take the -1 sentinel
        coalesce(expr("get(_rk, 1).bk"), lit(-1L)).as("b2"))
  }

  /** Exact integer sparse dot over two [[hashedTfSparse]] maps: Σ over
    * shared buckets of cₐ·c_b. Long sums are order-independent, so the
    * undefined map_entries order is immaterial — bit-identical to any
    * relational bucket-join replay.
    */
  def sparseDot(a: Column, b: Column): Column =
    aggregate(map_entries(a), lit(0L),
      (acc, e) => acc + e.getField("value") *
        coalesce(element_at(b, e.getField("key")), lit(0L)))

  /** Exact sparse WORD-count vectorizer — the UN-hashed twin of
    * [[hashedTfSparse]] (r12 verdict item 1): (id, word → count map,
    * Σ count² norm). This is the VERIFY tier of the feature-hash dedup
    * lane — hashed maps block candidates, but the accept decision runs on
    * the exact word vectors, so a hash collision can never fabricate a
    * pair (Weinberger et al. use hashing for features, not for the
    * accept). [[sparseDot]] works unchanged over string keys. Shape: one
    * explode → (doc, word) count (map-side combinable) → one doc-keyed
    * rollup; map size = per-doc vocabulary, independent of corpus size.
    */
  def wordTfSparse(df: DataFrame, id: String, text: Column): DataFrame =
    df.select(col(id), explode(split(text, " ")).as("_w"))
      .where(col("_w") =!= "")
      .groupBy(col(id), col("_w")).agg(count(lit(1)).as("_c"))
      .groupBy(col(id))
      .agg(
        map_from_entries(collect_list(struct(col("_w"), col("_c")))).as("wtf"),
        sum(col("_c") * col("_c")).as("wnorm2"))

  def hashedTf(df: DataFrame, id: String, text: Column, dim: Int): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"hashedTf: unreasonable dim $dim")
    df.select(col(id), explode(split(text, " ")).as("_w"))
      .where(col("_w") =!= "")
      .withColumn("_bk", pmod(polyHash(col("_w")), lit(dim.toLong)))
      .groupBy(col(id), col("_bk")).agg(count(lit(1)).as("_c"))
      .groupBy(col(id))
      .agg(
        map_from_entries(collect_list(struct(col("_bk"), col("_c")))).as("_m"),
        count(lit(1)).as("nnz"),
        sum(col("_c") * col("_c")).as("norm2"),
        min(struct((-col("_c")).as("nc"), col("_bk").as("bk"))).as("_top"))
      .select(col(id),
        expr(s"transform(sequence(0L, ${dim - 1}L), b -> coalesce(element_at(_m, b), 0L))")
          .as("vec"),
        col("nnz"), col("norm2"), col("_top.bk").as("top_bucket"))
  }

  /** Reciprocal-rank-fusion of two ranked retrieval lists — the HYBRID
    * search combiner (Cormack et al. 2009 RRF; the lexical ⊕ semantic
    * fusion every production retrieval stack runs): each list contributes
    * `scale div (c + rank)` for the items it ranked, items missing from a
    * list contribute 0 from it, and the fused top-k re-ranks by
    * (fused score desc, id). The classic 1/(60+r) is kept EXACT as ONE
    * truncated integer division per (item, list) — the bm25Rank
    * discipline: integer sums are order-independent, so there is no
    * float-fold surface and both engines compute identical scores.
    *
    * Inputs carry (id, rank); ranks are dense 1..k per list. Scale: the
    * lists are top-k results (k rows each — bounded by construction), so
    * the full-outer join and final rank are k-sized no matter the corpus;
    * the heavy lifting happened inside the lanes being fused.
    */
  def hybridRrf(lex: DataFrame, sem: DataFrame, id: String,
                c: Int, scale: Long, k: Int): DataFrame = {
    require(c >= 0 && scale >= 1 && k >= 1)
    val l = lex.select(col(id), col("rank").as("lex_rank"))
    val s = sem.select(col(id), col("rank").as("sem_rank"))
    val fused = l.join(s, Seq(id), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"${scale}L div (${c}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"${scale}L div (${c}L + sem_rank)"), lit(0L)))
    val top = fused.orderBy(col("rrf").desc, col(id).asc).limit(k)
    rankBounded(top, Seq(col("rrf").desc, col(id).asc))
  }

  /** Built-ins bit-equality twin of `RepetitionStatsExpr`: sorted-fold
    * run-length pass (equal grams are adjacent after `array_sort`; a run
    * boundary closes the previous gram's count into top/distinct/dup).
    * Interpreted lambda per element — keep for the equality spec, use the
    * native form in the hot path (the ProfileJaccard precedent).
    */
  def repetitionStatsHof(grams: Column): Column = {
    val sorted = array_sort(grams)
    val init = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("top"), lit(0L).as("nd"), lit(0L).as("dup"))
    aggregate(sorted, init,
      (acc, g) => {
        val same = acc.getField("prev").isNotNull && acc.getField("prev") === g
        val run = acc.getField("run")
        struct(
          g.as("prev"),
          when(same, run + 1L).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("top"))
            .otherwise(greatest(acc.getField("top"), run)).as("top"),
          when(same, acc.getField("nd"))
            .otherwise(acc.getField("nd") + 1L).as("nd"),
          when(same, acc.getField("dup"))
            .otherwise(acc.getField("dup") +
              when(run >= 2L, run).otherwise(lit(0L))).as("dup"))
      },
      acc => {
        val run = acc.getField("run")
        struct(
          size(sorted).cast("long").as("n_grams"),
          acc.getField("nd").as("n_distinct_grams"),
          greatest(acc.getField("top"), run).as("top_gram_n"),
          (acc.getField("dup") + when(run >= 2L, run).otherwise(lit(0L)))
            .as("dup_n"))
      })
  }

  /** Integer-bit unigram surprisal scoring — the perplexity-filter tier of
    * quality pipelines (CCNet's LM-score shape), with log2 kept in WHOLE
    * BITS so the score is pure integer arithmetic end-to-end and both
    * engines compute it exactly (cross-engine `ln()` differs by ulps and
    * a 100-term log sum WILL land on rounding boundaries; `bits(c) =
    * floor(log2 c) = length(bin(c)) - 1` is exact everywhere).
    *
    * The unigram LM is trained on the corpus itself: token surprisal =
    * bits(N) - bits(count(token)) where N = total corpus token
    * occurrences; a document's score is the mean surprisal of its token
    * occurrences in centibits (`sum * 100 div n` — integer division, the
    * one rounding, identical on both engines). High scores = rare-token-
    * heavy documents (OOV soup, boilerplate codes); low = stopword soup.
    *
    * Shape at 100 TB: explode → per-(doc, token) counts (map-side
    * combine absorbs in-doc repetition before the exchange) → one
    * token-keyed join against the vocab (vocab rows are unique per
    * token, so hot tokens skew only the probe side — AQE splits them;
    * broadcast when the vocab fits) → one doc-keyed rollup. Two corpus
    * exchanges + one vocab-sized one; no all-pairs term anywhere. The
    * corpus-total N is one driver scalar (the precedented stats-collect),
    * exported to the oracle as integer arithmetic both engines replay.
    */
  def unigramSurprisal(df: DataFrame, id: String, text: Column): DataFrame = {
    val perDoc = df.select(col(id), explode(split(text, " ")).as("_w"))
      .groupBy(col(id), col("_w")).agg(count(lit(1)).as("_tf"))
    val vocab = perDoc.groupBy(col("_w")).agg(sum("_tf").as("_c"))
    val total = vocab.agg(sum("_c")).head.getLong(0)
    require(total > 0, "unigramSurprisal: empty corpus")
    val totalBits = 63 - java.lang.Long.numberOfLeadingZeros(total)
    val bits = length(bin(col("_c"))) - 1
    perDoc.join(vocab, "_w")
      .groupBy(col(id))
      .agg(sum(col("_tf")).as("n_toks"),
        sum(col("_tf") * (lit(totalBits.toLong) - bits)).as("sum_bits"))
      .withColumn("avg_centibits",
        expr("sum_bits * 100 div n_toks"))
  }

  /** Bigram LM surprisal with whole-bit stupid backoff (Brants et al.
    * 2007 "Large Language Models in Machine Translation" backoff shape;
    * the CCNet-style perplexity filter one order up from
    * [[unigramSurprisal]]): train unigram + bigram counts on the docs
    * matching `trainFilter`, score EVERY doc. Per token at position i≥2,
    *   seen bigram:  bits(c1(w_{i-1})) − bits(c2(w_{i-1}, w_i))
    *   backoff:      1 + bits(N) − bits(c1(w_i) | 1)
    * with bits(x) = ⌊log2 x⌋ = length(bin(x)) − 1 and backoff α = 1/2
    * folded into the whole-bit +1 (a power-of-2 α is exactly one bit —
    * the trick that keeps the whole score in integer arithmetic; a float
    * log sum would drift by ulps across engines). The first token scores
    * as plain unigram surprisal; unseen words back into count 1. Doc
    * score = mean surprisal in centibits via ONE integer division.
    *
    * Scale: explode → map-side-combined counts; scoring is one bigram
    * join + two unigram joins, all keyed on token text (hot tokens split
    * by AQE; tables broadcast when they fit). Train/score asymmetry is
    * the point: scoring the training corpus with itself never backs off.
    */
  def bigramSurprisal(df: DataFrame, id: String, text: Column,
                      trainFilter: Column): DataFrame = {
    val words = split(text, " ")
    val pairArr = when(size(words) >= 2,
      transform(sequence(lit(1), size(words) - 1),
        i => struct(element_at(words, i).as("w1"),
          element_at(words, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val train = df.where(trainFilter)
    val uni = train.select(explode(split(text, " ")).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c1"))
    val total = uni.agg(sum("_c1")).head.getLong(0)
    require(total > 0, "bigramSurprisal: empty training split")
    val totalBits = (63 - java.lang.Long.numberOfLeadingZeros(total)).toLong
    val big = train.select(explode(pairArr).as("_pr"))
      .select(col("_pr.w1").as("_w1"), col("_pr.w2").as("_w2"))
      .groupBy("_w1", "_w2").agg(count(lit(1)).as("_c2"))
    def bits(c: Column) = (length(bin(c)) - 1).cast("long")
    val first = df.select(col(id), element_at(words, 1).as("_w"),
        size(words).cast("long").as("n_toks"))
      .join(uni, Seq("_w"), "left")
      .select(col(id), col("n_toks"),
        (lit(totalBits) - bits(coalesce(col("_c1"), lit(1L)))).as("_b0"))
    val pairs = df.select(col(id), explode(pairArr).as("_pr"))
      .select(col(id), col("_pr.w1").as("_w1"), col("_pr.w2").as("_w2"))
      .join(big, Seq("_w1", "_w2"), "left")
      .join(uni.select(col("_w").as("_w1"), col("_c1").as("_c1prev")),
        Seq("_w1"), "left")
      .join(uni.select(col("_w").as("_w2"), col("_c1").as("_c1cur")),
        Seq("_w2"), "left")
      .select(col(id),
        when(col("_c2").isNotNull, bits(col("_c1prev")) - bits(col("_c2")))
          .otherwise(lit(1L + totalBits) - bits(coalesce(col("_c1cur"), lit(1L))))
          .as("_b"))
      .groupBy(col(id)).agg(sum("_b").as("_bp"))
    first.join(pairs, Seq(id), "left")
      .select(col(id), col("n_toks"),
        (col("_b0") + coalesce(col("_bp"), lit(0L))).as("sum_bits"))
      .withColumn("avg_centibits", expr("sum_bits * 100 div n_toks"))
  }

  /** Incremental (cross-corpus) exact dedup — the production ingest shape:
    * drop every incoming document whose dedup key already exists in the
    * BASE corpus, and collapse duplicates within the batch itself
    * (first-wins by id). Equals "rebuild exact dedup over base ∪ batch,
    * keep only batch-side survivors" without ever re-scanning base
    * beyond its key projection.
    *
    * Scale: the batch side shuffles once on the key (the in-batch
    * first-wins window); the base-key side goes through
    * [[Skew.bloomAntiJoin]] — base keys at 100 TB don't broadcast, and a
    * plain anti-join would shuffle the full base key set against the
    * batch; the bloom pass lets every definitely-new document (the
    * overwhelming majority at steady state) bypass the join with zero
    * exchange, and only the might-contain sliver replays the exact
    * anti-join (bloom false positives removed there; result identical to
    * the plain anti-join — Skew's spec enforces it).
    */
  def dedupIncremental(incoming: DataFrame, base: DataFrame, id: String,
                       key: Column, estBaseKeys: Long): DataFrame = {
    val inc = incoming.withColumn("_k", key)
    val firstWins = inc
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_k")).orderBy(col(id).asc)))
      .where(col("_rn") === 1).drop("_rn")
    val baseKeys = base.select(key.as("_k")).distinct()
    Skew.bloomAntiJoin(firstWins, baseKeys, "_k", estBaseKeys).drop("_k")
  }

  /** Naive-Bayes domain discriminator in WHOLE-BIT integer arithmetic —
    * the learned quality-filter tier (the GPT-3 / CCNet shape: train a
    * classifier to tell curated sources from the raw crawl, keep raw
    * docs that look curated). Multinomial NB trains in closed form —
    * just token counts per class, so the distributed "training" is one
    * map-side-combined aggregation — and scores as a log-likelihood
    * ratio, here truncated to whole bits so every quantity is an exact
    * integer both engines reproduce:
    *   llr(w) = (bits(cP(w)+1) − bits(NP)) − (bits(cN(w)+1) − bits(NN))
    * with bits(x) = ⌊log2 x⌋ = length(bin(x)) − 1 and plus-one smoothing
    * (unseen words fall to bits(1) = 0). Doc score = Σ llr over tokens;
    * keep = score ≥ 0. A float log-sum would drift by ulps cross-engine —
    * the whole-bit discipline of [[unigramSurprisal]].
    *
    * Counts train on `trainFilter` docs only (hash split — score-time
    * docs the model never saw genuinely exercise smoothing); class
    * membership is `posFilter`. Scale: two count aggregations + two
    * vocabulary joins keyed on token text — the model IS the two count
    * tables, broadcastable at any corpus size since they're
    * vocabulary-sized.
    */
  def nbDomainScore(df: DataFrame, id: String, text: Column,
                    posFilter: Column, trainFilter: Column): DataFrame = {
    val bits: Column => Column = c => (length(bin(c)) - 1).cast("long")
    val train = df.where(trainFilter)
    def classCounts(cls: Column): (DataFrame, Long) = {
      val c = train.where(cls).select(explode(split(text, " ")).as("_w"))
        .groupBy("_w").agg(count(lit(1)).as("_c"))
      val n = c.agg(coalesce(sum("_c"), lit(0L))).head.getLong(0)
      (c, n)
    }
    val (posC, np) = classCounts(posFilter)
    val (negC, nn) = classCounts(!posFilter)
    require(np > 0 && nn > 0, s"nbDomainScore: empty class (np=$np nn=$nn)")
    val npBits = 63 - java.lang.Long.numberOfLeadingZeros(np)
    val nnBits = 63 - java.lang.Long.numberOfLeadingZeros(nn)
    df.select(col(id), explode(split(text, " ")).as("_w"))
      .join(posC.withColumnRenamed("_c", "_cp"), Seq("_w"), "left")
      .join(negC.withColumnRenamed("_c", "_cn"), Seq("_w"), "left")
      .select(col(id),
        ((bits(coalesce(col("_cp"), lit(0L)) + 1) - lit(npBits.toLong)) -
         (bits(coalesce(col("_cn"), lit(0L)) + 1) - lit(nnBits.toLong))).as("_llr"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_toks"), sum("_llr").as("score_bits"))
      .withColumn("nb_keep", (col("score_bits") >= 0).cast("int"))
  }

  // ---------------------------------------------------------------------------
  // BPE tokenizer training (Sennrich et al. 2016, "Neural Machine Translation
  // of Rare Words with Subword Units")
  // ---------------------------------------------------------------------------

  /** Separator for BPE word states. Words are restricted to [a-z]+, so a
    * control character can never collide with token content.
    */
  val BpeSep = "\u0001"

  /** A word as a BPE state string: every token PREFIX-marked with the
    * separator (`·h·e·l·l·o`). The prefix (not infix) form is load-bearing:
    * applying a merge (a,b) is then the plain left-to-right non-overlapping
    * `replace(state, ·a·b, ·ab)`, whose scan-forward semantics IS greedy
    * BPE ("aaaa" + (a,a) → aa|aa, not aa|a|a — an infix-separator pattern
    * would consume the shared delimiter and miss the second merge; verified
    * identical in Spark's UTF8String.replace and DuckDB's replace).
    */
  def bpeState(word: Column): Column =
    regexp_replace(word, "(.)", BpeSep + "$1")

  /** Lowercased [a-z]+ words of the corpus — the normalization both
    * engines share before any BPE step (non-ASCII tokens would make
    * lexicographic tie-breaks collation-dependent cross-engine).
    */
  def bpeWords(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(lower(text), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))

  /** Distributed BPE training: `nMerges` rounds of (count adjacent token
    * pairs weighted by word frequency → argmax → merge everywhere).
    * Returns the ranked merge table (left, right, pair frequency).
    *
    * Scale shape: the ONE corpus-sized operation is the initial word
    * count (map-side combined); every round after that touches only the
    * VOCABULARY table — pair explode + sum is O(vocab · word-length) and
    * map-side combinable, the argmax reaches the driver as a single row
    * (the bounded-scalar discipline), and the merge application is one
    * `replace` projection with `localCheckpoint` flattening the
    * 24-round lineage (the connectedComponents iteration pattern; use
    * reliable checkpoint on a real cluster). Nothing re-reads raw text
    * after round 0.
    *
    * Determinism: argmax ties break on (count DESC, left ASC, right ASC)
    * — pure ASCII lexicographic, identical in both engines — and there
    * is deliberately NO frequency floor or early stop (a data-dependent
    * round count could not be replayed by a statically unrolled oracle).
    * The DuckDB oracle replays the ENTIRE training loop as nMerges
    * unrolled MATERIALIZED CTE levels whose replace patterns are scalar
    * subqueries on the previous level's argmax.
    */
  def bpeTrain(df: DataFrame, text: Column, nMerges: Int): Seq[(String, String, Long)] = {
    var vocab = bpeWords(df, text)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(bpeState(col("w")).as("state"), col("cnt"))
      .localCheckpoint(false) // lazy: round 1's argmax collect materializes
    val merges = Seq.newBuilder[(String, String, Long)]
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      val best = vocab
        .withColumn("toks", split(col("state"), BpeSep))
        .where(size(col("toks")) >= 3)
        .select(col("cnt"), explode(expr(
          "transform(sequence(2, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((a, b, c))
        vocab = vocab
          .withColumn("state", replace(col("state"),
            lit(BpeSep + a + BpeSep + b), lit(BpeSep + a + b)))
          .localCheckpoint(false) // next round's collect materializes
      }
    }
    merges.result()
  }

  /** Apply a trained merge list to a word-state column: the `replace`
    * cascade, one codegen'd projection (nMerges nested calls, constant
    * depth). Token count of the final state = its separator count.
    */
  def bpeApplyMerges(state: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(state) { case (s, (a, b)) =>
      replace(s, lit(BpeSep + a + BpeSep + b), lit(BpeSep + a + b))
    }

  /** Tokens in a BPE state = separators in it (each token is
    * prefix-marked exactly once).
    */
  def bpeTokenCount(state: Column): Column =
    (length(state) - length(replace(state, lit(BpeSep), lit("")))).cast("long")

  /** Chi-squared (token, class) association — the classic supervised
    * feature-selection statistic (Yang & Pedersen 1997; the step that
    * picks discriminative vocabulary for the §2.83 Naive-Bayes domain
    * filter instead of hand-pinning its term list). One-vs-rest on
    * DOCUMENT-level presence: for token w and class s, the 2×2 table is
    * a = docs of s containing w, b = other docs containing w, c = docs of
    * s without w, d = the rest; χ² = n(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Cross-engine exactness: the statistic is computed as a PINNED chain
    * of integer operations — delta² floor-divided by the token margins
    * first, then scaled by n·10⁶ and divided by the class margins —
    * identical floors on both engines (ranking statistics tolerate the
    * floors; what matters is both engines cut the same top-k). Degenerate
    * margins (df = n: a token in every document) are filtered — their χ²
    * is undefined and the token carries no signal. Magnitudes: delta² ≤
    * (df·(n−df))², and the two leading divisions bring the operand under
    * df·(n−df) ≤ n²/4 before the n·10⁶ scale — BIGINT-safe through
    * n ~ 10⁵ corpora; at web scale swap the scale step for a pre-division
    * (the floors stay deterministic either way).
    *
    * Scale shape: presence counts are one explode → (token, class)
    * map-side-combined aggregate; token margins are a token-keyed rollup
    * of THOSE cells (vocabulary-sized, never corpus-sized); class margins
    * are a class-cardinality dim (broadcast). Returns every (token, class)
    * cell with its scaled statistic; callers top-k via sort+limit
    * (TakeOrderedAndProject — the keywordRank discipline).
    */
  def chi2TokenClass(df: DataFrame, id: String, text: Column,
                     classCol: String): DataFrame = {
    val n = df.count() // driver scalar (corpus size), precedented
    require(n > 0, "chi2TokenClass: empty corpus")
    val pres = df.select(col(classCol).as("_cls"), col(id),
        explode(array_distinct(split(text, " "))).as("token"))
      .where(col("token") =!= "")
    val cells = pres.groupBy(col("token"), col("_cls"))
      .agg(count(lit(1)).as("df_in"))
    val tokMargin = cells.groupBy(col("token")).agg(sum(col("df_in")).as("df"))
    val clsMargin = df.groupBy(col(classCol).as("_cls"))
      .agg(count(lit(1)).as("ns"))
    cells
      .join(tokMargin, "token")
      .join(broadcast(clsMargin), "_cls")
      .where(col("df") < n) // degenerate margin: in every doc
      .withColumn("_delta",
        col("df_in") * (lit(n) - col("df") - col("ns") + col("df_in"))
          - (col("df") - col("df_in")) * (col("ns") - col("df_in")))
      .withColumn("chi2_micro",
        expr(s"((((_delta * _delta) div df) div (${n}L - df)) * ${n}L * 1000000L)" +
          s" div ns div (${n}L - ns)"))
      .select(col("token"), col("_cls").as(classCol), col("df_in"), col("df"),
        col("ns"), col("chi2_micro"))
  }

  /** Doc-partitioned inverted-index posting blocks — the Lucene/ES routing
    * shape (each shard owns a doc-id range; every term's postings shard
    * WITH the documents): posting lists are split into fixed-width doc-id
    * blocks (`block = doc_id div blockDocs`), and each (term, block) row
    * carries the block's posting stats — count, min/max doc (the
    * skip-pointer pair that lets boolean retrieval seek past
    * non-overlapping blocks), an id sum and a mixed XOR checksum (both
    * order-independent integer folds, so the whole index is
    * hash-comparable across engines without materializing a single sorted
    * list).
    *
    * Scale shape: ONE explode → ONE (term, block) aggregate with map-side
    * combine — no windows, no per-term sort. The block key is what kills
    * the two classic index-build hazards at 100 TB: a stopword's 10⁹-doc
    * posting list lands on ONE reducer if keyed by term alone, but splits
    * across n/blockDocs keys here; and block-local postings mean boolean
    * AND/OR retrieval is a co-partitioned per-block merge join (term A's
    * block k joins term B's block k — both live in the same doc-id range),
    * never a corpus-wide posting intersection. Delta-encoding note: the
    * within-block gap sum telescopes to max−min, so (n_docs, min, max)
    * already bounds the encoded block size a compressed index would write.
    */
  def postingsIndex(df: DataFrame, id: String, text: Column,
                    blockDocs: Long): DataFrame = {
    require(blockDocs >= 1)
    df.select(col(id).as("_doc"),
        explode(array_distinct(split(text, " "))).as("term"))
      .where(col("term") =!= "")
      .withColumn("block", expr(s"_doc div ${blockDocs}L"))
      .groupBy(col("term"), col("block"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("_doc")).as("min_doc"),
        max(col("_doc")).as("max_doc"),
        sum(col("_doc")).as("idsum"),
        // Knuth-multiplier mix before the XOR so near-sequential ids
        // don't cancel structurally (the §2.62 hllMix lesson, cheap form)
        expr("bit_xor(_doc * 2654435761L)").as("xsum"))
  }

  /** Posting LISTS for a bounded term set — the materialized-index
    * complement of [[postingsIndex]]'s stats rows: per (term, doc-block),
    * the sorted doc-id list itself, bounded by the block width (≤
    * blockDocs ids per cell, whatever the term's corpus frequency — the
    * same skew argument as the stats form). The term filter is pushed
    * below the aggregate so an n-term query reads n posting shards, not
    * the corpus vocabulary.
    */
  def postingsLists(df: DataFrame, id: String, text: Column,
                    blockDocs: Long, terms: Seq[String]): DataFrame = {
    require(blockDocs >= 1 && terms.nonEmpty)
    df.select(col(id).as("_doc"),
        explode(array_distinct(split(text, " "))).as("term"))
      .where(col("term").isin(terms: _*))
      .withColumn("block", expr(s"_doc div ${blockDocs}L"))
      .groupBy(col("term"), col("block"))
      .agg(sort_array(collect_list(col("_doc"))).as("ids"))
  }

  /** Positional phrase retrieval — exact consecutive-token phrase matches
    * answered from POSITIONAL postings (the §2.91 index family extended
    * with token offsets, the Lucene phrase-query shape). One posexplode
    * over the corpus with the phrase-term filter pushed below everything
    * (a k-term phrase reads k posting shards, not the vocabulary), then
    * slot i of the phrase normalizes its positions by −i so adjacency
    * becomes EQUALITY on (block, doc, start_pos): each later slot is a
    * left-semi join co-partitioned with the doc-id block layout — a
    * stopword inside the phrase can't serialize onto one reducer, and
    * every join in the chain reuses one (block, doc, pos) exchange
    * family. Per-position matches collapse to one row per matching doc
    * with the occurrence count and first token offset.
    *
    * Positions are unique per (doc, pos) — each offset holds exactly one
    * term — so the semi-join chain counts every distinct start position
    * exactly once (no fan-out duplication at any phrase length).
    */
  def phraseMatches(df: DataFrame, id: String, text: Column,
                    blockDocs: Long, phrase: Seq[String]): DataFrame = {
    require(blockDocs >= 1 && phrase.nonEmpty)
    val toks = df
      .select(col(id).as("doc_id"),
        posexplode(split(text, " ")).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
      .withColumn("block", expr(s"doc_id div ${blockDocs}L"))
      .select(col("block"), col("doc_id"), col("pos").cast("long").as("pos"),
        col("term"))
    val starts = phrase.zipWithIndex.tail.foldLeft(
      toks.where(col("term") === phrase.head).select("block", "doc_id", "pos")) {
      case (acc, (t, i)) =>
        acc.join(
          toks.where(col("term") === t)
            .select(col("block"), col("doc_id"), (col("pos") - i).as("pos")),
          Seq("block", "doc_id", "pos"), "left_semi")
    }
    starts.groupBy(col("block"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
  }

  /** Incremental posting-index maintenance: merge per-batch
    * [[postingsIndex]] outputs into the index of their union. Every cell
    * stat is ABELIAN — count and id-sum add, min/max meet, the mixed XOR
    * checksum xors — so merge(rebuild(A), rebuild(B)) == rebuild(A ∪ B)
    * exactly (spec-asserted), which is what makes index upkeep at ingest
    * DELTA-sized: each new commit contributes its own posting cells and
    * one (term, block)-keyed merge, the 100 TB corpus is never re-indexed
    * (the §2.77 incremental-refresh / §2.86b streaming-MV semilattice
    * discipline applied to the index). Requires doc-DISJOINT parts — the
    * append-only ingest invariant (a re-ingested doc would double-count);
    * the §2.61 bloom anti-join is the standing guard for that upstream.
    */
  def mergePostings(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty)
    parts.reduce(_ unionByName _)
      .groupBy(col("term"), col("block"))
      .agg(sum(col("n_docs")).as("n_docs"),
        min(col("min_doc")).as("min_doc"),
        max(col("max_doc")).as("max_doc"),
        sum(col("idsum")).as("idsum"),
        expr("bit_xor(xsum)").as("xsum"))
  }
}
