package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine as the exact baseline,
  * random-hyperplane LSH as the 100 TB scale path.
  *
  * Vectors are `array<float>` columns; all arithmetic is done in double via
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double,
    * sequential order (matches a straightforward loop in any engine).
    * Backed by the native codegen expression (graft.plans.DotProductFloat);
    * `dotHof` is the built-ins-only equivalent kept for cross-checking.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.DotProductFloat(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** Higher-order-function dot product — same semantics as `dot`, ~10x
    * slower (intermediate array + boxed lambda per element). Spec suite
    * asserts bit-equality with the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** All pairs with cosine >= threshold — embedding near-dup detection.
    * Quadratic by construction (the exactness baseline); norms are
    * precomputed once per side so the join does one dot product per pair.
    * For corpus-scale dedup use `lshBuckets` to generate candidates first.
    */
  /** Rows under which the build side of the self-join is broadcast; above
    * it we fall back to a repartitioned cartesian (degrades gracefully past
    * the 8 GB broadcast/driver limit instead of failing outright).
    * ~1M rows x (64 floats + id + norm) ≈ 300 MB, comfortably under limits.
    */
  val BroadcastRowCap = 1000000L

  def cosineDupPairs(df: DataFrame, id: String, vec: String,
                     threshold: Double, roundTo: Int): DataFrame = {
    val withNorm = df.select(col(id), col(vec)).withColumn("_norm", l2norm(col(vec)))
    // The self nested-loop join streams ONE side; an embedding table small
    // enough to broadcast often arrives as a single parquet split, which
    // would serialize the O(n²) dot products onto one task. Spread the
    // streamed side across the cluster first (linear shuffle, quadratic win).
    // Broadcast the build side only while it fits (count is metadata-only on
    // parquet); past the cap an explicit broadcast would abort the query, so
    // degrade to a repartitioned cartesian instead.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val a = withNorm.toDF("id_a", "vec_a", "norm_a").repartition(par)
    val b0 = withNorm.toDF("id_b", "vec_b", "norm_b")
    val b = if (df.count() <= BroadcastRowCap) broadcast(b0) else b0
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")), roundTo))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** LSH-bucketed embedding near-dup — the corpus-scale path next to the
    * exact-quadratic `cosineDupPairs`: candidates are pairs colliding in
    * ANY of `nTables` hyperplane tables (shuffle keyed on the bucket, so
    * bucket sizes — not corpus size — bound the pairwise work), then exact
    * cosine verification applies the threshold. Output is a high-recall
    * SUBSET of the exact operator's pairs (recall measured in the spec
    * suite; 1-(1-p^planes)^tables per pair).
    *
    * Recall trade, stated honestly: with planes scaling as log2(n/bucket),
    * per-pair recall 1-(1-p^k)^L DECAYS with corpus size at fixed L when p
    * (per-plane collision prob, 1 - angle/pi) is close to the random-pair
    * 0.5 — e.g. threshold 0.4 pairs (p≈0.65) drop from 0.92 recall at 500
    * vectors to ~0.13 at 20k. The operator's sweet spot is the actual dedup
    * use case — high thresholds (cos >= 0.9, p >= 0.85) where p^k shrinks
    * slowly and 12 tables hold recall >= 0.9 well past 10^6 vectors. For
    * exhaustive low-threshold pair mining use `cosineDupPairs` (exact) or
    * grow `nTables` with the corpus (work scales linearly in tables).
    *
    * Two scale rules learned the hard way (r3 shipped the opposite and the
    * "scale path" ran 130x slower than the quadratic it replaces):
    *  - The candidate join carries ONLY (id, bucket) — never the vectors.
    *    Collision rows are ~16 bytes; a wide row (two 64-float vectors) in
    *    the bucket shuffle multiplied the shuffle bytes ~30x.
    *  - Plane count must grow with the corpus (`autoPlanes`): fixed planes
    *    mean bucket population n/2^k grows linearly and the in-bucket
    *    self-join is Θ(n²) with a worse constant than brute force.
    *
    * Vectors re-attach to candidates by id: broadcast joins while the
    * corpus fits (`BroadcastRowCap`), with cosine verified per collision
    * row and pair-dedup applied to the tiny post-threshold set. Past the
    * cap, candidates dedup on ids FIRST (narrow shuffle) and the vector
    * attach is a shuffle join keyed on id.
    */
  def cosineDupPairsLsh(df: DataFrame, id: String, vec: String,
                        threshold: Double, roundTo: Int,
                        nPlanes: Int, nTables: Int, dim: Int,
                        corpusN: Long = -1L): DataFrame = {
    // No pre-repartition: the linear sketch pass parallelizes across input
    // splits on its own, and the quadratic (pairwise) work runs AFTER the
    // bucket-keyed shuffle, which spreads it regardless of scan layout —
    // unlike cosineDupPairs, whose nested-loop join never shuffles.
    val buckets = multiTableBuckets(
        df.select(col(id).as("_id"), col(vec).as("_v")), "_v", nPlanes, nTables, dim)
      .select(col("_id"), col("bucket")) // vectors pruned from the shuffle
    val collisions = buckets.toDF("id_a", "bucket")
      .join(buckets.toDF("id_b", "bucket"), Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val withNorm = df.select(col(id), col(vec)).withColumn("_norm", l2norm(col(vec)))
    // caller usually knows the count (it sized the planes); only fall back
    // to a count job (metadata-only on parquet) when it didn't pass one
    val small = (if (corpusN >= 0) corpusN else df.count()) <= BroadcastRowCap
    val vecA = withNorm.toDF("id_a", "vec_a", "norm_a")
    val vecB = withNorm.toDF("id_b", "vec_b", "norm_b")
    // broadcast path: verify per collision row (map-side attach), dedup the
    // few survivors; shuffle path: dedup the narrow id pairs first so the
    // vector join processes each candidate once
    val cand = if (small) collisions else collisions.dropDuplicates("id_a", "id_b")
    val verified = cand
      .join(if (small) broadcast(vecA) else vecA, Seq("id_a"))
      .join(if (small) broadcast(vecB) else vecB, Seq("id_b"))
      .withColumn("cos",
        round(dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")), roundTo))
      .where(col("cos") >= threshold)
    (if (small) verified.dropDuplicates("id_a", "id_b") else verified)
      .select("id_a", "id_b", "cos")
  }

  /** Cell count for BLOCKED PAIR MINING — the linear-candidates regime:
    * cells scale with the corpus at a bounded `targetBucket` vectors per
    * cell, so with a FIXED probe count the candidate volume is
    * nProbe·targetBucket per vector — O(n) total, the property the
    * pair-mining scale probe measures. (Contrast `autoCells`' √n rule,
    * which balances a per-QUERY search's scan-vs-rank cost and makes
    * blocked pair volume n^1.5.) Flat-model assignment is nCells·dim per
    * row: past `DriverCellCap` the distributed trainer takes over, and
    * past ~10^5 cells the two-level quantizer (`ivfTrainTwoLevel` /
    * `ivfAssign2`) is the documented next step, exactly as in the ANN
    * family.
    */
  def pairCells(corpusN: Long, targetBucket: Long = 44L,
                minCells: Int = 8, maxCells: Int = 65536): Int =
    math.min(maxCells.toLong,
      math.max(minCells.toLong, (corpusN + targetBucket - 1) / targetBucket)).toInt

  /** Cell-blocked cosine pair mining with EXACT verification — the
    * scale-path replacement for `cosineDupPairs`' all-pairs join (the r9
    * verdict's one quadratic-only lane): candidates are (query, posting)
    * meetings in the query's `nProbe` nearest quantizer cells — a pair
    * survives when EITHER side probes the other's primary cell — then the
    * rounded exact cosine applies the threshold, so output ⊆ the exact
    * operator's pairs with recall set by probe depth (measured ≥ 0.9 at
    * sf0.1 in the spec suite; deeper probing buys recall linearly in
    * candidate volume).
    *
    * Scale shape (the `cosineDupPairsLsh` discipline, quantizer cells as
    * the blocker): the candidate join carries ONLY (id, cell) — never
    * vectors; probes and postings meet in a cell-keyed shuffle join
    * (AQE skew-splits hot cells); candidates dedup on the normalized
    * (id_a, id_b) BEFORE vectors re-attach (broadcast under
    * `BroadcastRowCap`, id-keyed shuffle join past it). With `pairCells`
    * sizing (cells ∝ n, bounded cell population) and fixed `nProbe`,
    * candidate volume is O(n·nProbe·targetBucket) — LINEAR in the corpus,
    * demonstrated by the XlangScaleProbe replication lane. The honest
    * recall trade, stated like the LSH twin's: at a FIXED weak threshold
    * (pairs near-orthogonal, e.g. 0.3 in 64-d) the probe depth needed for
    * a given recall grows as cells refine — low-margin exhaustive mining
    * has no sublinear path; the operator's sweet spot is the actual
    * mining use case, high-margin pairs (translations / near-dups at
    * cos ≥ 0.7), where a small fixed probe set holds recall.
    */
  /** CORPUS-SIDE probe rows (q_id, q_vec, cell) — every vector's `nProbe`
    * nearest cells via the native [[org.apache.spark.sql.graft.IvfTopCellsExpr]]
    * + one explode: O(n·nProbe) rows, zero joins, zero exchanges. The
    * relational [[probeCellPlan]] (vector × centers join + rank window) is
    * the bit-equality twin, kept for broadcast-small ANN query batches and
    * the spec suite — corpus-side it materializes n·nCells rows through an
    * exchange, which under `pairCells` sizing (cells ∝ n) is QUADRATIC
    * (the r11 Explain audit's catch) and n^1.5 for the self-kNN join.
    * Probe order matches `row_number() OVER (ORDER BY dist, cell)` exactly
    * (per-step first-strict-minimum), so oracle replays are unaffected.
    */
  def probeCellsNative(df: DataFrame, id: String, vec: String,
                       model: Seq[(Int, Seq[Float])], nProbe: Int): DataFrame = {
    require(model.zipWithIndex.forall { case ((c, _), i) => c == i },
      "probeCellsNative: model cell ids must be positional 0..n-1")
    df.select(col(id).as("q_id"), col(vec).as("q_vec"),
        explode(org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.IvfTopCellsExpr(
            org.apache.spark.sql.graft.ColumnShim.expression(col(vec)),
            model.flatMap(_._2), model.length, model.head._2.length,
            nProbe))).as("cell"))
  }

  /** The blocked-mining CANDIDATE pairs — (id_a < id_b) meetings of a
    * probe with a primary-cell posting, deduplicated, NO verification.
    * Exposed separately so the scale probe can measure candidate volume
    * (the quantity that must stay linear) independently of the cosine
    * verify.
    */
  def pairCandidates(df: DataFrame, id: String, vec: String,
                     model: Seq[(Int, Seq[Float])], nProbe: Int): DataFrame = {
    val postings = ivfAssign(
        df.select(col(id).as("_nid"), col(vec).as("_nv")), "_nv", model)
      .select(col("_nid").as("n_id"), col("cell"))
    // probe set includes the primary cell (element 0 IS the argmin), so
    // same-cell pairs are always candidates; native per-row selection —
    // no n·nCells relational intermediate (see probeCellsNative)
    val probes = probeCellsNative(df, id, vec, model, nProbe)
      .select("q_id", "cell")
    probes.join(postings, Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .select(least(col("q_id"), col("n_id")).as("id_a"),
        greatest(col("q_id"), col("n_id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  def cosineDupPairsIvf(df: DataFrame, id: String, vec: String,
                        threshold: Double, roundTo: Int,
                        model: Seq[(Int, Seq[Float])], nProbe: Int,
                        corpusN: Long = -1L): DataFrame = {
    val cand = pairCandidates(df, id, vec, model, nProbe)
    val withNorm = df.select(col(id), col(vec)).withColumn("_norm", l2norm(col(vec)))
    val small = (if (corpusN >= 0) corpusN else df.count()) <= BroadcastRowCap
    val vecA = withNorm.toDF("id_a", "vec_a", "norm_a")
    val vecB = withNorm.toDF("id_b", "vec_b", "norm_b")
    cand
      .join(if (small) broadcast(vecA) else vecA, Seq("id_a"))
      .join(if (small) broadcast(vecB) else vecB, Seq("id_b"))
      .withColumn("cos",
        round(dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")), roundTo))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup — semantic dedup via quantizer cells (the Abbas et al. 2023
    * arXiv:2303.09540 shape): cluster the corpus with the IVF coarse
    * quantizer, then within each cell flag every document whose ROUNDED
    * cosine to a LOWER-id cell-mate reaches `threshold`. The keep rule is
    * the repo's pairwise convention (drop the higher id of every near-dup
    * pair — deterministic, engine-independent; NOT a transitive closure:
    * a doc survives iff no lower-id cell-mate is similar to it). Returns
    * one row per DROPPED doc: (id, cell, n_dups, keeper_id = lowest
    * similar cell-mate). Like all cell-blocked methods this trades recall
    * at cell boundaries for never comparing across cells — the candidate
    * generator family is the same as `cosineDupPairsLsh`, with the
    * quantizer instead of hyperplanes as the blocker.
    *
    * Scale shape: assignment is the native one-pass argmin (zero corpus
    * exchanges before the pair join); pair work is bucketed by cell, so
    * CELL sizes — not the corpus — bound the quadratic term (√n cells →
    * ~n^1.5 worst case, ~linear for balanced cells; grow `nCells` with the
    * corpus exactly as the ANN path does via `autoCells`). Dup-heavy
    * corpora collapse exact duplicates FIRST (DupSkewProbe: identical
    * vectors land in one cell and re-quadratize any blocker).
    */
  def semDedup(corpus: DataFrame, id: String, vec: String, threshold: Double,
               roundTo: Int, model: Seq[(Int, Seq[Float])]): DataFrame = {
    val assigned = ivfAssign(
        corpus.select(col(id).as("_id"), col(vec).as("_v")), "_v", model)
      .withColumn("_norm", l2norm(col("_v")))
    val a = assigned.select(col("_id").as("_id_a"), col("_v").as("_va"),
      col("_norm").as("_na"), col("cell"))
    val b = assigned.select(col("_id").as("_id_b"), col("_v").as("_vb"),
      col("_norm").as("_nb"), col("cell"))
    a.join(b, Seq("cell"))
      .where(col("_id_b") < col("_id_a"))
      .withColumn("_cos",
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), roundTo))
      .where(col("_cos") >= threshold)
      .groupBy(col("_id_a").as(id), col("cell"))
      .agg(count(lit(1)).as("n_dups"), min("_id_b").as("keeper_id"))
  }

  /** Exact top-k neighbors for a (small, broadcast) query set against the
    * full corpus: one pass over the corpus per plan, rank window per query.
    */
  def knnBrute(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
               k: Int, roundTo: Int): DataFrame = {
    // spread the streamed (corpus) side — see cosineDupPairs
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(id).as("n_id"), col(vec).as("n_vec"))
      .withColumn("n_norm", l2norm(col("n_vec")))
      .repartition(par)
    val q = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("q_norm", l2norm(col("q_vec")))
    // rank on the ROUNDED cosine (ties then broken by n_id): the raw values
    // differ across engines by ulps (DuckDB's list_cosine_similarity
    // evaluates sqrt(aa*bb), this side sqrt(aa)*sqrt(bb)), so a raw-value
    // rank could flip two ~equal candidates; the rounded value is the one
    // number both engines provably share
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("_cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Hard-negative mining: top-k per query INSIDE a cosine band
    * `[lo, hi)` — the contrastive-training data op ("the most similar
    * candidates that are NOT near-duplicates/positives"): hi excludes the
    * dup/positive zone, lo floors away easy negatives, and the rank runs
    * only over band survivors. Same cross-engine discipline as
    * [[knnBrute]]: the band test and the rank key are both the ROUNDED
    * cosine (raw values differ across engines by ulps; the literal
    * thresholds parse to identical doubles on both sides — the semDedup
    * precedent), ties → n_id.
    *
    * Scale shape: identical to knnBrute (band filter is a scan-stage
    * predicate before the per-query rank); the IVF composition path —
    * probe cells, band-filter in-cell, rerank — inherits it unchanged
    * because the band test is per-candidate.
    */
  def knnBand(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, roundTo: Int, lo: Double, hi: Double): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(id).as("n_id"), col(vec).as("n_vec"))
      .withColumn("n_norm", l2norm(col("n_vec")))
      .repartition(par)
    val q = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("q_norm", l2norm(col("q_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("_cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), roundTo))
      .where(col("_cos") >= lo && col("_cos") < hi)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Per-dimension (min, scale) scalar-quantization (SQ8) model: corpus
    * min/max per coordinate. min/max are EXACTLY order-independent (no
    * float-fold discipline needed — unlike means), so the distributed
    * aggregation is deterministic for free; the driver sees `dim` rows
    * (the precedented bounded model collect). Returned as doubles
    * (float→double is exact) ready to export as oracle literals.
    */
  def sq8Train(corpus: DataFrame, vec: String, dim: Int): Seq[(Double, Double)] = {
    val rows = corpus
      .select(posexplode(col(vec)).as(Seq("_d", "_x")))
      .groupBy(col("_d"))
      .agg(min(col("_x")).as("_mn"), max(col("_x")).as("_mx"))
      .collect().map(r => (r.getInt(0), r.getFloat(1).toDouble,
        r.getFloat(2).toDouble))
      .sortBy(_._1)
    require(rows.length == dim, s"sq8Train: expected $dim dims, got ${rows.length}")
    rows.map { case (_, mn, mx) => (mn, mx - mn) }.toSeq
  }

  /** SQ8 encode: per coordinate, `code = clamp(floor((v − min)·255/scale),
    * 0, 255)` — sub, mul, div, floor, all IEEE-double ops in a fixed order,
    * so both engines produce the identical INTEGER code (the model
    * literals are the same doubles on both sides); from there on no float
    * touches the index. Codes pack 8 per BIGINT (dim/8 longs — 8 B where
    * the raw vector needs 32 B of float32: the 4× scan-compression that
    * keeps a brute pass I/O-bound viable, and composable with IVF cell
    * pruning for the 100 TB path). Zero-range dims encode 0.
    */
  def sq8Encode(vecCol: Column, model: Seq[(Double, Double)]): Column = {
    val dim = model.length
    require(dim % 8 == 0, s"sq8Encode: dim $dim must be a multiple of 8")
    array((0 until dim / 8).map { g =>
      (0 until 8).map { j =>
        val i = g * 8 + j
        val (mn, rng) = model(i)
        val code =
          if (rng > 0)
            least(lit(255L), greatest(lit(0L),
              floor((element_at(vecCol, i + 1).cast("double") - lit(mn))
                * lit(255.0) / lit(rng)).cast("long")))
          else lit(0L)
        // shiftleft wraps two's-complement (the top byte lands in the sign
        // bits) — a `code * 2^56` multiply would trip the ANSI overflow
        // check; disjoint byte lanes combine with OR
        shiftleft(code, 8 * j)
      }.reduce(_ bitwiseOR _)
    }: _*)
  }

  /** Integer dot product of two packed SQ8 code arrays: unpack via
    * shift/mask, multiply, sum — pure BIGINT arithmetic (≤ 255²·dim, far
    * inside both engines' exact range), so candidate ranking has NO
    * cross-engine float surface at all.
    */
  def sq8Dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (0 until 8).map { j =>
          shiftright(x, 8 * j).bitwiseAND(lit(255L)) *
            shiftright(y, 8 * j).bitwiseAND(lit(255L))
        }.reduce(_ + _)),
      lit(0L), (acc, v) => acc + v)

  /** SQ8 ANN: quantize the corpus to a packed-byte index (4× smaller than
    * float32), rank candidates by the INTEGER code dot product, then
    * exact-rerank the top k·rerankFactor shortlist against the raw
    * vectors on the rounded cosine (the knnIvfPq discipline: approximate
    * tier picks the shortlist, exact tier orders it; the shortlist fetch
    * is id point-lookups). The approximate tier is exactly reproducible
    * cross-engine by construction — integer scores, ties → n_id — so the
    * oracle replays shortlist membership bit-for-bit.
    *
    * Scale shape: this is the compressed BRUTE lane (one corpus pass per
    * query batch, like [[knnBrute]] but reading 8 B/vector instead of
    * 260 B) — at 100 TB it composes with IVF: [[sq8Encode]] the residual
    * inside each cell and probe as usual; the quantization layer is
    * orthogonal to the pruning layer.
    */
  def knnSq8(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
             k: Int, dim: Int, roundTo: Int,
             rerankFactor: Int = 64): DataFrame = {
    val model = sq8Train(corpus, vec, dim)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val cEnc = corpus
      .select(col(id).as("n_id"), sq8Encode(col(vec), model).as("n_codes"))
      .repartition(par) // spread the streamed side (cosineDupPairs pattern)
    val qEnc = queries
      .select(col(id).as("q_id"), sq8Encode(col(vec), model).as("q_codes"))
    val wApprox = Window.partitionBy("q_id")
      .orderBy(col("_idot").desc, col("n_id").asc)
    val shortlist = broadcast(qEnc).join(cEnc, col("q_id") =!= col("n_id"))
      .withColumn("_idot", sq8Dot(col("q_codes"), col("n_codes")))
      .withColumn("_rn", row_number().over(wApprox))
      .where(col("_rn") <= k * rerankFactor)
      .select(col("q_id"), col("n_id"))
    // exact rerank: id point-lookups into the raw vector table
    val cRaw = corpus.select(col(id).as("n_id"), col(vec).as("n_vec"))
      .withColumn("n_norm", l2norm(col("n_vec")))
    val qRaw = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("q_norm", l2norm(col("q_vec")))
    val wExact = Window.partitionBy("q_id")
      .orderBy(col("_cos").desc, col("n_id").asc)
    shortlist.join(cRaw, "n_id").join(broadcast(qRaw), "q_id")
      .withColumn("_cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")),
          roundTo))
      .withColumn("rk", row_number().over(wExact))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Deterministic random-hyperplane LSH signature (Charikar): `nPlanes`
    * pseudo-random hyperplanes derived from sin() of (plane, dim) — fully
    * reproducible across runs and engines, no RNG state. Returns the input
    * plus an integer `bucket` (the sign pattern).
    *
    * Scale path: near-dup candidates and ANN probes join on `bucket`, so
    * the shuffle key is the bucket — bucket sizes, not corpus size, bound
    * the pairwise work. Recall is tuned by `nPlanes` (fewer planes → bigger
    * buckets → higher recall, more work).
    */
  /** Integer components of hyperplane (table, plane): uniform in
    * [-1000, 1000] from a seeded java.util.Random per plane. Independent
    * seeds per plane matter (an earlier sin-of-linear-index scheme produced
    * phase-shifted copies of one wave — correlated planes collapsed pair
    * recall to ~0.4 where independent planes give ~0.9); uniform-cube
    * directions are as good as Gaussian for sign-LSH at dim 64 (recall
    * measured in the spec suite). INTEGER components are load-bearing for
    * the oracle: they are exactly representable as FLOAT (Spark literal)
    * and DOUBLE (SQL literal), so a DuckDB oracle embedding these constants
    * reproduces every projection — and therefore every bucket and candidate
    * pair — bit-identically (the sequential-double dot contract of
    * `DotProductFloat`). Exposed so oracle SQL generators embed the SAME
    * values, like `Text.minhashPermConsts`.
    */
  def lshPlaneConsts(table: Int, plane: Int, dim: Int): Array[Int] = {
    val rng = new scala.util.Random(table.toLong * 104729L + plane.toLong * 7919L + 29L)
    Array.fill(dim)(rng.nextInt(2001) - 1000)
  }

  /** Sign-pattern bucket key for one hash table: `nPlanes` deterministic
    * hyperplanes (`lshPlaneConsts`). Projections use the native dot
    * expression; plane literals constant-fold into the plan. `nPlanes` must
    * stay below 32 so the per-plane bits never collide with the
    * `table << 32` tag that disambiguates tables in `multiTableBuckets`.
    */
  private def tableBucket(vec: Column, nPlanes: Int, dim: Int, table: Int): Column = {
    require(nPlanes >= 1 && nPlanes < 32, s"nPlanes must be in [1, 31], got $nPlanes")
    (0 until nPlanes).map { p =>
      val plane = array(lshPlaneConsts(table, p, dim).map(c => lit(c.toFloat)).toSeq: _*)
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b)) + lit(table.toLong << 32)
  }

  def hyperplaneBucket(df: DataFrame, vec: String, nPlanes: Int, dim: Int,
                       table: Int = 0): DataFrame =
    df.withColumn("bucket", tableBucket(col(vec), nPlanes, dim, table))

  /** Bucket keys across `nTables` independent hash tables — the standard
    * multi-table LSH construction: a pair is a candidate if it collides in
    * ANY table, so recall is 1-(1-p^k)^L while per-bucket work stays
    * bounded. ONE native expression computes all nTables x nPlanes
    * projections per row (tight codegen loop over a reference-object plane
    * matrix — the Column form below bloated the plan to thousands of
    * literal nodes and re-optimization dominated the sketch), then explodes
    * to one row per (row, table) with a table-disambiguated bucket key.
    */
  def multiTableBuckets(df: DataFrame, vec: String, nPlanes: Int, nTables: Int,
                        dim: Int): DataFrame = {
    val planes: Seq[Float] = for {
      t <- 0 until nTables; p <- 0 until nPlanes
      c <- lshPlaneConsts(t, p, dim)
    } yield c.toFloat
    df.withColumn("bucket", explode(
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.LshBucketsExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col(vec)),
          planes, nPlanes, nTables, dim))))
  }

  /** Built-ins-only multi-table buckets — cross-check twin of
    * `multiTableBuckets`; the spec suite asserts bit-equality.
    */
  def multiTableBucketsHof(df: DataFrame, vec: String, nPlanes: Int, nTables: Int,
                           dim: Int): DataFrame =
    df.withColumn("bucket", explode(array(
      (0 until nTables).map(t => tableBucket(col(vec), nPlanes, dim, t)): _*)))

  /** Plane count for a target mean bucket size: ceil(log2(N / target)),
    * floored at `minPlanes`. With FIXED planes, bucket population — and the
    * exact-ranking work per query — grows LINEARLY with the corpus (4
    * planes over 50k vectors ≈ 3k candidates per table per query: half of
    * brute force across 8 tables). Scaling planes logarithmically keeps
    * per-query candidate work roughly constant; the recall cost of sharper
    * buckets is the standard LSH trade, compensated by the multi-table
    * union (recall 1-(1-p^k)^L) and measured in the spec suite.
    */
  def autoPlanes(corpusN: Long, targetBucket: Long = 256L, minPlanes: Int = 4): Int =
    // upper clamp 31: bits above 31 would collide with the `table << 32`
    // tag in tableBucket (31 planes already means 2^31 buckets — ample)
    math.min(31, math.max(minPlanes, math.ceil(
      math.log(math.max(1.0, corpusN.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** IVF cell count: √n balances the two per-query cost terms (centroid
    * scan ∝ nCells, in-cell ranking ∝ nProbe·n/nCells), the classic IVF
    * sizing rule. No driver-bound clamp: past `DriverCellCap` cells,
    * `knnIvf` switches to the distributed trainer, so √n holds to 1e9+
    * vectors (maxCells 65536 covers √1e9 ≈ 31.6k with slack; past THAT a
    * two-level quantizer is the standard next step).
    */
  def autoCells(corpusN: Long, minCells: Int = 8, maxCells: Int = 65536): Int =
    math.min(maxCells,
      math.max(minCells, math.round(math.sqrt(corpusN.toDouble)).toInt))

  /** Cells above which `knnIvf` trains the coarse quantizer DISTRIBUTED
    * (`ivfCentroidsDistributed`) instead of on the driver: driver Lloyd's
    * costs sample(=64·cells)·cells·dim per iteration, so 512 cells ≈ 1e9
    * mults/iteration is the driver's comfortable ceiling.
    */
  val DriverCellCap = 512

  /** IVF (inverted-file) ANN: a k-means coarse quantizer (deterministic
    * seed) partitions the corpus into cells; queries probe their `nProbe`
    * nearest cells and rank exactly inside them. The classic
    * coarse-quantizer trade: one small model broadcast everywhere, shuffle
    * keyed on cell id, per-cell work bounded by cell size. Recall vs brute
    * force is measured in the spec suite.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
             k: Int, nCells: Int, nProbe: Int, roundTo: Int): DataFrame =
    knnIvfSearch(corpus, queries, id, vec, k, nProbe, roundTo,
      ivfTrainDispatch(corpus, vec, nCells))

  /** Trainer dispatch — THE branch point every IVF entry (and every oracle
    * generator that retrains to export literals) must share: under
    * `DriverCellCap` the quantizer trains on the driver (one bounded
    * collect, zero extra distributed jobs); past it — √n wants more cells
    * than driver Lloyd's can afford — training runs distributed
    * (per-iteration Spark jobs over a bounded sample, the driver only ever
    * holds the nCells x dim model). Both branches are bit-reproducible
    * run-to-run, which is what lets generated oracles retrain the SAME
    * model.
    */
  def ivfTrainDispatch(corpus: DataFrame, vec: String, nCells: Int,
                       corpusN: Long = -1L): Seq[(Int, Seq[Float])] =
    if (nCells <= DriverCellCap) ivfTrainDriver(corpus, vec, nCells, corpusN)
    else ivfCentroidsDistributed(corpus, vec, nCells, corpusN = corpusN)

  /** Driver-side Lloyd's over a bounded deterministic sample — the coarse
    * quantizer for cell counts a single machine handles (`DriverCellCap`).
    * DETERMINISTIC for a fixed corpus + session layout (seeded sample, fixed
    * iterations, stable empty-cell rule), which is what lets an oracle
    * generator train the SAME model and embed the resulting centers as SQL
    * literals (QueriesText.oKnnIvfGen). Returns (cell, center) pairs;
    * centers quantized to float, matching the search side's float vectors.
    */
  def ivfTrainDriver(corpus: DataFrame, vec: String, nCells: Int,
                     knownN: Long = -1L): Seq[(Int, Seq[Float])] = {
    // At corpus scale the quantizer is always trained on a sample (training
    // on 100 TB would dwarf the search); the cap bounds driver memory (~1 MB).
    val sampleN = math.max(nCells * 64, 4096)
    // Seeded RANDOM sample, not limit(): a head-of-table prefix correlates
    // with whatever the parquet is sorted/clustered by, which can train the
    // quantizer on one region of the space and collapse recall. The count is
    // metadata-only on parquet; sample(fraction, seed) is deterministic for
    // a fixed input, and the 1.2 slack keeps the expected draw >= sampleN.
    // Callers that already counted (the memoized table stat) pass knownN —
    // sample fraction is a function of n alone, so the model is unchanged.
    val corpusN = if (knownN >= 0) knownN else corpus.count()
    require(corpusN > 0, "knnIvf: empty corpus")
    val frac = math.min(1.0, sampleN * 1.2 / corpusN)
    val pts: Array[Array[Double]] = corpus.select(col(vec))
      .sample(withReplacement = false, frac, seed = 42).limit(sampleN)
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(pts.nonEmpty, "knnIvf: sample returned no vectors")
    lloydLocal(pts, nCells, 10).toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq.map(_.toFloat)) }
  }

  /** Plain-array Lloyd's iterations (deterministic: evenly-strided init over
    * the given point order, fixed iterations, stable empty-cell rule) —
    * shared by the driver trainer and the per-coarse-cell fine trainer.
    */
  private[operators] def lloydLocal(pts: Array[Array[Double]], nCells: Int,
                                    iters: Int): Array[Array[Double]] = {
    val dim = pts.head.length
    var centers = Array.tabulate(nCells)(i => pts((i.toLong * pts.length / nCells).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      for (p <- pts) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nCells) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = p(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(nCells)(c =>
        if (counts(c) == 0) centers(c) // keep an empty cell's center stable
        else sums(c).map(_ / counts(c)))
    }
    centers
  }

  /** Distributed Lloyd's iterations — the documented path past `autoCells`'
    * 512-cell driver-trainer ceiling. Every per-point operation is a Spark
    * job (assignment: broadcast centers + min_by; update: per-dimension
    * mean); the driver only ever holds the nCells x dim model between
    * iterations, never the points. Cost per iteration: one shuffle of one
    * row per training point (min_by partials aggregate map-side) plus one
    * nCells x dim shuffle for the centroid update — so training is sized by
    * the sample cap, the standard IVF trade (quantizer quality saturates far
    * below full-corpus training; the full corpus is only ever ASSIGNED,
    * once, in the search).
    *
    * `sampleRows` <= 0 means auto: 64·nCells training points (the same
    * per-cell budget as the driver trainer) — the scale-safe default, so a
    * caller who just wants more cells never accidentally trains a
    * points-x-centers join over the full corpus.
    */
  def ivfCentroidsDistributed(corpus: DataFrame, vec: String, nCells: Int,
                              iters: Int = 5,
                              sampleRows: Long = -1L,
                              corpusN: Long = -1L): Seq[(Int, Seq[Float])] = {
    val spark = corpus.sparkSession
    val targetRows = if (sampleRows > 0) sampleRows else math.max(64L * nCells, 4096L)
    // metadata-only on parquet; callers that already counted pass it in
    val nRows = if (corpusN >= 0) corpusN else corpus.count()
    require(nRows > 0, "ivfCentroidsDistributed: empty corpus")
    val frac = math.min(1.0, targetRows * 1.2 / nRows)
    // stable sample across iterations: checkpoint once
    val pts = (if (frac < 1.0)
        corpus.sample(withReplacement = false, frac, seed = 42)
      else corpus)
      .select(col(vec).as("_v"))
      .localCheckpoint()
    // init: nCells hash-spread rows (deterministic, order-independent) —
    // the one nCells-sized collect; every later iteration collects the same
    // bounded model, never points. DISTINCT vectors: duplicate rows (or the
    // same vector reached via hash ties) would seed identical centers, and
    // the loser cell then captures zero points forever — the empty-cell
    // guard would preserve the stale duplicate, silently shrinking the
    // effective cell count.
    var centers: Seq[(Int, Seq[Float])] = pts
      .select("_v").dropDuplicates("_v")
      .withColumn("_h", hash(col("_v")))
      // the vector itself breaks 32-bit hash ties (arrays sort
      // lexicographically): at 64*65536-row samples a few thousand hash
      // collisions are expected, and without a total order the selected
      // seed set — and with it the whole trained model — would be
      // partition-dependent
      .orderBy(col("_h"), col("_v")).limit(nCells)
      .select("_v").collect()
      .map(_.getSeq[Float](0)).zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    // fewer distinct vectors than requested cells: the model silently has
    // fewer centers than nCells, which changes every downstream geometry
    // (block math, probe sizing) — make the degradation visible
    if (centers.length < nCells)
      System.err.println(s"graft: ivfCentroidsDistributed seeded only " +
        s"${centers.length} of $nCells cells (distinct sample vectors short) " +
        s"— effective cell count is ${centers.length}")
    for (_ <- 0 until iters) {
      // assignment is the native one-pass argmin (IvfArgminExpr): one row
      // per training point, no points x centers join to materialize, no
      // re-aggregate — each iteration is one scan of the checkpointed
      // sample plus the tiny per-dimension mean shuffle below.
      // The per-dimension mean is a SORTED sequential double fold, not
      // avg(): a plain double sum's merge order follows shuffle-block
      // arrival, so avg() can differ by ulps across executions — and the
      // oracle generators retrain this model and embed it as SQL literals,
      // so the trainer must be bit-reproducible run-to-run, not just
      // input-deterministic
      val updated = ivfAssign(pts, "_v", centers)
        .select(col("cell"), posexplode(col("_v")))
        .groupBy("cell", "pos")
        .agg((aggregate(array_sort(collect_list(col("col").cast("double"))),
          lit(0.0), (acc, x) => acc + x) / count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("center"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toMap
      // cells that captured no points keep their previous center stable
      centers = centers.map { case (i, c) => (i, updated.getOrElse(i, c)) }
    }
    centers
  }

  /** Native one-pass cell assignment: adds `cell` = argmin over the model's
    * centers of ||v-c||² (see IvfArgminExpr for the cross-engine arithmetic
    * contract). Model cell ids must be positional 0..n-1 — both trainers
    * produce that.
    */
  def ivfAssign(df: DataFrame, vec: String,
                model: Seq[(Int, Seq[Float])]): DataFrame = {
    require(model.zipWithIndex.forall { case ((c, _), i) => c == i },
      "ivfAssign: model cell ids must be positional 0..n-1")
    df.withColumn("cell", org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.IvfArgminExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(vec)),
        model.flatMap(_._2), model.length, model.head._2.length)))
  }

  /** Relational twin of `ivfAssign` — centers broadcast-joined against
    * every row, struct-min argmin with (dist, cell) tie order, ||v||²/||c||²
    * hoisted to their own sides. Kept for the spec suite's bit-equality
    * battery; `ivfAssign` replaces it in the hot path because this form
    * materializes n·nCells rows for a per-row loop.
    */
  def ivfAssignHof(df: DataFrame, id: String, vec: String,
                   model: Seq[(Int, Seq[Float])]): DataFrame = {
    val centersCc = broadcast(
      df.sparkSession.createDataFrame(model).toDF("cell", "center")
        .withColumn("_cc", dot(col("center"), col("center"))))
    df.select(col(id), col(vec))
      .withColumn("_vv", dot(col(vec), col(vec)))
      .join(centersCc)
      .withColumn("_d",
        col("_vv") - lit(2.0) * dot(col(vec), col("center")) + col("_cc"))
      .groupBy(id)
      .agg(first(col(vec)).as(vec),
        min(struct(col("_d"), col("cell"))).getField("cell").as("cell"))
  }

  /** TWO-LEVEL coarse quantizer — the shape past the flat trainer's
    * practical ceiling (assignment over a flat model costs nCells·dim per
    * row; at √(10^9+) cells that dominates everything). Trains `nCoarse`
    * top-level cells with the distributed trainer, then `nFine` sub-cells
    * per coarse cell over the coarse cell's own sample rows (bounded
    * per-cell Lloyd's inside `mapGroups` — per-group imperative training is
    * the one legitimate spot: each group is a bounded sample, and nCoarse
    * relational Lloyd's jobs per iteration would swamp the scheduler).
    * Returns (coarse model, FLAT fine model) with fine cell ids
    * `coarse*nFine + fine`, 0..nCoarse·nFine-1 — the flat model plugs into
    * `knnIvfSearchIndexed` unchanged; only ASSIGNMENT goes hierarchical
    * (`ivfAssign2`: (nCoarse+nFine)·dim per row instead of
    * nCoarse·nFine·dim).
    *
    * A coarse cell with no sample rows keeps copies of its coarse center
    * as its fine centers (stable, like the flat trainers' empty-cell rule).
    */
  def ivfTrainTwoLevel(corpus: DataFrame, vec: String, nCoarse: Int, nFine: Int,
                       iters: Int = 5, corpusN: Long = -1L)
      : (Seq[(Int, Seq[Float])], Seq[(Int, Seq[Float])]) = {
    import corpus.sparkSession.implicits._
    // one count serves both samplers — on a derived (non-parquet) corpus a
    // count is a full plan execution, not metadata
    val n = if (corpusN >= 0) corpusN else corpus.count()
    val coarse = ivfCentroidsDistributed(corpus, vec, nCoarse, iters, corpusN = n)
    // a degenerate corpus (fewer distinct vectors than nCoarse) seeds fewer
    // coarse centers; all block math below derives from the ACTUAL count so
    // the pad loop can't index a missing cell
    val nCoarseEff = coarse.length
    // fine-training sample: the usual 64-per-cell budget across ALL fine
    // cells, drawn once and routed to its coarse cell by the native argmin
    val targetRows = math.max(64L * nCoarseEff.toLong * nFine, 4096L)
    val frac = math.min(1.0, targetRows * 1.2 / n)
    val sampled = (if (frac < 1.0)
        corpus.sample(withReplacement = false, frac, seed = 43)
      else corpus).select(col(vec).as("_v"))
    val perCell = 64 * nFine
    val fineTrained: Map[Int, Seq[Seq[Float]]] =
      ivfAssign(sampled, "_v", coarse)
        .select(col("cell"), col("_v"))
        .as[(Int, Seq[Float])]
        .groupByKey(_._1)
        .mapGroups { (cell, rows) =>
          // BOUNDED deterministic selection: a max-heap of the perCell
          // smallest rows by (murmur-of-vector, vector) — shuffle order is
          // not deterministic, and buffering/sorting the whole group would
          // put a skewed coarse cell's entire slice of the sample in one
          // task's memory (the group is bounded only in aggregate)
          implicit val vecOrd: Ordering[Seq[Float]] =
            math.Ordering.Implicits.seqOrdering
          val heap = scala.collection.mutable.PriorityQueue
            .empty[(Int, Seq[Float])] // max-heap: largest key on top
          for ((_, v) <- rows) {
            val key = (util.hashing.MurmurHash3.seqHash(v), v)
            if (heap.size < perCell) heap.enqueue(key)
            else if (Ordering[(Int, Seq[Float])].lt(key, heap.head)) {
              heap.dequeue(); heap.enqueue(key)
            }
          }
          val selected: Seq[(Int, Seq[Float])] = heap.dequeueAll
          val pts = selected.reverse // ascending key order
            .map(_._2.toArray.map(_.toDouble)).toArray
          val centers = lloydLocal(pts, math.min(nFine, pts.length), iters)
          (cell, centers.map(_.toSeq.map(_.toFloat)).toSeq)
        }
        .collect().map { case (c, ctrs) => c -> ctrs }.toMap
    val coarseByCell = coarse.toMap
    val fineFlat: Seq[(Int, Seq[Float])] = (0 until nCoarseEff).flatMap { c =>
      val trained = fineTrained.getOrElse(c, Seq.empty)
      // pad short/missing cells with the coarse center (ties resolve to the
      // lowest fine id, so duplicates are dead sub-cells — assignment can
      // never land past the first of an identical-center run)
      val ctrs = trained ++ Seq.fill(nFine - trained.length)(coarseByCell(c))
      ctrs.zipWithIndex.map { case (v, f) => (c * nFine + f, v) }
    }
    (coarse, fineFlat)
  }

  /** Drop DEAD duplicate cells from a model before probe ranking: within
    * each coarse block, only the first of an identical-center run can ever
    * win assignment (the argmin tie rule), yet each duplicate would consume
    * one of the query's nProbe slots at the same distance — a coarse cell
    * padded to nFine could silently burn most of the probe budget on
    * provably-empty cells. Search joins by cell VALUE, so a non-positional
    * model is fine there (only assignment needs positional ids).
    */
  def dedupeForSearch(fine: Seq[(Int, Seq[Float])],
                      nFine: Int): Seq[(Int, Seq[Float])] = {
    fine.groupBy(_._1 / nFine).toSeq.sortBy(_._1).flatMap { case (_, cells) =>
      val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
      cells.sortBy(_._1).filter { case (_, v) => seen.add(v) }
    }
  }

  /** Hierarchical two-stage cell assignment (adds `cell` = coarse·nFine +
    * fine) — see IvfArgmin2Expr for the per-row cost and the
    * hierarchical-greedy recall trade.
    */
  def ivfAssign2(df: DataFrame, vec: String,
                 coarse: Seq[(Int, Seq[Float])],
                 fine: Seq[(Int, Seq[Float])]): DataFrame = {
    require(coarse.zipWithIndex.forall { case ((c, _), i) => c == i } &&
      fine.zipWithIndex.forall { case ((c, _), i) => c == i },
      "ivfAssign2: model cell ids must be positional")
    require(fine.length % coarse.length == 0,
      s"ivfAssign2: fine cell count ${fine.length} must be a multiple of " +
        s"coarse count ${coarse.length} (uniform blocks)")
    val dim = coarse.head._2.length
    df.withColumn("cell", org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.IvfArgmin2Expr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(vec)),
        coarse.flatMap(_._2), fine.flatMap(_._2),
        coarse.length, fine.length / coarse.length, dim)))
  }

  /** Relational twin of `ivfAssign2` (two chained broadcast-join argmins,
    * same cc - 2·vc arithmetic) — the spec suite's bit-equality reference.
    */
  def ivfAssign2Hof(df: DataFrame, id: String, vec: String,
                    coarse: Seq[(Int, Seq[Float])],
                    fine: Seq[(Int, Seq[Float])]): DataFrame = {
    val spark = df.sparkSession
    require(fine.length % coarse.length == 0,
      s"ivfAssign2Hof: fine cell count ${fine.length} must be a multiple of " +
        s"coarse count ${coarse.length} (uniform blocks)")
    val nFine = fine.length / coarse.length
    def ccDf(m: Seq[(Int, Seq[Float])], cellAs: String) = broadcast(
      spark.createDataFrame(m).toDF(cellAs, "center")
        .withColumn("_cc", dot(col("center"), col("center"))))
    val co = df.select(col(id), col(vec))
      .join(ccDf(coarse, "c_cell"))
      .withColumn("_d", col("_cc") - lit(2.0) * dot(col(vec), col("center")))
      .groupBy(id)
      .agg(first(col(vec)).as(vec),
        min(struct(col("_d"), col("c_cell"))).getField("c_cell").as("c_cell"))
    co.join(ccDf(fine, "f_cell"),
        col("f_cell") >= col("c_cell") * nFine &&
        col("f_cell") < (col("c_cell") + 1) * nFine)
      .withColumn("_d", col("_cc") - lit(2.0) * dot(col(vec), col("center")))
      .groupBy(id)
      .agg(first(col(vec)).as(vec),
        min(struct(col("_d"), col("f_cell"))).getField("f_cell").as("cell"))
  }

  /** IVF ANN with the two-level quantizer: train hierarchical, assign the
    * corpus with the two-stage argmin, search the flat fine-cell index
    * (probe ranking over nCoarse·nFine centers is relational and the query
    * set is small by contract).
    */
  def knnIvfTwoLevel(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int, nCoarse: Int, nFine: Int,
                     nProbe: Int, roundTo: Int): DataFrame = {
    val (coarse, fine) = ivfTrainTwoLevel(corpus, vec, nCoarse, nFine)
    val indexed = ivfAssign2(
      corpus.select(col(id).as("n_id"), col(vec).as("n_vec")), "n_vec",
      coarse, fine)
    // probe ranking skips dead pad duplicates so nProbe buys nProbe
    // DISTINCT populated regions (see dedupeForSearch)
    knnIvfSearchIndexed(indexed, queries, id, vec, k, nProbe, roundTo,
      dedupeForSearch(fine, nFine))
  }

  /** Build the IVF index for a corpus: train (driver-side under
    * `DriverCellCap` cells, distributed past it) and assign every vector
    * its cell — returns the model plus the indexed corpus
    * (n_id, n_vec, cell). The assignment is the INDEX-BUILD cost
    * (n·cells distance evaluations): at corpus scale it is paid once and
    * the indexed table persisted (ideally partitioned by `cell`, so a
    * probe join prunes partitions); every later query batch runs
    * `knnIvfSearchIndexed` against it with no corpus-wide work.
    */
  def ivfIndex(corpus: DataFrame, id: String, vec: String,
               nCells: Int): (Seq[(Int, Seq[Float])], DataFrame) = {
    val model = ivfTrainDispatch(corpus, vec, nCells)
    (model, ivfAssign(
      corpus.select(col(id).as("n_id"), col(vec).as("n_vec")), "n_vec", model))
  }

  /** IVF search against a prebuilt (cell, center) model — `knnIvf` trains
    * driver-side or distributed and delegates here; any deterministic
    * positional model plugs in unchanged.
    */
  def knnIvfSearch(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
                   k: Int, nProbe: Int, roundTo: Int,
                   model: Seq[(Int, Seq[Float])]): DataFrame = {
    // Corpus side: the native argmin assigns every vector its cell in ONE
    // codegen pass — no n x cells join, no aggregate, zero exchanges for
    // the corpus before the probe join (the r4 relational form materialized
    // 164M rows at the 300k x 548 probe; this is a per-row loop).
    val c = ivfAssign(
      corpus.select(col(id).as("n_id"), col(vec).as("n_vec")), "n_vec", model)
    knnIvfSearchIndexed(c, queries, id, vec, k, nProbe, roundTo, model)
  }

  /** Search a PREBUILT index (`ivfIndex` output, or a persisted
    * (n_id, n_vec, cell) table): per batch, only the query set touches the
    * centers; the corpus contributes exactly its probed cells through the
    * broadcast hash join.
    */
  /** The probe sub-plan shared by every indexed search: per query, the
    * `nProbe` nearest cells, ranked relationally with the SAME fold
    * arithmetic the oracle replays (dist = vv - 2.0*vc + cc, ties by cell
    * asc — matching IvfArgminExpr's first-strict-minimum rule on the
    * corpus side). queries x cells is tiny by contract.
    */
  def probeCellPlan(queries: DataFrame, id: String, vec: String,
                            nProbe: Int,
                            model: Seq[(Int, Seq[Float])]): DataFrame = {
    val spark = queries.sparkSession
    val centersCc = broadcast(
      spark.createDataFrame(model).toDF("cell", "center")
        .withColumn("_cc", dot(col("center"), col("center"))))
    val w = Window.partitionBy("q_id").orderBy(col("_d").asc, col("cell").asc)
    queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("_vv", dot(col("q_vec"), col("q_vec")))
      .join(centersCc)
      .withColumn("_d",
        col("_vv") - lit(2.0) * dot(col("q_vec"), col("center")) + col("_cc"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= nProbe)
      .select("q_id", "q_vec", "cell")
  }

  def knnIvfSearchIndexed(indexed: DataFrame, queries: DataFrame,
                          id: String, vec: String,
                          k: Int, nProbe: Int, roundTo: Int,
                          model: Seq[(Int, Seq[Float])]): DataFrame = {
    val c = indexed
    val q = probeCellPlan(queries, id, vec, nProbe, model)
    // rounded-cosine rank — see knnBrute
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    // query probes broadcast (small by contract, like knnBrute's query set):
    // without the hint the planner SMJs on cell and the whole corpus pays
    // an exchange it otherwise never needs
    broadcast(q).join(c, Seq("cell")).where(col("q_id") =!= col("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Corpus-wide self-kNN through the IVF index — the ALL-vectors "ANN
    * join" (every vector gets its top-k neighbors; the shape semantic
    * dedup, near-dup mining and recommendation candidate generation all
    * run at production scale, where per-query search loops can't). Same
    * probe/rank arithmetic as [[knnIvfSearchIndexed]], with ONE plan
    * difference: the query side is the corpus itself, so the probe set is
    * NOT broadcast — probes and postings meet in a cell-keyed shuffle
    * hash join (both sides corpus-sized, n·nProbe candidate rows bounded
    * by cell population, AQE skew-splits hot cells). Assignment and probe
    * selection are each one pass over the corpus against the broadcast
    * centroid table.
    */
  def knnSelfIvf(corpus: DataFrame, id: String, vec: String,
                 k: Int, nProbe: Int, roundTo: Int,
                 nCells: Int): DataFrame = {
    val (model, indexed) = ivfIndex(corpus, id, vec, nCells)
    // corpus-side probe selection is the native per-row top-cells explode
    // (r11): the relational probe plan materialized n·nCells rows through
    // an exchange — n^1.5 under autoCells sizing — for what is a per-row
    // loop; see probeCellsNative
    val q = probeCellsNative(corpus, id, vec, model, nProbe)
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    q.join(indexed, Seq("cell")).where(col("q_id") =!= col("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Persist an IVF index CELL-PARTITIONED: postings as
    * `partitionBy(cell)` parquet (one directory per cell — the layout
    * that lets a probed search read ONLY its cells' files) and the
    * trained centers as a tiny side table. This is the production index
    * shape at 10^9+ vectors: assignment is paid once at build, and every
    * subsequent search batch's scan is pruned to nProbe·|batch| cell
    * directories out of `nCells`.
    */
  def writeIvfIndex(corpus: DataFrame, id: String, vec: String,
                    nCells: Int, path: String): Unit = {
    val (model, indexed) = ivfIndex(corpus, id, vec, nCells)
    indexed.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/postings")
    corpus.sparkSession.createDataFrame(model).toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
  }

  /** Search a PERSISTED index ([[writeIvfIndex]] layout) with STATIC
    * partition pruning: the probed cell set is computed first (bounded by
    * |queries|·nProbe — a driver-side scalar collect in the precedented
    * bounded-model class) and pushed as a partition filter, so the
    * postings scan reads only the probed cell directories
    * (`PartitionFilters: cell IN (...)` — spec-asserted). Results are
    * identical to the in-memory [[knnIvfSearchIndexed]] on the same
    * model/corpus.
    */
  /** The persisted quantizer model ([[writeIvfIndex]] layout) — a bounded
    * model-sized collect, sorted for positional stability.
    */
  def readIvfCenters(spark: org.apache.spark.sql.SparkSession,
                     path: String): Seq[(Int, Seq[Float])] =
    spark.read.parquet(s"$path/centers")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1).toSeq

  /** Append new vectors into a persisted index WITHOUT a rebuild: the
    * batch assigns against the STORED centers (the native one-pass
    * argmin) and its rows land in their cell directories via parquet
    * append — the standard serving trade (cells drift only at the next
    * rebuild; assignment stays consistent because the quantizer is
    * frozen). Called per micro-batch from `foreachBatch`, this is the
    * streaming ingest path for the production index: arrival order and
    * batch slicing can't change any row's cell, so a stored search sees
    * exactly the index a batch build over the union would produce.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame, id: String, vec: String): Unit = {
    val model = readIvfCenters(spark, path)
    ivfAssign(batch.select(col(id).as("n_id"), col(vec).as("n_vec")),
        "n_vec", model)
      .write.mode("append").partitionBy("cell").parquet(s"$path/postings")
  }

  def knnIvfSearchStored(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame,
                         id: String, vec: String,
                         k: Int, nProbe: Int, roundTo: Int): DataFrame = {
    val model = readIvfCenters(spark, path)
    val q = probeCellPlan(queries, id, vec, nProbe, model)
      .localCheckpoint(false) // probed twice: cell-set collect + the pair join
    val probed = q.select("cell").distinct().collect().map(_.getInt(0))
    val c = spark.read.parquet(s"$path/postings")
      .where(col("cell").isin(probed.map(Int.box): _*))
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    broadcast(q).join(c, Seq("cell")).where(col("q_id") =!= col("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** Train residual product-quantization codebooks against a coarse model
    * (Jégou et al.'s IVFADC, public literature): a bounded seeded sample is
    * cell-assigned by the native argmin, residuals v - c(cell) are split
    * into `m` subspaces of dim/m components, and each subspace trains its
    * own `ks`-entry codebook with local Lloyd's. DETERMINISTIC: the
    * collected sample is totally ordered by (murmur-of-vector, vector)
    * before training — collect order is partition-dependent, the trained
    * model must not be. Returns flat [m][ks][dsub] float codebooks
    * (PqEncodeExpr/PqAdcExpr's layout). Codebooks are GLOBAL over
    * residuals (the standard trade: per-cell codebooks would cost
    * nCells·m·ks·dsub — residuals are already centered, one family serves
    * all cells).
    */
  def pqTrain(corpus: DataFrame, vec: String, coarse: Seq[(Int, Seq[Float])],
              m: Int, ks: Int, iters: Int = 10,
              corpusN: Long = -1L): Seq[Float] = {
    val dim = coarse.head._2.length
    require(dim % m == 0, s"pqTrain: m=$m must divide dim=$dim")
    val dsub = dim / m
    val coarseArr = coarse.flatMap(_._2).toArray
    val targetRows = math.max(64L * ks, 4096L)
    val n = if (corpusN >= 0) corpusN else corpus.count()
    require(n > 0, "pqTrain: empty corpus")
    val frac = math.min(1.0, targetRows * 1.2 / n)
    val sampled = (if (frac < 1.0)
        corpus.sample(withReplacement = false, frac, seed = 44)
      else corpus).select(col(vec).as("_v"))
    implicit val vecOrd: Ordering[Seq[Float]] =
      math.Ordering.Implicits.seqOrdering
    val rows = ivfAssign(sampled, "_v", coarse)
      .select(col("cell"), col("_v")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy { case (_, v) => (util.hashing.MurmurHash3.seqHash(v), v) }
    val res: Array[Array[Double]] = rows.map { case (cell, v) =>
      Array.tabulate(dim)(i => v(i).toDouble - coarseArr(cell * dim + i))
    }
    (0 until m).flatMap { mm =>
      val sub = res.map(r =>
        java.util.Arrays.copyOfRange(r, mm * dsub, (mm + 1) * dsub))
      // ks fixed regardless of sample size: the byte layout is the
      // contract; a short sample just seeds duplicate centers, which decay
      // to dead codes (encode ties resolve to the lowest code)
      lloydLocal(sub, ks, iters).flatMap(_.map(_.toFloat))
    }
  }

  /** OPQ-style dimension permutation by greedy variance allocation (the
    * permutation special case of Ge et al. 2013's OPQ — their parametric
    * form runs eigenvalue allocation after PCA; a permutation captures the
    * subspace-BALANCE term without any float transform): per-dimension
    * variances from a bounded, deterministically-ordered sample (the
    * pqTrain discipline: seeded sample, collect, total order by
    * (murmur-of-vector, vector), sequential driver-side fold — model
    * output must not depend on partitioning), then dims sorted by
    * variance desc feed a greedy least-loaded-subspace packing (ties →
    * lowest index; each subspace capped at dim/m slots). Subspace groups
    * concatenate (each sorted ascending) into one permutation array.
    *
    * Because a permutation is orthonormal and applied by pure element
    * INDEXING, it costs zero float arithmetic, preserves all distances
    * exactly, and exports to the oracle as integer literals
    * (`list_select`) — no cross-engine float reproducibility surface at
    * all, unlike a dense rotation matrix whose per-coordinate fold order
    * would need replaying.
    */
  def opqPermutation(corpus: DataFrame, vec: String, m: Int,
                     corpusN: Long = -1L): Array[Int] = {
    val n = if (corpusN >= 0) corpusN else corpus.count()
    require(n > 0, "opqPermutation: empty corpus")
    val targetRows = 4096L
    val frac = math.min(1.0, targetRows * 1.2 / n)
    val sampled = (if (frac < 1.0)
        corpus.sample(withReplacement = false, frac, seed = 46)
      else corpus).select(col(vec).as("_v"))
    implicit val vecOrd: Ordering[Seq[Float]] =
      math.Ordering.Implicits.seqOrdering
    val rows = sampled.collect().map(_.getSeq[Float](0))
      .sortBy(v => (util.hashing.MurmurHash3.seqHash(v), v))
    val dim = rows.head.length
    require(dim % m == 0, s"opqPermutation: m=$m must divide dim=$dim")
    val dsub = dim / m
    val sum = new Array[Double](dim)
    val sum2 = new Array[Double](dim)
    rows.foreach { v =>
      var i = 0
      while (i < dim) {
        val x = v(i).toDouble; sum(i) += x; sum2(i) += x * x; i += 1
      }
    }
    val nn = rows.length.toDouble
    val varr = Array.tabulate(dim)(i =>
      sum2(i) / nn - (sum(i) / nn) * (sum(i) / nn))
    val order = (0 until dim).sortBy(i => (-varr(i), i))
    val load = new Array[Double](m)
    val cnt = new Array[Int](m)
    val groups = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    order.foreach { d =>
      val s = (0 until m).filter(cnt(_) < dsub)
        .minBy(s => (load(s), s))
      load(s) += varr(d); cnt(s) += 1; groups(s) += d
    }
    groups.flatMap(_.sorted).toArray
  }

  /** Apply a dimension permutation to a vector column by pure element
    * indexing (perm is 0-based; element_at is 1-based). Exact — no float
    * op touches any value.
    */
  def permuteVec(v: Column, perm: Array[Int]): Column =
    array(perm.map(p => element_at(v, p + 1)): _*)

  /** Add the packed PQ code word (`codes` BIGINT — one byte per subspace)
    * to a cell-assigned frame: the COMPRESSED index payload. At m=8 over
    * 64 floats the per-row vector payload drops 256 B → 8 B (32x), which
    * is what lets probed cells stay memory-resident at corpus scale.
    */
  def pqEncode(df: DataFrame, vec: String, cell: String,
               coarse: Seq[(Int, Seq[Float])], codebooks: Seq[Float],
               m: Int, ks: Int): DataFrame = {
    val dim = coarse.head._2.length
    df.withColumn("codes", org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.PqEncodeExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(vec)),
        org.apache.spark.sql.graft.ColumnShim.expression(col(cell)),
        coarse.flatMap(_._2), codebooks, coarse.length, m, ks, dim)))
  }

  /** IVF-PQ ANN (IVFADC-R): coarse-quantize + PQ-encode the corpus into a
    * compressed (n_id, cell, codes) index, probe nProbe cells per query,
    * rank in-cell candidates by ADC distance (native PqAdcExpr over the
    * packed codes — the corpus VECTOR never enters the probe join), then
    * exact-rerank the top k·rerankFactor shortlist against the raw vectors
    * (a bounded point-lookup join — the standard recall-restoring step).
    * Output shape matches knnIvf: (q_id, n_id, rk, cos).
    */
  def knnIvfPq(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
               k: Int, nCells: Int, nProbe: Int, m: Int, ks: Int,
               roundTo: Int, rerankFactor: Int = 64): DataFrame = {
    val coarseModel = ivfTrainDispatch(corpus, vec, nCells)
    val codebooks = pqTrain(corpus, vec, coarseModel, m, ks)
    val encoded = pqEncode(
        ivfAssign(corpus.select(col(id).as("n_id"), col(vec).as("n_vec")),
          "n_vec", coarseModel),
        "n_vec", "cell", coarseModel, codebooks, m, ks)
      .select("n_id", "cell", "codes") // the compressed index — no vectors
    knnIvfPqSearch(encoded, corpus, queries, id, vec, k, nProbe, m, ks,
      roundTo, coarseModel, codebooks, rerankFactor)
  }

  /** Search a PREBUILT compressed index (`pqEncode` output — (n_id, cell,
    * codes) — or its persisted form): probe selection, in-cell ADC
    * ranking, exact rerank of the shortlist against the raw vector table
    * (`raw` — only the shortlist's ids are fetched from it).
    *
    * `coarseModel` is the POSITIONAL center table the codes were encoded
    * against (PqAdcExpr indexes it by cell id); `probeModel` is the model
    * probe ranking runs over — defaults to the same, but the two-level
    * composition passes the pad-DEDUPED fine model there (probe slots
    * shouldn't burn on dead duplicate cells) while ADC keeps the full
    * positional table.
    */
  def knnIvfPqSearch(encoded: DataFrame, raw: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int, nProbe: Int,
                     m: Int, ks: Int, roundTo: Int,
                     coarseModel: Seq[(Int, Seq[Float])],
                     codebooks: Seq[Float],
                     rerankFactor: Int = 64,
                     probeModel: Seq[(Int, Seq[Float])] = null): DataFrame = {
    val spark = encoded.sparkSession
    val dim = coarseModel.head._2.length
    val probeM = Option(probeModel).getOrElse(coarseModel)
    // probe selection: same relational ranking as knnIvfSearchIndexed
    val centersCc = broadcast(
      spark.createDataFrame(probeM).toDF("cell", "center")
        .withColumn("_cc", dot(col("center"), col("center"))))
    val wp = Window.partitionBy("q_id").orderBy(col("_d").asc, col("cell").asc)
    val probes = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("_vv", dot(col("q_vec"), col("q_vec")))
      .join(centersCc)
      .withColumn("_d",
        col("_vv") - lit(2.0) * dot(col("q_vec"), col("center")) + col("_cc"))
      .withColumn("_rn", row_number().over(wp))
      .where(col("_rn") <= nProbe)
      .select("q_id", "q_vec", "cell")
    val wAdc = Window.partitionBy("q_id").orderBy(col("_ad").asc, col("n_id").asc)
    val shortlist = broadcast(probes).join(encoded, Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("_ad", org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.PqAdcExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col("q_vec")),
          org.apache.spark.sql.graft.ColumnShim.expression(col("cell")),
          org.apache.spark.sql.graft.ColumnShim.expression(col("codes")),
          coarseModel.flatMap(_._2), codebooks, coarseModel.length, m, ks, dim)))
      .withColumn("_rn", row_number().over(wAdc))
      .where(col("_rn") <= k * rerankFactor)
      .select("q_id", "q_vec", "n_id")
    // exact rerank of the shortlist — rounded-cosine rank keys, see knnBrute
    val cv = raw.select(col(id).as("n_id"), col(vec).as("n_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    broadcast(shortlist).join(cv, Seq("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** TABLE-based ADC search — the HIGH-dim form of `knnIvfPqSearch`
    * (PqAdcExpr's scaladoc names this as the standard next step): per
    * (query, probed cell) the m x ks distance table T[mm][j] =
    * ||qr_sub(mm) - codebook[mm][j]||² is built ONCE (m·ks·dsub work,
    * amortized over the cell's population) and every in-cell code then
    * costs m table LOOKUPS instead of m·dsub = dim multiplies — at
    * dim 1024 that is ~128x less per-row fp work. Implemented with
    * mapPartitions over the encoded index: the table is per-(query, cell)
    * state a per-row expression cannot hold — the one legitimately
    * imperative spot, taken deliberately. Tables build lazily per
    * partition on first touch of a cell (probes are broadcast-small by
    * the same contract as every ANN query set).
    *
    * NOT bit-identical to the expression path: the table pre-sums each
    * subspace before the cross-subspace add (different double grouping),
    * so this lane trades the oracle's bit-replay for throughput — final
    * ranks still agree through the exact rounded-cosine rerank, which is
    * what the spec asserts.
    */
  def knnIvfPqSearchTabulated(encoded: DataFrame, raw: DataFrame,
                              queries: DataFrame, id: String, vec: String,
                              k: Int, nProbe: Int, m: Int, ks: Int,
                              roundTo: Int,
                              coarseModel: Seq[(Int, Seq[Float])],
                              codebooks: Seq[Float],
                              rerankFactor: Int = 64,
                              probeModel: Seq[(Int, Seq[Float])] = null): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val dim = coarseModel.head._2.length
    val dsub = dim / m
    val probeM = Option(probeModel).getOrElse(coarseModel)
    val centersCc = broadcast(
      spark.createDataFrame(probeM).toDF("cell", "center")
        .withColumn("_cc", dot(col("center"), col("center"))))
    val wp = Window.partitionBy("q_id").orderBy(col("_d").asc, col("cell").asc)
    val qv = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
    // probe selection (relational, as knnIvfPqSearch) — then the tiny
    // (q_id, q_vec, cell) probe list ships to executors as a broadcast
    val probeRows: Array[(Long, Array[Float], Int)] = qv
      .withColumn("_vv", dot(col("q_vec"), col("q_vec")))
      .join(centersCc)
      .withColumn("_d",
        col("_vv") - lit(2.0) * dot(col("q_vec"), col("center")) + col("_cc"))
      .withColumn("_rn", row_number().over(wp))
      .where(col("_rn") <= nProbe)
      .select("q_id", "q_vec", "cell")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val probesB = spark.sparkContext.broadcast(probeRows)
    val coB = spark.sparkContext.broadcast(coarseModel.flatMap(_._2).toArray)
    val cbB = spark.sparkContext.broadcast(codebooks.toArray)
    val scored = encoded
      .select(col("n_id").cast("long"), col("cell").cast("int"),
        col("codes").cast("long"))
      .as[(Long, Int, Long)]
      .mapPartitions { rows =>
        val co = coB.value; val cb = cbB.value
        val byCell = probesB.value.groupBy(_._3)
        // (cell) -> array of (q_id, table[m*ks]); built on first touch
        val tables = scala.collection.mutable.HashMap
          .empty[Int, Array[(Long, Array[Double])]]
        def tablesFor(cell: Int): Array[(Long, Array[Double])] =
          tables.getOrElseUpdate(cell,
            byCell.getOrElse(cell, Array.empty).map { case (qid, q, _) =>
              val t = new Array[Double](m * ks)
              var mm = 0
              while (mm < m) {
                var j = 0
                while (j < ks) {
                  var s = 0.0
                  var d = 0
                  while (d < dsub) {
                    val i = mm * dsub + d
                    val x = (q(i).toDouble - co(cell * dim + i).toDouble) -
                      cb((mm * ks + j) * dsub + d).toDouble
                    s += x * x
                    d += 1
                  }
                  t(mm * ks + j) = s
                  j += 1
                }
                mm += 1
              }
              (qid, t)
            })
        rows.flatMap { case (nId, cell, codes) =>
          tablesFor(cell).iterator.collect {
            case (qid, t) if qid != nId =>
              var s = 0.0
              var mm = 0
              while (mm < m) {
                s += t(mm * ks + ((codes >>> (8 * mm)) & 0xFFL).toInt)
                mm += 1
              }
              (qid, nId, s)
          }
        }
      }
      .toDF("q_id", "n_id", "_ad")
    val wAdc = Window.partitionBy("q_id").orderBy(col("_ad").asc, col("n_id").asc)
    val shortlist = scored
      .withColumn("_rn", row_number().over(wAdc))
      .where(col("_rn") <= k * rerankFactor)
      .join(broadcast(qv), Seq("q_id"))
      .select("q_id", "q_vec", "n_id")
    val cv = raw.select(col(id).as("n_id"), col(vec).as("n_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    broadcast(shortlist).join(cv, Seq("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }

  /** TWO-LEVEL IVF + PQ (the IMI-family composition — Babenko & Lempitsky's
    * inverted multi-index crossed with IVFADC, public literature): the
    * hierarchical quantizer keeps per-row assignment at (nCoarse+nFine)·dim
    * while PQ keeps the in-cell payload at m bytes — together they are the
    * 10^9-vector shape on BOTH the compute and the memory axis. Residual
    * codebooks train against the FINE centers (flat argmin over the fine
    * model on the bounded sample — training-side only); the corpus encodes
    * via the hierarchical argmin + residual-vs-own-fine-center; probe
    * ranking runs over the pad-deduped fine model while ADC looks centers
    * up positionally in the full one.
    */
  def knnIvf2Pq(corpus: DataFrame, queries: DataFrame, id: String,
                vec: String, k: Int, nCoarse: Int, nFine: Int, nProbe: Int,
                m: Int, ks: Int, roundTo: Int,
                rerankFactor: Int = 64): DataFrame = {
    val (coarse, fine) = ivfTrainTwoLevel(corpus, vec, nCoarse, nFine)
    val codebooks = pqTrain(corpus, vec, fine, m, ks)
    val encoded = pqEncode(
        ivfAssign2(corpus.select(col(id).as("n_id"), col(vec).as("n_vec")),
          "n_vec", coarse, fine),
        "n_vec", "cell", fine, codebooks, m, ks)
      .select("n_id", "cell", "codes")
    knnIvfPqSearch(encoded, corpus, queries, id, vec, k, nProbe, m, ks,
      roundTo, fine, codebooks, rerankFactor,
      probeModel = dedupeForSearch(fine, fine.length / coarse.length))
  }

  /** ANN via multi-table LSH: exact cosine ranking within the union of the
    * query's buckets. Same output shape as knnBrute; recall measured in the
    * spec suite. Shuffle key is the bucket — corpus size never joins itself,
    * and (same scale rule as `cosineDupPairsLsh`) the bucket join carries
    * ONLY ids: candidates dedup as ~16-byte rows, then vectors re-attach by
    * id — the query set broadcasts (it is small by contract), the corpus
    * side broadcasts under `BroadcastRowCap` and shuffle-joins past it.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
             k: Int, nPlanes: Int, nTables: Int, dim: Int, roundTo: Int,
             corpusN: Long = -1L): DataFrame = {
    val c = multiTableBuckets(
        corpus.select(col(id).as("n_id"), col(vec).as("_v")), "_v",
        nPlanes, nTables, dim)
      .select(col("n_id"), col("bucket")) // vectors pruned from the shuffle
    val q = multiTableBuckets(
        queries.select(col(id).as("q_id"), col(vec).as("_v")), "_v",
        nPlanes, nTables, dim)
      .select(col("q_id"), col("bucket"))
    val cand = q.join(c, Seq("bucket")).where(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id") // collided in >= 1 table
    val qv = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
    val cv = corpus.select(col(id).as("n_id"), col(vec).as("n_vec"))
    val small = (if (corpusN >= 0) corpusN else corpus.count()) <= BroadcastRowCap
    // rounded-cosine rank — see knnBrute
    val w = Window.partitionBy("q_id").orderBy(col("_cos").desc, col("n_id").asc)
    cand
      .join(broadcast(qv), Seq("q_id"))
      .join(if (small) broadcast(cv) else cv, Seq("n_id"))
      .withColumn("_cos", round(cosine(col("q_vec"), col("n_vec")), roundTo))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("_cos").as("cos"))
  }
}
