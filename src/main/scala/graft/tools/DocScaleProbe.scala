package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Documents/embeddings scale probe: replicates the sf0.1 corpus `factor`x
  * with REP-DISJOINT vocabulary (every word gets a _rep suffix) so each
  * replica keeps its internal near-dup structure but replicas share no
  * shingles — true-pair output grows linearly, vocabulary grows by factor,
  * and the dedup operators' scaling behavior (bucket sizes, empty-segment
  * skew, LSH band balance) is exercised honestly. Embeddings replicate with
  * shifted ids (same vectors: ANN throughput scales with corpus size).
  * Usage: `sbt "runMain graft.tools.DocScaleProbe [factor] [skew]"`.
  *
  * `skew` additionally inflates 0.5% of documents with ~3000 UNIQUE filler
  * words each (unique per doc — no new cross-doc shingles), driving
  * lmax >> 4x median so `jaccardPairs`' length-class path engages: the
  * audit is that the giant class neither serializes (its segments hash-
  * spread over (part, seg) like everyone else's) nor drags the short tail
  * into its inflated match bound.
  */
object DocScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    // `skewfast` (r14, the r13 verdict's item 7): the giant-doc decoration
    // at 100x, but ONLY the O(len²)-fix lane class (the r12 native-array
    // rewrites: winnowing fingerprints, repetition stats, CDC chunking,
    // token counting as the linear control) — the full sweep's growth
    // curves are already recorded at 10x; this run answers one question,
    // "does the one-pass-native fix class stay linear when the corpus is
    // 10x bigger AND carries the same 0.5% ~39 KB giants".
    val skewFast = args.length > 1 && args(1) == "skewfast"
    val skew = skewFast || (args.length > 1 && args(1) == "skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("graft_docscale").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val nDocs = docs.count()
    val replicated = docs.crossJoin(spark.range(factor).toDF("rep"))
      .repartition(cpus.toInt * 2)
      .select(
        (col("doc_id") * factor + col("rep")).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("rep"))), " ").as("text"),
        col("lang"), col("source"),
        col("n_chars"))
    (if (!skew) replicated else replicated.withColumn("text",
      when(col("doc_id") % 200 === 0,
        concat(col("text"), lit(" "), array_join(
          transform(sequence(lit(1), lit(3000)),
            i => concat(lit("zfill"), col("doc_id"), lit("x"), i)), " ")))
        .otherwise(col("text"))))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // Embeddings replicate with a per-replica coordinate ROTATION (circular
    // shift by rep): a permutation preserves norms and within-replica inner
    // products exactly — each replica keeps the corpus's near-dup pair
    // structure, so true pairs grow linearly — while cross-replica cosines
    // decorrelate (shifted axes ≈ random direction), so the dup-pair output
    // doesn't blow up quadratically the way identical copies would.
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    embs.crossJoin(spark.range(factor).toDF("rep"))
      .repartition(cpus.toInt)
      .select((col("vec_id") * factor + col("rep")).as("vec_id"),
        expr("transform(sequence(0, 63), i -> embedding[int((i + rep) % 64)])")
          .cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"[docscale] replicated documents: $n rows (${factor}x), at $out")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[docscale] $name%-22s $sec%8.2f s   ${n / sec / 1e3}%8.1f K docs/s   ($rows output rows)")
    }

    val q = graft.Queries.queries

    if (skewFast) {
      time("q_doc_fingerprint") { q("q_doc_fingerprint")(spark, out).count() }
      time("q_text_repetition") { q("q_text_repetition")(spark, out).count() }
      time("q_dedup_cdc") { q("q_dedup_cdc")(spark, out).count() }
      time("q_substr_dedup") { q("q_substr_dedup")(spark, out).count() }
      time("q_token_count") { q("q_token_count")(spark, out).count() }
      // CDC stage decomposition: where does the remaining lane wall live?
      // (a) the native per-doc chunker alone (scan + explode, no
      // shuffle); (b) + the chunk-keyed first-occurrence window (the
      // genuine cross-doc exchange). The full-lane delta over (b) is the
      // doc-keyed reassembly rollup.
      val d = graft.Tables.documents(spark, out)
        .select(col("doc_id"), col("text").as("_t"))
      val chunksCol = org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.CdcChunksExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col("_t")),
          8, 32L, graft.operators.Text.PolyP))
      val exploded = d.select(col("doc_id"),
        posexplode(chunksCol).as(Seq("pos", "chunk")))
      time("cdc chunker only") { exploded.count() }
      time("cdc + dedup window") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("chunk"))
          .orderBy(col("doc_id").asc, col("pos").asc)
        exploded.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).count()
      }
      if (!sys.env.contains("GRAFT_KEEP_DIR"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      spark.stop()
      return
    }

    // `mm` mode (r15, the r14 verdict's item 3): the multimodal family —
    // the ONE operator family with no 100x evidence on record (10x:
    // 4.2–6.0 s). Payloads derive deterministically from the rep-suffixed
    // text, so replica binaries differ and phash band buckets / audio
    // landmark postings must spread (~linear candidates), like the text
    // tiers. The question is the per-(snippet, matched-track)
    // offset-coherence window in q_audio_match: if it goes super-linear,
    // bound it (top-k tracks per snippet, the reference's match-cap
    // shape, report/listmatches.go:27).
    if (args.length > 1 && args(1) == "mm") {
      time("q_multimodal_meta") { q("q_multimodal_meta")(spark, out).count() }
      time("q_mm_features") { q("q_mm_features")(spark, out).count() }
      time("q_mm_frames") { q("q_mm_frames")(spark, out).count() }
      time("q_phash_pairs") { q("q_phash_pairs")(spark, out).count() }
      time("q_audio_match") { q("q_audio_match")(spark, out).count() }
      if (!sys.env.contains("GRAFT_KEEP_DIR"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      spark.stop()
      return
    }

    // `build` mode (r15, the r14 verdict's item 7): the pair-index 1000x
    // (or max-feasible) spot-probe — ONLY the fresh PTJ build plus the
    // candidate-volume proxy (Σ df·(df−1)/2 over word shingles, the PTJ
    // prefilter's upper bound before length-class bounding), so the r13
    // 100x point (51x wall per 100x docs) gets a second decade.
    if (args.length > 1 && args(1) == "build") {
      val d = graft.Tables.documents(spark, out).select("doc_id", "text")
      val sh = d.select(explode(org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.WordShinglesExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(col("text")), 2)))
        .as("s"))
      val cand = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .agg(sum(expr("df * (df - 1) div 2"))).head.getLong(0)
      println(s"[docscale] PTJ candidate upper bound (sum df*(df-1)/2 over " +
        s"2-shingles): $cand")
      time("pair_index BUILD") { q("q_pair_index")(spark, out).count() }
      if (!sys.env.contains("GRAFT_KEEP_DIR"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      spark.stop()
      return
    }

    // `pairs` mode (r13, verdict item 8): the focused 100x run — ONLY the
    // pair-index build + its dedup-components/triangles consumer path,
    // plus the fh candidate-volume audit, with a job-count listener as
    // the CC round proxy (each min-label round is a fixed job batch).
    // The full lane sweep above 10x would spend the probe's budget on
    // lanes whose growth curves are already recorded.
    if (args.length > 1 && args(1) == "pairs") {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet(): Unit
        })
      def timedJobs(name: String)(f: => Long): Unit = {
        jobs.set(0)
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[docscale] $name%-22s $sec%8.2f s  jobs=${jobs.get()}%4d  ($rows output rows)")
      }
      timedJobs("pair_index BUILD") { q("q_pair_index")(spark, out).count() }
      timedJobs("dedup_components") { q("q_dedup_components")(spark, out).count() }
      timedJobs("triangles consumer") { q("q_triangles")(spark, out).count() }
      def fhCandP(dir: String): (Long, Long, Long) = {
        val d = graft.Tables.documents(spark, dir).select("doc_id", "text")
        val nd = d.count()
        val dim = graft.QueriesText.fhDimOf(nd)
        val reps = d.groupBy("text").agg(min("doc_id").as("doc_id"))
        val v = graft.operators.Text.hashedTfSparse(
          reps.select(col("doc_id"), col("text")), "doc_id", col("text"), dim)
        val cand = v.groupBy("b1", "b2").agg(count(lit(1)).as("b"))
          .agg(sum(expr("b * (b - 1) div 2"))).head.getLong(0)
        (nd, dim, cand)
      }
      val (p1, pd1, pc1) = fhCandP("/root/testdata/sf0.1")
      val (pN, pdN, pcN) = fhCandP(out)
      println(f"[docscale] fh candidates: 1x n=$p1 dim=$pd1 cand=$pc1; " +
        f"${factor}x n=$pN dim=$pdN cand=$pcN — growth ${pcN.toDouble / pc1}%.2fx " +
        f"vs linear ${factor}x")
      // r15 (verdict item 4): the full lane wall at this factor — hashing
      // BLOCKS + exact word-vector verify since the r13 rebuild
      timedJobs("q_feature_hash_dup") { q("q_feature_hash_dup")(spark, out).count() }
      if (!sys.env.contains("GRAFT_KEEP_DIR"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      spark.stop()
      return
    }

    time("q_doc_dedup_exact") { q("q_doc_dedup_exact")(spark, out).count() }
    // Per-class parallelism audit (skew mode): the giant length class must
    // NOT serialize the PTJ stage — its segments hash-spread over the same
    // (grp, part, seg) shuffle as everyone else's. Evidence: per-task
    // duration spread of the heaviest stage. A serialized class shows one
    // task at ~stage wall time with the rest idle (max >> median); a
    // spread class keeps max/median small.
    val taskAudit = new org.apache.spark.scheduler.SparkListener {
      val byStage = scala.collection.concurrent.TrieMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        byStage.getOrElseUpdate(e.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long])
          .synchronized { byStage(e.stageId) += e.taskInfo.duration }
    }
    if (skew) spark.sparkContext.addSparkListener(taskAudit)
    time("q_doc_ngram_jaccard") { q("q_doc_ngram_jaccard")(spark, out).count() }
    if (skew) {
      spark.sparkContext.removeSparkListener(taskAudit)
      val (stage, ds) = taskAudit.byStage.maxBy(_._2.sum)
      val sorted = ds.sorted
      val med = sorted(sorted.length / 2)
      println(f"[docscale] PTJ heaviest stage $stage: ${ds.length} tasks, " +
        f"median ${med} ms, p95 ${sorted((sorted.length * 95) / 100)} ms, " +
        f"max ${sorted.last} ms (max/median ${sorted.last.toDouble / med}%.1f) " +
        f"— a serialized class would put the stage's whole wall time in one task")
    }
    time("q_doc_minhash_lsh") { q("q_doc_minhash_lsh")(spark, out).count() }
    // r12: the dedup-at-ingest ENGINE lanes through the streaming state
    // store at scale — exact tier (dropDuplicatesWithinWatermark keyed
    // state) and the chained two-stage MinHash-LSH tier (per-bucket
    // arrival state holds shingle sets for the retention window). Work is
    // bucket-keyed like the batch tier; the wall includes staging + the
    // micro-batch engine.
    time("q_dedup_stream") { q("q_dedup_stream")(spark, out).count() }
    time("q_dedup_stream_lsh") { q("q_dedup_stream_lsh")(spark, out).count() }
    time("q_doc_simhash_pairs") { q("q_doc_simhash_pairs")(spark, out).count() }
    time("q_doc_fingerprint") { q("q_doc_fingerprint")(spark, out).count() }
    time("q_token_count") { q("q_token_count")(spark, out).count() }
    // r6 assembly lanes: span-keyed dedup exchange, per-doc gram rollup,
    // broadcast-bench decontamination, cell-blocked semantic dedup — all
    // must stay ~linear under replication (replicas suffix every word, so
    // spans/grams are replica-unique; embeddings rotate, so cells keep
    // their within-replica pair structure without cross-replica dups)
    time("q_dedup_spans") { q("q_dedup_spans")(spark, out).count() }
    time("q_text_repetition") { q("q_text_repetition")(spark, out).count() }
    time("q_decontam") { q("q_decontam")(spark, out).count() }
    time("q_semdedup") { q("q_semdedup")(spark, out).count() }
    time("q_knn_lsh") { q("q_knn_lsh")(spark, out).count() }
    time("q_knn_ivf") { q("q_knn_ivf")(spark, out).count() }
    // dup-pair crossover: the exact quadratic vs the LSH scale path on the
    // SAME replicated corpus (LSH should win past ~10k vectors)
    time("q_embed_dup") { q("q_embed_dup")(spark, out).count() }
    time("q_embed_dup_lsh") { q("q_embed_dup_lsh")(spark, out).count() }
    // r9 multimodal lanes: rep-suffixed words shift the sampled codepoints,
    // so replica hashes/fingerprints differ — phash band buckets and audio
    // landmark postings must spread (~linear output), not collide by
    // replication the way identical copies would
    time("q_phash_pairs") { q("q_phash_pairs")(spark, out).count() }
    time("q_audio_match") { q("q_audio_match")(spark, out).count() }
    time("q_containment") { q("q_containment")(spark, out).count() }
    // r8-continuation lanes: exact-substring dedup (rep-suffixed words make
    // 32-char windows replica-unique, so the duplicated-candidate sliver and
    // the covered-interval output must grow LINEARLY — a quadratic blowup
    // here would mean the hash prefilter stopped bounding the string
    // materialization) and hybrid RRF (both lanes bounded top-k — near-flat).
    // q_entity_clusters is deliberately NOT probed on this corpus: the
    // rep-suffix decoration puts the SAME 2-char tail ("_7") on every
    // replica-7 word, collapsing the last-2 blocking pass into one
    // |dirty|x|vocab| block per replica — the classic ER blocking-key-skew
    // failure (measured: the lane ran away at 10x where sf0.1 takes ~1 s).
    // That is corpus-vs-blocking-key mismatch, not a plan defect; the
    // production answer is a skew-robust key set (length + first-2, or
    // block-size caps), documented at Link.blockedCandidates.
    // r12: the rebuilt feature-hash miner — corpus-scaled dim (max(64,
    // n/44)) + (top, second)-bucket blocking + exact-collapse-first. The
    // audit is CANDIDATE volume (Σ b·(b−1)/2 over blocking keys at the
    // scaled dim): it must grow ~linearly under replication — replicas
    // have disjoint vocab, and the scaled dim keeps per-replica blocks at
    // their 1x sizes. The old dim-64 top-1 blocking was Θ(n²/64) — its
    // candidate count under the same replication grew ~quadratically
    // (every replica's dominant buckets land in the same 64 bins).
    def fhCand(dir: String): (Long, Long, Long) = {
      val d = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val nd = d.count()
      val dim = graft.QueriesText.fhDimOf(nd)
      val reps = d.groupBy("text").agg(min("doc_id").as("doc_id"))
      val v = graft.operators.Text.hashedTfSparse(
        reps.select(col("doc_id"), col("text")), "doc_id", col("text"), dim)
      val cand = v.groupBy("b1", "b2").agg(count(lit(1)).as("b"))
        .agg(sum(expr("b * (b - 1) div 2"))).head.getLong(0)
      (nd, dim, cand)
    }
    val (n1, dim1, c1) = fhCand("/root/testdata/sf0.1")
    val (nN, dimN, cN) = fhCand(out)
    println(f"[docscale] fh candidates: 1x n=$n1 dim=$dim1 cand=$c1; " +
      f"${factor}x n=$nN dim=$dimN cand=$cN — growth ${cN.toDouble / c1}%.2fx " +
      f"vs linear ${factor}x (quadratic would be ${factor * factor}x)")
    time("q_feature_hash_dup") { q("q_feature_hash_dup")(spark, out).count() }
    time("q_substr_dedup") { q("q_substr_dedup")(spark, out).count() }
    time("q_hybrid_rrf") { q("q_hybrid_rrf")(spark, out).count() }
    // corpus-wide kNN join: every replicated vector's top-k through the
    // IVF index (cell-keyed shuffle join, no broadcast) — output rows must
    // be exactly k·n and runtime ~ n·nProbe·cell-population
    time("q_knn_self") { q("q_knn_self")(spark, out).count() }
    // r12 (verdict item 7): the PairIndex build-once artifact at scale —
    // the production persist-the-pairs shape. Timed SEPARATELY so the
    // consumer lanes below read the pinned index and their walls are pure
    // consumption: q_pair_index = fresh PTJ build + Versioned commit +
    // read-back rollup (the always-rebuild lane); the triangles lane then
    // measures a pure pinned-manifest read + diagnostic. Pin stability:
    // a "foreign session" overwrite-commit lands a NEWER version mid-run;
    // this session's pinned reads must not move (snapshot isolation at
    // 10x, the PairIndexSpec property on the replicated corpus).
    time("pair_index BUILD lane") { q("q_pair_index")(spark, out).count() }
    val pinnedBefore = graft.operators.PairIndex
      .pinnedVersion(spark, out, "ptj").get
    time("pair_index consumer") { q("q_triangles")(spark, out).count() }
    val decoy = spark.range(3).selectExpr("-id AS doc_a", "-id - 1 AS doc_b",
      "0.0 AS jaccard")
    graft.sources.Versioned.commit(decoy, pinnedBefore._1, overwrite = true)
    val pinnedAfter = graft.operators.PairIndex
      .pinnedVersion(spark, out, "ptj").get
    val reread = q("q_triangles")(spark, out).count()
    println(s"[docscale] pair-index pin under foreign commit: " +
      s"v${pinnedBefore._2} -> v${pinnedAfter._2} (must be equal), " +
      s"consumer re-read rows stable: ${reread}")
    require(pinnedBefore == pinnedAfter,
      "a foreign commit moved this session's pin")
    // r9 lanes. Pair-derived ops must track the LINEAR pair count (replicas
    // share no shingles): evidence positions explode per PAIR doc, the
    // cluster cap ranks inside per-replica components, and the blast radius
    // BFS walks per-replica simhash edges. The ANN-family lanes (band,
    // filtered, JL, MMR) are bounded-top-k per query — near-flat in corpus
    // size beyond the scan.
    time("q_pair_evidence") { q("q_pair_evidence")(spark, out).count() }
    time("q_cluster_cap") { q("q_cluster_cap")(spark, out).count() }
    time("q_blast_radius") { q("q_blast_radius")(spark, out).count() }
    time("q_hard_negatives") { q("q_hard_negatives")(spark, out).count() }
    time("q_knn_jl") { q("q_knn_jl")(spark, out).count() }
    time("q_mmr") { q("q_mmr")(spark, out).count() }
    time("q_score_calibrate") { q("q_score_calibrate")(spark, out).count() }
    // late-r9 lanes: the corpus-statistics screens are single
    // map-side-combined aggregates (runtime ~ token volume, output fixed
    // by source/vocab cardinality); chunking emits O(n_tok/S) rows per
    // doc; split-leakage rides the LSH pair lane (linear pair count);
    // hubness is the kNN self-join + a histogram (output ~ max in-degree)
    // r11: the rebuilt cell-blocked cross-lingual miner — candidate volume
    // is linear by construction (pairCells ∝ n, fixed probes; the focused
    // growth curve lives in XlangScaleProbe), this lane checks the whole
    // gated composition (train → block → verify → lang joins) end-to-end
    // on the replicated corpus
    time("q_xlang_pairs") { q("q_xlang_pairs")(spark, out).count() }
    time("q_tvd_mix") { q("q_tvd_mix")(spark, out).count() }
    time("q_chao1") { q("q_chao1")(spark, out).count() }
    time("q_burstiness") { q("q_burstiness")(spark, out).count() }
    time("q_char_entropy") { q("q_char_entropy")(spark, out).count() }
    time("q_chunk_passages") { q("q_chunk_passages")(spark, out).count() }
    time("q_split_leakage") { q("q_split_leakage")(spark, out).count() }
    time("q_hubness") { q("q_hubness")(spark, out).count() }

    // keep the replicated corpus for follow-up profiling (ProfileJaccard
    // et al.) when asked; default cleans up
    if (!sys.env.contains("GRAFT_KEEP_DIR"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
