package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF distributed-trainer probe: replicates the sf0.1 embeddings past the
  * `DriverCellCap` boundary (>262k vectors → autoCells > 512) so `knnIvf`
  * exercises the DISTRIBUTED quantizer path end to end, then measures
  * recall@5 against brute force and reports timings + model size.
  *
  * Replication is rotation x diagonal-sign: replica `rep` applies a
  * circular coordinate shift of `rep % 64` and a per-group ±1 sign mask
  * (`rep / 64` picks the mask). Both transforms are ORTHOGONAL — norms and
  * within-replica inner products are preserved exactly, so each replica
  * keeps the corpus's neighbor structure and true-neighbor counts grow
  * linearly — while cross-replica cosines decorrelate (shifted axes /
  * flipped signs ≈ random directions), unlike identical copies, which
  * would make every query's top-k a degenerate tie among its clones.
  *
  * Usage: `sbt "runMain graft.tools.IvfScaleProbe [factor]"` (default 150
  * → 300k vectors, 548 cells).
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 150
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("graft_ivfscale").toString
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    embs.crossJoin(spark.range(factor).toDF("rep"))
      .repartition(cpus.toInt * 2)
      .select((col("vec_id") * factor + col("rep")).as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
                  CASE WHEN ((i + 1) * (rep DIV 64)) % 5 < 2 THEN -1.0 ELSE 1.0 END
                  * embedding[int((i + rep) % 64)])""")
          .cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val e = graft.Tables.embeddings(spark, out)
    val n = e.count()
    val cells = Similarity.autoCells(n)
    val nProbe = math.max(3, cells / 8)
    println(s"[ivfscale] corpus: $n vectors (${factor}x), autoCells=$cells " +
      s"(driver cap ${Similarity.DriverCellCap}), nProbe=$nProbe")
    require(cells > Similarity.DriverCellCap,
      s"probe must cross the driver-trainer boundary; raise factor (cells=$cells)")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfscale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val q = e.where(col("vec_id") < 10)
    // the two phases knnIvf composes at this cell count, timed apart: the
    // index BUILD (distributed Lloyd's over the default 64*cells sample)
    // amortizes over every later query batch; SEARCH is the steady-state
    // per-batch cost (native argmin corpus pass + probe ranking)
    val model = timed("ivfCentroidsDistributed") {
      Similarity.ivfCentroidsDistributed(e, "embedding", cells)
    }
    val ivf = timed("knnIvfSearch") {
      Similarity.knnIvfSearch(e, q, "vec_id", "embedding", 5, nProbe, 6, model)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // the amortized shape: assignment materialized ONCE (at scale: a
    // persisted cell column), then each query batch touches only its
    // probed cells
    val indexed = timed("ivfAssign (materialize once)") {
      Similarity.ivfAssign(
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
        "n_vec", model).localCheckpoint()
    }
    for (b <- 1 to 2) timed(s"indexed search batch $b") {
      Similarity.knnIvfSearchIndexed(indexed,
          e.where(col("vec_id") >= b * 20 && col("vec_id") < b * 20 + 10),
          "vec_id", "embedding", 5, nProbe, 6, model)
        .count()
    }
    val brute = timed("knnBrute (exact baseline)") {
      Similarity.knnBrute(e, q, "vec_id", "embedding", 5, 6)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = brute.count(ivf.contains).toDouble / brute.size
    println(f"[ivfscale] recall@5 vs brute = $recall%.3f over ${brute.size} pairs")

    // Two-level lane at a comparable total cell count: per-row assignment
    // is (nC + nF)·dim instead of cells·dim — the shape that keeps √n
    // cells viable at 10^9+ vectors (548 cells: ~11x less per-row work;
    // 65k cells: ~128x)
    val nC = math.max(2, math.round(math.sqrt(cells.toDouble)).toInt)
    val nF = nC
    val (coarse, fine) = timed(s"ivfTrainTwoLevel (${nC}x$nF)") {
      Similarity.ivfTrainTwoLevel(e, "embedding", nC, nF)
    }
    val assigned2 = timed("ivfAssign2 (hierarchical)") {
      Similarity.ivfAssign2(
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
        "n_vec", coarse, fine).localCheckpoint()
    }
    val ivf2 = timed("two-level indexed search") {
      Similarity.knnIvfSearchIndexed(assigned2, q, "vec_id", "embedding",
          5, nProbe, 6, fine)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall2 = brute.count(ivf2.contains).toDouble / brute.size
    println(f"[ivfscale] two-level recall@5 vs brute = $recall2%.3f (${nC * nF} cells, $nProbe probes)")

    // IVF-PQ lane (the 10^9-vector MEMORY story): residual codebooks over
    // the distributed coarse model, corpus encoded to (n_id, cell, codes)
    // — BIGINT codes, 8 B vs the 256 B raw vector — ADC in-cell ranking,
    // exact rerank of the rf·k shortlist. Payload compression is measured
    // from the written parquet, recall against the same brute baseline.
    val pqM = 8; val pqKs = 256
    val codebooks = timed(s"pqTrain (m=$pqM, ks=$pqKs)") {
      Similarity.pqTrain(e, "embedding", model, pqM, pqKs, corpusN = n)
    }
    val encoded = timed("pqEncode (materialize once)") {
      val enc = Similarity.pqEncode(indexed, "n_vec", "cell", model,
        codebooks, pqM, pqKs).select("n_id", "cell", "codes")
      enc.write.mode("overwrite").parquet(s"$out/pq_index.parquet")
      spark.read.parquet(s"$out/pq_index.parquet")
    }
    // rerankFactor sweep: the shortlist size is the recall/throughput knob
    // (the rerank join fetches shortlist ids only — its cost is flat here)
    val recallByRf = (for (rf <- Seq(4, 16, 64)) yield {
      val pq = timed(s"IVF-PQ search (ADC + rerank $rf*k)") {
        Similarity.knnIvfPqSearch(encoded, e, q, "vec_id", "embedding",
            5, nProbe, pqM, pqKs, 6, model, codebooks, rerankFactor = rf)
          .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      rf -> brute.count(pq.contains).toDouble / brute.size
    }).toMap
    val recallPq = recallByRf(64)
    println(s"[ivfscale] IVF-PQ recall@5 by rerank factor: " +
      recallByRf.toSeq.sortBy(_._1).map { case (rf, r) => f"$rf*k -> $r%.3f" }.mkString(", "))
    def dirMb(p: String): Double = {
      val d = new java.io.File(p)
      (if (d.exists) d.listFiles.map(_.length).sum else 0L) / 1e6
    }
    indexed.write.mode("overwrite").parquet(s"$out/raw_index.parquet")
    println(f"[ivfscale] IVF-PQ recall@5 vs brute = $recallPq%.3f " +
      f"(flat IVF: $recall%.3f) | index payload ${dirMb(s"$out/pq_index.parquet")}%.1f MB " +
      f"vs raw ${dirMb(s"$out/raw_index.parquet")}%.1f MB")

    // OPQ lane: variance-balanced dimension permutation (zero-float-op
    // orthonormal transform) before the SAME residual-PQ pipeline — the
    // subspace-balance term of Ge et al.'s OPQ. Brute baseline is
    // unchanged (a permutation preserves every cosine exactly).
    val perm = timed("opqPermutation (greedy alloc)") {
      Similarity.opqPermutation(e, "embedding", pqM, corpusN = n)
    }
    val ep = e.select(col("vec_id"),
      Similarity.permuteVec(col("embedding"), perm).as("embedding"))
      .localCheckpoint()
    val modelP = timed("coarse retrain (permuted)") {
      Similarity.ivfCentroidsDistributed(ep, "embedding", cells)
    }
    val cbP = timed("pqTrain (permuted)") {
      Similarity.pqTrain(ep, "embedding", modelP, pqM, pqKs, corpusN = n)
    }
    val indexedP = Similarity.ivfAssign(
      ep.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
      "n_vec", modelP).localCheckpoint()
    val encodedP = Similarity.pqEncode(indexedP, "n_vec", "cell", modelP,
      cbP, pqM, pqKs).select("n_id", "cell", "codes")
    val recallOpqByRf = (for (rf <- Seq(4, 16, 64)) yield {
      val pq = timed(s"OPQ IVF-PQ search (rerank $rf*k)") {
        Similarity.knnIvfPqSearch(encodedP, ep,
            ep.where(col("vec_id") < 10), "vec_id", "embedding",
            5, nProbe, pqM, pqKs, 6, modelP, cbP, rerankFactor = rf)
          .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      rf -> brute.count(pq.contains).toDouble / brute.size
    }).toMap
    println(s"[ivfscale] OPQ-permuted IVF-PQ recall@5 by rerank factor: " +
      recallOpqByRf.toSeq.sortBy(_._1).map { case (rf, r) => f"$rf*k -> $r%.3f" }.mkString(", ") +
      f" (unpermuted: ${recallByRf(4)}%.3f/${recallByRf(16)}%.3f/${recallByRf(64)}%.3f)")

    // Composed two-level + PQ lane (the full 10^9-vector shape: compute
    // axis via hierarchical assignment, memory axis via packed codes)
    val imi = timed("two-level+PQ search (full pipeline)") {
      Similarity.knnIvf2Pq(e, q, "vec_id", "embedding",
          5, nC, nF, nProbe, pqM, pqKs, 6)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recallImi = brute.count(imi.contains).toDouble / brute.size
    println(f"[ivfscale] two-level+PQ recall@5 vs brute = $recallImi%.3f " +
      f"(two-level uncompressed: $recall2%.3f)")

    // Assignment-cost scaling, isolated: a 16384-cell model built from
    // corpus vectors directly (no training — this lane measures ONLY the
    // per-row argmin, flat cells·dim vs hierarchical (√cells + √cells)·dim,
    // the term that decides whether √n cells survive 10^9 vectors). Flat
    // does 64x the fp work here.
    val bigN = 16384
    val seedVecs = e.orderBy("vec_id").limit(bigN)
      .select("embedding").collect().map(_.getSeq[Float](0))
    val flatBig: Seq[(Int, Seq[Float])] = seedVecs.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq
    val coarseBig: Seq[(Int, Seq[Float])] = (0 until 128)
      .map(i => (i, seedVecs(i * 128)))
    val slice = e // full corpus: the fp-work gap needs enough rows to clear scan overhead
    // sum(cell), not count(): count() lets Catalyst prune the assignment
    // projection away entirely and times an empty scan
    timed(s"flat assign, $bigN cells (300k rows)") {
      Similarity.ivfAssign(
        slice.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
        "n_vec", flatBig).agg(sum("cell")).head()
    }
    timed(s"two-level assign, 128x128 cells (300k rows)") {
      Similarity.ivfAssign2(
        slice.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")),
        "n_vec", coarseBig, flatBig).agg(sum("cell")).head()
    }
    val rt = Runtime.getRuntime
    println(f"[ivfscale] driver heap used ≈ ${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB " +
      f"(model is cells x dim x 4B ≈ ${cells * 64 * 4 / 1e3}%.0f KB)")

    if (!sys.env.contains("GRAFT_KEEP_DIR"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
