package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for LLM-training-data pipelines.
  *
  * Everything here is built from codegen'd built-ins (split/transform/
  * filter/aggregate higher-order functions) — no UDFs — so the operators
  * stay inside whole-stage codegen and scale linearly with input bytes.
  */
object Text {

  /** Distinct word n-gram shingles of a text column. Texts with fewer than
    * `n` words yield an empty array (unguarded, `sequence(0, size-n)` would
    * produce a descending sequence and `slice(_, 0, n)` errors — SQL array
    * indices are 1-based).
    */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact-duplicate grouping on a normalization of the text
    * (fifoset.go dedupe analog; exact dedup = hash-groupBy, the cheapest
    * dedup tier). Returns one row per duplicate group.
    */
  def exactDupGroups(df: DataFrame, id: String, normalized: Column): DataFrame =
    df.withColumn("_norm", normalized)
      .groupBy("_norm")
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_dups"),
        array_sort(collect_list(col(id))).as("members"))
      .where(col("n_dups") > 1)

  /** Exact pairwise n-gram Jaccard >= `minJaccard` via prefix-filtered
    * inverted index (AllPairs/PPJoin, Bayardo et al. WWW'07) — EXACT results
    * at corpus scale without the quadratic cross-join:
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
  def jaccardPairs(df: DataFrame, id: String, shingleCol: Column,
                   minJaccard: Double): DataFrame = {
    val t = minJaccard
    val sh = df.select(col(id).as("doc"), explode(shingleCol).as("sh"))
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

  /** MinHash signatures: k permutations of murmur3 shingle hashes via
    * (a_i * h + b_i) mod p — the classic Broder construction. Returns the
    * input plus `sig` (array of k minima). Spark-side only (murmur3 isn't
    * reproducible in ANSI SQL); correctness is spec-tested against exact
    * Jaccard.
    */
  def minhashSignature(df: DataFrame, shingleCol: Column, k: Int): DataFrame = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val sigs = (0 until k).map { i =>
      val a = 1L + 2L * i // odd multipliers
      val b = 7L + 31L * i
      array_min(transform(shingleCol,
        s => pmod(hash(s).cast("long") * a + b, lit(p))))
    }
    df.withColumn("sig", array(sigs: _*))
  }

  /** LSH banding of a minhash signature: (band index, band hash) keys.
    * Near-dup candidates = pairs sharing any band bucket; shuffle is on the
    * (band, hash) key so bucket sizes — not corpus size — bound the join.
    */
  def lshBands(df: DataFrame, bands: Int, rows: Int): DataFrame =
    df.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash", hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))

  /** SimHash: sign-aggregated bit fingerprint of murmur3 word hashes
    * (Charikar). Texts within small Hamming distance are near-dups.
    * 32-bit variant; returned with a bucket key (top 16 bits) for
    * block-join candidate generation.
    */
  def simhash(df: DataFrame, tokens: Column): DataFrame = {
    // murmur3 once per token; the 32 per-bit sign sums then work over the
    // precomputed hash array (one hash per token, not 32)
    val bits = (0 until 32).map { b =>
      // +1 where bit b of the token hash is set, -1 otherwise; sum over tokens
      when(aggregate(col("_th"), lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    df.withColumn("_th", transform(tokens, t => hash(t)))
      .withColumn("simhash", bits.reduce((a: Column, b: Column) => a.bitwiseOR(b)))
      .withColumn("bucket", shiftright(col("simhash"), 16))
      .drop("_th")
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * k-gram hashes, sliding window of w, keep each window's minimum.
    * Returns distinct fingerprints per doc as `fps`.
    */
  def winnowFingerprints(df: DataFrame, text: Column, k: Int, w: Int): DataFrame = {
    val hashes = expr(s"transform(sequence(0, greatest(length(_t) - $k, 0)), i -> abs(hash(substr(_t, i + 1, $k))))")
    val windows = expr(
      s"array_distinct(transform(sequence(0, greatest(size(_h) - $w, 0)), i -> array_min(slice(_h, i + 1, $w))))")
    df.withColumn("_t", text)
      .withColumn("_h", hashes)
      .withColumn("fps", windows)
      .drop("_t", "_h")
  }

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
}
