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

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), size(words) - n),
      i => array_join(slice(words, i + 1, lit(n)), " ")))
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

  /** Exact pairwise n-gram Jaccard over a document set, via an inverted
    * index: explode (doc, shingle), self-join on shingle, count common
    * shingles per pair, then J = common / (|A| + |B| - common).
    *
    * Unlike the naive quadratic cross-join this shuffles on the shingle key
    * and only materializes pairs that share at least one shingle — which is
    * every pair with J > 0, so results are EXACT. Posting lists of
    * ultra-common shingles dominate cost; `maxDocFreq` drops them the way a
    * search engine drops stopwords, which can only lose pairs whose Jaccard
    * is below any useful threshold when the remaining shingles still overlap.
    * Keep it >= corpus size for exactness (default: no cap).
    */
  def jaccardPairs(df: DataFrame, id: String, shingleCol: Column,
                   minJaccard: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(col(id).as("doc"), explode(shingleCol).as("sh"))
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val filtered =
      if (maxDocFreq == Long.MaxValue) sh
      else {
        val rare = sh.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") <= maxDocFreq)
        sh.join(rare.select("sh"), "sh")
      }
    val a = filtered.toDF("doc_a", "sh")
    val b = filtered.toDF("doc_b", "sh")
    a.join(b, Seq("sh")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(counts.toDF("doc_a", "n_a"), "doc_a")
      .join(counts.toDF("doc_b", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .where(col("jaccard") >= minJaccard)
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
    val bits = (0 until 32).map { b =>
      // +1 where bit b of the token hash is set, -1 otherwise; sum over tokens
      when(aggregate(tokens, lit(0L),
        (acc, t) => acc + when(shiftright(hash(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    df.withColumn("simhash", bits.reduce((a: Column, b: Column) => a.bitwiseOR(b)))
      .withColumn("bucket", shiftright(col("simhash"), 16))
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
