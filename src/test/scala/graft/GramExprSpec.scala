package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Text

/** Bit-equality twins for the r12 one-pass gram natives (WordGramsExpr,
  * KgramPolyHashExpr) — the giant-doc O(len²) HOF fix. The HOF forms are
  * the semantics contract (they are what the DuckDB oracles replay); the
  * natives must match them byte-for-byte on every edge the HOFs have:
  * consecutive spaces (empty words), leading/trailing separators, docs
  * shorter than the gram, the empty string, and non-ASCII code points.
  */
class GramExprSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a  b c",            // consecutive spaces -> empty word
    " leading and trailing ",
    "single",
    "two words",
    "",                  // empty doc
    "répété déjà vu naïve café", // multi-byte UTF-8
    "xx xx xx xx xx",    // repetition
    (1 to 40).map(i => s"w$i").mkString(" "))

  test("WordGramsExpr == the HOF gram builder (occurrences, order, empties)") {
    for (n <- Seq(1, 2, 3, 5)) {
      val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val got = df.select(col("id"), Text.gramOccurrences(col("t"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val want = df.select(col("id"), Text.gramOccurrencesHof(col("t"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"n=$n: native $got\nhof $want")
    }
  }

  test("KgramPolyHashExpr == the per-position HOF fold (short docs, empty, unicode)") {
    for (k <- Seq(1, 4, 8)) {
      val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "_t")
      val got = df.select(col("id"),
          Text.kgramPolyHashNative(col("_t"), k).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = df.select(col("id"), Text.kgramPolyHashHof("_t", k).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got == want, s"k=$k: native $got\nhof $want")
    }
  }

  test("WordSpansExpr == the HOF span builder (clamped tails, empties)") {
    for (sw <- Seq(1, 3, 5, 50)) {
      val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val got = df.select(col("id"), Text.wordSpans(col("t"), sw).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val want = df.select(col("id"), Text.wordSpansHof(col("t"), sw).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"sw=$sw: native $got\nhof $want")
    }
  }

  test("WinnowMinsExpr == the relational window-min winnow (short arrays, ties)") {
    // r14: the winnow stage itself went native (monotonic deque). Edge
    // classes: n < w (one truncated window), n == w, heavy ties (the
    // repetition fixture), w = 1 (identity-distinct), and large w.
    for (w <- Seq(1, 2, 4, 16)) {
      val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = Text.winnowFingerprints(df, "doc_id", col("text"), 4, w,
          crossEngine = true)
        .as[(Long, Seq[Long])].collect().toMap
      val relational = Text.winnowRelationalForSpec(df, "doc_id",
          col("text"), 4, w)
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == relational, s"w=$w")
    }
  }

  test("CdcChunksExpr == the relational char-explode chunker (cuts, empties, reassembly)") {
    // r14: the CDC chunker went native. The twin compares the FULL lane
    // output (chunk counts, kept counts, reassembled text) across the
    // fixture edges plus a long repetitive doc that actually produces
    // interior cuts at small divisors.
    val docs = fixtures :+ ("abcdefgh " * 120).trim
    for ((k, d) <- Seq((4, 8), (8, 64), (2, 2))) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = Text.dedupChunksCdc(df, "doc_id", col("text"), k, d)
        .as[(Long, Long, Long, String)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      val rel = Text.dedupChunksCdcRelationalForSpec(df, "doc_id",
          col("text"), k, d)
        .as[(Long, Long, Long, String)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      assert(native == rel, s"k=$k divisor=$d")
    }
  }

  test("winnowFingerprints output unchanged by the native swap (HOF replay)") {
    // replay the full winnow relational pipeline with the HOF hash array
    // and assert identical fingerprints — the oracle-facing contract
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = Text.winnowFingerprints(df, "doc_id", col("text"), 8, 4,
        crossEngine = true)
      .as[(Long, Seq[Long])].collect().toMap
    val hof = Text.winnowFingerprintsHofForSpec(df, "doc_id", col("text"), 8, 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
  }
}
