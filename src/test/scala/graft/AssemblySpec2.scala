package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Text

/** Round-6 pipeline additions: integer-bit LM surprisal and incremental
  * cross-corpus dedup.
  */
class LmSurprisalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("surprisal = bits(N) - bits(count), mean in centibits via integer div") {
    // corpus: a:2 b:2 c:1, N=5 → bits: N=2, a=1, b=1, c=0
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Text.unigramSurprisal(df, "doc_id", col("text"))
      .select("doc_id", "n_toks", "sum_bits", "avg_centibits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc1: (2-1)+(2-1)+(2-1)=3 over 3 toks → 100; doc2: (2-1)+(2-0)=3 over 2 → 150
    assert(out.toSeq == Seq((1L, 3L, 3L, 100L), (2L, 2L, 3L, 150L)))
  }

  test("rare tokens score higher than stopword soup") {
    val common = Seq.fill(40)("the quick brown fox").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rare = Seq((100L, "zxq1 vvw2 kkp3 mmr4"))
    val df = (common ++ rare).toDF("doc_id", "text")
    val scores = Text.unigramSurprisal(df, "doc_id", col("text"))
      .select("doc_id", "avg_centibits").as[(Long, Long)].collect().toMap
    assert(scores(100L) > scores(0L))
  }
}

class DedupIncrementalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val base = Seq(
    (1L, "alpha beta gamma"), (2L, "delta epsilon zeta")
  ).toDF("doc_id", "text")

  test("drops batch docs whose key exists in base; first-wins within batch") {
    val incoming = Seq(
      (10L, "alpha beta gamma"),   // collides with base 1 → dropped
      (11L, "eta theta iota"),     // new → kept
      (12L, "eta theta iota"),     // in-batch dup of 11 → dropped
      (13L, "kappa lambda mu")     // new → kept
    ).toDF("doc_id", "text")
    val out = Text.dedupIncremental(incoming, base, "doc_id",
        col("text"), 100L)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(11L, 13L))
  }

  test("equals rebuild-over-union batch-side survivors (random corpus)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d")
    def txt() = Seq.fill(3)(words(rnd.nextInt(words.size))).mkString(" ")
    val all = (0L until 120L).map(i => (i, txt()))
    val (b, inc) = (all.take(60).toDF("doc_id", "text"),
      all.drop(60).toDF("doc_id", "text"))
    val got = Text.dedupIncremental(inc, b, "doc_id", col("text"), 64L)
      .select("doc_id").as[Long].collect().toSet
    // naive: exact dedup over base ∪ batch keeping min doc_id, then
    // restrict to batch-side ids
    val naive = all.groupBy(_._2).map { case (_, g) => g.map(_._1).min }
      .filter(_ >= 60L).toSet
    assert(got == naive)
  }
}
