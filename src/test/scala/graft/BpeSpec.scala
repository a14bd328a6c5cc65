package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Text

/** BPE training/application semantics on corpora where the merge
  * trajectory is known by hand.
  */
class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("classic corpus: merges follow frequency with lexicographic ties") {
    // words: low x3, lower x2, lowest x1 → pair counts round 1:
    // (l,o)=6 (o,w)=6 (w,e)=3 (e,r)=2 (e,s)=1 (s,t)=1; tie (l,o)/(o,w)
    // breaks lexicographically to (l,o); then (lo,w)=6, then (low,e)=3,
    // and with "e" consumed into "lowe" the round-4 winner is (lowe,r)=2.
    val df = Seq("low low low lower lower lowest").toDF("text")
    val m = Text.bpeTrain(df, col("text"), 4)
    assert(m.map(t => (t._1, t._2)) ==
      Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
    assert(m.map(_._3) == Seq(6L, 6L, 3L, 2L))
  }

  test("merge application is greedy left-to-right: aaaa + (a,a) -> aa|aa") {
    val sep = Text.BpeSep
    val got = Seq("aaaa").toDF("w")
      .select(
        Text.bpeApplyMerges(Text.bpeState(col("w")), Seq(("a", "a"))).as("s"),
        Text.bpeTokenCount(
          Text.bpeApplyMerges(Text.bpeState(col("w")), Seq(("a", "a")))).as("n"))
      .as[(String, Long)].head()
    assert(got == ((s"${sep}aa${sep}aa", 2L)))
  }

  test("merged tokens never straddle a token boundary") {
    // tokens (x, ab, c): a later merge (b, c) must NOT fire inside "ab c"
    val sep = Text.BpeSep
    val state = s"${sep}x${sep}ab${sep}c"
    val got = Seq(state).toDF("s")
      .select(Text.bpeApplyMerges(col("s"), Seq(("b", "c"))).as("s"))
      .as[String].head()
    assert(got == state)
  }

  test("NB domain discriminator separates disjoint-vocabulary classes") {
    // curated speaks {alpha beta gamma}, raw speaks {noise junk spam}:
    // whole-bit LLR must classify every held-out doc correctly, and an
    // unseen token must fall through smoothing without error
    val docs = (
      (0 until 20).map(i => (i.toLong, "curated", "alpha beta gamma alpha")) ++
      (0 until 20).map(i => ((100 + i).toLong, "raw", "noise junk spam junk")) ++
      Seq((500L, "curated", "alpha beta zzz-unseen"),
          (501L, "raw", "spam noise zzz-unseen"))
    ).toDF("doc_id", "source", "text")
    val got = Text.nbDomainScore(docs, "doc_id", col("text"),
        col("source") === "curated",
        col("doc_id") < 200) // train split excludes 500/501
      .select("doc_id", "nb_keep").as[(Long, Int)].collect().toMap
    assert(got(500L) == 1 && got(501L) == 0)
    assert((0 until 20).forall(i => got(i.toLong) == 1))
    assert((0 until 20).forall(i => got((100 + i).toLong) == 0))
  }

  test("training is invariant to input partitioning") {
    val words = (0 until 400).map(i => s"doc text alpha beta gamma t$i")
    val a = Text.bpeTrain(words.toDF("text"), col("text"), 6)
    val b = Text.bpeTrain(words.toDF("text").repartition(13), col("text"), 6)
    assert(a == b)
  }
}
