package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Web}

/** Perceptual hash, audio constellation fingerprints and URL
  * canonicalization: the invariants the cross-engine oracles and the
  * banding recall guarantees rest on.
  */
class MediaMatchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew hot coffee at midnight and the band plays softly in the hall"

  test("aHash64: identical payloads hash identically, light edits stay close") {
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("quick", "quack")), // tiny local edit
      (4L, base.reverse)                    // structurally different
    ).toDF("doc_id", "text")
    val h = Multimodal.aHash64(docs, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(h(1L) == h(2L))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(h(1L), h(3L)) <= 6, s"edit distance blew up: ${ham(h(1L), h(3L))}")
    assert(ham(h(1L), h(4L)) > 6, s"reversal stayed close: ${ham(h(1L), h(4L))}")
    // halves stay within 32 bits — the no-sign-overflow contract
    h.values.foreach { case (h0, h1) =>
      assert(h0 >= 0 && h0 < (1L << 32) && h1 >= 0 && h1 < (1L << 32))
    }
  }

  test("aHashPairs: band blocking finds every pair within the Hamming cut") {
    // deterministic corpus with planted near-dups
    val docs = (0L until 40L).map { i =>
      val t = if (i % 4 == 1) (base + " tail" + (i / 4)).replace("fox", "cat")
              else base + " tail" + (i / 4)
      (i, t)
    }.toDF("doc_id", "text")
    val hashes = Multimodal.aHash64(docs, "doc_id", col("text"))
    val hs = hashes.as[(Long, Long, Long)].collect()
    // brute-force ground truth over distinct-hash representatives
    val reps = hs.groupBy(r => (r._2, r._3)).map(_._2.minBy(_._1)).toSeq
    val want = (for {
      a <- reps; b <- reps if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 6
    } yield (a._1, b._1, d)).toSet
    val got = Multimodal.aHashPairs(hashes, 6)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(got == want)
  }

  test("audio fingerprints: an aligned snippet's hashes are the source's, shifted") {
    val docs = Seq((7L, base)).toDF("doc_id", "text")
    val full = Multimodal.audioFingerprints(docs, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    val snip = Seq((7L, base.substring(32))) // drop exactly one frame
      .toDF("doc_id", "text")
    val sfp = Multimodal.audioFingerprints(snip, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(sfp.nonEmpty)
    sfp.foreach { case (f, h) => assert(full(f + 1) == h, s"frame $f mismatch") }
  }

  test("audio frame cap: giant payloads stride to <= maxFrames, sub-cap payloads unchanged") {
    // 20 frames at cap 8 -> k = ceil(20/8) = 3 -> kept frames 0,3,...,18
    // (7 frames, 6 landmark pairs); true frame indices survive (deltas
    // stay meaningful for offset coherence)
    val giant = Seq((1L, "ab" * (20 * 16))).toDF("doc_id", "text")
    val g = Multimodal.audioFingerprints(giant, "doc_id", col("text"), 8)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(g.length == 6, s"expected ceil(20/3)-1 = 6 pairs, got ${g.length}")
    assert(g.map(_._2).toSeq == Seq(0L, 3L, 6L, 9L, 12L, 15L),
      s"true frame indices, stride 3: ${g.map(_._2).toSeq}")
    // a payload under the cap takes k = 1: bit-identical to the uncapped
    // fingerprints (the sf-corpus regime — output unchanged by the cap)
    val small = Seq((2L, base)).toDF("doc_id", "text")
    val capped = Multimodal.audioFingerprints(small, "doc_id", col("text"), 64)
      .as[(Long, Long, Long)].collect().toSet
    val wide = Multimodal.audioFingerprints(small, "doc_id", col("text"), 100000)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == wide && capped.nonEmpty)
  }

  test("canonicalUrl: strips junk, keeps the id param, lowercases host") {
    val urls = Seq(
      (1L, "HTTPS://My.Host.COM:443/a/b/?utm_source=x&id=42#frag"),
      (2L, "https://my.host.com/a/b?id=42"),
      (3L, "http://other.org:80/"),
      (4L, "https://plain.net/path?utm_medium=y")
    ).toDF("id", "u")
    val out = urls.select(col("id"), Web.canonicalUrl(col("u")).as("c"),
        Web.hostOf(Web.canonicalUrl(col("u"))).as("h"))
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("https://my.host.com/a/b?id=42", "my.host.com")))
    assert(out(1L)._1 == out(2L)._1) // dirty and clean variants collapse
    assert(out(3L) == (("https://other.org", "other.org")))
    assert(out(4L) == (("https://plain.net/path", "plain.net")))
  }
}
