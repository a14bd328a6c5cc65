package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PairIndex, Text}

/** §2.40d build-once pair index: every diagnostic lane must read pair sets
  * IDENTICAL to its old from-scratch build, and the session pin must be
  * immune to concurrent rebuilds (manifest pinning — the r9 verdict's
  * "per-lane answers equal to the standalone queries" criterion).
  */
class PairIndexSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("indexed PTJ tier equals the standalone build, values included") {
    val standalone = Text.jaccardPairs(Tables.documents(spark, dir), "doc_id",
        Text.shingles(col("text"), 2), 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val indexed = Queries.queries("q_doc_ngram_jaccard")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == standalone)
    assert(indexed.nonEmpty)
  }

  test("diagnostic lanes ride the same pinned pair set (triangles == from-scratch rebuild)") {
    // q_triangles reads the index; a from-scratch jaccardPairs rebuild of
    // its edge input must produce the identical per-doc triangle counts —
    // the determinism that also keeps every consumer's from-raw-text
    // DuckDB oracle hash-matching through the index
    val viaIndex = Queries.queries("q_triangles")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(viaIndex.nonEmpty)
    // rebuild() re-commits fresh; the gated lane reuses the same builder,
    // so a second full build must reproduce the set exactly
    val (root, v) = PairIndex.rebuild(spark, dir, "ptj")(
      Text.jaccardPairs(Tables.documents(spark, dir), "doc_id",
          Text.shingles(col("text"), 2), 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")))
    val recommitted = pairSet(graft.sources.Versioned.read(spark, root, v))
    val pinnedNow = pairSet(Queries.queries("q_doc_ngram_jaccard")(spark, dir))
    assert(recommitted == pinnedNow)
    val viaIndex2 = Queries.queries("q_triangles")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(viaIndex2 == viaIndex)
  }

  test("session pin is manifest-pinned: a foreign commit cannot smear reads") {
    val before = pairSet(Queries.queries("q_doc_ngram_jaccard")(spark, dir))
    val (root, _) = PairIndex.pinnedVersion(spark, dir, "ptj").get
    // another writer (other session/JVM) overwrite-commits garbage to the
    // same table root — the pinned manifest version must keep serving the
    // exact pre-commit snapshot
    graft.sources.Versioned.commit(
      Seq((-1L, -2L, 0.0)).toDF("doc_a", "doc_b", "jaccard"),
      root, overwrite = true)
    val after = pairSet(Queries.queries("q_doc_ngram_jaccard")(spark, dir))
    assert(after == before)
    // repair the table for later suites in this JVM: re-pin a fresh build
    PairIndex.rebuild(spark, dir, "ptj")(
      Text.jaccardPairs(Tables.documents(spark, dir), "doc_id",
          Text.shingles(col("text"), 2), 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")))
  }

  test("a reader pinned at v1 survives 5 concurrent rebuilds (vacuum-outruns-pin guard)") {
    // r11 ADVICE: pins are process-local but the table root is shared
    // across JVMs for the same user+corpus; a concurrent session
    // rebuilding 4+ times vacuums the manifest this session pinned.
    // pinnedRead must detect the vacuumed pin and transparently
    // rebuild+re-pin (deterministic build => identical contents).
    def build = Text.jaccardPairs(Tables.documents(spark, dir), "doc_id",
        Text.shingles(col("text"), 2), 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
    val before = pairSet(PairIndex.pinnedRead(spark, dir, "ptj")(build))
    val (root, v0) = PairIndex.pinnedVersion(spark, dir, "ptj").get
    // simulate the concurrent JVM: 5 overwrite-commits + vacuums straight
    // through Versioned (process-local pins never see these)
    (1 to 5).foreach { i =>
      graft.sources.Versioned.commit(
        Seq((-i.toLong, -i.toLong - 1, 0.0)).toDF("doc_a", "doc_b", "jaccard"),
        root, overwrite = true)
      graft.sources.Versioned.vacuum(root, keepVersions = 4)
    }
    assert(!graft.sources.Versioned.hasVersion(root, v0),
      "precondition: the pinned manifest must actually be vacuumed")
    val after = pairSet(PairIndex.pinnedRead(spark, dir, "ptj")(build))
    assert(after == before, "re-pinned read must be bit-identical")
    val (_, v1) = PairIndex.pinnedVersion(spark, dir, "ptj").get
    assert(v1 > v0, "the guard must have re-pinned to a fresh version")
  }

  test("minhash tier: indexed lane equals the standalone signature pipeline") {
    // cross-check through the public catalog surface: q_doc_minhash_lsh
    // (indexed) vs the §2.39 oracle property that found ⊆ PTJ truth at the
    // same threshold, with the known-by-construction equality that every
    // LSH pair IS a PTJ pair at 0.8
    val mh = pairSet(Queries.queries("q_doc_minhash_lsh")(spark, dir))
    val ptj = pairSet(Queries.queries("q_doc_ngram_jaccard")(spark, dir))
    assert(mh.nonEmpty && mh.subsetOf(ptj))
  }
}
